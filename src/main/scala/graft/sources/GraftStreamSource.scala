package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.ops.TableStore

/** A versioned [[TableStore]] as a STREAMING SOURCE — the S11 folder
  * sensor generalized from "new files in a directory" to "new commits
  * in a table": `spark.readStream.format("graft").load(root)` turns
  * every committed version into (part of) a micro-batch, so a
  * downstream pipeline consumes a store the way it consumes a folder,
  * with the commit log as the new-data ledger instead of a directory
  * listing. This is the streaming half of the change-feed family: the
  * batch ticks ([[TableStore.readChangesSince]]) already drive the
  * incremental views and the exactly-once mirror; this class puts the
  * SAME feed behind Spark's own offset/checkpoint machinery.
  *
  * Offsets ARE commit versions (`LongOffset(v)`), so a batch is the
  * half-open commit window `(start, end]` and replay determinism is
  * the log's own: the engine's checkpointed offsets name versions,
  * and re-running a batch re-reads exactly the files those commits
  * added. Feed semantics inherit the batch feed's contract — appends
  * surface, `layout` commits (compaction/OPTIMIZE) are invisible, a
  * content REWRITE in the window fails loudly with the resync remedy
  * (an adds-only stream cannot express removals; this is Delta's
  * no-`ignoreChanges` default posture).
  *
  * Pacing rides Spark's admission control: the engine hands
  * [[latestOffset]] the stream's current position, and the source
  * offers at most `maxVersionsPerBatch` commits past it — backlog
  * catch-up proceeds in bounded steps, restart pacing comes from the
  * engine's own checkpoint (no source-side state at all). Under
  * Trigger.AvailableNow the store's latest is snapshotted at prepare
  * time and the capped walk stops there, so a drain sees everything
  * that was committed when the trigger fired and nothing after.
  *
  * Scale shape: latestOffset is one log listing; a batch reads only
  * the files its commit window ADDED (never a snapshot), so
  * steady-state stream cost is proportional to ingest, not table
  * size — the same economics as the batch feed. */
class GraftStreamSource(spark: SparkSession, root: String,
                        startingVersion: Long,
                        maxVersionsPerBatch: Option[Long],
                        rowFeed: Boolean = false,
                        maxRowsPerBatch: Option[Long] = None)
    extends Source with SupportsTriggerAvailableNow {

  override val schema: StructType =
    GraftStreamSource.schemaFor(spark, root, rowFeed)

  /** AvailableNow drain target, snapshotted at prepare time. Honored
    * HERE rather than through the engine's wrapper: the wrapper
    * snapshots the source's first OFFERED offset as the target, which
    * under a rate cap is one batch ahead of the checkpoint — the
    * drain would stop after a single capped batch. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(
      TableStore.versions(spark, root).lastOption.getOrElse(startingVersion))

  private def latestVisible: Option[Long] = {
    val committed = TableStore.versions(spark, root).lastOption
      .getOrElse(return None)
    Some(availableNowTarget.fold(committed)(t => math.min(committed, t)))
  }

  /** The admission-control path the engine actually drives: `start`
    * is the stream's current position (checkpoint-authoritative), the
    * offer walks at most the caps past it. `maxVersionsPerBatch`
    * bounds commits per batch; `maxRowsPerBatch` bounds ROWS — the
    * pacing lever versions-per-batch cannot give when commit sizes
    * are skewed (one fat backfill commit next to trickle appends).
    * Row accounting is METADATA-ONLY: the log carries per-file footer
    * row counts, so sizing a batch reads zero data. A single commit
    * larger than the row cap still lands whole — offsets are commit
    * versions, a commit is the atom — so the cap bounds batches at
    * max(cap, largest single commit), never splits one. Null =
    * nothing new. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest = latestVisible.getOrElse(return null)
    val base = Option(start).map(GraftStreamSource.version)
      .getOrElse(startingVersion)
    val capped = maxVersionsPerBatch
      .fold(latest)(m => math.min(latest, base + m))
    val offered = maxRowsPerBatch match {
      case None => capped
      case Some(maxRows) =>
        val window = TableStore.versions(spark, root)
          .filter(v => v > base && v <= capped)
        // rows mode also EMITS removed rows (delete legs) — charge
        // them, or a rewrite-heavy commit blows the cap
        val rowsOf =
          if (rowFeed) TableStore.changedRowsByVersion(spark, root,
            base, capped)
          else TableStore.addedRowsByVersion(spark, root, base, capped)
        // walk stops at the FIRST over-budget commit: offsets are a
        // contiguous window, a later small commit cannot leapfrog it
        var cum = 0L
        var last = base
        var stopped = false
        window.foreach { v =>
          if (!stopped) {
            val r = rowsOf.getOrElse(v, 0L)
            if (last == base || cum + r <= maxRows) { cum += r; last = v }
            else stopped = true
          }
        }
        last
    }
    if (offered <= base || offered <= startingVersion) null
    else LongOffset(offered)
  }

  /** Legacy V1 polling path (not taken once SupportsAdmissionControl
    * is implemented) — uncapped latest; pacing lives in
    * [[latestOffset]], which knows the stream's position. */
  override def getOffset: Option[OffsetV1] =
    latestVisible.filter(_ > startingVersion).map(LongOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1)
      : DataFrame = {
    val toV = GraftStreamSource.version(end)
    val fromV = start.map(GraftStreamSource.version)
      .getOrElse(startingVersion)
    val batch =
      if (toV <= fromV) {
        val empty = TableStore.read(spark, root).limit(0)
          .withColumn("_commit_version", lit(0L))
        if (rowFeed) empty.withColumn("_op", lit("insert")) else empty
      }
      // rows mode: the NET delta of the window from the file-set diff
      // (readRowChanges) — updates arrive as delete+insert pairs, and
      // REWRITES (overwrite/delete/restore) flow through instead of
      // failing the stream, the CDC-consumer posture the mirror gates
      // prove in batch. Appends mode stays the cheaper adds-only scan.
      else if (rowFeed)
        TableStore.readRowChanges(spark, root, fromV, Some(toV))
          .withColumn("_commit_version", lit(toV))
      else TableStore.readChangesSince(spark, root, fromV, Some(toV))
    // pin the stream's fixed schema: columns added to the store
    // mid-stream are dropped, columns the window's files predate
    // resolve to null (the readAs posture — a stream cannot change
    // shape between batches)
    val cols = batch.columns.toSet
    val projected = batch.select(schema.fields.toIndexedSeq.map { sf =>
      if (cols.contains(sf.name)) col(sf.name)
      else lit(null).cast(sf.dataType).as(sf.name)
    }: _*)
    // appends mode: mark the scan leaves streaming — pushdown and
    // codegen flow through the parquet read. Rows mode: the net-delta
    // plan carries exceptAll set-ops the streaming planner refuses,
    // so the BATCH planner owns it and the engine sees one opaque
    // streaming leaf over the planned RDD.
    if (rowFeed) Bridge.streamingView(projected)
    else GraftStreamSource.asStreaming(spark, projected)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftStreamSource[$root, starting=$startingVersion" +
      maxVersionsPerBatch.map(m => s", maxVersionsPerBatch=$m")
        .getOrElse("") + "]"
}

object GraftStreamSource {

  /** The stream's fixed schema: the store's snapshot schema plus the
    * `_commit_version` provenance column the batch feed carries —
    * and, in rows mode, the `_op` column (insert/delete) of the
    * row-level feed. */
  def schemaFor(spark: SparkSession, root: String,
                rowFeed: Boolean = false): StructType = {
    val base = TableStore.read(spark, root).schema
    val reserved = Seq("_commit_version") ++
      (if (rowFeed) Seq("_op") else Nil)
    reserved.foreach(c => require(!base.fieldNames.contains(c),
      s"store at $root already has a $c column — it collides with " +
        "the feed's provenance columns"))
    val extra = StructField("_commit_version", LongType,
      nullable = false) +:
      (if (rowFeed)
         Seq(StructField("_op", org.apache.spark.sql.types.StringType,
           nullable = false))
       else Nil)
    StructType(base.fields ++ extra)
  }

  /** Engine offsets arrive either as our own [[LongOffset]] or as a
    * SerializedOffset replayed from the checkpoint JSON — LongOffset's
    * json is the bare number, so one parse covers both. */
  private[sources] def version(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  /** MicroBatchExecution asserts getBatch's plan `isStreaming`; the
    * feed is built from ordinary batch reads, so mark its leaf
    * relations — the FileStreamSource construction applied to an
    * already-assembled plan. */
  private[sources] def asStreaming(spark: SparkSession,
                                   df: DataFrame): DataFrame = {
    val marked = df.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case lr: LocalRelation => lr.copy(isStreaming = true)
    }
    Bridge.dataFrame(spark, marked)
  }
}
