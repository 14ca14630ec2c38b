package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TableStore

/** `format("graft")` — the path-addressed way into a versioned store
  * (the catalog-free twin of [[GraftCatalog]]):
  *
  * {{{
  *   spark.read.format("graft").load("/data/events")               // latest
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load("/data/events")              // pinned
  *   spark.read.format("graft")
  *     .option("timestampAsOf", millis).load("/data/events")
  * }}}
  *
  * Registered in META-INF/services, so the short name resolves
  * without any session config. Reads share the exact machinery of
  * the catalog path: a version-pinned [[GraftStoreTable]], rewritten
  * to the native pruned parquet scan when the extensions are
  * installed, V1Scan-delegated otherwise.
  */
class GraftSource extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "graft"

  private def table(options: CaseInsensitiveStringMap,
                    provided: Option[StructType] = None): GraftStoreTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft source needs a store path: .load(\"/path/to/store\")"))
    val byVersion = Option(options.get("versionAsOf")).map(v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"versionAsOf takes a commit version number, got '$v'")))
    val byTime = Option(options.get("timestampAsOf")).map(t =>
      TableStore.versionAt(SparkSession.active, path,
        t.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"timestampAsOf takes epoch millis, got '$t'"))))
    require(byVersion.isEmpty || byTime.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    new GraftStoreTable(path, byVersion.orElse(byTime), provided)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    table(options).schema

  /** `schema` arrives from the writer (`df.write.format("graft")`
    * passes the frame's schema — how a FIRST write to a fresh path
    * knows its shape before any commit exists) or from an explicit
    * `.schema(...)`; an existing store's own schema always wins over
    * it (the log is the source of truth — see
    * [[GraftStoreTable.schema]]). */
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    table(new CaseInsensitiveStringMap(properties),
      Option(schema).filter(_.nonEmpty))

  override def supportsExternalMetadata(): Boolean = true

  // ---- streaming SOURCE: `spark.readStream.format("graft")` ----

  private def streamPath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft stream source needs a store path: .load(\"/path/to/store\")"))

  override def sourceSchema(ctx: org.apache.spark.sql.SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "the graft stream source derives its schema from the store's " +
        "commit log — drop .schema(...)")
    (shortName(),
      GraftStreamSource.schemaFor(ctx.sparkSession, streamPath(parameters),
        rowFeedOf(parameters)))
  }

  private def rowFeedOf(parameters: Map[String, String]): Boolean =
    parameters.get("feed") match {
      case None | Some("appends") => false
      case Some("rows") => true
      case Some(other) => throw new IllegalArgumentException(
        s"feed takes 'appends' (default — adds-only, rewrites are " +
          s"loud) or 'rows' (net row deltas with _op, rewrites flow " +
          s"through), got '$other'")
    }

  /** One [[GraftStreamSource]] per query: commits become micro-batch
    * offsets. Options: `startingVersion` (default 0 = the full
    * history; N = only commits AFTER version N),
    * `maxVersionsPerBatch` (rate limit — how many commits one
    * micro-batch may drain), `maxRowsPerBatch` (ROW-based admission
    * from the log's footer row counts — bounds batches under skewed
    * commit sizes; a single commit larger than the cap still lands
    * whole, commits are the atom), and `feed` (`appends` default /
    * `rows` for the CDC row feed with `_op`). */
  override def createSource(ctx: org.apache.spark.sql.SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    def longOpt(key: String): Option[Long] = parameters.get(key).map(v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"$key takes a commit version count, got '$v'")))
    val starting = longOpt("startingVersion").getOrElse(0L)
    require(starting >= 0, s"startingVersion must be >= 0: $starting")
    val maxPer = longOpt("maxVersionsPerBatch")
    maxPer.foreach(m => require(m >= 1,
      s"maxVersionsPerBatch must be >= 1: $m"))
    val maxRows = longOpt("maxRowsPerBatch")
    maxRows.foreach(m => require(m >= 1,
      s"maxRowsPerBatch must be >= 1: $m"))
    new GraftStreamSource(ctx.sparkSession, streamPath(parameters),
      starting, maxPer, rowFeedOf(parameters), maxRows)
  }

  /** `writeStream.format("graft").start(root)` — one
    * [[GraftStreamSink]] per query: micro-batches become batch-id'd
    * store commits (exactly-once through the ledger). Options:
    * `statsCols`, and `maxLiveFiles`/`targetBytes` for self-healing
    * small-file maintenance. */
  override def createSink(ctx: org.apache.spark.sql.SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "the graft sink takes no partitionBy — physical layout is " +
        "OPTIMIZE's job (optimizeLayout/optimizeLayoutWhere), not " +
        "the ingest path's")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"the graft sink is append-only (each micro-batch is one store " +
        s"commit); got $outputMode — aggregate downstream with " +
        "DerivedView ticks instead of Complete/Update modes")
    val root = streamPath(parameters)
    val stats = parameters.get("statsCols").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val maint = parameters.get("maxLiveFiles").map { m =>
      TableStore.SinkMaintenance(
        maxLiveFiles = m.toIntOption.getOrElse(
          throw new IllegalArgumentException(
            s"maxLiveFiles takes a file count, got '$m'")),
        targetBytes = parameters.get("targetBytes")
          .map(_.toLongOption.getOrElse(
            throw new IllegalArgumentException(
              "targetBytes takes a byte count")))
          .getOrElse(128L << 20))
    }
    new GraftStreamSink(ctx.sparkSession, root, stats, maint)
  }
}
