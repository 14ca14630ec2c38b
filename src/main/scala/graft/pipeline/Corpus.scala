package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Checkpoints, Contamination, Dedup, Sampling, TextOps}

/** The training-data corpus pipeline — the LLM-data analogue of the
  * churn [[Warehouse]]: the standard pre-training cleanup funnel
  * composed from the engine's dedup/quality/lang operators, with the
  * per-stage drop accounting a data curator audits.
  *
  * Stages (each one a documented scale shape):
  *  1. exact dedup — md5 content-hash groupBy, min-id survivor;
  *  2. near-dup dedup — MinHash-LSH pair discovery (skew-capped:
  *     this is the production path, so oversized buckets are dropped
  *     per the [[Dedup.bucketPairs]] contract) → connected components
  *     → cluster-survivor filter;
  *  3. decontamination (when an eval set is supplied) — word-n-gram
  *     overlap against the broadcast benchmark shingles;
  *  4. quality filter — per-mille heuristic scores, codegen'd
  *     projection;
  *  5. language filter — profile argmax against an allow-list;
  *  6. per-domain cap (when a domain column is supplied) —
  *     hash-priority selection against domain flooding.
  *
  * Order matters and is the conventional one: exact first (cheapest,
  * biggest mass), then near-dup on the survivors (shrinks the LSH
  * input), then decontamination on the deduped set (shrinks the
  * shingle explode), then row-local filters, then the cap on what
  * actually survives (capping earlier would let later drops pull
  * domains below their cap).
  *
  * Each stage output is materialized once (eager localCheckpoint):
  * the funnel counts, the next stage, and the returned frame all read
  * the materialized result instead of replaying the upstream funnel
  * per consumer; the out-count of one stage IS the in-count of the
  * next (one counting job per stage, not two). A stage's checkpoint
  * is EVICTED as soon as the next stage's is materialized — a
  * checkpoint truncates lineage, so once stage N+1 is physical,
  * stage N's blocks serve nobody, and leaving them pinned is the
  * session-state leak the r7 bench measured (late queries taxed by
  * accumulated block-manager residue). Only the final result's
  * checkpoint survives the call; release it with [[Result.unpersist]]
  * when done.
  */
object Corpus {

  /** Per-stage drop accounting. `out_id_sum` is the sum of surviving
    * doc_ids — a membership signature, so an audit (and the funnel's
    * DuckDB oracle) can tell "right count, wrong survivors" from a
    * genuine match; it rides the same single aggregate job as the
    * count. */
  final case class Funnel(stage: String, docs_in: Long, docs_out: Long,
                          out_id_sum: Long)

  /** Not a case class: the pinned-block ids must survive exactly as
    * captured at construction — a `copy()` would silently reset them
    * and turn [[unpersist]] into a no-op. */
  final class Result(val cleaned: DataFrame, val funnel: Seq[Funnel],
                     cleanedRddIds: Set[Int]) {
    /** Release the final stage's pinned checkpoint blocks once
      * `cleaned` has been written/consumed. */
    def unpersist(): Unit = {
      val sc = cleaned.sparkSession.sparkContext
      cleanedRddIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
  }

  /** Shared stage machinery for [[run]] and [[runBatch]]: per-stage
    * eager localCheckpoint + one (count, id-sum) aggregate job, with
    * the eviction discipline the r7 leak hunt established — a stage's
    * checkpoint blocks are released the moment the next stage's are
    * physical, and EVERY failure path evicts everything this runner
    * created before rethrowing.
    *
    * The RDD-id-diff attribution assumes no OTHER thread persists
    * RDDs on this SparkContext between snapshots — concurrent
    * persists landing in the window would be evicted as ours. Run a
    * funnel from one thread (its stages are serial anyway). */
  private final class StageRunner(spark: SparkSession, docs: DataFrame) {
    private val sc = spark.sparkContext
    private val preexisting = sc.getPersistentRDDs.keySet.toSet
    private var ours: Set[Int] = Set.empty
    private val funnel = Seq.newBuilder[Funnel]

    /** Evict every block this runner created; call before rethrowing
      * on any failure after the stages (e.g. a failed store write). */
    def failCleanup(): Unit = {
      ours = sc.getPersistentRDDs.keySet.toSet -- preexisting
      ours.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      ours = Set.empty
    }

    // count + membership signature in ONE aggregate job per stage
    private def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(col("doc_id")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var current: DataFrame = docs.localCheckpoint()
    private var currentCount =
      try current.count()
      catch { case t: Throwable => failCleanup(); throw t }
    ours = sc.getPersistentRDDs.keySet.toSet -- preexisting

    def staged(name: String)(f: DataFrame => DataFrame): Unit = {
      // label the stage's jobs (guide §1.5) — setJobDescription is
      // thread-local, cleared in the finally below
      sc.setJobDescription(s"corpus: $name")
      val (outCount, outIdSum) =
        try {
          val out = f(current).localCheckpoint()
          val s = stats(out) // materializes the new checkpoint
          current = out
          s
        } catch { case t: Throwable =>
          // a failed stage returns no Result, so nothing could ever
          // release the pinned blocks — evict everything this run
          // created (including the partial stage's) before rethrowing
          failCleanup()
          throw t
        }
      // the new checkpoint is physical: evict everything this run
      // pinned before it (previous stage's output + stage internals)
      ours.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      ours = sc.getPersistentRDDs.keySet.toSet -- preexisting
      funnel += Funnel(name, currentCount, outCount, outIdSum)
      currentCount = outCount
      sc.setJobDescription(null)
    }

    def result(): Result = new Result(current, funnel.result(), ours)
  }

  def run(spark: SparkSession, docs: DataFrame,
          shingleK: Int = 3, numHashes: Int = 64,
          bands: Int = 16, rowsPerBand: Int = 4,
          nearDupMille: Int = 850, minQualityMilli: Long = 800L,
          langs: Seq[String] = Seq("en"),
          maxBucket: Int = 10000,
          evalDocs: Option[DataFrame] = None,
          contaminationK: Int = 5,
          contaminationMille: Int = 500,
          domainCap: Option[(String, Int)] = None): Result = {
    val runner = new StageRunner(spark, docs)
    import runner.staged

    // 1. exact dedup: survivors carry the min id per content hash.
    // One window pass (hash-shuffle on the fingerprint, min-id within
    // the frame) instead of Dedup.exact's groupBy + semi-join back —
    // same survivors by definition, one full-data shuffle instead of
    // a metadata shuffle plus a full-data join (guide §2.4).
    staged("exact_dedup") { d =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(Dedup.fingerprint(col("text")))
      d.withColumn("_keep", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("_keep"))
        .drop("_keep")
    }

    // 2. near-dup dedup: LSH pairs → components → cluster survivors
    staged("neardup_dedup") { d =>
      val pairs = Dedup.lshNearDupPairs(d, "doc_id", "text",
        shingleK, numHashes, bands, rowsPerBand, nearDupMille,
        maxBucket = Some(maxBucket))
      val survivors = Dedup
        .connectedComponents(d.select("doc_id"), "doc_id",
          pairs, "id_a", "id_b")
        .filter(col("is_survivor") === 1)
        .select("doc_id")
      d.join(survivors, Seq("doc_id"), "left_semi")
    }

    // 3. decontamination vs the supplied benchmark set
    evalDocs.foreach { ev =>
      staged("decontaminate")(d =>
        Contamination.decontaminate(d, ev, "doc_id", "text",
          contaminationK, contaminationMille))
    }

    // 4. quality filter (row-local projection). The upstream stage
    // checkpoints collapse to few partitions (AQE-coalesced joins), so
    // this CPU-heavy scan would run near-serial — hash-spread it back
    // onto the cores first (guide §2.5; the Tables.spread guard:
    // no-op when the input is already as wide as the session).
    staged("quality_filter")(d =>
      graft.Tables.spread(spark, d, "doc_id")
        .filter(TextOps.qualityMilli(col("text")) >= minQualityMilli))

    // 5. language filter (row-local argmax vs allow-list; same
    // spread posture as the quality stage)
    staged("lang_filter")(d =>
      graft.Tables.spread(spark, d, "doc_id")
        .filter(TextOps.predictedLang(col("text")).isin(langs: _*)))

    // 6. per-domain cap on the survivors
    domainCap.foreach { case (domainCol, cap) =>
      staged("domain_cap")(
        Sampling.domainCap(_, col(domainCol), col("doc_id"), cap))
    }

    runner.result()
  }

  /** One operational ingest tick — the incremental twin of [[run]]:
    * clean a NEW batch against the corpus's persisted signature store
    * ([[Dedup.updateSignatureStore]] layout) instead of re-shingling
    * history, then append the batch's signatures so the NEXT tick
    * treats this one as history.
    *
    * Stage semantics vs the full funnel:
    *  - exact dedup runs within the batch (cross-batch exact dups are
    *    jaccard-1000 near-dups and drop in the next stage);
    *  - near-dup discovery goes through
    *    [[Dedup.incrementalNearDupPairs]] — only the batch is
    *    shingled; history text (`historyText`) is touched only for
    *    candidate verifies and must cover every id the store has
    *    EVER been fed (raw batches, not just survivors — the store
    *    keeps dropped docs' signatures; see the store-update note).
    *    A batch doc drops if its near-dup cluster
    *    contains ANY history doc ("history wins" — with monotone ids
    *    across batches that is exactly the full funnel's min-id
    *    survivor rule), else the cluster minimum survives;
    *  - the row-local stages (decontaminate/quality/lang) and the cap
    *    are unchanged — note a per-batch domain cap bounds each batch,
    *    not the historical total (a global cap needs a count store —
    *    out of scope here);
    *  - the store update appends signatures of the RAW batch, not
    *    just the final survivors: the full funnel clusters FIRST and
    *    filters later, so a future doc near-dupping a quality- or
    *    dedup-dropped doc must still drop — storing pre-filter
    *    signatures preserves that transitivity (chains through
    *    dropped docs resolve exactly as one big run would; exact dups
    *    contribute identical signatures, redundant but harmless).
    *    Sequential runBatch ticks ≡ one full run on the union — the
    *    equivalence CorpusSpec pins.
    *
    * Crash safety: the store update is the LAST step; a crash before
    * it leaves the store untouched, and the retried tick recomputes
    * the same survivors (everything is deterministic) and overwrites
    * its own `batchId` partition idempotently.
    */
  def runBatch(spark: SparkSession, newDocs: DataFrame,
               historyText: DataFrame,
               storePath: String, batchId: Long,
               shingleK: Int = 3, numHashes: Int = 64,
               bands: Int = 16, rowsPerBand: Int = 4,
               nearDupMille: Int = 850, minQualityMilli: Long = 800L,
               langs: Seq[String] = Seq("en"),
               maxBucket: Int = 10000,
               evalDocs: Option[DataFrame] = None,
               contaminationK: Int = 5,
               contaminationMille: Int = 500,
               domainCap: Option[(String, Int)] = None,
               fpStorePath: Option[String] = None): Result = {
    // ONE source scan and ONE signature pass over the batch per
    // tick: the batch checkpoint feeds the signature build, the
    // funnel, AND the end-of-tick fingerprint-store write (which
    // would otherwise re-scan the source lineage — a full re-read of
    // a streaming micro-batch); the signature checkpoint feeds both
    // the near-dup probe and the signature-store write
    // (shingle-explode + numHashes aggregation is the tick's dominant
    // per-row cost). Both checkpointed BEFORE the StageRunner exists
    // so the runner's per-stage eviction never touches them; both
    // released in the finally.
    val batchDocs = newDocs.localCheckpoint()
    val batchSigs = Dedup
      .signatures(batchDocs, "doc_id", "text", shingleK, numHashes)
      .localCheckpoint()
    def releaseSigs(): Unit = {
      Checkpoints.release(batchDocs)
      Checkpoints.release(batchSigs)
    }
    try {
    val runner = new StageRunner(spark, batchDocs)
    import runner.staged

    staged("exact_dedup") { d =>
      val keep = Dedup.exact(d, "text", "doc_id")
        .select(col("keep_id").as("doc_id"))
      d.join(keep, Seq("doc_id"), "left_semi")
    }

    // optional cheap pre-filter ([[Dedup.incrementalExact]]'s history
    // half): exact re-ingests of corpus content drop on one
    // fixed-width fp anti-join before the MinHash path prices them.
    // Pure optimization — the near-dup stage would drop the same docs
    // (a jaccard-1000 pair to stored history), so survivors are
    // unchanged with or without the fp store; transitive chains stay
    // intact because the HISTORY copy's signature is still in the
    // signature store.
    fpStorePath.foreach { fp =>
      staged("exact_vs_history") { d =>
        // exclude THIS tick's batch_id: a retry after a crashed
        // attempt's store write must not read its own fingerprints as
        // history (it would anti-join the ENTIRE batch away)
        val known = storeOrEmpty(spark, fp,
            Dedup.exact(d.limit(0), "text", "doc_id")
              .select(col("fp"), col("keep_id")))
          .filter(col("batch_id") =!= lit(batchId))
          .select(col("fp").as("_hfp")).distinct()
        d.join(known, Dedup.fingerprint(col("text")) === col("_hfp"),
          "left_anti")
      }
    }

    staged("neardup_vs_history") { d =>
      // same retry shield as the fp stage: never read this tick's own
      // (possibly crashed-attempt) partition as history — its
      // signatures would flag in-batch clusters as history-containing
      // and silently drop legitimate survivors
      val store = storeOrEmpty(spark, storePath, batchSigs.limit(0))
        .filter(col("batch_id") =!= lit(batchId))
      // probe with the precomputed signatures of the docs still in
      // play (exact/fp drops carry identical or already-known content
      // — their signatures add nothing to discovery)
      val probeSigs = batchSigs
        .join(d.select("doc_id"), Seq("doc_id"), "left_semi")
      val pairs = Dedup.incrementalNearDupPairsFromSigs(
        store, probeSigs, historyText.select("doc_id", "text")
          .unionByName(d.select("doc_id", "text")),
        "doc_id", "text", shingleK, bands, rowsPerBand,
        nearDupMille, maxBucket = Some(maxBucket),
        numHashes = numHashes)
      // components over batch ids + every history id the pairs touch
      // (history singletons don't affect batch survivorship)
      val batchIds = d.select("doc_id")
      val nodes = batchIds
        .unionByName(pairs.select(col("id_a").as("doc_id")))
        .unionByName(pairs.select(col("id_b").as("doc_id")))
        .distinct()
      val comp = Dedup.connectedComponents(nodes, "doc_id",
        pairs, "id_a", "id_b")
      val flagged = comp.join(
        batchIds.withColumn("_b", lit(true)), Seq("doc_id"), "left")
      val clusterHasHistory = flagged.groupBy("cluster_id")
        .agg(max(when(col("_b").isNull, 1).otherwise(0)).as("_hh"))
      val keep = flagged.filter(col("_b").isNotNull)
        .join(clusterHasHistory, Seq("cluster_id"))
        .filter(col("_hh") === 0 && col("is_survivor") === 1)
        .select("doc_id")
      d.join(keep, Seq("doc_id"), "left_semi")
    }

    evalDocs.foreach { ev =>
      staged("decontaminate")(d =>
        Contamination.decontaminate(d, ev, "doc_id", "text",
          contaminationK, contaminationMille))
    }
    staged("quality_filter")(
      _.filter(TextOps.qualityMilli(col("text")) >= minQualityMilli))
    staged("lang_filter")(
      _.filter(TextOps.predictedLang(col("text")).isin(langs: _*)))
    domainCap.foreach { case (domainCol, cap) =>
      staged("domain_cap")(
        Sampling.domainCap(_, col(domainCol), col("doc_id"), cap))
    }

    // LAST step: a crash before this leaves the stores untouched
    // (and the retry shield above makes a crash AFTER it harmless)
    try {
      Dedup.updateSignatureStore(batchSigs, storePath, batchId)
      fpStorePath.foreach(fp =>
        Dedup.updateFingerprintStore(batchDocs, "text", "doc_id", fp, batchId))
    } catch { case t: Throwable => runner.failCleanup(); throw t }

    runner.result()
    } finally releaseSigs()
  }

  /** Read a batch-partitioned store, or a schema-correct empty frame
    * when the path holds no COMMITTED data yet — the first tick of a
    * fresh ingest loop runs against no history and bootstraps the
    * store itself; demanding a pre-seeded store would push a second,
    * different bootstrap code path onto every operator.
    *
    * "Committed" means a `batch_id=` partition directory exists: a
    * crash DURING the first-ever store write leaves the path with
    * only staging residue (`_temporary`), and a bare existence check
    * would then throw unable-to-infer-schema on every replay —
    * wedging the exactly-once loop on precisely the crash it
    * promises to absorb. Partition dirs only appear at job commit,
    * so their presence is the commit marker. */
  private def storeOrEmpty(spark: SparkSession, path: String,
                           empty: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    if (committed) spark.read.parquet(path)
    else empty.withColumn("batch_id", lit(-1L))
  }

  /** Continuous corpus ingest: every micro-batch of `docsStream`
    * (columns `doc_id`, `text` — wire any source: file sensor, Kafka,
    * a CDC feed) runs one [[runBatch]] tick against the accumulated
    * history, then appends the tick's survivors to `corpusPath` and
    * its raw input to `rawPath`, both as `batch_id=<id>` partitions.
    *
    * Exactly-once corpus growth over at-least-once replays, with the
    * streaming batch id as the idempotency key end to end:
    *  - the signature/fingerprint store updates inside [[runBatch]]
    *    dynamic-overwrite their own partition and the history reads
    *    exclude it (the retry shield), so a replayed tick never sees
    *    its crashed attempt;
    *  - the corpus/raw appends here are dynamic partition overwrites
    *    of the SAME batch id — a replay rewrites, never duplicates;
    *  - the history read takes `batch_id < id` (strict), so a replay
    *    whose raw append already landed still excludes itself.
    * A crash at ANY point therefore converges on the clean tick's
    * output when the stream restarts from its checkpoint.
    *
    * The per-stage [[Funnel]] accounting goes to `onTick` (default:
    * discarded) — wire it to a ledger sink for curation audits.
    */
  def ingestStream(docsStream: DataFrame,
                   rawPath: String, corpusPath: String,
                   storePath: String, fpStorePath: String,
                   checkpointDir: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                   langs: Seq[String] = Seq("en"),
                   minQualityMilli: Long = 800L,
                   nearDupMille: Int = 850,
                   onTick: (Long, Seq[Funnel]) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docsStream.sparkSession
    val tick: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      Long) => Unit = { (batch, bid) =>
      val docs = batch.select("doc_id", "text")
      val history = storeOrEmpty(spark, rawPath, docs.limit(0))
        .filter(col("batch_id") < lit(bid))
        .select("doc_id", "text")
      val res = runBatch(spark, docs, history, storePath, bid,
        nearDupMille = nearDupMille, langs = langs,
        minQualityMilli = minQualityMilli,
        fpStorePath = Some(fpStorePath))
      try {
        res.cleaned.select("doc_id", "text")
          .withColumn("batch_id", lit(bid))
          .write.partitionBy("batch_id").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(corpusPath)
        docs.withColumn("batch_id", lit(bid))
          .write.partitionBy("batch_id").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(rawPath)
        onTick(bid, res.funnel)
      } finally res.unpersist()
    }
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(tick)
      .start()
  }
}
