package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document boilerplate (line-level) deduplication — the
  * C4/CCNet cleaning step: segment every document into fixed-width
  * token windows, count each segment's document frequency across the
  * corpus, and strip segments that recur in too many distinct
  * documents (navigation chrome, license headers, cookie banners).
  * The reference corpus has no newline structure, so the "line" unit
  * here is a deterministic fixed-`w`-token window — the same operator
  * shape with a segmentation both engines can replay exactly.
  *
  * Scale shape at 100 TB:
  *  - ONE explode of (doc_id, ord, seg); the document-frequency
  *    aggregate is map-side combinable (partial countDistinct) and
  *    shuffles only (seg, doc_id) pairs, never full bodies;
  *  - the frequent-segment set is a small fraction of the corpus by
  *    construction (only segments shared by >= minDocs documents);
  *    AQE converts the scrub join to broadcast when it fits, and the
  *    fallback is a plain shuffled hash join keyed on the segment —
  *    at petabyte scale you'd key this on a 128-bit fingerprint of
  *    the segment instead of the string to narrow the shuffle;
  *  - reassembly is one groupBy(doc_id): collect_list over an
  *    already-doc-partitioned frame, sorted in-memory per doc by the
  *    bounded segment ordinal (docs are bounded; corpora are not).
  *
  * Determinism: segment boundaries depend only on `w` and the token
  * stream; reassembly orders by the explicit per-doc ordinal, never
  * by collection order.
  */
object LineDedup {

  /** Fixed-width token segmentation: ceil(n/w) windows of w tokens
    * (last window ragged), each a zero-copy slice of the input —
    * [[graft.functions.TokenSegments]], one codegen'd pass. (The HOF
    * formulation — transform over sequence with split inlined into
    * the lambda — re-evaluated the split per element after
    * CollapseProject: O(segs·tokens) per row, measured 12×/decade
    * superlinear at sf1 before the replacement.) */
  def segments(text: Column, w: Int): Column = {
    require(w >= 1, s"segment width must be >= 1, got $w")
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.TokenSegments(Bridge.expression(text), w))
  }

  /** One row per (doc, segment) with the 1-based in-doc ordinal. */
  def explodeSegments(docs: DataFrame, idCol: String, textCol: String,
                      w: Int): DataFrame =
    docs.select(
      col(idCol),
      posexplode(segments(col(textCol), w)).as(Seq("_ord0", "seg")))
      .withColumn("ord", col("_ord0") + lit(1)).drop("_ord0")

  /** Segments appearing in >= minDocs DISTINCT documents, with their
    * document frequency. Within-doc repeats count once. */
  def boilerplate(segs: DataFrame, idCol: String, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 marks unique text boilerplate: $minDocs")
    segs.groupBy("seg")
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
  }

  /** Scrub exploded segments against a boilerplate lexicon `bp`
    * ((seg) rows) and summarize per doc: total segments, kept
    * segments, md5 of the rebuilt text (kept segments re-joined in
    * ordinal order; fully-scrubbed docs hash ""). */
  private def scrubAgainst(ex: DataFrame, bp: DataFrame,
                           idCol: String): DataFrame =
    ex.join(bp.select(col("seg"), lit(true).as("_bp")), Seq("seg"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("_bp").isNull, 1L).otherwise(0L)).as("kept_segs"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(col("_bp").isNull, struct(col("ord"), col("seg"))))),
            x => x.getField("seg")),
          " ")).as("new_md5"))

  /** Strip boilerplate segments and summarize per document. */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            w: Int, minDocs: Int): DataFrame = {
    val ex = explodeSegments(docs, idCol, textCol, w)
    scrubAgainst(ex, boilerplate(ex, idCol, minDocs), idCol)
  }

  // ----- incremental loop: the per-batch segment-DF store ----------
  //
  // Same operational contract as Dedup's fingerprint/signature
  // stores: one directory partitioned by batch_id, dynamic-overwrite
  // writes so a retried batch rewrites exactly its own partition;
  // the caller owns batch-id assignment, doc ids must be disjoint
  // across batches and each doc arrives in exactly one batch (the
  // per-batch distinct counts sum to corpus document frequency only
  // under that contract).

  /** Append a batch's per-segment distinct-doc counts to the store. */
  def updateSegmentStore(docs: DataFrame, idCol: String, textCol: String,
                         w: Int, path: String, batchId: Long): Unit = {
    val profile = explodeSegments(docs, idCol, textCol, w)
      .groupBy("seg").agg(countDistinct(col(idCol)).as("n_docs"))
      .withColumn("batch_id", lit(batchId))
    profile.write.partitionBy("batch_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)
    // empty-first-batch stores keep a readable schema (see
    // [[Partitioned.anchorSchema]])
    Partitioned.anchorSchema(profile, path)
  }

  def readSegmentStore(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental scrub: clean a NEW batch against corpus-wide
    * document frequency = stored history counts + the batch's own —
    * without re-segmenting one byte of history (history text is
    * never read; only its profile-sized (seg, n_docs) rows). The
    * lexicon a batch sees is the corpus DF as of its ingest — the
    * operational semantics of a monotone boilerplate lexicon; the
    * one-shot [[scrub]] over the same union sees the identical
    * lexicon, so batch outputs agree exactly (chain-equivalence
    * spec-pinned). */
  def incrementalScrub(store: DataFrame, batch: DataFrame,
                       idCol: String, textCol: String,
                       w: Int, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 marks unique text boilerplate: $minDocs")
    val ex = explodeSegments(batch, idCol, textCol, w)
    val dfBatch = ex.groupBy("seg")
      .agg(countDistinct(col(idCol)).as("_nb"))
    val dfHist = store.groupBy("seg").agg(sum(col("n_docs")).as("_nh"))
    val bp = dfBatch.join(dfHist, Seq("seg"), "full_outer")
      .filter(coalesce(col("_nb"), lit(0L)) +
        coalesce(col("_nh"), lit(0L)) >= minDocs)
      .select("seg")
    scrubAgainst(ex, bp, idCol)
  }
}
