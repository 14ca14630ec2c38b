package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Incremental near-dup against a persisted signature store: the
  * batch path must find exactly the pairs a full recompute would find
  * that touch the batch — after a real parquet round-trip of the
  * store, since that is how production holds it.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val K = 3; private val NumHashes = 64
  private val Bands = 16; private val RowsPerBand = 4

  test("incremental pairs ≡ full-corpus pairs touching the new batch") {
    val docs = Tables.documents(spark, TinySf)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)

    // store round-trip: signatures persisted once, read back cold
    val dir = graft.TempRoots.create("graft_sig")
    Dedup.signatures(old, "doc_id", "text", K, NumHashes)
      .write.mode("overwrite").parquet(s"$dir/sigs.parquet")
    val store = spark.read.parquet(s"$dir/sigs.parquet")

    val incremental = rowsAsSet(Dedup.incrementalNearDupPairs(
      store, fresh, docs, "doc_id", "text",
      K, NumHashes, Bands, RowsPerBand, minMille = 850, maxBucket = None))

    val full = rowsAsSet(Dedup.lshNearDupPairs(docs, "doc_id", "text",
        K, NumHashes, Bands, RowsPerBand, minMille = 850, maxBucket = None)
      .filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0))

    assert(incremental == full)
    assert(incremental.nonEmpty,
      "fixture has no cross-batch near-dups; the test proves nothing")
  }

  test("two consecutive batches: batch 2 treats batch 1 as history") {
    val docs = Tables.documents(spark, TinySf)
    val base = docs.filter(col("doc_id") % 5 > 1)    // 60%
    val batch1 = docs.filter(col("doc_id") % 5 === 0) // 20%
    val batch2 = docs.filter(col("doc_id") % 5 === 1) // 20%
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_sig2"))
      .toString + "/store"

    // bootstrap: the base corpus is batch 0 of the store
    Dedup.updateSignatureStore(
      Dedup.signatures(base, "doc_id", "text", K, NumHashes), dir, 0L)

    // batch 1 probes the store (base only), then its signatures are
    // appended — the operational loop's write half
    val pairs1 = rowsAsSet(Dedup.incrementalNearDupPairs(
      Dedup.readSignatureStore(spark, dir), batch1,
      base.unionByName(batch1), "doc_id", "text",
      K, NumHashes, Bands, RowsPerBand, minMille = 850, maxBucket = None))
    Dedup.updateSignatureStore(
      Dedup.signatures(batch1, "doc_id", "text", K, NumHashes), dir, 1L)

    // retried update of the SAME batch must be a no-op (dynamic
    // partition overwrite rewrites batch_id=1, never duplicates it)
    val rowsAfter1 = Dedup.readSignatureStore(spark, dir).count()
    Dedup.updateSignatureStore(
      Dedup.signatures(batch1, "doc_id", "text", K, NumHashes), dir, 1L)
    assert(Dedup.readSignatureStore(spark, dir).count() == rowsAfter1,
      "retried batch update duplicated store signatures")

    // batch 2 probes the updated store: batch-1 docs are HISTORY now
    // (their signatures come from parquet, their text is only read
    // for candidate verifies), so batch1-batch2 pairs must surface
    val store2 = Dedup.readSignatureStore(spark, dir)
    assert(store2.select("batch_id").distinct().count() == 2)
    val pairs2 = rowsAsSet(Dedup.incrementalNearDupPairs(
      store2, batch2, docs, "doc_id", "text",
      K, NumHashes, Bands, RowsPerBand, minMille = 850, maxBucket = None))

    // accumulation across the loop ≡ one full recompute: base-base
    // pairs (the store bootstrap's job) plus batch-1-touching pairs
    // plus batch-2-touching pairs cover the full pair set exactly
    val pairs0 = rowsAsSet(Dedup.lshNearDupPairs(base, "doc_id", "text",
      K, NumHashes, Bands, RowsPerBand, minMille = 850, maxBucket = None))
    val full = rowsAsSet(Dedup.lshNearDupPairs(docs, "doc_id", "text",
      K, NumHashes, Bands, RowsPerBand, minMille = 850, maxBucket = None))
    assert((pairs0 ++ pairs1 ++ pairs2) == full)
    assert(pairs1.nonEmpty && pairs2.nonEmpty,
      "fixture has no cross-batch near-dups; the test proves nothing")
  }

  test("old-old pairs are excluded even when buckets contain them") {
    val docs = Tables.documents(spark, TinySf)
    val store = Dedup.signatures(docs, "doc_id", "text", K, NumHashes)
    // empty batch: no pair can touch it
    val none = Dedup.incrementalNearDupPairs(
      store, docs.filter(lit(false)), docs, "doc_id", "text",
      K, NumHashes, Bands, RowsPerBand, minMille = 0, maxBucket = None)
    assert(none.count() == 0)
  }
}
