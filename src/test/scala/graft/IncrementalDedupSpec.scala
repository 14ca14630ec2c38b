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
    val dir = java.nio.file.Files.createTempDirectory("graft_sig").toString
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
