package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Chunking, Sampling, TextOps}

/** The last mile of the training-data pipeline, as ONE composition:
  * clean documents → sliding-window chunks → seeded global shuffle →
  * shard routing → sharded JSONL on disk. Each stage is individually
  * oracle-gated (q_quality_score / q_lang_id, q_chunk_windows,
  * q_corpus_shards, q_jsonl_export); this composition is gated END TO
  * END by q_training_export: the oracle recomputes the whole pipeline
  * from the source parquet as a CTE chain, the Spark side digests
  * what it READS BACK from the files it wrote — so chunk boundaries,
  * shard routing, and write fidelity are all verified through two
  * independent stacks in one artifact.
  *
  * Scale shape: the clean filter and chunking are per-row (no
  * shuffle); the only Exchange is the hash repartition on `shard`
  * that routes chunks to writer tasks; in-partition sort by shuffle
  * priority makes every shard file byte-stable AND globally shuffled
  * (the training-order contract from [[graft.ops.Sampling]]). Never
  * a global sort, never a single writer.
  *
  * The chunk key is `doc_id · 100000 + chunk_id` — a stable unique
  * long (guarded: a document may not yield ≥ 100000 chunks) so the
  * shuffle/shard hash has a scalar key, same convention both engines
  * compute.
  */
object TrainingExport {

  val KeyStride = 100000L

  /** Run the composition over `docs` (doc_id, text, ...) and write
    * `numShards` JSONL shard directories under `outPath`
    * (shard_dir=N/part-*). Each JSON line carries
    * {shard, doc_id, chunk_id, chunk_text}. Returns the written
    * chunk DataFrame (pre-write plan) for reuse/inspection. */
  def run(spark: SparkSession, docs: DataFrame, outPath: String,
          minQualityMilli: Long, langs: Seq[String],
          chunkSize: Int, overlap: Int,
          seed: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val clean = docs
      .filter(TextOps.qualityMilli(col("text")) >= minQualityMilli &&
        TextOps.predictedLang(col("text")).isin(langs: _*))
    val chunks = Chunking.chunk(clean, "text", Seq("doc_id"),
      chunkSize, overlap)
    val keyed = chunks
      // the +coalesce(assert_true…, 0) keeps the guard inside the key
      // expression so column pruning can never drop it: a pathological
      // document with ≥ KeyStride chunks fails loudly, not by key
      // collision
      .withColumn("_k", col("doc_id") * KeyStride + col("chunk_id") +
        coalesce(assert_true(col("chunk_id") < KeyStride,
          lit(s"chunk_id exceeds key stride $KeyStride")).cast("long"),
          lit(0L)))
      .withColumn("shard", Sampling.shardOf(col("_k"), seed, numShards))
    val routed = keyed
      .withColumn("_pri", Sampling.shufflePriority(col("_k"), seed))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("_pri"), col("_k"))
    routed
      .select(to_json(struct(col("shard"), col("doc_id"),
        col("chunk_id"), col("chunk_text"))).as("value"),
        col("shard").as("shard_dir"))
      .write.mode("overwrite").partitionBy("shard_dir").text(outPath)
    // zero surviving chunks (empty corpus, or filters dropped all
    // docs) writes NO shard directories, and a `shard_dir=*` reader
    // glob then fails with PATH_NOT_FOUND instead of reading an empty
    // export; leave one empty shard directory so the layout contract
    // (readers glob shard dirs) holds on every input
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root) ||
        !fs.listStatus(root).exists(s =>
          s.isDirectory && s.getPath.getName.startsWith("shard_dir=")))
      fs.mkdirs(new org.apache.hadoop.fs.Path(root, "shard_dir=0"))
    keyed.select("shard", "doc_id", "chunk_id", "chunk_text")
  }
}
