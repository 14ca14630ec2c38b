package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata layout (`TESTDATA.md`): one parquet
  * directory per table under an sf dir. Column pruning + predicate
  * pushdown reach the scan because these are plain parquet reads with
  * no intervening barriers.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet — surfaced as epoch-nanos
    * long via spark.sql.legacy.parquet.nanosAsLong (GraftSession), then
    * converted here with exact integer division (a double division
    * would lose precision above 2^53 ns ≈ 104 days). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    t(s, d, "events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
