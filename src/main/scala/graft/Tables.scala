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
  /** events.ts has shipped in two physical forms across testdata
    * generations: TIMESTAMP(NANOS) parquet (surfaced as an epoch-nanos
    * long via spark.sql.legacy.parquet.nanosAsLong in GraftSession) and
    * plain micros TIMESTAMP/TIMESTAMP_NTZ. Normalize both to a micros
    * TimestampType so every downstream operator sees one shape. The
    * nanos branch floors with exact integer division (a double division
    * would lose precision above 2^53 ns ≈ 104 days); the NTZ cast is
    * value-preserving because the session timezone is pinned UTC. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
