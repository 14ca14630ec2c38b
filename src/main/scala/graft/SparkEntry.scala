package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * extensions) registers one named query here via a [[QueryPack]];
  * each SQL-expressible one also carries a DuckDB oracle with matching
  * column aliases (the driver sorts columns by name and hash-compares
  * values).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    StarQueries, ValidateQueries, AggQueries, JoinQueries,
    WindowQueries, FuncQueries, UpsertQueries,
    DedupQueries, TextQueries, SimilarityQueries, CsvQueries,
    PartitionQueries, BinaryQueries, SkewQueries, SampleQueries,
    TemporalQueries, SketchQueries, CorpusQueries, ScdQueries,
    LayoutQueries, RetrievalQueries, EvalQueries, StreamQueries,
    SqlQueries)

  private[graft] lazy val registry: Seq[GQuery] = packs.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.starFactLoad.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Written-fixture oracles render against [[OracleContext.sfDir]]
    * (set by Verify from argv) so they gate at any scale factor. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q =>
      q.oracleAt.map(_(OracleContext.sfDir)).orElse(q.oracle)
        .map(q.name -> _.trim)).toMap

  /** Subset timed by Bench (headline queries). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.filter(_.bench).map(q => q.name -> q.run).toMap

  /** Untimed fixture setup for benched queries (run before timing). */
  def benchPrepares: Map[String, (SparkSession, String) => Unit] =
    registry.filter(_.bench).flatMap(q => q.prepare.map(q.name -> _)).toMap

  /** Every query's prepare, including bench=false evidence fixtures —
    * for SPARK_GRAFT_BENCH_ONLY solo measurement of any registry
    * query. */
  def allPrepares: Map[String, (SparkSession, String) => Unit] =
    registry.flatMap(q => q.prepare.map(q.name -> _)).toMap

  /** name -> (family, eager) for bench reporting. Family is the
    * owning [[QueryPack]] (lower-cased, "Queries" suffix dropped);
    * eager marks ops-GATE fixtures — bodies that execute Spark jobs
    * (store builds, merges, ticks) at construction time, where the
    * measured cost is dominated by fixture I/O rather than the plan
    * under test. Bench splits its headline along this axis so the
    * round-over-round comparison tracks plan health, not fixture
    * volume. */
  def queryMeta: Map[String, (String, Boolean)] =
    packs.flatMap { p =>
      val fam = p.getClass.getSimpleName
        .stripSuffix("$").stripSuffix("Queries").toLowerCase
      p.all.map(q => q.name -> (fam, q.eager))
    }.toMap
}
