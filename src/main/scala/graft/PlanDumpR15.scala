package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump the DISCOVERY-scan plan of a keyed IN-subquery
  * DELETE before/after [[graft.ops.Dml]]'s size-gated subquery
  * materialization (OPTIMIZATION_r15) — eager DML gates return
  * LocalTableScan, so the inner plan shape is captured on a toy
  * clustered store directly: the "before" shape plans the predicate
  * as an existence join (no translatable filter reaches the scan, so
  * the log-stats prune sees nothing), the "after" shape is a plain
  * `In` filter with PushedFilters on the scan and a non-trivial
  * candidate prune. */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r15")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = TempRoots.create("graft_plandump15") + "/t"
    // three key-clustered files: a keyed IN-delete should prune to one
    (0L until 3L).foreach { i =>
      graft.ops.TableStore.append(
        (i * 1000L until (i + 1) * 1000L).toDF("k")
          .withColumn("v", col("k") * 2).coalesce(1),
        root, statsCols = Seq("k"))
    }
    spark.conf.set("spark.sql.catalog.gdump",
      classOf[graft.sources.GraftCatalog].getName)
    spark.range(100, 200).selectExpr("id AS k")
      .createOrReplaceTempView("dump_keys")
    val snapshot = graft.ops.TableStore.read(spark, root)
    val live = graft.ops.TableStore.liveAt(spark, root,
      graft.ops.TableStore.versions(spark, root).last)
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // BEFORE: the predicate as the SQL surface delivers it — a live
    // IN-subquery, planned as an existence join over the full scan
    val before = snapshot.where(
      col("k").isin() || expr("k IN (SELECT k FROM dump_keys)"))
    // AFTER: what Dml.delete now evaluates — the materialized literal
    // predicate (reproduced here via the same SQL surface the gate
    // uses, post-materialization the discovery filter is a plain In)
    val keys = spark.table("dump_keys").distinct().collect()
      .map(_.getLong(0))
    val after = snapshot.where(col("k").isin(keys: _*))
    val filters = Seq(org.apache.spark.sql.sources
      .In("k", keys.map(_.asInstanceOf[Any])))
    val pruned = graft.sources.StatsSkipping.prune(live, filters)
    val note =
      s"// candidate prune with the translated In filter: " +
        s"${pruned.size} of ${live.size} live files\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/sql_delete_in_before.txt"),
      fmt(before))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/sql_delete_in_after.txt"),
      note + fmt(after))
    println(s"wrote $outDir/sql_delete_in_{before,after}.txt " +
      s"(prune ${pruned.size}/${live.size})")
    TempRoots.sweepCreated()
    spark.stop()
  }
}
