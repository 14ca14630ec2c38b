package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump the formatted plan of the readRowChanges feed over
  * a toy store (the subplan OPTIMIZATION_r14 changed) — eager gates
  * return LocalTableScan, so the feed plan is captured directly. */
object PlanDumpR14 {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/feed_plan.txt")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = TempRoots.create("graft_plandump") + "/t"
    val df = (1L to 1000L).toDF("k")
      .withColumn("v", col("k") * 2)
    graft.ops.TableStore.append(df, root, statsCols = Seq("k"))
    graft.ops.TableStore.merge(
      df.where(col("k") % 10 === 0).withColumn("v", col("v") + 1),
      root, "k", statsCols = Seq("k"))
    val feed = graft.ops.TableStore.readRowChanges(spark, root, 1L)
    val plan = feed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), plan)
    println(s"wrote $out")
    TempRoots.sweepCreated()
    spark.stop()
  }
}
