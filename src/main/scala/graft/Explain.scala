package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named registry
  * queries (all of them with no args). Usage:
  *
  *   sbt "runMain graft.Explain <sfDir> [name ...]"
  *
  * The per-operator scale audit lives here: check that filters reach
  * the scan (PushedFilters), small sides broadcast, and no
  * BroadcastNestedLoopJoin / CartesianProduct appears uninvited.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    val picked = if (names.isEmpty) qs.keys.toSeq.sorted else names.toSeq
    picked.foreach { n =>
      println(s"\n========== $n ==========")
      qs.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None =>
          val near = qs.keys.toSeq.sorted
            .filter(k => k.contains(n.stripPrefix("q_")) ||
              n.contains(k.stripPrefix("q_")))
          sys.error(s"unknown query '$n'." + (
            if (near.nonEmpty) s" Did you mean: ${near.mkString(", ")}?"
            else s" Known queries: ${qs.keys.toSeq.sorted.mkString(", ")}"))
      }
    }
    spark.stop()
  }
}
