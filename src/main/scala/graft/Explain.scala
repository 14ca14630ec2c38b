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
    // the default sweep skips EAGER queries (funnel accounting bodies
    // execute whole pipelines at construction time and return a
    // LocalTableScan — minutes of jobs for zero plan insight); name
    // one explicitly to run it anyway
    val eager = SparkEntry.registry.filter(_.eager).map(_.name).toSet
    val picked =
      if (names.nonEmpty) names.toSeq
      else {
        val skipped = qs.keys.toSeq.sorted.filter(eager)
        if (skipped.nonEmpty)
          println(s"[explain] skipping eager queries " +
            s"(name explicitly to run): ${skipped.mkString(", ")}")
        qs.keys.toSeq.sorted.filterNot(eager)
      }
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
