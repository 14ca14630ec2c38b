package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (sbt forks a single
  * test JVM): per-suite sessions would pay Spark startup per file and
  * can deadlock on the derby metastore lock. Semantics come from
  * [[GraftSession.tune]] so tests exercise exactly the engine config.
  */
object SharedSpark {
  lazy val session: SparkSession = {
    val s = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        graft.TempRoots.create("graft_wh"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.session
  /** sf0.001 testdata — the smallest harness-generated tables. */
  val TinySf = "/root/testdata/sf0.001"

  def rowsAsSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet
}
