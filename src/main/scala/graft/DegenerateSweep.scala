package graft

import org.apache.spark.sql.SparkSession

/** Degenerate-input hardening sweep: run EVERY registry query against a
  * schema-identical but zero-row mirror of the testdata layout and
  * classify what happens. At 100 TB a pipeline routinely meets empty
  * partitions, empty daily increments, and filters that eliminate every
  * row — an operator that answers those with a divide-by-zero, an
  * empty-`head`, or an NPE is a production incident, not a corner case.
  *
  * Contract asserted here (and pinned by DegenerateSpec):
  *   - a query either returns a well-typed (usually empty) result, or
  *   - refuses loudly with a DOCUMENTED precondition failure
  *     (`IllegalArgumentException` from a `require`, with a message) —
  *     e.g. the IVF family requires a non-empty corpus to seed a
  *     codebook;
  *   - it never surfaces an internal crash (NPE, ArithmeticException,
  *     NoSuchElementException, MatchError, SparkException wrapping any
  *     of these).
  *
  * Usage: `runMain graft.DegenerateSweep [srcSfDir] [emptyDir]`
  * (defaults: sf0.001 source, /tmp/graft_empty_sf mirror). Exits 1 on
  * any CRASH-class outcome.
  */
object DegenerateSweep {
  /** Write a zero-row, schema-preserving mirror of every table in
    * `srcDir` under `dstDir`. `limit(0)` keeps the parquet logical
    * types (including the events nanos/micros generation difference)
    * exactly as the source wrote them. */
  def mirrorEmpty(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    val src = new java.io.File(srcDir)
    require(src.isDirectory, s"not a directory: $srcDir")
    val tables = src.listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    require(tables.nonEmpty, s"no *.parquet tables under $srcDir")
    tables.foreach { name =>
      spark.read.parquet(s"$srcDir/$name").limit(0)
        .write.mode("overwrite").parquet(s"$dstDir/$name")
    }
  }

  sealed trait Outcome
  final case class Ok(rows: Long) extends Outcome
  /** A documented refusal: `require`-style precondition with a message. */
  final case class Graceful(msg: String) extends Outcome
  final case class Crash(e: Throwable) extends Outcome

  /** Walk the cause chain looking for the crash classes the contract
    * forbids; a top-level SparkException wrapping a `require` failure is
    * still Graceful. */
  private def classify(e: Throwable): Outcome = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .take(10).toSeq
    chain.collectFirst {
      case i: IllegalArgumentException
          if i.getMessage != null && i.getMessage.nonEmpty =>
        Graceful(i.getMessage.linesIterator.next())
      case i: IllegalStateException
          if i.getMessage != null && i.getMessage.nonEmpty =>
        Graceful(i.getMessage.linesIterator.next())
    }.getOrElse(Crash(e))
  }

  def sweep(spark: SparkSession, emptyDir: String,
            names: Option[Set[String]] = None): Seq[(String, Outcome)] = {
    queries.OracleContext.sfDir = emptyDir
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val out =
          try Ok(fn(spark, emptyDir).count())
          catch { case e: Throwable => classify(e) }
        (name, out)
      }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emptyDir = args.lift(1).getOrElse("/tmp/graft_empty_sf")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mirrorEmpty(spark, srcDir, emptyDir)
    val results = sweep(spark, emptyDir)
    val crashes = results.collect { case (n, Crash(e)) => (n, e) }
    results.foreach {
      case (n, Ok(r))       => println(f"OK       $n%-28s rows=$r")
      case (n, Graceful(m)) => println(f"GRACEFUL $n%-28s $m")
      case (n, Crash(e)) =>
        println(f"CRASH    $n%-28s ${e.getClass.getName}: ${e.getMessage}")
        Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null).take(5)
          .foreach(c => println(s"  caused by ${c.getClass.getName}: " +
            Option(c.getMessage).getOrElse("").linesIterator.nextOption()
              .getOrElse("")))
    }
    println(s"\n${results.size} queries: " +
      s"${results.count(_._2.isInstanceOf[Ok])} ok, " +
      s"${results.count(_._2.isInstanceOf[Graceful])} graceful, " +
      s"${crashes.size} crash")
    spark.stop()
    if (crashes.nonEmpty) sys.exit(1)
  }
}
