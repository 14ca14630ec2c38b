package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap

/** Dev-only job-latency profiler (not part of the engine): runs one
  * registry query body once and prints per-Spark-job wall time plus
  * the gaps between jobs, to attribute eager-gate wall time between
  * task work, scheduler fixed cost, and driver-side work. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qname = args.headOption.getOrElse("q_store_mirror")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new ConcurrentHashMap[Int, (Long, Int, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val nTasks = j.stageInfos.map(_.numTasks).sum
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(j.jobId, (j.time, nTasks, desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobs.get(j.jobId)
        if (s != null) done.add((j.jobId, s._1, j.time, s._2, s._3))
      }
    })
    val fn = SparkEntry.queries(qname)
    // warm once
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    TempRoots.sweepCreated()
    Thread.sleep(500); done.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val rows = done.asScala.toSeq.sortBy(_._2)
    var prevEnd = 0L
    println(f"TOTAL wall ${wall}%.2f s, ${rows.size} jobs")
    var sumJob = 0L; var sumGap = 0L
    rows.foreach { case (id, st, en, n, desc) =>
      val gap = if (prevEnd == 0) 0 else st - prevEnd
      prevEnd = en
      sumJob += en - st; sumGap += gap.max(0)
      println(f"job $id%4d ${en - st}%6d ms gap ${gap.max(0)}%5d ms tasks $n%4d  ${desc.take(90)}")
    }
    println(f"sum job ${sumJob / 1000.0}%.2f s, sum gap ${sumGap / 1000.0}%.2f s")
    TempRoots.sweepCreated()
    spark.stop()
  }
}
