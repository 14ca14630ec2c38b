package graft

import scala.collection.mutable
import graft.pipeline._

/** NotifyHook contract: the pipeline fires bounded, well-shaped events
  * at the reference's email-callback points (quarantine preview, batch
  * stats, gate failure), and a custom transport receives them. */
class NotifySpec extends SparkSpec {

  private class Recording extends NotifyHook {
    val events = mutable.ArrayBuffer.empty[Notify.Event]
    def send(e: Notify.Event): Unit = events += e
  }

  private val ClassicHeader =
    "Customer ID,Gender,Senior Citizen,Partner,Dependents,Country,State,City," +
      "Phone Service,Multiple Lines,Internet Service,Online Security," +
      "Online Backup,Device Protection,Tech Support,Streaming TV," +
      "Streaming Movies,Paperless Billing,Payment Method,Contract," +
      "Tenure In Months,Monthly Charges Amount,Total Charges,Churn Label," +
      "Churn Value,Churn Score,Cltv,Churn Reason"

  private def classicRow(id: String, tenure: String = "12"): String =
    s"$id,Male,No,No,No,United States,California,Los Angeles," +
      "Yes,No,DSL,Yes,No,No,No,No,No,Yes," +
      s"Mailed check,Month-to-month,$tenure,50.5,600.0,No,0,n/a,n/a,n/a"

  private def writeCsv(dir: String, name: String, lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve(name),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("warehouse run fires quarantine preview + batch stats") {
    val root = graft.TempRoots.create("graft_nf")
    val landing = s"$root/landing"
    // 21 rows, 1 bad (≈4.8%, under the breaker): preview must carry
    // exactly that reject, stats the 20 clean rows
    writeCsv(landing, "classic.csv", ClassicHeader +:
      ((1 to 20).map(i => classicRow(f"N$i%03d")) :+
        classicRow("N900", tenure = "-5")))
    val hook = new Recording
    Warehouse.run(spark, landing, Warehouse.Layers(root), "2026-06-01", hook)
    val previews = hook.events.collect { case p: Notify.QuarantinePreview => p }
    assert(previews.map(_.stage) == Seq("staging_quarantine"))
    val p = previews.head
    assert(p.total == 1 && p.rows.length == 1)
    assert(p.rows.length <= Notify.PreviewRows)
    assert(p.header.contains("error_details") && p.header.contains("customer_id"))
    val row = p.rows.head
    assert(row(p.header.indexOf("customer_id")) == "N900")
    assert(row(p.header.indexOf("error_details")) == "Negative Tenure")
    val stats = hook.events.collect { case s: Notify.BatchStats => s }
    assert(stats.map(_.stage) == Seq("warehouse_run"))
    assert(stats.head.stats == Map("clean_rows" -> 20L))
    // events fire in pipeline order: preview (validate) before stats (end)
    assert(hook.events.map(_.getClass.getSimpleName) ==
      Seq("QuarantinePreview", "BatchStats"))
  }

  test("preview is bounded at PreviewRows even when rejects exceed it") {
    val root = graft.TempRoots.create("graft_nf_cap")
    val landing = s"$root/landing"
    // 25 bad of 300 (≈8.3%, under the breaker) — preview caps at 20
    writeCsv(landing, "classic.csv", ClassicHeader +:
      ((1 to 275).map(i => classicRow(f"B$i%04d")) ++
        (1 to 25).map(i => classicRow(f"B9$i%03d", tenure = "-1"))))
    val hook = new Recording
    Warehouse.run(spark, landing, Warehouse.Layers(root), "2026-06-01", hook)
    val p = hook.events.collect { case p: Notify.QuarantinePreview => p }.head
    assert(p.total == 25, "total carries the FULL count")
    assert(p.rows.length == Notify.PreviewRows, "rows cap at the preview bound")
  }

  test("clean re-run of a rejecting run_date fires no preview and clears the partition") {
    val root = graft.TempRoots.create("graft_nf_rerun")
    val landing = s"$root/landing"
    val layers = Warehouse.Layers(root)
    // run 1: one reject lands in quarantine/run_date=2026-06-01
    writeCsv(landing, "classic.csv", ClassicHeader +:
      ((1 to 20).map(i => classicRow(f"C$i%03d")) :+
        classicRow("C900", tenure = "-5")))
    Warehouse.run(spark, landing, layers, "2026-06-01", new Recording)
    // run 2: the operator fixed the batch; SAME run_date, all clean.
    // Dynamic overwrite of an empty bad set replaces no partitions, so
    // without the explicit clear the stale rejects would both survive
    // and fire a false preview.
    writeCsv(landing, "classic.csv", ClassicHeader +:
      ((1 to 20).map(i => classicRow(f"C$i%03d")) :+ classicRow("C900")))
    val hook = new Recording
    Warehouse.run(spark, landing, layers, "2026-06-01", hook)
    assert(!hook.events.exists(_.isInstanceOf[Notify.QuarantinePreview]),
      "a clean batch must not alert with the previous run's rejects")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"${layers.quarantine}/run_date=2026-06-01")),
      "the stale quarantine partition is cleared")
  }

  test("gate failure fires the alert event, then the run still halts") {
    val root = graft.TempRoots.create("graft_nf_gate")
    val landing = s"$root/landing"
    // 2 of 4 bad = 50% > 10%: alert + halt BEFORE any layer write
    writeCsv(landing, "classic.csv", ClassicHeader +: Seq(
      classicRow("G001"), classicRow("G002"),
      classicRow("G900", tenure = "-5"), classicRow("G901", tenure = "-9")))
    val hook = new Recording
    val layers = Warehouse.Layers(root)
    intercept[IllegalStateException] {
      Warehouse.run(spark, landing, layers, "2026-06-01", hook)
    }
    val gates = hook.events.collect { case g: Notify.GateFailure => g }
    assert(gates.map(_.stage) == Seq("staging_validate"))
    assert(gates.head.reason.contains("error rate"))
    assert(hook.events.size == 1, "no preview/stats after a halted run")
  }

  test("reprocess fires preview + stats; export fires stats") {
    val root = graft.TempRoots.create("graft_nf_rp")
    val landing = s"$root/landing"
    writeCsv(landing, "classic.csv", ClassicHeader +:
      Seq("R001", "R002", "R003").map(classicRow(_)))
    val layers = Warehouse.Layers(root)
    Warehouse.run(spark, landing, layers, "2026-06-01")
    val fixes = s"$root/fixed_data"
    writeCsv(fixes, "corrections.csv", ClassicHeader +: Seq(
      classicRow("R001", tenure = "99"), classicRow("R902", tenure = "twelve")))
    val hook = new Recording
    val (acc, rej) = Reprocess.run(spark, fixes, layers, hook)
    assert(acc == 1 && rej == 1)
    val p = hook.events.collect { case p: Notify.QuarantinePreview => p }.head
    assert(p.stage == "reprocess_quarantine" && p.total == 1)
    assert(p.rows.head(p.header.indexOf("customer_id")) == "R902")
    val st = hook.events.collect { case s: Notify.BatchStats => s }.head
    assert(st.stage == "reprocess" &&
      st.stats == Map("accepted" -> 1L, "rejected" -> 1L))

    val ehook = new Recording
    val bronze = spark.read.parquet(layers.bronze)
    // bronze stamps created_at/updated_at at load time (wall clock);
    // a future runTs guarantees a non-empty window
    val n = Export.run(spark, bronze, s"$root/wm.txt", s"$root/exports",
      "2030-01-01 00:00:00", ehook)
    val est = ehook.events.collect { case s: Notify.BatchStats => s }
    assert(est.map(_.stage) == Seq("export"))
    assert(est.head.stats == Map("exported_rows" -> n, "skipped" -> 0L))
    assert(n > 0)
  }
}
