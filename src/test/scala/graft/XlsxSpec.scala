package graft

import org.apache.spark.sql.functions._
import graft.ops.Xlsx
import graft.pipeline.{ChurnSchema, Reprocess, Warehouse}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.collection.mutable

/** S3 Excel ingestion: the correction loop must accept `.xlsx` drops
  * (reference dags/Reprocessing.py:31,59). The fixture writer below
  * emits a genuine xlsx (zip of sheet XML + shared strings) so the
  * parser is exercised against the real container format, including
  * shared-string cells, numeric cells, and sparse rows. */
class XlsxSpec extends SparkSpec {

  private def esc(s: String) =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Build xlsx bytes from a grid: String → shared-string cell,
    * Int/Double → numeric cell, null → omitted (sparse). */
  private def xlsxBytes(grid: Seq[Seq[Any]]): Array[Byte] = {
    val sst = mutable.LinkedHashMap.empty[String, Int]
    val rowsXml = grid.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect { case (v, ci) if v != null =>
        val ref = s"${colRef(ci)}${ri + 1}"
        v match {
          case s: String =>
            val idx = sst.getOrElseUpdate(s, sst.size)
            s"""<c r="$ref" t="s"><v>$idx</v></c>"""
          case n => s"""<c r="$ref"><v>$n</v></c>"""
        }
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    val sheet = """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      s"<sheetData>$rowsXml</sheetData></worksheet>"
    val sstXml = """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      sst.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString + "</sst>"
    val workbook = """<?xml version="1.0"?><workbook><sheets>""" +
      """<sheet name="Sheet1" sheetId="1" r:id="rId1" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/>""" +
      """</sheets></workbook>"""
    val types = """<?xml version="1.0"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="xml" ContentType="application/xml"/></Types>"""
    val bout = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bout)
    for ((name, content) <- Seq(
      "[Content_Types].xml" -> types,
      "xl/workbook.xml" -> workbook,
      "xl/sharedStrings.xml" -> sstXml,
      "xl/worksheets/sheet1.xml" -> sheet)) {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bout.toByteArray
  }

  private def write(dir: String, name: String, bytes: Array[Byte]): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve(name), bytes)
  }

  test("parseRows: shared strings, numerics, sparse cells, gaps as null") {
    val bytes = xlsxBytes(Seq(
      Seq("Customer ID", "Tenure In Months", "Notes & Flags"),
      Seq("R001", 42, "a<b"),
      Seq("R002", null, 3.5)))
    val rows = Xlsx.parseRows(bytes)
    assert(rows == Seq(
      Seq("Customer ID", "Tenure In Months", "Notes & Flags"),
      Seq("R001", "42", "a<b"),
      Seq("R002", null, "3.5")))
  }

  test("parseRows handles inlineStr cells and ref-less consecutive cells") {
    // hand-crafted sheet: no sharedStrings part, inline strings, and
    // cells without r= attributes (writers may omit them — "next
    // column" semantics)
    val sheet = """<?xml version="1.0"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      "<sheetData>" +
      """<row r="1"><c t="inlineStr"><is><t>id</t></is></c>""" +
      """<c t="inlineStr"><is><t>amount</t></is></c>""" +
      """<c t="inlineStr"><is><t>city</t></is></c></row>""" +
      """<row r="2"><c t="inlineStr"><is><t>A1</t></is></c><c><v>7</v></c>""" +
      """<c t="inlineStr"><is><r><t>Los </t></r><r><t>Angeles</t></r></is></c></row>""" +
      "</sheetData></worksheet>"
    val bout = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bout)
    // _rels sorts before 's': worksheet selection must skip it
    z.putNextEntry(new ZipEntry("xl/worksheets/_rels/sheet1.xml.rels"))
    z.write("""<?xml version="1.0"?><Relationships/>""".getBytes("UTF-8"))
    z.closeEntry()
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(sheet.getBytes("UTF-8")); z.closeEntry(); z.close()
    assert(Xlsx.parseRows(bout.toByteArray) ==
      Seq(Seq("id", "amount", "city"), Seq("A1", "7", "Los Angeles")))
  }

  test("a decompression-bomb entry fails that file, not the batch") {
    // 80 MB of repeated bytes deflates to ~80 KB; inflating it
    // unbounded would OOM the executor outside the per-file try/catch
    val bout = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bout)
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val chunk = new Array[Byte](1024 * 1024) // zeros
    for (_ <- 1 to 80) z.write(chunk)
    z.closeEntry(); z.close()
    val bomb = bout.toByteArray
    assert(bomb.length < 1024 * 1024, "fixture must actually compress")
    val ex = intercept[IllegalArgumentException](Xlsx.parseRows(bomb))
    assert(ex.getMessage.contains("decompression bomb"))
    // per-file isolation: the bomb drop is skipped, the good drop lands
    val dir = graft.TempRoots.create("graft_bomb")
    write(dir, "bomb.xlsx", bomb)
    write(dir, "good.xlsx", xlsxBytes(Seq(
      Seq("CustomerID", "Gender"), Seq("G001", "Female"))))
    val df = Xlsx.ingestDir(spark, dir, ChurnSchema.stagingRaw)
    assert(df.select("customer_id").collect().map(_.getString(0)).toSeq ==
      Seq("G001"))
  }

  test("ingestDir conforms headers and schema like the CSV path") {
    val dir = graft.TempRoots.create("graft_xlsx")
    write(dir, "fix.xlsx", xlsxBytes(Seq(
      Seq("CustomerID", "Gender", "Tenure Months"),
      Seq("X001", "Male", 7))))
    val df = Xlsx.ingestDir(spark, dir, ChurnSchema.stagingRaw)
    val row = df.select("customer_id", "gender", "tenure_in_months",
      "contract", "src_file").head()
    assert(row.getString(0) == "X001" && row.getString(1) == "Male" &&
      row.getString(2) == "7" && row.isNullAt(3) &&
      row.getString(4) == "fix.xlsx")
  }

  test("correction loop accepts an xlsx drop alongside CSV") {
    val root = graft.TempRoots
      .create("graft_wh_xlsx")
    val layers = Warehouse.Layers(root)
    val header = ("Customer ID,Gender,Senior Citizen,Partner,Dependents," +
      "Country,State,City,Phone Service,Multiple Lines,Internet Service," +
      "Online Security,Online Backup,Device Protection,Tech Support," +
      "Streaming TV,Streaming Movies,Paperless Billing,Payment Method," +
      "Contract,Tenure In Months,Monthly Charges Amount,Total Charges," +
      "Churn Label,Churn Value,Churn Score,Cltv,Churn Reason").split(",").toSeq
    def row(id: String, tenure: Any): Seq[Any] =
      Seq(id, "Male", "No", "No", "No", "United States", "California",
        "Los Angeles", "Yes", "No", "DSL", "Yes", "No", "No", "No", "No",
        "No", "Yes", "Mailed check", "Month-to-month", tenure, 50.5,
        600.0, "No", 0, "n/a", "n/a", "n/a")
    // seed silver via the landing path
    val landing = s"$root/landing"
    val csvLines = (header.mkString(",") +:
      Seq("R001", "R002", "R003").map(id =>
        row(id, 12).mkString(","))).mkString("\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "classic.csv"),
      csvLines.getBytes("UTF-8"))
    Warehouse.run(spark, landing, layers, "2026-05-01")
    // corrections: an xlsx with one good fix (numeric-cell tenure) and
    // one bad (non-numeric tenure string must REJECT)
    val fixes = s"$root/fixed_data"
    write(fixes, "corrections.xlsx", xlsxBytes(
      header +: Seq(row("R001", 99), row("R902", "twelve"))))
    val (accepted, rejected) = Reprocess.run(spark, fixes, layers)
    assert(accepted == 1 && rejected == 1)
    val silver = spark.read.parquet(layers.silver)
    assert(silver.filter(col("customer_id") === "R001")
      .head().getAs[Double]("tenure_in_months") == 99.0)
    assert(silver.count() == 3, "replace-by-key must not grow silver")
    assert(spark.read.parquet(layers.reprocessQuarantine)
      .filter(col("error_details") === "Tenure not numeric").count() == 1)
    // the analyst-facing reject preview landed as a REAL xlsx the
    // engine's own reader round-trips: header + the one rejected row,
    // named by the correction batch (retry-stable)
    val report = Xlsx.parseRows(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"${layers.reprocessQuarantine}_report/report_fixed_data.xlsx")))
    assert(report.length == 2, "header + one reject")
    val hdr = report.head
    assert(hdr.contains("customer_id") && hdr.contains("error_details"))
    assert(report(1)(hdr.indexOf("customer_id")) == "R902")
    assert(report(1)(hdr.indexOf("error_details")) == "Tenure not numeric")
  }

  test("workbook writer round-trips through the reader") {
    val header = Seq("id", "note", "maybe")
    val rows = Seq(
      Seq("A<1>", "5 & 6 \"quoted\"", "x"),
      Seq("B2", null, null)) // nulls written sparse, trailing left short
    val parsed = Xlsx.parseRows(Xlsx.workbookBytes(header, rows))
    assert(parsed == Seq(header,
      Seq("A<1>", "5 & 6 \"quoted\"", "x"), Seq("B2")))
  }

  test("writer substitutes XML-1.0-invalid control chars, keeps tab/LF/CR") {
    // rejected correction rows are exactly where garbage bytes appear;
    // a raw \u0001 would make the report unreadable by Excel AND by
    // parseRows itself
    val rows = Seq(Seq("bad\u0001\u0000byte", "tab\there", "nl\nthere"))
    val bytes = Xlsx.workbookBytes(Seq("a", "b", "c"), rows)
    val parsed = Xlsx.parseRows(bytes)
    assert(parsed(1) == Seq("bad\ufffd\ufffdbyte", "tab\there", "nl\nthere"))
  }
}
