package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal xlsx ingestion — SURVEY.md §2.1 S3.
  *
  * The reference's correction loop accepts `.xlsx` drops alongside CSV
  * (dags/Reprocessing.py:31,59: `pd.read_excel`). No Spark Excel source
  * ships in this environment, but an xlsx is just a zip of XML — the
  * JDK's `java.util.zip` + StAX cover the subset a correction file
  * uses: one worksheet, shared strings, inline strings, numbers.
  *
  * Files parse ON EXECUTORS via the `binaryFile` source (one task per
  * file, whole-file rows), so a thousand correction drops are a single
  * distributed scan, not a driver loop — the per-file memory bound is
  * the file itself, which is the same bound `binaryFile` already
  * imposes. Each file's header row is canonicalized and renamed
  * per-file (dialects differ per drop, same tolerance as
  * [[CsvIngest]]), rows become header→value maps, and the union
  * conforms to the target layer schema driver-side with one
  * `element_at` projection per column.
  */
object Xlsx {

  /** Parse the first worksheet into rows of cell strings (row 0 = the
    * header row). Sparse cells materialize as nulls; trailing missing
    * cells are left short (conformance pads them). Pure function of
    * the bytes — runs on executors. */
  def parseRows(bytes: Array[Byte]): Seq[Seq[String]] = {
    val parts = zipParts(bytes,
      Set("xl/sharedStrings.xml"), prefix = "xl/worksheets/")
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    // first worksheet by name order (sheet1.xml sorts first) — ONLY
    // direct sheet parts: xl/worksheets/_rels/sheet1.xml.rels sorts
    // before 's' and would otherwise be picked as "the sheet"
    val sheet = parts.view
      .filterKeys(_.matches("xl/worksheets/[^/]+\\.xml"))
      .toSeq.sortBy(_._1).headOption
      .getOrElse(throw new IllegalArgumentException(
        "xlsx has no worksheet part"))._2
    parseSheet(sheet, shared)
  }

  /** Hard cap on the INFLATED size of any one zip entry. Correction
    * drops are untrusted; a decompression bomb would otherwise OOM the
    * executor outside the per-file try/catch (OutOfMemoryError is not
    * an Exception). 64 MB of XML is far beyond any real correction
    * sheet. */
  private val MaxEntryBytes: Int = 64 * 1024 * 1024

  /** Extract named zip entries plus any entry under `prefix`,
    * bounding each entry's inflated size to [[MaxEntryBytes]] so a
    * zip bomb fails THIS file (an IllegalArgumentException the
    * per-file isolation in [[ingestDir]] catches) instead of killing
    * the task. */
  private def zipParts(bytes: Array[Byte], names: Set[String],
                       prefix: String): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (names.contains(e.getName) || e.getName.startsWith(prefix))
          out(e.getName) = readBounded(zin, e.getName)
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  private def readBounded(zin: ZipInputStream, name: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 * 1024)
    var n = zin.read(chunk)
    while (n >= 0) {
      if (buf.size() + n > MaxEntryBytes)
        throw new IllegalArgumentException(
          s"zip entry '$name' inflates past $MaxEntryBytes bytes — " +
            "refusing (decompression bomb?)")
      buf.write(chunk, 0, n)
      n = zin.read(chunk)
    }
    buf.toByteArray
  }

  /** `<sst><si>…</si></sst>` — an `<si>` is either one `<t>` or rich
    * runs `<r><t>…</t></r>`; concatenate every `<t>` inside it. */
  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val r = xmlReader(xml)
    val strings = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = false; strings += cur.toString
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    strings.toIndexedSeq
  }

  /** `<sheetData><row><c r="A1" t="s|str|inlineStr|b|…"><v>…</v></c>`.
    * Cell refs place values at their column index (sparse rows keep
    * nulls in the gaps); a missing ref means "next column". The cell's
    * value assembles across ALL `<v>`/`<t>` children and finalizes at
    * `</c>` — an inlineStr split into rich-text runs (`<r><t>…`)
    * concatenates, same as [[parseSharedStrings]]. */
  private def parseSheet(xml: Array[Byte],
                         shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = xmlReader(xml)
    val rows = mutable.ArrayBuffer.empty[Seq[String]]
    var row: mutable.ArrayBuffer[String] = null
    var cellType = ""
    var nextIdx = 0
    var curIdx = 0
    var inV = false
    var sawValue = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = mutable.ArrayBuffer.empty[String]; nextIdx = 0
            case "c" if row != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              curIdx = ref.map(colIndex).getOrElse(nextIdx)
              nextIdx = curIdx + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text.clear(); sawValue = false
            case "v" | "t" if row != null =>
              inV = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => rows += row.toSeq; row = null
            case "v" | "t" if inV =>
              inV = false; sawValue = true
            case "c" if row != null && sawValue =>
              val raw = text.toString
              val value = cellType match {
                case "s" =>
                  val idx = raw.trim.toInt
                  if (idx < 0 || idx >= shared.length)
                    throw new IllegalArgumentException(
                      s"shared-string index $idx out of range (${shared.length})")
                  shared(idx)
                case "b" => if (raw.trim == "1") "true" else "false"
                case _ => raw // str / inlineStr runs / plain numeric
              }
              while (row.length <= curIdx) row += null
              row(curIdx) = value
            case _ =>
          }
        case _ =>
      }
    }
    rows.toSeq
  }

  /** "AB12" → 0-based column 27. */
  private def colIndex(ref: String): Int = {
    var i = 0
    var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    n - 1
  }

  private def xmlReader(xml: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // correction drops are untrusted input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  // ---------------------------------------------------------------
  // Write side — the quarantine REPORT sink (S9's xlsx veneer). The
  // reference mails analysts an Excel of rejected corrections
  // (dags/DataWarehouse.py:640-644); here the same zip+XML machinery
  // runs in reverse: a minimal one-sheet workbook with inline strings
  // (no sharedStrings part needed), readable by Excel and by
  // [[parseRows]] — the round-trip is spec-pinned.
  // ---------------------------------------------------------------

  private def xmlEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      // control chars below 0x20 (other than tab/LF/CR) are invalid in
      // XML 1.0 even escaped — and rejected rows are exactly where such
      // garbage bytes show up. Substitute so the report stays readable
      // by Excel and by parseRows.
      case c if c < 0x20 && c != '\t' && c != '\n' && c != '\r' =>
        b.append('�')
      case c => b.append(c)
    }
    b.toString
  }

  /** 0-based column → "A", …, "Z", "AA", … (inverse of [[colIndex]]). */
  private def colName(idx: Int): String = {
    var n = idx + 1
    val b = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; b.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    b.toString
  }

  private val XmlDecl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
  // OOXML spec namespace constants (ECMA-376) — identifiers, not URLs
  // the code ever fetches
  private val NsMain =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val NsPkgRel =
    "http://schemas.openxmlformats.org/package/2006/relationships"
  private val NsDocRel =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** Minimal one-sheet xlsx: header row + data rows, every cell an
    * inline string, null cells left sparse (omitted, same as the read
    * side materializes them). Bounded, driver-side construction — this
    * is a human-facing REPORT artifact, not a data sink (parquet/CSV
    * are the data sinks); callers cap rows accordingly. */
  def workbookBytes(header: Seq[String], rows: Seq[Seq[String]]): Array[Byte] = {
    def cellXml(rowNum: Int, i: Int, v: String): String =
      s"""<c r="${colName(i)}$rowNum" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
    def rowXml(rowNum: Int, cells: Seq[String]): String =
      cells.zipWithIndex.collect { case (v, i) if v != null =>
        cellXml(rowNum, i, v)
      }.mkString(s"""<row r="$rowNum">""", "", "</row>")
    val sheet = new StringBuilder(XmlDecl)
      .append(s"""<worksheet xmlns="$NsMain"><sheetData>""")
      .append(rowXml(1, header))
    rows.zipWithIndex.foreach { case (cells, i) =>
      sheet.append(rowXml(i + 2, cells))
    }
    sheet.append("</sheetData></worksheet>")
    val parts = Seq(
      "[Content_Types].xml" ->
        s"""$XmlDecl<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        s"""$XmlDecl<Relationships xmlns="$NsPkgRel"><Relationship Id="rId1" Type="$NsDocRel/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        s"""$XmlDecl<workbook xmlns="$NsMain" xmlns:r="$NsDocRel"><sheets><sheet name="Report" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        s"""$XmlDecl<Relationships xmlns="$NsPkgRel"><Relationship Id="rId1" Type="$NsDocRel/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet.toString)
    val bout = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bout)
    try parts.foreach { case (name, xml) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(xml.getBytes("UTF-8"))
      zout.closeEntry()
    } finally zout.close()
    bout.toByteArray
  }

  /** Quarantine-report sink: the DataFrame's first `maxRows` rows
    * (every column stringified, nulls sparse) as one xlsx at `dest`,
    * written through the Hadoop FS (works on any warehouse layer URI).
    * The limit keeps the driver-side materialization bounded — the
    * full rejected set always lands in the parquet quarantine; this is
    * the analyst-facing preview. Returns rows written. */
  def writeReport(df: DataFrame, dest: String, maxRows: Int = 10000): Long = {
    val header = df.columns.toIndexedSeq
    val rows = df.limit(maxRows).collect().toIndexedSeq.map { r =>
      header.indices.map(i =>
        if (r.isNullAt(i)) null else String.valueOf(r.get(i)))
    }
    val p = new Path(dest)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(workbookBytes(header, rows)) finally out.close()
    rows.length.toLong
  }

  /** S3: ingest every `*.xlsx` under `dir` into the fixed `target`
    * schema — the Excel twin of [[CsvIngest.ingestDir]], same header
    * canonicalization, rename map, schema conformance, and `src_file`
    * lineage column. */
  def ingestDir(spark: SparkSession, dir: String, target: StructType,
                renames: Map[String, String] = Normalize.renameMap): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toIndexedSeq.map(_.getPath)
        .filter(_.getName.endsWith(".xlsx")).sortBy(_.getName)
    val empty = StructType(target.fields.toIndexedSeq :+
      StructField("src_file", StringType))
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], empty)
    import spark.implicits._
    val ren = renames // avoid closing over a default-param method call
    val mapped = spark.read.format("binaryFile")
      .load(files.map(_.toString): _*)
      .select(element_at(split(col("path"), "/"), -1).as("src_file"),
        col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (srcFile, bytes) =>
        // per-file fault isolation, the reference's try/except-continue
        // (dags/Reprocessing.py:55-156): one truncated or malformed
        // drop must not kill the task and take the whole batch's good
        // corrections down with it
        val all =
          try parseRows(bytes)
          catch {
            case e: Exception =>
              System.err.println(
                s"[xlsx] skipping unparseable $srcFile: ${e.getMessage}")
              Seq.empty
          }
        if (all.isEmpty) Iterator.empty
        else {
          val header = all.head.map(h =>
            Option(h).map(Normalize.canonName).getOrElse(""))
            .map(h => ren.getOrElse(h, h))
          all.tail.iterator.map { cells =>
            val kv = header.zipWithIndex.collect {
              case (name, i) if name.nonEmpty && i < cells.length &&
                cells(i) != null => name -> cells(i)
            }
            (srcFile, kv.toMap)
          }
        }
      }.toDF("src_file", "m")
    mapped.select(target.fields.toIndexedSeq.map { f =>
      element_at(col("m"), f.name).cast(f.dataType).as(f.name)
    } :+ col("src_file"): _*)
  }
}
