package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Processed-file ledger — SURVEY.md §2.9 ST2 + §2.1 S10.
  *
  * The reference keeps an MD5-checksum ledger of every landing file and
  * decides per run: never seen → process as new; seen with a different
  * checksum → reprocess; same checksum → skip
  * (reference: dags/DataWarehouse.py:36-50,67-116). Same protocol here:
  * the ledger is a small engine-owned table with columns, IN ORDER,
  * (file_name, size_bytes, checksum) — [[update]] merges by schema and
  * requires exactly this order; the scan is the binaryFile source, the
  * decision is one full-outer join on file_name — broadcastable, since
  * a ledger is metadata-sized no matter how big the data files are.
  */
object Ledger {

  /** Scan a landing dir into (file_name, size_bytes, checksum) —
    * checksum is md5 over the raw bytes, computed distributed (each
    * task hashes its own files; nothing returns to the driver). */
  def scan(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    Multimodal.readBinaryDir(spark, dir, glob)
      .select(col("file_name"), col("size_bytes"),
        md5(col("content")).as("checksum"))

  /** Decision join: scanned files vs ledger state.
    *  - `new`       on disk, never in the ledger  → process
    *  - `changed`   on disk, ledger checksum differs → reprocess
    *  - `unchanged` on disk, same checksum → skip
    *  - `missing`   in the ledger, no longer on disk (reference's
    *    archived/removed files; reported, never processed) */
  def decide(scanned: DataFrame, ledger: DataFrame): DataFrame = {
    val s = scanned.select(col("file_name"), col("size_bytes"),
      col("checksum").as("_scan_ck"))
    val l = ledger.select(col("file_name"), col("checksum").as("_led_ck"))
    s.join(l, Seq("file_name"), "full_outer")
      .select(
        col("file_name"),
        col("size_bytes"),
        coalesce(col("_scan_ck"), col("_led_ck")).as("checksum"),
        when(col("_led_ck").isNull, "new")
          .when(col("_scan_ck").isNull, "missing")
          .when(col("_scan_ck") === col("_led_ck"), "unchanged")
          .otherwise("changed").as("decision"))
  }

  /** Files the current run must actually read (reference skips
    * unchanged and missing). */
  def toProcess(decisions: DataFrame): DataFrame =
    decisions.filter(col("decision").isin("new", "changed"))

  /** Post-run ledger update: every processed file's row refreshed or
    * inserted (the reference's ON CONFLICT (file_name) DO UPDATE). */
  def update(ledger: DataFrame, processedScan: DataFrame): DataFrame =
    Upsert.upsertAll(
      ledger,
      processedScan.select("file_name", "size_bytes", "checksum"),
      Seq("file_name"))

  /** S10: archive a processed file — move to `archiveDir` with a
    * suffix before the extension (the reference stamps a timestamp;
    * the caller passes it, keeping this deterministic and testable).
    * A same-suffix collision (the same file re-landed and reprocessed
    * within one stamp period) gets a numeric disambiguator instead of
    * failing: the archive rename runs AFTER layers commit but BEFORE
    * the ledger commit, so throwing here would wedge the protocol in
    * a reprocess-crash loop. */
  def archiveFile(fs: FileSystem, file: Path, archiveDir: Path,
                  suffix: String): Path = {
    val name = file.getName
    val dot = name.lastIndexOf('.')
    def candidate(n: Int): String = {
      val tag = if (n == 0) suffix else s"${suffix}_$n"
      if (dot >= 0) s"${name.substring(0, dot)}_$tag${name.substring(dot)}"
      else s"${name}_$tag"
    }
    fs.mkdirs(archiveDir)
    val dest = Iterator.from(0).map(n => new Path(archiveDir, candidate(n)))
      .find(!fs.exists(_))
      .get // Iterator.from is unbounded — some candidate is always free
    if (!fs.rename(file, dest))
      throw new java.io.IOException(s"cannot archive $file -> $dest")
    dest
  }
}
