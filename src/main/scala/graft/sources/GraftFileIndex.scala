package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.ops.TableStore
import graft.ops.TableStore.FileEntry

/** The versioned store as a Spark `FileIndex` — the hook that puts
  * [[TableStore]] snapshots under the NATIVE parquet scan
  * (FileSourceScanExec: vectorized reader, whole-stage codegen,
  * parquet predicate pushdown) while the COMMIT LOG, not a filesystem
  * listing, decides which files exist and which the query's filters
  * can skip. `listFiles` receives the query's data filters from
  * FileSourceStrategy, translates them to the `sources.Filter` ADT,
  * and drops every file whose log-carried bounds prove it irrelevant
  * ([[StatsSkipping]]) — Delta-style data skipping, planned entirely
  * from metadata.
  *
  * Scale shape: the file list and its bounds come from one
  * metadata-sized log replay captured at construction (the snapshot
  * pin — a concurrent commit cannot change what this index lists);
  * per-file sizes ride the log (`n_bytes`), so only pre-upgrade files
  * cost a driver stat. Skipping is a driver-side filter over that
  * list — bounded by file count, the same planning budget every
  * maintenance op already spends.
  */
class GraftFileIndex(spark: SparkSession, root: String, version: Long,
                     live: Seq[FileEntry]) extends FileIndex {

  /** The snapshot's log entries — exact per-file footer row counts
    * for the metadata-only COUNT rewrite ([[GraftRewrite]]). */
  private[sources] def entries: Seq[FileEntry] = live

  def this(spark: SparkSession, root: String, version: Long) =
    this(spark, root, version, TableStore.liveAt(spark, root, version))

  private val statuses: Seq[(FileEntry, FileStatus)] = {
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    live.map { e =>
      val p = new Path(TableStore.resolve(root, e.path))
      val len =
        if (e.bytes > 0) e.bytes else fs.getFileStatus(p).getLen
      // modification time 0: the snapshot is immutable by contract,
      // so no freshness check ever consults it
      e -> new FileStatus(len, false, 1, 128L << 20, 0L, p)
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val v1 = dataFilters.flatMap(f =>
      org.apache.spark.sql.graftbridge.Bridge.translateFilter(f))
    val kept = statuses.collect {
      case (e, st) if v1.forall(StatsSkipping.mayContain(e, _)) => st
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def partitionSchema: StructType = new StructType()
}
