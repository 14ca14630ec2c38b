package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** File-level statistics manifests from parquet FOOTERS — metadata
  * only, zero data IO. This is the pruning model every lakehouse scan
  * actually runs (a reader consults file/row-group min/max before
  * touching bytes), promoted to a first-class queryable table: layout
  * audits ("are my files' hkey ranges disjoint?"), skipping forecasts
  * ("which files would this probe touch?"), and OPTIMIZE planning all
  * read the manifest, never the data.
  *
  * Scale shape: one footer read per file — driver-side over the FS
  * listing, bounded by file count like every planning collect in this
  * engine (at real file counts, distribute the listing with
  * `spark.read.parquet(...).inputFiles` batches; the per-file work is
  * unchanged). The q_footer_manifest gate pins the contract that
  * makes the manifest trustworthy: footer stats must equal the stats
  * a full scan computes — the oracle rebuilds every row from DATA
  * (`read_parquet(..., filename=true)` + GROUP BY file) while the
  * engine reads ONLY footers.
  */
object FooterStats {

  /** Per-file (n_rows, min_c, max_c for each requested column) from
    * footers. Supported physical types: INT64, INT32, DOUBLE, FLOAT
    * (all surfaced as their natural Spark type). Files with zero rows
    * carry no stats and are omitted — they prune trivially. */
  def manifest(spark: SparkSession, path: String,
               cols: Seq[String]): DataFrame = {
    val root = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val rows = files.flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val blocks = {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getBlocks.asScala.toSeq
        }
        val nRows = blocks.map(_.getRowCount).sum
        if (nRows == 0) None
        else {
          val stats: Map[String, (Any, Any)] = cols.map { c =>
            import scala.jdk.CollectionConverters._
            val chunks = blocks.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == c)
            require(chunks.nonEmpty,
              s"column $c not found in ${f.getPath}")
            // physical type alone can lie: DECIMAL/DATE/TIME(STAMP)
            // annotate INT32/INT64 storage, and surfacing their raw
            // unscaled integers as min/max would make the manifest
            // silently wrong — the exact silent lie the fail-loud
            // contract below exists to forbid. Accept only plain
            // signed ints and IEEE floats.
            chunks.foreach { ch =>
              val pt = ch.getPrimitiveType
              val ann = pt.getLogicalTypeAnnotation
              val plain = ann == null || (ann match {
                case i: org.apache.parquet.schema.LogicalTypeAnnotation
                    .IntLogicalTypeAnnotation => i.isSigned
                case _ => false
              })
              require(plain,
                s"column $c in ${f.getPath} is logically annotated " +
                  s"$ann over ${pt.getPrimitiveTypeName} storage — raw " +
                  "footer stats would surface unscaled/encoded values; " +
                  "the manifest refuses to misinterpret them")
            }
            val ss = chunks.map(_.getStatistics)
            require(ss.forall(s => s != null && s.hasNonNullValue),
              s"column $c in ${f.getPath} carries no footer stats — " +
                "the manifest would silently lie; fail loud instead")
            val mins: Seq[AnyRef] =
              ss.map(_.genericGetMin.asInstanceOf[AnyRef])
            val maxs: Seq[AnyRef] =
              ss.map(_.genericGetMax.asInstanceOf[AnyRef])
            def ord(vs: Seq[AnyRef], max: Boolean): Any = vs.head match {
              case _: java.lang.Long =>
                val l = vs.map(_.asInstanceOf[java.lang.Long].longValue)
                if (max) l.max else l.min
              case _: java.lang.Integer =>
                val l = vs.map(_.asInstanceOf[java.lang.Integer].intValue)
                if (max) l.max else l.min
              case _: java.lang.Double =>
                val l = vs.map(_.asInstanceOf[java.lang.Double].doubleValue)
                if (max) l.max else l.min
              case _: java.lang.Float =>
                val l = vs.map(_.asInstanceOf[java.lang.Float].floatValue)
                if (max) l.max else l.min
              case other => throw new IllegalArgumentException(
                s"unsupported footer-stat type for $c: ${other.getClass}")
            }
            c -> ((ord(mins, max = false), ord(maxs, max = true)))
          }.toMap
          Some(Row.fromSeq(
            f.getPath.getName +: nRows +:
              cols.flatMap(c => Seq(stats(c)._1, stats(c)._2))))
        }
      } finally reader.close()
    }
    val colType: Map[String, DataType] = rows.headOption.map { r =>
      cols.zipWithIndex.map { case (c, i) =>
        c -> (r.get(2 + 2 * i) match {
          case _: Long => LongType
          case _: Int => IntegerType
          case _: Double => DoubleType
          case _: Float => FloatType
          case other => throw new IllegalArgumentException(
            s"unsupported stat value for $c: ${other.getClass}")
        })
      }.toMap
    }.getOrElse(cols.map(_ -> LongType).toMap)
    val schema = StructType(
      StructField("file", StringType) ::
        StructField("n_rows", LongType) ::
        cols.toList.flatMap(c => Seq(
          StructField(s"min_$c", colType(c)),
          StructField(s"max_$c", colType(c)))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
