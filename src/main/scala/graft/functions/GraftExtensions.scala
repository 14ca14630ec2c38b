package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** SQL surface for the native graft expressions — registered through
  * the standard `SparkSessionExtensions` hook (config
  * `spark.sql.extensions=graft.functions.GraftExtensions`, wired by
  * GraftSession), so `spark.sql(...)` users call the same codegen'd
  * operators the DataFrame API uses:
  *
  * {{{
  *   SELECT word_shingles(text, 3)            FROM docs
  *   SELECT simhash_bits(hashes, 60)          FROM hashed
  *   SELECT hyperplane_buckets(vec, 8, 4)     FROM scaled
  *   SELECT nearest_centroid(vec, codebook)   FROM scaled
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${args.length}")
    args
  }

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", classOf[WordShingles]),
      (in: Seq[Expression]) => { val args = arity("word_shingles", 2)(in)
        WordShingles(args.head, intLit(args(1), "shingle size k")) }))
    ext.injectFunction((FunctionIdentifier("simhash_bits"),
      info("simhash_bits", classOf[SimHashBits]),
      (in: Seq[Expression]) => { val args = arity("simhash_bits", 2)(in)
        SimHashBits(args.head, intLit(args(1), "bits")) }))
    ext.injectFunction((FunctionIdentifier("hyperplane_buckets"),
      info("hyperplane_buckets", classOf[HyperplaneBuckets]),
      (in: Seq[Expression]) => { val args = arity("hyperplane_buckets", 3)(in)
        HyperplaneBuckets(args.head,
          intLit(args(1), "planes"), intLit(args(2), "tables")) }))
    ext.injectFunction((FunctionIdentifier("nearest_centroid"),
      info("nearest_centroid", classOf[NearestCentroid]),
      (in: Seq[Expression]) => { val args = arity("nearest_centroid", 2)(in)
        NearestCentroid(args.head, args(1)) }))
    ext.injectFunction((FunctionIdentifier("trigram_scores"),
      info("trigram_scores", classOf[TrigramScores]),
      (in: Seq[Expression]) => { val args = arity("trigram_scores", 2)(in)
        TrigramScores(args.head, profilesLit(args(1))) }))
    ext.injectFunction((FunctionIdentifier("nearest_centroid_l2"),
      info("nearest_centroid_l2", classOf[NearestCentroidL2]),
      (in: Seq[Expression]) => {
        val args = arity("nearest_centroid_l2", 2)(in)
        NearestCentroidL2(args.head, args(1)) }))
    ext.injectFunction((FunctionIdentifier("pq_lut"),
      info("pq_lut", classOf[PqLut]),
      (in: Seq[Expression]) => { val args = arity("pq_lut", 2)(in)
        PqLut(args.head, args(1)) }))
    ext.injectFunction((FunctionIdentifier("pq_adc"),
      info("pq_adc", classOf[PqAdc]),
      (in: Seq[Expression]) => { val args = arity("pq_adc", 2)(in)
        PqAdc(args.head, args(1)) }))
    // versioned-store SQL surface: row-level DML (DELETE/UPDATE/MERGE
    // claimed by GraftDmlRule BEFORE the scan rewrite can strip the V2
    // relation out from under the command), then rewrite remaining
    // GraftStoreTable relations to the native pruned parquet scan
    // (graft.sources.GraftRewrite), plus table-valued sugar over the
    // change feed / audit log so CDC consumers don't hand-roll
    // readRowChanges plumbing
    ext.injectResolutionRule(session =>
      graft.sources.GraftDmlRule(session))
    ext.injectPlannerStrategy(session =>
      graft.sources.GraftDmlStrategy(session))
    ext.injectResolutionRule(session =>
      graft.sources.GraftRewrite(session))
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      info("table_changes", classOf[graft.sources.GraftCatalog]),
      (in: Seq[Expression]) => {
        if (in.length != 2 && in.length != 3)
          throw new IllegalArgumentException(
            "table_changes(store_path, since_version[, to_version])")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.ops.TableStore.readRowChanges(spark,
          strLit(in.head, "store path"),
          longLit(in(1), "since version"),
          in.lift(2).map(longLit(_, "to version")))
          .queryExecution.analyzed
      }))
    ext.injectTableFunction((FunctionIdentifier("table_history"),
      info("table_history", classOf[graft.sources.GraftCatalog]),
      (in: Seq[Expression]) => {
        val args = arity("table_history", 1)(in)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.ops.TableStore.history(spark,
          strLit(args.head, "store path")).queryExecution.analyzed
      }))
    ext.injectTableFunction((FunctionIdentifier("run_manifest"),
      info("run_manifest", classOf[graft.sources.GraftCatalog]),
      (in: Seq[Expression]) => {
        val args = arity("run_manifest", 1)(in)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.ops.RunManifest.currentFrame(spark,
          strLit(args.head, "manifest root"))
          .queryExecution.analyzed
      }))
    // the ANN stack end-to-end from SQL: score `queries` against
    // `corpus` through the PERSISTED IVF index (the newest committed
    // codebook under artifacts_root — Similarity.saveCodebook's
    // artifact), k results per query, n_probe cells probed. Corpus
    // and queries are store roots OR plain parquet dirs exposing
    // columns (id, vec) — the retrieval family's API shapes, now one
    // SELECT for the reference's SQL-only audience:
    //   SELECT * FROM ann_topk('/wh/_ann', '/wh/corpus',
    //                          '/wh/queries', 10, 4)
    ext.injectTableFunction((FunctionIdentifier("ann_topk"),
      info("ann_topk", classOf[graft.ops.Similarity.type]),
      (in: Seq[Expression]) => {
        val args = arity("ann_topk", 5)(in)
        val spark = org.apache.spark.sql.SparkSession.active
        def readAny(root: String) = {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          val isStore =
            fs.exists(new org.apache.hadoop.fs.Path(s"$root/_log")) ||
              fs.exists(new org.apache.hadoop.fs.Path(s"$root/_schema"))
          val df = if (isStore) graft.ops.TableStore.read(spark, root)
            else spark.read.parquet(root)
          require(df.columns.contains("id") && df.columns.contains("vec"),
            s"ann_topk reads (id, vec) columns; $root has " +
              s"[${df.columns.mkString(",")}] — alias/select first")
          df
        }
        val codebook = graft.ops.Similarity.loadLatestCodebook(spark,
          strLit(args.head, "artifacts root"))
        graft.ops.Similarity.ivfTopK(
            readAny(strLit(args(2), "queries root")), "id", "vec",
            readAny(strLit(args(1), "corpus root")), "id", "vec",
            intLit(args(3), "k"), codebook.size,
            intLit(args(4), "n_probe"), Some(codebook))
          .queryExecution.analyzed
      }))
    ext.injectTableFunction((FunctionIdentifier("table_stats"),
      info("table_stats", classOf[graft.sources.GraftCatalog]),
      (in: Seq[Expression]) => {
        if (in.isEmpty || in.length > 2)
          throw new IllegalArgumentException(
            "table_stats(store_path[, version])")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.ops.TableStore.metaStats(spark,
          strLit(in.head, "store path"),
          in.lift(1).map(longLit(_, "version")))
          .queryExecution.analyzed
      }))
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      u.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(i: Int, IntegerType) => i.toLong
    case Literal(l: Long, _: org.apache.spark.sql.types.LongType) => l
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Constant-fold an `array(array('…'))` profiles argument — the
    * expression compiles the patterns into its codegen, so they must
    * be literal at plan time. */
  private def profilesLit(e: Expression): Seq[Seq[String]] = {
    val ok = e.resolved && e.foldable && (e.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"trigram profiles must be a literal ARRAY<ARRAY<STRING>>, got $e")
    val ad = e.eval().asInstanceOf[ArrayData]
    (0 until ad.numElements()).map { i =>
      val inner = ad.getArray(i)
      (0 until inner.numElements()).map(j =>
        inner.getUTF8String(j).toString)
    }
  }
}
