package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: the interleave expression against a Scala reference
  * implementation, the range guard, normalize's exact floor division,
  * the clustered-write disjointness contract, and the operational
  * skipping win the evidence query records.
  */
class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave — independent bit-by-bit loop. */
  private def zRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("zValue matches the reference interleave on a dense sweep") {
    val s = spark; import s.implicits._
    val bits = 6
    val pairs = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == zRef(a, b, bits),
        s"z($a,$b) = ${got((a, b))} != ref ${zRef(a, b, bits)}")
    }
  }

  test("zValue at full 20-bit width: boundary and random probes") {
    val s = spark; import s.implicits._
    val bits = 20
    val max = (1L << bits) - 1
    val rng = new scala.util.Random(42)
    val probes = Seq((0L, 0L), (max, max), (max, 0L), (0L, max)) ++
      Seq.fill(200)((rng.nextLong().abs % (max + 1),
        rng.nextLong().abs % (max + 1)))
    val got = probes.toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    probes.foreach { case (a, b) =>
      assert(got((a, b)) == zRef(a, b, bits))
    }
    assert(got((max, max)) == (1L << (2 * bits)) - 1) // all bits set
  }

  test("zValueN: 3-dim interleave matches an independent reference " +
    "on a dense sweep; dim order is major-first") {
    val s = spark; import s.implicits._
    val bits = 3
    def ref(vs: Seq[Long]): Long = {
      val d = vs.length
      var z = 0L
      for (i <- 0 until bits; j <- 0 until d)
        z |= ((vs(j) >> i) & 1L) << (i * d + (d - 1 - j))
      z
    }
    val triples = for (a <- 0L until 8L; b <- 0L until 8L;
                       c <- 0L until 8L) yield (a, b, c)
    val got = triples.toDF("a", "b", "c")
      .withColumn("z", Layout.zValueN(
        Seq(col("a"), col("b"), col("c")), bits))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    triples.foreach { case t @ (a, b, c) =>
      assert(got(t) == ref(Seq(a, b, c)), s"z$t")
    }
    // major dimension owns the top bit: (4,0,0) > any (0,b,c)
    assert(got((4L, 0L, 0L)) > got((0L, 7L, 7L)))
    // 2-dim form is the N-dim form at D=2
    val two = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 3).as("z1"),
        Layout.zValueN(Seq(col("a"), col("b")), 3).as("z2"))
      .head()
    assert(two.getLong(0) == two.getLong(1))
  }

  test("zValueN rejects dims*bits beyond a signed long") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
    intercept[IllegalArgumentException] {
      Layout.zValueN(Seq(col("a"), col("b"), col("c")), 21) // 63 > 62
    }
  }

  test("zValue raises on out-of-range and null inputs") {
    val s = spark; import s.implicits._
    def run(a: java.lang.Long, b: java.lang.Long): Unit =
      Seq((a, b)).toDF("a", "b")
        .select(Layout.zValue(col("a"), col("b"), 4)).collect()
    intercept[Exception](run(16L, 0L)) // = 2^4
    intercept[Exception](run(0L, -1L))
    intercept[Exception](run(null, 3L))
    run(15L, 15L) // in range: must not throw
  }

  test("normalize is exact floor division onto the grid") {
    val s = spark; import s.implicits._
    val maxV = 999L
    val vals = (0L to maxV).toDF("v")
      .withColumn("n", Layout.normalize(col("v"), maxV, 10))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to maxV).foreach { v =>
      assert(vals(v) == v * 1024 / (maxV + 1), s"normalize($v)")
      assert(vals(v) >= 0 && vals(v) < 1024)
    }
    assert(vals(maxV) == maxV * 1024 / (maxV + 1)) // top stays < 2^bits
  }

  test("writeZOrdered: files carry disjoint z-ranges (the skipping " +
    "contract) and the write plans one range Exchange, no global sort") {
    val s = spark; import s.implicits._
    val dir = graft.TempRoots.create("graft_zw")
    val df = Tables.lineitem(s, TinySf).select(
      col("l_orderkey").cast("long").as("a"),
      col("l_partkey").cast("long").as("b"))
    val r = df.agg(max("a"), max("b")).head()
    val norm = df
      .withColumn("an", Layout.normalize(col("a"), r.getLong(0), 10))
      .withColumn("bn", Layout.normalize(col("b"), r.getLong(1), 10))
    // the pre-write frame writeZOrdered builds, for the plan assert
    val preWrite = norm
      .withColumn("_z", Layout.zValue(col("an"), col("bn"), 10))
      .repartitionByRange(8, col("_z"))
      .sortWithinPartitions("_z")
    val plan = preWrite.queryExecution.executedPlan.toString()
    assert(plan.contains("Exchange rangepartitioning"),
      s"expected a range Exchange:\n${plan.take(1500)}")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Sort ") && l.contains("global=true")),
      s"global sort leaked into the layout write:\n${plan.take(1500)}")

    Layout.writeZOrdered(norm, s"$dir/z", "an", "bn", bits = 10,
      numFiles = 8)
    val back = spark.read.parquet(s"$dir/z")
      .withColumn("z", Layout.zValue(col("an"), col("bn"), 10))
      .withColumn("f", input_file_name())
    val ranges = back.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length >= 2 && ranges.length <= 8,
      s"unexpected file count ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z-ranges: $ranges")
      case _ =>
    }
  }

  test("writeZOrderedN: 3-dim clustered write keeps disjoint z-ranges") {
    val s = spark; import s.implicits._
    val dir = graft.TempRoots.create("graft_zw3")
    val df = Tables.lineitem(s, TinySf).select(
      col("l_orderkey").cast("long").as("a"),
      col("l_partkey").cast("long").as("b"),
      col("l_suppkey").cast("long").as("c"))
    val r = df.agg(max("a"), max("b"), max("c")).head()
    val norm = df
      .withColumn("an", Layout.normalize(col("a"), r.getLong(0), 6))
      .withColumn("bn", Layout.normalize(col("b"), r.getLong(1), 6))
      .withColumn("cn", Layout.normalize(col("c"), r.getLong(2), 6))
    Layout.writeZOrderedN(norm, s"$dir/z3", Seq("an", "bn", "cn"),
      bits = 6, numFiles = 8)
    val back = spark.read.parquet(s"$dir/z3")
      .withColumn("z", Layout.zValueN(
        Seq(col("an"), col("bn"), col("cn")), 6))
      .withColumn("f", input_file_name())
    val ranges = back.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length >= 2 && ranges.length <= 8,
      s"unexpected file count ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z-ranges: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("the 3-D skipping win: z layout scans fewer rows than the " +
    "1-D layout over the 2x2x2 probe grid") {
    val rows = LayoutQueriesAccess.skipping3(spark, TinySf).collect()
    val byLayout = rows.groupBy(_.getString(0)).map { case (l, rs) =>
      l -> rs.map(_.getAs[Long]("rows_scanned")).sum
    }
    assert(byLayout("zorder") < byLayout("linear"),
      s"z layout must win on 3-D probes: $byLayout")
  }

  test("the 2-D skipping win: z layout scans fewer rows than the " +
    "1-D layout over the probe grid") {
    val rows = LayoutQueriesAccess.skipping(spark, TinySf).collect()
    val byLayout = rows.groupBy(_.getString(0)).map { case (l, rs) =>
      l -> rs.map(_.getAs[Long]("rows_scanned")).sum
    }
    assert(byLayout("zorder") < byLayout("linear"),
      s"z layout must win on 2-D probes: $byLayout")
    // off-axis probes (an a-band narrower than the full domain) are
    // where the linear layout pays full fan-out: every such probe must
    // touch ALL its files under the linear layout at uniform data
    val linearAll = rows.filter(_.getString(0) == "linear")
      .map(_.getAs[Long]("files_touched"))
    assert(linearAll.forall(_ >= 8), s"probe grid unexpectedly narrow")
  }

  test("hilbert index: bijection and unit-step adjacency (the locality " +
      "property Morton lacks) — exhaustive at 3 bits") {
    import graft.functions.HilbertIndex
    val bits = 3
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield ((x, y), HilbertIndex.compute(x.toLong, y.toLong, bits))
    // bijection onto [0, 4^bits)
    assert(cells.map(_._2).sorted == (0L until (n.toLong * n)),
      "hilbert must be a bijection onto the curve")
    // THE Hilbert property: consecutive curve positions are GRID
    // neighbours (|dx|+|dy| = 1); Morton violates this at every
    // quadrant seam (checked below, so the comparison instrument
    // measures a real difference)
    val byD = cells.map(_.swap).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between d-neighbours: ($x1,$y1) -> ($x2,$y2)")
    }
    val mortonByD = (for (x <- 0 until n; y <- 0 until n) yield {
      val z = (0 until bits).map(i =>
        (((x >> i) & 1) << (2 * i + 1)) | (((y >> i) & 1) << (2 * i)))
        .reduce(_ | _)
      (z, (x, y))
    }).sortBy(_._1).map(_._2)
    val mortonJumps = mortonByD.sliding(2).count {
      case Seq((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "Morton should jump at quadrant seams")
  }

  test("hilbert index raises on out-of-range input") {
    import graft.functions.HilbertIndex
    intercept[IllegalArgumentException](HilbertIndex.compute(8, 0, 3))
    intercept[IllegalArgumentException](HilbertIndex.compute(0, -1, 3))
  }

  test("the curve-swap win: hilbert layout touches fewer files AND " +
      "rows than morton under equal-count splits") {
    val rows = LayoutQueriesAccess.hskipping(spark, TinySf).collect()
    val byLayout = rows.groupBy(_.getString(0)).view.mapValues(rs =>
      (rs.map(_.getAs[Long]("files_touched")).sum,
        rs.map(_.getAs[Long]("rows_scanned")).sum)).toMap
    val (hf, hr) = byLayout("hilbert")
    val (zf, zr) = byLayout("zorder")
    info(s"files hilbert=$hf zorder=$zf; rows hilbert=$hr zorder=$zr")
    assert(hf < zf, s"hilbert must touch fewer files: $byLayout")
    assert(hr < zr, s"hilbert must scan fewer rows: $byLayout")
  }

  test("writeHilbert: files carry disjoint hilbert ranges") {
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_hil"))
      .toString + "/t"
    val df = spark.range(0, 4096).selectExpr(
      "id % 64 AS x", "(id * 37) % 64 AS y")
    graft.ops.Layout.writeHilbert(df, dir, "x", "y", bits = 6,
      numFiles = 8)
    val back = spark.read.parquet(dir)
      .withColumn("_h",
        graft.ops.Layout.hilbertValue(col("x"), col("y"), 6))
      .withColumn("_f", input_file_name())
    val ranges = back.groupBy("_f")
      .agg(min("_h").as("lo"), max("_h").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file hilbert-ranges overlap: $ranges")
    }
  }

  test("hilbertCover: exhaustive at 3 bits — every box's cover is " +
      "exactly the islands of its cells, disjoint sorted merged") {
    import graft.functions.HilbertIndex
    import graft.ops.Layout
    val bits = 3
    val n = 1 << bits
    for {
      lox <- 0 until n; hix <- lox until n
      loy <- 0 until n; hiy <- loy until n
    } {
      val cover = Layout.hilbertCover(lox, hix, loy, hiy, bits)
      // sorted, disjoint, non-adjacent (i.e. maximal islands)
      cover.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) =>
          assert(h1 + 1 < l2, s"unmerged/overlapping ranges: $cover")
        case _ =>
      }
      val covered = cover.flatMap { case (lo, hi) => lo to hi }.toSet
      val boxCells = (for {
        x <- lox to hix; y <- loy to hiy
      } yield HilbertIndex.compute(x.toLong, y.toLong, bits)).toSet
      assert(covered == boxCells,
        s"cover of [$lox,$hix]x[$loy,$hiy] != box cells")
    }
  }

  test("mortonCover: exhaustive at 3 bits — same island contract as " +
      "hilbert; hilbert needs strictly fewer ranges in total") {
    import graft.ops.Layout
    val bits = 3
    val n = 1 << bits
    var (hTotal, mTotal) = (0L, 0L)
    for {
      lox <- 0 until n; hix <- lox until n
      loy <- 0 until n; hiy <- loy until n
    } {
      val mc = Layout.mortonCover(lox, hix, loy, hiy, bits)
      val covered = mc.flatMap { case (lo, hi) => lo to hi }.toSet
      val boxCells = (for {
        x <- lox to hix; y <- loy to hiy
      } yield Layout.mortonIndex(x.toLong, y.toLong, bits)).toSet
      assert(covered == boxCells,
        s"morton cover of [$lox,$hix]x[$loy,$hiy] != box cells")
      hTotal += Layout.hilbertCover(lox, hix, loy, hiy, bits).length
      mTotal += mc.length
    }
    info(s"total ranges over all boxes: hilbert=$hTotal morton=$mTotal")
    assert(hTotal < mTotal,
      "seam-continuity must reduce total range count")
  }

  test("coverPredicate pushdown: filtering the clustered key by the " +
      "cover equals filtering by the box directly") {
    import graft.ops.Layout
    val bits = 6
    val df = spark.range(0, 4096).selectExpr(
      "id % 64 AS x", "(id * 37) % 64 AS y")
      .withColumn("h", Layout.hilbertValue(col("x"), col("y"), bits))
    val (lox, hix, loy, hiy) = (11L, 37L, 5L, 50L)
    val viaCover = df.filter(Layout.coverPredicate(col("h"),
      Layout.hilbertCover(lox, hix, loy, hiy, bits)))
    val viaBox = df.filter(col("x") >= lox && col("x") <= hix &&
      col("y") >= loy && col("y") <= hiy)
    assert(rowsAsSet(viaCover) == rowsAsSet(viaBox))
    assert(viaBox.count() > 0, "probe box must be non-trivial")
  }

  test("footer manifest: metadata-only stats audit a clustered " +
      "layout's disjointness and forecast a probe's file set") {
    import graft.ops.{FooterStats, Layout}
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_manifest"))
      .toString + "/layer"
    spark.range(0, 4096)
      .selectExpr("id % 64 AS x", "(id * 37) % 64 AS y")
      .withColumn("hkey", Layout.hilbertValue(col("x"), col("y"), 6))
      .repartitionByRange(8, col("hkey"))
      .sortWithinPartitions("hkey")
      .write.mode("overwrite").parquet(dir)
    val m = FooterStats.manifest(spark, dir, Seq("hkey")).collect()
      .map(r => (r.getAs[Long]("min_hkey"), r.getAs[Long]("max_hkey"),
        r.getAs[Long]("n_rows"))).sortBy(_._1)
    assert(m.map(_._3).sum == 4096, "manifest rows must cover the layer")
    m.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 < lo2, s"clustered files must be hkey-disjoint: $m")
      case _ =>
    }
    // probe forecast off the manifest: files touched by a cover range
    val cover = Layout.hilbertCover(11, 37, 5, 50, 6)
    val touched = m.count { case (lo, hi, _) =>
      cover.exists { case (clo, chi) => hi >= clo && lo <= chi } }
    assert(touched > 0 && touched < m.length,
      s"probe should touch some but not all files: $touched/${m.length}")
  }

  test("footer manifest refuses logically-annotated storage (DATE/" +
      "DECIMAL over ints would surface unscaled raw values)") {
    import graft.ops.FooterStats
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_mann"))
      .toString + "/layer"
    spark.range(0, 64)
      .selectExpr("id AS k",
        "DATE'2024-01-01' + CAST(id AS INT) AS d",
        "CAST(id AS DECIMAL(10,2)) / 4 AS m")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // plain int column: fine
    assert(FooterStats.manifest(spark, dir, Seq("k")).count() == 1L)
    // DATE annotates INT32 — its raw footer ints are epoch days, and
    // surfacing them as values would be the silent lie the contract
    // forbids
    val exD = intercept[IllegalArgumentException] {
      FooterStats.manifest(spark, dir, Seq("d")).collect()
    }
    assert(exD.getMessage.contains("annotated"))
    // DECIMAL annotates INT64 with a scale — unscaled raw stats
    val exM = intercept[IllegalArgumentException] {
      FooterStats.manifest(spark, dir, Seq("m")).collect()
    }
    assert(exM.getMessage.contains("annotated"))
  }

  test("recluster repairs ONLY the overlapping files — atomic, " +
      "idempotent, content-preserving") {
    import graft.ops.{FooterStats, Layout}
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_recluster"))
      .toString + "/layer"
    val df = spark.range(0, 4096)
      .selectExpr("id % 64 AS x", "(id * 37) % 64 AS y")
      .withColumn("hkey", Layout.hilbertValue(col("x"), col("y"), 6))
    df.repartitionByRange(8, col("hkey")).sortWithinPartitions("hkey")
      .write.mode("overwrite").parquet(dir)
    // clean layer: planning finds nothing to do and touches nothing
    val before = spark.read.parquet(dir).inputFiles.toSet
    val r0 = Layout.recluster(spark, dir, "hkey")
    assert(r0.rewritten == 0 && r0.groups == 8, r0.toString)
    assert(spark.read.parquet(dir).inputFiles.toSet == before,
      "a no-op recluster must not republish the layer")
    // an appended narrow-range batch breaks disjointness LOCALLY
    val appended = df.filter(col("hkey").between(100, 300))
    appended.coalesce(1).write.mode("append").parquet(dir)
    val r1 = Layout.recluster(spark, dir, "hkey")
    assert(r1.rewritten >= 2, s"append+overlapped must rewrite: $r1")
    assert(r1.kept >= 5, s"far files must be kept, not re-encoded: $r1")
    assert(r1.kept + r1.rewritten == 9)
    // disjoint again, content = original ⊎ appended (multiset)
    val m = FooterStats.manifest(spark, dir, Seq("hkey")).collect()
      .map(r => (r.getAs[Long]("min_hkey"), r.getAs[Long]("max_hkey")))
      .sortBy(_._1)
    m.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"recluster must restore disjointness: ${m.toSeq}")
      case _ =>
    }
    val got = spark.read.parquet(dir)
      .groupBy("x", "y", "hkey").count()
    val want = df.unionByName(appended)
      .groupBy("x", "y", "hkey").count()
    assert(rowsAsSet(got) == rowsAsSet(want),
      "recluster must preserve the exact row multiset")
    // second run: clean again
    assert(Layout.recluster(spark, dir, "hkey").rewritten == 0)
  }

  test("InSortedRanges.contains: binary search agrees with a linear " +
      "scan over random sorted-disjoint covers") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      var next = rnd.nextInt(10).toLong
      val ranges = (0 until n).map { _ =>
        val lo = next + rnd.nextInt(5)
        val hi = lo + rnd.nextInt(8)
        next = hi + 1 + rnd.nextInt(5)
        (lo, hi)
      }
      val bounds = ranges.flatMap { case (lo, hi) => Seq(lo, hi) }.toArray
      (0L to next + 3).foreach { k =>
        val want = ranges.exists { case (lo, hi) => lo <= k && k <= hi }
        assert(
          graft.functions.InSortedRanges.contains(bounds, k) == want,
          s"contains($k) over ${ranges.take(5)}…")
      }
    }
    // unsorted / overlapping / ragged bounds fail loud at construction
    import graft.functions.InSortedRanges
    val c = org.apache.spark.sql.graftbridge.Bridge.expression(col("x"))
    intercept[IllegalArgumentException](InSortedRanges(c, Seq(5L, 3L)))
    intercept[IllegalArgumentException](
      InSortedRanges(c, Seq(1L, 4L, 4L, 9L)))
    intercept[IllegalArgumentException](InSortedRanges(c, Seq(1L)))
  }

  test("coverPredicateCompiled ≡ coverPredicate cell-for-cell over " +
      "the full grid, for every probe of the cover family") {
    val s = spark; import s.implicits._
    val bits = 6
    val grid = (0L until (1L << (2 * bits))).toDF("k")
    (0 until 8).foreach { p =>
      val lox = (p * 11) % 40; val hix = lox + 7 + p
      val loy = (p * 17) % 40; val hiy = loy + 5 + 2 * p
      val cover = Layout.hilbertCover(lox, hix, loy, hiy, bits)
      val both = grid.select(
        Layout.coverPredicate(col("k"), cover).as("or_form"),
        Layout.coverPredicateCompiled(col("k"), cover).as("bs_form"))
      assert(both.filter(col("or_form") =!= col("bs_form")).count() == 0,
        s"probe $p: the two cover-predicate forms diverged")
      assert(both.filter(col("bs_form")).count() ==
        cover.map { case (lo, hi) => hi - lo + 1 }.sum,
        s"probe $p: compiled form admits the wrong cell count")
    }
  }

  test("skipping-evidence plan: hash aggregates + broadcast probes, " +
    "never a sort-merge join or range Exchange") {
    val plan = LayoutQueriesAccess.skipping(spark, TinySf)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    // exactly one range Exchange: the 32-row final ORDER BY — the
    // row-scale stats/probe machinery must never range-partition
    val rangeEx = plan.linesIterator
      .count(_.contains("Exchange rangepartitioning"))
    assert(rangeEx <= 1, s"expected <=1 range Exchange, got $rangeEx:\n" +
      plan.take(1500))
  }
}

/** Test-side accessor for the package-private query bodies. */
object LayoutQueriesAccess {
  def skipping(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.queries.LayoutQueries.zorderSkipping.run(s, d)
  def skipping3(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.queries.LayoutQueries.zorder3Skipping.run(s, d)
  def hskipping(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.queries.LayoutQueries.hilbertSkipping.run(s, d)
}
