package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Hash-sampling invariants: reruns, repartitions, and rate increases
  * must behave like a reproducible corpus-construction primitive. */
class SamplingSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("sample is deterministic and partitioning-invariant") {
    val base = spark.range(10000).toDF("id")
    val a = ids(Sampling.sample(base, col("id"), 6554))
    val b = ids(Sampling.sample(base.repartition(7), col("id"), 6554))
    assert(a == b, "partitioning changed the sample membership")
    assert(a == ids(Sampling.sample(base, col("id"), 6554)))
  }

  test("sample rate lands near the target and rates nest") {
    val base = spark.range(10000).toDF("id")
    val ten = ids(Sampling.sample(base, col("id"), 6554))   // ~10%
    val thirty = ids(Sampling.sample(base, col("id"), 19661)) // ~30%
    val frac = ten.size / 10000.0
    assert(math.abs(frac - 0.1) < 0.02, s"10% sample drew $frac")
    assert(ten.subsetOf(thirty),
      "raising the rate must only ADD rows (nested samples)")
  }

  test("stratified rates apply per stratum with default fallback") {
    val s = spark; import s.implicits._
    val df = (0L until 9000L)
      .map(i => (i, Seq("en", "zh", "fr")((i % 3).toInt)))
      .toDF("id", "lang")
    val out = Sampling.stratified(df, col("lang"), col("id"),
      Map("en" -> 13107, "zh" -> 65536), defaultPer65536 = 32768)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("zh") == 3000L, "rate 65536 must keep the stratum whole")
    assert(math.abs(out("en") / 3000.0 - 0.2) < 0.04,
      s"en should sample ~20%: ${out("en")}")
    assert(math.abs(out("fr") / 3000.0 - 0.5) < 0.04,
      s"fr should fall back to ~50%: ${out("fr")}")
  }

  test("the sampling predicate pushes down to the scan") {
    val dir = graft.TempRoots.create("graft_samp")
    spark.range(1000).toDF("id").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val df = Sampling.sample(
      spark.read.parquet(s"$dir/t.parquet"), col("id"), 6554)
    val scan = df.queryExecution.executedPlan.toString()
    // the md5 comparison is a plain deterministic predicate: it must
    // sit in the scan's data filters, not a post-scan Filter only
    assert(scan.contains("PushedFilters") || scan.contains("Filter"),
      s"no filter in plan:\n${scan.take(800)}")
    assert(df.count() > 0)
  }

  test("weighted sampling: rate 0 drops, >=65536 keeps, monotone in rate") {
    val s = spark; import s.implicits._
    val df = (1L to 4000L).map(i => (i, (i % 40) * 2000)).toDF("id", "rate")
    val kept = Sampling.weighted(df, col("id"), col("rate"))
      .collect().map(_.getLong(0)).toSet
    // rate 0 rows (id % 40 == 0) never kept; rate >= 65536 always kept
    assert(kept.forall(_ % 40 != 0))
    assert((1L to 4000L).filter(i => (i % 40) * 2000 >= 65536)
      .forall(kept.contains), "rate >= 65536 must keep unconditionally")
    // raising every rate only ADDS rows (nested samples per row)
    val keptMore = Sampling.weighted(df, col("id"),
      col("rate") + 8000).collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(keptMore))
    // and the keep fraction tracks the rate roughly
    val half = Sampling.weighted(df, col("id"), lit(32768)).count()
    assert(math.abs(half / 4000.0 - 0.5) < 0.05, s"got $half/4000")
  }

  test("domainCap keeps at most cap rows per domain, deterministically") {
    val s = spark; import s.implicits._
    val df = (1L to 300L).map(i => (s"d${i % 3}", i)).toDF("dom", "id")
    val capped = Sampling.domainCap(df, col("dom"), col("id"), cap = 7)
    val perDom = capped.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDom.values.forall(_ == 7L), s"cap violated: $perDom")
    // small domains pass through whole
    val tiny = Sampling.domainCap(
      Seq(("d0", 1L), ("d0", 2L)).toDF("dom", "id"),
      col("dom"), col("id"), cap = 7)
    assert(tiny.count() == 2)
    // same selection on any partitioning
    assert(rowsAsSet(capped) ==
      rowsAsSet(Sampling.domainCap(df.repartition(11),
        col("dom"), col("id"), cap = 7)))
  }

  test("domainCap selection is stable as the corpus grows") {
    val s = spark; import s.implicits._
    val before = (1L to 100L).map(i => ("d", i)).toDF("dom", "id")
    val after = (1L to 200L).map(i => ("d", i)).toDF("dom", "id")
    val keptBefore = Sampling.domainCap(before, col("dom"), col("id"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val keptAfter = Sampling.domainCap(after, col("dom"), col("id"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    // hash-priority selection: new arrivals may displace old picks,
    // but survivors of the grown corpus that existed before must be
    // exactly the before-picks that still rank in the top cap — i.e.
    // the selection never RESHUFFLES among the original rows
    assert((keptAfter.filter(_ <= 100L) -- keptBefore).isEmpty,
      "an originally-unpicked row displaced an originally-picked one")
  }

  test("assignSplit: exhaustive, deterministic, shares near target") {
    val base = spark.range(20000).toDF("id")
    val splits = Seq("test" -> 6554, "val" -> 6554)
    val counts = base
      .withColumn("split", Sampling.assignSplit(col("id"), splits))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("test", "val", "train"),
      s"splits not exhaustive: $counts")
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.02, s"$counts")
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02, s"$counts")
    // partitioning-invariant, like every hash decision here
    val again = base.repartition(13)
      .withColumn("split", Sampling.assignSplit(col("id"), splits))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("assignSplit: growing a share only moves keys from the default") {
    val base = spark.range(20000).toDF("id")
    def sets(splits: Seq[(String, Int)]) = base
      .withColumn("split", Sampling.assignSplit(col("id"), splits))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
    val small = sets(Seq("test" -> 6554, "val" -> 6554))
    val grown = sets(Seq("test" -> 6554, "val" -> 13107))
    assert(small("test") == grown("test"),
      "growing val must not touch the test set")
    assert(small("val").subsetOf(grown("val")),
      "growing val must only ADD to it")
    assert((grown("val") -- small("val")).subsetOf(small("train")),
      "val grew from somewhere other than the default")
  }

  test("assignSplit rejects overlapping names and bad shares, both forms") {
    intercept[IllegalArgumentException](
      Sampling.assignSplit(col("id"), Seq("a" -> 1, "a" -> 2)))
    intercept[IllegalArgumentException](
      Sampling.assignSplit(col("id"), Seq("a" -> 1, "train" -> 2)))
    intercept[IllegalArgumentException](
      Sampling.assignSplit(col("id"), Seq("a" -> 40000, "b" -> 40000)))
    // a negative share would make later ranges overlap earlier ones —
    // where the Column fold and the SQL CASE resolve DIFFERENTLY
    intercept[IllegalArgumentException](
      Sampling.assignSplit(col("id"), Seq("a" -> 100, "b" -> -50)))
    intercept[IllegalArgumentException](
      Sampling.assignSplitSql("id", Seq("a" -> 100, "b" -> -50)))
  }

  test("globalShuffle guards its reserved columns; null keys stay null") {
    val s = spark; import s.implicits._
    intercept[IllegalArgumentException](Sampling.globalShuffle(
      Seq((1L, "x")).toDF("id", "shard"), col("id"), "e", 4))
    intercept[IllegalArgumentException](Sampling.globalShuffle(
      Seq((1L, "x")).toDF("id", "_pri"), col("id"), "e", 4))
    // null key → null priority/shard (matches the SQL mirror's ||
    // semantics; concat_ws would pile every null key into ONE shard)
    val r = Seq(Option(7L), Option.empty[Long]).toDF("id")
      .select(Sampling.shufflePriority(col("id"), "e").as("p"),
        Sampling.shardOf(col("id"), "e", 4).as("sh"))
      .collect()
    assert(r.exists(row => row.isNullAt(0) && row.isNullAt(1)),
      "null key must yield null priority and shard")
    assert(r.exists(row => !row.isNullAt(0) && !row.isNullAt(1)))
  }

  test("cluster-keyed split never separates near-duplicates; id-keyed can") {
    val s = spark; import s.implicits._
    // two-doc clusters whose member ids hash to DIFFERENT splits when
    // keyed by doc id — the leakage the cluster key prevents
    val members = (0L until 2000L).map(i => (i, i / 2)) // pairs share cluster
      .toDF("doc_id", "cluster_id")
    val splits = Seq("test" -> 6554, "val" -> 6554)
    val byDoc = members.withColumn("split",
      Sampling.assignSplit(col("doc_id"), splits))
    val straddlingByDoc = byDoc.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(straddlingByDoc > 0,
      "fixture too small to demonstrate doc-keyed leakage")
    val byCluster = members.withColumn("split",
      Sampling.assignSplit(col("cluster_id"), splits))
    val straddlingByCluster = byCluster.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(straddlingByCluster == 0,
      "cluster-keyed assignment split a cluster across splits")
  }

  test("selectToBudget: best-first fill, first overrun included, monotone") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("en", 1L, 50L, 900), ("en", 2L, 60L, 800), ("en", 3L, 70L, 700),
      ("de", 4L, 200L, 999), // single doc larger than the whole budget
      ("fr", 5L, 40L, 500), ("fr", 6L, 40L, 500) // score tie -> key order
    ).toDF("lang", "id", "toks", "score")
    def kept(budget: Long) = Sampling.selectToBudget(df, col("lang"),
        col("score"), col("toks"), col("id"), lit(budget))
      .select("id").collect().map(_.getLong(0)).toSet
    // budget 100: en takes 900(50) then 800(60) overruns -> included,
    // 700 excluded; de's first doc overruns alone -> included;
    // fr tie at 500 breaks by id: 5 then 6 (overrun, included)
    assert(kept(100L) == Set(1L, 2L, 4L, 5L, 6L))
    // a tighter budget keeps a subset (monotone in budget)
    assert(kept(40L) == Set(1L, 4L, 5L))
    assert(kept(40L).subsetOf(kept(100L)))
    // per-group budgets via an expression
    val mixed = Sampling.selectToBudget(df, col("lang"), col("score"),
        col("toks"), col("id"),
        when(col("lang") === "en", 200L).otherwise(10L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mixed == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("globalShuffle: a seeded, rerun-stable permutation into balanced shards") {
    val base = spark.range(8000).toDF("id")
    def perm(df: org.apache.spark.sql.DataFrame, seed: String) =
      Sampling.globalShuffle(df, col("id"), seed, 8)
        .orderBy(col("shard"), Sampling.shufflePriority(col("id"), seed))
        .select("id").collect().map(_.getLong(0)).toSeq
    val a = perm(base, "epoch-0")
    assert(a == perm(base.repartition(13), "epoch-0"),
      "permutation must not depend on input partitioning")
    assert(a.toSet == (0L until 8000L).toSet, "shuffle lost or duped rows")
    assert(a != (0L until 8000L).toSeq, "permutation left input order intact")
    val b = perm(base, "epoch-1")
    assert(a != b, "different seeds must permute differently")
    assert(a.toSet == b.toSet)
    // shard bounds and rough balance
    val sizes = Sampling.globalShuffle(base, col("id"), "epoch-0", 8)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet.forall(s => s >= 0 && s < 8), s"shard ids: $sizes")
    assert(sizes.size == 8 && sizes.values.forall(n =>
      math.abs(n - 1000L) < 200), s"unbalanced shards: $sizes")
  }

  test("the shard signature query plans exactly one Exchange (sort reused)") {
    val base = spark.range(4000).toDF("id")
    import org.apache.spark.sql.expressions.Window
    val shuffled = Sampling.globalShuffle(base, col("id"), "e", 8)
    val w = Window.partitionBy(col("shard"))
      .orderBy(Sampling.shufflePriority(col("id"), "e").asc, col("id").asc)
    val agg = shuffled.withColumn("rn", row_number().over(w))
      .groupBy("shard").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString()
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"window+agg must reuse the shuffle's partitioning:\n${plan.take(2500)}")
  }

  test("writeShards lands one sorted directory per shard") {
    val dir = graft.TempRoots.create("graft_shards")
    val base = spark.range(2000).toDF("id")
    Sampling.writeShards(base, col("id"), "epoch-0", 4, s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 2000L).toSet, "read-back lost rows")
    assert(back.select("shard").distinct().count() == 4)
    // each shard directory's files hold rows in priority order
    val shard0 = spark.read
      .parquet(s"$dir/out/shard=0").select("id")
      .collect().map(_.getLong(0)).toSeq
    val expected = Sampling.globalShuffle(base, col("id"), "epoch-0", 4)
      .filter(col("shard") === 0)
      .orderBy(Sampling.shufflePriority(col("id"), "epoch-0"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(shard0 == expected, "shard 0 not in priority order on disk")
  }

  // ----- temperature rebalancing ------------------------------------

  /** 3 groups with counts 400 / 1600 / 6400: exact 1:4:16 ratios so
    * the alpha=1/2 target rates are clean (1, 1/2, 1/4). */
  private def tempFixture = {
    val s = spark; import s.implicits._
    (0L until 8400L).map { i =>
      val g = if (i < 400) "small" else if (i < 2000) "mid" else "big"
      (i, g)
    }.toDF("id", "grp")
  }

  test("temperature keeps the smallest group whole and downsamples " +
    "larger groups toward the alpha rate") {
    val kept = Sampling.temperature(tempFixture, col("grp"), col("id"),
        p = 1, q = 2)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 400L,
      "n = n_min group must be kept whole (rate exactly 1)")
    // target rates: mid sqrt(400/1600)=1/2, big sqrt(400/6400)=1/4
    assert(math.abs(kept("mid") / 1600.0 - 0.5) < 0.05,
      s"mid kept ${kept("mid")}/1600, want ~1/2")
    assert(math.abs(kept("big") / 6400.0 - 0.25) < 0.05,
      s"big kept ${kept("big")}/6400, want ~1/4")
  }

  test("temperature alpha=0 equalizes expected group sizes and nests " +
    "inside alpha=1/2") {
    def ids(p: Int, q: Int) =
      Sampling.temperature(tempFixture, col("grp"), col("id"), p, q)
        .select("id").collect().map(_.getLong(0)).toSet
    val eq = ids(0, 1); val half = ids(1, 2)
    val byGrp = tempFixture.filter(col("id").isInCollection(eq))
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("small", "mid", "big").foreach { g =>
      assert(math.abs(byGrp(g) - 400.0) < 60,
        s"alpha=0 should equalize to ~400 per group; $g got ${byGrp(g)}")
    }
    assert(eq.subsetOf(half),
      "lowering alpha must only REMOVE rows (nested selections)")
  }

  test("temperatureWithCounts on a stored profile matches the " +
    "self-counting path exactly") {
    val df = tempFixture
    val profile = df.groupBy(col("grp")).count()
    val a = Sampling.temperature(df, col("grp"), col("id"), 1, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling
      .temperatureWithCounts(df, profile, col("grp"), col("id"), 1, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "profile-fed path diverged from self-counting path")
  }

  test("temperature plan contract: the data path never shuffles — " +
    "only the two category-sized count aggregates exchange, and " +
    "both joins broadcast") {
    val plan = Sampling.temperature(tempFixture, col("grp"), col("id"),
      1, 2).queryExecution.executedPlan.toString()
    // 3 category-sized exchanges: the counts aggregate, its recompute
    // under the one-row min, and the min's single-partition gather —
    // none of them carries data rows
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges <= 3,
      s"expected only category-sized aggregates to exchange:\n${plan.take(2500)}")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"count joins must broadcast, never shuffle the data:\n${plan.take(2500)}")
  }

  test("temperature: a null group is a real group, never silently " +
    "dropped") {
    val s = spark; import s.implicits._
    val df = (0L until 600L)
      .map(i => (i, if (i < 100) None else Some("big")))
      .toDF("id", "grp")
    val kept = Sampling.temperature(df, col("grp"), col("id"), 1, 2)
    val nullKept = kept.filter(col("grp").isNull).count()
    assert(nullKept == 100L,
      s"null group is n_min (100 of 600) and must be kept whole: $nullKept")
  }

  test("temperature rejects exponents outside the exact-digit budget") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureKeep(col("id"), col("n"), col("m"), 3, 10)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureKeep(col("id"), col("n"), col("m"), 2, 2)
    }
  }

  test("mixturePlan: allocations sum exactly to the budget, leftover " +
    "units go to the largest remainders, caps flag and bind") {
    val s = spark; import s.implicits._
    // weights 1:1:1 over budget 100 -> base 33 each, leftover 1 to the
    // largest remainder (all tied at 1 -> domain asc wins: 'a')
    val avail = Seq(("a", 1000L), ("b", 1000L), ("c", 1000L))
      .toDF("domain", "n")
    val w = Seq(("a", 10L), ("b", 10L), ("c", 10L))
      .toDF("domain", "weight_milli")
    val r = Sampling.mixturePlan(avail, "domain", "n", w, budget = 100L)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r == Map("a" -> 34L, "b" -> 33L, "c" -> 33L), r.toString)

    // capping: 'b' can only supply 10 of its ideal 50; the surplus is
    // NOT silently re-spread (sum < budget, capped flagged)
    val avail2 = Seq(("a", 1000L), ("b", 10L)).toDF("domain", "n")
    val w2 = Seq(("a", 10L), ("b", 10L)).toDF("domain", "weight_milli")
    val rows = Sampling.mixturePlan(avail2, "domain", "n", w2,
      budget = 100L).collect()
    val byDom = rows.map(x =>
      x.getString(0) -> (x.getLong(3), x.getInt(4))).toMap
    assert(byDom("a") == (50L, 0))
    assert(byDom("b") == (10L, 1))
  }

  test("mixturePlan: a weighted domain absent from avail is kept as " +
    "a capped n_avail=0 row, never silently dropped") {
    val s = spark; import s.implicits._
    val avail = Seq(("a", 1000L)).toDF("domain", "n")
    val w = Seq(("a", 10L), ("ghost", 10L)).toDF("domain", "weight_milli")
    val rows = Sampling.mixturePlan(avail, "domain", "n", w,
      budget = 100L).collect()
    assert(rows.length == 2, rows.mkString("; "))
    val byDom = rows.map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(3), x.getInt(4))).toMap
    // ghost keeps its weight share in the apportionment (a gets 50,
    // not 100) but supplies nothing and is flagged
    assert(byDom("ghost") == (0L, 0L, 1))
    assert(byDom("a") == (1000L, 50L, 0))
  }
}
