package graft

import org.apache.spark.sql.functions._

/** The decade-up generator is EVIDENCE INFRASTRUCTURE (BASELINE.md
  * "One decade up"), so its invariants are pinned like an operator's:
  * row multiplication, key disjointness, join-fanout preservation,
  * the document-perturbation similarity bands, and the norm-exact
  * embedding rotation.
  */
class GenScaleSpec extends SparkSpec {

  private lazy val outDir: String = {
    val dir = graft.TempRoots.create("graft_gs")
    GenScale.build(spark, TinySf, dir, replicas = 2)
    dir
  }

  test("row counts multiply; fixed dims stay fixed; keys stay disjoint") {
    val s = spark
    val li0 = Tables.lineitem(s, TinySf).count()
    val li2 = Tables.lineitem(s, outDir).count()
    assert(li2 == 2 * li0, s"lineitem $li2 != 2x$li0")
    assert(Tables.nation(s, outDir).count() ==
      Tables.nation(s, TinySf).count())
    assert(Tables.region(s, outDir).count() ==
      Tables.region(s, TinySf).count())
    val cust = Tables.customer(s, outDir)
    assert(cust.select("c_custkey").distinct().count() == cust.count(),
      "replica custkeys must be disjoint")
  }

  test("join fanout is preserved exactly (disjoint sub-universes)") {
    val s = spark
    def fanout(d: String): Long =
      Tables.lineitem(s, d).join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(fanout(outDir) == 2 * fanout(TinySf),
      "lineitem x orders fanout must scale linearly")
    // every order still resolves to a customer
    val orphans = Tables.orders(s, outDir).join(
      Tables.customer(s, outDir),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans == 0, s"$orphans orders lost their customer")
  }

  test("documents: replica-0 text unchanged; cross-replica word " +
    "Jaccard far below near-dup thresholds; n_chars recomputed") {
    val s = spark
    val base = Tables.documents(s, TinySf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nDocs = base.size
    val gen = Tables.documents(s, outDir)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
    assert(gen.length == 2 * nDocs)
    gen.foreach { r =>
      assert(r.getLong(2) == r.getString(1).length.toLong,
        s"n_chars stale for doc ${r.getLong(0)}")
    }
    val byId = gen.map(r => r.getLong(0) -> r.getString(1)).toMap
    def words(t: String) = t.split(" ").toSet
    var jSum = 0.0; var n = 0
    base.foreach { case (id, t0) =>
      assert(byId(id) == t0, s"replica-0 text perturbed for doc $id")
      val w0 = words(t0); val w1 = words(byId(id + nDocs))
      if (w0.nonEmpty) {
        jSum += w0.intersect(w1).size.toDouble / w0.union(w1).size
        n += 1
      }
    }
    val meanJ = jSum / n
    assert(meanJ > 0.1 && meanJ < 0.5,
      s"cross-replica Jaccard $meanJ outside the designed ~1/3 band")
  }

  test("embeddings: rotation preserves the norm bit-exactly and " +
    "vec_ids stay disjoint") {
    val s = spark
    val nVec = Tables.embeddings(s, TinySf).count()
    val gen = Tables.embeddings(s, outDir)
    assert(gen.count() == 2 * nVec)
    assert(gen.select("vec_id").distinct().count() == 2 * nVec)
    // norm of replica-1 vector == norm of its base (exact element
    // reuse: the float multiset is identical, so the double-sum of
    // squares in ANY order is equal after sort)
    val norms = gen
      .select(col("vec_id"),
        sort_array(col("embedding")).cast("array<float>").as("sorted"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    (0L until nVec).foreach { id =>
      assert(norms(id) == norms(id + nVec),
        s"rotation changed the element multiset for vec $id")
    }
  }

  test("embeddings: replicas past the 64-dim rotation period stay " +
    "distinct via the negation block (the 100-replica fix)") {
    // replica 64 would repeat replica 0's rotation; the second
    // 64-block negates components, so |x| multisets match while the
    // signed vectors differ — and no slice() length can go negative
    val dir = graft.TempRoots.create("graft_gs66")
    GenScale.build(spark, TinySf, dir, replicas = 66)
    val s = spark
    val nVec = Tables.embeddings(s, TinySf).count()
    val gen = Tables.embeddings(s, dir)
    assert(gen.count() == 66 * nVec)
    val pair = gen.filter(col("vec_id").isin(0L, 64L * nVec))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val base = pair(0L); val r64 = pair(64L * nVec)
    assert(base.map(-_) == r64,
      "replica 64 must be the negation of replica 0 (rotation wrapped)")
  }
}
