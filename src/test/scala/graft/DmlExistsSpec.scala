package graft

import org.apache.spark.sql.functions._

import graft.ops.TableStore

/** CORRELATED EXISTS / NOT EXISTS (and general correlated subqueries)
  * in SQL DML predicates — the reference's most common mutation idiom
  * beyond its literal IN-deletes: its gold quality corpus is built on
  * correlated NOT EXISTS (dags/SQL/Gold/create_load_data_gold.sql:
  * 142-145), and any Postgres-ported dedup-delete writes `WHERE
  * EXISTS (SELECT 1 FROM s WHERE s.id = t.id)`. The SQL path rebinds
  * the subquery's OuterReferences by NAME against the op's
  * `__graft_target`-aliased scans ([[graft.sources
  * .GraftDmlExecHelpers.rebind]]), so re-analysis of the discovery /
  * rewrite Filters re-discovers the correlation and Spark's own
  * RewritePredicateSubquery decorrelates it to a semi/anti join —
  * against the SAME pinned snapshot (pre-image semantics, one
  * commit). */
class DmlExistsSpec extends SparkSpec {

  private def cat(name: String): String = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    name
  }

  private def rangedStore(tag: String): String = {
    val s = spark; import s.implicits._
    val root = graft.TempRoots.create(s"graft_dmlex_$tag") + "/t"
    Seq(Seq(1L, 2L, 3L), Seq(11L, 12L, 13L), Seq(21L, 22L, 23L))
      .foreach { ids =>
        TableStore.append(
          ids.map(i => (i, s"n$i", i * 10L)).toDF("id", "name", "v")
            .coalesce(1),
          root, statsCols = Seq("id"))
      }
    root
  }

  private def ids(root: String): Seq[Long] =
    TableStore.read(spark, root).orderBy("id").select("id")
      .collect().map(_.getLong(0)).toIndexedSeq

  private def livePaths(root: String): Set[String] =
    TableStore.liveAt(spark, root,
      TableStore.versions(spark, root).last).map(_.path).toSet

  test("correlated EXISTS delete matches its IN twin (the " +
      "DataWarehouse.py:666 dedup written the Postgres way)") {
    val s = spark; import s.implicits._
    val g = cat("gex")
    Seq(12L, 21L, 99L).toDF("k").createOrReplaceTempView("dmlex_stg")
    val rootIn = rangedStore("intwin")
    spark.sql(s"DELETE FROM $g.`$rootIn` WHERE id IN " +
      "(SELECT k FROM dmlex_stg)").collect()
    val rootEx = rangedStore("extwin")
    spark.sql(s"DELETE FROM $g.`$rootEx` t WHERE EXISTS " +
      "(SELECT 1 FROM dmlex_stg c WHERE c.k = t.id)").collect()
    assert(ids(rootEx) == ids(rootIn),
      s"EXISTS must equal IN: ${ids(rootEx)} vs ${ids(rootIn)}")
    assert(ids(rootEx) == Seq(1L, 2L, 3L, 11L, 13L, 22L, 23L))
  }

  test("correlated NOT EXISTS delete (the gold-corpus orphan shape, " +
      "create_load_data_gold.sql:142-145)") {
    val s = spark; import s.implicits._
    val root = rangedStore("notex")
    val g = cat("gex")
    // the dimension: keys that EXIST; rows without a dim row are
    // orphans and go
    Seq(1L, 2L, 3L, 11L, 12L, 13L).toDF("dim_id")
      .createOrReplaceTempView("dmlex_dim")
    spark.sql(s"DELETE FROM $g.`$root` t WHERE NOT EXISTS " +
      "(SELECT 1 FROM dmlex_dim d WHERE d.dim_id = t.id)").collect()
    assert(ids(root) == Seq(1L, 2L, 3L, 11L, 12L, 13L))
  }

  test("self-referencing correlated EXISTS reads the PRE-image " +
      "(all matching copies go, never iterative re-evaluation)") {
    val s = spark; import s.implicits._
    val root = graft.TempRoots.create("graft_dmlex_pre") + "/t"
    // k=1 three times with distinct v; k=2 once
    TableStore.append(
      Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 40L))
        .toDF("k", "v").coalesce(1), root)
    val g = cat("gex")
    // every k=1 row sees ANOTHER k=1 row with a different v in the
    // PRE-image, so ALL THREE delete. Iterative (post-image)
    // semantics would stop after two deletes when only one copy is
    // left — the classic tear this engine's one-commit model forbids.
    spark.sql(s"DELETE FROM $g.`$root` t WHERE EXISTS " +
      s"(SELECT 1 FROM $g.`$root` u WHERE u.k = t.k AND u.v <> t.v)")
      .collect()
    val left = TableStore.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(left == Seq((2L, 40L)),
      s"pre-image semantics must delete ALL copies: $left")
  }

  test("correlated EXISTS respects the residual correlation " +
      "condition (not just the equi-key)") {
    val s = spark; import s.implicits._
    val root = rangedStore("resid")
    val g = cat("gex")
    Seq((12L, 115L), (21L, 500L)).toDF("k", "cap")
      .createOrReplaceTempView("dmlex_cap")
    // id=12 (v=120): cap 115 < 120 -> matches; id=21 (v=210): cap
    // 500 >= 210 -> no match
    spark.sql(s"DELETE FROM $g.`$root` t WHERE EXISTS " +
      "(SELECT 1 FROM dmlex_cap c WHERE c.k = t.id AND c.cap < t.v)")
      .collect()
    assert(ids(root) == Seq(1L, 2L, 3L, 11L, 13L, 21L, 22L, 23L))
  }

  test("mixed prunable + correlated EXISTS still skips files by " +
      "log stats") {
    val s = spark; import s.implicits._
    val root = rangedStore("prune")
    val g = cat("gex")
    val before = livePaths(root)
    Seq(12L, 1L).toDF("k").createOrReplaceTempView("dmlex_prune")
    spark.sql(s"DELETE FROM $g.`$root` t WHERE t.id >= 11 AND " +
      "t.id <= 13 AND EXISTS (SELECT 1 FROM dmlex_prune c " +
      "WHERE c.k = t.id)").collect()
    val after = livePaths(root)
    assert(before.count(after.contains) == 2,
      s"two out-of-range files must survive untouched: $before -> $after")
    assert(ids(root) == Seq(1L, 2L, 3L, 11L, 13L, 21L, 22L, 23L))
  }

  test("UPDATE with a correlated EXISTS predicate (two-Filter shape)") {
    val s = spark; import s.implicits._
    val root = rangedStore("upd")
    val g = cat("gex")
    Seq(11L, 21L).toDF("k").createOrReplaceTempView("dmlex_upd")
    spark.sql(s"UPDATE $g.`$root` t SET v = v + 1 WHERE EXISTS " +
      "(SELECT 1 FROM dmlex_upd c WHERE c.k = t.id)").collect()
    val vs = TableStore.read(spark, root).orderBy("id").select("v")
      .collect().map(_.getLong(0)).toIndexedSeq
    assert(vs == Seq(10L, 20L, 30L, 111L, 120L, 130L, 211L, 220L, 230L))
  }

  test("merge-on-read delete mode takes correlated predicates too") {
    val s = spark; import s.implicits._
    val root = rangedStore("mor")
    val g = cat("gex")
    Seq(12L).toDF("k").createOrReplaceTempView("dmlex_mor")
    spark.conf.set(graft.ops.Dml.DeleteModeKey, "mor")
    try spark.sql(s"DELETE FROM $g.`$root` t WHERE EXISTS " +
      "(SELECT 1 FROM dmlex_mor c WHERE c.k = t.id)").collect()
    finally spark.conf.unset(graft.ops.Dml.DeleteModeKey)
    assert(ids(root) == Seq(1L, 2L, 3L, 11L, 13L, 21L, 22L, 23L))
    // the data files are byte-identical (vector commit, no rewrite)
    assert(livePaths(root).size == 3,
      "MoR delete must not rewrite files")
  }

  test("a correlated reference to a non-target column still refuses " +
      "loudly at execution") {
    val s = spark; import s.implicits._
    val root = rangedStore("badref")
    val g = cat("gex")
    // nondeterministic inner plan: the determinism screen refuses
    // (discovery and rewrite evaluate the predicate twice)
    Seq(1L).toDF("k").createOrReplaceTempView("dmlex_bad")
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $g.`$root` t WHERE EXISTS " +
        "(SELECT 1 FROM dmlex_bad c WHERE c.k = t.id AND rand() > 2)")
        .collect()
    }
    assert(e.getMessage.contains("deterministic"), e.getMessage)
    assert(ids(root).size == 9, "refused statement must not mutate")
  }
}
