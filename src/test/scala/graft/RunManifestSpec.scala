package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{RunManifest, TableStore}

/** Cross-table pipeline commit: the run manifest publishes each
  * warehouse tick's per-layer store versions LAST, so a crash between
  * layer commits can never expose a mixed (new-silver, old-gold)
  * view — the reference's single-Postgres-transaction consistency
  * (dags/Reprocessing.py:113-126) re-expressed as commits. */
class RunManifestSpec extends SparkSpec {

  private def mk(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, i % 3, i * 10)).toDF("id", "grp", "x")
  }

  test("a crash between layer commits never publishes a mixed view") {
    val base = graft.TempRoots.create("graft_runman")
    val silver = s"$base/silver"; val gold = s"$base/gold"
    val man = s"$base/runs"

    /** One warehouse tick: silver delta (batch-id'd = idempotent on
      * re-run), gold refresh from silver, manifest publish LAST.
      * `crashBeforeGold` injects the crash the manifest exists for. */
    def tick(runId: Long, delta: DataFrame,
             crashBeforeGold: Boolean = false): Unit = {
      TableStore.appendBatch(delta, silver, batchId = runId)
      if (crashBeforeGold) return
      val sv = TableStore.versions(spark, silver).last
      val g = TableStore.read(spark, silver, Some(sv))
        .groupBy("grp").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      val gv = TableStore.overwrite(g, gold)
      RunManifest.publish(spark, man, runId,
        Map("silver" -> (silver, sv), "gold" -> (gold, gv)))
    }

    def silverIds: Set[Long] = RunManifest
      .readLayer(spark, man, "silver")
      .select("id").collect().map(_.getLong(0)).toSet
    def goldTotal: Long = RunManifest.readLayer(spark, man, "gold")
      .agg(sum("n")).collect().head.getLong(0)

    tick(1L, mk(1L to 10L))
    assert(RunManifest.current(spark, man).map(_._1).contains(1L))
    assert(silverIds == (1L to 10L).toSet)
    assert(goldTotal == 10L) // gold consistent with pinned silver

    // tick 2 CRASHES between the silver commit and the gold refresh:
    // silver's latest advances, the manifest does not
    tick(2L, mk(11L to 20L), crashBeforeGold = true)
    assert(TableStore.versions(spark, silver).last == 2L)
    val (run, pins) = RunManifest.current(spark, man).get
    assert(run == 1L)
    assert(pins("silver")._2 == 1L) // pin < latest: the crash window
    // every consumer still sees run 1's consistent pair
    assert(silverIds == (1L to 10L).toSet)
    assert(goldTotal == 10L)

    // the re-run is idempotent: the batch-id'd silver delta stands
    // down (no duplicate commit), gold refreshes, run 2 publishes
    tick(2L, mk(11L to 20L))
    assert(TableStore.versions(spark, silver).last == 2L) // no dup
    assert(RunManifest.current(spark, man).map(_._1).contains(2L))
    assert(silverIds == (1L to 20L).toSet)
    assert(goldTotal == 20L)

    // a replayed publish of an already-published run is exactly-once
    assert(RunManifest.publish(spark, man, 2L,
      Map("silver" -> (silver, 2L), "gold" -> (gold, 2L))).isEmpty)
    assert(RunManifest.current(spark, man).map(_._1).contains(2L))

    // asking for a layer the run never published is loud
    val ex = intercept[IllegalArgumentException] {
      RunManifest.readLayer(spark, man, "platinum")
    }
    assert(ex.getMessage.contains("platinum"))
  }

  test("a manifest pin vacuumed past the horizon fails loudly, " +
      "never partially") {
    val base = graft.TempRoots.create("graft_runman_vac")
    val layer = s"$base/layer"; val man = s"$base/runs"
    TableStore.append(mk(1L to 5L), layer)  // v1 — the pinned version
    RunManifest.publish(spark, man, 1L, Map("layer" -> (layer, 1L)))
    // the layer moves on; retention retires the pinned snapshot
    TableStore.overwrite(mk(6L to 9L), layer) // v2
    TableStore.vacuum(spark, layer, keepVersions = 1)
    // consumers must get the documented loud refusal (a manifest pin
    // is a retention obligation: keep >= the publish cadence), not a
    // partial read of whatever files survived
    val ex = intercept[IllegalArgumentException] {
      RunManifest.readLayer(spark, man, "layer").collect()
    }
    assert(ex.getMessage.contains("not committed") ||
      ex.getMessage.contains("vacuumed"))
  }
}
