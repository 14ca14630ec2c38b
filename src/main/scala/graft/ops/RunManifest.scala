package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-table pipeline commit for a multi-layer warehouse tick — the
  * reference gets silver+gold consistency from ONE PostgreSQL
  * transaction (dags/Reprocessing.py:113-126: silver delete+insert
  * and the gold refresh inside `engine.begin()`); a lakehouse has no
  * cross-table transactions, so the standard move is a RUN MANIFEST:
  * each warehouse tick commits its layers independently (each layer a
  * [[TableStore]] commit — per-table snapshot isolation), then
  * publishes one manifest row-set `run_id -> (layer, store, version)`
  * LAST. Consumers resolve layer versions THROUGH the manifest, so a
  * crash between the silver upsert and the gold refresh leaves the
  * new silver version committed but UNPUBLISHED — every reader keeps
  * seeing the previous run's consistent (silver, gold) pair until the
  * re-run (idempotent: layer writes are batch-id'd) completes and
  * publishes.
  *
  * The manifest is itself a tiny TableStore (rows ∝ layers per run,
  * bytes ∝ runs within the retention window): publish rides
  * [[TableStore.appendBatch]] with `batchId = runId`, so a replayed
  * publish (crash AFTER the manifest landed, re-run re-publishes) is
  * exactly-once by the same ledger the streaming sinks use. At 100 TB
  * the manifest stays metadata-sized — it holds version NUMBERS, not
  * data — and the consistency guarantee costs one extra commit per
  * warehouse tick.
  */
object RunManifest {

  /** Publish `layers` (layer name → (store root, committed version))
    * as run `runId` — the warehouse tick's commit point, written
    * LAST. Returns the manifest version, or None when `runId` was
    * already published (replayed re-run: the ledger stands down). */
  def publish(spark: SparkSession, manifestRoot: String, runId: Long,
              layers: Map[String, (String, Long)]): Option[Long] = {
    require(layers.nonEmpty, "a run manifest needs at least one layer")
    import spark.implicits._
    val rows = layers.toSeq.sortBy(_._1)
      .map { case (layer, (root, v)) => (runId, layer, root, v) }
      .toDF("run_id", "layer", "store_root", "version")
      .coalesce(1)
    TableStore.appendBatch(rows, manifestRoot, batchId = runId)
  }

  /** The latest PUBLISHED run: (runId, layer → (root, version)), or
    * None before the first publish. Bounded: the manifest holds
    * version numbers, rows ∝ runs × layers. */
  def current(spark: SparkSession, manifestRoot: String)
      : Option[(Long, Map[String, (String, Long)])] = {
    if (TableStore.versions(spark, manifestRoot).isEmpty) return None
    val m = TableStore.read(spark, manifestRoot)
    val latest = m.agg(max("run_id")).collect().head
    if (latest.isNullAt(0)) return None
    val runId = latest.getLong(0)
    val pins = m.where(col("run_id") === runId)
      .select("layer", "store_root", "version")
      .collect() // bounded: one row per layer
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    Some((runId, pins))
  }

  /** The latest published run as a FRAME — `(run_id, layer,
    * store_root, version)` rows, the [[current]] pins in the shape
    * the SQL surface consumes (`run_manifest('<root>')` TVF,
    * registered in [[graft.functions.GraftExtensions]]). A pure-SQL
    * consumer — the reference's entire audience — resolves the
    * consistent layer set with one SELECT and reads a layer at its
    * pinned version via `VERSION AS OF`:
    *
    * {{{
    *   SELECT layer, version FROM run_manifest('/wh/_runs');
    *   SELECT * FROM wh.`/wh/silver` VERSION AS OF <pinned>;
    * }}}
    *
    * Empty (typed) before the first publish — a consumer polling a
    * not-yet-published warehouse gets zero rows, not an error. */
  def currentFrame(spark: SparkSession, manifestRoot: String): DataFrame = {
    import spark.implicits._
    current(spark, manifestRoot) match {
      case None =>
        Seq.empty[(Long, String, String, Long)]
          .toDF("run_id", "layer", "store_root", "version")
      case Some((runId, pins)) =>
        pins.toSeq.sortBy(_._1)
          .map { case (layer, (root, v)) => (runId, layer, root, v) }
          .toDF("run_id", "layer", "store_root", "version")
    }
  }

  /** Read `layer` at the version the latest published run pinned —
    * the consumer path: never the layer store's own latest, so a
    * half-finished tick (later silver version committed, gold not
    * yet refreshed, manifest not yet published) is invisible. */
  def readLayer(spark: SparkSession, manifestRoot: String,
                layer: String): DataFrame = {
    val (runId, pins) = current(spark, manifestRoot).getOrElse(
      throw new IllegalArgumentException(
        s"no published runs at $manifestRoot"))
    val (root, v) = pins.getOrElse(layer,
      throw new IllegalArgumentException(
        s"run $runId published no layer '$layer' at $manifestRoot " +
          s"(has ${pins.keys.toSeq.sorted.mkString(", ")})"))
    TableStore.read(spark, root, Some(v))
  }
}
