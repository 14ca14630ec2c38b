package graft

import graft.DegenerateSweep.{Crash, Graceful, Ok}

/** Pins the empty-input contract for the ENTIRE query registry (see
  * [[DegenerateSweep]]): against a schema-identical zero-row mirror of
  * the testdata layout — the everyday shape of an empty daily
  * increment — every query either returns a well-typed result or
  * refuses with a documented precondition message; none may surface an
  * internal crash (NPE, empty-`head`, schema-less store read,
  * unmatched output glob). The r10 sweep found and fixed 15 such
  * crashes across five failure modes: null gate scalars (z-order
  * bounds, as-of skew bound, streaming sentinel anchor), schema-less
  * empty partitioned stores, and a missing shard directory. */
class DegenerateSpec extends SparkSpec {

  test("every registry query survives a zero-row corpus " +
      "(ok or documented refusal, never a crash)") {
    val emptyDir = graft.TempRoots
      .create("graft_empty_spec") + "/sf"
    DegenerateSweep.mirrorEmpty(spark, TinySf, emptyDir)
    val before = queries.OracleContext.sfDir
    val results =
      try DegenerateSweep.sweep(spark, emptyDir)
      finally queries.OracleContext.sfDir = before
    val crashes = results.collect { case (n, Crash(e)) =>
      s"$n: ${e.getClass.getName}: ${e.getMessage}"
    }
    assert(crashes.isEmpty, crashes.mkString("\n"))
    // the refusal set is CLOSED: a new graceful refusal is a contract
    // change that belongs in this list (and its op's scaladoc), not a
    // silent drift
    val refusals = results.collect { case (n, Graceful(_)) => n }.toSet
    // q_sql_truncate's evidence pins (exactly one truncate commit,
    // a VERSION AS OF 3 digest leg) cannot hold on a zero-row corpus:
    // an empty store's truncate is a provable no-op that commits
    // nothing, so the gate refuses gracefully at its own require.
    // the PQ family (q_ann_opq_topk included) shares the k-means
    // precondition: Lloyd training needs a non-empty corpus to seed
    // centroids (pqCodebooks' documented require). The warehouse
    // manifest needs a non-empty first silver delta (nothing commits,
    // so there is no layer version to publish), and the store
    // streaming-source gate's pacing require documents that an
    // all-empty source feeds no rows into its sink.
    // q_sql_create_partitioned's pruning evidence (a month probe
    // touching fewer than all files) needs at least one file per
    // month — zero-row INSERTs commit no files, so its own require
    // refuses; q_sql_merge_evolve pins the exact two-commit shape
    // (schema evolution + merge rewrite), and an empty source's
    // merge is a provable no-op that commits nothing.
    assert(refusals == Set("q_kmeans_clusters", "q_unigram_surprisal",
      "q_ann_pq_topk", "q_ann_ivfpq_topk", "q_pq_index_tick",
      "q_ann_opq_topk", "q_ann_opq_ivfpq_topk",
      "q_ann_opq_rotation_topk", "q_sql_truncate",
      "q_ann_ivfpq_residual_topk", "q_warehouse_manifest",
      "q_stream_store_source", "q_stream_store_cdc",
      "q_sql_create_partitioned", "q_sql_merge_evolve"),
      s"unexpected refusal set: $refusals")
    val ok = results.collect { case (_, Ok(_)) => 1 }.size
    assert(ok == results.size - refusals.size)
  }
}
