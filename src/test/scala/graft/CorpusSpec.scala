package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Corpus

/** The training-data corpus funnel end to end on real testdata with
  * injected exact and near duplicates: every stage drops what it
  * should and nothing else. */
class CorpusSpec extends SparkSpec {

  test("corpus funnel: exact dups, near-dup clusters, filters") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val n = docs.count()
    // inject exact copies of every 10th doc (high ids lose to originals)
    val exactCopies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val nExact = exactCopies.count()
    val corpus = docs.unionByName(exactCopies)

    val result = Corpus.run(spark, corpus, langs = Seq("en", "de", "fr",
      "es", "zh"), minQualityMilli = 0L)
    val byStage = result.funnel.map(f => f.stage -> f).toMap

    // exact stage: exactly the injected copies drop
    assert(byStage("exact_dedup").docs_in == n + nExact)
    assert(byStage("exact_dedup").docs_out == n)
    // near-dup stage: the corpus's planted near-dup pairs collapse —
    // strictly fewer docs, and re-running the stage is a fixpoint
    val afterNear = byStage("neardup_dedup").docs_out
    assert(afterNear < n)
    // permissive filters: nothing else drops in this configuration
    assert(byStage("quality_filter").docs_out == afterNear)
    assert(byStage("lang_filter").docs_out == afterNear)
    assert(result.cleaned.count() == afterNear)
    // survivor selection on the PLANTED near-dup pairs (ground truth
    // via exact jaccard): every higher pair member is gone, every id
    // that is never dominated (cluster minimum) is kept
    val exploded = docs.select(col("doc_id"),
      explode(graft.ops.Dedup.shingles(col("text"), 3)).as("sh"))
    val truePairs = graft.ops.Dedup
      .jaccardPairs(exploded, "doc_id", "sh", minMille = 850)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(truePairs.nonEmpty, "corpus must plant near-dup pairs")
    val kept = result.cleaned.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val dominated = truePairs.map(_._2).toSet
    dominated.foreach(b => assert(!kept.contains(b),
      s"higher pair member $b must not survive"))
    truePairs.map(_._1).filterNot(dominated).foreach(a =>
      assert(kept.contains(a), s"cluster minimum $a must survive"))

    // idempotency: cleaning the cleaned corpus drops nothing
    val again = Corpus.run(spark, result.cleaned,
      langs = Seq("en", "de", "fr", "es", "zh"), minQualityMilli = 0L)
    again.funnel.foreach(f =>
      assert(f.docs_in == f.docs_out, s"stage ${f.stage} not a fixpoint"))
  }

  test("quality and language thresholds actually filter") {
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val strict = Corpus.run(spark, docs, minQualityMilli = 1200L,
      langs = Seq("en"))
    val funnel = strict.funnel.map(f => f.stage -> f).toMap
    assert(funnel("quality_filter").docs_out <
      funnel("quality_filter").docs_in)
    assert(funnel("lang_filter").docs_out < funnel("lang_filter").docs_in)
    assert(strict.cleaned.count() == funnel("lang_filter").docs_out)
  }

  test("intermediate stage checkpoints are evicted; unpersist() frees the rest") {
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val result = Corpus.run(spark, docs,
      langs = Seq("en", "de", "fr", "es", "zh"), minQualityMilli = 0L)
    result.cleaned.count() // consume
    val during = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    // only the final stage's blocks may remain pinned (final
    // checkpoint + any last-stage internals), never one per stage
    assert(during.size <= 2,
      s"stage checkpoints leaked: ${during.size} persistent RDDs remain")
    result.unpersist()
    val after = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(after.isEmpty,
      s"unpersist() left ${after.size} pinned RDDs")
  }

  test("a failing stage evicts this run's checkpoints before rethrowing") {
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    intercept[Exception] {
      // domain column does not exist -> the domain_cap stage fails
      Corpus.run(spark, docs,
        langs = Seq("en", "de", "fr", "es", "zh"), minQualityMilli = 0L,
        domainCap = Some(("no_such_column", 2)))
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"failed run left ${leaked.size} pinned RDDs")
  }

  test("decontamination and domain-cap stages compose into the funnel") {
    val docs = Tables.documents(spark, TinySf)
      .select("doc_id", "text", "source")
    // benchmark = a near-dup partner's text verbatim: its surviving
    // twin in the corpus must be decontaminated away
    val evalSet = docs.filter(col("doc_id") === 0L)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    val result = Corpus.run(spark, docs,
      langs = Seq("en", "de", "fr", "es", "zh"), minQualityMilli = 0L,
      evalDocs = Some(evalSet), domainCap = Some(("source", 2)))
    val funnel = result.funnel.map(f => f.stage -> f).toMap
    assert(funnel.contains("decontaminate") && funnel.contains("domain_cap"))
    // doc 0 is a verbatim eval copy -> must be gone
    assert(result.cleaned.filter(col("doc_id") === 0L).count() == 0)
    assert(funnel("decontaminate").docs_out <
      funnel("decontaminate").docs_in)
    // no domain exceeds the cap in the final output
    val maxPerDomain = result.cleaned.groupBy("source").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerDomain <= 2, s"domain cap violated: $maxPerDomain")
    assert(result.cleaned.count() == funnel("domain_cap").docs_out)
  }
}
