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

  test("sequential runBatch ticks ≡ one full run; chains through dropped docs resolve") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val allLangs = Seq("en", "de", "fr", "es", "zh")
    // synthetic novel vocab (disjoint from the corpus) — a 3-step
    // near-dup CHAIN A~B~C where A!~C: 30-word A, B = A + 3 words
    // (3-gram jaccard 28/31 ≈ .90 ≥ .85), C = B + 3 words (31/34 ≈
    // .91 ≥ .85) but C vs A = 28/34 ≈ .82 < .85. The full funnel
    // clusters {A,B,C} → only A survives; the incremental path only
    // gets that right because the store keeps DROPPED docs'
    // signatures (store-all): C never pairs with A directly.
    val wordsA = (1 to 30).map(i => s"zqx$i")
    val textA = wordsA.mkString(" ")
    val textB = (wordsA ++ Seq("qqa1", "qqa2", "qqa3")).mkString(" ")
    val textC = (wordsA ++ Seq("qqa1", "qqa2", "qqa3", "qqb1", "qqb2",
      "qqb3")).mkString(" ")
    val textT2 = (1 to 30).map(i => s"vwy$i").mkString(" ")
    val batch1 = Seq(
      1000L -> docs.filter(col("doc_id") === 0L).head().getString(1),
      1001L -> textA, // novel: survives
      1002L -> textB  // near-dup of A within the batch: drops
    ).toDF("doc_id", "text")
    val batch2 = Seq(
      2000L -> textC, // near-dup ONLY of dropped B: must still drop
      2001L -> textT2 // novel: survives
    ).toDF("doc_id", "text")

    val root = java.nio.file.Paths.get(graft.TempRoots.create("graft_corpus_inc"))
      .toString
    val dir = s"$root/store"
    val fpDir = s"$root/fps"
    // bootstrap: the base corpus generation stores its RAW signatures
    // and fingerprints
    graft.ops.Dedup.updateSignatureStore(
      graft.ops.Dedup.signatures(docs, "doc_id", "text", 3, 64), dir, 0L)
    graft.ops.Dedup.updateFingerprintStore(docs, "text", "doc_id",
      fpDir, 0L)
    val baseRun = Corpus.run(spark, docs, langs = allLangs,
      minQualityMilli = 0L)

    val tick1 = Corpus.runBatch(spark, batch1, historyText = docs,
      storePath = dir, batchId = 1L, langs = allLangs,
      minQualityMilli = 0L, fpStorePath = Some(fpDir))
    val tick2 = Corpus.runBatch(spark, batch2,
      historyText = docs.unionByName(batch1),
      storePath = dir, batchId = 2L, langs = allLangs,
      minQualityMilli = 0L, fpStorePath = Some(fpDir))

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val sequential = ids(baseRun.cleaned) ++ ids(tick1.cleaned) ++
      ids(tick2.cleaned)

    val full = Corpus.run(spark,
      docs.unionByName(batch1).unionByName(batch2),
      langs = allLangs, minQualityMilli = 0L)
    assert(sequential == ids(full.cleaned),
      "sequential ticks diverged from the one-shot funnel")
    // the named behaviors, explicitly
    assert(!sequential.contains(1000L), "verbatim history copy kept")
    assert(sequential.contains(1001L), "novel batch-1 doc lost")
    assert(!sequential.contains(1002L), "in-batch near-dup kept")
    assert(!sequential.contains(2000L),
      "chain through a DROPPED doc not resolved (store-all violated)")
    assert(sequential.contains(2001L), "novel batch-2 doc lost")
    // with the fp store engaged, the verbatim history copy must drop
    // at the CHEAP stage (fp anti-join), never reaching the MinHash
    // path — and the near-dup stage's conclusions are unchanged
    val t1 = tick1.funnel.map(f => f.stage -> f).toMap
    assert(t1("exact_vs_history").docs_in -
      t1("exact_vs_history").docs_out == 1,
      "history re-ingest did not drop at the fp stage")

    baseRun.unpersist(); tick1.unpersist(); tick2.unpersist()
  }

  test("a retried tick ignores its own crashed attempt's store partitions") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val allLangs = Seq("en", "de", "fr", "es", "zh")
    val batch = Seq(
      5000L -> (1 to 30).map(i => s"rty$i").mkString(" "), // novel: survives
      5001L -> (1 to 30).map(i => s"rty$i").mkString(" ")  // in-batch exact dup
    ).toDF("doc_id", "text")
    def bootstrap(): String = {
      val root = graft.TempRoots
        .create("graft_retry")
      graft.ops.Dedup.updateSignatureStore(
        graft.ops.Dedup.signatures(docs, "doc_id", "text", 3, 64),
        s"$root/store", 0L)
      graft.ops.Dedup.updateFingerprintStore(docs, "text", "doc_id",
        s"$root/fps", 0L)
      root
    }
    def tick(root: String): Set[Long] = {
      val r = Corpus.runBatch(spark, batch, historyText = docs,
        storePath = s"$root/store", batchId = 7L, langs = allLangs,
        minQualityMilli = 0L, fpStorePath = Some(s"$root/fps"))
      val ids = r.cleaned.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      r.unpersist(); ids
    }
    // clean tick: the survivor set of record
    val clean = tick(bootstrap())
    assert(clean == Set(5000L), s"unexpected clean survivors: $clean")
    // crashed attempt: both store writes landed (batch_id=7 exists),
    // then the tick died before its output was consumed — the retry
    // must produce the SAME survivors, not anti-join the batch away
    // against its own fingerprints or flag its own signatures as
    // history
    val root2 = bootstrap()
    graft.ops.Dedup.updateSignatureStore(
      graft.ops.Dedup.signatures(batch, "doc_id", "text", 3, 64),
      s"$root2/store", 7L)
    graft.ops.Dedup.updateFingerprintStore(batch, "text", "doc_id",
      s"$root2/fps", 7L)
    val retried = tick(root2)
    assert(retried == clean,
      s"retry after a crashed store write changed survivors: $retried != $clean")
  }

  test("an empty ingest tick is a no-op, not a crash") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val root = java.nio.file.Paths.get(graft.TempRoots.create("graft_empty_tick"))
      .toString
    graft.ops.Dedup.updateSignatureStore(
      graft.ops.Dedup.signatures(docs, "doc_id", "text", 3, 64),
      s"$root/store", 0L)
    graft.ops.Dedup.updateFingerprintStore(docs, "text", "doc_id",
      s"$root/fps", 0L)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val tick = Corpus.runBatch(spark, empty, historyText = docs,
      storePath = s"$root/store", batchId = 1L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQualityMilli = 0L,
      fpStorePath = Some(s"$root/fps"))
    assert(tick.cleaned.count() == 0)
    tick.funnel.foreach(f => assert(f.docs_in == 0 && f.docs_out == 0,
      s"stage ${f.stage} invented rows from an empty batch"))
    // the store is untouched in CONTENT by an empty batch (an empty
    // batch partition may exist; what matters is no signature rows)
    assert(graft.ops.Dedup.readSignatureStore(spark, s"$root/store")
      .count() == docs.count())
    tick.unpersist()
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

  test("streaming ingest: ticks accrue exactly-once across restarts") {
    val root = graft.TempRoots
      .create("graft_ingest")
    val landing = s"$root/landing"
    def writeCsv(name: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(landing)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def words(prefix: String, n: Int) =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val docA = words("aa", 60)
    val docB = words("bb", 60)
    // docB with its first word changed: 57/59 shingles shared,
    // jaccard ≈ 966 per-mille — well over the 850 near-dup bar
    val docBnear = ("zz0" +: (2 to 60).map(i => s"bb$i")).mkString(" ")
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("doc_id LONG, text STRING")
    val funnels = collection.mutable.Map.empty[Long, Seq[Corpus.Funnel]]
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("header", "true").csv(landing)
      Corpus.ingestStream(src, s"$root/raw", s"$root/corpus",
          s"$root/store", s"$root/fps", s"$root/ckpt",
          langs = Seq("en", "de", "fr", "es", "zh"),
          minQualityMilli = 0L,
          onTick = (bid, f) => funnels(bid) = f)
        .awaitTermination()
    }
    def corpusIds = spark.read.parquet(s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // tick 0 against NO stores (bootstrap-free): in-batch exact dup
    // collapses, both novel docs survive
    writeCsv("b1.csv", Seq("doc_id,text",
      s"1001,$docA", s"1002,$docA", s"1003,$docB"))
    runOnce()
    assert(corpusIds == Set(1001L, 1003L), s"tick 0: $corpusIds")

    // tick 1 (a RESTARTED query on the same checkpoint): a verbatim
    // re-ingest drops on the fingerprint store, a near-dup of history
    // drops on the signature store, the novel doc survives
    writeCsv("b2.csv", Seq("doc_id,text",
      s"2001,$docA", s"2002,$docBnear", s"2003,${words("cc", 60)}"))
    runOnce()
    assert(corpusIds == Set(1001L, 1003L, 2003L), s"tick 1: $corpusIds")
    val f1 = funnels(1L).map(f => f.stage -> f).toMap
    assert(f1("exact_vs_history").docs_in == 3 &&
      f1("exact_vs_history").docs_out == 2, s"fp drop missing: $f1")
    assert(f1("neardup_vs_history").docs_out == 1, s"sig drop missing: $f1")

    // both store halves carry one partition per tick
    val sigBatches = spark.read.parquet(s"$root/store")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sigBatches == Set(0L, 1L), s"store partitions: $sigBatches")

    // an idle restart is a no-op
    runOnce()
    assert(corpusIds == Set(1001L, 1003L, 2003L))
  }

  test("a store path holding only crash residue reads as empty, not a wedge") {
    val s = spark; import s.implicits._
    val root = graft.TempRoots
      .create("graft_residue")
    // simulate a crash DURING the first-ever store write: the path
    // exists but holds only the committer's staging dir — no
    // batch_id= partition ever committed
    for (p <- Seq(s"$root/store/_temporary", s"$root/fps/_temporary"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    val batch = Seq(
      9001L -> (1 to 30).map(i => s"res$i").mkString(" ")
    ).toDF("doc_id", "text")
    val r = Corpus.runBatch(spark, batch,
      historyText = batch.limit(0), storePath = s"$root/store",
      batchId = 0L, langs = Seq("en", "de", "fr", "es", "zh"),
      minQualityMilli = 0L, fpStorePath = Some(s"$root/fps"))
    val ids = r.cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    r.unpersist()
    assert(ids == Set(9001L),
      s"replay over crash residue lost the batch: $ids")
  }
}
