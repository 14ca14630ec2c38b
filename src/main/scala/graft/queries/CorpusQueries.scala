package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Sampling, TextOps}
import graft.pipeline.Corpus

/** Oracle gate for the corpus-funnel COMPOSITION. Every stage of
  * [[Corpus.run]] is individually oracle-gated (q_exact_dedup,
  * q_neardup_clusters, q_contamination, q_quality_score, q_lang_id,
  * q_domain_cap); this query gates what none of them can — the stage
  * ORDERING and the funnel accounting: each stage consumes exactly
  * the previous stage's survivors, and the per-stage (docs_in,
  * docs_out, out_id_sum) triples match a DuckDB oracle that rebuilds
  * the whole funnel as one CTE chain (each CTE the already-proven SQL
  * form of its stage). The id-sum is a membership signature: equal
  * counts with different survivors cannot pass.
  *
  * Funnel configuration mirrors the production defaults with the
  * oracle-gated dedup banding from [[DedupQueries]]. The production
  * maxBucket skew cap (10000) is kept as-is: an LSH bucket can never
  * exceed the corpus row count, and every gate corpus (sf0.001 spec,
  * sf0.01 verify, sf0.1 bench: ≤ ~5.6k docs with injected dups) sits
  * far under the cap, so the cap provably cannot bite and oracle
  * parity is exact while exercising the production posture.
  */
object CorpusQueries extends QueryPack {

  import DedupQueries.{K, NumHashes, Bands, RowsPerBand}

  private val NearDupMille = 850
  private val QualityMin = 800L
  private val Langs = Seq("en")
  private val ContamK = 5
  private val ContamMille = 500
  private val Cap = 10

  /** Exact-dup injection: every 7th doc appears twice (id+1000000) so
    * the exact stage has real work — same convention as
    * [[DedupQueries]]'s dup corpus. Eval set = every 37th doc (the
    * q_contamination convention); eval members sit IN the corpus, so
    * the decontaminate stage must drop them (and any near-dup twin
    * that survived clustering). */
  val corpusFunnel = GQuery(
    "q_corpus_funnel",
    (s, d) => {
      import s.implicits._
      // hash-spread: the funnel's shingle/MinHash stages are heavy
      // scan-side passes over a single-row-group file (Tables.spread)
      val docs = Tables.spread(s,
        Tables.documents(s, d).select("doc_id", "text", "source"),
        "doc_id")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            col("source")))
      val evalDocs = docs.filter(col("doc_id") % 37 === 0)
      val result = Corpus.run(s, corpus,
        shingleK = K, numHashes = NumHashes,
        bands = Bands, rowsPerBand = RowsPerBand,
        nearDupMille = NearDupMille, minQualityMilli = QualityMin,
        langs = Langs, evalDocs = Some(evalDocs),
        contaminationK = ContamK, contaminationMille = ContamMille,
        domainCap = Some(("source", Cap)))
      val rows = result.funnel.zipWithIndex.map { case (f, i) =>
        (i + 1, f.stage, f.docs_in, f.docs_out, f.out_id_sum)
      }
      result.unpersist()
      rows.toDF("stage_idx", "stage", "docs_in", "docs_out", "out_id_sum")
        .orderBy("stage_idx")
    },
    Some(s"""
      WITH corpus AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, source FROM documents
        WHERE doc_id % 7 = 0),
      keep1 AS (
        SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
      s1 AS (SELECT c.* FROM corpus c JOIN keep1 USING (doc_id)),
      sh AS (
        SELECT doc_id, unnest(${Dedup.shinglesSql("text", K)}) AS sh
        FROM s1),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE inter * 1000 // (na.n + nb.n - inter) >= $NearDupMille),
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      ${DedupQueries.labelPropClustersSql("s1", "doc_id")},
      survivors AS (
        SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
      s2 AS (SELECT s1.* FROM s1 JOIN survivors USING (doc_id)),
      ev AS (
        SELECT DISTINCT unnest(${Dedup.shinglesSql("text", ContamK)}) AS sh
        FROM documents WHERE doc_id % 37 = 0),
      dsh AS (
        SELECT doc_id, unnest(${Dedup.shinglesSql("text", ContamK)}) AS sh
        FROM s2),
      cont AS (
        SELECT d.doc_id FROM dsh d LEFT JOIN ev ON d.sh = ev.sh
        GROUP BY d.doc_id
        HAVING COUNT(ev.sh) * 1000 // COUNT(*) >= $ContamMille),
      s3 AS (SELECT * FROM s2
             WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
      s4 AS (SELECT * FROM s3
             WHERE ${TextOps.qualityMilliSql("text")} >= $QualityMin),
      s5 AS (SELECT * FROM s4
             WHERE ${TextOps.predictedLangSql("text")} IN
               (${Langs.map(l => s"'$l'").mkString(", ")})),
      ranked AS (
        SELECT doc_id,
               ${Sampling.domainCapRankSql("source", "doc_id")} AS rn
        FROM s5),
      s6 AS (SELECT doc_id FROM ranked WHERE rn <= $Cap),
      funnel(stage_idx, stage, docs_in, docs_out, out_id_sum) AS (
        SELECT 1, 'exact_dedup',
          (SELECT COUNT(*) FROM corpus), (SELECT COUNT(*) FROM s1),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s1)
        UNION ALL SELECT 2, 'neardup_dedup',
          (SELECT COUNT(*) FROM s1), (SELECT COUNT(*) FROM s2),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s2)
        UNION ALL SELECT 3, 'decontaminate',
          (SELECT COUNT(*) FROM s2), (SELECT COUNT(*) FROM s3),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s3)
        UNION ALL SELECT 4, 'quality_filter',
          (SELECT COUNT(*) FROM s3), (SELECT COUNT(*) FROM s4),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s4)
        UNION ALL SELECT 5, 'lang_filter',
          (SELECT COUNT(*) FROM s4), (SELECT COUNT(*) FROM s5),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s5)
        UNION ALL SELECT 6, 'domain_cap',
          (SELECT COUNT(*) FROM s5), (SELECT COUNT(*) FROM s6),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s6))
      SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
             CAST(docs_in AS BIGINT) AS docs_in,
             CAST(docs_out AS BIGINT) AS docs_out,
             CAST(out_id_sum AS BIGINT) AS out_id_sum
      FROM funnel ORDER BY stage_idx
    """),
    eager = true)

  /** Oracle gate for the INCREMENTAL funnel composition
    * ([[Corpus.runBatch]]): batch = every 5th doc (+ in-batch exact
    * dups every 15th at id+1000000), history = the rest. The oracle
    * encodes runBatch's specified semantics directly — within-batch
    * exact dedup, near-dup pairs restricted to batch-touching,
    * components over the touched subgraph, HISTORY-WINS survivorship
    * (a batch doc in any cluster containing a history doc drops;
    * batch-only clusters keep their minimum), then the row-local
    * filters — so the gate is independent of the CorpusSpec
    * equivalence proof. The store is bootstrapped fresh per run into
    * a temp dir (isolation: runBatch APPENDS to its store, and a
    * shared fixture would accrete batch partitions); bench=false —
    * correctness surface, the perf story is q_incremental_neardup's.
    */
  val corpusBatch = GQuery(
    "q_corpus_batch",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val history = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .unionByName(docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val store = graft.TempRoots
        .create("graft_qbatch") + "/store"
      graft.ops.Dedup.updateSignatureStore(
        graft.ops.Dedup.signatures(history, "doc_id", "text", K, NumHashes),
        store, 0L)
      val result = Corpus.runBatch(s, batch, historyText = history,
        storePath = store, batchId = 1L,
        shingleK = K, numHashes = NumHashes,
        bands = Bands, rowsPerBand = RowsPerBand,
        nearDupMille = NearDupMille, minQualityMilli = QualityMin,
        langs = Langs)
      val rows = result.funnel.zipWithIndex.map { case (f, i) =>
        (i + 1, f.stage, f.docs_in, f.docs_out, f.out_id_sum)
      }
      result.unpersist()
      rows.toDF("stage_idx", "stage", "docs_in", "docs_out", "out_id_sum")
        .orderBy("stage_idx")
    },
    Some(s"""
      WITH hist AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
      batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 15 = 0),
      keep1 AS (
        SELECT MIN(doc_id) AS doc_id FROM batch GROUP BY md5(text)),
      s1 AS (SELECT b.* FROM batch b JOIN keep1 USING (doc_id)),
      uni AS (SELECT * FROM hist UNION ALL SELECT * FROM s1),
      sh AS (
        SELECT doc_id, unnest(${Dedup.shinglesSql("text", K)}) AS sh
        FROM uni),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE inter * 1000 // (na.n + nb.n - inter) >= $NearDupMille
          AND (id_a IN (SELECT doc_id FROM s1)
               OR id_b IN (SELECT doc_id FROM s1))),
      edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      nodes AS (
        SELECT doc_id FROM s1
        UNION SELECT id_a FROM pairs
        UNION SELECT id_b FROM pairs),
      ${DedupQueries.labelPropClustersSql("nodes", "doc_id")},
      member AS (
        SELECT c.doc_id, c.cluster_id,
               c.doc_id IN (SELECT doc_id FROM s1) AS is_b
        FROM clusters c),
      hh AS (
        SELECT cluster_id,
               MAX(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS has_hist,
               MIN(doc_id) AS cmin
        FROM member GROUP BY cluster_id),
      s2 AS (
        SELECT s1.* FROM s1
        JOIN member m USING (doc_id)
        JOIN hh ON hh.cluster_id = m.cluster_id
        WHERE hh.has_hist = 0 AND s1.doc_id = hh.cmin),
      s3 AS (SELECT * FROM s2
             WHERE ${TextOps.qualityMilliSql("text")} >= $QualityMin),
      s4 AS (SELECT * FROM s3
             WHERE ${TextOps.predictedLangSql("text")} IN
               (${Langs.map(l => s"'$l'").mkString(", ")})),
      funnel(stage_idx, stage, docs_in, docs_out, out_id_sum) AS (
        SELECT 1, 'exact_dedup',
          (SELECT COUNT(*) FROM batch), (SELECT COUNT(*) FROM s1),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s1)
        UNION ALL SELECT 2, 'neardup_vs_history',
          (SELECT COUNT(*) FROM s1), (SELECT COUNT(*) FROM s2),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s2)
        UNION ALL SELECT 3, 'quality_filter',
          (SELECT COUNT(*) FROM s2), (SELECT COUNT(*) FROM s3),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s3)
        UNION ALL SELECT 4, 'lang_filter',
          (SELECT COUNT(*) FROM s3), (SELECT COUNT(*) FROM s4),
          (SELECT COALESCE(SUM(doc_id), 0) FROM s4))
      SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
             CAST(docs_in AS BIGINT) AS docs_in,
             CAST(docs_out AS BIGINT) AS docs_out,
             CAST(out_id_sum AS BIGINT) AS out_id_sum
      FROM funnel ORDER BY stage_idx
    """),
    bench = false, eager = true)

  private def exportDir(sfDir: String): String =
    s"/tmp/graft_fixtures/training_export_${new java.io.File(sfDir).getName}/out"

  private val ExpQuality = 800L
  private val ExpLangs = Seq("en")
  private val ExpChunk = 64
  private val ExpOverlap = 16
  private val ExpSeed = "epoch-0"
  private val ExpShards = 4

  /** End-to-end gate for the LAST MILE composition
    * ([[graft.pipeline.TrainingExport.run]]): clean → chunk → seeded
    * shuffle → shard → sharded JSONL files. The Spark side digests
    * what it READS BACK from the files it wrote (its own JSON reader);
    * the oracle RECOMPUTES the entire pipeline from the source
    * parquet as one CTE chain (quality/lang mirrors → chunk mirror →
    * shard-hash mirror) and digests per shard. Equality proves chunk
    * boundaries, shard routing, membership, and on-disk write
    * fidelity in one artifact — no stage can silently drift from its
    * proven form without the digest moving. Digest = per shard
    * (n_chunks, Σ chunk key, Σ md5-prefix of chunk text): a
    * membership-and-content signature, order-free (within-shard
    * ORDER is q_corpus_shards' gated contract). */
  val trainingExport = GQuery(
    "q_training_export",
    (s, d) => {
      val out = exportDir(d)
      Fixtures.ensure(s, out,
        Fixtures.sourceStamp(s, s"$d/documents.parquet") +
          s":training_export:v1:$ExpQuality:${ExpLangs.mkString("+")}" +
          s":$ExpChunk:$ExpOverlap:$ExpSeed:$ExpShards") {
        graft.pipeline.TrainingExport.run(s,
          Tables.documents(s, d).select("doc_id", "text"), out,
          minQualityMilli = ExpQuality, langs = ExpLangs,
          chunkSize = ExpChunk, overlap = ExpOverlap,
          seed = ExpSeed, numShards = ExpShards)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("chunk_id",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("chunk_text",
          org.apache.spark.sql.types.StringType)))
      graft.ops.JsonlIngest.read(s, s"$out/shard_dir=*", schema)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("doc_id") * graft.pipeline.TrainingExport.KeyStride +
            col("chunk_id")).as("sum_keys"),
          sum(conv(substring(md5(col("chunk_text")), 1, 8), 16, 10)
            .cast("long")).as("sum_text_h"))
        .orderBy("shard")
    },
    Some(s"""
      WITH clean AS (
        SELECT doc_id, text FROM documents
        WHERE ${TextOps.qualityMilliSql("text")} >= $ExpQuality
          AND ${TextOps.predictedLangSql("text")} IN
            (${ExpLangs.map(l => s"'$l'").mkString(", ")})),
      chunks AS (${graft.ops.Chunking.chunkSql(
        "clean", "text", Seq("doc_id"), ExpChunk, ExpOverlap)}),
      keyed AS (
        SELECT doc_id, chunk_id, chunk_text,
               doc_id * ${graft.pipeline.TrainingExport.KeyStride}
                 + chunk_id AS k
        FROM chunks),
      sharded AS (
        SELECT *, ${Sampling.shardOfSql("k", ExpSeed, ExpShards)} AS shard
        FROM keyed)
      SELECT shard, COUNT(*) AS n_chunks,
             CAST(SUM(k) AS BIGINT) AS sum_keys,
             CAST(SUM(CAST(('0x' || substr(md5(chunk_text), 1, 8))
               AS BIGINT)) AS BIGINT) AS sum_text_h
      FROM sharded GROUP BY shard ORDER BY shard
    """),
    eager = true)

  def all: Seq[GQuery] = Seq(corpusFunnel, corpusBatch, trainingExport)
}
