package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** Deduplication queries over `documents` — exact, n-gram Jaccard
  * ground truth, MinHash+LSH, SimHash. The corpus plants ~25 near-dup
  * pairs (3-gram shingle Jaccard ≥ 0.9) over a ~0.01 background, so
  * thresholded near-dup output is stable.
  *
  * The LSH queries are verified against EXACT SQL oracles: banding
  * parameters are chosen so the candidate recall at the output
  * threshold is 1 up to astronomically small probability (and the
  * pipeline is fully deterministic — xxhash64 seeds fixed — so a
  * local pass is exactly reproducible in the driver gate), and
  * candidates are exact-verified before output; output ≡ exact pairs.
  */
object DedupQueries extends QueryPack {

  /** Shingle size for near-dup work (word 3-grams). */
  val K = 3
  /** MinHash banding: 64 signatures = 16 bands × 4 rows.
    * P(miss | j=0.9) = (1 − 0.9⁴)¹⁶ ≈ 1e-8 per pair; output threshold
    * 0.85 sits in the corpus's empty band (nothing between 0.03 and
    * 0.9), so LSH output ≡ exact pairs at 850 per-mille. */
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4

  /** Dup-injected corpus: every 7th doc appears twice (id+1000000) —
    * exact dedup must collapse them and keep the low id. */
  private def dupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }
  private val dupCorpusSql =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0"""

  /** Exact dedup: group on md5 content hash (fixed-width shuffle key,
    * map-side combine), canonical survivor = min id. */
  val exactDedup = GQuery(
    "q_exact_dedup",
    (s, d) => Dedup.exact(dupCorpus(s, d), "text", "doc_id")
      .orderBy("keep_id"),
    Some(s"""
      WITH corpus AS ($dupCorpusSql)
      SELECT md5(text) AS fp, MIN(doc_id) AS keep_id,
             COUNT(*) AS copies
      FROM corpus GROUP BY md5(text) ORDER BY keep_id
    """))

  /** Exact n-gram Jaccard pairs (ground truth for the LSH path):
    * explode distinct shingles, equi-join on the shingle, inclusion-
    * exclusion union. Quadratic in per-shingle doc frequency — the
    * verification-scale tool; discovery at scale is q_minhash_lsh.
    * bench=false: a deliberately-quadratic ground-truth query is
    * correctness surface, not a headline throughput number. */
  val ngramJaccard = GQuery(
    "q_ngram_jaccard_pairs",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val exploded = docs.select(col("doc_id"),
          explode(Dedup.shingles(col("text"), K)).as("sh"))
      Dedup.jaccardPairs(exploded, "doc_id", "sh", minMille = 500)
        .orderBy("id_a", "id_b")
    },
    Some(jaccardOracle(500)),
    bench = false)

  private def jaccardOracle(minMille: Int): String = s"""
      WITH sh AS (
        SELECT doc_id, unnest(${Dedup.shinglesSql("text", K)}) AS sh
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             inter * 1000 // (na.n + nb.n - inter) AS jaccard_milli
      FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE inter * 1000 // (na.n + nb.n - inter) >= $minMille
      ORDER BY id_a, id_b
    """

  /** MinHash + LSH banding near-dup: per-row signatures (no shuffle),
    * band-hash bucketing (the only shuffle key), candidate pairs from
    * bucket collisions only, exact verification of candidates. The
    * all-pairs matrix is never formed — the 100 TB discovery path.
    *
    * The shingle arrays are built ONCE and persisted: the signature
    * path (explode) and the exact-verify path both read the cached
    * frame, instead of re-running the interpreted tokenize/slice/
    * concat pipeline per consumer. Cache size is one shingle array per
    * doc — the same order as the input text itself. */
  val minhashLsh = GQuery(
    "q_minhash_lsh_pairs",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), Dedup.shingles(col("text"), K).as("sh_arr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exploded = docs.select(col("doc_id"), explode(col("sh_arr")).as("sh"))
      val sigs = Dedup.minhashSignatures(exploded, "doc_id", "sh", NumHashes)
      val banded = Dedup.bandRows(sigs, "doc_id", "sig", Bands, RowsPerBand)
      val cands = Dedup.minhashCandidates(banded, "doc_id")
      Dedup.verifyCandidates(cands, docs, "doc_id", "sh_arr", minMille = 850)
        .orderBy("id_a", "id_b")
    },
    Some(jaccardOracle(850)))

  /** SimHash near-dup: portable-arithmetic 48-bit signature; pairs at
    * Hamming ≤ 5 found via pigeonhole chunking — 6 chunks of 8 bits,
    * so any pair within distance 5 shares ≥ 1 exact chunk (guaranteed
    * recall, not probabilistic). Bucket join on (chunk, value), exact
    * Hamming verify on candidates. Oracle: brute-force over the
    * corpus (bounded there; the engine side never goes all-pairs). */
  val simhashPairs = GQuery(
    "q_simhash_pairs",
    (s, d) => {
      val Bits = 48; val Chunks = 6; val ChunkBits = 8
      val sigs = Tables.documents(s, d).select(col("doc_id"),
        Dedup.simhash(col("text"), Bits).as("sig"))
      val chunks = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until Chunks).map(ci => struct(lit(ci).as("ci"),
          shiftright(col("sig"), ci * ChunkBits)
            .bitwiseAND(lit(255L)).as("cv"))): _*)).as("ch"))
        .select(col("doc_id"), col("sig"), col("ch.ci"), col("ch.cv"))
      val l = chunks.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
        col("ci"), col("cv"))
      val r = chunks.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
        col("ci"), col("cv"))
      l.join(r, Seq("ci", "cv")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b").distinct()
        .withColumn("hamming", Dedup.hammingDistance(col("sig_a"), col("sig_b")))
        .filter(col("hamming") <= 5)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    },
    Some(s"""
      WITH sigs AS (
        SELECT doc_id, ${Dedup.simhashSql("text", 48)} AS sig
        FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig, b.sig)) <= 5
      ORDER BY id_a, id_b
    """))

  def all: Seq[GQuery] =
    Seq(exactDedup, ngramJaccard, minhashLsh, simhashPairs)
}
