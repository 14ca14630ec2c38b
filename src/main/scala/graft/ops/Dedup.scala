package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH banding, and SimHash. Scale posture first:
  *
  *  - **Exact** dedup groups on a fixed-width content hash, never on
  *    the raw text: the shuffle key is 32 bytes regardless of document
  *    size, and map-side partial aggregation collapses same-partition
  *    copies before the exchange.
  *  - **Near-dup at 100 TB is LSH-shaped, never all-pairs.** The only
  *    quadratic step allowed is *within an LSH bucket*: signatures are
  *    banded, the shuffle key is (band, band-hash), and candidate
  *    pairs are generated per bucket then verified exactly. Buckets
  *    are bounded by construction (band hash of r minhashes), so the
  *    join fan-out is data-dependent but collision-bounded; a skewed
  *    mega-bucket means the banding parameters are wrong, not that
  *    the plan should globally cross-join.
  *  - The exact pair join ([[jaccardPairs]]) exists as ground truth /
  *    verification for bounded corpora and candidate sets; production
  *    paths go through [[minhashCandidates]].
  *
  * All signatures are per-row Column expressions (no UDFs, no
  * shuffle); only banding/bucketing shuffles. Note on constants: the
  * array higher-order functions involved (`aggregate`/`transform`/
  * `zip_with`) are CodegenFallback in Spark — interpreted per row —
  * so scaling stays linear but per-row cost is sensitive to how many
  * folds run; see [[simhash]] for the single-fold discipline.
  */
object Dedup {

  /** Exact dedup: one row per distinct content, keeping the smallest
    * id as the canonical survivor plus the copy count. Group key is
    * md5(text) (fixed-width shuffle key); collision risk 2^-64-ish is
    * the standard accepted trade for content-hash dedup. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Distinct word k-gram shingles of a single-space-tokenized text.
    * Documents shorter than k words get their whole text as the one
    * shingle (matches the degenerate-doc convention of the oracle). */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      when(size(toks) < k, array(text)).otherwise(
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k))))))
  }

  /** SQL mirror of [[shingles]] (DuckDB list slicing is inclusive). */
  def shinglesSql(textExpr: String, k: Int): String = {
    val toks = s"string_split($textExpr, ' ')"
    s"""list_distinct(CASE WHEN len($toks) < $k THEN [$textExpr]
        ELSE list_transform(generate_series(1, len($toks) - ${k - 1}),
          i -> array_to_string($toks[i:i+${k - 1}], ' ')) END)"""
  }

  /** Exact Jaccard over pre-exploded (id, shingle) pairs: intersection
    * via equi-join on the shingle, union by inclusion-exclusion.
    * Output jaccard is per-mille, exact integer.
    *
    * Scale note: the shingle equi-join is quadratic in per-shingle
    * document frequency — correct tool for ground truth and for
    * verifying LSH *candidates*, not for whole-corpus discovery. */
  def jaccardPairs(docShingles: DataFrame, idCol: String,
                   shingleCol: String, minMille: Int): DataFrame = {
    val sizes = docShingles.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"))
    val a = docShingles.select(col(idCol).as("id_a"), col(shingleCol).as("sh"))
    val b = docShingles.select(col(idCol).as("id_b"), col(shingleCol).as("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard_milli",
        expr("inter * 1000 DIV (n_a + n_b - inter)"))
      .filter(col("jaccard_milli") >= minMille)
      .select(col("id_a"), col("id_b"), col("jaccard_milli"))
  }

  /** MinHash signatures over pre-exploded (id, shingle) rows: numHashes
    * independent min-hashes, hash family = xxhash64 with the hash index
    * as a leading salt (a keyed 64-bit hash; distinct salts give
    * effectively independent functions).
    *
    * Shape rationale: the per-row-array formulation
    * (`transform(seq(0,n), i => array_min(transform(shingles, ...)))`)
    * re-evaluates the shingle-array expression once per hash index
    * after Catalyst's CollapseProject inlines it into the lambda —
    * 64× the tokenize/slice/concat work (measured ~16× slower
    * end-to-end). Explode + grouped min aggregates computes each
    * shingle once and hashes it numHashes times, with map-side partial
    * aggregation: the shuffle carries at most numHashes longs per doc
    * per partition — less than the shingle arrays themselves. This is
    * also the 100 TB shape: signature build is one pass + one
    * combine-heavy exchange keyed by doc id. */
  def minhashSignatures(exploded: DataFrame, idCol: String,
                        shCol: String, numHashes: Int): DataFrame =
    exploded.groupBy(col(idCol))
      .agg(array((0 until numHashes)
        .map(i => min(xxhash64(lit(i), col(shCol)))): _*).as("sig"))

  /** LSH banding: signature → (band, band_hash) rows. r consecutive
    * signature entries per band; band hash keyed by the band index so
    * identical slices in different bands never collide. */
  def bandRows(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val bandHash = (b: Int) =>
      xxhash64(
        (lit(b) +: (0 until rowsPerBand)
          .map(r => element_at(col(sigCol), b * rowsPerBand + r + 1))): _*)
    val pairs = array((0 until bands).map(b =>
      struct(lit(b).as("band"), bandHash(b).as("bucket"))): _*)
    df.select(col(idCol), explode(pairs).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from banded signatures: docs sharing any
    * (band, bucket). The self-join shuffles on the bucket key only;
    * distinct() collapses multi-band hits. */
  def minhashCandidates(banded: DataFrame, idCol: String): DataFrame = {
    val l = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact-verify candidates against shingle sets: join the candidate
    * pairs back to per-doc shingle arrays and compute true Jaccard
    * with array intersection — bounded by the candidate count, so the
    * quadratic step never touches non-colliding documents. */
  def verifyCandidates(cands: DataFrame, docShingleArr: DataFrame,
                       idCol: String, arrCol: String,
                       minMille: Int): DataFrame = {
    val a = docShingleArr.select(col(idCol).as("id_a"), col(arrCol).as("sh_a"))
    val b = docShingleArr.select(col(idCol).as("id_b"), col(arrCol).as("sh_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard_milli",
        expr("inter * 1000 DIV (size(sh_a) + size(sh_b) - inter)"))
      .filter(col("jaccard_milli") >= minMille)
      .select(col("id_a"), col("id_b"), col("jaccard_milli"))
  }

  /** Portable SimHash: a b-bit locality-sensitive signature where bit
    * j is the sign of Σ_tokens (2·bit_j(token) − 1). The per-token bit
    * generator is pure BIGINT arithmetic (multiplicative scrambling of
    * a small polynomial word hash) so the DuckDB oracle can replicate
    * it exactly — no engine-specific hash functions:
    *   w(t)     = (ascii(t) + 7·len(t) + 131·ascii(reverse(t))) mod 1000003
    *   bit_j(t) = ((w(t)·(j·2654435761 + 104729)) mod 1000000007) mod 2
    * Near-dup = small Hamming distance between signatures (bit_count
    * of xor); bucketing for scale = band the bit range like MinHash.
    *
    * Cost shape: array higher-order functions are CodegenFallback in
    * Spark (interpreted per row, not whole-stage-codegen'd), so the
    * constant factor is the number of interpreted folds. This builds
    * the signature in THREE passes regardless of bit width — one
    * `transform` computing each token's word hash once, one fold over
    * tokens carrying a b-slot vote-accumulator array (`zip_with`
    * against a constant multiplier array), one `zip_with`+fold packing
    * vote signs into the signature — instead of b independent folds
    * that each re-walk the token array and re-derive w(t) (b× the
    * work interpreted; measured ~10× slower end-to-end at b=48). */
  def simhash(text: Column, bits: Int): Column = {
    val P = 1000000007L
    val toks = TextOps.tokens(text)
    val weights = transform(toks, t =>
      (ascii(t).cast("long") + lit(7L) * length(t) +
        lit(131L) * ascii(reverse(t))) % lit(1000003L))
    val mults = array((0 until bits).map(j =>
      lit((j.toLong * 2654435761L + 104729L) % P)): _*)
    val votes = aggregate(weights, array_repeat(lit(0L), bits),
      (acc, w) => zip_with(acc, mults,
        (a, m) => a + ((w * m) % lit(P)) % lit(2L) * 2L - 1L))
    val powers = array((0 until bits).map(j => lit(1L << j)): _*)
    aggregate(
      zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  def simhashSql(textExpr: String, bits: Int): String = {
    val toks = s"string_split($textExpr, ' ')"
    val w = (t: String) =>
      s"((CAST(ascii($t) AS BIGINT) + 7*length($t) + 131*ascii(reverse($t))) % 1000003)"
    val bitCols = (0 until bits).map { j =>
      val mult = (j.toLong * 2654435761L + 104729L) % 1000000007L
      val vote = s"list_sum(list_transform($toks, t -> ((${w("t")} * $mult) % 1000000007) % 2 * 2 - 1))"
      s"CASE WHEN $vote > 0 THEN ${1L << j} ELSE 0 END"
    }
    bitCols.mkString("(", " + ", ")")
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
