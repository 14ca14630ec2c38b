package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary building + out-of-vocabulary coverage — the
  * tokenizer-prep loop: build the top-N word list from the corpus,
  * then score every document's OOV rate against it (high-OOV docs
  * are noise/foreign/garbled candidates; the aggregate OOV curve
  * tells you whether N is big enough).
  *
  * Scale shape: the vocab is ONE token-explode → word groupBy
  * (map-side combined, output = distinct-word cardinality) → global
  * top-N, which Spark plans as TakeOrderedAndProject — per-partition
  * heaps of N, never a global sort (N is the vocab size, bounded by
  * design). The OOV pass broadcasts the N-row vocab and pays one
  * Exchange on the doc key for the per-doc counts. Ranking ties are
  * broken (count DESC, word ASC) so the vocab — and therefore every
  * downstream OOV number — is deterministic cross-engine.
  */
object Vocab {

  /** Top-`n` words by corpus frequency: (word, n_occurrences, rank),
    * rank 1-based by (count DESC, word ASC). */
  def topWords(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n > 0, s"vocab size must be positive: $n")
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("word").asc)
      .limit(n)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occurrences").desc, col("word").asc)))
  }

  /** Per-document OOV stats against `vocab` (a [[topWords]] result or
    * any one-column word list): token count, OOV count, and the OOV
    * milli-rate by integer division. Empty-string tokens (collapsed
    * whitespace artifacts) are not counted. */
  def oovStats(docs: DataFrame, textCol: String, idCol: String,
               vocab: DataFrame): DataFrame = {
    val v = vocab.select(col("word").as("_v_word")).distinct()
    docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol)))
        .as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(v), col("word") === col("_v_word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("_v_word").isNull, 1)).as("n_oov"))
      .withColumn("oov_milli",
        expr("CAST(1000 * n_oov DIV n_tokens AS BIGINT)"))
  }

  /** Byte-pair-encoding merge induction — the first `rounds` merges
    * of the BPE training loop (Sennrich et al. 2016), distributed:
    * start from the corpus word-frequency table with words split to
    * characters, count adjacent symbol pairs weighted by word
    * frequency (one map-combinable groupBy over a bounded-width
    * explode per round), take the argmax (total tie-break: count
    * desc, then left/right symbol), apply the merge to every word's
    * symbol sequence with a left-to-right fold, repeat. Returns the
    * merge table (rank, left_sym, right_sym, freq) — the artifact a
    * tokenizer trainer ships.
    *
    * Scale shape: pair counting shuffles (symbol, symbol, partial
    * count) — vocabulary-sized, not corpus-sized, because the corpus
    * collapses to the word-frequency table first (one corpus-wide
    * groupBy, after which rounds never touch raw text). The argmax
    * is a 1-row collect per round; each round's symbol table is
    * localCheckpointed so plan depth stays flat across rounds
    * (released via [[Checkpoints]] on exit).
    *
    * The merge fold appends `b` directly when the accumulator's last
    * symbol is exactly `a` (space-boundary check), so a just-merged
    * token can never re-merge in the same round and even runs
    * resolve left-to-right — the oracle replays the identical fold
    * with DuckDB's list_reduce. */
  def bpeMerges(docs: DataFrame, textCol: String,
                rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, syms) = train(docs, textCol, rounds)
    Checkpoints.release(syms)
    merges
      .toDF("rank", "left_sym", "right_sym", "freq")
      .select(col("rank").cast("long").as("rank"),
        col("left_sym"), col("right_sym"), col("freq"))
      .orderBy("rank")
  }

  /** The shared BPE training loop. Returns the merge list and the
    * final per-word symbol table (word, freq, s) as a LIVE
    * localCheckpoint — the caller owns releasing it. */
  private def train(docs: DataFrame, textCol: String, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var syms = words
      .select(col("word"), col("freq"),
        array_join(split(col("word"), ""), " ").as("s"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    try {
      (1 to rounds).foreach { r =>
        val sy = split(col("s"), " ")
        val pairIdx = when(size(sy) > 1,
          sequence(lit(1), size(sy) - 1)).otherwise(
          array().cast("array<int>"))
        val best = syms
          .select(col("freq"),
            explode(transform(pairIdx,
              i => struct(element_at(sy, i).as("l"),
                element_at(sy, i + 1).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.nonEmpty) {
          val (l, rt, c) = (best.head.getString(0),
            best.head.getString(1), best.head.getLong(2))
          merges += ((r, l, rt, c))
          val applied = syms.withColumn("s",
            aggregate(
              slice(sy, lit(2), greatest(size(sy) - 1, lit(0))),
              element_at(sy, 1),
              (acc, x) =>
                when(x === lit(rt) &&
                  (acc === lit(l) || acc.endsWith(" " + l)),
                  concat(acc, x))
                  .otherwise(concat(acc, lit(" "), x))))
            .localCheckpoint()
          Checkpoints.release(syms)
          syms = applied
        }
      }
    } catch {
      case e: Throwable => Checkpoints.release(syms); throw e
    }
    (merges.result(), syms)
  }

  /** Train and PERSIST the tokenizer artifact: `dir/merges` (the
    * ranked merge table) and `dir/encode` (word → final symbol
    * string — the vocabulary-sized encoding map). Saving is the
    * production posture: encoders join against the artifact, they
    * never re-train, and the checkpoint blocks the loop pinned are
    * released here rather than leaking into the reader's lineage. */
  def bpeSaveModel(docs: DataFrame, textCol: String, rounds: Int,
                   dir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, syms) = train(docs, textCol, rounds)
    try syms.select("word", "s").write.mode("overwrite")
      .parquet(s"$dir/encode")
    finally Checkpoints.release(syms)
    merges.toDF("rank", "left_sym", "right_sym", "freq")
      .select(col("rank").cast("long").as("rank"),
        col("left_sym"), col("right_sym"), col("freq"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
  }

  /** Modulus for the encode digest polynomial — prime, small enough
    * that `acc*31 + codepoint` and `poly * (ord+1)` both stay far
    * inside a 64-bit long in either engine. */
  val DigestMod = 1000000007L

  /** Encode a corpus with a saved model: one vocabulary-sized join —
    * documents explode to (doc, ord, word), words join the encoding
    * map (unseen words fall back to their character split, the BPE
    * open-vocabulary contract). Returns per-document
    * (idCol, n_words, n_pieces, enc_sig, enc_sum).
    *
    * The content digest is ARITHMETIC, not a hash-of-concatenation:
    * per word, a base-31 character polynomial over the piece string
    * (mod [[DigestMod]]); per document, the position-weighted sum
    * `Σ (poly·(ord+1)) mod M` (order-sensitive) plus the plain
    * `Σ poly` — four integer columns a map-side-combinable aggregate
    * produces with O(1) state per group. The md5-of-reassembled-text
    * digest it replaces forced BOTH engines to hold every document's
    * full piece stream in aggregation state (Spark: collect_list per
    * doc; DuckDB: a 27M-row ordered string_agg that exhausts its
    * allocator at sf10) — the digest design, not the operator, was
    * the scale ceiling. The corpus is never re-folded either way:
    * all merge work happened once at train time. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                modelDir: String): DataFrame = {
    val spark = docs.sparkSession
    val enc = spark.read.parquet(s"$modelDir/encode")
    docs
      .select(col(idCol), posexplode(split(col(textCol), " "))
        .as(Seq("ord", "word")))
      .where(col("word") =!= "")
      .join(enc, Seq("word"), "left")
      .withColumn("s", coalesce(col("s"),
        array_join(split(col("word"), ""), " ")))
      .withColumn("_poly", aggregate(split(col("s"), ""),
        lit(0L), (acc, ch) => pmod(acc * 31 + ascii(ch), lit(DigestMod))))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(split(col("s"), " "))).cast("long").as("n_pieces"),
        sum(pmod(col("_poly") * (col("ord") + 1), lit(DigestMod)))
          .cast("long").as("enc_sig"),
        sum(col("_poly")).cast("long").as("enc_sum"))
  }

  /** DuckDB mirror: the vocab CTE (same tie-break) and the per-doc
    * OOV arithmetic, over `table`. */
  def oovStatsSql(table: String, textExpr: String, idExpr: String,
                  n: Int): String = s"""
    WITH tok AS (
      SELECT $idExpr AS id, unnest(string_split($textExpr, ' ')) AS word
      FROM $table),
    tok2 AS (SELECT * FROM tok WHERE word <> ''),
    vocab AS (
      SELECT word FROM tok2 GROUP BY word
      ORDER BY COUNT(*) DESC, word ASC LIMIT $n),
    perdoc AS (
      SELECT t.id, COUNT(*) AS n_tokens,
             COUNT(CASE WHEN v.word IS NULL THEN 1 END) AS n_oov
      FROM tok2 t LEFT JOIN vocab v USING (word)
      GROUP BY t.id)
    SELECT id AS $idExpr, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST(1000 * n_oov // n_tokens AS BIGINT) AS oov_milli
    FROM perdoc"""
}
