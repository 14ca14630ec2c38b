package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID profile scoring, and
  * document fingerprinting. Everything here is a pure per-row Column
  * expression — no UDFs, no shuffles — so it scales linearly with the
  * scan at any data size. (Caveat on constants, not scaling: the array
  * higher-order functions used — `aggregate`/`transform`/`filter` —
  * are CodegenFallback in Spark, i.e. interpreted per row rather than
  * whole-stage-codegen'd; the scalar string/regexp functions are
  * codegen'd.)
  *
  * Determinism discipline (same rules as [[Exact]]): all derived
  * scores are exact integer arithmetic (scaled ratios via integer
  * division), never float folds, so results are bit-identical across
  * partitionings, re-runs, and vs the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokens. Single-space split (not `\s+`) to match the
    * layer contract: upstream normalization collapses whitespace, and
    * the oracle's `string_split(text, ' ')` must agree exactly. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of lowercase letters, runs of digits,
    * or any other single non-space char — the classic pre-tokenizer
    * shape used to estimate LLM token counts without a vocab. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Occurrences of exactly-equal word `w` among the tokens. */
  def wordCount(toks: Column, w: String): Column =
    size(filter(toks, t => t === lit(w)))

  /** Canonical form for normalization-aware dedup: casefold, then
    * collapse every run of non-alphanumerics (punctuation, extra
    * whitespace, line breaks) to one space, then trim. Two documents
    * that differ only in case/punctuation/whitespace — the classic
    * scrape-twice shape (same article, different boilerplate
    * rendering) — canonicalize to identical bytes, so the plain
    * exact-dedup machinery (md5 fingerprint anti-join) removes them
    * without any MinHash work. Pure codegen'd per-row expressions;
    * the character class is shared verbatim with the RE2-compatible
    * DuckDB mirror [[canonicalizeSql]]. */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** DuckDB mirror of [[canonicalize]]. */
  def canonicalizeSql(textExpr: String): String =
    s"trim(regexp_replace(lower($textExpr), '[^a-z0-9]+', ' ', 'g'))"

  /** NON-distinct word bigrams, for frequency work (repetition
    * metrics need counts; the dedup family's [[Dedup.shingles]] is
    * distinct by design). Docs under 2 tokens yield an empty list —
    * handled inside the native expression, so there is no second
    * tokenization for a guard. Built on
    * [[graft.functions.WordShingles]] in non-distinct mode — the HOF
    * build (`transform(sequence, i -> concat_ws(element_at,
    * element_at))`) re-evaluates the inlined split per element,
    * O(tokens²) per row (measured 8x on q_repetition_stats at
    * sf0.1). */
  def bigrams(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      graft.functions.WordShingles(Bridge.expression(text), 2,
        distinct = false))
  }

  /** DuckDB mirror of [[bigrams]]. */
  def bigramsSql(textExpr: String): String = {
    val toks = s"string_split($textExpr, ' ')"
    s"""CASE WHEN len($toks) < 2 THEN []
        ELSE list_transform(generate_series(1, len($toks) - 1),
          i -> array_to_string($toks[i:i+1], ' ')) END"""
  }

  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  /** Per-mille ratios as exact integers: x*1000 DIV y. Floor of the
    * double division is exact while |num·1000| < 2^53 — true for any
    * realistic document (chars ≤ 8·10^12) — and matches DuckDB `//`. */
  private def perMille(num: Column, den: Column): Column =
    floor((num * lit(1000L)).cast("double") / den.cast("double")).cast("long")

  /** Quality-score columns (reference-style length/stopword/diversity
    * heuristics, re-expressed for document corpora):
    *  - n_tokens, n_chars
    *  - stop_milli:   stopword tokens per mille
    *  - uniq_milli:   distinct-token ratio per mille (lexical diversity)
    *  - len_milli:    mean token length per mille (chars minus spaces)
    *  - quality_milli: fixed linear blend, and a CASE class label.
    */
  def qualityCols(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val stopCnt = Stopwords.map(w => wordCount(toks, w).cast("long"))
      .reduce(_ + _)
    val stopMilli = perMille(stopCnt, nTok)
    val uniqMilli = perMille(size(array_distinct(toks)).cast("long"), nTok)
    val lenMilli = perMille(nChars - (nTok - 1), nTok)
    // blend: diversity up, stopword-stuffing down, degenerate-length
    // down — and a hard floor: a near-empty document scores 0, not
    // "maximally diverse" (uniq=1000 on one token would otherwise put
    // empty/one-word garbage in the top class)
    val quality = when(nTok < lit(MinQualityTokens), lit(0L))
      .otherwise(uniqMilli * 2 - stopMilli +
        when(lenMilli.between(3000, 8000), lit(500L)).otherwise(lit(0L)))
    Seq(
      "n_tokens" -> nTok,
      "stop_milli" -> stopMilli,
      "uniq_milli" -> uniqMilli,
      "len_milli" -> lenMilli,
      QualityKey -> quality,
      "quality_class" -> when(quality >= 1200, "high")
        .when(quality >= 800, "medium").otherwise("low"))
  }

  val QualityKey = "quality_milli"

  /** Below this token count a document is degenerate by definition. */
  val MinQualityTokens = 5L

  /** The blended quality score alone — typed accessor for callers
    * that threshold on it (the corpus funnel). */
  def qualityMilli(text: Column): Column =
    qualityCols(text).collectFirst { case (QualityKey, c) => c }
      .getOrElse(throw new IllegalStateException(
        s"qualityCols no longer emits $QualityKey"))

  /** The component expressions of the quality formula as DuckDB SQL:
    * (n_tokens, stop_milli, uniq_milli, len_milli, quality_milli). */
  private def qualityExprsSql(textExpr: String)
      : (String, String, String, String, String) = {
    val toks = s"string_split($textExpr, ' ')"
    val nTok = s"CAST(len($toks) AS BIGINT)"
    val stopCnt = Stopwords
      .map(w => s"len(list_filter($toks, t -> t = '$w'))")
      .mkString("(", " + ", ")")
    val stopMilli = s"($stopCnt * 1000) // $nTok"
    val uniqMilli = s"(len(list_distinct($toks)) * 1000) // $nTok"
    val lenMilli = s"((length($textExpr) - ($nTok - 1)) * 1000) // $nTok"
    val quality =
      s"""(CASE WHEN $nTok < $MinQualityTokens THEN 0
           ELSE $uniqMilli * 2 - $stopMilli +
                CASE WHEN $lenMilli BETWEEN 3000 AND 8000 THEN 500 ELSE 0 END
           END)"""
    (nTok, stopMilli, uniqMilli, lenMilli, quality)
  }

  /** DuckDB mirror of [[qualityMilli]] alone — the threshold
    * expression for funnel-style quality filters. */
  def qualityMilliSql(textExpr: String): String =
    qualityExprsSql(textExpr)._5

  /** Identical formula as DuckDB SQL, for the oracle. */
  def qualitySql(textExpr: String): String = {
    val (nTok, stopMilli, uniqMilli, lenMilli, quality) =
      qualityExprsSql(textExpr)
    s"""$nTok AS n_tokens, $stopMilli AS stop_milli,
       $uniqMilli AS uniq_milli, $lenMilli AS len_milli,
       $quality AS quality_milli,
       CASE WHEN $quality >= 1200 THEN 'high'
            WHEN $quality >= 800 THEN 'medium' ELSE 'low' END AS quality_class"""
  }

  /** Language-ID by character-trigram profile scoring — the classic
    * Cavnar–Trenkle n-gram identifier reduced to its scalable core:
    * each language carries its highest-frequency trigrams in rank
    * order, weighted w = N−rank; score = Σ w·occurrences; prediction
    * = argmax with deterministic lexicographic tie-break.
    *
    * Occurrence counting is (len(t) − len(replace(t, g, ''))) / 3 —
    * pure codegen'd string primitives with identical non-overlapping
    * semantics in the DuckDB mirror: no UDF, no regex, no shuffle.
    * Trigrams are ASCII-only so `lower()` agrees across engines; zh is
    * profiled over tone-digit pinyin romanization (the corpus
    * convention for Latin-keyed zh text). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("ich", "sch", "ein", "und", "der", "ch "),
    "en" -> Seq("the", " th", "he ", "ing", "and", " of"),
    "es" -> Seq(" de", "os ", "la ", "que", "ar ", "ado"),
    "fr" -> Seq(" le", "es ", "ent", "eur", "oir", "ait"),
    "zh" -> Seq("de5", "hi4", "le5", "ao4", "i3 ", "ng2"))

  /** All profile scores in ONE native expression evaluation
    * ([[graft.functions.TrigramScores]]) — the Column-per-trigram
    * formulation cost 30 `replace` scans each allocating a rewritten
    * text copy per row; identical numbers (the expression implements
    * replace's non-overlapping count), mirrored by the same SQL.
    * Subexpression elimination collapses the repeated array expr to
    * one evaluation per row within a projection. */
  private def scoresArray(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.TrigramScores(
      Bridge.expression(lower(text)), LangProfiles.map(_._2)))
  }

  def langScores(text: Column): Seq[(String, Column)] = {
    val arr = scoresArray(text)
    LangProfiles.map(_._1).zipWithIndex.map { case (lang, i) =>
      s"score_$lang" -> element_at(arr, i + 1)
    }
  }

  /** Argmax over the profile scores; ties break to the alphabetically
    * first language (profiles are pre-sorted). */
  def predictedLang(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit(null).cast("string")) { case ((name, s), acc) =>
      when(s === best, lit(name.stripPrefix("score_"))).otherwise(acc)
    } // foldRight ⇒ the FIRST matching profile wins
  }

  /** (lang, score-expression) pairs as DuckDB SQL. */
  private def langScoresSql(textExpr: String): Seq[(String, String)] = {
    val lt = s"lower($textExpr)"
    def cnt(g: String) =
      s"((length($lt) - length(replace($lt, '$g', ''))) // 3)"
    def score(trigs: Seq[String]) = {
      val n = trigs.length
      trigs.zipWithIndex.map { case (g, i) => s"${n - i} * ${cnt(g)}" }
        .mkString("(", " + ", ")")
    }
    LangProfiles.map { case (l, gs) => l -> score(gs) }
  }

  /** DuckDB mirror of [[predictedLang]] alone — the argmax expression
    * for funnel-style language filters. */
  def predictedLangSql(textExpr: String): String = {
    val scores = langScoresSql(textExpr)
    val best = scores.map(_._2).reduceRight((a, b) => s"GREATEST($a, $b)")
    scores.foldRight("NULL") { case ((l, s), acc) =>
      s"CASE WHEN $s = $best THEN '$l' ELSE $acc END"
    }
  }

  def langSql(textExpr: String): String = {
    val scores = langScoresSql(textExpr)
    val cols = scores.map { case (l, s) => s"$s AS score_$l" }.mkString(", ")
    s"$cols, ${predictedLangSql(textExpr)} AS predicted_lang"
  }

  /** PII redaction — the scrub step every training corpus runs before
    * anything else sees the text. Patterns live in the Java-regex ∩
    * RE2 subset (no backrefs, no lookarounds, literal `-` at class
    * end) so Spark and the DuckDB oracle replace the exact same
    * spans. Codegen'd regexp_replace: per-row, no UDF, no shuffle.
    * Email first, then phone — a phone fragment inside an address
    * must not split the email match. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{7,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  def redactPiiSql(textExpr: String): String =
    s"regexp_replace(regexp_replace($textExpr, '$EmailRe', '<EMAIL>', 'g'), " +
      s"'$PhoneRe', '<PHONE>', 'g')"

  /** Content fingerprint: md5 of the exact text bytes. */
  def md5Fingerprint(text: Column): Column = md5(text)

  /** Portable polynomial rolling hash over tokens — pure BIGINT
    * arithmetic (no engine hash functions), position-weighted so
    * word order matters, order-independent to SUM so the fold can run
    * as a distributed aggregate:
    *   h = Σ_i  w(token_i) · ((i·131071) mod 1000003)   (mod 1e9+7)
    * with w(t) = ascii(first char) + 7·len(t). Positions are 1-based
    * (DuckDB lambda-index convention). */
  def polyFingerprint(text: Column): Column = {
    val toks = tokens(text)
    val terms = zip_with(
      toks,
      sequence(lit(1), greatest(size(toks), lit(1))),
      (t, i) =>
        (ascii(t).cast("long") + lit(7L) * length(t)) *
          ((i.cast("long") * lit(131071L)) % lit(1000003L)))
    aggregate(terms, lit(0L), (acc, x) => acc + x) % lit(1000000007L)
  }

  /** The outer CAST is load-bearing: DuckDB list_sum over BIGINT yields
    * HUGEINT (materializes float64) and would break the typed hash
    * compare against Spark's int64 even with identical values. */
  def polyFingerprintSql(textExpr: String): String = {
    val toks = s"string_split($textExpr, ' ')"
    s"""CAST(list_sum(list_transform($toks, (t, i) ->
          (CAST(ascii(t) AS BIGINT) + 7 * length(t)) *
          ((CAST(i AS BIGINT) * 131071) % 1000003))) % 1000000007 AS BIGINT)"""
  }

  /** Integer unigram-surprisal scoring: per-doc mean of
    * `bitlen(N) - bitlen(count(term))` over the doc's token instances
    * (milli, floored), where `count` is the CORPUS frequency and N the
    * corpus token total.
    *
    * This is the floor-log2 surrogate of unigram cross-entropy
    * `-log2(count/N)` — the standard language-model quality signal
    * (rare-token-heavy docs score high, boilerplate scores low) — in
    * the engine's integer-contract form: `length(bin(x))` is exact in
    * both engines, where `ln()`'s last-ulp differences across libm
    * implementations would break a float hash compare (the same rule
    * that put milli-proportions where PSI would go).
    *
    * Scale shape (the boilerplateScore pattern): per-doc term
    * frequencies first (one (doc,term) shuffle, map-side combinable),
    * corpus counts re-aggregated FROM the tf frame, and the tf⋈count
    * join keyed on the term — AQE skew-split absorbs hot terms there,
    * which is why this is a join and NOT a term-partitioned window
    * (windows materialize the whole hot-term partition; partial
    * aggregation doesn't). The corpus token total N is a tiny eager
    * scalar from a scan-level size() aggregate — no explode, no third
    * branch over the corpus (the Robust.topFraction driver-metadata
    * posture), folded in as the constant `bitlen(N)`.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    // sum() over zero rows is null — read through Option so the
    // empty-corpus case hits the documented require, not an NPE
    val nRow = docs
      .agg(sum(tokenCount(col(textCol)).cast("long")).cast("long"))
      .head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n > 0, "unigramSurprisal: empty corpus")
    val bitlenN = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("term").agg(sum("tf").as("c"))
    tf.join(cnt, "term")
      .withColumn("s",
        (lit(bitlenN.toLong) - length(bin(col("c")))).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("s") * col("tf")).cast("long").as("s_sum"))
      .select(col(idCol), col("n_tokens"),
        expr("(1000 * s_sum) div n_tokens").as("surprisal_milli"))
  }

  /** Bigram-CONDITIONAL surprisal: per-doc mean of
    * `bitlen(c(prev)) − bitlen(c(prev, w))` over the doc's bigram
    * instances (milli, floored) — the floor-log2 surrogate of
    * `−log2 p(w | prev)` under the corpus bigram LM. The local-
    * predictability signal the unigram score can't see: a
    * shuffled-word salad keeps its unigram distribution (identical
    * [[unigramSurprisal]]) while every bigram becomes corpus-rare —
    * this score spikes. Docs with fewer than 2 tokens carry no
    * bigram and are absent from the output (both engines).
    *
    * Scale shape mirrors [[unigramSurprisal]] one level up: per-doc
    * bigram frequencies (one (doc, bigram) map-side-combinable
    * shuffle), corpus bigram counts and left-margin context counts
    * BOTH re-aggregated from that tf frame (no second corpus scan —
    * the Collocations margin convention: c(prev) = Σ_w c(prev, w)
    * over the pair frame's left slot), then two vocabulary-width
    * joins keyed on the bigram / the context token (AQE absorbs hot
    * contexts). */
  def bigramSurprisal(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(bigrams(col(textCol))).as("_bg"))
      .groupBy(col(idCol), col("_bg"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val cAb = tf.groupBy("_bg").agg(sum("tf").cast("long").as("c_ab"))
    val cA = cAb
      .withColumn("_ctx", split(col("_bg"), " ").getItem(0))
      .groupBy("_ctx").agg(sum("c_ab").cast("long").as("c_a"))
    tf.join(cAb, "_bg")
      .withColumn("_ctx", split(col("_bg"), " ").getItem(0))
      .join(cA, "_ctx")
      .withColumn("s",
        (length(bin(col("c_a"))) - length(bin(col("c_ab")))).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        sum(col("s") * col("tf")).cast("long").as("s_sum"))
      .select(col(idCol), col("n_bigrams"),
        expr("(1000 * s_sum) div n_bigrams").as("surprisal2_milli"))
  }

  /** DuckDB mirror of [[bigramSurprisal]]. */
  def bigramSurprisalSql: String =
    s"""
      WITH bg AS (
        SELECT doc_id, unnest(${bigramsSql("text")}) AS bg
        FROM documents),
      tf AS (
        SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf
        FROM bg GROUP BY doc_id, bg),
      cab AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS c_ab
              FROM tf GROUP BY bg),
      ca AS (SELECT string_split(bg, ' ')[1] AS ctx,
                    CAST(SUM(c_ab) AS BIGINT) AS c_a
             FROM cab GROUP BY 1),
      sc AS (
        SELECT t.doc_id, t.tf,
               (length(bin(ca.c_a)) - length(bin(cab.c_ab))) AS s
        FROM tf t
        JOIN cab USING (bg)
        JOIN ca ON ca.ctx = string_split(t.bg, ' ')[1])
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
             CAST((1000 * CAST(SUM(s * tf) AS BIGINT))
               // CAST(SUM(tf) AS BIGINT) AS BIGINT) AS surprisal2_milli
      FROM sc GROUP BY doc_id ORDER BY doc_id
    """
}
