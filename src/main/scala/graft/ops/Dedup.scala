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
  *    paths go through [[bucketPairs]].
  *
  * All signatures are per-row Column expressions (no UDFs, no
  * shuffle); only banding/bucketing shuffles. Note on constants: the
  * array higher-order functions involved (`aggregate`/`transform`/
  * `zip_with`) are CodegenFallback in Spark — interpreted per row —
  * so scaling stays linear but per-row cost is sensitive to how many
  * folds run; see [[simhash]] for the single-fold discipline.
  */
object Dedup {

  /** THE content fingerprint — the single definition every exact-
    * dedup surface derives from (the [[exact]] group key, the
    * fingerprint store's `fp` column, and the history probe in the
    * corpus tick). One definition, or a future hash change would
    * silently desynchronize the store from its probes: the anti-join
    * would stop matching and the (masked, far costlier) near-dup
    * path would quietly absorb the work. */
  def fingerprint(text: Column): Column = md5(text)

  /** Exact dedup: one row per distinct content, keeping the smallest
    * id as the canonical survivor plus the copy count. Group key is
    * [[fingerprint]] (fixed-width shuffle key); collision risk
    * 2^-64-ish is the standard accepted trade for content-hash
    * dedup. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Distinct word k-gram shingles of a single-space-tokenized text.
    * Documents shorter than k words get their whole text as the one
    * shingle (matches the degenerate-doc convention of the oracle).
    * Built by the native [[graft.functions.WordShingles]] expression —
    * zero-copy byte slices in one codegen'd pass; semantics (and the
    * DuckDB mirror) unchanged from the split/slice/concat_ws
    * formulation it replaces. */
  def shingles(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.WordShingles(Bridge.expression(text), k))
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

  /** Asymmetric shingle CONTAINMENT `|A∩B| / |A|` over pre-exploded
    * (id, shingle) pairs — the quote/subset detector Jaccard cannot
    * express: a short doc fully quoted inside a long aggregator page
    * has tiny Jaccard (union is the long doc) but containment ≈ 1.
    * Output is DIRECTED (id_a contained-in id_b), per-mille exact.
    *
    * Scale note: same ground-truth posture as [[jaccardPairs]] — the
    * shingle equi-join is the truth tool and the LSH-candidate
    * verifier; whole-corpus discovery goes through the banded
    * candidates (with the CapNoBite bucket cap) and scores ONLY the
    * candidate pairs with this exact formula. */
  def containmentPairs(docShingles: DataFrame, idCol: String,
                       shingleCol: String, minMille: Int): DataFrame = {
    val sizes = docShingles.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"))
    val a = docShingles.select(col(idCol).as("id_a"), col(shingleCol).as("sh"))
    val b = docShingles.select(col(idCol).as("id_b"), col(shingleCol).as("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .withColumn("containment_milli",
        expr("inter * 1000 DIV n_a"))
      .filter(col("containment_milli") >= minMille)
      .select(col("id_a"), col("id_b"), col("containment_milli"))
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
    // fail fast on parameter drift: element_at past the signature end
    // returns NULL (non-ANSI) and xxhash64 SKIPS null inputs, so the
    // overflowing bands would silently hash identically for every doc
    // — one mega-bucket, quadratic pairs or silent recall loss
    require(bands > 0 && rowsPerBand > 0,
      s"bands=$bands rowsPerBand=$rowsPerBand must be positive")
    val bandHash = (b: Int) =>
      xxhash64(
        (lit(b) +: (0 until rowsPerBand)
          .map(r => element_at(col(sigCol), b * rowsPerBand + r + 1))): _*)
    val pairs = array((0 until bands).map(b =>
      struct(lit(b).as("band"), bandHash(b).as("bucket"))): _*)
    df.select(col(idCol), explode(pairs).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** All unordered within-bucket pairs from ONE grouped pass. The
    * alternative (bucket self-join) evaluates the upstream signature
    * pipeline twice — the exchanges differ by column aliases, so Spark
    * cannot reuse them. Here the bucketed frame is aggregated once
    * (`collect_set` of the payload struct, map-side combined), pairs
    * are generated inside each bucket with array lambdas, and the only
    * shuffles are the bucket groupBy and the final pair `distinct`.
    *
    * `payload` must be a struct whose FIRST field is the document id:
    * `sort_array` orders buckets by it, so emitted pairs satisfy
    * a.id < b.id by construction.
    *
    * `maxBucket` is the skew guard for the 100 TB path: a bucket of
    * size m emits m·(m−1)/2 pairs, so one mega-bucket (a boilerplate
    * shingle band, a degenerate signature) can dominate the whole job.
    * Buckets above the cap are dropped — at sane banding parameters a
    * bucket that large is near-certainly a parameterization bug, and
    * dropping it bounds the worst case. Correctness-gated queries pass
    * None (exact oracle parity); production callers should cap. */
  def bucketPairs(bucketed: DataFrame, keyCols: Seq[String],
                  payload: Column, maxBucket: Option[Int] = None): DataFrame = {
    val grouped = bucketed
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_set(payload)).as("_ids"))
    val bounded = maxBucket.fold(grouped)(m =>
      grouped.filter(size(col("_ids")) <= m))
    val pairs = flatten(transform(col("_ids"), (x, i) =>
      transform(slice(col("_ids"), i + lit(2), size(col("_ids")) - i - lit(1)),
        y => struct(x.as("a"), y.as("b")))))
    bounded
      .filter(size(col("_ids")) > 1)
      .select(explode(pairs).as("_p"))
      .select(col("_p.a").as("a"), col("_p.b").as("b"))
      .distinct()
  }

  /** Exact-verify candidate pairs against the raw corpus: join the
    * (small) candidate set back to the documents and recompute shingle
    * arrays ONLY for candidate rows — the projection sits above the
    * join, so the interpreted shingle expression never runs on
    * non-colliding documents and no corpus-wide cache is needed.
    * Quadratic work is bounded by the candidate count. */
  def verifyCandidatesByText(cands: DataFrame, docs: DataFrame,
                             idCol: String, textCol: String, k: Int,
                             minMille: Int): DataFrame = {
    val a = docs.select(col(idCol).as("id_a"), col(textCol).as("_ta"))
    val b = docs.select(col(idCol).as("id_b"), col(textCol).as("_tb"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("sh_a", shingles(col("_ta"), k))
      .withColumn("sh_b", shingles(col("_tb"), k))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard_milli",
        expr("inter * 1000 DIV (size(sh_a) + size(sh_b) - inter)"))
      .filter(col("jaccard_milli") >= minMille)
      .select(col("id_a"), col("id_b"), col("jaccard_milli"))
  }

  /** Portable SimHash: a b-bit locality-sensitive signature where bit
    * j is the sign of Σ_features (2·bit_j(h(f)) − 1), features = word
    * k-gram shingles and h = the first 15 hex chars of md5 (60 uniform
    * bits, identical in Spark and DuckDB — no engine-specific hashes).
    *
    * Design history (r3→r4): the first cut hashed single TOKENS with a
    * positional char hash (first char, last char, length). Both
    * choices correlate signatures across unrelated documents — shared
    * vocabulary dominates the votes and the weak hash collides distinct
    * tokens — which made chunk buckets cluster catastrophically
    * (candidate mass reached 13% of all-pairs at 5k docs, measured in
    * DedupSpec). Shingle features + a uniform 60-bit hash decorrelate
    * the background: unrelated docs now get near-independent
    * signatures, so bucket collisions sit at the N²/2^chunkBits random
    * floor, while true near-dups (shared shingles) stay within small
    * Hamming distance.
    *
    * Cost shape: the feature hashing is one `transform` (md5 evaluated
    * once per feature), and the vote-and-pack runs in the native
    * [[graft.functions.SimHashBits]] expression — tight codegen'd
    * loops instead of a features×bits interpreted fold (the same
    * native-expression discipline as the hyperplane signatures). */
  def simhash(text: Column, bits: Int, k: Int = 3): Column = {
    require(bits <= 60, "md5-derived signature caps at 60 bits (15 hex chars)")
    val hs = transform(shingles(text, k), t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.SimHashBits(Bridge.expression(hs), bits))
  }

  /** DuckDB mirror of the per-feature 60-bit hash list. */
  def featureHashesSql(textExpr: String, k: Int = 3): String =
    s"""list_transform(${shinglesSql(textExpr, k)},
        t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))"""

  /** DuckDB mirror of the signature fold, over a pre-computed hash
    * list expression (put [[featureHashesSql]] in a CTE so md5 runs
    * once per feature, not once per bit). */
  def simhashFromHashesSql(hsExpr: String, bits: Int): String =
    (0 until bits).map { j =>
      val vote = s"list_sum(list_transform($hsExpr, h -> CASE WHEN (h & ${1L << j}) != 0 THEN 1 ELSE -1 END))"
      s"CASE WHEN $vote > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** The full MinHash-LSH near-dup pair discovery pipeline in one
    * place (shingle explode → signatures → banding → bucket pairs →
    * exact verify) — the single definition the oracle-gated queries
    * and the production corpus funnel both call, so banding
    * parameters and the maxBucket skew guard cannot drift between
    * copies. Oracle-gated callers pass maxBucket=None (exact parity
    * with the brute-force oracle); production callers cap. */
  def lshNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, numHashes: Int, bands: Int, rowsPerBand: Int,
                      minMille: Int, maxBucket: Option[Int]): DataFrame = {
    require(bands * rowsPerBand <= numHashes,
      s"banding overruns the signature: $bands bands x $rowsPerBand rows " +
        s"> $numHashes hashes (overflow bands would silently collapse " +
        "into one global bucket)")
    val sigs = signatures(docs, idCol, textCol, k, numHashes)
    val banded = bandRows(sigs, idCol, "sig", bands, rowsPerBand)
    val cands = bucketPairs(banded, Seq("band", "bucket"),
        struct(col(idCol)), maxBucket)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    verifyCandidatesByText(cands, docs, idCol, textCol, k, minMille)
  }

  /** Per-document MinHash signatures straight from text — the
    * persistable artifact for [[incrementalNearDupPairs]]: compute
    * once per corpus generation, store as a small (id, sig) parquet
    * next to the corpus, and every future batch probes against it
    * without re-shingling a byte of historical text. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 k: Int, numHashes: Int): DataFrame =
    minhashSignatures(
      docs.select(col(idCol), explode(shingles(col(textCol), k)).as("sh")),
      idCol, "sh", numHashes)

  /** Append a processed batch's content FINGERPRINTS (md5, the
    * [[exact]] group key) to a persisted store — the exact-dedup twin
    * of [[updateSignatureStore]], same batch_id-partitioned layout
    * and dynamic-overwrite idempotency. At 100 TB this is the cheap
    * first line of incremental dedup: a new batch drops its exact
    * re-ingests with one fixed-width anti-join before the (heavier)
    * MinHash path ever sees them. */
  def updateFingerprintStore(docs: DataFrame, textCol: String,
                             idCol: String, path: String,
                             batchId: Long): Unit = {
    val fps = exact(docs, textCol, idCol)
      .select(col("fp"), col("keep_id"))
      .withColumn("batch_id", lit(batchId))
    fps.write.partitionBy("batch_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)
    // an all-empty store (first batch had no rows) writes no files and
    // loses its schema; anchor it so readers never fail
    Partitioned.anchorSchema(fps, path)
  }

  /** Incremental exact dedup: collapse within-batch copies to the
    * min-id survivor, then drop every batch doc whose content
    * fingerprint already exists in the history store (history wins —
    * the content is already in the corpus under its original id).
    * One md5 projection + one fp-keyed aggregate + one fp-keyed
    * anti-join; no text ever shuffles and history text is never
    * read. Returns surviving batch rows unchanged. */
  def incrementalExact(fpStore: DataFrame, newDocs: DataFrame,
                       textCol: String, idCol: String): DataFrame = {
    val withinBatch = exact(newDocs, textCol, idCol)
      .select(col("fp"), col("keep_id").as(idCol))
    val fresh = withinBatch
      .join(fpStore.select("fp").distinct(), Seq("fp"), "left_anti")
      .select(idCol)
    newDocs.join(fresh, Seq(idCol), "left_semi")
  }

  /** Read the fingerprint store back ((fp, keep_id, batch_id)). */
  def readFingerprintStore(spark: org.apache.spark.sql.SparkSession,
                           path: String): DataFrame =
    spark.read.parquet(path)

  /** Append a processed batch's signatures to a persisted store —
    * the write half of the incremental loop: after
    * [[incrementalNearDupPairs]] clears a batch, its signatures
    * become history so the NEXT batch never re-shingles them.
    *
    * Layout: one store directory partitioned by `batch_id`. Writes
    * use dynamic partition overwrite, so re-running a batch's update
    * (a retried job) rewrites exactly its own partition — idempotent,
    * never duplicated, and never touching other batches' files. The
    * caller owns batch-id assignment (a ledger, an ingest sequence);
    * ids must be stable across retries for the idempotency to hold.
    */
  def updateSignatureStore(sigs: DataFrame, path: String,
                           batchId: Long): Unit = {
    val batch = sigs.withColumn("batch_id", lit(batchId))
    batch.write.partitionBy("batch_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)
    // empty-first-batch stores keep a readable schema (see
    // [[Partitioned.anchorSchema]])
    Partitioned.anchorSchema(batch, path)
  }

  /** Read the full signature store back ((id, sig) across all
    * batches; `batch_id` rides along for audits). */
  def readSignatureStore(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental near-dup discovery — the operational shape at
    * 100 TB: a full-corpus [[lshNearDupPairs]] re-shingles and
    * re-hashes EVERYTHING per ingest, but a new batch only needs
    * (a) its own signatures, (b) banding over stored + new signatures
    * (a cheap projection of already-computed arrays), and (c) pairs
    * where at least one side is new — old–old pairs were already
    * found when the store was built, so they are filtered before the
    * candidate verify, not recomputed.
    *
    * Signature/banding parameters must match the store's build
    * parameters (same k, numHashes, bands, rowsPerBand) — enforced by
    * the caller keeping them in one place; a mismatch makes buckets
    * silently disjoint.
    *
    * @param store      stored (idCol, sig) signatures of the existing
    *                   corpus (from [[signatures]], typically read
    *                   back from parquet)
    * @param newDocs    the incoming batch (idCol, textCol); ids must
    *                   not collide with the store's
    * @param corpusText (idCol, textCol) covering BOTH sides for the
    *                   exact verify — candidate-bounded, so only
    *                   colliding documents' text is ever re-read
    */
  def incrementalNearDupPairs(store: DataFrame, newDocs: DataFrame,
                              corpusText: DataFrame,
                              idCol: String, textCol: String,
                              k: Int, numHashes: Int,
                              bands: Int, rowsPerBand: Int,
                              minMille: Int,
                              maxBucket: Option[Int]): DataFrame =
    incrementalNearDupPairsFromSigs(store,
      signatures(newDocs, idCol, textCol, k, numHashes), corpusText,
      idCol, textCol, k, bands, rowsPerBand, minMille, maxBucket,
      numHashes)

  /** [[incrementalNearDupPairs]] over PRE-COMPUTED new-side
    * signatures — for callers that already hold the batch's
    * signatures (e.g. the corpus tick, which computes them once and
    * both probes and persists them; shingling the batch twice was
    * the cost this variant removes). */
  def incrementalNearDupPairsFromSigs(store: DataFrame,
                                      newSigs: DataFrame,
                                      corpusText: DataFrame,
                                      idCol: String, textCol: String,
                                      k: Int,
                                      bands: Int, rowsPerBand: Int,
                                      minMille: Int,
                                      maxBucket: Option[Int],
                                      numHashes: Int): DataFrame = {
    require(bands * rowsPerBand <= numHashes,
      s"banding overruns the signature: $bands x $rowsPerBand > $numHashes")
    val banded =
      bandRows(store, idCol, "sig", bands, rowsPerBand)
        .withColumn("_new", lit(false))
        .unionByName(
          bandRows(newSigs, idCol, "sig", bands, rowsPerBand)
            .withColumn("_new", lit(true)))
    val cands = bucketPairs(banded, Seq("band", "bucket"),
        struct(col(idCol), col("_new")), maxBucket)
      .filter(col("a._new") || col("b._new")) // old–old: already known
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    verifyCandidatesByText(cands, corpusText, idCol, textCol, k, minMille)
  }

  /** Connected components over near-dup pairs — the step that turns
    * pairwise discovery into actual deduplication: every document gets
    * a cluster id (the minimum doc id reachable through near-dup
    * edges), and the cluster minimum is the canonical survivor.
    *
    * Algorithm: min-label propagation. Labels start as each node's own
    * id; each round every node takes the min of its label and its
    * neighbours' labels; converged when no label changes. Rounds =
    * one hash-shuffle join each, so total cost is O(diameter) shuffles
    * — near-dup clusters are small and dense (diameter 1-3 in
    * practice), NOT long chains, which is what makes label propagation
    * the right shape at 100 TB (a global union-find would serialize on
    * the driver). The convergence check is one tiny aggregate per
    * round.
    *
    * @param nodes one row per document id (singletons become their own
    *              cluster); @param pairs undirected near-dup edges. */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    // materialize the edge list once: it is consumed EVERY round, and
    // its lineage is typically the whole LSH discovery pipeline —
    // re-evaluating that per round would multiply the dominant cost by
    // the round count. The checkpoint blocks are released on every
    // exit path below, tracked DIRECTLY through the plan's LogicalRDD
    // (Checkpoints) — concurrency-safe, unlike the registry diff it
    // replaces; leaving them pinned was the r7 session-residue finding.
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    def releaseEdges(): Unit = Checkpoints.release(edges)
    // Adaptive strategy choice (the broadcast-join posture applied to
    // components): the edge list is DUPLICATE-bounded, not
    // corpus-bounded — near-dup pairs of a deduped corpus are a tiny
    // fraction of rows — so when the materialized edge set fits a
    // driver bound, exact union-find on the driver replaces the whole
    // label-propagation loop (each round of which was 3-4 small Spark
    // jobs of almost pure scheduler latency). Same result by
    // construction: min-id representative per component, singletons
    // label themselves through the left join's coalesce. Integral ids
    // only (the ordering must match least()'s numeric order); any
    // other key type, or an over-bound edge set, takes the
    // distributed loop below unchanged.
    val idType = nodes.schema(idCol).dataType
    val integralId = idType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val EdgeDriverBound = 1 << 20 // ~16 MB of id pairs, driver-trivial
    val smallEdges: Option[Array[(Long, Long)]] =
      if (!integralId) None
      else
        try {
          // the checkpoint is physical: this collect reads cached
          // blocks, and limit()+length tells us whether we saw it ALL
          val rows = edges.limit(EdgeDriverBound + 1).collect()
          if (rows.length > EdgeDriverBound) None
          else Some(rows.map(r =>
            (r.get(0).asInstanceOf[Number].longValue,
              r.get(1).asInstanceOf[Number].longValue)))
        } catch { case t: Throwable => releaseEdges(); throw t }
    smallEdges.foreach { es =>
      val parent = new scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by MIN root: the representative IS the component min,
        // exactly what min-label propagation converges to
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val spark = nodes.sparkSession
      val touched: Seq[org.apache.spark.sql.Row] =
        parent.keysIterator.map { n =>
          def back(v: Long): Any = idType match {
            case org.apache.spark.sql.types.LongType => v
            case org.apache.spark.sql.types.IntegerType => v.toInt
            case org.apache.spark.sql.types.ShortType => v.toShort
            case _ => v.toByte
          }
          org.apache.spark.sql.Row(back(n), back(find(n)))
        }.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", idType),
        org.apache.spark.sql.types.StructField("_cl", idType)))
      val local = spark.createDataFrame(
        new java.util.ArrayList(
          scala.jdk.CollectionConverters.SeqHasAsJava(touched).asJava),
        schema)
      releaseEdges()
      return nodes.select(col(idCol).as("node"))
        .join(org.apache.spark.sql.functions.broadcast(local),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("_cl"), col("node")).as("cluster_id"))
        .withColumn("is_survivor",
          (col("node") === col("cluster_id")).cast("int"))
        .select(col("node").as(idCol), col("cluster_id"),
          col("is_survivor"))
    }
    var labels = nodes.select(col(idCol).as("node"),
      col(idCol).as("cluster_id"))
    var converged = false
    var it = 0
    try {
    while (!converged && it < maxIter) {
      val viaNeighbours = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("cluster_id", "_nl"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("_nl")).as("_min_nl"))
      val next = labels.join(viaNeighbours, Seq("node"), "left")
        .select(col("node"),
          least(col("cluster_id"), coalesce(col("_min_nl"),
            col("cluster_id"))).as("cluster_id"))
      // one materialization per round: the convergence count and the
      // next iteration both read it (avoids recomputing the join chain
      // exponentially across rounds)
      val persisted = next.persist()
      val changed = persisted.join(labels.withColumnRenamed(
          "cluster_id", "_old"), Seq("node"))
        .filter(col("cluster_id") =!= col("_old")).count()
      labels.unpersist()
      labels = persisted
      converged = changed == 0
      it += 1
    }
    // non-converged labels are WRONG data (one true cluster reported
    // as several, each with its own "survivor") — fail loudly rather
    // than silently under-dedupe; LSH clusters are small and dense, so
    // hitting the cap means pathological input or a parameter bug
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds the cap (raise maxIter or " +
          "inspect the pair graph for chains)")
    // hand back a frame with TRUNCATED lineage (eager localCheckpoint)
    // and release the loop's cache: consumers neither replay the
    // O(rounds) join chain nor pin loop blocks in the block manager
    // (the r3 cache-leak lesson)
    val result = labels.localCheckpoint()
    labels.unpersist()
    releaseEdges()
    result.withColumn("is_survivor",
      (col("node") === col("cluster_id")).cast("int"))
      .select(col("node").as(idCol), col("cluster_id"), col("is_survivor"))
    } catch { case t: Throwable =>
      // ANY failure (a round's Spark job, non-convergence, the final
      // checkpoint) must not leave loop caches or the edge checkpoint
      // pinned — there is no Result to release them through
      labels.unpersist()
      releaseEdges()
      throw t
    }
  }

  /** SimHash candidate pairs via pigeonhole chunking: split the b-bit
    * signature into `chunks` equal chunks — any pair within Hamming
    * distance (chunks − 1) shares at least one exact chunk (guaranteed
    * recall). Expected fan-out per chunk for hash-random signatures is
    * ~N²/2^(b/chunks) buckets; at b=48, chunks=4 that is N²/4096 —
    * chunk width is THE scale knob (8-bit chunks would carry 16× the
    * collision mass). Returns (id_a, id_b, sig_a, sig_b) with
    * id_a < id_b; the caller applies the exact Hamming filter. */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        bits: Int, chunks: Int,
                        maxBucket: Option[Int] = None): DataFrame = {
    require(bits % chunks == 0, "chunks must divide the signature width")
    val chunkBits = bits / chunks
    val mask = (1L << chunkBits) - 1
    val sigs = docs.select(col(idCol).as("doc_id"),
      simhash(col(textCol), bits).as("sig"))
    val chunkRows = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until chunks).map(ci => struct(lit(ci).as("ci"),
        shiftright(col("sig"), ci * chunkBits)
          .bitwiseAND(lit(mask)).as("cv"))): _*)).as("ch"))
      .select(col("doc_id"), col("sig"), col("ch.ci"), col("ch.cv"))
    bucketPairs(chunkRows, Seq("ci", "cv"),
        struct(col("doc_id"), col("sig")), maxBucket)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
  }
}
