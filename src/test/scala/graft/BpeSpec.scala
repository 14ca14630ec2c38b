package graft

import graft.ops.Vocab

/** BPE merge induction: pair weighting by word frequency, the
  * deterministic tie-break, left-to-right fold semantics on even
  * runs, and cross-round dependence (round 2 counts see round 1's
  * merge applied). */
class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val s = spark; import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("argmax weights pairs by corpus word frequency") {
    // "ab" occurs 3 times (pair a-b weight 3); "cd" twice.
    val out = Vocab.bpeMerges(
      docs("ab ab cd", "ab cd"), "text", rounds = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(1), r.getString(2), r.getLong(3))
      == ("a", "b", 3L))
  }

  test("even runs fold left-to-right: aaaa yields two merged pairs") {
    // word "aaaa" freq 1: round 1 pair (a,a) count 3; after the fold
    // the word is "aa aa", so round 2's best pair is (aa, aa).
    val out = Vocab.bpeMerges(docs("aaaa"), "text", rounds = 2)
      .collect()
    assert(out(0).getString(1) == "a" && out(0).getString(2) == "a")
    assert(out(0).getLong(3) == 3L)
    assert(out(1).getString(1) == "aa" && out(1).getString(2) == "aa")
    assert(out(1).getLong(3) == 1L)
  }

  test("round 2 counts reflect round 1's merge (chained dependence)") {
    // "abc" x3: round 1 merges (a,b) [tie with (b,c) broken by left
    // symbol]; round 2 must then see pair (ab, c), not (b, c).
    val out = Vocab.bpeMerges(docs("abc abc abc"), "text", rounds = 2)
      .collect()
    assert((out(0).getString(1), out(0).getString(2)) == ("a", "b"))
    assert((out(1).getString(1), out(1).getString(2)) == ("ab", "c"))
    assert(out(1).getLong(3) == 3L)
  }

  test("merged token cannot cascade within its own round") {
    // "aab": pair (a,a) and (a,b) tie at 1 -> (a,a) wins by left/right
    // order; the fold must NOT then merge ("aa","b") in the same round.
    val out = Vocab.bpeMerges(docs("aab"), "text", rounds = 2).collect()
    assert((out(0).getString(1), out(0).getString(2)) == ("a", "a"))
    assert((out(1).getString(1), out(1).getString(2)) == ("aa", "b"))
  }

  test("encode joins the saved map; unseen words fall back to chars") {
    import org.apache.spark.sql.functions.col
    val dir = graft.TempRoots
      .create("graft_bpe_spec") + "/m"
    // train on "ab" x3 -> merge (a,b); encode a corpus containing the
    // trained word, a word embedding it, and an unseen word
    Vocab.bpeSaveModel(docs("ab ab ab"), "text", rounds = 1, dir)
    val out = Vocab.bpeEncode(
      docs("ab zz"), "doc_id", "text", dir)
      .orderBy("doc_id").collect()
    val r = out.head
    assert(r.getAs[Long]("n_words") == 2L)
    // "ab" encodes to ONE piece (trained); "zz" is unseen -> 2 chars
    assert(r.getAs[Long]("n_pieces") == 3L)
    // independent reimplementation of the digest arithmetic: base-31
    // char polynomial per piece string, position-weighted sum per doc
    val M = Vocab.DigestMod
    def poly(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % M)
    // doc = [("ab", ord 0), ("z z", ord 1)]
    val expSig = (poly("ab") * 1) % M + (poly("z z") * 2) % M
    val expSum = poly("ab") + poly("z z")
    assert(r.getAs[Long]("enc_sig") == expSig)
    assert(r.getAs[Long]("enc_sum") == expSum)
    // the signature is ORDER-sensitive: the reversed doc must differ
    val rev = Vocab.bpeEncode(docs("zz ab"), "doc_id", "text", dir)
      .collect().head
    assert(rev.getAs[Long]("enc_sig") != expSig)
    assert(rev.getAs[Long]("enc_sum") == expSum) // same multiset
    // the persisted merge table is readable and ranked
    val m = spark.read.parquet(s"$dir/merges").collect()
    assert(m.length == 1 && m.head.getAs[String]("left_sym") == "a")
    assert(spark.read.parquet(s"$dir/encode")
      .where(col("word") === "ab").head().getAs[String]("s") == "ab")
  }

  test("rounds past exhaustion emit nothing (single-char vocabulary)") {
    val out = Vocab.bpeMerges(docs("a b c"), "text", rounds = 3)
      .collect()
    assert(out.isEmpty) // no adjacent pairs anywhere
  }
}
