package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — split each document into
  * fixed-size token windows with configurable overlap, the
  * batch-construction op a pretraining pipeline runs between cleaning
  * and packing: a 50k-token document becomes ~13 training rows at a
  * 4k window with 128-token stitch overlap, instead of one truncated
  * row ([[Packing]] is the inverse direction — many short docs into
  * one budget; chunking is one long doc into many windows).
  *
  * Semantics (pinned in ChunkingSpec, mirrored by the SQL oracle):
  * chunk `i` covers tokens `[i·stride, i·stride + size)` with
  * `stride = size − overlap`; the last chunk may be short; a doc with
  * `≤ size` tokens yields exactly one chunk (itself); consecutive
  * chunks share exactly `overlap` tokens. Chunk count is pure integer
  * arithmetic — `1 + ⌈max(n − size, 0) / stride⌉` computed as
  * `(max(n − size, 0) + stride − 1) div stride` — so the Spark and
  * DuckDB formulations agree exactly, never via float ceil.
  *
  * Scale shape: a per-row `sequence` + `explode` — NO shuffle, no
  * window, no join; output size is input tokens × (1 + overlap/stride)
  * and each task chunks only its own partition's documents. Token
  * split is the layer contract single-space split ([[TextOps.tokens]])
  * so the chunk text round-trips byte-exactly cross-engine.
  */
object Chunking {

  /** Explode `textCol` into (chunk_id, chunk_text, chunk_tokens)
    * rows, keeping `keep` passthrough columns. */
  def chunk(df: DataFrame, textCol: String, keep: Seq[String],
            size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): $overlap vs $size")
    val stride = size - overlap
    val extra = // chunks beyond the first, exact integer ceil
      expr(s"CAST((greatest(_n - $size, 0) + ${stride - 1}) " +
        s"DIV $stride AS INT)")
    df
      .withColumn("_toks", TextOps.tokens(col(textCol)))
      .withColumn("_n", org.apache.spark.sql.functions.size(col("_toks")))
      .withColumn("chunk_id", explode(sequence(lit(0), extra)))
      .withColumn("_chunk_toks",
        slice(col("_toks"), col("chunk_id") * stride + 1, lit(size)))
      .select(keep.map(col) ++ Seq(
        col("chunk_id"),
        concat_ws(" ", col("_chunk_toks")).as("chunk_text"),
        org.apache.spark.sql.functions.size(col("_chunk_toks"))
          .as("chunk_tokens")): _*)
  }

  /** DuckDB mirror of [[chunk]]: same stride arithmetic over
    * `generate_series`, 1-based inclusive `list_slice`. */
  def chunkSql(table: String, textExpr: String, keepExprs: Seq[String],
               size: Int, overlap: Int): String = {
    val stride = size - overlap
    val keeps = keepExprs.map(k => s"t.$k").mkString(", ")
    s"""
      WITH toks AS (
        SELECT *, string_split($textExpr, ' ') AS _toks,
               len(string_split($textExpr, ' ')) AS _n
        FROM $table),
      ch AS (
        SELECT t.*, gs.i AS chunk_id,
               list_slice(t._toks, gs.i * $stride + 1,
                          gs.i * $stride + $size) AS _chunk_toks
        FROM toks t, LATERAL (
          SELECT unnest(generate_series(0,
            CAST((greatest(t._n - $size, 0) + $stride - 1) // $stride
                 AS INT))) AS i) gs)
      SELECT $keeps, t.chunk_id,
             array_to_string(t._chunk_toks, ' ') AS chunk_text,
             CAST(len(t._chunk_toks) AS INT) AS chunk_tokens
      FROM ch t
    """
  }
}
