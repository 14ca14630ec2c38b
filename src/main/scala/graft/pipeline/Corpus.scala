package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** The training-data corpus pipeline — the LLM-data analogue of the
  * churn [[Warehouse]]: the standard pre-training cleanup funnel
  * composed from the engine's dedup/quality/lang operators, with the
  * per-stage drop accounting a data curator audits.
  *
  * Stages (each one a documented scale shape):
  *  1. exact dedup — md5 content-hash groupBy, min-id survivor;
  *  2. near-dup dedup — MinHash-LSH pair discovery → connected
  *     components → cluster-survivor filter (never all-pairs);
  *  3. quality filter — per-mille heuristic scores, codegen'd
  *     projection;
  *  4. language filter — profile argmax against an allow-list.
  *
  * Order matters and is the conventional one: exact first (cheapest,
  * biggest mass), then near-dup on the survivors (shrinks the LSH
  * input), then row-local filters.
  */
object Corpus {

  final case class Funnel(stage: String, docs_in: Long, docs_out: Long)

  final case class Result(cleaned: DataFrame, funnel: Seq[Funnel])

  def run(spark: SparkSession, docs: DataFrame,
          shingleK: Int = 3, numHashes: Int = 64,
          bands: Int = 16, rowsPerBand: Int = 4,
          nearDupMille: Int = 850, minQualityMilli: Long = 800L,
          langs: Seq[String] = Seq("en")): Result = {
    val funnel = Seq.newBuilder[Funnel]
    def staged(name: String, in: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
      val out = f(in)
      funnel += Funnel(name, in.count(), out.count())
      out
    }

    // 1. exact dedup: survivors carry the min id per content hash
    val exact = staged("exact_dedup", docs) { d =>
      val keep = Dedup.exact(d, "text", "doc_id")
        .select(col("keep_id").as("doc_id"))
      d.join(keep, Seq("doc_id"), "left_semi")
    }

    // 2. near-dup dedup: LSH pairs → components → cluster survivors
    val nearDup = staged("neardup_dedup", exact) { d =>
      val exploded = d.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), shingleK)).as("sh"))
      val sigs = Dedup.minhashSignatures(exploded, "doc_id", "sh", numHashes)
      val banded = Dedup.bandRows(sigs, "doc_id", "sig", bands, rowsPerBand)
      val cands = Dedup
        .bucketPairs(banded, Seq("band", "bucket"), struct(col("doc_id")))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val pairs = Dedup.verifyCandidatesByText(cands, d, "doc_id", "text",
        shingleK, nearDupMille)
      val survivors = Dedup
        .connectedComponents(d.select("doc_id"), "doc_id",
          pairs, "id_a", "id_b")
        .filter(col("is_survivor") === 1)
        .select("doc_id")
      d.join(survivors, Seq("doc_id"), "left_semi")
    }

    // 3. quality filter (row-local projection)
    val quality = staged("quality_filter", nearDup) { d =>
      val q = TextOps.qualityCols(col("text"))
        .find(_._1 == "quality_milli").get._2
      d.filter(q >= minQualityMilli)
    }

    // 4. language filter (row-local argmax vs allow-list)
    val cleaned = staged("lang_filter", quality) { d =>
      d.filter(TextOps.predictedLang(col("text")).isin(langs: _*))
    }

    Result(cleaned, funnel.result())
  }
}
