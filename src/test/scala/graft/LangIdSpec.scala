package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The trigram profiles must carry REAL language signal — the harness
  * corpus is synthetic shared-vocabulary text, so discrimination is
  * proven here on genuine sentences instead. */
class LangIdSpec extends SparkSpec {

  test("trigram profiles discriminate real multilingual text") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the quick brown fox is running through the woods and " +
        "the fields of the north looking for the river"),
      ("de", "ich habe einen schoenen tag und der hund laeuft schnell " +
        "durch einen wald und einen bach"),
      ("es", "la casa de los abuelos esta cerca de la plaza y los ninos " +
        "juegan a la pelota cada semana"),
      ("fr", "le professeur est arrive les enfants avaient peur de leur " +
        "avenir et il voulait savoir la verite"),
      ("zh", "wo3 de5 peng2 you3 shi4 zhong1 guo2 ren2 ta1 de5 jia1 " +
        "zai4 bei3 jing1 hen3 da4")).toDF("lang", "text")
    val scored = docs
      .withColumn("predicted", TextOps.predictedLang(col("text")))
    val wrong = scored.filter(col("predicted") =!= col("lang")).collect()
    assert(wrong.isEmpty,
      s"misidentified: ${wrong.map(r => s"${r.getString(0)}→${r.getString(2)}").mkString(", ")}")
    // and the winning score is strictly positive — not a degenerate
    // all-zero argmax falling through the tie-break
    val scores = TextOps.langScores(col("text"))
    val best = scores.map(_._2).reduce(greatest(_, _))
    assert(scored.withColumn("best", best)
      .filter(col("best") <= 0).count() == 0)
  }
}
