package graft

import org.apache.spark.sql.functions._
import graft.ops.Survivorship

/** Per-field survivorship semantics: latest-non-null per field
  * independently, all-null stays null, partitioning-invariant. */
class SurvivorshipSpec extends SparkSpec {

  private def fixture = {
    val s = spark; import s.implicits._
    Seq(
      // cluster 1: name only in v1, bal freshest in v2, seg in v3
      (1L, 1L, Option("alice"), Option(10.0), Option("A")),
      (1L, 2L, None, Option(20.0), None),
      (1L, 3L, None, None, Option("B")),
      // cluster 2: single member
      (2L, 1L, Option("bob"), Option(5.0), Option("C")),
      // cluster 3: a field null in EVERY member
      (3L, 1L, None, Option(1.0), Option("D")),
      (3L, 2L, None, Option(2.0), None))
      .toDF("ck", "pri", "name", "bal", "seg")
  }

  test("each field survives from its own latest non-null version") {
    val out = Survivorship.goldenRecord(fixture, col("ck"), col("pri"),
        Seq("name", "bal", "seg"))
      .orderBy("cluster_key").collect()
    assert(out.length == 3)
    val r1 = out(0)
    assert((r1.getString(1), r1.getDouble(2), r1.getString(3)) ==
      (("alice", 20.0, "B")),
      "fields must merge ACROSS versions, not pick one row")
    assert(out(1).getString(1) == "bob")
    val r3 = out(2)
    assert(r3.isNullAt(1), "an all-null field must stay null")
    assert(r3.getDouble(2) == 2.0)
    assert(r3.getString(3) == "D")
  }

  test("survivorship is partitioning-invariant") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      Survivorship.goldenRecord(df, col("ck"), col("pri"),
          Seq("name", "bal", "seg"))
        .orderBy("cluster_key").collect().map(_.toString).toSeq
    assert(rows(fixture) == rows(fixture.repartition(7)),
      "partitioning changed the merge outcome")
  }
}
