package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Intervals

/** Gaps-and-islands semantics: chained overlaps merge transitively,
  * half-open abutting intervals merge only under the flag, keys stay
  * isolated, and the whole pass is one hash Exchange. */
class IntervalsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val fixture = {
    val s = spark; import s.implicits._
    Seq(
      // key A: chain 10-11, 10:30-12, 11:50-13 -> one island 10-13
      ("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      ("A", ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")),
      ("A", ts("2024-01-01 11:50:00"), ts("2024-01-01 13:00:00")),
      // key A: abuts the chain end exactly
      ("A", ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00")),
      // key A: clearly separate
      ("A", ts("2024-01-01 20:00:00"), ts("2024-01-01 21:00:00")),
      // key B: same times as A's chain — must not interact
      ("B", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      // an earlier interval CONTAINING a later-starting one
      ("B", ts("2024-01-02 00:00:00"), ts("2024-01-02 05:00:00")),
      ("B", ts("2024-01-02 01:00:00"), ts("2024-01-02 02:00:00"))
    ).toDF("k", "s_ts", "e_ts")
  }

  private def islands(mergeAbutting: Boolean) =
    Intervals.coalesce(fixture, Seq("k"), "s_ts", "e_ts", mergeAbutting)
      .orderBy("k", "island_start")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))

  test("chained overlaps merge transitively; abutting merges under " +
    "the default; containment collapses") {
    val got = islands(mergeAbutting = true)
    assert(got.toSeq == Seq(
      ("A", "2024-01-01 10:00:00.0", "2024-01-01 14:00:00.0", 4L),
      ("A", "2024-01-01 20:00:00.0", "2024-01-01 21:00:00.0", 1L),
      ("B", "2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0", 1L),
      ("B", "2024-01-02 00:00:00.0", "2024-01-02 05:00:00.0", 2L)),
      s"islands wrong: ${got.toSeq}")
  }

  test("mergeAbutting=false splits exactly the abutting boundary") {
    val got = islands(mergeAbutting = false)
    assert(got.count(_._1 == "A") == 3,
      s"abutting [13,14) must become its own island: ${got.toSeq}")
    assert(got.contains(("A", "2024-01-01 13:00:00.0",
      "2024-01-01 14:00:00.0", 1L)))
  }

  test("plan contract: one hash Exchange for windows and aggregate") {
    val plan = Intervals.coalesce(fixture, Seq("k"), "s_ts", "e_ts")
      .queryExecution.executedPlan.toString()
    val hashEx = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly 1 hash Exchange, found $hashEx:\n${plan.take(2500)}")
  }
}
