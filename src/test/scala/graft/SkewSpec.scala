package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted-join equivalence: spreading a hot key across salt
  * partitions must not change the join result. */
class SkewSpec extends SparkSpec {

  test("salted join ≡ plain join on a skewed key distribution") {
    val s = spark; import s.implicits._
    // 90% of big rows share one hot key
    val big = (1L to 2000L).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i)).toDF("key", "row_id")
    val small = Seq(("hot", "H"), ("k0", "A"), ("k3", "B"), ("miss", "Z"))
      .toDF("key", "payload")
    val plain = big.join(small, Seq("key"), "inner")
    val salted = Skew.saltedJoin(big, small, "key",
      entropy = col("row_id"), factor = 8)
    assert(rowsAsSet(salted) == rowsAsSet(plain))
    assert(salted.count() == plain.count())
  }

  test("salt is deterministic across evaluations") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).toDF("id")
      .withColumn("s1", Skew.salt(col("id"), 8))
      .withColumn("s2", Skew.salt(col("id"), 8))
    assert(df.filter(col("s1") =!= col("s2")).count() == 0)
    // spread: every salt value used on 100 rows
    assert(df.select("s1").distinct().count() == 8)
  }
}
