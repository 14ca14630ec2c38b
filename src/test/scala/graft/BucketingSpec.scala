package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join lever: two tables bucketed by the
  * join key shuffle ZERO rows at join time — the layout prepaid the
  * exchange. At 100 TB this is the difference between re-shuffling the
  * fact for every join and reading it join-ready; the natural bucket
  * key here (order key) is also the star schema's fact join key. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with no shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    info(s"warehouse: $wh")
    val li = Tables.lineitem(spark, TinySf)
    val o = Tables.orders(spark, TinySf)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    // sf0.001 tables are broadcast-small, which would sidestep the
    // bucket layout entirely; disable broadcast to expose the
    // co-located sort-merge path the layout exists for
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_totalprice")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
      assert(plan.contains("Bucketed: true"), plan.take(1200))
      // and the result matches the plain (shuffling) join
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_totalprice")
      assert(joined.count() == plain.count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
