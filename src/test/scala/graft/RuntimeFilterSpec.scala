package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the scale lever where a
  * selective dim predicate gets hashed into a bloom filter and pushed
  * into the fact side BEFORE its shuffle, cutting shuffle volume by
  * the dim's selectivity. Spark injects it automatically
  * (InjectRuntimeFilter) when the engine's session semantics allow;
  * the production thresholds (creation side < 10 MB, application side
  * scan > 10 GB) are sized for clusters, so the spec scales them down
  * rather than the data up.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact side") {
    val s = spark
    val dir = graft.TempRoots.create("graft_rtf")
    s.range(0, 200000).selectExpr("id", "id % 1000 AS key",
        "CAST(id * 7 AS DOUBLE) AS v")
      .write.mode("overwrite").parquet(s"$dir/fact.parquet")
    s.range(0, 1000).selectExpr("id AS key", "id % 10 AS seg")
      .write.mode("overwrite").parquet(s"$dir/dim.parquet")

    val conf = s.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // app side "big" at test scale; forbid broadcast so the join
      // actually shuffles (the case runtime filters exist for)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val fact = s.read.parquet(s"$dir/fact.parquet")
      val dim = s.read.parquet(s"$dir/dim.parquet").filter(col("seg") === 3)
      val joined = fact.join(dim, "key")
      val optimized = joined.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"),
        s"no bloom runtime filter injected:\n${optimized.take(1500)}")
      // and the result is still exactly the unfiltered-join result
      assert(joined.count() == 200L * 100) // 100 keys x 200 rows/key
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
