package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.SchemaEvolution

/** Evolution-read mechanics: by-name resolution across reordered
  * schemas, null surfacing for pre-evolution files, explicit
  * backfill with per-row audit counts. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  test("old batches surface added columns as null; by-name resolution " +
    "absorbs column reorder; backfill counts per row") {
    val root = graft.TempRoots.create("graft_evo")
    // v1 schema: (id, name) — no score
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$root/b1")
    // v2 schema: score added AND columns in a different order
    Seq((10L, "x", 3L), (20L, "y", 4L)).toDF("score", "name", "id")
      .select(col("score"), col("name"), col("id")) // wire order: score first
      .write.parquet(s"$root/b2")
    val merged = SchemaEvolution.readWithTarget(spark, target,
      s"$root/b1", s"$root/b2")
    val rows = merged.collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "v1 rows must null score")
    assert(rows(3L).contains(10L) && rows(4L).contains(20L),
      "v2 rows must carry score through the reorder")

    val filled = SchemaEvolution.backfill(merged,
      Map("score" -> lit(-1L)))
    val byId = filled.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("score"), r.getAs[Int]("_backfilled"))).toMap
    assert(byId(1L) == (-1L, 1) && byId(2L) == (-1L, 1))
    assert(byId(3L) == (10L, 0) && byId(4L) == (20L, 0))
  }

  test("pruning survives the target-schema read: a projection of one " +
    "column reads one column") {
    val root = graft.TempRoots.create("graft_evo2")
    Seq((1L, "a", 5L)).toDF("id", "name", "score").write.parquet(s"$root/b")
    val plan = SchemaEvolution.readWithTarget(spark, target, s"$root/b")
      .select("id").queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"column pruning lost:\n${plan.take(800)}")
  }
}
