package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ScratchDebugSpec extends SparkSpec {
  test("debug: parquet read-time type widening support") {
    val s = spark; import s.implicits._
    val p = graft.TempRoots.create("graft_widen_probe")
    Seq((1, 1.5f, BigDecimal("12.34")), (2, 2.5f, BigDecimal("99.99")))
      .toDF("i", "f", "d")
      .withColumn("d", col("d").cast(DecimalType(6, 2)))
      .write.parquet(p + "/t")
    // scalastyle:off println
    def attempt(tag: String, schema: StructType): Unit =
      try {
        val r = spark.read.schema(schema).parquet(p + "/t")
          .orderBy("i").collect().toSeq
        println(s"=== $tag OK: $r")
      } catch { case e: Throwable =>
        println(s"=== $tag FAIL ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    attempt("int->long", StructType(Seq(StructField("i", LongType),
      StructField("f", FloatType), StructField("d", DecimalType(6, 2)))))
    attempt("float->double", StructType(Seq(StructField("i", IntegerType),
      StructField("f", DoubleType), StructField("d", DecimalType(6, 2)))))
    attempt("dec(6,2)->dec(12,2)", StructType(Seq(StructField("i", IntegerType),
      StructField("f", FloatType), StructField("d", DecimalType(12, 2)))))
    attempt("dec(6,2)->dec(12,4)", StructType(Seq(StructField("i", IntegerType),
      StructField("f", FloatType), StructField("d", DecimalType(12, 4)))))
    attempt("int->double", StructType(Seq(StructField("i", DoubleType),
      StructField("f", FloatType), StructField("d", DecimalType(6, 2)))))
    attempt("long->int NARROW", StructType(Seq(StructField("i", IntegerType),
      StructField("f", FloatType), StructField("d", DecimalType(4, 2)))))
    // scalastyle:on println
  }
}
