package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The warehouse quality-check corpus — the reference's
  * DWH_Quality_Checks.sql (dags/SQL/DWH_Quality_Checks.sql:1-325)
  * re-expressed as a runnable suite over the layer paths.
  *
  * Shape: per-layer checks that share a scan are fused into ONE
  * aggregate pass (the reference runs ~30 separate SELECTs; one
  * conditional-aggregation pass per layer computes the same counters
  * in a single job — §2.4 A2). Orphan checks are anti-join counts
  * (§2.3 J12). Output: (section, check, value, pass) — `pass` encodes
  * each check's invariant; informational counters pass trivially.
  */
object Quality {

  final case class Check(section: String, name: String, value: Long,
                         pass: Boolean)


  private def dupKeys(df: DataFrame, key: String): Long =
    df.filter(col(key).isNotNull).groupBy(col(key))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()

  /** One fused conditional-aggregation pass over a layer. */
  private def counters(df: DataFrame, conds: Seq[(String, org.apache.spark.sql.Column)]): Map[String, Long] = {
    val row = df.agg(
      count(lit(1)).as("__total"),
      conds.map { case (n, c) => count(when(c, 1)).as(n) }: _*).head()
    (("__total" -> row.getLong(0)) +:
      conds.zipWithIndex.map { case ((n, _), i) => n -> row.getLong(i + 1) }).toMap
  }

  def runAll(spark: SparkSession, layers: Warehouse.Layers): DataFrame = {
    import spark.implicits._
    val bronze = spark.read.schema(ChurnSchema.bronze).parquet(layers.bronze)
    val silver = spark.read.schema(ChurnSchema.silver).parquet(layers.silver)
    val fact = spark.read.parquet(layers.fact)
    val dimCustomer = spark.read.parquet(layers.dim("customer"))
    val dimContract = spark.read.parquet(layers.dim("contract"))
    val dimServices = spark.read.parquet(layers.dim("services"))

    // §3 bronze — one pass
    val b = counters(bronze, Seq(
      "null_customer_id" -> col("customer_id").isNull,
      "null_churn_label" -> col("churn_label").isNull,
      "null_gender" -> col("gender").isNull,
      "invalid_churn_label" -> (col("churn_label").isNotNull &&
        !col("churn_label").isin("Yes", "No", "0", "1")),
      "negative_numeric" ->
        (col("tenure_in_months") < 0 || col("monthly_charges_amount") < 0)))
    // §4 silver — one pass
    val sv = counters(silver, Seq(
      "null_customer_id" -> col("customer_id").isNull,
      "invalid_gender" ->
        (col("gender").isNotNull && !col("gender").isin("Male", "Female")),
      "score_out_of_range" ->
        (col("churn_score") < 0 || col("churn_score") > 100),
      "negative_numeric" ->
        (col("tenure_in_months") < 0 || col("monthly_charges_amount") < 0)))
    // §6 fact — one pass + orphan anti-joins
    val f = counters(fact, Seq(
      "null_customer_key" -> col("customer_key").isNull,
      "null_contract_key" -> col("contract_key").isNull,
      "null_service_key" -> col("service_key").isNull,
      "negative_charges" ->
        (col("monthly_charges_amount") < 0 || col("total_charges") < 0),
      "score_out_of_range" ->
        (col("churn_score") < 0 || col("churn_score") > 100)))
    // NULL keys are the null_*_key counters' concern; the orphan
    // metric measures referential integrity among KEYED rows only —
    // same filter discipline for all three
    val orphanCustomers = fact.filter(col("customer_key").isNotNull)
      .join(dimCustomer.select("customer_key"),
        Seq("customer_key"), "left_anti").count()
    val orphanContracts = fact.filter(col("contract_key").isNotNull)
      .join(dimContract.select("contract_key"),
        Seq("contract_key"), "left_anti").count()
    val orphanServices = fact.filter(col("service_key").isNotNull)
      .join(dimServices.select("service_key"),
        Seq("service_key"), "left_anti").count()
    // §7 end-to-end: silver customers that never reached the fact
    val missedRecords = silver.select("customer_id")
      .join(dimCustomer.select(col("customer_id"), col("customer_key")),
        Seq("customer_id"), "left")
      .join(fact.select(col("customer_key"), lit(1).as("_in_fact"))
          .distinct(),
        Seq("customer_key"), "left")
      .filter(col("_in_fact").isNull).count()

    val bronzeDups = dupKeys(bronze, "customer_id")
    val silverDups = dupKeys(silver, "customer_id")
    val dimCustomerRows = dimCustomer.count()
    val dimCustomerDups = dupKeys(dimCustomer, "customer_id")
    val factDups = dupKeys(fact, "customer_key")
    // §5.1 row counts across every dimension (informational) —
    // contract/services reuse the frames already bound above
    val dimRowCounts = Seq(
      "contract" -> dimContract.count(),
      "payment_method" ->
        spark.read.parquet(layers.dim("payment_method")).count(),
      "churn_reason" ->
        spark.read.parquet(layers.dim("churn_reason")).count(),
      "services" -> dimServices.count())

    val checks = Seq(
      Check("bronze", "total_rows", b("__total"), b("__total") >= 0),
      Check("bronze", "null_customer_id", b("null_customer_id"),
        b("null_customer_id") == 0),
      Check("bronze", "null_churn_label", b("null_churn_label"),
        b("null_churn_label") == 0),
      Check("bronze", "null_gender", b("null_gender"), b("null_gender") == 0),
      Check("bronze", "negative_numeric", b("negative_numeric"),
        b("negative_numeric") == 0),
      Check("bronze", "invalid_churn_label", b("invalid_churn_label"),
        b("invalid_churn_label") == 0),
      Check("bronze", "duplicate_customer_id", bronzeDups, bronzeDups == 0),
      Check("silver", "total_rows", sv("__total"),
        sv("__total") <= b("__total")),
      Check("silver", "null_customer_id", sv("null_customer_id"),
        sv("null_customer_id") == 0),
      Check("silver", "invalid_gender", sv("invalid_gender"),
        sv("invalid_gender") == 0),
      Check("silver", "score_out_of_range", sv("score_out_of_range"),
        sv("score_out_of_range") == 0),
      Check("silver", "negative_numeric", sv("negative_numeric"),
        sv("negative_numeric") == 0),
      Check("silver", "duplicate_customer_id", silverDups, silverDups == 0),
      Check("gold", "dim_customer_rows", dimCustomerRows, dimCustomerRows > 0)) ++
      dimRowCounts.map { case (n, c) =>
        Check("gold", s"dim_${n}_rows", c, c > 0) } ++ Seq(
      Check("gold", "dim_customer_dup_id", dimCustomerDups, dimCustomerDups == 0),
      Check("gold", "fact_rows", f("__total"), f("__total") > 0),
      Check("gold", "fact_null_customer_key", f("null_customer_key"),
        f("null_customer_key") == 0),
      Check("gold", "fact_null_contract_key", f("null_contract_key"),
        f("null_contract_key") == 0),
      Check("gold", "fact_null_service_key", f("null_service_key"),
        f("null_service_key") == 0),
      Check("gold", "fact_negative_charges", f("negative_charges"),
        f("negative_charges") == 0),
      Check("gold", "fact_score_out_of_range", f("score_out_of_range"),
        f("score_out_of_range") == 0),
      Check("gold", "fact_dup_customer_key", factDups, factDups == 0),
      Check("gold", "orphan_customers", orphanCustomers, orphanCustomers == 0),
      Check("gold", "orphan_contracts", orphanContracts, orphanContracts == 0),
      Check("gold", "orphan_services", orphanServices, orphanServices == 0),
      Check("e2e", "missed_records", missedRecords, missedRecords == 0))
    checks.toDF()
  }
}
