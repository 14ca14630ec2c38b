package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** §2.11: the spark.ml churn layer — train/predict round trip over a
  * warehouse built from fixture data (not oracle-checked; verified by
  * invariants the reference trainer guarantees). */
class ChurnModelSpec extends SparkSpec {

  private val ExportHeader =
    "customer_id,gender,senior_citizen,partner,dependents,country,state,city," +
      ChurnSchema.serviceCols.mkString(",") +
      ",paperless_billing,payment_method,contract,tenure_in_months," +
      "monthly_charges_amount,total_charges,churn_label,churn_value," +
      "churn_score,cltv,churn_reason,created_at,updated_at,record_type"

  private def row(id: String, churn: String, tenure: Int,
                  charges: Double): String =
    s"$id,Female,No,Yes,No,United States,New York,Albany," +
      "Yes,Yes,Fiber optic,No,No,No,No,Yes,Yes,Yes," +
      s"Electronic check,Two year,$tenure,$charges,${charges * tenure}," +
      s"$churn,${if (churn == "Yes") 1 else 0},86,3239,n/a," +
      "2026-04-01 08:00:00,2026-04-01 08:00:00,new"

  test("train/predict round trip writes a full prediction refresh") {
    val root = graft.TempRoots.create("graft_ml")
    val layers = Warehouse.Layers(root)
    val landing = s"$root/landing"
    // 16 customers, both classes, churn correlates with low tenure
    val rows = (1 to 8).map(i => row(f"Y$i%03d", "Yes", i, 90.0 + i)) ++
      (1 to 8).map(i => row(f"N$i%03d", "No", 40 + i, 50.0 + i))
    val p = java.nio.file.Paths.get(landing)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("export.csv"),
      (ExportHeader +: rows).mkString("\n").getBytes("UTF-8"))
    Warehouse.run(spark, landing, layers, "2026-04-01")

    val preds = ChurnModel.run(spark, layers, "2026-04-02 00:00:00")
    assert(preds.count() == 16, "one prediction per eligible customer")
    assert(preds.filter(!col("churn_prediction").isin(0, 1)).count() == 0)
    assert(preds.filter(col("churn_probability") < 0 ||
      col("churn_probability") > 1).count() == 0)
    // a seeded booster on linearly separable fixture data must learn it
    val joined = preds.withColumn("actual",
      when(col("customer_id").startsWith("Y"), 1).otherwise(0))
    val correct = joined
      .filter(col("churn_prediction") === col("actual")).count()
    assert(correct >= 14, s"expected >=14/16 correct, got $correct")
    // rerun = full refresh, not append
    val again = ChurnModel.run(spark, layers, "2026-04-03 00:00:00")
    assert(again.count() == 16)
    assert(again.select(max(col("model_run_date")).cast("string")).head()
      .getString(0).startsWith("2026-04-03"))
  }

  test("scaler standardizes ONLY the numeric features (reference parity)") {
    // train_churn_model.py:106-112 scales the 3 numerics; encoded
    // categoricals stay raw. Pin the pipeline shape so a regression
    // back to whole-vector scaling fails here.
    val stages = ChurnModel.buildPipeline().getStages
    val scaler = stages.collectFirst {
      case s: org.apache.spark.ml.feature.StandardScaler => s
    }.getOrElse(fail("pipeline must contain a StandardScaler"))
    assert(scaler.getInputCol == "numeric_raw")
    val numAsm = stages.collectFirst {
      case a: org.apache.spark.ml.feature.VectorAssembler
        if a.getOutputCol == "numeric_raw" => a
    }.getOrElse(fail("numeric pre-assembler missing"))
    assert(numAsm.getInputCols.toSeq == ChurnModel.numericCols)
    val finalAsm = stages.collectFirst {
      case a: org.apache.spark.ml.feature.VectorAssembler
        if a.getOutputCol == "features" => a
    }.getOrElse(fail("final assembler missing"))
    assert(finalAsm.getInputCols.head == "numeric_scaled")
    assert(finalAsm.getInputCols.tail.toSeq ==
      ChurnModel.categoricalCols.map(_ + "_idx"))
  }

  test("versioned artifacts: save, load-latest of >=2, predict without retraining") {
    val root = graft.TempRoots.create("graft_ml3")
    val layers = Warehouse.Layers(root)
    val landing = s"$root/landing"
    val artifacts = s"$root/artifacts"
    val rows = (1 to 8).map(i => row(f"Y$i%03d", "Yes", i, 90.0 + i)) ++
      (1 to 8).map(i => row(f"N$i%03d", "No", 40 + i, 50.0 + i))
    val p = java.nio.file.Paths.get(landing)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("export.csv"),
      (ExportHeader +: rows).mkString("\n").getBytes("UTF-8"))
    Warehouse.run(spark, landing, layers, "2026-04-01")

    // inference before any training run fails loudly, like the reference
    val ex = intercept[java.io.FileNotFoundException] {
      ChurnModel.loadLatest(spark, artifacts)
    }
    assert(ex.getMessage.contains("No trained artifacts"))

    // two monthly training runs → two versioned artifacts
    val v1 = ChurnModel.trainAndSave(spark, layers, artifacts, "2026-04-01")
    val features = ChurnModel.extractFeatures(spark, layers)
    val m2 = ChurnModel.buildPipeline().fit(features)
    val v2 = ChurnModel.saveVersioned(m2, artifacts, "2026-05-01")
    assert(v1.endsWith("churn_model_2026-04-01"))
    assert(v2.endsWith("churn_model_2026-05-01"))
    assert(ChurnModel.listVersions(spark, artifacts) ==
      Seq("churn_model_2026-04-01", "churn_model_2026-05-01"))

    // load-latest picks the lexicographic max (= the May model)
    val latest = ChurnModel.loadLatest(spark, artifacts)
    assert(latest.uid == m2.uid, "loadLatest must return the newest version")

    // daily inference scores without retraining and round-trips the model
    val preds = ChurnModel.predictWithLatest(
      spark, layers, artifacts, "2026-05-02 00:00:00")
    assert(preds.count() == 16)
    val direct = ChurnModel.score(m2, features, "2026-05-02 00:00:00")
    assert(preds.select("customer_id", "churn_prediction", "churn_probability")
      .except(direct.select("customer_id", "churn_prediction", "churn_probability"))
      .count() == 0, "persisted model must reproduce the in-memory model")

    // same-day re-run is idempotent (delete+insert on model_run_date)...
    assert(ChurnModel.predictWithLatest(
      spark, layers, artifacts, "2026-05-02 00:00:00").count() == 16)
    // ...and a next-day run keeps both days
    val day2 = ChurnModel.predictWithLatest(
      spark, layers, artifacts, "2026-05-03 00:00:00")
    assert(day2.count() == 32)

    // crash-swap recovery: simulate a prior atomicOverwrite dying
    // between its two renames (target gone, .__old__ = only copy).
    // predictWithLatest must restore it BEFORE its exists check or
    // all prior days silently truncate to today's run.
    val out = new org.apache.hadoop.fs.Path(
      s"${layers.root}/gold/churn_predictions")
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(out, new org.apache.hadoop.fs.Path(out.toString + ".__old__")))
    val day3 = ChurnModel.predictWithLatest(
      spark, layers, artifacts, "2026-05-04 00:00:00")
    assert(day3.count() == 48,
      "crashed swap must be recovered before the merge, keeping all prior days")
  }

  test("feature importances rank and sum to 1") {
    val root = graft.TempRoots.create("graft_ml2")
    val layers = Warehouse.Layers(root)
    val landing = s"$root/landing"
    val rows = (1 to 8).map(i => row(f"Y$i%03d", "Yes", i, 90.0 + i)) ++
      (1 to 8).map(i => row(f"N$i%03d", "No", 40 + i, 50.0 + i))
    val p = java.nio.file.Paths.get(landing)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("export.csv"),
      (ExportHeader +: rows).mkString("\n").getBytes("UTF-8"))
    Warehouse.run(spark, landing, layers, "2026-04-01")

    val result = ChurnModel.trainPredict(
      ChurnModel.extractFeatures(spark, layers), "2026-04-02 00:00:00")
    val imp = ChurnModel.featureImportance(spark, result.model)
    assert(imp.count() ==
      (ChurnModel.numericCols ++ ChurnModel.categoricalCols).size)
    val total = imp.agg(sum("importance")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
    // tenure separates the classes in this fixture → top feature
    assert(imp.head().getString(0) == "tenure_in_months")
  }
}
