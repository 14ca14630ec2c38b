package graft

import org.apache.spark.sql.functions._

import graft.ops.TableStore

/** CREATE TABLE / CTAS / DROP on the graft catalog: create anchors a
  * typed-empty store, CTAS lands the query as version 1 through the
  * ordinary append commit, and DROP succeeds only where nothing was
  * ever committed. */
class SqlDdlSpec extends SparkSpec {

  private def cat(name: String): String = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    name
  }

  test("CREATE TABLE anchors a typed-empty store; INSERT lands v1") {
    val root = graft.TempRoots.create("graft_ddl_create") + "/t"
    val g = cat("gddl")
    spark.sql(s"CREATE TABLE $g.`$root` (id BIGINT, v BIGINT)")
    // typed empty before any commit
    val empty = spark.sql(s"SELECT * FROM $g.`$root`")
    assert(empty.columns.toSeq == Seq("id", "v") && empty.count() == 0)
    assert(TableStore.versions(spark, root).isEmpty)
    spark.sql(s"INSERT INTO $g.`$root` VALUES (1, 10), (2, 20)")
    assert(TableStore.versions(spark, root) == Seq(1L))
    assert(spark.sql(s"SELECT SUM(v) FROM $g.`$root`")
      .collect().head.getLong(0) == 30L)
  }

  test("CTAS creates and loads in one statement, one commit") {
    val root = graft.TempRoots.create("graft_ddl_ctas") + "/t"
    val g = cat("gddl")
    val s = spark; import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .createOrReplaceTempView("ddl_src")
    spark.sql(
      s"CREATE TABLE $g.`$root` AS SELECT * FROM ddl_src WHERE id <= 2")
    assert(TableStore.versions(spark, root) == Seq(1L),
      "CTAS must land exactly one commit")
    assert(spark.sql(s"SELECT * FROM $g.`$root` ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // and the created store is a full citizen: DML works on it
    spark.sql(s"DELETE FROM $g.`$root` WHERE id = 1").collect()
    assert(spark.sql(s"SELECT COUNT(*) FROM $g.`$root`")
      .collect().head.getLong(0) == 1L)
  }

  test("CREATE over an existing store refuses") {
    val root = graft.TempRoots.create("graft_ddl_clobber") + "/t"
    val s = spark; import s.implicits._
    TableStore.append(Seq((1L, 1L)).toDF("id", "v"), root)
    val g = cat("gddl")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $g.`$root` (id BIGINT, v BIGINT)")
    }
    assert(e.getMessage.toLowerCase.contains("already exists") ||
      e.getMessage.contains("TABLE_OR_VIEW_ALREADY_EXISTS"),
      e.getMessage)
  }

  test("PARTITIONED BY is refused toward layout commits") {
    val root = graft.TempRoots.create("graft_ddl_part") + "/t"
    val g = cat("gddl")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $g.`$root` (id BIGINT, v BIGINT) " +
        "PARTITIONED BY (v)")
    }
    assert(e.getMessage.contains("optimize"), e.getMessage)
  }

  test("DROP retires only never-committed stores") {
    val root = graft.TempRoots.create("graft_ddl_drop") + "/t"
    val g = cat("gddl")
    spark.sql(s"CREATE TABLE $g.`$root` (id BIGINT)")
    spark.sql(s"DROP TABLE $g.`$root`")
    intercept[Exception] { // gone: reads fail loudly
      spark.sql(s"SELECT * FROM $g.`$root`").collect()
    }
    // committed history refuses
    val root2 = graft.TempRoots.create("graft_ddl_drop2") + "/t"
    val s = spark; import s.implicits._
    TableStore.append(Seq((1L, 1L)).toDF("id", "v"), root2)
    val e = intercept[Exception] {
      spark.sql(s"DROP TABLE $g.`$root2`")
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    assert(TableStore.read(spark, root2).count() == 1)
  }
}
