package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TableStore

/** `format("graft")` — the path-addressed way into a versioned store
  * (the catalog-free twin of [[GraftCatalog]]):
  *
  * {{{
  *   spark.read.format("graft").load("/data/events")               // latest
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load("/data/events")              // pinned
  *   spark.read.format("graft")
  *     .option("timestampAsOf", millis).load("/data/events")
  * }}}
  *
  * Registered in META-INF/services, so the short name resolves
  * without any session config. Reads share the exact machinery of
  * the catalog path: a version-pinned [[GraftStoreTable]], rewritten
  * to the native pruned parquet scan when the extensions are
  * installed, V1Scan-delegated otherwise.
  */
class GraftSource extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def table(options: CaseInsensitiveStringMap): GraftStoreTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft source needs a store path: .load(\"/path/to/store\")"))
    val byVersion = Option(options.get("versionAsOf")).map(v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"versionAsOf takes a commit version number, got '$v'")))
    val byTime = Option(options.get("timestampAsOf")).map(t =>
      TableStore.versionAt(SparkSession.active, path,
        t.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"timestampAsOf takes epoch millis, got '$t'"))))
    require(byVersion.isEmpty || byTime.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    new GraftStoreTable(path, byVersion.orElse(byTime))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    table(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    table(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}
