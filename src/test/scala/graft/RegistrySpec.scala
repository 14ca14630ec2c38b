package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the registry feeds three Maps keyed
  * by query name, so a duplicate name would silently shadow one
  * implementation (the driver would verify one body and never see the
  * other). Pure metadata checks — no Spark session needed. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across all packs") {
    val names = SparkEntry.queries.keys.toSeq
    // SparkEntry.queries is already a Map; recount from the packs
    val fromPacks = Seq(
      graft.queries.StarQueries, graft.queries.ValidateQueries,
      graft.queries.AggQueries, graft.queries.JoinQueries,
      graft.queries.WindowQueries, graft.queries.FuncQueries,
      graft.queries.UpsertQueries, graft.queries.DedupQueries,
      graft.queries.TextQueries, graft.queries.SimilarityQueries,
      graft.queries.CsvQueries, graft.queries.PartitionQueries,
      graft.queries.BinaryQueries, graft.queries.SkewQueries,
      graft.queries.SampleQueries, graft.queries.TemporalQueries,
      graft.queries.SketchQueries).flatMap(_.all.map(_.name))
    val dups = fromPacks.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(names.size == fromPacks.size,
      s"Map collapsed ${fromPacks.size - names.size} shadowed queries")
  }

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("bench set and prepares are subsets of the registry") {
    assert((SparkEntry.benchQueries.keySet -- SparkEntry.queries.keySet).isEmpty)
    assert((SparkEntry.benchPrepares.keySet -- SparkEntry.benchQueries.keySet).isEmpty)
  }
}
