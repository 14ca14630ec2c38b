package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the registry feeds three Maps keyed
  * by query name, so a duplicate name would silently shadow one
  * implementation (the driver would verify one body and never see the
  * other). Pure metadata checks — no Spark session needed. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across all packs") {
    // recount from the registry Seq itself (the pre-Map source), so a
    // duplicate name in ANY pack — current or future — is caught
    val fromPacks = SparkEntry.registry.map(_.name)
    val dups = fromPacks.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == fromPacks.size,
      s"Map collapsed ${fromPacks.size - SparkEntry.queries.size} shadowed queries")
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
