package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry consistency: the driver's correctness gate compares
  * SparkEntry.queries against SparkEntry.oracleSql — every oracle must
  * point at a registered query, and any query WITHOUT an oracle (weaker
  * rows-only check) must be an explicit, documented exception. */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (no rows-only checks)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"undocumented rows-only queries: $rowsOnly")
  }

  test("query names are unique across modules (no silent toMap collisions)") {
    val all = Registry.contributedQueryNames
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }
}
