package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Catalog

/** The driver contract (SparkEntry ↔ Catalog) is load-bearing wiring: the
  * grading driver hash-compares exactly the names these maps expose, so a
  * drift between queries and oracleSql — or a malformed name the
  * SPARK_GRAFT_ONLY prefix matcher cannot select — silently weakens the
  * correctness gate. Pin the invariants.
  */
class ContractSpec extends AnyFunSuite {

  test("every catalog entry is exposed through SparkEntry with an oracle, " +
      "and names are well-formed qNN_slug identifiers") {
    val names = Catalog.all.map(_.name)
    assert(names.nonEmpty)
    val malformed = names.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(malformed.isEmpty, s"malformed query names: $malformed")
    assert(SparkEntry.queries.keySet == names.toSet)
    // the uniform matrix: EVERY query carries a DuckDB oracle
    assert(SparkEntry.oracleSql.keySet == names.toSet)
  }

  test("qNN prefixes are unique — the SPARK_GRAFT_ONLY prefix selector " +
      "must never match two queries") {
    val prefixes = Catalog.all.map(_.name.split("_")(0))
    val dups = prefixes.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate qNN prefixes: ${dups.mkString(",")}")
  }

  test("the ONLY selector matches by exact token or exact qNN prefix, " +
      "never by substring") {
    assert(SparkEntry.selected(None, "q70_simhash_neardup"))
    assert(SparkEntry.selected(Some(Set("q70")), "q70_simhash_neardup"))
    assert(SparkEntry.selected(Some(Set("q70_simhash_neardup")), "q70_simhash_neardup"))
    assert(!SparkEntry.selected(Some(Set("q7")), "q70_simhash_neardup"))
    assert(!SparkEntry.selected(Some(Set("q70_simhash")), "q70_simhash_neardup"))
  }
}
