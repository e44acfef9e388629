package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the driver-contract surface so documentation can't drift from the
  * code (round-7 verdict: README claimed 111 queries when the suite had
  * 116 — the count is now DERIVED here, and a mismatch fails `sbt test`).
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle, every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert(q.subsetOf(o), s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("query names are unique qNN_ prefixed (Bench's compact 'm' key relies on it)") {
    val names = SparkEntry.queries.keySet.toSeq
    names.foreach(n => assert(n.matches("q\\d+_\\w+"), s"bad query name: $n"))
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      "duplicate qNN prefixes would collide in Bench's compact median dict")
  }

  test("README's query counts match the code") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = "(\\d+) queries, (\\d+) DuckDB-oracle-checked".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README.md no longer states the query counts"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} queries but SparkEntry has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracle-checked but SparkEntry has ${SparkEntry.oracleSql.size}")
  }
}
