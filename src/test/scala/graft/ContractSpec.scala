package graft

/** The driver contract itself: every gated query must carry an oracle,
  * and the flagship entry must return rows — the exact checks the driver
  * harness performs, pinned here so drift fails fast in CI instead of in
  * the round gate.
  */
class ContractSpec extends SparkSpec {

  test("every SparkEntry query has a matching oracle entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o,
      s"queries without oracle: ${q diff o}; oracles without query: ${o diff q}")
  }

  test("flagship entry returns rows on the smallest fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names follow the family naming scheme") {
    val families = Set("q", "a", "d", "s", "t", "p", "m")
    val bad = SparkEntry.queries.keySet.filterNot(n =>
      families.contains(n.takeWhile(_ != '_').filterNot(_.isDigit)))
    assert(bad.isEmpty, s"unexpected family prefix: $bad")
  }
}
