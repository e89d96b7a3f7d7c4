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
    val families = Set("q", "a", "d", "s", "t", "p", "m", "n", "g")
    val bad = SparkEntry.queries.keySet.filterNot(n =>
      families.contains(n.takeWhile(_ != '_').filterNot(_.isDigit)))
    assert(bad.isEmpty, s"unexpected family prefix: $bad")
  }

  test("check_scale trust-DAG selftest rejects planted cycle + dangling ref") {
    // The negative control for the scale-oracle trust chain: the checker
    // itself must reject a cyclic pair of bounded checks and a reference
    // to a query not verified in the same run (ScaleOracles scaladoc).
    import scala.sys.process._
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/check_scale.py", "--selftest"),
      new java.io.File("/root/repo"))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code === 0, s"selftest failed:\n$out")
    assert(out.toString.contains("selftest OK"))
  }

  test("the live ScaleOracles check set passes its own trust-DAG gate") {
    // The real bounded checks must be acyclic and reference only gated
    // queries — the property the runtime gate enforces, pinned at build
    // time so a bad check fails CI before it fails a scale pass.
    val refs = graft.operators.ScaleOracles.checks.map { case (name, c) =>
      name -> ("\\bout_([a-z0-9_]+)".r
        .findAllMatchIn(c.sql + " " + c.aux).map(_.group(1)).toSet - name)
    }
    val gated = SparkEntry.queries.keySet
    refs.foreach { case (name, rs) =>
      assert(rs.subsetOf(gated), s"$name references non-gated: ${rs diff gated}")
    }
    // Kahn over the bounded-check subgraph.
    var sub = refs.map { case (n, rs) => n -> rs.intersect(refs.keySet) }
    var progressed = true
    while (progressed && sub.nonEmpty) {
      val ready = sub.collect { case (n, rs) if rs.isEmpty => n }.toSet
      progressed = ready.nonEmpty
      sub = sub.collect { case (n, rs) if !ready.contains(n) => n -> (rs diff ready) }
    }
    assert(sub.isEmpty, s"trust cycle among bounded checks: ${sub.keys}")
  }
}
