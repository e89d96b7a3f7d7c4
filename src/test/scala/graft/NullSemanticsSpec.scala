package graft

import graft.operators.NullSemantics

/** Hand-computed NULL-semantics expectations on a six-row fixture: every
  * branch (NULL-key group, all-NULL value group, NULL join key, unmatched
  * non-NULL join key, DISTINCT NULL collapse) is hit by at least one row,
  * and the expected outputs are worked out by hand in the comments — the
  * spec is an independent oracle, not an echo of either engine.
  */
class NullSemanticsSpec extends SparkSpec {

  // k = nullif(user_id % 50, 3), v = nullif(floor(value), 2):
  //   e1 user 3  value 1.0 -> (null, 1)
  //   e2 user 53 value 2.0 -> (null, null)
  //   e3 user 10 value 2.9 -> (10, null)
  //   e4 user 10 value 5.0 -> (10, 5)
  //   e5 user 60 value 7.0 -> (10, 7)
  //   e6 user 45 value 3.0 -> (45, 3)
  //   e7 user 20 value 2.0 -> (20, null)
  private lazy val dir: String = {
    val d = writeFixture(events = Seq(
      event(1, 1000L, 3, "a", 1.0),
      event(2, 2000L, 53, "a", 2.0),
      event(3, 3000L, 10, "a", 2.9),
      event(4, 4000L, 10, "a", 5.0),
      event(5, 5000L, 60, "a", 7.0),
      event(6, 6000L, 45, "a", 3.0),
      event(7, 7000L, 20, "a", 2.0)))
    // Customer spine: custkeys {10, 60, 20} -> k groups 10 (n_cust 2),
    // 20 (n_cust 1); k = 45 has no spine row.
    val s = spark
    import s.implicits._
    Seq(10L, 60L, 20L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    d
  }

  test("aggregates skip NULL inputs and NULL keys form one group") {
    assert(rows(NullSemantics.nullAgg(spark, dir)) === Set(
      Seq(-1L, 2L, 1L, 1L, 1L, 1L, 1L),   // e1+e2: one non-null v
      Seq(10L, 3L, 2L, 12L, 5L, 7L, 2L),  // e3+e4+e5
      Seq(45L, 1L, 1L, 3L, 3L, 3L, 1L),   // e6
      Seq(20L, 1L, 0L, -1L, -1L, -1L, 0L) // e7: all-NULL v group
    ))
  }

  test("NULL join keys match nothing; non-NULL unmatched keys null-pad") {
    assert(rows(NullSemantics.nullJoin(spark, dir)) === Set(
      // 7 left rows, 5 non-null keys, 4 matched (3×k=10 + 1×k=20),
      // 1 unmatched non-null (k=45), matched n_cust sum = 3*2 + 1 = 7.
      Seq(7L, 5L, 4L, 1L, 7L)))
  }

  test("DISTINCT collapses NULLs to one value per position") {
    assert(rows(NullSemantics.nullDistinct(spark, dir)) === Set(
      Seq(-1L, 1L), Seq(-1L, -1L), Seq(10L, -1L), Seq(10L, 5L),
      Seq(10L, 7L), Seq(45L, 3L), Seq(20L, -1L)))
  }

  test("null-safe equality matches NULL keys where plain equality drops them") {
    // Distinct keys on the fixture: {null, 10, 45, 20}. Plain = self-join
    // pairs only the 3 non-null keys (3 rows); <=> also pairs null with
    // null (4 rows).
    assert(rows(NullSemantics.nullSafeEq(spark, dir)) === Set(Seq(3L, 4L)))
  }

  test("every null-semantics query is gated (queries + oracle SQL)") {
    NullSemantics.queries.keys.foreach { n =>
      assert(SparkEntry.queries.contains(n))
      assert(SparkEntry.oracleSql.contains(n))
    }
  }
}
