package graft

import graft.operators.TextAnalysis

/** Sufficient-statistics regression: planted per-source point sets whose
  * moments and closed-form fit are recomputed independently driver-side
  * (exact integers; the double finish repeats the same IEEE expression,
  * so equality is bitwise).
  */
class RegressionSpec extends SparkSpec {

  test("vocab drift: planted snapshots give hand-computed shares and drift") {
    // even doc 0 -> snapshot A: tokens a,a,b (tot 3); odd doc 1 ->
    // snapshot B: a,c (tot 2). Integer div: 2e6 div 3 = 666666.
    val dir = writeFixture(documents = Seq(doc(0, "a a b"), doc(1, "a c")))
    val got = TextAnalysis.vocabDrift(spark, dir).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("share_a_ppm"), r.getAs[Long]("share_b_ppm"),
          r.getAs[Long]("drift_ppm"))).toMap
    assert(got === Map(
      "a" -> ((2L, 1L, 666666L, 500000L, 166666L)),
      "b" -> ((1L, 0L, 333333L, 0L, 333333L)),
      "c" -> ((0L, 1L, 0L, 500000L, 500000L))))
  }

  test("vocab drift: one-parity snapshot gives zero shares, not a division error") {
    // all-even doc_ids -> snapshot B is empty (day-1 bootstrap): tot_b=0
    // must yield share 0, not an ANSI DIVIDE_BY_ZERO
    val dir = writeFixture(documents = Seq(doc(0, "a b"), doc(2, "a")))
    val got = TextAnalysis.vocabDrift(spark, dir).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("share_a_ppm"), r.getAs[Long]("share_b_ppm"),
          r.getAs[Long]("drift_ppm"))).toMap
    assert(got === Map(
      "a" -> ((2L, 0L, 666666L, 0L, 666666L)),
      "b" -> ((1L, 0L, 333333L, 0L, 333333L))))
  }

  test("vocab drift on the fixture equals the driver-side recomputation") {
    val sfDir = "/root/testdata/sf0.001"
    val toks = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getLong(0) % 2 == 0, _)))
    val byTok = toks.groupBy(_._2).map { case (t, v) =>
      t -> (v.count(_._1).toLong, v.count(!_._1).toLong)
    }
    val (totA, totB) = (byTok.values.map(_._1).sum, byTok.values.map(_._2).sum)
    val want = byTok.map { case (t, (a, b)) =>
      val (sa, sb) = (a * 1000000L / totA, b * 1000000L / totB)
      t -> ((a, b, sa, sb, math.abs(sa - sb)))
    }
    val got = TextAnalysis.vocabDrift(spark, sfDir).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("share_a_ppm"), r.getAs[Long]("share_b_ppm"),
          r.getAs[Long]("drift_ppm"))).toMap
    assert(got.nonEmpty && got === want)
  }

  test("two-point source fits the exact interpolating line") {
    // srcA: (x=3,y=2), (x=7,y=4) -> slope 1/2, intercept 1/2, corr 1
    val dir = writeFixture(documents = Seq(
      doc(1, "a b", source = "srcA"),        // 3 chars, 2 tokens
      doc(2, "a b c d", source = "srcA")))   // 7 chars, 4 tokens
    val r = TextAnalysis.tokenCharFit(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("source") === "srcA")
    assert((row.getAs[Long]("n"), row.getAs[Long]("sx"), row.getAs[Long]("sy")) === ((2L, 10L, 6L)))
    assert((row.getAs[Long]("sxx"), row.getAs[Long]("sxy"), row.getAs[Long]("syy")) === ((58L, 34L, 20L)))
    assert(row.getAs[Double]("slope") === 0.5)
    assert(row.getAs[Double]("intercept") === 0.5)
    assert(row.getAs[Double]("corr") === 1.0)
  }

  test("multi-source fit equals the driver-side recomputation bit-for-bit") {
    val docs = Seq(
      doc(1, "a b", source = "s1"), doc(2, "a b c d", source = "s1"),
      doc(3, "x", source = "s2"), doc(4, "x y", source = "s2"),
      doc(5, "x y z", source = "s2"), doc(6, "longer words here", source = "s2"))
    val dir = writeFixture(documents = docs)
    val got = TextAnalysis.tokenCharFit(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("corr"))).toMap

    val want = docs.groupBy(_.source).map { case (src, ds) =>
      val pts = ds.map(d => (d.n_chars, d.text.split(" ", -1).length.toLong))
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      val corr = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
      src -> ((slope, intercept, corr))
    }
    assert(got === want)
  }
}
