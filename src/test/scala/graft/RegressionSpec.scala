package graft

import graft.operators.TextAnalysis

/** Sufficient-statistics regression: planted per-source point sets whose
  * moments and closed-form fit are recomputed independently driver-side
  * (exact integers; the double finish repeats the same IEEE expression,
  * so equality is bitwise).
  */
class RegressionSpec extends SparkSpec {

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
