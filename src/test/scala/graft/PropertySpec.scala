package graft

import graft.operators.RefQueries

/** Property tests (SURVEY.md §5.3): results must be independent of input
  * order and linear under amplification, and the count-product must equal
  * the true join cardinality on arbitrary multisets. Inputs are seeded
  * pseudo-random multisets (5 trials per property).
  */
class PropertySpec extends SparkSpec {

  private def genEvents(seed: Int): List[(Int, Int, String)] = {
    val rnd = new scala.util.Random(seed)
    List.fill(60)((rnd.nextInt(3000), rnd.nextInt(9), "ABCD" (rnd.nextInt(4)).toString))
  }

  private def mkDir(evs: List[(Int, Int, String)]): String =
    writeFixture(events = evs.zipWithIndex.map { case ((ts, u, w), i) =>
      event(i.toLong, ts.toLong, u.toLong, w)
    })

  test("windowed count is input-order independent") {
    for (seed <- 1 to 5) {
      val evs = genEvents(seed)
      val a = rows(RefQueries.q3WindowedCount(spark, mkDir(evs)))
      val b = rows(RefQueries.q3WindowedCount(spark, mkDir(evs.reverse)))
      assert(a === b, s"seed $seed")
    }
  }

  test("count-product equals true 3-way join cardinality on random multisets") {
    for (seed <- 6 to 10) {
      val dir = mkDir(genEvents(seed))
      val pw = Shapes.portWordEvents(spark, dir)
      val byPort = (p: Int) => pw.where(s"port = $p").select("word")
      val trueJoin = byPort(0).join(byPort(1), "word").join(byPort(2), "word")
        .groupBy("word").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val product = RefQueries.q4StarCardinality(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // product carries explicit zeros; the join omits empty groups.
      assert(product.filter(_._2 > 0) === trueJoin, s"seed $seed")
    }
  }

  test("amplification scales counts linearly") {
    for (seed <- 11 to 15) {
      val dir = mkDir(genEvents(seed))
      val plain = RefQueries.q3WindowedCount(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val amped = RefQueries.qAmplify(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(amped === plain.view.mapValues(_ * RefQueries.DuplicateRate).toMap,
        s"seed $seed")
    }
  }
}
