package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank chain checks: a planted asymmetric graph whose expected
  * fixed-point ranks are recomputed by an independent driver-side Map
  * fold (same integer formula, different execution), plus structural
  * invariants on the real sf0.001 fixture graph — mass conservation
  * under floor loss, bipartite edge symmetry, and histogram closure.
  */
class GraphSpec extends SparkSpec {

  /** Driver-side reference: plain Scala maps, no Spark. */
  private def refPr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.map(_._1).toSet
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = nodes.map(_ -> Graph.Scale / n).toMap
    val base = 15L * Graph.Scale / (100L * n)
    for (_ <- 1 to iters) {
      pr = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> (base + 85L * es.map(e => pr(e._1) / outdeg(e._1)).sum / 100L)
      }
    }
    pr
  }

  // 1 -> {2,3}, 2 -> {3}, 3 -> {1,2}: every node has in- and out-edges,
  // degrees are NOT uniform, so the test discriminates contribution
  // weighting (a symmetric graph would pass even with outdeg ignored).
  private val planted: Seq[(Long, Long)] = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L, 3L -> 2L)

  test("planted-graph ranks equal the driver-side integer reference at every iteration") {
    import spark.implicits._
    val e = planted.toDF("src", "dst")
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val chain = Graph.chainOn(e, deg, 3L, Graph.Iters)
    assert(chain.size === Graph.Iters + 1)
    for (i <- 1 to Graph.Iters) {
      val got = chain(i).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === refPr(planted, i), s"iteration $i")
    }
  }

  test("planted-graph rank ordering follows link structure") {
    import spark.implicits._
    val e = planted.toDF("src", "dst")
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val last = Graph.chainOn(e, deg, 3L, Graph.Iters).last
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Node 3 has two in-edges incl. node 2's whole mass; node 1 only
    // half of node 3's. The asymmetry must show up in the ranks.
    assert(last(3L) > last(1L))
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("fixture graph: edge symmetry, mass conservation, histogram closure") {
    val e = Graph.edges(spark, sfDir)
    val cnt = e.count()
    assert(cnt % 2 === 0, "directed edge count must be even (undirected pairs)")
    // every (src,dst) has its reverse
    val asym = e.as("a").join(
      e.select(col("dst").as("src"), col("src").as("dst")).as("b"),
      Seq("src", "dst"), "left_anti").count()
    assert(asym === 0L, "edge set must be symmetric")

    val pr = Graph.pageRank(spark, sfDir)
    val agg = pr.agg(sum("pr"), count(lit(1))).collect().head
    val (mass, n) = (agg.getLong(0), agg.getLong(1))
    // floor losses only: at most 1 per division per node per round
    assert(mass <= Graph.Scale, s"mass $mass exceeds the scale")
    assert(mass >= Graph.Scale - Graph.Scale / 100, s"mass $mass lost >1%")

    val hist = Graph.degreeHist(spark, sfDir)
    val histNodes = hist.agg(sum("nodes")).collect().head.getLong(0)
    assert(histNodes === n, "histogram must cover every ranked node")
    assert(hist.select("side").distinct().count() === 2L)
  }

  /** Driver-side reference for [[Graph.trianglesOn]]: brute-force over
    * all vertex triples on a plain Scala edge set.
    */
  private def refTriangles(edges: Set[(Long, Long)]): (Long, Long, Long, Long) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(n => n ->
      edges.count(e => e._1 == n || e._2 == n).toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val has = (a: Long, b: Long) =>
      edges.contains((math.min(a, b), math.max(a, b)))
    val ns = nodes.toSeq.sorted
    val tris = (for {
      i <- ns.indices; j <- (i + 1) until ns.size; k <- (j + 1) until ns.size
      if has(ns(i), ns(j)) && has(ns(j), ns(k)) && has(ns(i), ns(k))
    } yield 1).size.toLong
    (nodes.size.toLong, edges.size.toLong, wedges, tris)
  }

  private def checkTriangles(edges: Set[(Long, Long)], tag: String): Unit = {
    import spark.implicits._
    val got = Graph.trianglesOn(edges.toSeq.toDF("u", "v")).collect() match {
      case Array(only) => (only.getAs[Long]("n_nodes"), only.getAs[Long]("n_edges"),
        only.getAs[Long]("n_wedges"), only.getAs[Long]("n_triangles"))
      case other => fail(s"$tag: expected one row, got ${other.length}")
    }
    assert(got === refTriangles(edges), tag)
  }

  test("triangle count equals brute force on planted and random graphs") {
    // the K4 clique: 4 triangles, every degree equal (orientation falls
    // back to the id tiebreak throughout)
    checkTriangles((for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toSet, "K4")
    // a star plus one closing edge: hub degree 5, exactly 1 triangle —
    // the degree-ordered orientation must point INTO the hub
    checkTriangles(
      (1L to 5L).map(i => (i, 10L)).toSet + ((1L, 2L)), "star+edge")
    // a triangle-free path
    checkTriangles(Set((1L, 2L), (2L, 3L), (3L, 4L)), "path")
    // random graphs, seeded
    val rnd = new scala.util.Random(13)
    for (t <- 1 to 3) {
      val edges = (for {
        a <- 1L to 12L; b <- (a + 1) to 12L
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toSet
      checkTriangles(edges, s"random-$t")
    }
  }

  test("fixture dup-graph triangles equal a driver recompute over the gated pair relation") {
    val pairs = graft.operators.Dedup.minhashLshPairs(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty, "no near-dup pairs at sf0.001")
    val want = refTriangles(pairs)
    val got = Graph.dupTriangles(spark, sfDir).collect() match {
      case Array(only) => (only.getAs[Long]("n_nodes"), only.getAs[Long]("n_edges"),
        only.getAs[Long]("n_wedges"), only.getAs[Long]("n_triangles"))
      case other => fail(s"expected one row, got ${other.length}")
    }
    assert(got === want)
    // every triangle closes 3 wedges, so 3·T ≤ wedges always
    assert(3 * got._4 <= got._3)
  }

  test("simhash triangle arm: bound column equals the driver-recomputed " +
      "max oriented out-degree and respects the arboricity line") {
    val pairs = graft.operators.Dedup.simhashPairs(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty, "no simhash pairs at sf0.001")
    val want = refTriangles(pairs)
    // driver-side orientation: same (degree, id) order as the operator
    val nodes = pairs.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(n => n ->
      pairs.count(e => e._1 == n || e._2 == n).toLong).toMap
    val maxOdeg = pairs.toSeq
      .map { case (u, v) =>
        if (deg(u) < deg(v) || (deg(u) == deg(v) && u < v)) u else v }
      .groupBy(x => x).values.map(_.length.toLong).max
    val got = Graph.dupTrianglesSimhash(spark, sfDir).collect() match {
      case Array(only) => (only.getAs[Long]("n_nodes"), only.getAs[Long]("n_edges"),
        only.getAs[Long]("n_wedges"), only.getAs[Long]("n_triangles"),
        only.getAs[Long]("max_oriented_outdeg"))
      case other => fail(s"expected one row, got ${other.length}")
    }
    assert((got._1, got._2, got._3, got._4) === want)
    assert(got._5 === maxOdeg)
    // the orientation's whole point: per-node oriented out-degree stays
    // under the √(2·|E|) arboricity line
    assert(got._5 * got._5 <= 2 * got._2)
  }

  test("fixture graph: convergence stats are consistent with the chain") {
    val conv = Graph.pageRankConverge(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(conv.map(_._1).toSeq === (1 to Graph.Iters).map(_.toLong))
    val n = Graph.degrees(spark, sfDir).count()
    conv.foreach { case (it, l1, moved) =>
      assert(l1 >= 0L, s"it=$it")
      assert(moved >= 0L && moved <= n, s"it=$it moved=$moved n=$n")
    }
    // iteration 1 must move mass: r0 is uniform, the graph is not
    assert(conv.head._2 > 0L)
  }
}
