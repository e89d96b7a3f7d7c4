package graft

import graft.operators.{Retrieval, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Ranked-retrieval checks: the BM25 top-k and the RRF fusion are both
  * rebuilt in plain Scala over the sf0.001 fixture — the integer
  * closed-form scoring (rational idf, k1=6/5 / b=3/4 tf normalization)
  * recomputed from raw text, and the fusion recomputed from the two
  * ranker outputs — then compared as full row sets.
  */
class RetrievalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val P = graft.functions.Parity.P

  private def tok31(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % P)

  // (doc_id -> (token_hash -> tf)), exactly the engine's tokenization
  private lazy val tfByDoc: Map[Long, Map[Long, Long]] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map { r =>
        val hs = r.getString(1).split(" ", -1).map(tok31)
        r.getLong(0) -> hs.groupBy(identity).map { case (h, v) => h -> v.length.toLong }
      }.toMap

  private def topK[A](rows: Seq[(Long, Long, A)], scoreOf: A => Long)
      : Set[(Long, Long, Long, A)] =
    rows.groupBy(_._1).flatMap { case (q, cands) =>
      cands.sortBy { case (_, nid, s) => (-scoreOf(s), nid) }
        .take(Similarity.TopK.toInt).zipWithIndex
        .map { case ((_, nid, s), i) => (q, nid, i + 1L, s) }
    }.toSet

  test("BM25 top-k equals the integer closed form recomputed from raw text") {
    val n = tfByDoc.size.toLong
    val dl = tfByDoc.map { case (d, m) => d -> m.values.sum }
    val t = dl.values.sum
    val df = tfByDoc.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (h, v) => h -> v.length.toLong }
    val scored = for {
      q <- tfByDoc.keys.toSeq if q < Similarity.NumQueries
      (c, ctf) <- tfByDoc.toSeq if c != q
      shared = tfByDoc(q).keySet.intersect(ctf.keySet) if shared.nonEmpty
    } yield {
      val score = shared.toSeq.map { h =>
        val idfS = (n - df(h) + 1) * Retrieval.IdfScale / (df(h) + 1)
        val tfn = (44 * t * ctf(h) * Retrieval.TfScale) /
          (20 * t * ctf(h) + 6 * t + 18 * dl(c) * n)
        idfS * tfn
      }.sum
      (q, c, score)
    }
    val want = topK[Long](scored, identity)
      .map { case (q, nid, r, s) => (q, nid, r, s) }
    val got = Retrieval.bm25TopK(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rnk").toLong, r.getAs[Long]("score"))
    }.toSet
    assert(got.nonEmpty && got === want)
    // every query doc present in the corpus produced a full k-list
    // (31-token vocab: every candidate shares terms with every query)
    assert(got.size === Similarity.NumQueries * Similarity.TopK)
  }

  test("df-capped BM25 equals the closed form over the surviving vocabulary") {
    val n = tfByDoc.size.toLong
    val dl = tfByDoc.map { case (d, m) => d -> m.values.sum }
    val t = dl.values.sum
    val df = tfByDoc.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (h, v) => h -> v.length.toLong }
    val kept = df.filter { case (_, d) => 2 * d <= n }.keySet
    // the cap must BITE on this fixture (it prunes the ~30 stopword
    // terms and keeps the rare ones) — otherwise the twin tests nothing
    assert(kept.nonEmpty && kept.size < df.size)
    val scored = for {
      q <- tfByDoc.keys.toSeq if q < Retrieval.NumQueriesCapped
      qTerms = tfByDoc(q).keySet.intersect(kept) if qTerms.nonEmpty
      (c, ctf) <- tfByDoc.toSeq if c != q
      shared = qTerms.intersect(ctf.keySet) if shared.nonEmpty
    } yield {
      val score = shared.toSeq.map { h =>
        val idfS = (n - df(h) + 1) * Retrieval.IdfScale / (df(h) + 1)
        val tfn = (44 * t * ctf(h) * Retrieval.TfScale) /
          (20 * t * ctf(h) + 6 * t + 18 * dl(c) * n)
        idfS * tfn
      }.sum
      (q, c, score)
    }
    val want = topK[Long](scored, identity)
    val got = Retrieval.bm25TopKCapped(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rnk").toLong, r.getAs[Long]("score"))
    }.toSet
    assert(got.nonEmpty && got === want)
    // probe-volume contract: candidates can only be docs sharing a
    // SURVIVING term with the query — i.e. Σ_kept df(t) bounds the join,
    // not Σ_all (every doc shares stopwords with every query)
    val rareDocs = tfByDoc.collect {
      case (d, m) if m.keySet.exists(kept) => d
    }.toSet
    assert(got.forall { case (q, c, _, _) => rareDocs(q) && rareDocs(c) })
  }

  test("RRF fusion equals the recompute from the two ranker outputs") {
    val bm = Retrieval.bm25TopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rnk").toLong).toMap
    val cs = TextAnalysis.textCosineTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rnk").toLong).toMap
    def part(rnk: Option[Long]): Long =
      rnk.map(r => Retrieval.RrfScale / (Retrieval.RrfK + r)).getOrElse(0L)
    val fusedRows = (bm.keySet ++ cs.keySet).toSeq.map { k =>
      (k._1, k._2, (part(bm.get(k)) + part(cs.get(k)),
        bm.getOrElse(k, 0L), cs.getOrElse(k, 0L)))
    }
    val want = topK[(Long, Long, Long)](fusedRows, _._1)
    val got = Retrieval.hybridRrfTopK(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rnk").toLong,
        (r.getAs[Long]("rrf_score"), r.getAs[Long]("bm25_rnk"),
          r.getAs[Long]("cos_rnk")))
    }.toSet
    assert(got.nonEmpty && got === want)
    // fusion must actually fuse: at least one fused winner carries
    // nonzero ranks from BOTH rankers on this fixture
    assert(got.exists { case (_, _, _, (_, br, cr)) => br > 0 && cr > 0 })
  }
}
