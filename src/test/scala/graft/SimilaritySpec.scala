package graft

import graft.functions.VectorOps
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("LongVectorDot matches a hand-computed dot product (eval + codegen)") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    // Codegen path (projection) and interpreted path (filter on eval).
    assert(df.select(VectorOps.longDot(col("a"), col("b"))).head().getLong(0) === 32L)
    assert(df.where(VectorOps.longDot(col("a"), col("b")) === 32L).count() === 1L)
  }

  test("LongVectorDot is null-safe and dots over the common prefix") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Array(1L, 2L)), Some(Array(3L, 4L, 5L))),
      (None: Option[Array[Long]], Some(Array(1L)))).toDF("a", "b")
    val got = df.select(VectorOps.longDot(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) === 11L)
    assert(got(1).isNullAt(0))
  }

  test("brute-force top-k ranks the aligned vector first, ties broken by id") {
    // q (vec 0) is aligned with vec 1, orthogonal to vec 2, opposed to 3.
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, Array(1f, 0f, 0f, 0f), 0),
      EmbRow(1, Array(0.9f, 0.1f, 0f, 0f), 0),
      EmbRow(2, Array(0f, 1f, 0f, 0f), 1),
      EmbRow(3, Array(-1f, 0f, 0f, 0f), 1)))
    val got = Similarity.cosineTopK(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
      .map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("identical vectors land in the same LSH bucket; top-k finds them") {
    val v = Array.tabulate(16)(i => (i % 5 - 2) * 0.2f)
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, v, 0), EmbRow(1, v.clone(), 0),
      EmbRow(2, v.map(-_), 1)))
    val buckets = Similarity.lshBucketStats(spark, dir).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("n_vectors")).toMap
    assert(buckets.values.sum === 3L)
    val topk = Similarity.lshTopK(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(topk.contains(1L))
  }

  test("hard negatives: label-matched twins are excluded, mismatched twin ranks first") {
    // vec 1 is an identical copy of query 0 with the SAME label (a
    // positive — must never appear as a negative); vec 2 is the same
    // vector under a DIFFERENT label (the hardest possible negative —
    // must rank first); vec 3 is a weaker different-label neighbor.
    val v = Array.tabulate(16)(i => (i % 5 - 2) * 0.2f)
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, v, 0), EmbRow(1, v.clone(), 0),
      EmbRow(2, v.clone(), 1),
      EmbRow(3, v.map(x => x * 0.5f + 0.01f), 1)))
    val got = Similarity.hardNegatives(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("neighbor_label")))
    assert(!got.map(_._1).contains(1L))
    assert(got.head === ((2L, 1)))
    assert(got.forall(_._2 == 1))
  }

  test("kNN classify: majority vote over exact neighbors, asc-label tiebreak") {
    // Query 0 (label 0) has five neighbors voting 3×label-1 vs 2×label-0
    // → predicted 1, counted incorrect.
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, Array(1f, 0f, 0f, 0f), 0),
      EmbRow(1, Array(0.9f, 0.1f, 0f, 0f), 1),
      EmbRow(2, Array(0.8f, 0.2f, 0f, 0f), 1),
      EmbRow(3, Array(0.7f, 0.3f, 0f, 0f), 1),
      EmbRow(4, Array(0.6f, 0.4f, 0f, 0f), 0),
      EmbRow(5, Array(0.5f, 0.5f, 0f, 0f), 0)))
    val got = Similarity.knnClassify(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("true_label"), r.getAs[Long]("pred_label"),
          r.getAs[Long]("votes"), r.getAs[Long]("correct")))).toMap
    assert(got(0L) === ((0L, 1L, 3L, 0L)))
    // A 2-2 tie (4 neighbors in a 5-vector corpus) resolves to the
    // SMALLEST label deterministically.
    val tieDir = writeFixture(embeddings = Seq(
      EmbRow(0, Array(1f, 0f, 0f, 0f), 0),
      EmbRow(1, Array(0.9f, 0.1f, 0f, 0f), 1),
      EmbRow(2, Array(0.8f, 0.2f, 0f, 0f), 1),
      EmbRow(3, Array(0.7f, 0.3f, 0f, 0f), 0),
      EmbRow(4, Array(0.6f, 0.4f, 0f, 0f), 0)))
    val tie = Similarity.knnClassify(spark, tieDir).collect()
      .filter(_.getAs[Long]("query_id") == 0L).head
    assert(tie.getAs[Long]("pred_label") === 0L)
    assert(tie.getAs[Long]("votes") === 2L)
    assert(tie.getAs[Long]("correct") === 1L)
  }

  test("kNN agreement: identical vectors make LSH and exact votes agree everywhere") {
    // All vectors share one direction → one LSH bucket → the multiprobe
    // candidate set equals the exact candidate set; tie-ranking (by
    // neighbor_id) is shared, so every query's vote must agree.
    val v = Array.tabulate(16)(i => (i % 5 - 2) * 0.2f)
    val dir = writeFixture(embeddings = Seq(0, 1, 1, 0, 1, 0).zipWithIndex.map {
      case (lbl, i) => EmbRow(i.toLong, v.clone(), lbl)
    })
    val got = Similarity.knnAgreement(spark, dir).head()
    assert(got.getAs[Long]("n_queries") === 6L)
    assert(got.getAs[Long]("n_agree") === 6L)
  }

  test("multi-cell IVF probing never loses recall vs single-cell (both variants)") {
    // Cells partition the corpus and the nprobe nearest-cell list is a
    // prefix ordering, so nprobe=3 candidates strictly contain nprobe=1
    // candidates — recall vs brute force is monotone in nprobe. Measured
    // on the real sf0.001 embeddings (the relation s_ivf_recall gates).
    val sfDir = "/root/testdata/sf0.001"
    def hits(approx: org.apache.spark.sql.DataFrame): Long =
      Similarity.cosineTopK(spark, sfDir).select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
        .count()
    val s1 = hits(Similarity.ivfTopKNprobe(spark, sfDir, 1))
    val s3 = hits(Similarity.ivfTopKNprobe(spark, sfDir, 3))
    val k1 = hits(Similarity.ivfKmeansTopKNprobe(spark, sfDir, 1))
    val k3 = hits(Similarity.ivfKmeansTopKNprobe(spark, sfDir, 3))
    info(s"static-label IVF hits: nprobe=1 $s1, nprobe=3 $s3")
    info(s"kmeans IVF hits: nprobe=1 $k1, nprobe=3 $k3")
    assert(s3 >= s1)
    assert(k3 >= k1)
  }

  test("PQ codes: one code per subspace, identical vectors encode identically") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val base = (0 until 9).map(i => EmbRow(i.toLong, vec(), 0))
    // vec 9 duplicates vec 1 — same subvectors ⇒ same nearest codeword
    // in every subspace (deterministic tiebreak included).
    val dir = writeFixture(embeddings = base :+ EmbRow(9L, base(1).embedding.clone(), 0))
    val codes = Similarity.pqCodes(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m")) -> r.getAs[Long]("code"))
      .toMap
    assert(codes.size === 10 * Similarity.PqM)
    (0 until Similarity.PqM).foreach { m =>
      assert(codes((9L, m)) === codes((1L, m)), s"subspace $m")
    }
    // Every code addresses a real codeword: 0 <= code < PqK.
    assert(codes.values.forall(c => c >= 0L && c < Similarity.PqK))
  }

  test("PQ re-rank dominates raw ADC per query (live data)") {
    // Theorem (see Similarity scaladoc): ADC's top-k is inside the
    // shortlist and fewer than k vectors are exact-closer than any
    // global exact-top-k member, so per query hits_rerank >= hits_adc.
    val rows = Similarity.pqRecall(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === Similarity.NumQueries)
    rows.foreach { r =>
      assert(r.getAs[Long]("hits_rerank") >= r.getAs[Long]("hits_adc"),
        s"query ${r.getAs[Long]("query_id")}")
    }
    // And the compression is not free: on structure-free random
    // embeddings raw ADC misses most exact neighbors (the documented
    // 0.13-vs-0.48 gap) — re-rank must add strictly positive recall.
    val (adc, rr) = (rows.map(_.getAs[Long]("hits_adc")).sum,
      rows.map(_.getAs[Long]("hits_rerank")).sum)
    assert(rr > adc)
  }

  test("IVF-PQ neighbors all live in the query's probed cells (live data)") {
    val sfDir = "/root/testdata/sf0.001"
    val cells = Similarity.kmeansTrain(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val got = Similarity.ivfPqTopK(spark, sfDir).collect()
    assert(got.nonEmpty)
    // Build each query's probed cell set exactly as the operator does:
    // its own cell is always the nearest (dist2 arithmetic identity), so
    // at minimum the query's own cell is probed — every returned
    // neighbor must then be assigned to one of at most NProbe cells,
    // and the ranks are dense 1..k' per query.
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val usedCells = rows.map(r => cells(r.getAs[Long]("neighbor_id"))).toSet
      assert(usedCells.size <= Similarity.NProbe, s"query $q cells $usedCells")
      val rnks = rows.map(_.getAs[Int]("rnk")).sorted.toSeq
      assert(rnks === (1 to rows.length), s"query $q ranks $rnks")
    }
  }

  test("k-means training matches a driver-side Lloyd run on the same integers") {
    import graft.functions.Parity
    // 32 vectors in 4 well-separated 64-dim groups (plus jitter), so the
    // second iteration genuinely moves centroids; seeds are vec 0..7 —
    // two seeds per group, which forces at least one cluster to lose all
    // its points (the empty-cluster-drops contract) on this geometry.
    val dim = Parity.EmbeddingDim
    val n = 32
    val vecs = (0 until n).map { i =>
      val group = i % 4
      Array.tabulate(dim) { d =>
        val base = if (d / (dim / 4) == group) 1.0f else 0.0f
        base + ((i * 31 + d * 7) % 11 - 5) * 0.01f
      }
    }
    val dir = writeFixture(embeddings =
      (0 until n).map(i => EmbRow(i.toLong, vecs(i), 0)))
    // Independent driver-side Lloyd over the SAME quantized integers.
    val q: Map[Long, Array[Long]] = vecs.zipWithIndex.map { case (v, i) =>
      i.toLong -> v.map(x => math.floor(x.toDouble * Parity.QScale).toLong)
    }.toMap
    def dist2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      q.map { case (id, v) =>
        val (d, cid) = cents.map { case (c, cv) => (dist2(v, cv), c) }.min
        id -> (cid, d)
      }
    val seeds = (0L until Similarity.KmeansK).map(c => c -> q(c))
    val a1 = assign(seeds)
    val cents1 = a1.groupBy(_._2._1).toSeq.map { case (cid, members) =>
      val vs = members.keys.toSeq.map(q)
      val cnt = vs.size.toLong
      cid -> Array.tabulate(dim) { d =>
        val s = vs.map(_(d)).sum
        (s - ((s % cnt) + cnt) % cnt) / cnt
      }
    }
    val want = assign(cents1).map { case (id, (cid, d)) => Seq[Any](id, cid, d) }.toSet
    assert(rows(Similarity.kmeansTrain(spark, dir)) === want)

    // IVF search over the trained cells: every reported neighbor lies in
    // one of the query's NProbe nearest cells (by the same exact integer
    // centroid distance, ties to the lower cid), and the ranking is the
    // exact cosine order across those cells' members.
    val clusters = assign(cents1).map { case (id, (cid, _)) => id -> cid }
    def probeCells(id: Long): Set[Long] =
      cents1.map { case (cid, cv) => (dist2(q(id), cv), cid) }
        .sorted.take(Similarity.NProbe).map(_._2).toSet
    val got = Similarity.ivfKmeansTopK(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(probeCells(r.getAs[Long]("query_id"))
        .contains(clusters(r.getAs[Long]("neighbor_id"))))
    }
    // rnk=1 for query 0 must be its nearest in-cell neighbor by cosine
    // (exact doubles from integer dots — recompute driver-side).
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(dist2(a, Array.fill(a.length)(0L)).toDouble) *
        math.sqrt(dist2(b, Array.fill(b.length)(0L)).toDouble))
    }
    val q0Cells = probeCells(0L)
    val wantTop = clusters.collect { case (id, c) if q0Cells.contains(c) && id != 0L => id }
      .map(id => (-cos(q(0L), q(id)), id)).toSeq.min._2
    val gotTop = got.filter(r => r.getAs[Long]("query_id") == 0L &&
      r.getAs[Int]("rnk") == 1).head.getAs[Long]("neighbor_id")
    assert(gotTop === wantTop)
  }

  test("k-means inertia gauge: exact-integer and non-increasing at depth 4") {
    import graft.functions.Parity
    // Same 4-group geometry as the Lloyd-parity test: iterations past
    // the seeds genuinely move centroids, so the gauge sees real
    // decreases, not ties.
    val dim = Parity.EmbeddingDim
    val n = 32
    val vecs = (0 until n).map { i =>
      val group = i % 4
      Array.tabulate(dim) { d =>
        val base = if (d / (dim / 4) == group) 1.0f else 0.0f
        base + ((i * 31 + d * 7) % 11 - 5) * 0.01f
      }
    }
    val dir = writeFixture(embeddings =
      (0 until n).map(i => EmbRow(i.toLong, vecs(i), 0)))
    val rows = Similarity.kmeansInertiaAt(spark, dir, 4).collect()
      .map(r => r.getAs[Long]("iter") -> r.getAs[Long]("inertia"))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    // Lloyd contract: each update+assign round cannot increase the
    // exact-integer inertia (equality allowed once converged).
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(b <= a) }
    assert(rows.last._2 < rows.head._2) // and it genuinely converged here
    // The gated depth-2 query is the prefix of the deeper chain.
    val gated = Similarity.kmeansInertia(spark, dir).collect()
      .map(r => r.getAs[Long]("iter") -> r.getAs[Long]("inertia")).sortBy(_._1)
    assert(gated.toSeq === rows.take(2).toSeq)
  }

  test("day-2 incremental ANN: merged codes cover the corpus, the batch arm is batch-proportional") {
    val sfDir = "/root/testdata/sf0.001"
    val ids = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0))
    val odd = ids.filter(_ % 2 == 1).toSet

    // IVF cells: stored ⊕ batch is a disjoint cover of every vector
    val ivf = Similarity.incrementalIvfCodes(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("dist2")))
    assert(ivf.map(_._1).toSet === ids.toSet)
    assert(ivf.length === ids.length)
    // frozen-structure purity: the day-2 arm ALONE reproduces exactly the
    // merged relation's odd half — assignment is a pure per-row function
    // of the frozen centroids, so merge-then-read ≡ assign-then-merge
    val arm = Similarity.ivfBatchArm(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("dist2")))
    assert(arm.map(_._1).toSet === odd)
    assert(arm.length === odd.size) // output rows = |Δ|, not |corpus|
    assert(arm.toSet === ivf.filter(x => odd(x._1)).toSet)
    // the recurring day-2 plan carries the batch predicate — the stored
    // half is never re-assigned on day 2
    val plan = Similarity.ivfBatchArm(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("% 2) = 1") || plan.contains("% 2 = 1"), plan)

    // PQ codes: same contract, (vec_id, m) key
    val pq = Similarity.incrementalPqCodes(spark, sfDir)
      .select(col("vec_id"), col("m").cast("long").as("m"), col("code"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("m"),
        r.getAs[Long]("code")))
    assert(pq.map(x => (x._1, x._2)).toSet ===
      ids.flatMap(id => (0 until Similarity.PqM).map(m => (id, m.toLong))).toSet)
    assert(pq.length === ids.length * Similarity.PqM)
    val pqArm = Similarity.pqBatchArm(spark, sfDir)
      .select(col("vec_id"), col("m").cast("long").as("m"), col("code"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("m"),
        r.getAs[Long]("code")))
    assert(pqArm.length === odd.size * Similarity.PqM)
    assert(pqArm.toSet === pq.filter(x => odd(x._1)).toSet)
  }

  test("recall drift gate: fresh column equals pqRecall's ADC hits, " +
      "retrain flag equals the aggregate-gap recompute") {
    val sfDir = "/root/testdata/sf0.001"
    val drift = Similarity.incrementalRecallDrift(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), (r.getAs[Long]("k"),
        r.getAs[Long]("hits_frozen"), r.getAs[Long]("hits_fresh"),
        r.getAs[Long]("retrain")))).toMap
    assert(drift.size === Similarity.NumQueries)
    // hits_fresh is definitionally pqRecall's hits_adc (same fresh-trained
    // index, same exact anchor) — the two gated queries must agree.
    val adc = Similarity.pqRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("hits_adc")).toMap
    assert(drift.view.mapValues(_._3).toMap === adc)
    drift.values.foreach { case (k, hf, ha, _) =>
      assert(hf >= 0L && hf <= k && ha >= 0L && ha <= k)
    }
    // The decision is one aggregate gap shared by every row.
    val sumK = drift.values.map(_._1).sum
    val gap = drift.values.map(_._3).sum - drift.values.map(_._2).sum
    val want = if (gap * 100L > Similarity.DriftTolerancePct * sumK) 1L else 0L
    assert(drift.values.map(_._4).toSet === Set(want))
  }
}
