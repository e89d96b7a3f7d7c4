package graft.operators

import graft.Tables
import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding FLOAT[64], label) — SURVEY.md Phase 4 extension.
  *
  * Four paths:
  *   - Brute-force cosine top-k: the exactness baseline. Query set ⨯
  *     corpus; at cluster scale the query side is the small relation and
  *     is broadcast, so the corpus never shuffles — the scan is
  *     embarrassingly parallel and the per-partition top-k is collapsed by
  *     the rank filter.
  *   - Random-hyperplane LSH buckets: each vector maps to an 8-bit sign
  *     pattern over fixed ±1 planes; candidates are restricted to the
  *     query's bucket (expected 1/256 of the corpus per probe).
  *   - Multiprobe LSH: bucket + 8 single-bit-flip probes (recall dial).
  *   - IVF: coarse cells with exact-integer centroid sums, probe the best
  *     cell, exact top-k inside it (see ivfTopK).
  *
  * All similarity math is the exact-integer quantized dot product
  * (functions.Parity): ranking and thresholds are bit-identical between
  * Spark and the DuckDB oracle; ranking ties break on vec_id.
  */
object Similarity {

  /** Query workload: the first NumQueries vec_ids. */
  val NumQueries = 20L
  val TopK = 5L

  import graft.functions.VectorOps.longDot

  /** LSH bucket via the codegen dot kernel against literal ±1 plane
    * vectors (same arithmetic as Parity.lshBucketSpark/Duck, no
    * interpreted lambdas in the per-row path).
    */
  private[operators] def lshBucketCol(
      v: org.apache.spark.sql.Column,
      nPlanes: Int = NumPlanes): org.apache.spark.sql.Column =
    (0 until nPlanes).map { j =>
      val plane = array(planes(j).map(x => lit(x.toLong)): _*)
      when(longDot(v, plane) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Quantized (vec_id, v, norm) relation — the shared base of every ANN
    * query here AND the embedding near-dup pair in Dedup; each gated plan
    * consumes it at least twice (corpus + query sides of the same
    * self-join). Registry-persisted so the embedding scan + quantize +
    * norm runs once per session, with every consumer picking up the same
    * cached instance instead of re-registering the plan each call.
    */
  private[operators] def quantized(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"similarity.quantized:$sfDir") {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), graft.functions.VectorOps.quantize(col("embedding")).as("v"))
        .withColumn("norm", longDot(col("v"), col("v")))
    }

  private val quantizedSql: String =
    s"""SELECT vec_id, v, ${dotDuck("v", "v")} AS norm
       |FROM (SELECT vec_id, ${quantizeDuck("embedding")} AS v FROM embeddings)""".stripMargin

  // ------------------------------------------------------------------
  // Brute-force cosine top-k per query.
  // ------------------------------------------------------------------
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = quantized(spark, sfDir)
    val queries = corpus.where(col("vec_id") < NumQueries)
    val scored = broadcast(queries.as("q")).join(corpus.as("c"),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        longDot(col("q.v"), col("c.v")).as("dot"),
        col("q.norm").as("qn"), col("c.norm").as("cn"))
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= TopK)
      .select("query_id", "neighbor_id", "rnk", "dot")
  }

  val cosineTopKSql: String =
    s"""WITH corpus AS ($quantizedSql),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotDuck("q.v", "c.v")} AS dot,
       |    ${cosineDuck(dotDuck("q.v", "c.v"), "q.norm", "c.norm")} AS cos
       |  FROM (SELECT * FROM corpus WHERE vec_id < $NumQueries) q
       |  JOIN corpus c ON q.vec_id <> c.vec_id)
       |SELECT query_id, neighbor_id, rnk, dot FROM (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $TopK""".stripMargin

  // ------------------------------------------------------------------
  // LSH bucket statistics — bucket histogram over the corpus.
  // ------------------------------------------------------------------
  def lshBucketStats(spark: SparkSession, sfDir: String): DataFrame =
    quantized(spark, sfDir)
      .select(lshBucketCol(col("v")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_vectors"))

  val lshBucketStatsSql: String =
    s"""SELECT bucket, count(*) AS n_vectors
       |FROM (SELECT ${lshBucketDuck("v")} AS bucket FROM ($quantizedSql))
       |GROUP BY bucket""".stripMargin

  // ------------------------------------------------------------------
  // LSH-bucketed ANN top-k: candidates share the query's bucket.
  // ------------------------------------------------------------------
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = quantized(spark, sfDir)
      .withColumn("bucket", lshBucketCol(col("v")))
    val queries = corpus.where(col("vec_id") < NumQueries)
    val scored = broadcast(queries.as("q")).join(corpus.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        longDot(col("q.v"), col("c.v")).as("dot"),
        col("q.norm").as("qn"), col("c.norm").as("cn"))
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= TopK)
      .select("query_id", "neighbor_id", "rnk", "dot")
  }

  val lshTopKSql: String =
    s"""WITH corpus AS (
       |  SELECT vec_id, v, norm, ${lshBucketDuck("v")} AS bucket FROM ($quantizedSql)),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotDuck("q.v", "c.v")} AS dot,
       |    ${cosineDuck(dotDuck("q.v", "c.v"), "q.norm", "c.norm")} AS cos
       |  FROM (SELECT * FROM corpus WHERE vec_id < $NumQueries) q
       |  JOIN corpus c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
       |SELECT query_id, neighbor_id, rnk, dot FROM (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $TopK""".stripMargin

  // ------------------------------------------------------------------
  // Multiprobe LSH top-k: probe the query's bucket plus the 8 buckets at
  // Hamming distance 1 in plane space (flip one sign bit). Probing costs
  // 9 equi-join keys per query instead of a wider corpus scan — the
  // standard recall/latency dial for sign-LSH; candidates stay
  // ~9/256 of the corpus per query.
  // ------------------------------------------------------------------
  def lshMultiprobeTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = quantized(spark, sfDir)
      .withColumn("bucket", lshBucketCol(col("v")))
    val probeOffsets = lit(0) +: (0 until NumPlanes).map(j => lit(1 << j))
    val queries = corpus.where(col("vec_id") < NumQueries)
      .withColumn("probe", explode(array(probeOffsets: _*)))
      .withColumn("pbucket", expr("int(bucket ^ probe)"))
    val scored = broadcast(queries.as("q")).join(corpus.as("c"),
        col("q.pbucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        longDot(col("q.v"), col("c.v")).as("dot"),
        col("q.norm").as("qn"), col("c.norm").as("cn"))
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= TopK)
      .select("query_id", "neighbor_id", "rnk", "dot")
  }

  val lshMultiprobeTopKSql: String = {
    val offsets = (Seq(0) ++ (0 until NumPlanes).map(j => 1 << j)).mkString("[", ", ", "]")
    s"""WITH corpus AS (
       |  SELECT vec_id, v, norm, ${lshBucketDuck("v")} AS bucket FROM ($quantizedSql)),
       |probes AS (
       |  SELECT vec_id, v, norm, CAST(xor(CAST(bucket AS BIGINT), CAST(probe AS BIGINT)) AS INTEGER) AS pbucket
       |  FROM (SELECT *, unnest($offsets) AS probe FROM corpus WHERE vec_id < $NumQueries)),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotDuck("q.v", "c.v")} AS dot,
       |    ${cosineDuck(dotDuck("q.v", "c.v"), "q.norm", "c.norm")} AS cos
       |  FROM probes q JOIN corpus c
       |    ON q.pbucket = c.bucket AND q.vec_id <> c.vec_id)
       |SELECT query_id, neighbor_id, rnk, dot FROM (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= $TopK""".stripMargin
  }

  // ------------------------------------------------------------------
  // IVF-style ANN: coarse partitions (the `label` column stands in for
  // k-means cell ids — at 100 TB you'd train cells offline the same way),
  // centroid = exact integer SUM vector + count per cell (no FP until the
  // final, deterministic dot/count scoring), probe = the NProbe best
  // cells by mean similarity, then exact top-k inside those cells only.
  // The corpus is scanned once for centroids (tiny aggregate: cells ×
  // dim) and candidate scoring touches NProbe/|cells| of the data per
  // query. nprobe is IVF's recall/latency dial (the analogue of LSH's
  // multiprobe offsets above): cells partition the corpus, so the
  // nprobe=3 candidate set strictly contains the nprobe=1 set — recall
  // is monotone in nprobe (SimilaritySpec asserts the lift; s_ivf_recall
  // gauges it against brute force).
  // ------------------------------------------------------------------
  val NProbe = 3

  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame =
    ivfTopKNprobe(spark, sfDir, NProbe)

  def ivfTopKNprobe(spark: SparkSession, sfDir: String, nprobe: Int): DataFrame = {
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), graft.functions.VectorOps.quantize(col("embedding")).as("v"))
      .withColumn("norm", longDot(col("v"), col("v")))
    // Centroid sum vectors: posexplode → grouped sums → deterministic
    // reassembly (array_sort on pos).
    val cents = corpus
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum("x").as("s"), count(lit(1)).as("c"))
      .groupBy("label").agg(
        expr("transform(array_sort(collect_list(struct(pos, s))), e -> e.s)").as("sumv"),
        max("c").as("cnt"))
    val queries = corpus.where(col("vec_id") < NumQueries)
    // Probe: best cell by mean dot = dot(q, sum_c)/cnt_c (identical
    // doubles both engines; ties break on label).
    val probed = broadcast(queries.as("q")).join(broadcast(cents.as("ce")))
      .select(col("q.vec_id").as("query_id"), col("q.v").as("qv"),
        col("q.norm").as("qn"), col("ce.label").as("cell"),
        (longDot(col("q.v"), col("ce.sumv")).cast("double") / col("ce.cnt")).as("score"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("cell"))))
      .where(col("crnk") <= nprobe)
      .select("query_id", "qv", "qn", "cell")
    // Exact top-k within the probed cells (disjoint — cells partition
    // the corpus, so no candidate dedup is needed).
    broadcast(probed.as("p")).join(corpus.as("c"),
        col("p.cell") === col("c.label") && col("p.query_id") =!= col("c.vec_id"))
      .select(col("p.query_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        longDot(col("p.qv"), col("c.v")).as("dot"),
        col("p.qn").as("qn"), col("c.norm").as("cn"))
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= TopK)
      .select("query_id", "neighbor_id", "rnk", "dot")
  }

  val ivfTopKSql: String =
    s"""WITH corpus AS (
       |  SELECT vec_id, label, v, ${dotDuck("v", "v")} AS norm
       |  FROM (SELECT vec_id, label, ${quantizeDuck("embedding")} AS v FROM embeddings)),
       |cents AS (
       |  SELECT label, list(s ORDER BY pos) AS sumv, max(c) AS cnt FROM (
       |    SELECT label, pos, CAST(sum(x) AS BIGINT) AS s, count(*) AS c FROM (
       |      SELECT label, unnest(v) AS x, generate_subscripts(v, 1) - 1 AS pos
       |      FROM corpus)
       |    GROUP BY label, pos)
       |  GROUP BY label),
       |probed AS (
       |  SELECT query_id, qv, qn, cell FROM (
       |    SELECT q.vec_id AS query_id, q.v AS qv, q.norm AS qn, ce.label AS cell,
       |      CAST(${dotDuck("q.v", "ce.sumv")} AS DOUBLE) / ce.cnt AS score,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY CAST(${dotDuck("q.v", "ce.sumv")} AS DOUBLE) / ce.cnt DESC, ce.label) AS crnk
       |    FROM (SELECT * FROM corpus WHERE vec_id < $NumQueries) q CROSS JOIN cents ce)
       |  WHERE crnk <= $NProbe)
       |SELECT query_id, neighbor_id, rnk, dot FROM (
       |  SELECT p.query_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotDuck("p.qv", "c.v")} AS dot,
       |    row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY ${cosineDuck(dotDuck("p.qv", "c.v"), "p.qn", "c.norm")} DESC, c.vec_id) AS rnk
       |  FROM probed p JOIN corpus c
       |    ON p.cell = c.label AND p.query_id <> c.vec_id)
       |WHERE rnk <= $TopK""".stripMargin

  // ------------------------------------------------------------------
  // k-means training (Lloyd iterations) over the quantized embeddings —
  // the coarse-quantizer TRAINER the IVF path above presupposes ("at
  // 100 TB you'd train cells offline the same way"). Two unrolled Lloyd
  // iterations, every step exact-integer so Spark and DuckDB agree
  // bit-for-bit:
  //   - seeds = the first KmeansK vectors (deterministic, no RNG);
  //   - assignment = argmin over ||x − c||² = xx − 2·x·c + cc, all Long
  //     (≤ 64·(2·10⁶)² ≈ 2.6·10¹⁴ per vector — far inside Long range);
  //     ties break to the lowest centroid id via the (dist2, cid) struct
  //     min — one codegen'd partial/final HashAggregate, no window sort;
  //   - update = per-dimension Long sums (64 grouped aggregates in ONE
  //     HashAggregate pass over k groups) floor-divided by the cluster
  //     count: fdiv(s,n) = (s − pmod(s,n)) div n is an exact integer both
  //     engines compute identically. A cluster that loses all points
  //     drops out (same semantics both sides).
  // Scale shape: each iteration is one corpus scan with a BROADCAST of k
  // centroid rows (k·dim longs — bytes), one k-group aggregate, and one
  // k-row driver-free join; nothing quadratic, no corpus re-shuffle. At
  // extreme corpus sizes the per-dimension Long sums would be the first
  // overflow (10¹² rows · 10⁶ quantized units ≈ 10¹⁸ ≈ Long.Max) — the
  // documented swap is sum(CAST AS DECIMAL(38,0)), same plan shape.
  // ------------------------------------------------------------------
  val KmeansK = 8L

  def kmeansTrain(spark: SparkSession, sfDir: String): DataFrame =
    // Registry-persisted: the (vec_id, cluster, dist2) assignment is 3
    // scalar columns per vector and has two gated consumers (the train
    // query itself and the ivfKmeansTopK search below) — the two-pass
    // training plan runs once per session.
    graft.CacheRegistry.cached(spark, s"similarity.kmeansAsg:$sfDir") {
      kmeansTrainPlan(spark, sfDir)
    }

  /** The trained centroids (cid, cv, cnorm) — k rows; exposed (and
    * registry-persisted) because multi-cell probing needs centroid
    * DISTANCES at query time, not just the corpus assignment.
    */
  private[operators] def kmeansCentroids(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"similarity.kmeansC1:$sfDir") {
      kmeansParts(spark, sfDir)._1
    }

  private def kmeansTrainPlan(spark: SparkSession, sfDir: String): DataFrame =
    kmeansParts(spark, sfDir)._2

  /** Lloyd DEPTH is a parameter since round 8 (it was a fixed unroll of
    * 2): `iters` counts ASSIGNMENT passes, so there are iters−1 centroid
    * updates between the seed assignment and the final one. The GATED
    * depth stays [[KmeansIters]] = 2 — exactly the chain the DuckDB
    * oracle replays — and deeper settings are exercised by
    * SimilaritySpec's convergence gauge: the exact-integer inertia
    * Σ dist2 per assignment pass, which Lloyd makes non-increasing.
    */
  val KmeansIters = 2

  /** (final centroids, per-iteration assignments — `iters` of them). */
  private def kmeansChain(
      spark: SparkSession, sfDir: String, iters: Int): (DataFrame, Seq[DataFrame]) = {
    require(iters >= 1, s"kmeans needs at least one assignment pass, got $iters")
    val q = quantized(spark, sfDir)
    val seeds = q.where(col("vec_id") < KmeansK)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
    // argmin_{cid} ||x − c||² as a grouped struct-min: (dist2, cid) pairs
    // order lexicographically, so min = smallest distance, ties to the
    // smallest centroid id.
    def assign(cents: DataFrame): DataFrame =
      q.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(
            (col("norm") - lit(2L) * longDot(col("v"), col("cv")) + col("cnorm"))
              .as("dist2"),
            col("cid")).as("sc"))
        .groupBy("vec_id").agg(min("sc").as("sc"))
        .select(col("vec_id"), col("sc.cid").as("cluster"), col("sc.dist2").as("dist2"))
    // New centroids: one HashAggregate pass over k groups — 64 Long sums
    // as flat columns (same flat-scalar pattern as the minhash signature
    // build), then exact floor-division and reassembly into the array.
    def update(asg: DataFrame): DataFrame = {
      val joined = q.join(asg.select("vec_id", "cluster"), "vec_id")
      centroidSums(joined, EmbeddingDim, decimal = false)
        .select(col("cid"),
          array((0 until EmbeddingDim)
            .map(i => expr(s"(s$i - pmod(s$i, n)) div n")): _*).as("cv"))
        .withColumn("cnorm", longDot(col("cv"), col("cv")))
    }
    var cents = seeds
    var asgs = Vector(assign(cents))
    var i = 1
    while (i < iters) {
      cents = update(asgs.last)
      asgs = asgs :+ assign(cents)
      i += 1
    }
    (cents, asgs)
  }

  /** The centroid-update aggregation in isolation, with the documented
    * overflow escape hatch selectable (class scaladoc above: per-dimension
    * Long sums overflow first at ~10¹² rows · 10⁶ quantized units; the
    * swap is `sum(CAST AS DECIMAL(38,0))`, same one-pass k-group
    * HashAggregate plan). `clustered` is any `(cluster, v: array<long>)`
    * relation; output is (cid, n, s0…s{dim−1}). PropertySpec plants
    * vectors whose per-dimension sums exceed 2⁶³ and asserts the decimal
    * form stays exact where the Long form wraps.
    */
  def centroidSums(clustered: DataFrame, dim: Int, decimal: Boolean): DataFrame = {
    val aggs = count(lit(1)).as("n") +: (0 until dim).map { i =>
      val e = element_at(col("v"), i + 1)
      sum(if (decimal) e.cast("decimal(38,0)") else e).as(s"s$i")
    }
    clustered.groupBy(col("cluster").as("cid")).agg(aggs.head, aggs.tail: _*)
  }

  /** (final centroids c1, final assignment over c1) at the gated depth. */
  private def kmeansParts(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val (cents, asgs) = kmeansChain(spark, sfDir, KmeansIters)
    (cents, asgs.last)
  }

  /** Convergence gauge: (iter, inertia) with inertia = Σ dist2 of the
    * iter-th assignment pass — exact 64-bit integers end to end, so the
    * non-increasing Lloyd property is checkable with equality-grade
    * arithmetic, no epsilon. Gated at the default depth (the oracle
    * replays both passes); SimilaritySpec runs it deeper.
    */
  private[graft] def kmeansInertiaAt(
      spark: SparkSession, sfDir: String, iters: Int): DataFrame = {
    val chain = kmeansChain(spark, sfDir, iters)._2
    // At the gated depth the FINAL pass is plan-identical to the
    // registry-persisted kmeansTrain assignment — ride that cache
    // instead of re-running the corpus x centroids join (the discarded
    // plan object costs nothing; only the seed-assignment pass
    // actually executes fresh).
    val asgs =
      if (iters == KmeansIters) chain.init :+ kmeansTrain(spark, sfDir)
      else chain
    asgs.zipWithIndex
      .map { case (asg, i) =>
        asg.agg(sum("dist2").as("inertia"))
          .select(lit(i + 1L).as("iter"), col("inertia"))
      }
      .reduce(_ unionAll _)
  }

  def kmeansInertia(spark: SparkSession, sfDir: String): DataFrame =
    kmeansInertiaAt(spark, sfDir, KmeansIters)

  private def kmeansAssignSql(corpus: String, cents: String): String =
    s"""SELECT vec_id, cid AS cluster, dist2 FROM (
       |  SELECT vec_id, cid, dist2,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
       |  FROM (
       |    SELECT q.vec_id, c.cid,
       |      q.norm - 2 * ${dotDuck("q.v", "c.cv")} + c.cnorm AS dist2
       |    FROM $corpus q CROSS JOIN $cents c))
       |WHERE rn = 1""".stripMargin

  /** The training CTE chain up to the final centroids `c1` — shared by
    * the train oracle and the kmeans-IVF search oracle (which probes c1
    * distances). No leading WITH so callers can append CTEs.
    */
  private val kmeansCtesSql: String = {
    val dimSums = (0 until EmbeddingDim)
      .map(i => s"CAST(sum(q.v[${i + 1}]) AS BIGINT) AS s$i").mkString(", ")
    val fdivArr = (0 until EmbeddingDim)
      .map(i => s"(s$i - ((s$i % n) + n) % n) // n").mkString("[", ", ", "]")
    s"""corpus AS ($quantizedSql),
       |seeds AS (
       |  SELECT vec_id AS cid, v AS cv, norm AS cnorm FROM corpus
       |  WHERE vec_id < $KmeansK),
       |a1 AS (${kmeansAssignSql("corpus", "seeds")}),
       |sums AS (
       |  SELECT a.cluster AS cid, count(*) AS n, $dimSums
       |  FROM corpus q JOIN a1 a ON q.vec_id = a.vec_id
       |  GROUP BY a.cluster),
       |c1 AS (
       |  SELECT cid, cv, ${dotDuck("cv", "cv")} AS cnorm
       |  FROM (SELECT cid, $fdivArr AS cv FROM sums))""".stripMargin
  }

  val kmeansTrainSql: String =
    s"""WITH $kmeansCtesSql
       |${kmeansAssignSql("corpus", "c1")}""".stripMargin

  val kmeansInertiaSql: String =
    s"""WITH $kmeansCtesSql,
       |a2 AS (${kmeansAssignSql("corpus", "c1")})
       |SELECT CAST(1 AS BIGINT) AS iter, CAST(sum(dist2) AS BIGINT) AS inertia FROM a1
       |UNION ALL
       |SELECT CAST(2 AS BIGINT) AS iter, CAST(sum(dist2) AS BIGINT) AS inertia FROM a2""".stripMargin

  // ------------------------------------------------------------------
  // IVF search over the TRAINED k-means cells — the composition the two
  // pieces above exist for: kmeansTrain is the offline coarse-quantizer
  // build, and search probes the query's NProbe nearest cells by exact
  // integer centroid distance (dist2 = qq − 2·q·c + cc — the same
  // arithmetic the assignment used, so the nearest probed cell IS the
  // query's own cell and nprobe=1 reproduces the old single-cell
  // search). The plan touches nprobe/k of the corpus per query — the
  // IVF cost model with its recall dial, over cells that ADAPT to the
  // data instead of the fixture's static labels (s_ivf_topk keeps that
  // variant).
  // ------------------------------------------------------------------
  def ivfKmeansTopK(spark: SparkSession, sfDir: String): DataFrame =
    ivfKmeansTopKNprobe(spark, sfDir, NProbe)

  def ivfKmeansTopKNprobe(spark: SparkSession, sfDir: String, nprobe: Int): DataFrame = {
    val labeled = quantized(spark, sfDir)
      .join(kmeansTrain(spark, sfDir).select("vec_id", "cluster"), "vec_id")
    val qs = quantized(spark, sfDir).where(col("vec_id") < NumQueries)
    val probed = broadcast(qs.as("q"))
      .join(broadcast(kmeansCentroids(spark, sfDir).as("ce")))
      .select(col("q.vec_id").as("query_id"), col("q.v").as("qv"),
        col("q.norm").as("qn"), col("ce.cid").as("cell"),
        (col("q.norm") - lit(2L) * longDot(col("q.v"), col("ce.cv")) + col("ce.cnorm"))
          .as("dist2"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist2"), col("cell"))))
      .where(col("crnk") <= nprobe)
      .select("query_id", "qv", "qn", "cell")
    broadcast(probed.as("p")).join(labeled.as("c"),
        col("p.cell") === col("c.cluster") && col("p.query_id") =!= col("c.vec_id"))
      .select(col("p.query_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        longDot(col("p.qv"), col("c.v")).as("dot"),
        col("p.qn").as("qn"), col("c.norm").as("cn"))
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= TopK)
      .select("query_id", "neighbor_id", "rnk", "dot")
  }

  val ivfKmeansTopKSql: String =
    s"""WITH $kmeansCtesSql,
       |asg AS (SELECT vec_id, cluster FROM (${kmeansAssignSql("corpus", "c1")})),
       |labeled AS (
       |  SELECT c.vec_id, c.v, c.norm, a.cluster
       |  FROM corpus c JOIN asg a USING (vec_id)),
       |probes AS (
       |  SELECT query_id, qv, qn, cell FROM (
       |    SELECT q.vec_id AS query_id, q.v AS qv, q.norm AS qn, ce.cid AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY q.norm - 2 * ${dotDuck("q.v", "ce.cv")} + ce.cnorm, ce.cid) AS crnk
       |    FROM (SELECT * FROM corpus WHERE vec_id < $NumQueries) q CROSS JOIN c1 ce)
       |  WHERE crnk <= $NProbe)
       |SELECT query_id, neighbor_id, rnk, dot FROM (
       |  SELECT p.query_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotDuck("p.qv", "c.v")} AS dot,
       |    row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY ${cosineDuck(dotDuck("p.qv", "c.v"), "p.qn", "c.norm")} DESC,
       |        c.vec_id) AS rnk
       |  FROM probes p
       |  JOIN labeled c ON p.cell = c.cluster AND p.query_id <> c.vec_id)
       |WHERE rnk <= $TopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_cosine_topk" -> (cosineTopK _),
    "s_lsh_bucket_stats" -> (lshBucketStats _),
    "s_lsh_topk" -> (lshTopK _),
    "s_lsh_multiprobe_topk" -> (lshMultiprobeTopK _),
    "s_ivf_topk" -> (ivfTopK _),
    "s_kmeans_train" -> (kmeansTrain _),
    "s_kmeans_inertia" -> (kmeansInertia _),
    "s_ivf_kmeans_topk" -> (ivfKmeansTopK _))

  val oracles: Map[String, String] = Map(
    "s_cosine_topk" -> cosineTopKSql,
    "s_lsh_bucket_stats" -> lshBucketStatsSql,
    "s_lsh_topk" -> lshTopKSql,
    "s_lsh_multiprobe_topk" -> lshMultiprobeTopKSql,
    "s_ivf_topk" -> ivfTopKSql,
    "s_kmeans_train" -> kmeansTrainSql,
    "s_kmeans_inertia" -> kmeansInertiaSql,
    "s_ivf_kmeans_topk" -> ivfKmeansTopKSql)
}
