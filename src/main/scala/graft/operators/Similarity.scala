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
  private[graft] def lshBucketCol(
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
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame =
    // Registry-persisted (r18): k·|queries| rows with 2+ gated consumers
    // (its own gate + the recall/agreement evals recompute this arm) —
    // the persist policy's small-expensive-aggregate case.
    graft.CacheRegistry.cached(spark, s"similarity.cosineTopK:$sfDir") {
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
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame =
    // Registry-persisted (r18): k·|queries| rows with 2+ gated consumers
    // (its own gate + the recall/agreement evals recompute this arm) —
    // the persist policy's small-expensive-aggregate case.
    graft.CacheRegistry.cached(spark, s"similarity.lshTopK:$sfDir") {
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
  def lshMultiprobeTopK(spark: SparkSession, sfDir: String): DataFrame =
    // Registry-persisted (r18): k·|queries| rows with 2+ gated consumers
    // (its own gate + the recall/agreement evals recompute this arm) —
    // the persist policy's small-expensive-aggregate case.
    graft.CacheRegistry.cached(spark, s"similarity.lshMultiprobeTopK:$sfDir") {
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
  // Hard-negative mining (contrastive-training data prep): for each
  // query vector, the top-k nearest CORPUS vectors whose label differs —
  // semantically close but differently-labeled examples, the negatives
  // that make contrastive/embedding training informative. Candidate
  // generation rides the same multiprobe sign-LSH index as
  // [[lshMultiprobeTopK]] (query bucket + 8 single-bit-flip probes, ~9/256
  // of the corpus per query); the label-mismatch predicate then prunes
  // candidates further, so the mining pass stays sublinear at any corpus
  // size — at 100 TB this is one equi-shuffle on (bucket) against a
  // broadcast query set, never a full scan per query.
  // ------------------------------------------------------------------
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        graft.functions.VectorOps.quantize(col("embedding")).as("v"))
      .withColumn("norm", longDot(col("v"), col("v")))
      .withColumn("bucket", lshBucketCol(col("v")))
    val probeOffsets = lit(0) +: (0 until NumPlanes).map(j => lit(1 << j))
    val queries = corpus.where(col("vec_id") < NumQueries)
      .withColumn("probe", explode(array(probeOffsets: _*)))
      .withColumn("pbucket", expr("int(bucket ^ probe)"))
    val scored = broadcast(queries.as("q")).join(corpus.as("c"),
        col("q.pbucket") === col("c.bucket") &&
          col("q.label") =!= col("c.label"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("c.label").as("neighbor_label"),
        longDot(col("q.v"), col("c.v")).as("dot"),
        col("q.norm").as("qn"), col("c.norm").as("cn"))
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= TopK)
      .select("query_id", "neighbor_id", "neighbor_label", "rnk", "dot")
  }

  val hardNegativesSql: String = {
    val offsets = (Seq(0) ++ (0 until NumPlanes).map(j => 1 << j)).mkString("[", ", ", "]")
    s"""WITH corpus AS (
       |  SELECT vec_id, label, v, ${dotDuck("v", "v")} AS norm, ${lshBucketDuck("v")} AS bucket
       |  FROM (SELECT vec_id, label, ${quantizeDuck("embedding")} AS v FROM embeddings)),
       |probes AS (
       |  SELECT vec_id, label, v, norm,
       |    CAST(xor(CAST(bucket AS BIGINT), CAST(probe AS BIGINT)) AS INTEGER) AS pbucket
       |  FROM (SELECT *, unnest($offsets) AS probe FROM corpus WHERE vec_id < $NumQueries)),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
       |    ${dotDuck("q.v", "c.v")} AS dot,
       |    ${cosineDuck(dotDuck("q.v", "c.v"), "q.norm", "c.norm")} AS cos
       |  FROM probes q JOIN corpus c
       |    ON q.pbucket = c.bucket AND q.label <> c.label)
       |SELECT query_id, neighbor_id, neighbor_label, rnk, dot FROM (
       |  SELECT query_id, neighbor_id, neighbor_label, dot,
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
    // Registry-persisted at the default nprobe (r18): consumed by its own
    // gate and recomputed by s_ivf_recall's eval join.
    graft.CacheRegistry.cached(spark, s"similarity.ivfTopK:$sfDir") {
      ivfTopKNprobe(spark, sfDir, NProbe)
    }

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

  /** argmin_{cid} ||x − c||² as a grouped struct-min over ANY corpus:
    * (dist2, cid) pairs order lexicographically, so min = smallest
    * distance, ties to the smallest centroid id. Object-level (r15) so
    * the day-2 incremental path can assign a NEW batch to frozen
    * centroids with the bit-identical kernel the trainer used.
    */
  private def kmeansAssignOver(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(
          (col("norm") - lit(2L) * longDot(col("v"), col("cv")) + col("cnorm"))
            .as("dist2"),
          col("cid")).as("sc"))
      .groupBy("vec_id").agg(min("sc").as("sc"))
      .select(col("vec_id"), col("sc.cid").as("cluster"), col("sc.dist2").as("dist2"))

  /** (final centroids, per-iteration assignments) of the Lloyd chain over
    * an arbitrary corpus, seeded by its vec_id < `seedBound` members.
    */
  private[graft] def kmeansChainOver(
      q: DataFrame, seedBound: Long, iters: Int): (DataFrame, Seq[DataFrame]) = {
    require(iters >= 1, s"kmeans needs at least one assignment pass, got $iters")
    val seeds = q.where(col("vec_id") < seedBound)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
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
    var asgs = Vector(kmeansAssignOver(q, cents))
    var i = 1
    while (i < iters) {
      cents = update(asgs.last)
      asgs = asgs :+ kmeansAssignOver(q, cents)
      i += 1
    }
    (cents, asgs)
  }

  /** (final centroids, per-iteration assignments — `iters` of them). */
  private def kmeansChain(
      spark: SparkSession, sfDir: String, iters: Int): (DataFrame, Seq[DataFrame]) =
    kmeansChainOver(quantized(spark, sfDir), KmeansK, iters)

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

  private[graft] def kmeansAssignSql(corpus: String, cents: String): String =
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
  /** seeds→a1→sums→c1 over a NAMED training-corpus CTE (r15: factored so
    * the incremental oracle can train on the stored half only).
    */
  private[graft] def kmeansTrainCtesOver(trainCorpus: String, seedBound: Long): String = {
    val dimSums = (0 until EmbeddingDim)
      .map(i => s"CAST(sum(q.v[${i + 1}]) AS BIGINT) AS s$i").mkString(", ")
    val fdivArr = (0 until EmbeddingDim)
      .map(i => s"(s$i - ((s$i % n) + n) % n) // n").mkString("[", ", ", "]")
    s"""seeds AS (
       |  SELECT vec_id AS cid, v AS cv, norm AS cnorm FROM $trainCorpus
       |  WHERE vec_id < $seedBound),
       |a1 AS (${kmeansAssignSql(trainCorpus, "seeds")}),
       |sums AS (
       |  SELECT a.cluster AS cid, count(*) AS n, $dimSums
       |  FROM $trainCorpus q JOIN a1 a ON q.vec_id = a.vec_id
       |  GROUP BY a.cluster),
       |c1 AS (
       |  SELECT cid, cv, ${dotDuck("cv", "cv")} AS cnorm
       |  FROM (SELECT cid, $fdivArr AS cv FROM sums))""".stripMargin
  }

  private val kmeansCtesSql: String =
    s"""corpus AS ($quantizedSql),
       |${kmeansTrainCtesOver("corpus", KmeansK)}""".stripMargin

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

  def ivfKmeansTopKNprobe(spark: SparkSession, sfDir: String, nprobe: Int): DataFrame =
    ivfKmeansSearchOver(
      quantized(spark, sfDir)
        .join(kmeansTrain(spark, sfDir).select("vec_id", "cluster"), "vec_id"),
      quantized(spark, sfDir).where(col("vec_id") < NumQueries),
      kmeansCentroids(spark, sfDir), nprobe, TopK)

  /** The trained-cell probe + search over ANY labeled corpus
    * (vec_id, v, norm, cluster), query set (vec_id, v, norm) and
    * centroid relation (cid, cv, cnorm) — factored (r18) so the
    * feature-tier IVF rides the identical plan with zero new search
    * code.
    */
  private[graft] def ivfKmeansSearchOver(labeled: DataFrame, qs: DataFrame,
      cents: DataFrame, nprobe: Int, k: Long): DataFrame = {
    val probed = broadcast(qs.as("q"))
      .join(broadcast(cents.as("ce")))
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
      .where(col("rnk") <= k)
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

  // ------------------------------------------------------------------
  // Product quantization (PQ) — the memory side of large-scale ANN,
  // complementing the IVF cells above (candidate pruning): each vector
  // is split into PqM = 4 subspaces of 16 dims; each subspace gets its
  // own PqK = 8 codeword codebook (seeds = the first 8 vectors'
  // subvectors, one exact-integer Lloyd update — the kmeansTrain recipe
  // applied per subspace IN ONE PLAN via the exploded (vec_id, m, sv)
  // relation, not 4 chains); a vector's code is its per-subspace nearest
  // codeword: 4 small ints ≈ 4 bytes versus 512 bytes of quantized
  // int64s — the ~128× compression that lets a 100 TB embedding corpus
  // fit an in-memory ANN tier. Search is asymmetric distance
  // computation (ADC): the query builds a (m, codeword) → exact-integer
  // ||q_m − c_mk||² table (PqM·PqK = 32 rows — broadcast), and a
  // corpus vector's approximate distance is the sum of 4 table lookups
  // — an equi-join on (m, code) + a grouped sum, NO per-pair
  // 64-dim dot products. s_pq_recall measures what the compression
  // costs against the exact integer-L2 top-k. At production scale ADC
  // composes with the IVF probe (ivfKmeansTopK's cells) to prune
  // candidates first — classic IVF-PQ; here ADC scans the full corpus
  // so the gate pins the pure-PQ semantics.
  //
  // Arithmetic is exact end-to-end: subvector dots ≤ 16·10¹² fit Long
  // with ~10⁵ headroom, ADC sums 4 of them; ties break on codeword /
  // neighbor id — bit-identical across engines.
  // ------------------------------------------------------------------
  val PqM = 4
  val PqSub: Int = EmbeddingDim / PqM
  val PqK = 8L

  /** Exploded subvector relation: (vec_id, m, sv) with m in [0, PqM). */
  private def pqSubvectors(spark: SparkSession, sfDir: String): DataFrame =
    quantized(spark, sfDir)
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> slice(v, m * $PqSub + 1, $PqSub))")))
      .toDF("vec_id", "m", "sv")

  /** Nearest-codeword assignment per (vector, subspace): argmin over the
    * broadcast codebook as a grouped struct-min, ties to smallest cid.
    */
  private def pqAssign(sub: DataFrame, cb: DataFrame): DataFrame =
    sub.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"),
        struct(
          (longDot(col("sv"), col("sv")) - lit(2L) * longDot(col("sv"), col("cv")) +
            longDot(col("cv"), col("cv"))).as("d"),
          col("cid")).as("sc"))
      .groupBy("vec_id", "m").agg(min("sc").as("sc"))
      .select(col("vec_id"), col("m"), col("sc.cid").as("code"))

  /** Codebook training over ANY subvector relation, seeded by its
    * vec_id < `seedBound` members (r15: factored out so the day-2
    * incremental path can train on the stored half only).
    */
  private def pqCodebooksOver(sub: DataFrame, seedBound: Long): DataFrame = {
    val seeds = sub.where(col("vec_id") < seedBound)
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("cv"))
    val a1 = pqAssign(sub, seeds)
    val aggs = count(lit(1)).as("n") +: (0 until PqSub).map(i =>
      sum(element_at(col("sv"), i + 1)).as(s"s$i"))
    val sums = sub.join(a1, Seq("vec_id", "m"))
      .groupBy(col("m"), col("code").as("cid")).agg(aggs.head, aggs.tail: _*)
    sums.select(col("m"), col("cid"),
      array((0 until PqSub).map(i => expr(s"(s$i - pmod(s$i, n)) div n")): _*).as("cv"))
  }

  /** Per-subspace codebooks (m, cid, cv): seed assignment + one exact
    * floor-division centroid update — PqM·PqK rows, registry-persisted.
    */
  private def pqCodebooks(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"similarity.pqCodebook:$sfDir") {
      pqCodebooksOver(pqSubvectors(spark, sfDir), PqK)
    }

  /** The encoded corpus: (vec_id, m, code) — the 4-byte representation. */
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"similarity.pqCodes:$sfDir") {
      pqAssign(pqSubvectors(spark, sfDir), pqCodebooks(spark, sfDir))
    }

  /** Per-query (m, codeword) → exact ||q_m − c_mk||² table over ANY
    * codebook relation: PqM·PqK rows per query — the whole search-time
    * vector arithmetic of ADC (r16: codebook-parameterized so the
    * frozen day-2 structures can be searched with the same plan).
    */
  private def pqDistanceTableOver(spark: SparkSession, sfDir: String,
      cb: DataFrame): DataFrame =
    pqSubvectors(spark, sfDir).where(col("vec_id") < NumQueries)
      .toDF("query_id", "m", "qsv")
      .join(broadcast(cb), "m")
      .select(col("query_id"), col("m"), col("cid"),
        (longDot(col("qsv"), col("qsv")) - lit(2L) * longDot(col("qsv"), col("cv")) +
          longDot(col("cv"), col("cv"))).as("d"))

  private def pqDistanceTable(spark: SparkSession, sfDir: String): DataFrame =
    pqDistanceTableOver(spark, sfDir, pqCodebooks(spark, sfDir))

  /** ADC-scored (query, neighbor, adist) with an ADC rank column, over
    * ANY (codebook, codes) index pair.
    */
  private def pqAdcRankedOver(spark: SparkSession, sfDir: String,
      cb: DataFrame, codes: DataFrame): DataFrame = {
    val dtab = pqDistanceTableOver(spark, sfDir, cb)
    codes.as("c")
      .join(broadcast(dtab).as("t"),
        col("c.m") === col("t.m") && col("c.code") === col("t.cid") &&
          col("t.query_id") =!= col("c.vec_id"))
      .groupBy(col("t.query_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .agg(sum("d").as("adist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))))
  }

  private def pqAdcRanked(spark: SparkSession, sfDir: String): DataFrame =
    pqAdcRankedOver(spark, sfDir, pqCodebooks(spark, sfDir), pqCodes(spark, sfDir))

  def pqAdcTopK(spark: SparkSession, sfDir: String): DataFrame =
    // Registry-persisted (r18): the ADC scoring join underneath is the
    // expensive part and FOUR paths consumed it per session (this gate,
    // the rerank shortlist, pqRecall's two arms, the drift eval).
    graft.CacheRegistry.cached(spark, s"similarity.pqAdcTopK:$sfDir") {
      pqAdcRanked(spark, sfDir).where(col("rnk") <= TopK)
        .select("query_id", "neighbor_id", "rnk", "adist")
    }

  /** The production composition: ADC shortlists PqShortK candidates per
    * query from codes alone (no vectors touched), then ONLY those
    * PqShortK rows join back to the full vectors for an exact-integer
    * re-rank — per query, PqShortK exact distance computations instead
    * of |corpus|. The recall/cost dial is PqShortK.
    */
  val PqShortK = 50L

  /** Exact-integer re-rank of a (query_id, neighbor_id) shortlist: only
    * shortlist rows join back to full vectors.
    */
  private def exactRerank(spark: SparkSession, sfDir: String,
      short: DataFrame): DataFrame = {
    val corpus = quantized(spark, sfDir)
    short.select("query_id", "neighbor_id")
      .join(corpus.select(col("vec_id").as("query_id"),
        col("v").as("qv"), col("norm").as("qn")), "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("v").as("nv"), col("norm").as("nn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (col("qn") - lit(2L) * longDot(col("qv"), col("nv")) + col("nn")).as("dist2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist2"), col("neighbor_id"))))
      .where(col("rnk") <= TopK)
      .select("query_id", "neighbor_id", "rnk", "dist2")
  }

  def pqRerankTopK(spark: SparkSession, sfDir: String): DataFrame =
    // Registry-persisted (r18): own gate + pqRecall recompute it.
    graft.CacheRegistry.cached(spark, s"similarity.pqRerankTopK:$sfDir") {
      exactRerank(spark, sfDir,
        pqAdcRanked(spark, sfDir).where(col("rnk") <= PqShortK))
    }

  /** Classic IVF-PQ — both halves composed: the trained k-means cells
    * prune candidates (only the query's NProbe nearest cells are
    * scored), PQ codes score them (table lookups, no vectors), and the
    * exact re-rank runs on the surviving shortlist. Per query the work
    * is: 8 centroid distances + |probed cells|·(4 lookups + 1 add)/
    * candidate + PqShortK exact distances — the 100 TB ANN serving
    * plan, end-to-end as three equi-joins and two grouped aggregates.
    */
  def ivfPqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val qs = quantized(spark, sfDir).where(col("vec_id") < NumQueries)
    val probes = broadcast(qs.as("q"))
      .join(broadcast(kmeansCentroids(spark, sfDir).as("ce")))
      .select(col("q.vec_id").as("query_id"), col("ce.cid").as("cell"),
        (col("q.norm") - lit(2L) * longDot(col("q.v"), col("ce.cv")) + col("ce.cnorm"))
          .as("cdist"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))))
      .where(col("crnk") <= NProbe)
      .select("query_id", "cell")
    val cand = kmeansTrain(spark, sfDir).select("vec_id", "cluster").as("c")
      .join(broadcast(probes).as("p"),
        col("c.cluster") === col("p.cell") && col("p.query_id") =!= col("c.vec_id"))
      .select(col("p.query_id").as("query_id"), col("c.vec_id").as("vec_id"))
    val dtab = pqDistanceTable(spark, sfDir).toDF("t_query", "t_m", "t_cid", "d")
    val scored = cand
      .join(pqCodes(spark, sfDir), "vec_id")
      .join(broadcast(dtab),
        col("t_query") === col("query_id") &&
          col("t_m") === col("m") && col("t_cid") === col("code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("d").as("adist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))))
    exactRerank(spark, sfDir, scored.where(col("rnk") <= PqShortK))
  }

  /** PQ hits against the exact integer-L2 top-k (the metric ADC
    * approximates — unlike the cosine family's recall evals), for BOTH
    * search modes: raw ADC top-k and the shortlist-re-rank composition
    * (measured at sf0.001: 0.13 vs 0.48 — the re-rank is what makes the
    * 128× compression usable, and the gap is the honest cost of PQ on
    * structure-free random embeddings). Per query, hits_rerank ≥
    * hits_adc is a THEOREM (ADC's top-k is inside the shortlist, and a
    * global exact-top-k member in the shortlist can be displaced only by
    * exact-closer vectors, of which there are < k) — SimilaritySpec
    * asserts it on live data.
    */
  /** Exact integer-L2 top-k neighbors of the NumQueries query vectors —
    * the ground truth every PQ recall metric anchors to.
    */
  private def exactTopKNeighbors(spark: SparkSession, sfDir: String): DataFrame =
    // Registry-persisted (r18): the brute-force ground truth is consumed
    // by pqRecall AND incrementalRecallDrift — one |Q|·|corpus| scoring
    // pass per session instead of two.
    graft.CacheRegistry.cached(spark, s"similarity.exactTopK:$sfDir") {
    val corpus = quantized(spark, sfDir)
    broadcast(corpus.where(col("vec_id") < NumQueries).as("q"))
      .join(corpus.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (col("q.norm") - lit(2L) * longDot(col("q.v"), col("c.v")) + col("c.norm"))
          .as("dist2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist2"), col("neighbor_id"))))
      .where(col("rnk") <= TopK)
  }

  def pqRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = exactTopKNeighbors(spark, sfDir)
    exact.as("e")
      .join(pqAdcTopK(spark, sfDir).as("a"),
        col("e.query_id") === col("a.query_id") &&
          col("e.neighbor_id") === col("a.neighbor_id"), "left")
      .join(pqRerankTopK(spark, sfDir).as("r"),
        col("e.query_id") === col("r.query_id") &&
          col("e.neighbor_id") === col("r.neighbor_id"), "left")
      .groupBy(col("e.query_id").as("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("a.neighbor_id").isNotNull, 1L).otherwise(0L)).as("hits_adc"),
        sum(when(col("r.neighbor_id").isNotNull, 1L).otherwise(0L)).as("hits_rerank"))
  }

  private def pqAssignSql(sub: String, cents: String): String =
    s"""SELECT vec_id, m, cid AS code FROM (
       |  SELECT s.vec_id, s.m, c.cid,
       |    row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |      ${dotDuck("s.sv", "s.sv")} - 2 * ${dotDuck("s.sv", "c.cv")}
       |        + ${dotDuck("c.cv", "c.cv")}, c.cid) AS rn
       |  FROM $sub s JOIN $cents c ON s.m = c.m)
       |WHERE rn = 1""".stripMargin

  /** CTE chain: corpus → subvectors → seed assignment → codebooks c1 →
    * final codes. No leading WITH so consumers append.
    */
  /** seeds→a1→sums→c1 codebook training over a NAMED subvector CTE (r15:
    * factored so the incremental oracle can train on the stored half).
    */
  private def pqTrainCtesOver(trainSub: String, seedBound: Long,
      p: String = ""): String = {
    // `p` prefixes every CTE name so two independently-trained codebook
    // chains (day-1 fresh + day-2 frozen) can coexist in one oracle text
    // without CTE-name collisions (incrementalRecallDriftSql).
    val dimSums = (0 until PqSub)
      .map(i => s"CAST(sum(s.sv[${i + 1}]) AS BIGINT) AS s$i").mkString(", ")
    val fdivArr = (0 until PqSub)
      .map(i => s"(s$i - ((s$i % n) + n) % n) // n").mkString("[", ", ", "]")
    s"""${p}seeds AS (
       |  SELECT m, vec_id AS cid, sv AS cv FROM $trainSub
       |  WHERE vec_id < $seedBound),
       |${p}a1 AS (${pqAssignSql(trainSub, s"${p}seeds")}),
       |${p}sums AS (
       |  SELECT s.m, a.code AS cid, count(*) AS n, $dimSums
       |  FROM $trainSub s JOIN ${p}a1 a ON s.vec_id = a.vec_id AND s.m = a.m
       |  GROUP BY s.m, a.code),
       |${p}c1 AS (SELECT m, cid, $fdivArr AS cv FROM (SELECT * FROM ${p}sums))""".stripMargin
  }

  /** The exploded-subvector CTE body over a named corpus CTE. */
  private def pqSubCteOver(corpus: String): String =
    s"""SELECT vec_id, unnest(range(0, $PqM)) AS m,
       |    unnest(list_transform(range(0, $PqM),
       |      m -> v[m * $PqSub + 1:m * $PqSub + $PqSub])) AS sv
       |  FROM $corpus""".stripMargin

  private val pqCtesSql: String =
    s"""corpus AS ($quantizedSql),
       |sub AS (
       |  ${pqSubCteOver("corpus")}),
       |${pqTrainCtesOver("sub", PqK)},
       |codes AS (${pqAssignSql("sub", "c1")})""".stripMargin

  val pqCodesSql: String =
    s"""WITH $pqCtesSql
       |SELECT vec_id, m, code FROM codes""".stripMargin

  private val pqAdcScoredSql: String =
    s"""dtab AS (
       |  SELECT q.vec_id AS query_id, q.m, c.cid,
       |    ${dotDuck("q.sv", "q.sv")} - 2 * ${dotDuck("q.sv", "c.cv")}
       |      + ${dotDuck("c.cv", "c.cv")} AS d
       |  FROM (SELECT * FROM sub WHERE vec_id < $NumQueries) q
       |  JOIN c1 c ON q.m = c.m),
       |scored AS (
       |  SELECT t.query_id, c.vec_id AS neighbor_id, CAST(sum(t.d) AS BIGINT) AS adist
       |  FROM codes c
       |  JOIN dtab t ON c.m = t.m AND c.code = t.cid AND t.query_id <> c.vec_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist, neighbor_id) AS rnk
       |  FROM scored),
       |pq_topk AS (
       |  SELECT query_id, neighbor_id, rnk, adist FROM ranked WHERE rnk <= $TopK),
       |rr_topk AS (
       |  SELECT query_id, neighbor_id, rnk, dist2 FROM (
       |    SELECT s.query_id, s.neighbor_id,
       |      q.norm - 2 * ${dotDuck("q.v", "c.v")} + c.norm AS dist2,
       |      row_number() OVER (PARTITION BY s.query_id
       |        ORDER BY q.norm - 2 * ${dotDuck("q.v", "c.v")} + c.norm,
       |          s.neighbor_id) AS rnk
       |    FROM (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= $PqShortK) s
       |    JOIN corpus q ON q.vec_id = s.query_id
       |    JOIN corpus c ON c.vec_id = s.neighbor_id)
       |  WHERE rnk <= $TopK)""".stripMargin

  val pqAdcTopKSql: String =
    s"""WITH $pqCtesSql,
       |$pqAdcScoredSql
       |SELECT query_id, neighbor_id, rnk, adist FROM pq_topk""".stripMargin

  val pqRecallSql: String =
    s"""WITH $pqCtesSql,
       |$pqAdcScoredSql,
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        q.norm - 2 * ${dotDuck("q.v", "c.v")} + c.norm, c.vec_id) AS rnk
       |    FROM (SELECT * FROM corpus WHERE vec_id < $NumQueries) q
       |    JOIN corpus c ON q.vec_id <> c.vec_id)
       |  WHERE rnk <= $TopK)
       |SELECT e.query_id, count(*) AS k,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hits_adc,
       |  CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hits_rerank
       |FROM exact e
       |LEFT JOIN pq_topk a
       |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |LEFT JOIN rr_topk r
       |  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  val pqRerankTopKSql: String =
    s"""WITH $pqCtesSql,
       |$pqAdcScoredSql
       |SELECT query_id, neighbor_id, rnk, dist2 FROM rr_topk""".stripMargin

  /** IVF-PQ oracle: the km_-prefixed kmeans training chain (the same
    * recipe as kmeansCtesSql — renamed because the PQ chain owns the
    * unprefixed seeds/a1/sums/c1 names) + cell probing + code scoring
    * restricted to probed cells + exact re-rank.
    */
  val ivfPqTopKSql: String = {
    val dimSums = (0 until EmbeddingDim)
      .map(i => s"CAST(sum(q.v[${i + 1}]) AS BIGINT) AS s$i").mkString(", ")
    val fdivArr = (0 until EmbeddingDim)
      .map(i => s"(s$i - ((s$i % n) + n) % n) // n").mkString("[", ", ", "]")
    val subDist = s"${dotDuck("q.sv", "q.sv")} - 2 * ${dotDuck("q.sv", "c.cv")}" +
      s" + ${dotDuck("c.cv", "c.cv")}"
    val exactDist = s"q.norm - 2 * ${dotDuck("q.v", "c.v")} + c.norm"
    s"""WITH $pqCtesSql,
       |km_seeds AS (
       |  SELECT vec_id AS cid, v AS cv, norm AS cnorm FROM corpus
       |  WHERE vec_id < $KmeansK),
       |km_a1 AS (${kmeansAssignSql("corpus", "km_seeds")}),
       |km_sums AS (
       |  SELECT a.cluster AS cid, count(*) AS n, $dimSums
       |  FROM corpus q JOIN km_a1 a ON q.vec_id = a.vec_id
       |  GROUP BY a.cluster),
       |km_c1 AS (
       |  SELECT cid, cv, ${dotDuck("cv", "cv")} AS cnorm
       |  FROM (SELECT cid, $fdivArr AS cv FROM km_sums)),
       |assignment AS (${kmeansAssignSql("corpus", "km_c1")}),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, ce.cid AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY q.norm - 2 * ${dotDuck("q.v", "ce.cv")} + ce.cnorm, ce.cid)
       |        AS crnk
       |    FROM (SELECT * FROM corpus WHERE vec_id < $NumQueries) q
       |    CROSS JOIN km_c1 ce)
       |  WHERE crnk <= $NProbe),
       |cand AS (
       |  SELECT p.query_id, c.vec_id FROM assignment c
       |  JOIN probes p ON c.cluster = p.cell AND p.query_id <> c.vec_id),
       |dtab AS (
       |  SELECT q.vec_id AS query_id, q.m, c.cid, $subDist AS d
       |  FROM (SELECT * FROM sub WHERE vec_id < $NumQueries) q
       |  JOIN c1 c ON q.m = c.m),
       |scored AS (
       |  SELECT n.query_id, n.vec_id AS neighbor_id, CAST(sum(t.d) AS BIGINT) AS adist
       |  FROM cand n
       |  JOIN codes k ON k.vec_id = n.vec_id
       |  JOIN dtab t ON t.query_id = n.query_id AND t.m = k.m AND t.cid = k.code
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adist, neighbor_id) AS rnk
       |    FROM scored)
       |  WHERE rnk <= $PqShortK)
       |SELECT query_id, neighbor_id, rnk, dist2 FROM (
       |  SELECT s.query_id, s.neighbor_id, $exactDist AS dist2,
       |    row_number() OVER (PARTITION BY s.query_id
       |      ORDER BY $exactDist, s.neighbor_id) AS rnk
       |  FROM short s
       |  JOIN corpus q ON q.vec_id = s.query_id
       |  JOIN corpus c ON c.vec_id = s.neighbor_id)
       |WHERE rnk <= $TopK""".stripMargin
  }

  // ------------------------------------------------------------------
  // k-NN label classification — the weak-supervision / label-propagation
  // primitive: each query vector takes the majority label of its exact
  // top-K cosine neighbors (ties: highest vote count, then smallest
  // label — both deterministic integers). Built ON the gated top-k
  // relation, so the candidate-generation scale story is inherited
  // unchanged: queries broadcast, corpus never shuffles, and everything
  // after the top-k is (queries × K) rows — driver-tiny at any corpus
  // size. `correct` compares against the vector's own stored label
  // (leave-one-out evaluation, self excluded by the top-k join).
  // ------------------------------------------------------------------
  def knnClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = cosineTopK(spark, sfDir)
      .join(broadcast(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label"))), "neighbor_id")
      .groupBy("query_id", "n_label").agg(count(lit(1)).as("votes"))
    votes
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("votes").desc, col("n_label"))))
      .where(col("rnk") === 1)
      .join(broadcast(labels.select(col("vec_id").as("query_id"),
        col("label").as("true_label"))), "query_id")
      .select(col("query_id"), col("true_label"),
        col("n_label").as("pred_label"), col("votes"),
        (col("true_label") === col("n_label")).cast("long").as("correct"))
  }

  val knnClassifySql: String =
    s"""WITH topk AS ($cosineTopKSql),
       |labels AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
       |votes AS (
       |  SELECT t.query_id, l.label AS n_label, count(*) AS votes
       |  FROM topk t JOIN labels l ON t.neighbor_id = l.vec_id
       |  GROUP BY 1, 2),
       |pred AS (
       |  SELECT query_id, n_label AS pred_label, votes FROM (
       |    SELECT query_id, n_label, votes,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY votes DESC, n_label) AS rnk
       |    FROM votes)
       |  WHERE rnk = 1)
       |SELECT p.query_id, l.label AS true_label, p.pred_label, p.votes,
       |  CAST(l.label = p.pred_label AS BIGINT) AS correct
       |FROM pred p JOIN labels l ON p.query_id = l.vec_id""".stripMargin

  // ------------------------------------------------------------------
  // Does the sublinear index change the DECISION? The exact k-NN vote
  // is the oracle; rerunning the same vote over the multiprobe-LSH
  // top-k (~9/256 of the corpus per query) measures prediction
  // agreement — the metric that matters for classification is label
  // agreement, not neighbor recall (two different neighbor sets often
  // vote the same way). Integer counts only.
  // ------------------------------------------------------------------
  // Day-2 ANN index maintenance (r15) — the incremental discipline
  // (stored ⊕ Δ ≡ recompute; Curation.incrementalSourceSigs' contract)
  // applied to the VECTOR tier. A production embedding pipeline never
  // retrains its coarse quantizer / codebooks per ingest batch: the
  // index structures are trained once (day 1), frozen, and each new
  // batch is ASSIGNED to them — per-batch cost |Δ|·k (IVF) / |Δ|·M·K
  // (PQ) distance kernels, zero stored-corpus rescans, zero retrains.
  // Split: even vec_ids = the stored day-1 corpus (trains the
  // structures AND carries its stored code relation), odd = the day-2
  // batch. The merge is a disjoint union — cell/code relations are
  // per-vector rows, so unlike distinct counts they merge trivially;
  // what the gate pins is that assignment against FROZEN structures is
  // a pure per-row function: the oracle recomputes EVERY vector's
  // assignment from the stored-trained centroids/codebooks and the
  // merged relation must hash-match it row for row. At 100 TB the
  // batch arm is the only recurring cost; the centroids/codebooks ride
  // a k-row broadcast exactly as in the day-1 trainer.
  // ------------------------------------------------------------------

  /** Stored-trained k-means centroids: the day-1 Lloyd chain over even
    * vec_ids only, seeded by the first K even ids (< 2K). Registry-
    * persisted — day 2 must NOT pay the training pass again.
    */
  private def incrIvfCentroids(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"similarity.incrIvfCents:$sfDir") {
      kmeansChainOver(
        quantized(spark, sfDir).where(col("vec_id") % 2 === 0),
        2 * KmeansK, KmeansIters)._1
    }

  /** The day-2 arm in isolation — the odd-id batch assigned to the FROZEN
    * stored-trained centroids. Public so the spec can pin its
    * batch-proportional shape (output = |Δ| rows; plan carries the batch
    * predicate; the centroid side is the registry's k-row relation).
    */
  def ivfBatchArm(spark: SparkSession, sfDir: String): DataFrame =
    kmeansAssignOver(quantized(spark, sfDir).where(col("vec_id") % 2 === 1),
      incrIvfCentroids(spark, sfDir))

  def incrementalIvfCodes(spark: SparkSession, sfDir: String): DataFrame =
    kmeansAssignOver(quantized(spark, sfDir).where(col("vec_id") % 2 === 0),
        incrIvfCentroids(spark, sfDir))
      .unionAll(ivfBatchArm(spark, sfDir))

  val incrementalIvfCodesSql: String =
    s"""WITH corpus AS ($quantizedSql),
       |stored AS (SELECT * FROM corpus WHERE vec_id % 2 = 0),
       |${kmeansTrainCtesOver("stored", 2 * KmeansK)}
       |${kmeansAssignSql("corpus", "c1")}""".stripMargin

  /** Stored-trained PQ codebooks (even ids, seeds < 2K), frozen for the
    * day-2 batch — registry-persisted like [[incrIvfCentroids]].
    */
  private def incrPqCodebooks(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"similarity.incrPqCb:$sfDir") {
      pqCodebooksOver(
        pqSubvectors(spark, sfDir).where(col("vec_id") % 2 === 0), 2 * PqK)
    }

  /** PQ twin of [[ivfBatchArm]]: the odd-id batch encoded against the
    * frozen stored-trained codebooks.
    */
  def pqBatchArm(spark: SparkSession, sfDir: String): DataFrame =
    pqAssign(pqSubvectors(spark, sfDir).where(col("vec_id") % 2 === 1),
      incrPqCodebooks(spark, sfDir))

  def incrementalPqCodes(spark: SparkSession, sfDir: String): DataFrame =
    pqAssign(pqSubvectors(spark, sfDir).where(col("vec_id") % 2 === 0),
        incrPqCodebooks(spark, sfDir))
      .unionAll(pqBatchArm(spark, sfDir))

  val incrementalPqCodesSql: String =
    s"""WITH corpus AS ($quantizedSql),
       |sub AS (
       |  ${pqSubCteOver("corpus")}),
       |storedsub AS (SELECT * FROM sub WHERE vec_id % 2 = 0),
       |${pqTrainCtesOver("storedsub", 2 * PqK)}
       |${pqAssignSql("sub", "c1")}""".stripMargin

  /** Retrain decision threshold for [[incrementalRecallDrift]]: retrain
    * when the frozen-structure index loses more than this many
    * percentage points of aggregate recall@k vs a fresh retrain on
    * stored ⊕ Δ. 10 points is the classic serving-SLA knee: below it
    * the day-2 assignment cost (|Δ|-proportional) keeps winning; above
    * it the index has drifted out from under its quantizer and the
    * one-off retrain pays for itself in recall.
    */
  val DriftTolerancePct = 10L

  /** The day-2 question the incremental paths leave open: HOW GOOD is
    * the frozen-structure index, and WHEN should an operator retrain?
    * Per query: recall hits@k of (a) the FROZEN index — day-1 codebooks
    * trained on the stored half, whole stored ⊕ Δ corpus encoded against
    * them ([[incrementalPqCodes]], already gated) — and (b) a FRESH
    * retrain over stored ⊕ Δ (the day-1 trainer on the full corpus =
    * [[pqAdcTopK]]'s index), both against the exact integer-L2 top-k.
    * `retrain` closes the loop into a decision: 1 iff the aggregate
    * fresh-minus-frozen hit gap exceeds [[DriftTolerancePct]] points of
    * the total k. Deterministic integer arithmetic end to end, so the
    * whole row — estimates AND decision — hash-gates.
    */
  def incrementalRecallDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val frozen = pqAdcRankedOver(spark, sfDir,
        incrPqCodebooks(spark, sfDir), incrementalPqCodes(spark, sfDir))
      .where(col("rnk") <= TopK).select("query_id", "neighbor_id")
    val per = exactTopKNeighbors(spark, sfDir).as("e")
      .join(frozen.as("f"),
        col("e.query_id") === col("f.query_id") &&
          col("e.neighbor_id") === col("f.neighbor_id"), "left")
      .join(pqAdcTopK(spark, sfDir).as("a"),
        col("e.query_id") === col("a.query_id") &&
          col("e.neighbor_id") === col("a.neighbor_id"), "left")
      .groupBy(col("e.query_id").as("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("f.neighbor_id").isNotNull, 1L).otherwise(0L))
          .as("hits_frozen"),
        sum(when(col("a.neighbor_id").isNotNull, 1L).otherwise(0L))
          .as("hits_fresh"))
    // The decision reads the AGGREGATE gap (one retrain serves all
    // queries); the window is global over a NumQueries-row relation.
    val all = Window.partitionBy(lit(1))
    per.withColumn("retrain",
      when((sum("hits_fresh").over(all) - sum("hits_frozen").over(all)) *
          lit(100L) > lit(DriftTolerancePct) * sum("k").over(all), 1L)
        .otherwise(0L))
  }

  val incrementalRecallDriftSql: String =
    s"""WITH $pqCtesSql,
       |$pqAdcScoredSql,
       |storedsub AS (SELECT * FROM sub WHERE vec_id % 2 = 0),
       |${pqTrainCtesOver("storedsub", 2 * PqK, "f_")},
       |fcodes AS (${pqAssignSql("sub", "f_c1")}),
       |fdtab AS (
       |  SELECT q.vec_id AS query_id, q.m, c.cid,
       |    ${dotDuck("q.sv", "q.sv")} - 2 * ${dotDuck("q.sv", "c.cv")}
       |      + ${dotDuck("c.cv", "c.cv")} AS d
       |  FROM (SELECT * FROM sub WHERE vec_id < $NumQueries) q
       |  JOIN f_c1 c ON q.m = c.m),
       |fscored AS (
       |  SELECT t.query_id, c.vec_id AS neighbor_id,
       |    CAST(sum(t.d) AS BIGINT) AS adist
       |  FROM fcodes c
       |  JOIN fdtab t ON c.m = t.m AND c.code = t.cid AND t.query_id <> c.vec_id
       |  GROUP BY 1, 2),
       |f_topk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY adist, neighbor_id) AS rnk
       |    FROM fscored)
       |  WHERE rnk <= $TopK),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        q.norm - 2 * ${dotDuck("q.v", "c.v")} + c.norm, c.vec_id) AS rnk
       |    FROM (SELECT * FROM corpus WHERE vec_id < $NumQueries) q
       |    JOIN corpus c ON q.vec_id <> c.vec_id)
       |  WHERE rnk <= $TopK),
       |per AS (
       |  SELECT e.query_id, count(*) AS k,
       |    CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits_frozen,
       |    CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits_fresh
       |  FROM exact e
       |  LEFT JOIN f_topk f
       |    ON e.query_id = f.query_id AND e.neighbor_id = f.neighbor_id
       |  LEFT JOIN pq_topk a
       |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |  GROUP BY e.query_id)
       |SELECT query_id, k, hits_frozen, hits_fresh,
       |  CASE WHEN (sum(hits_fresh) OVER () - sum(hits_frozen) OVER ()) * 100 >
       |      $DriftTolerancePct * sum(k) OVER ()
       |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS retrain
       |FROM per""".stripMargin

  // ------------------------------------------------------------------
  private def voteOver(topk: DataFrame, labels: DataFrame): DataFrame =
    topk.join(broadcast(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label"))), "neighbor_id")
      .groupBy("query_id", "n_label").agg(count(lit(1)).as("votes"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("votes").desc, col("n_label"))))
      .where(col("rnk") === 1)
      .select(col("query_id"), col("n_label"))

  def knnAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val exact = voteOver(cosineTopK(spark, sfDir), labels)
      .withColumnRenamed("n_label", "exact_label")
    val approx = voteOver(lshMultiprobeTopK(spark, sfDir), labels)
      .withColumnRenamed("n_label", "lsh_label")
    exact.join(approx, Seq("query_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        sum(coalesce((col("exact_label") === col("lsh_label")).cast("long"),
          lit(0L))).as("n_agree"))
  }

  val knnAgreementSql: String = {
    def voteSql(topk: String): String =
      s"""SELECT query_id, n_label FROM (
         |  SELECT query_id, n_label,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY votes DESC, n_label) AS rnk
         |  FROM (
         |    SELECT t.query_id, l.label AS n_label, count(*) AS votes
         |    FROM ($topk) t
         |    JOIN (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings) l
         |      ON t.neighbor_id = l.vec_id
         |    GROUP BY 1, 2))
         |WHERE rnk = 1""".stripMargin
    s"""WITH exact AS (${voteSql(cosineTopKSql)}),
       |approx AS (${voteSql(lshMultiprobeTopKSql)})
       |SELECT count(*) AS n_queries,
       |  CAST(sum(CASE WHEN a.n_label = e.n_label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_agree
       |FROM exact e LEFT JOIN approx a ON e.query_id = a.query_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_knn_classify" -> (knnClassify _),
    "s_knn_agreement" -> (knnAgreement _),
    "s_pq_codes" -> (pqCodes _),
    "s_pq_adc_topk" -> (pqAdcTopK _),
    "s_pq_rerank_topk" -> (pqRerankTopK _),
    "s_ivfpq_topk" -> (ivfPqTopK _),
    "s_pq_recall" -> (pqRecall _),
    "s_cosine_topk" -> (cosineTopK _),
    "s_lsh_bucket_stats" -> (lshBucketStats _),
    "s_lsh_topk" -> (lshTopK _),
    "s_lsh_multiprobe_topk" -> (lshMultiprobeTopK _),
    "s_hard_negatives" -> (hardNegatives _),
    "s_ivf_topk" -> (ivfTopK _),
    "s_kmeans_train" -> (kmeansTrain _),
    "s_kmeans_inertia" -> (kmeansInertia _),
    "s_ivf_kmeans_topk" -> (ivfKmeansTopK _),
    "s_incremental_ivf_codes" -> (incrementalIvfCodes _),
    "s_incremental_pq_codes" -> (incrementalPqCodes _),
    "s_incremental_recall_drift" -> (incrementalRecallDrift _))

  val oracles: Map[String, String] = Map(
    "s_knn_classify" -> knnClassifySql,
    "s_knn_agreement" -> knnAgreementSql,
    "s_pq_codes" -> pqCodesSql,
    "s_pq_adc_topk" -> pqAdcTopKSql,
    "s_pq_rerank_topk" -> pqRerankTopKSql,
    "s_ivfpq_topk" -> ivfPqTopKSql,
    "s_pq_recall" -> pqRecallSql,
    "s_cosine_topk" -> cosineTopKSql,
    "s_lsh_bucket_stats" -> lshBucketStatsSql,
    "s_lsh_topk" -> lshTopKSql,
    "s_lsh_multiprobe_topk" -> lshMultiprobeTopKSql,
    "s_hard_negatives" -> hardNegativesSql,
    "s_ivf_topk" -> ivfTopKSql,
    "s_kmeans_train" -> kmeansTrainSql,
    "s_kmeans_inertia" -> kmeansInertiaSql,
    "s_ivf_kmeans_topk" -> ivfKmeansTopKSql,
    "s_incremental_ivf_codes" -> incrementalIvfCodesSql,
    "s_incremental_pq_codes" -> incrementalPqCodesSql,
    "s_incremental_recall_drift" -> incrementalRecallDriftSql)
}
