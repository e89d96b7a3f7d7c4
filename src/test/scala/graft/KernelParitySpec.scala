package graft

import graft.functions.{Parity, TextHashOps}
import org.apache.spark.sql.functions._

/** The codegen kernels (PolyHash / WordShingleHashes) must agree exactly
  * with the higher-order-function expression forms in functions.Parity —
  * which are the readable spec AND the source of the DuckDB oracle SQL.
  * Random strings include multi-space runs, empty tokens, unicode, and
  * short docs (< w tokens).
  */
class KernelParitySpec extends SparkSpec {

  private def randomTexts: Seq[String] = {
    val rnd = new scala.util.Random(99)
    val words = Seq("the", "spark", "Σπάρκ", "日本", "a", "", "naïve", "zz")
    (0 until 60).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    } ++ Seq("", " ", "  ", "one", "one two", "one two three four")
  }

  test("PolyHash == HOF charPolyHash on random unicode strings") {
    val s = spark
    import s.implicits._
    val df = randomTexts.toDF("text")
    val diff = df.select(
        TextHashOps.polyHash(col("text")).as("kernel"),
        expr(Parity.charPolyHashSpark("text")).as("hof"))
      .where(col("kernel") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("WordShingleHashes(w=3, distinct) == HOF shingle pipeline") {
    val s = spark
    import s.implicits._
    val df = randomTexts.toDF("text")
    val hof = Parity.hashedArraySpark(Parity.shinglesSpark(Parity.tokensSpark("text"), 3))
    val diff = df.select(
        TextHashOps.shingleHashes(col("text"), 3).as("kernel"),
        expr(hof).as("hof"))
      .where(col("kernel") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("shingleHashes(w=1, non-distinct, narrow) == HOF 31-bit token-hash pipeline") {
    // The featureHash fingerprint path (TextAnalysis.featureHash) and its
    // DuckDB oracle both assume this identity.
    val s = spark
    import s.implicits._
    val df = randomTexts.toDF("text")
    val hof = Parity.hashedArraySpark(Parity.tokensSpark("text"))
    val diff = df.select(
        TextHashOps.shingleHashes(col("text"), 1, distinct = false).as("kernel"),
        expr(hof).as("hof"))
      .where(col("kernel") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("tokenHashes (w=1, non-distinct, wide) == HOF 62-bit token-hash pipeline") {
    val s = spark
    import s.implicits._
    val df = randomTexts.toDF("text")
    val hof = Parity.hashedArray64Spark(Parity.tokensSpark("text"))
    val diff = df.select(
        TextHashOps.tokenHashes(col("text")).as("kernel"),
        expr(hof).as("hof"))
      .where(col("kernel") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("codegen LSH bucket == HOF lshBucketSpark on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(50)(Array.fill(Parity.EmbeddingDim)(rnd.nextLong(2000001L) - 1000000L))
      .toDF("v")
    val kernelBucket = (0 until Parity.NumPlanes).map { j =>
      val plane = array(Parity.planes(j).map(x => lit(x.toLong)): _*)
      when(graft.functions.VectorOps.longDot(col("v"), plane) > 0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val diff = df.select(kernelBucket.as("kernel"),
        expr(Parity.lshBucketSpark("v")).as("hof"))
      .where(col("kernel") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("SimHash64 kernel == grouped-aggregation simhash, bit for bit") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    val df = randomTexts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    // The grouped form (explode + per-bit SUMs + majority fold) — the
    // oracle's formulation — must equal the one-pass kernel per doc, and
    // the SQL-registered function must equal the Column API.
    val grouped = df
      .select(col("doc_id"), explode(TextHashOps.tokenHashes(col("text"))).as("h"))
      .groupBy("doc_id")
      .agg(expr(Parity.simhashAggSpark("h").head),
        Parity.simhashAggSpark("h").tail.map(expr): _*)
      .select(col("doc_id"), expr(Parity.simhashFromCounts).as("agg_form"))
    val diff = df
      .select(col("doc_id"), TextHashOps.simHash(col("text")).as("kernel"),
        expr("simhash64(text)").as("sql_form"))
      .join(grouped, "doc_id")
      .where(col("kernel") =!= col("agg_form") || col("kernel") =!= col("sql_form"))
    assert(diff.count() === 0)
  }

  test("MinHashSigs kernel == grouped 32-min aggregation") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    val df = randomTexts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val grouped = df
      .select(col("doc_id"),
        explode(TextHashOps.shingleHashes(col("text"), 3)).as("sh"))
      .groupBy("doc_id")
      .agg(expr(Parity.minhashAggSpark("sh").head),
        Parity.minhashAggSpark("sh").tail.map(expr): _*)
      .select(col("doc_id"), expr(Parity.minhashSigFromCols).as("agg_form"))
    val kernel = df
      .select(col("doc_id"), TextHashOps.minhashSigs(col("text"), 3).as("kernel"),
        expr("minhash_sigs(text, 3)").as("sql_form"))
      .where(size(col("kernel")) > 0)
    // Inner join: the kernel's empty-array docs are exactly the grouped
    // form's dropped groups — assert the same doc set survives, and the
    // surviving signatures agree on every slot.
    assert(kernel.count() === grouped.count())
    val diff = kernel.join(grouped, "doc_id")
      .where(col("kernel") =!= col("agg_form") || col("kernel") =!= col("sql_form"))
    assert(diff.count() === 0)
  }

  test("SQL registration: poly_hash / word_shingle_hashes / long_vector_dot") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT poly_hash('abc') AS h,
        |       word_shingle_hashes('a b c d', 3, true) AS sh,
        |       long_vector_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d
        |""".stripMargin).head()
    // hashA('abc') = 96354 (base 31 mod P), hashB('abc') = 136518
    // (base 37 mod P2), packed hi/lo.
    assert(r.getAs[Long]("h") === 96354L * Parity.Pack + 136518L)
    assert(r.getAs[Seq[Long]]("sh").length === 2)
    assert(r.getAs[Long]("d") === 32L)
  }

  test("SortedLongJoinCount == HOF equi-join fold on random multisets") {
    // The PPJoin verify kernel: Σ_v cnt_a(v)·cnt_b(v) over two ascending
    // arrays — must equal the interpreted O(|A|·|B|) fold (the r5–r14
    // verify form and the readable spec) on arrays WITH duplicate values,
    // including empty arrays and disjoint arrays.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val pairs = (0 until 80).map { _ =>
      def arr() = Array.fill(rnd.nextInt(20))(rnd.nextLong(12L)).sorted
      (arr(), arr())
    } :+ ((Array.empty[Long], Array(1L, 1L, 2L))) :+
      ((Array(5L, 5L, 5L), Array(5L, 5L))) :+
      ((Array(1L, 3L), Array(2L, 4L)))
    val df = pairs.toDF("fa", "fb")
    val diff = df.select(
        graft.functions.VectorOps.sortedJoinCountUnchecked(col("fa"), col("fb"))
          .as("kernel"),
        expr("aggregate(fa, 0L, (acc, x) -> acc + size(filter(fb, y -> y = x)))")
          .as("hof"))
      .where(col("kernel") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("SQL registration: word_shingle_hashes 4th arg (wide) == tokenHashes kernel") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    // The optional `wide` SQL argument takes the args.length > 3 branch of
    // the registration builder — assert it equals both the Column-API
    // kernel and the 62-bit HOF pipeline on the same strings.
    val df = randomTexts.toDF("text")
    val diff = df.selectExpr(
        "text",
        "word_shingle_hashes(text, 1, false, true) AS sql_wide",
        s"${Parity.hashedArray64Spark(Parity.tokensSpark("text"))} AS hof")
      .withColumn("kernel", TextHashOps.tokenHashes(col("text")))
      .where(col("sql_wide") =!= col("hof") || col("sql_wide") =!= col("kernel"))
    assert(diff.count() === 0)
  }
}
