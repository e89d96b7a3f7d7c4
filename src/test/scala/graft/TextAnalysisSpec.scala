package graft

/** Quality-analysis specs (deciles exact + sketch, histogram, binned
  * cutpoints) over the sf0.001 fixture — moved out of DedupSpec (r15,
  * ADVICE: these exercise TextAnalysis operators exclusively).
  */
class TextAnalysisSpec extends SparkSpec {

  test("repetition stats hashed: equals the string twin wherever the argmax is untied, fingerprint tiebreak and merge semantics on hand-built docs") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val s = operators.TextAnalysis.repetitionStats(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_token_frac_e6"),
          r.getAs[String]("top_bigram"), r.getAs[Long]("top_bigram_cnt"),
          r.getAs[Long]("top_bigram_frac_e6"))).toMap
    val h = operators.TextAnalysis.repetitionStatsHashed(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_token_frac_e6"),
          r.getAs[String]("top_bigram"), r.getAs[Long]("top_bigram_cnt"),
          r.getAs[Long]("top_bigram_frac_e6"))).toMap
    assert(h.keySet === s.keySet)
    // Counts and fractions agree EVERYWHERE (no 62-bit collisions on the
    // fixture); the display gram may differ only on count-tied docs.
    h.foreach { case (id, (nt, dup, gram, cnt, frac)) =>
      val (snt, sdup, sgram, scnt, sfrac) = s(id)
      assert(nt === snt, id); assert(dup === sdup, id)
      assert(cnt === scnt, id); assert(frac === sfrac, id)
      if (gram != sgram) {
        // a genuine tie: both grams must reach the winning count — check
        // by recounting the hashed twin's winner in the raw text
        val text = Tables.documents(spark, sfDir)
          .where(col("doc_id") === id).head().getAs[String]("text")
        val toks = text.split(" ", -1)
        val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
        assert(counts(gram) === cnt, s"doc $id: hashed winner not at max count")
        assert(counts(sgram) === cnt, s"doc $id: string winner not at max count")
      }
    }
    // Hand-built tie: "a b" and "c d" both occur twice. The string twin
    // picks the lexicographically larger gram; the hashed twin picks the
    // larger 62-bit fingerprint — assert exactly that.
    val tieText = "a b a b x c d y c d"
    val dir = writeFixture(documents = Seq(doc(0L, tieText)))
    def top(df: org.apache.spark.sql.DataFrame): (String, Long) = {
      val r = df.head()
      (r.getAs[String]("top_bigram"), r.getAs[Long]("top_bigram_cnt"))
    }
    val (sg, sc) = top(operators.TextAnalysis.repetitionStats(spark, dir))
    val (hg, hc) = top(operators.TextAnalysis.repetitionStatsHashed(spark, dir))
    assert(sc === 2L && hc === 2L)
    assert(sg === "c d") // lexicographic tiebreak
    import org.apache.spark.unsafe.types.UTF8String
    def fp(g: String): Long =
      functions.TextKernels.polyHash(UTF8String.fromString(g))
    val expectHashed = if (fp("a b") > fp("c d")) "a b" else "c d"
    assert(hg === expectHashed, s"fingerprint tiebreak (fp(a b)=${fp("a b")}, fp(c d)=${fp("c d")})")
    // Collision-merge semantics, demonstrated on the fold itself: two
    // EQUAL hash values in separate runs of the sorted array count as
    // one run after sorting — planted directly as a duplicated token
    // pair ("e f ... e f"), whose two occurrences are a genuine merge
    // the display recovery resolves to the first position.
    val mergeText = "e f q e f q e f"
    val dirM = writeFixture(documents = Seq(doc(0L, mergeText)))
    val (mg, mc) = top(operators.TextAnalysis.repetitionStatsHashed(spark, dirM))
    assert(mg === "e f" && mc === 3L)
  }

  test("quality deciles: balanced NTILE buckets with non-increasing score ranges") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = operators.TextAnalysis.qualityDeciles(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("decile"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("min_score"),
        r.getAs[Double]("max_score")))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    val srcCounts = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    bySource.foreach { case (src, ds) =>
      val sorted = ds.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to 10L), src)
      // NTILE balance: bucket sizes differ by at most one, masses sum up.
      assert(sorted.map(_._3).max - sorted.map(_._3).min <= 1, src)
      assert(sorted.map(_._3).sum === srcCounts(src), src)
      // Score ranges are ordered: a better decile never dips below the
      // next one's top.
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0)._4 >= w(1)._5, src)
      }
    }
  }

  test("quality deciles approx: sketch cutpoints bucket every doc, strict bucket ordering, mass conserved") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = operators.TextAnalysis.qualityDecilesApprox(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
        r.getAs[Double]("min_score"), r.getAs[Double]("max_score")))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    val srcCounts = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    // Token mass must agree with the exact NTILE form — same rows, only
    // the bucket boundaries differ.
    val exactTokens = operators.TextAnalysis.qualityDeciles(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("sum_tokens"))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    bySource.foreach { case (src, ds) =>
      val sorted = ds.sortBy(_._2)
      // buckets live in 1..10 (duplicate cutpoints may skip some)
      assert(sorted.forall(d => d._2 >= 1L && d._2 <= 10L), src)
      assert(sorted.map(_._3).sum === srcCounts(src), src)
      assert(sorted.map(_._4).sum === exactTokens(src), src)
      // ascending orientation: a higher bucket sits strictly above the
      // previous bucket's top score (scores equal to a cutpoint fall low)
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1)._5 > w(0)._6, src)
      }
    }
    // The bounded histogram conserves the same masses: per-source doc
    // and token totals agree with the decile relations, bins stay in
    // the fixed [0, 99] grid (the state-bound argument of the twin).
    val hist = operators.TextAnalysis.qualityHistogram(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))
    assert(hist.forall(h => h._2 >= 0L && h._2 <= 99L))
    hist.groupBy(_._1).foreach { case (src, bs) =>
      assert(bs.map(_._3).sum === srcCounts(src), src)
      assert(bs.map(_._4).sum === exactTokens(src), src)
    }
    // Binned cutpoints land in EXACTLY the bin of the sketch cutpoint:
    // scores map monotonically to bins, so the first bin whose cumsum
    // reaches ceil(p·n) is the rank-ceil element's bin. The sketch
    // cutpoint array is ascending p = 0.1 … 0.9, index k ↔ p10 = k+1.
    val binned = operators.TextAnalysis.qualityCutpointsBinned(spark, sfDir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("p10")) ->
        r.getAs[Long]("cut_bin")).toMap
    val sketchBins = {
      import org.apache.spark.sql.functions._
      // recompute the cutpoints the same way the operator does, bin them
      val q = operators.TextAnalysis.qualityScore(spark, sfDir)
        .select(col("doc_id"), col("quality_score"))
        .join(graft.Tables.documents(spark, sfDir).select("doc_id", "source"), "doc_id")
      q.groupBy("source").agg(expr(
          s"approx_percentile(quality_score, array(${operators.TextAnalysis.DecilePs.map(p => s"${p}D").mkString(", ")}), " +
            s"${operators.Analytics.ApproxQuantileAccuracy})").as("cuts"))
        .select(col("source"), posexplode(col("cuts")).as(Seq("k", "c")))
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("k") + 1L) ->
          math.min(math.floor(r.getAs[Double]("c") * 100.0).toLong, 99L)).toMap
    }
    assert(binned.keySet === sketchBins.keySet)
    binned.foreach { case (k, b) => assert(b === sketchBins(k), k) }
  }

}
