package graft

import graft.operators.{Dedup, TextAnalysis}

/** Dedup + text-analysis specs on planted fixtures: exact duplicates,
  * high-Jaccard near-duplicates, and unrelated documents.
  */
class DedupSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog again and again tomorrow"
  private val other =
    "completely different words about spark shuffles and window functions"

  private def fixture(): String = writeFixture(documents = Seq(
    doc(0, base), doc(1, base), doc(2, nearDup), doc(3, other)))

  test("exact dedup keeps the lowest doc_id and counts duplicates") {
    val dir = fixture()
    val got = rows(Dedup.exactDedup(spark, dir))
    assert(got === Set(Seq(0L, 2L), Seq(2L, 1L), Seq(3L, 1L)))
  }

  test("n-gram jaccard finds the exact and near pairs, not the unrelated one") {
    val dir = fixture()
    val pairs = Dedup.jaccardPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("prefix-filtered jaccard equals brute force at its threshold") {
    val dir = fixture()
    val brute = Dedup.jaccardPairs(spark, dir).collect()
      .filter(r => r.getAs[Long]("inter") * Dedup.PrefixJaccDen >
        r.getAs[Long]("uni") * Dedup.PrefixJaccNum)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    val prefix = Dedup.jaccardPrefixPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    assert(prefix === brute)
    assert(prefix.nonEmpty)
  }

  test("multiset join-count semantics: colliding shingle hashes count " +
      "with multiplicity in both jaccard arms (the sf10 shard event, " +
      "pinned at fixture scale)") {
    // Find two distinct tokens whose 31-bit polynomial hashes collide —
    // reproducing, deterministically and at gate scale, the duplicate
    // shingle hash an sf10 shard first produced (r15: one pair off by
    // one under array_intersect set semantics). Birthday over P ≈ 2^31
    // needs ~6·10^4 draws; the token sequence is fixed, so the found
    // pair is stable across runs.
    // NOT "w" + i: over an alphabet smaller than the base the base-31
    // polynomial is carry-free, hence injective on same-length numeric
    // suffixes — digit-indexed tokens NEVER collide. Random lowercase
    // tokens of length 6–16 wrap the modulus chaotically and collide at
    // birthday density (seeded → the found pair is stable across runs).
    val rnd = new scala.util.Random(7)
    val seen = new java.util.HashMap[Long, String]()
    var coll: (String, String) = null
    var i = 0
    while (coll == null && i < 600000) {
      val t = new String(Array.fill(6 + rnd.nextInt(11))(
        ('a' + rnd.nextInt(26)).toChar))
      val h = graft.functions.TextKernels.shingleHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 1,
        distinct = false, wide = false).getLong(0)
      val prev = seen.putIfAbsent(h, t)
      if (prev != null && prev != t) coll = (prev, t)
      i += 1
    }
    assert(coll != null, "no 31-bit collision within 600k tokens")
    val (u, v) = coll
    // Doc 0 holds BOTH colliding trigrams "u x y" and "v x y": distinct
    // shingle STRINGS (per-doc distinctness keeps both) with EQUAL
    // hashes — a genuine duplicate value inside one shingle array.
    // Doc 1 is doc 0 plus one trailing token. Shared hash counts:
    // h×2 in both docs (4 join rows), plus "x y v" and "y v x" once
    // each → inter = 2·2 + 1 + 1 = 6 with na = 4, nb = 5, uni = 3.
    // Set semantics would give inter = 3, uni = 6, and 3·2 > 6 is
    // FALSE — the pair vanishes entirely under the array_intersect bug.
    val dir = writeFixture(documents = Seq(
      doc(0, s"$u x y $v x y"),
      doc(1, s"$u x y $v x y z")))
    val expected = Set((0L, 1L, 6L, 3L))
    val prefix = Dedup.jaccardPrefixPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    val exact = Dedup.jaccardPairs(spark, dir).collect()
      .filter(r => r.getAs[Long]("inter") * Dedup.PrefixJaccDen >
        r.getAs[Long]("uni") * Dedup.PrefixJaccNum)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    assert(prefix === expected)
    assert(exact === expected)
  }

  test("adaptive jaccard: decision parity with the driver-recomputed grid " +
      "and output invariance across both arms") {
    val dir = fixture()
    // FULL driver-side recompute of the decision statistic: shingle
    // hashes via the engine kernel (distinct per doc, w = ShingleW),
    // the CMS grid over the same coefficient family, est = min_j Σcnt².
    val texts = Tables.documents(spark, dir).select("text").collect()
      .map(_.getString(0))
    val occ = texts.flatMap { t =>
      val arr = graft.functions.TextKernels.shingleHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        Dedup.ShingleW, distinct = true, wide = false)
      (0 until arr.numElements()).map(arr.getLong)
    }
    val P = graft.functions.Parity.P
    val perDepth = graft.operators.Sketches.cmsCoeffs.map { case (a, b) =>
      val cells = occ.groupBy(h => ((a * h + b) % P) % Dedup.AdaptiveCmsWidth)
        .map(_._2.length.toLong)
      (cells.map(c => c * c).sum, cells.sum)
    }
    val est = perDepth.map(_._1).min
    val sumDf = perDepth.map(_._2).max
    val arm = if (est <= sumDf * Dedup.AdaptiveBudgetPerRow) "exact" else "prefix"
    val got = Dedup.adaptiveJaccardDecision(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getAs[Long]("est_sjs"), r.getAs[Long]("sum_df"),
      r.getAs[Long]("budget"), r.getAs[String]("arm")) ===
      ((est, sumDf, sumDf * Dedup.AdaptiveBudgetPerRow, arm)))
    // Output invariance: the adaptive plan, the exact arm, and the
    // prefix arm all produce the same J > 1/2 relation.
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"),
        x.getAs[Long]("inter"), x.getAs[Long]("uni"))).toSet
    val exactArm = pairSet(Dedup.jaccardPairs(spark, dir)
      .where(org.apache.spark.sql.functions.expr(
        s"inter * ${Dedup.PrefixJaccDen} > uni * ${Dedup.PrefixJaccNum}")))
    val prefixArm = pairSet(Dedup.jaccardPrefixPairs(spark, dir))
    val adaptive = pairSet(Dedup.adaptiveJaccardPairs(spark, dir))
    assert(adaptive.nonEmpty && adaptive === exactArm && adaptive === prefixArm)
    // On this 4-doc fixture the estimate must land on the exact arm
    // (tiny Σdf²) — the prefix choice is exercised by the sf1 scale gate,
    // where the composed oracle pins the OTHER branch.
    assert(arm === "exact")
  }

  test("containment pairs detect an embedded copy that jaccard misses") {
    def ws(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    // A (20 words) is a strict prefix of B (50 words): full containment,
    // but Jaccard(A, B) over rare sets is 18/21 on B's side and the raw
    // set Jaccard is 18/48 — the asymmetric signal. D shares only 3
    // rare shingles with B while its own rare set (13 shared with copy
    // E) is large → (B, D) falls under the 50% gate. C is all-unique:
    // no rare shingles, never paired.
    val dir = writeFixture(documents = Seq(
      doc(0, ws("a", 20)),
      doc(1, ws("a", 20) + " " + ws("b", 30)),
      doc(2, ws("c", 10)),
      doc(3, ws("b", 5) + " " + ws("d", 15)),
      doc(4, ws("d", 15))))
    val got = operators.Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        ((r.getAs[Long]("inter"), r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Long]("containment_ppm")))).toMap
    assert(got((0L, 1L)) === ((18L, 18L, 21L, 1000000L)))
    assert(got((3L, 4L)) === ((13L, 16L, 13L, 1000000L)))
    assert(!got.contains((1L, 3L)))
    assert(!got.keySet.exists(k => k._1 == 2L || k._2 == 2L))
  }

  test("incremental dedup keeps only batch docs novel vs corpus and batch") {
    // Corpus (even ids): texts A, B. Batch (odd ids): 1=A (cross-batch
    // dup, dropped), 3=C and 5=C (intra-batch dup pair → keep 3 with
    // batch_dups=2), 7=D (novel singleton).
    val dir = writeFixture(documents = Seq(
      doc(0, "text A"), doc(2, "text B"),
      doc(1, "text A"), doc(3, "text C"), doc(5, "text C"), doc(7, "text D")))
    val got = rows(Dedup.incrementalDedup(spark, dir))
    assert(got === Set(Seq(3L, 2L), Seq(7L, 1L)))
  }

  test("duplicate-shingle stats count corpus-shared shingles per doc") {
    // doc 0/1 share exactly the shingle "a b c" (1 of each doc's 2); doc 2
    // shares nothing; doc 3 is below the shingle width and drops out.
    val dir = writeFixture(documents = Seq(
      doc(0, "a b c d"), doc(1, "a b c e"), doc(2, "x y z w"), doc(3, "q r")))
    val got = Dedup.dupShingleStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("dup_frac"), r.getAs[Boolean]("flagged")))).toMap
    assert(got === Map(
      0L -> ((2L, 1L, 0.5, true)),
      1L -> ((2L, 1L, 0.5, true)),
      2L -> ((2L, 0L, 0.0, false))))
  }

  test("modality agreement reports embedding cosine per text near-dup pair") {
    // Docs 0 and 1: identical text (simhash pair at hamming 0) AND
    // identical embeddings → the pair must surface with cos ≈ 1 and
    // dot == both norms. Doc 2 is unrelated in both modalities.
    val v = Array.tabulate(16)(i => 0.1f * (i % 3 + 1))
    val dir = writeFixture(
      documents = Seq(
        doc(0, "same text here okay"), doc(1, "same text here okay"),
        doc(2, "something entirely different indeed")),
      embeddings = Seq(
        EmbRow(0, v, 0), EmbRow(1, v.clone(), 0), EmbRow(2, v.map(-_), 1)))
    val got = Dedup.modalityAgreement(spark, dir).collect()
    val p01 = got.find(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 1L)
    assert(p01.isDefined, s"pair (0,1) missing from ${got.mkString(",")}")
    assert(p01.get.getAs[Long]("hamming") === 0L)
    assert(p01.get.getAs[Long]("dot") === p01.get.getAs[Long]("na"))
    assert(math.abs(p01.get.getAs[Double]("cos") - 1.0) < 1e-12)
  }

  test("cluster-size histogram counts the near-dup component and singletons") {
    val dir = fixture()
    // Fixture geometry (see the clustering test): docs 0 and 1 collapse
    // into one 2-cluster; 2 and 3 stay singletons → sizes {2: 1, 1: 2}.
    assert(rows(Dedup.clusterSizes(spark, dir)) === Set(
      Seq(2L, 1L), Seq(1L, 2L)))
  }

  test("shingle novelty credits first observers in doc_id ingest order") {
    // doc 0 introduces both its shingles (fully novel); doc 1 repeats
    // "a b c" (half novel); doc 2 repeats doc 0's ENTIRE set (zero novel);
    // doc 3 is all-new content (fully novel again, later id).
    val dir = writeFixture(documents = Seq(
      doc(0, "a b c d"), doc(1, "a b c e"), doc(2, "a b c d"),
      doc(3, "x y z w")))
    val got = Dedup.shingleNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novel_frac")))).toMap
    assert(got === Map(
      0L -> ((2L, 2L, 1.0)),
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 0L, 0.0)),
      3L -> ((2L, 2L, 1.0))))
  }

  test("minhash LSH: identical docs match on all signature positions") {
    val dir = fixture()
    val got = Dedup.minhashLshPairs(spark, dir).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Long]("sig_matches"))).toMap
    assert(got((0L, 1L)) === graft.functions.Parity.NumHashes.toLong)
    // Near-dup pair shares most of its shingles → most signature slots.
    assert(got.contains((0L, 2L)))
    assert(got((0L, 2L)) > graft.functions.Parity.NumHashes / 2L)
  }

  test("minhash jaccard eval reports true inter/union next to the estimate") {
    val dir = fixture()
    val eval = Dedup.minhashJaccardEval(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        ((r.getAs[Long]("sig_matches"), r.getAs[Long]("inter"),
          r.getAs[Long]("uni"), r.getAs[Double]("est_j"),
          r.getAs[Double]("true_j")))).toMap
    // Identical docs: full signature agreement AND true J = 1.
    val (sm01, i01, u01, est01, true01) = eval((0L, 1L))
    assert(sm01 === graft.functions.Parity.NumHashes.toLong)
    assert(i01 === u01 && est01 === 1.0 && true01 === 1.0)
    // Every eval row's (inter, uni) must agree with the brute-force
    // jaccardPairs numbers where that pair clears the J > 0.1 gate.
    val brute = Dedup.jaccardPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        ((r.getAs[Long]("inter"), r.getAs[Long]("uni")))).toMap
    eval.foreach { case (pair, (_, inter, uni, _, _)) =>
      brute.get(pair).foreach { case (bi, bu) =>
        assert((bi, bu) === ((inter, uni)), s"pair $pair")
      }
    }
  }

  test("simhash: identical docs at Hamming 0; near-dups within radius") {
    val dir = fixture()
    val got = Dedup.simhashPairs(spark, dir).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Long]("hamming"))).toMap
    assert(got((0L, 1L)) === 0L)
    assert(got.get((0L, 2L)).forall(_ <= Dedup.MaxHamming))
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("dedup clustering collapses the near-dup component to one canonical doc") {
    val dir = fixture()
    val got = rows(Dedup.dedupClusters(spark, dir))
    // 0 and 1 are identical (hamming 0) → one component with canonical 0;
    // 2 differs by more than the simhash radius on this fixture and 3 is
    // unrelated → each stays its own canonical.
    assert(got === Set(
      Seq(0L, 0L), Seq(1L, 0L), Seq(2L, 2L), Seq(3L, 3L)))
  }

  test("incremental clusters equal the full recompute, planted and real") {
    // Planted: doc 0 (corpus) and 1 (batch) are identical → the batch doc
    // joins the corpus doc's cluster through the day-2 path; 2 and 3 stay
    // singletons. Then the real sf0.001 corpus: the incremental result
    // must be row-identical to dedupClusters (same full-closure oracle
    // gates both at sf0.01).
    val dir = fixture()
    assert(rows(Dedup.incrementalClusters(spark, dir)) ===
      rows(Dedup.dedupClusters(spark, dir)))
    val real = "/root/testdata/sf0.001"
    assert(rows(Dedup.incrementalClusters(spark, real)) ===
      rows(Dedup.dedupClusters(spark, real)))
  }

  /** Driver-side union-find canon: every vertex → min id of its
    * component (itself if unpaired) — the wiring contract each cluster
    * variant must satisfy over ITS OWN pair source. (PropertySpec proves
    * the distributed loop itself on random graphs; these tests prove the
    * per-source wiring: vertex base, singleton coalesce, min-canonical.)
    */
  private def unionFindCanon(pairs: Set[(Long, Long)],
      vertices: Set[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]() ++
      vertices.map(v => v -> v)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vertices.map(v => v -> find(v)).toMap
  }

  test("minhash clusters == union-find over the minhash LSH pair source") {
    val dir = fixture()
    val pairs = Dedup.minhashLshPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val got = Dedup.minhashClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L)) // every doc, paired or not
    assert(got === unionFindCanon(pairs, got.keySet))
    assert(got(1L) === 0L) // the identical pair actually collapsed
  }

  test("embedding clusters collapse the planted near-identical vectors") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val w = v.clone(); w(0) += 0.001f
    val u = Array.tabulate(8)(i => if (i % 2 == 0) 0.5f else -0.5f)
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, v, 0), EmbRow(1, w, 0), EmbRow(2, u, 1)))
    val pairs = Dedup.embeddingNearDupLsh(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val got = Dedup.embeddingClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(got === unionFindCanon(pairs, Set(0L, 1L, 2L)))
    assert(got(1L) === 0L) // near-identical vectors share a canonical
    assert(got(2L) === 2L) // the far vector stays a singleton
  }

  test("LSH plane policy: exact thresholds, clamps, and grid-prefix stability") {
    import graft.functions.Parity
    // Policy: smallest p in [8, 24] with n <= 16·2^p, from one corpus
    // count. The gate fixtures must resolve to the historical 8-plane
    // grid; the sf1 fixture to the r7-measured optimum 11.
    assert(Parity.planesForCount(0L) === 8)
    assert(Parity.planesForCount(500L) === 8)     // sf0.01 embeddings
    assert(Parity.planesForCount(2000L) === 8)    // sf0.1 embeddings
    assert(Parity.planesForCount(4096L) === 8)    // exact boundary
    assert(Parity.planesForCount(4097L) === 9)
    assert(Parity.planesForCount(20000L) === 11)  // sf1 embeddings
    assert(Parity.planesForCount(Long.MaxValue) === 24) // clamp
    // The DuckDB CASE replica carries the same literal thresholds.
    val duck = Parity.planesForCountDuck("n")
    assert(duck.contains("WHEN n <= 4096 THEN 8"))
    assert(duck.contains(s"WHEN n <= ${16L << 23} THEN 23"))
    assert(duck.contains("ELSE 24"))
    // Widening the grid keeps the 8-plane bucket as the low-bit prefix
    // (sequential seeded fill): bucket@11 mod 256 == bucket@8.
    import org.apache.spark.sql.functions.expr
    val r = spark.range(1)
      .select(expr("transform(sequence(1, 64), i -> CAST(i % 7 - 3 AS LONG))").as("v"))
      .select(expr(Parity.lshBucketSpark("v", 8)).as("b8"),
        expr(Parity.lshBucketSpark("v", 11)).as("b11"))
      .collect().head
    assert((r.getInt(1) & 255) === r.getInt(0))
    assert(r.getInt(1) !== 0) // the test vector actually sets sign bits
  }

  test("embedding near-dup finds the planted duplicate vector") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val w = v.clone(); w(0) += 0.001f           // near-identical
    val u = Array.tabulate(8)(i => if (i % 2 == 0) 0.5f else -0.5f) // far
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, v, 0), EmbRow(1, w, 0), EmbRow(2, u, 1)))
    val pairs = Dedup.embeddingNearDup(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("token stats and quality on a controlled document") {
    val dir = writeFixture(documents = Seq(doc(0, "the cat and the dog")))
    val ts = TextAnalysis.tokenStats(spark, dir).collect().head
    assert(ts.getAs[Int]("n_tokens") === 5)
    assert(ts.getAs[Int]("n_distinct") === 4)
    assert(ts.getAs[Double]("avg_token_len") === 15.0 / 5)
    val q = TextAnalysis.qualityScore(spark, dir).collect().head
    assert(q.getAs[Long]("stop_cnt") === 3L) // the, and, the
  }

  test("span scrub removes exactly the tokens under cross-doc duplicate 8-gram windows") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // one ScrubW window
    val dir = writeFixture(documents = Seq(
      doc(0, s"$shared unique1 unique2"),  // shared span at pos 0 → pos 0..7 covered
      doc(1, s"prefixb $shared unique3"),  // shared span at pos 1 → pos 1..8 covered
      doc(2, "totally unrelated words nothing here at all whatsoever okay fine"),
      doc(3, "short doc under eight tokens")))  // no spans → untouched
    val got = Dedup.spanScrub(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    assert(got(0L) === ((10L, 8L, "unique1 unique2")))
    assert(got(1L) === ((10L, 8L, "prefixb unique3")))
    assert(got(2L)._2 === 0L)
    assert(got(2L)._3 === "totally unrelated words nothing here at all whatsoever okay fine")
    assert(got(3L) === ((5L, 0L, "short doc under eight tokens")))
  }

  test("pii scrub plants deterministically and redacts emails and phones") {
    val dir = writeFixture(documents = Seq(
      doc(1, "plain words"),    // %2≠0, %3≠0 → nothing planted
      doc(3, "email only"),     // %3=0 → email planted
      doc(4, "phone only"),     // %2=0 → phone planted
      doc(6, "both kinds")))    // both planted
    val got = TextAnalysis.piiScrub(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[String]("scrubbed"))).toMap
    assert(got(1L) === ((0L, 0L, "plain words")))
    assert(got(3L) === ((1L, 0L, "email only <EMAIL>")))
    assert(got(4L) === ((0L, 1L, "phone only call <PHONE>")))
    assert(got(6L) === ((1L, 1L, "both kinds <EMAIL> call <PHONE>")))
    // No residual PII survives the scrub anywhere.
    got.values.foreach { case (_, _, s) =>
      assert(!s.contains("@") && !s.matches(".*[0-9]{3}-[0-9].*"))
    }
  }

  test("repetition collapse drops consecutive duplicate tokens only") {
    val dir = writeFixture(documents = Seq(
      doc(0, "a a b b b c a"),   // runs collapse; the non-adjacent 'a' stays
      doc(1, "x y z")))          // nothing to collapse
    val got = TextAnalysis.collapseRepeats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_kept"),
          r.getAs[Int]("n_collapsed"), r.getAs[String]("clean_text"))).toMap
    assert(got(0L) === ((7, 4, 3, "a b c a")))
    assert(got(1L) === ((3, 3, 0, "x y z")))
  }

  test("repetition stats: ppm fractions, top-bigram argmax, tiebreak, sub-bigram doc") {
    val dir = writeFixture(documents = Seq(
      doc(0, "a b a b a b c"), // grams: 'a b'×3, 'b a'×2, 'b c'×1
      doc(1, "p q r s"),       // all grams count 1 → tiebreak to 'r s'
      doc(2, "solo")))         // no bigrams → sentinel row
    val got = TextAnalysis.repetitionStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_token_frac_e6"),
          r.getAs[String]("top_bigram"), r.getAs[Long]("top_bigram_cnt"),
          r.getAs[Long]("top_bigram_frac_e6")))).toMap
    // doc 0: 7 tokens, 3 distinct → dup ppm = 4·10⁶ div 7; coverage
    // proxy = 3·2·10⁶ div 7.
    assert(got(0L) === ((7L, 571428L, "a b", 3L, 857142L)))
    assert(got(1L) === ((4L, 0L, "r s", 1L, 500000L)))
    assert(got(2L) === ((1L, 0L, "", 0L, 0L)))
  }

  test("top ngrams: per-source counts, count-desc gram-asc ranking, short docs dropped") {
    val dir = writeFixture(documents = Seq(
      doc(0, "x y z x y z"), doc(1, "x y z q"),
      doc(2, "a b", source = "src1"), doc(3, "a b c", source = "src1")))
    val got = operators.TextAnalysis.topNgrams(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rnk")) ->
        ((r.getAs[String]("gram"), r.getAs[Long]("cnt")))).toMap
    // src0: "x y z" appears 2× in doc0 + 1× in doc1; the three 1-count
    // grams order lexicographically.
    assert(got((("src0", 1))) === (("x y z", 3L)))
    assert(got((("src0", 2))) === (("y z q", 1L)))
    assert(got((("src0", 3))) === (("y z x", 1L)))
    assert(got((("src0", 4))) === (("z x y", 1L)))
    // src1: the 2-token doc contributes nothing; one trigram remains.
    assert(got((("src1", 1))) === (("a b c", 1L)))
    assert(got.size === 5)
  }

  test("token rarity: corpus frequency sums, rarest token, hapax count") {
    val dir = writeFixture(documents = Seq(doc(0, "a a b"), doc(1, "b c")))
    val got = operators.TextAnalysis.tokenRarity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_wf"),
          r.getAs[Long]("min_wf"), r.getAs[Long]("n_hapax")))).toMap
    // vocab: a→2, b→2, c→1.
    assert(got(0L) === ((3L, 6L, 2L, 0L)))
    assert(got(1L) === ((2L, 3L, 1L, 1L)))
  }

  test("language id picks the profile with the most marker hits") {
    val dir = writeFixture(documents = Seq(
      doc(0, "the cat of the house and a dog", lang = "en"),
      doc(1, "el gato de la casa y los perros", lang = "es"),
      doc(2, "xyz qrs tuv", lang = "zh")))
    val got = TextAnalysis.langId(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(got(0L) === "en")
    assert(got(1L) === "es")
    assert(got(2L) === "und")
  }

  test("fingerprint equals the two-hash 62-bit polynomial pack") {
    import graft.functions.Parity
    val text = "abc"
    val dir = writeFixture(documents = Seq(doc(0, text)))
    val got = TextAnalysis.fingerprint(spark, dir).collect().head
    val hA = text.foldLeft(0L)((acc, c) => (acc * 31 + c) % Parity.P)
    val hB = text.foldLeft(0L)((acc, c) => (acc * Parity.Base2 + c) % Parity.P2)
    assert(got.getAs[Long]("fp") === hA * Parity.Pack + hB)
  }

  test("62-bit fingerprint separates a real 31-bit polyHash collision") {
    import graft.functions.Parity
    // These two texts collide on the base-31 mod 2^31-1 hash (both
    // 1011291013, found by exhaustive search) — under the old 31-bit
    // fingerprint exact dedup silently merged them and dropped a document.
    val a = "doc 1001200 body"
    val b = "doc 8810053 body"
    def hA(s: String) = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % Parity.P)
    assert(hA(a) === hA(b)) // the planted collision is real
    val dir = writeFixture(documents = Seq(doc(0, a), doc(1, b)))
    // Both distinct texts survive dedup as their own group of size 1.
    val got = rows(Dedup.exactDedup(spark, dir))
    assert(got === Set(Seq(0L, 1L), Seq(1L, 1L)))
  }

  test("simhash bands discriminate proportionally (bucket join stays near-linear)") {
    import graft.functions.Parity
    // With 31-bit token hashes band 3 (bits 45-59) was the constant key 0
    // for every document — the band self-join was an O(n²) cross product.
    // `cards > 1` would still pass on a near-degenerate band (2 keys over
    // the corpus keeps the join quasi-quadratic), so assert proportional
    // spread AND a bucket-size cap over a corpus of distinct docs: with
    // anything close to uniform 15-bit keys, 200 docs should rarely share
    // a bucket at all.
    // Globally-unique tokens (injective map into Z_1000003) — docs share
    // NO tokens, so fingerprints are uniform and band buckets must stay
    // tiny. (A shared template would make docs genuinely similar, and
    // simhash banding them together would be correct behavior.)
    val n = 200
    val dir = writeFixture(documents = (0 until n).map { i =>
      val toks = (0 until 8).map(j => "t" + ((i * 8 + j) * 2654435761L % 1000003L))
      doc(i.toLong, toks.mkString(" "))
    })
    val sh = Dedup.simhash(spark, dir)
    (0 until Parity.SimHashBands).foreach { i =>
      val buckets = sh
        .selectExpr(Parity.simhashBandSpark("simhash", i) + " AS bkey")
        .groupBy("bkey").count().collect().map(_.getLong(1))
      val distinct = buckets.length
      val maxBucket = buckets.max
      assert(distinct > n / 2,
        s"band $i keys collapse: $distinct distinct over $n docs")
      assert(maxBucket <= 5,
        s"band $i has a hot bucket of $maxBucket docs — self-join degrades")
    }
  }

  test("feature-hash cosine ranks an identical-text doc first with cos exactly 1") {
    import graft.operators.TextAnalysis
    // Query side is doc_id < 20. Doc 100 repeats doc 0's text exactly —
    // identical sparse vectors, so its dot equals doc 0's squared norm and
    // its cosine is exactly 1.0 (same integers through the same /,*,sqrt),
    // which no non-identical direction can beat. Doc 102 shares no tokens;
    // any overlap with doc 0's vector is hash-collision noise with a
    // strictly smaller cosine.
    val q = "alpha beta gamma delta epsilon"
    val dir = writeFixture(documents = Seq(
      doc(0, q), doc(100, q),
      doc(101, "alpha beta gamma words diverge here"),
      doc(102, "completely different content with nothing shared at all")))
    val fv = TextAnalysis.featureHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val norm0 = fv.collect { case ((0L, _), w) => w * w }.sum
    val top = TextAnalysis.textCosineTopK(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
    assert(top.head.getAs[Long]("neighbor_id") === 100L)
    assert(top.head.getAs[Long]("dot") === norm0)
  }

  test("incremental near-dup rejects batch docs with a verified corpus near-dup only") {
    // Parity split: even = corpus, odd = batch. Batch docs 1 and 5 carry
    // corpus doc 0's exact text (J = 1 — every band collides, the
    // candidate is guaranteed), batch doc 3 shares no shingles with any
    // corpus doc (even a band collision could not pass the true-Jaccard
    // verify). Batch-batch near-dups (1 ≡ 5) must NOT pair — only
    // batch × corpus. nd_min elects the lowest corpus id.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = writeFixture(documents = Seq(
      doc(0, shared),
      doc(2, "completely unrelated corpus words in this document body"),
      doc(1, shared),
      doc(3, "one two three four five six seven eight nine"),
      doc(5, shared)))
    val got = rows(Dedup.incrementalNearDup(spark, dir))
    assert(got === Set(Seq(1L, 1L, 0L), Seq(5L, 1L, 0L)))
  }
}
