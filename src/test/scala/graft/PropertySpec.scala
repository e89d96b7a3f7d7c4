package graft

import graft.operators.RefQueries
import org.apache.spark.sql.functions.{col, lit}

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

  test("connected components equal driver-side union-find on random graphs") {
    // Both sides of the size-gated strategy switch: the default limit
    // takes the small-graph plan (labels broadcast, AQE off), limit 0
    // forces the large-graph shuffle-join plan every round.
    val s = spark
    import s.implicits._
    for {
      seed <- 16 to 20
      broadcastLimit <- Seq(graft.operators.Dedup.BroadcastLabelLimit, 0L)
    } {
      val rnd = new scala.util.Random(seed)
      val n = 40
      // Random sparse graph incl. long chains (the pointer-jumping case).
      val chain = (0 until 12).map(i => (i.toLong, (i + 1).toLong))
      val random = List.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairs = (chain ++ random).map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      // Reference: union-find.
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      val expected = members.map(v => Seq[Any](v,
        members.filter(u => find(u.toInt) == find(v.toInt)).min)).toSet
      val got = rows(graft.operators.Dedup.connectedComponents(
        pairs.toDF("id_a", "id_b"), broadcastLimit))
      assert(got === expected, s"seed $seed limit $broadcastLimit")
    }
  }

  test("incremental label update equals full CC on random graphs with even/odd splits") {
    // The day-2 contract: corpus labels (CC over even-even edges) plus
    // ONLY the new edges (any edge touching an odd vertex) must reproduce
    // the full-graph components exactly — including the hard case where
    // one odd vertex merges two previously-separate corpus clusters.
    val s = spark
    import s.implicits._
    for (seed <- 41 to 45) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      // Dense-ish: plenty of even-even edges (day-1 clusters) and odd
      // bridge vertices with several edges each (cluster merges).
      val edges = (List.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
          (0 until 6).map(i => (2L * i, 2L * i + 2))) // guaranteed corpus chains
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val (corpusEdges, newEdges) = edges.partition { case (a, b) => a % 2 == 0 && b % 2 == 0 }
      val corpusLabels = graft.operators.Dedup.connectedComponents(
        corpusEdges.toDF("id_a", "id_b"))
      val got = rows(graft.operators.Dedup.incrementalLabelUpdate(
        corpusLabels, newEdges.toDF("id_a", "id_b")))
      // Reference: union-find over ALL edges.
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = edges.flatMap(p => Seq(p._1, p._2)).toSet
      val expected = members.map(v => Seq[Any](v,
        members.filter(u => find(u.toInt) == find(v.toInt)).min)).toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("incremental label updates COMPOSE: day-3 over day-2 output equals full CC") {
    // The production property behind iterated maintenance: the label
    // relation produced by one incremental update is valid stored state
    // for the next batch, because its labels are true min-id component
    // labels of the graph so far. Random edges split three ways (corpus,
    // batch A, batch B); two chained updates must equal one full CC.
    val s = spark
    import s.implicits._
    for (seed <- 46 to 50) {
      val rnd = new scala.util.Random(seed)
      val n = 36
      val edges = (List.fill(28)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
          (0 until 5).map(i => (3L * i, 3L * i + 3))) // guaranteed corpus chains
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // corpus = both ids ≡ 0 (mod 3); batch A touches ≡ 1; batch B the rest.
      val (corpusEdges, rest) = edges.partition { case (a, b) => a % 3 == 0 && b % 3 == 0 }
      val (batchA, batchB) = rest.partition { case (a, b) => a % 3 == 1 || b % 3 == 1 }
      val day1 = graft.operators.Dedup.connectedComponents(
        corpusEdges.toDF("id_a", "id_b"))
      val day2 = graft.operators.Dedup.incrementalLabelUpdate(
        day1, batchA.toDF("id_a", "id_b"))
      val day3 = graft.operators.Dedup.incrementalLabelUpdate(
        day2, batchB.toDF("id_a", "id_b"))
      val got = rows(day3)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = edges.flatMap(p => Seq(p._1, p._2)).toSet
      val expected = members.map(v => Seq[Any](v,
        members.filter(u => find(u.toInt) == find(v.toInt)).min)).toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("as-of join equals the brute-force latest-quote scan on random events") {
    for (seed <- 21 to 25) {
      val rnd = new scala.util.Random(seed)
      // Small ts domain forces same-timestamp collisions (the tie rules).
      val evs = (0 until 50).map { i =>
        event(i.toLong, rnd.nextInt(10).toLong * 100, rnd.nextInt(3).toLong, "e")
      }
      val dir = writeFixture(events = evs)
      // Brute force: per trade, scan all quotes of the user at t ≤ trade
      // t; pick max t, then max event_id; x = floor(value) of that quote.
      val quotes = evs.filter(_.event_id % 2 == 1)
      val expected = evs.filter(_.event_id % 2 == 0).flatMap { tr =>
        val cands = quotes.filter(q =>
          q.user_id == tr.user_id && q.ts.getTime <= tr.ts.getTime)
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(q => (q.ts.getTime, q.event_id))
          Some(Seq[Any](tr.user_id, tr.event_id, tr.ts.getTime,
            best.event_id, math.floor(best.value).toLong))
        }
      }.toSet
      val got = rows(graft.operators.Analytics.asofJoin(spark, dir))
      assert(got === expected, s"seed $seed")
    }
  }

  test("sessionize equals the brute-force gap scan on random events") {
    val gap = graft.operators.Analytics.SessionGapMs
    for (seed <- 26 to 30) {
      val rnd = new scala.util.Random(seed)
      val evs = (0 until 60).map { i =>
        event(i.toLong, rnd.nextInt(20).toLong * gap / 2, rnd.nextInt(4).toLong, "e")
      }
      val dir = writeFixture(events = evs)
      val expected = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val ts = es.map(_.ts.getTime).sorted
        // Split the sorted times where the gap exceeds the threshold.
        val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head > gap) List(t) :: acc
          else (t :: acc.head) :: acc.tail
        }
        sessions.map { sess =>
          Seq[Any](u, sess.min, sess.max, sess.max - sess.min, sess.size.toLong)
        }
      }.toSet
      val got = rows(graft.operators.Analytics.sessionize(spark, dir))
      assert(got === expected, s"seed $seed")
    }
  }

  test("prefix-filtered jaccard equals brute force on random high-overlap corpora") {
    import graft.operators.Dedup
    for (seed <- 31 to 35) {
      val rnd = new scala.util.Random(seed)
      // Small vocabulary → heavy shingle overlap → the prefix filter,
      // length filter, and first-shared-emission all get exercised with
      // many multi-collision candidates.
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val docs = (0 until 25).map { i =>
        val len = 3 + rnd.nextInt(8)
        doc(i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val dir = writeFixture(documents = docs)
      val brute = Dedup.jaccardPairs(spark, dir).collect()
        .filter(r => r.getAs[Long]("inter") * Dedup.PrefixJaccDen >
          r.getAs[Long]("uni") * Dedup.PrefixJaccNum)
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
      val prefix = Dedup.jaccardPrefixPairs(spark, dir).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
      assert(prefix === brute, s"seed $seed")
    }
  }

  test("chunking equals the driver-side window scan on random-length docs") {
    import graft.operators.Curation
    val W = Curation.ChunkSize.toInt; val S = Curation.ChunkStride.toInt
    for (seed <- 91 to 93) {
      val rnd = new scala.util.Random(seed)
      // Lengths straddling every boundary case: sub-window, exact window,
      // window+1, multiple strides, stride-aligned tails.
      val docs = (0 until 12).map { i =>
        val len = Seq(1, W - 1, W, W + 1, W + S, W + S + 1,
          2 + rnd.nextInt(3 * W))(i % 7)
        doc(i.toLong, (0 until len).map(k => s"t${rnd.nextInt(50)}k$k").mkString(" "))
      }
      val dir = writeFixture(documents = docs)
      val want = docs.flatMap { d =>
        val toks = d.text.split(" ")
        val n = toks.length
        val nChunks = if (n <= W) 1 else ((n - W) + S - 1) / S + 1
        (0 until nChunks).map { c =>
          val start = c * S
          val slice = toks.slice(start, start + W)
          (d.doc_id, c.toLong, start.toLong, slice.length.toLong,
            slice.mkString(" "))
        }
      }.toSet
      val got = Curation.chunkDocs(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
          r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_tokens"),
          r.getAs[String]("chunk_text"))).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("kNN classify equals the driver-side vote on random labeled vectors") {
    import graft.functions.VectorOps
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    for (seed <- 81 to 83) {
      val rnd = new scala.util.Random(seed)
      val embs = (0 until 30).map(i =>
        EmbRow(i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1), rnd.nextInt(3)))
      val dir = writeFixture(embeddings = embs)
      // Engine-quantized vectors (the shared kernel), independent ranking
      // and voting logic in plain Scala.
      val quant = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("v"))
        .collect().map(r => r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Long]]("v").toArray).toMap
      val labels = embs.map(e => e.vec_id -> e.label.toLong).toMap
      def cos(a: Array[Long], b: Array[Long]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      }
      val want = (0L until math.min(Similarity.NumQueries, embs.size.toLong)).map { q =>
        val ranked = quant.keys.filter(_ != q).toSeq
          .sortBy(c => (-cos(quant(q), quant(c)), c))
          .take(Similarity.TopK.toInt)
        val votes = ranked.groupBy(labels).map { case (l, o) => l -> o.size }
        val (pred, v) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
        q -> ((labels(q), pred, v.toLong, if (labels(q) == pred) 1L else 0L))
      }.toMap
      val got = Similarity.knnClassify(spark, dir).collect()
        .map(r => r.getAs[Long]("query_id") ->
          ((r.getAs[Long]("true_label"), r.getAs[Long]("pred_label"),
            r.getAs[Long]("votes"), r.getAs[Long]("correct")))).toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("containment pairs equal the driver-side df-capped set scan on random corpora") {
    import graft.operators.Dedup
    for (seed <- 71 to 75) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val docs = (0 until 25).map { i =>
        val len = 3 + rnd.nextInt(8)
        doc(i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val dir = writeFixture(documents = docs)
      // Driver-side recomputation on shingle STRINGS (the tiny 216-gram
      // space makes 31-bit hash collisions impossible in practice and the
      // seeds are fixed).
      def sh(text: String): Set[String] = {
        val t = text.split(" ").toSeq
        if (t.size < Dedup.ShingleW) Set.empty
        else t.sliding(Dedup.ShingleW).map(_.mkString(" ")).toSet
      }
      val sets = docs.map(d => d.doc_id -> sh(d.text)).toMap
      val df = sets.values.toSeq.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
      val rare = sets.map { case (id, s) =>
        id -> s.filter(x => df(x) >= 2 && df(x) <= Dedup.ContainDfCap)
      }
      val want = (for {
        a <- docs.map(_.doc_id); b <- docs.map(_.doc_id) if a < b
        inter = (rare(a) intersect rare(b)).size.toLong if inter > 0
        na = rare(a).size.toLong; nb = rare(b).size.toLong
        ppm = inter * 1000000L / math.min(na, nb) if ppm >= Dedup.ContainPpm
      } yield (a, b, inter, na, nb, ppm)).toSet
      val got = Dedup.containmentPairs(spark, dir).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("inter"), r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Long]("containment_ppm"))).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("funnel stage counts equal the driver-side ordered scan on random streams") {
    import graft.operators.Analytics
    for (seed <- 51 to 55) {
      val rnd = new scala.util.Random(seed)
      val types = Vector("view", "click", "purchase", "error", "signup")
      val evs = (0 until 80).map { i =>
        event(i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(8).toLong,
          types(rnd.nextInt(types.size)))
      }
      val dir = writeFixture(events = evs)
      // Reference: per user, t1 = earliest view; t2 = earliest click >= t1;
      // t3 = earliest purchase >= t2 — straight from the definitions, no
      // join plan shared with the operator.
      val byUser = evs.groupBy(_.user_id)
      def minAtOrAfter(u: Seq[EventRow], typ: String, lo: Long): Option[Long] = {
        val c = u.filter(e => e.event_type == typ && e.ts.getTime >= lo).map(_.ts.getTime)
        if (c.isEmpty) None else Some(c.min)
      }
      val stages = byUser.values.map { u =>
        val t1 = minAtOrAfter(u.toSeq, "view", Long.MinValue)
        val t2 = t1.flatMap(minAtOrAfter(u.toSeq, "click", _))
        val t3 = t2.flatMap(minAtOrAfter(u.toSeq, "purchase", _))
        (t1.isDefined, t2.isDefined, t3.isDefined)
      }.toSeq
      val want = Map(
        1L -> stages.count(_._1).toLong,
        2L -> stages.count(_._2).toLong,
        3L -> stages.count(_._3).toLong).filter(_._2 > 0)
      val got = Analytics.funnel(spark, dir).collect()
        .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users"))
        .filter(_._2 > 0).toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("k-means training equals driver-side Lloyd on random vectors") {
    import graft.functions.Parity
    import graft.operators.Similarity
    val dim = Parity.EmbeddingDim
    def dist2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (seed <- 41 to 43) {
      val rnd = new scala.util.Random(seed)
      // Uniform random floats — no planted geometry, so ties, empty
      // clusters, and centroid crossings arise (or not) arbitrarily;
      // the distributed plan must match the reference fold regardless.
      val n = 24 + rnd.nextInt(16)
      val vecs = (0 until n).map(_ => Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      val dir = writeFixture(embeddings =
        vecs.zipWithIndex.map { case (v, i) => EmbRow(i.toLong, v, 0) })
      val q: Map[Long, Array[Long]] = vecs.zipWithIndex.map { case (v, i) =>
        i.toLong -> v.map(x => math.floor(x.toDouble * Parity.QScale).toLong)
      }.toMap
      def assign(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
        q.map { case (id, v) =>
          val (d, cid) = cents.map { case (c, cv) => (dist2(v, cv), c) }.min
          id -> (cid, d)
        }
      val a1 = assign((0L until Similarity.KmeansK).map(c => c -> q(c)))
      val cents1 = a1.groupBy(_._2._1).toSeq.map { case (cid, members) =>
        val vs = members.keys.toSeq.map(q)
        val cnt = vs.size.toLong
        cid -> Array.tabulate(dim) { d =>
          val s = vs.map(_(d)).sum
          (s - ((s % cnt) + cnt) % cnt) / cnt
        }
      }
      val want = assign(cents1).map { case (id, (cid, d)) => Seq[Any](id, cid, d) }.toSet
      assert(rows(Similarity.kmeansTrain(spark, dir)) === want, s"seed $seed")
    }
  }

  test("minhash banding recall guarantee: >=29/32 signature matches always collide") {
    import graft.operators.Dedup
    import graft.functions.Parity
    // Pigeonhole over 8 bands × 4 rows: ≤ 3 mismatching slots leave at
    // least one band fully intact, so any pair with sig_matches ≥ 29 MUST
    // appear in the banded output — the lemma the LSH path's recall
    // rests on, checked against exhaustive signature comparison.
    for (seed <- 36 to 38) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
      val base = Seq.fill(12)(vocab(rnd.nextInt(vocab.size)))
      val docs = (0 until 20).map { i =>
        // Perturb a shared base doc so many pairs share most shingles.
        val toks = base.map(t => if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else t)
        doc(i.toLong, toks.mkString(" "))
      }
      val dir = writeFixture(documents = docs)
      val sigs = Dedup.minhashSignatures(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("sig").toVector)
        .toMap
      val mustCollide = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        m = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
        if m >= Parity.NumHashes - 3
      } yield (a, b)).toSet
      val banded = Dedup.minhashLshPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(mustCollide.subsetOf(banded),
        s"seed $seed: missing ${mustCollide diff banded}")
    }
  }

  test("simhash banding recall guarantee: Hamming <= 3 pairs always collide") {
    import graft.operators.Dedup
    for (seed <- 39 to 41) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("u", "v", "w", "x", "y", "z")
      val base = Seq.fill(10)(vocab(rnd.nextInt(vocab.size)))
      val docs = (0 until 20).map { i =>
        val toks = base.map(t => if (rnd.nextInt(8) == 0) vocab(rnd.nextInt(vocab.size)) else t)
        doc(i.toLong, toks.mkString(" "))
      }
      val dir = writeFixture(documents = docs)
      val fps = Dedup.simhash(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val close = (for {
        a <- fps.keys; b <- fps.keys if a < b
        if java.lang.Long.bitCount(fps(a) ^ fps(b)) <= Dedup.MaxHamming
      } yield (a, b)).toSet
      val banded = Dedup.simhashPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 4 bands × 15 bits: ≤ 3 differing bits leave one band intact.
      assert(close.subsetOf(banded), s"seed $seed: missing ${close diff banded}")
      assert(banded.forall { case (a, b) =>
        java.lang.Long.bitCount(fps(a) ^ fps(b)) <= Dedup.MaxHamming
      }, s"seed $seed: emitted pair beyond the radius")
    }
  }

  test("repetition collapse equals the driver-side run-length scan on random corpora") {
    import graft.operators.TextAnalysis
    for (seed <- 41 to 45) {
      val rnd = new scala.util.Random(seed)
      // Small alphabet forces frequent runs; vary lengths incl. 1-token docs.
      val docs = (0 until 30).map { i =>
        val toks = List.fill(1 + rnd.nextInt(40))("abc" (rnd.nextInt(3)).toString)
        i.toLong -> toks
      }
      val dir = writeFixture(documents = docs.map { case (id, toks) =>
        doc(id, toks.mkString(" "))
      })
      val expected = docs.map { case (id, toks) =>
        val kept = toks.zipWithIndex.collect {
          case (t, 0) => t
          case (t, i) if t != toks(i - 1) => t
        }
        id -> ((toks.size, kept.size, toks.size - kept.size, kept.mkString(" ")))
      }.toMap
      val got = TextAnalysis.collapseRepeats(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_kept"),
            r.getAs[Int]("n_collapsed"), r.getAs[String]("clean_text")))).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("span scrub equals the driver-side string scan on random templated corpora") {
    import graft.operators.Dedup
    val w = Dedup.ScrubW
    for (seed <- 71 to 75) {
      val rnd = new scala.util.Random(seed)
      // Template chunks planted across documents create genuine cross-doc
      // 8-gram overlaps (with padding, sometimes none at all — both sides
      // of the df>1 gate); fillers keep most spans unique.
      val chunks = Vector.tabulate(3)(c =>
        Vector.tabulate(5 + c)(j => s"c${c}w$j"))
      val docs = (0 until 25).map { i =>
        val toks = Vector.fill(2 + rnd.nextInt(3))(
          if (rnd.nextBoolean()) chunks(rnd.nextInt(3))
          else Vector.fill(3 + rnd.nextInt(6))(s"r${rnd.nextInt(50)}")).flatten
        i.toLong -> toks
      }
      val dir = writeFixture(documents = docs.map { case (id, toks) =>
        doc(id, toks.mkString(" "))
      })
      // Reference scan on STRINGS (the engine works on 31-bit span
      // hashes — agreement is the no-collision-in-practice property).
      val spanSets = docs.map { case (id, tk) =>
        id -> (0 to tk.size - w).map(i => tk.slice(i, i + w).mkString(" ")).toSet
      }.toMap
      val dup = spanSets.values.flatten.groupBy(identity)
        .collect { case (s, o) if o.size > 1 => s }.toSet
      val expected = docs.map { case (id, tk) =>
        val cov = (0 to tk.size - w)
          .flatMap(i => if (dup(tk.slice(i, i + w).mkString(" "))) i until i + w else Nil)
          .toSet
        val kept = tk.zipWithIndex.collect { case (t, i) if !cov(i) => t }
        id -> ((tk.size.toLong, (tk.size - kept.size).toLong, kept.mkString(" ")))
      }.toMap
      val got = Dedup.spanScrub(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
            r.getAs[String]("clean_text")))).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("BPE merges equal the driver-side trainer on random corpora") {
    import graft.operators.Curation
    for (seed <- 81 to 85) {
      val rnd = new scala.util.Random(seed)
      // 3-letter alphabet, words of 4-8 chars: dense pair collisions so
      // ties and repeated-adjacent runs (the greedy-fold edge) occur,
      // and 3 merge rounds never exhaust the pair supply.
      def word() = List.fill(4 + rnd.nextInt(5))("abc" (rnd.nextInt(3))).mkString
      val pool = Vector.fill(8)(word())
      val docs = (0 until 12).map(i =>
        i.toLong -> List.fill(4 + rnd.nextInt(5))(pool(rnd.nextInt(pool.size))))
      val dir = writeFixture(documents = docs.map { case (id, ws) =>
        doc(id, ws.mkString(" "))
      })
      // Driver-side reference trainer over the same token counts.
      val wf = docs.flatMap(_._2).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      var syms: Map[String, Seq[String]] = wf.keys.map(w => w -> w.split("").toSeq).toMap
      val expected = (1 to Curation.BpeIters).map { it =>
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        syms.foreach { case (w, sl) =>
          sl.sliding(2).foreach {
            case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + wf(w)
            case _ =>
          }
        }
        val ((x, y), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, s"$a $b") }
        syms = syms.map { case (w, sl) =>
          val out = scala.collection.mutable.Buffer.empty[String]
          sl.foreach { s =>
            if (out.nonEmpty && out.last == x && s == y) out(out.size - 1) = x + y
            else out += s
          }
          w -> out.toSeq
        }
        val corpus = syms.map { case (w, sl) => sl.size * wf(w) }.sum
        (it.toLong, s"$x $y", cnt, corpus)
      }.toSet
      val got = Curation.bpeMerges(spark, dir).collect()
        .map(r => (r.getAs[Long]("it"), r.getAs[String]("pair"),
          r.getAs[Long]("cnt"), r.getAs[Long]("corpus_syms"))).toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("sequence packing equals the driver-side per-shard scan on random corpora") {
    import graft.operators.Curation
    for (seed <- 51 to 55) {
      val rnd = new scala.util.Random(seed)
      // doc_ids scattered across shards and sources, random token counts.
      val docs = (0 until 40).map { _ =>
        (rnd.nextInt(3000).toLong, "src" + rnd.nextInt(3), 1 + rnd.nextInt(500))
      }.distinctBy(_._1)
      val dir = writeFixture(documents = docs.map { case (id, src, n) =>
        doc(id, Seq.fill(n)("w").mkString(" "), source = src)
      })
      val expected = docs.groupBy(d => (d._2, d._1 / Curation.ShardSize))
        .flatMap { case (_, ds) =>
          ds.sortBy(_._1).foldLeft((0L, List.empty[(Long, Long)])) {
            case ((start, acc), (id, _, n)) => (start + n, (id, start) :: acc)
          }._2
        }
        .map { case (id, start) =>
          id -> ((start, start / Curation.CtxLen, start % Curation.CtxLen))
        }
      val got = Curation.packSequences(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("tok_start"), r.getAs[Long]("seq_id"),
            r.getAs[Long]("seq_off")))).toMap
      assert(got === expected, s"seed $seed")
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

  test("q4 count product: DECIMAL(38,0) variant stays exact where the Long product overflows") {
    // The overflow regime SURVEY §1 names: one key with ≥2.1M rows per
    // port makes c0·c1·c2 exceed 2⁶³. Plant 2.2M per port (6.6M rows via
    // range — cheap codegen input) plus a small in-range key. Under
    // Spark 4's default ANSI mode the Long plan fails LOUDLY
    // (ARITHMETIC_OVERFLOW) — never a silent wrong answer — and the
    // documented DECIMAL(38,0) swap is the plan that stays exact.
    val s = spark
    import s.implicits._
    val perPort = 2200000L
    val big = s.range(3 * perPort)
      .select((col("id") % 3).cast("int").as("port"), lit("HOT").as("word"))
    val small = s.range(6)
      .select((col("id") % 3).cast("int").as("port"), lit("ok").as("word"))
    val pw = big.unionAll(small)
    val expected = Map(
      "HOT" -> BigInt(perPort).pow(3),
      "ok" -> BigInt(8))
    val e1 = intercept[Exception] { RefQueries.q4CardinalityPlan(pw).collect() }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse(""))
      .contains("ARITHMETIC_OVERFLOW"))
    val decCard = RefQueries.q4CardinalityPlanDecimal(pw).collect()
      .map(r => r.getString(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
    assert(decCard === expected)
    // In-range inputs agree between the two plans (the swap changes
    // nothing below the overflow regime).
    val longSmall = RefQueries.q4CardinalityPlan(small).collect()
      .map(r => r.getString(0) -> BigInt(r.getLong(1))).toMap
    assert(longSmall === Map("ok" -> expected("ok")))
  }

  test("centroid-update sums: DECIMAL(38,0) variant stays exact where Long sums overflow") {
    val s = spark
    import s.implicits._
    // 8 vectors of dim 3 in one cluster, each element ~1.6e18: the
    // per-dimension Long sum is ~1.28e19 > 2⁶³ — ANSI Spark fails the
    // Long aggregation loudly; the documented decimal swap stays exact.
    // A second cluster stays in Long range as the agreement control.
    val bigV = 1600000000000000000L
    val rows = (0 until 8).map(i => (1L, Array(bigV, bigV - i, 7L))) ++
      (0 until 4).map(i => (2L, Array(10L + i, 20L, 30L)))
    val clustered = rows.toDF("cluster", "v")
    val expect = Map(
      1L -> Seq(BigInt(bigV) * 8, BigInt(bigV) * 8 - 28, BigInt(56)),
      2L -> Seq(BigInt(46), BigInt(80), BigInt(120)))
    val dec = graft.operators.Similarity.centroidSums(clustered, 3, decimal = true)
      .collect().map(r => r.getAs[Long]("cid") ->
        (1 to 3).map(i => BigInt(r.getDecimal(i + 1).toBigInteger))).toMap
    assert(dec === expect)
    val e2 = intercept[Exception] {
      graft.operators.Similarity.centroidSums(clustered, 3, decimal = false).collect()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("ARITHMETIC_OVERFLOW"))
    // The in-range cluster alone runs fine through the Long plan — the
    // production path below the overflow regime is untouched.
    val inRange = graft.operators.Similarity
      .centroidSums(clustered.where(col("cluster") === 2L), 3, decimal = false)
      .collect().map(r => r.getAs[Long]("cid") ->
        (1 to 3).map(i => BigInt(r.getLong(i + 1)))).toMap
    assert(inRange === Map(2L -> expect(2L)))
  }
}
