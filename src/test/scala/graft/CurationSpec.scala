package graft

import graft.functions.TextHashOps
import graft.operators.{Curation, Similarity}

class CurationSpec extends SparkSpec {

  test("split assignment is identical for identical texts (dup-stable)") {
    val dir = writeFixture(documents = Seq(
      doc(0, "one two three four five six seven eight nine ten"),
      doc(7, "one two three four five six seven eight nine ten"), // dup
      doc(3, "something else entirely here today")))
    val got = Curation.splitAssign(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("fp"), r.getAs[String]("split"))).toMap
    assert(got(0L) === got(7L))
    assert(Set("train", "val", "test").contains(got(3L)._2))
  }

  test("epoch shuffle: bijective per epoch, shard-local dense ranks, " +
      "epochs are different permutations, driver recompute exact") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Curation.epochShuffle(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch"),
        r.getAs[Long]("pos"), r.getAs[Long]("shard"), r.getAs[Long]("seq")))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length === nDocs * Curation.ShuffleEpochs)
    // Affine-mod-prime with a coprime multiplier is a bijection: no two
    // docs share a position within an epoch (the order is total).
    rows.groupBy(_._2).foreach { case (_, es) =>
      assert(es.map(_._3).distinct.length === es.length)
    }
    // seq is a dense 1..n rank within every (epoch, shard).
    rows.groupBy(x => (x._2, x._4)).foreach { case (_, g) =>
      assert(g.map(_._5).sorted.toSeq === (1L to g.length).toSeq)
    }
    // The two epochs order the same docs differently (C2 offset).
    val byEpoch = rows.groupBy(_._2).view
      .mapValues(_.sortBy(x => (x._4, x._5)).map(_._1).toSeq).toMap
    assert(byEpoch(0L) !== byEpoch(1L))
    // Exact driver recompute of the whole relation.
    val P = graft.functions.Parity.P
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))
    val recomputed = (0 until Curation.ShuffleEpochs).flatMap { e =>
      val posed = ids.map { id =>
        val pos = ((id % P) * Curation.ShuffleC1 + e * Curation.ShuffleC2 +
          Curation.ShuffleC3) % P
        (id, e.toLong, pos, pos % Curation.ShuffleShards)
      }
      posed.groupBy(_._4).toSeq.flatMap { case (_, g) =>
        g.sortBy(x => (x._3, x._1)).zipWithIndex
          .map { case ((id, ep, pos, sh), i) => (id, ep, pos, sh, i + 1L) }
      }
    }.toSet
    assert(rows.toSet === recomputed)
    // Scale shape: the only exchange is the (epoch, shard) hash
    // partition; the sort is shard-local, never a global range sort.
    val plan = Curation.epochShuffle(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"epoch shuffle must not globally sort:\n$plan")
  }

  test("BPE merges: frequency-ranked rules, canonical greedy apply, shrinking corpus") {
    // vocab: aaaa wf=3 (the adjacency case a naive replace gets wrong),
    // ab wf=1, xy wf=1.
    val dir = writeFixture(documents = Seq(
      doc(0, "aaaa ab"), doc(1, "aaaa aaaa"), doc(2, "xy")))
    val got = Curation.bpeMerges(spark, dir).collect()
      .map(r => (r.getAs[Long]("it"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt"), r.getAs[Long]("corpus_syms"))).toSet
    // it1: 'a a' scores 3 pairs × wf 3 = 9; greedy apply gives "aa aa"
    //      (4 syms → 2), corpus = 3·2 + 2 + 2 = 10.
    // it2: 'aa aa' (3) merges to one symbol, corpus = 3·1 + 2 + 2 = 7.
    // it3: 'a b' ties 'x y' at 1 — pair-asc tiebreak picks 'a b';
    //      corpus = 3 + 1 + 2 = 6.
    // it4: only 'x y' remains; corpus = 3 + 1 + 1 = 5.
    // it5: EXHAUSTED — every word is one symbol, no pair exists, the
    //      empty rule carries syms forward and emits no output row.
    assert(got === Set(
      (1L, "a a", 9L, 10L),
      (2L, "aa aa", 3L, 7L),
      (3L, "a b", 1L, 6L),
      (4L, "x y", 1L, 5L)))
  }

  test("BPE tokenize applies the trained merges per document") {
    // Same corpus as the merges test: rules (a a), (aa aa), (a b),
    // (x y) — at depth 5 every vocab word collapses to one symbol
    // (iteration 5 is exhausted and a no-op).
    val dir = writeFixture(documents = Seq(
      doc(0, "aaaa ab"), doc(1, "aaaa aaaa"), doc(2, "xy")))
    val got = Curation.bpeTokenize(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens_bpe")))).toMap
    assert(got === Map(0L -> ((2L, 2L)), 1L -> ((2L, 2L)), 2L -> ((1L, 1L))))
  }

  test("BPE encode emits the post-merge symbol sequence in word order") {
    // Same corpus as the merges test: rules (a a), (aa aa), (a b), (x y).
    // "aaaa" → "aa aa" → "aaaa" (one symbol); "ab" → "ab" via rule 3;
    // "xy" → "xy" via rule 4 (depth-5 training reaches it).
    val dir = writeFixture(documents = Seq(
      doc(0, "aaaa ab"), doc(1, "aaaa aaaa"), doc(2, "xy")))
    val got = Curation.bpeEncode(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("bpe_text"), r.getAs[Long]("n_syms")))).toMap
    assert(got === Map(
      0L -> (("aaaa ab", 2L)),
      1L -> (("aaaa aaaa", 2L)),
      2L -> (("xy", 1L))))
  }

  test("upsert merge: latest version wins, statuses classify the change batch") {
    // docs 1 and 3 share a text: 3 carries the base fingerprint while 1 is
    // revised, pinning that the update actually re-fingerprints the text.
    val dir = writeFixture(documents =
      (0L to 5L).map(i => doc(i, if (i == 1L || i == 3L) "shared text body"
                                 else s"document number $i body")))
    val got = Curation.upsertMerge(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("version"), r.getAs[String]("status"), r.getAs[Long]("fp")))
      .toMap
    // 6 base keys + one insert spawned from doc 2; one row per key.
    assert(got.size === 7)
    // doc_id % 4 == 1 → revised to version 2; the base version-1 row loses.
    assert(got(1L)._1 === 2L && got(1L)._2 === "updated")
    assert(got(5L)._1 === 2L && got(5L)._2 === "updated")
    // doc_id % 4 == 2 → spawns an insert under the offset id, version 1.
    val ins = Curation.UpsertIdOffset + 2L
    assert(got(ins)._1 === 1L && got(ins)._2 === "inserted")
    // everything else carries its version-1 row through unchanged.
    Seq(0L, 2L, 3L, 4L).foreach(i => assert(got(i) ===
      ((1L, "carried", got(i)._3))))
    // A revised text hashes differently from its (shared) base text.
    assert(got(1L)._3 !== got(3L)._3)
  }

  test("temperature mix equals a driver recompute; low-resource sources boost above 1000 per-mille") {
    val sfDir = "/root/testdata/sf0.001"
    val perSource = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.map(_.getString(1).split(" ", -1).length.toLong).sum
      }
    val w = perSource.map { case (s, n) =>
      s -> ((n, math.floor(math.sqrt((n * Curation.TempScale).toDouble)).toLong))
    }
    val totalTokens = w.values.map(_._1).sum
    val totalW = w.values.map(_._2).sum
    val want = w.map { case (s, (n, wi)) =>
      (s, n, wi, n * 1000000L / totalTokens, wi * 1000000L / totalW,
        (wi * totalTokens * 1000L) / (totalW * n))
    }.toSet
    val got = Curation.temperatureMix(spark, sfDir).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("n_tokens"), r.getAs[Long]("w"),
        r.getAs[Long]("nat_ppm"), r.getAs[Long]("temp_ppm"),
        r.getAs[Long]("boost_pm"))
    }.toSet
    assert(got === want)
    // α = 1/2 flattens the distribution: the smallest source is boosted
    // (>1000‰), the largest damped (<1000‰), and boost is antitone in size.
    val bySize = got.toSeq.sortBy(_._2)
    assert(bySize.head._6 > 1000L, "smallest source must upsample")
    assert(bySize.last._6 < 1000L, "largest source must downsample")
    assert(bySize.head._6 >= bySize.last._6)
  }

  test("incremental vocab maintenance equals a full recompute, token for token") {
    // even ids = the stored day-1 corpus, odd ids = the day-2 batch;
    // 'shared' lives on both sides, 'old'/'gone' only in the store,
    // 'novel' only in the batch — every merge branch is exercised.
    val dir = writeFixture(documents = Seq(
      doc(0, "shared old old gone"),
      doc(2, "shared shared old"),
      doc(1, "shared novel"),
      doc(3, "novel novel shared shared")))
    val all = Seq("shared", "old", "old", "gone", "shared", "shared", "old",
      "shared", "novel", "novel", "novel", "shared", "shared")
    val batch = Seq("shared", "novel", "novel", "novel", "shared", "shared")
    val want = all.groupBy(identity).map { case (t, v) =>
      (t, v.length.toLong, batch.count(_ == t).toLong)
    }.toSet
    val got = Curation.incrementalVocab(spark, dir).collect().map { r =>
      (r.getAs[String]("token"), r.getAs[Long]("tf"), r.getAs[Long]("tf_batch"))
    }.toSet
    assert(got === want)
    // the maintained total really is stored + delta for every token
    assert(got.forall { case (_, tf, tfb) => tf >= tfb })
  }

  test("snapshot diff classifies every key: driver recompute over the two composed relations") {
    // doc 1 (%4=1) is revised → 'changed'; doc 2 (%4=2) spawns an insert
    // → 'added'; doc 3 (%17=3) is forgotten → 'removed'; doc 0/4 carry
    // → 'unchanged'. doc 20 (%4=0, %17=3) pins forget-beats-carry.
    val dir = writeFixture(documents = Seq(
      doc(0, "plain zero body"), doc(1, "revised one body"),
      doc(2, "spawning two body"), doc(3, "forgotten three body"),
      doc(4, "plain four body"), doc(20, "forgotten twenty body")))
    val aFps = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextHashOps.polyHash(org.apache.spark.sql.functions.col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bFps = Curation.upsertMerge(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
      .filter { case (id, _) =>
        !(id % 17 == 3 && id < Curation.UpsertIdOffset)
      }
    val want = (aFps.keySet ++ bFps.keySet).map { id =>
      val (a, b) = (aFps.get(id), bFps.get(id))
      val change =
        if (a.isEmpty) "added"
        else if (b.isEmpty) "removed"
        else if (a != b) "changed"
        else "unchanged"
      (id, change, a.getOrElse(0L), b.getOrElse(0L))
    }
    val got = Curation.snapshotDiff(spark, dir).collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("change"),
        r.getAs[Long]("fp_old"), r.getAs[Long]("fp_new"))
    }.toSet
    assert(got === want)
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId(1L) === "changed")
    assert(byId(Curation.UpsertIdOffset + 2L) === "added")
    assert(byId(3L) === "removed" && byId(20L) === "removed")
    assert(byId(0L) === "unchanged" && byId(4L) === "unchanged")
  }

  test("chunking: overlapping windows, short tail, sub-size docs, fp-stable overlap") {
    // 150 tokens at size 64 / stride 48 → ceil((150-64)/48)+1 = 3 chunks
    // starting at 0, 48, 96 with 64, 64, 54 tokens; a 5-token doc and an
    // exactly-64-token doc each yield one chunk; 65 tokens → 2 chunks.
    def words(n: Int, tag: String): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val dir = writeFixture(documents = Seq(
      doc(0, words(150, "w")), doc(1, words(5, "x")),
      doc(2, words(64, "y")), doc(3, words(65, "z")),
      doc(4, words(150, "w")))) // identical text to doc 0
    val got = Curation.chunkDocs(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    def triples(id: Long) = got(id).sortBy(_.getAs[Long]("chunk_id"))
      .map(r => (r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_tokens")))
    assert(triples(0L).toSeq === Seq((0L, 64L), (48L, 64L), (96L, 54L)))
    assert(triples(1L).toSeq === Seq((0L, 5L)))
    assert(triples(2L).toSeq === Seq((0L, 64L)))
    assert(triples(3L).toSeq === Seq((0L, 64L), (48L, 17L)))
    // The last chunk's text really is the tail slice.
    val tail = got(0L).find(_.getAs[Long]("chunk_id") == 2L).get
    assert(tail.getAs[String]("chunk_text") ===
      (96 until 150).map(i => s"w$i").mkString(" "))
    // Identical docs produce identical chunk fingerprints (chunks feed
    // the exact-dedup operators).
    def fps(id: Long) = got(id).sortBy(_.getAs[Long]("chunk_id"))
      .map(_.getAs[Long]("chunk_fp")).toSeq
    assert(fps(0L) === fps(4L))
    assert(fps(0L).distinct.size === 3)
  }

  test("chunk dedup stats: corpus-wide fp counts catch cross-source boilerplate") {
    val dir = writeFixture(documents = Seq(
      doc(0, "same short text"), doc(1, "same short text"),
      doc(2, "totally different content here", source = "src1"),
      doc(3, "same short text", source = "src1")))
    val got = Curation.chunkDedupStats(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct_fps"),
          r.getAs[Long]("n_dup_chunks"), r.getAs[Long]("dup_ppm")))).toMap
    // src0: both chunks are the shared text → all dup. src1: one unique
    // chunk plus one copy of the src0 text — the CORPUS-wide count marks
    // it dup even though it is unique within src1.
    assert(got("src0") === ((2L, 1L, 2L, 1000000L)))
    assert(got("src1") === ((2L, 2L, 1L, 500000L)))
  }

  test("forget audit counts whole-doc and chunk-level residue of purged content") {
    def words(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    // doc 3 (3 % 17 == 3) is the forget request: exactly ChunkSize tokens
    // → one chunk covering the whole text. doc 5 is an exact copy (whole-
    // doc AND chunk residue); doc 6 embeds the text as its first chunk
    // window but differs as a document (chunk residue only); doc 0 is
    // unrelated.
    val a = words(0, Curation.ChunkSize.toInt)
    val dir = writeFixture(documents = Seq(
      doc(0, "completely unrelated content"),
      doc(3, a),
      doc(5, a),
      doc(6, a + " " + (0 until Curation.ChunkStride.toInt).map(i => s"x$i").mkString(" "))))
    val r = Curation.forgetAudit(spark, dir).head()
    assert(r.getAs[Long]("n_forget") === 1L)
    assert(r.getAs[Long]("n_keep") === 3L)
    assert(r.getAs[Long]("residual_fp_docs") === 1L)
    assert(r.getAs[Long]("residual_chunk_docs") === 2L)
  }

  test("incremental chunk dedup: corpus-known chunks drop, intra-batch dups fold") {
    def words(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val b = words("b", Curation.ChunkSize.toInt)
    val c = words("c", Curation.ChunkSize.toInt)
    // doc 2 = corpus (even). Batch: doc 1 recycles the corpus text (all
    // chunks drop); docs 3 and 5 share novel text C (doc 3 claims it,
    // batch_dups 2); doc 7 is novel and unique.
    val dir = writeFixture(documents = Seq(
      doc(2, b), doc(1, b), doc(3, c), doc(5, c), doc(7, "short novel text")))
    val got = Curation.incrementalChunkDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("batch_dups"))).toSet
    assert(got === Set((3L, 0L, 2L), (7L, 0L, 1L)))
  }

  test("split leakage equals a driver-side recomputation over the gated relations") {
    val sfDir = "/root/testdata/sf0.001"
    val splits = Curation.splitAssign(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clusters = operators.Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val trainClusters = clusters.collect {
      case (d, c) if splits(d) == "train" => c
    }.toSet
    val want = splits.collect { case (d, s) if s != "train" => (d, s) }
      .groupBy(_._2)
      .map { case (s, ds) =>
        s -> ((ds.size.toLong,
          ds.count { case (d, _) => trainClusters.contains(clusters(d)) }.toLong))
      }
    val got = Curation.splitLeakage(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_leaked")))).toMap
    assert(got === want)
    assert(got.keySet.subsetOf(Set("val", "test")))
  }

  test("sequence packing: shard-local running offsets chopped at CtxLen") {
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val dir = writeFixture(documents = Seq(
      doc(0, words(1500)),                    // src0 shard 0: starts at 0
      doc(1, words(1000)),                    // starts at 1500 → still seq 0
      doc(2, words(10)),                      // starts at 2500 → seq 1 off 452
      doc(3, words(7), source = "src1"),      // other source: fresh offsets
      doc(1005, words(5))))                   // src0 shard 1: fresh offsets
    val got = Curation.packSequences(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("tok_start"),
          r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off"))).toMap
    assert(got(0L) === ((0L, 0L, 0L, 0L)))
    assert(got(1L) === ((0L, 1500L, 0L, 1500L)))
    assert(got(2L) === ((0L, 2500L, 1L, 452L)))
    assert(got(3L) === ((0L, 0L, 0L, 0L)))     // source isolation
    assert(got(1005L) === ((1L, 0L, 0L, 0L)))  // shard isolation
  }

  test("mix weights cap over-represented sources at the equal token share") {
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val dir = writeFixture(documents = Seq(
      doc(0, words(10)), doc(1, words(10)),          // src0: 20 tokens
      doc(2, words(4), source = "src1")))            // src1: 4 tokens
    // total 24, budget 24/2 = 12: src0 down-samples to 12/20, src1 keeps all.
    val got = Curation.mixWeights(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("token_share"), r.getAs[Double]("sample_ratio"))).toMap
    assert(got("src0") === ((2L, 20L, 20.0 / 24, 12.0 / 20)))
    assert(got("src1") === ((1L, 4L, 4.0 / 24, 1.0)))
  }

  test("mix sample keeps whole under-budget sources and hash-filters the rest") {
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val dir = writeFixture(documents = Seq(
      doc(0, words(10)), doc(1, words(10)),          // src0: 20 tokens, thresh 600000
      doc(2, words(4), source = "src1")))            // src1: under budget → keep all
    val fp = Curation.splitAssign(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    val kept = Curation.mixSample(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_thresh")).toMap
    assert(kept.get(2L).contains(Curation.MixHashMod)) // uncapped source kept whole
    // src0 membership must follow the integer hash rule exactly.
    Seq(0L, 1L).foreach { id =>
      val expectKeep = fp(id) % Curation.MixHashMod < 600000L
      assert(kept.contains(id) === expectKeep, s"doc $id")
      if (expectKeep) assert(kept(id) === 600000L)
    }
  }

  test("per-source quality top-k ranks within source with doc_id tiebreak") {
    // Two sources; src0 has 7 docs with identical text (identical score —
    // tiebreak must be doc_id), src1 has 2 so the rank never reaches k.
    val text = "one two three four five six seven eight nine ten and the of"
    val dir = writeFixture(documents =
      (0L until 7L).map(i => doc(i, text)) ++
        Seq(doc(10L, text, source = "src1"), doc(11L, text, source = "src1")))
    val got = Curation.topQuality(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rk")) -> r.getAs[Long]("doc_id"))
      .toMap
    assert(got.count(_._1._1 == "src0") === Curation.QualityTopK)
    (1 to Curation.QualityTopK).foreach(k => assert(got(("src0", k)) === (k - 1).toLong))
    assert(got(("src1", 1)) === 10L && got(("src1", 2)) === 11L)
    assert(!got.contains(("src1", 3)))
  }

  test("curation cascade stages are monotone and match the live-data invariants") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Curation.curationCascade(spark, sfDir).collect()
    assert(got.nonEmpty)
    var totalRaw = 0L
    got.foreach { r =>
      val (raw, exact, canon, fin) = (r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_canonical"),
        r.getAs[Long]("n_final"))
      assert(raw >= exact && exact >= canon && canon >= fin,
        s"funnel must be monotone: $raw >= $exact >= $canon >= $fin")
      assert(raw > 0L)
      totalRaw += raw
    }
    assert(totalRaw === graft.Tables.documents(spark, sfDir).count())
  }

  test("quality calibration buckets by score value and counts duplicated docs") {
    // Two identical docs (duplicated pair) + one unique doc. All three
    // land in some bucket; the duplicated pair contributes n_dup_docs = 2
    // to its bucket, the unique doc 0 to its own.
    val dir = writeFixture(documents = Seq(
      doc(0, "dup text dup text dup text"),
      doc(1, "dup text dup text dup text"),
      doc(2, "a unique document with several distinct words here")))
    val got = Curation.qualityDupCalibration(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs")))).toMap
    assert(got.values.map(_._1).sum === 3L)
    assert(got.values.map(_._2).sum === 2L)
    // The dup pair shares one bucket (identical text -> identical score).
    assert(got.values.exists { case (n, d) => d === 2L && n >= 2L })
    got.keys.foreach(b => assert(b >= 0L && b <= 9L))
  }

  test("source overlap counts distinct shared texts once per source pair") {
    // "dup one" is in src A twice (distinct collapses it) and src B once;
    // "dup two" spans A and C; "only a" is unshared. Expected matrix:
    // (A,B) → 1, (A,C) → 1, no (B,C) row.
    val dir = writeFixture(documents = Seq(
      doc(0, "dup one", source = "srcA"), doc(1, "dup one", source = "srcA"),
      doc(2, "dup one", source = "srcB"), doc(3, "dup two", source = "srcA"),
      doc(4, "dup two", source = "srcC"), doc(5, "only a", source = "srcA")))
    assert(rows(Curation.sourceOverlap(spark, dir)) === Set(
      Seq("srcA", "srcB", 1L), Seq("srcA", "srcC", 1L)))
  }

  test("contamination flags only docs sharing shingles with the eval set") {
    // doc 0 is "eval"; doc 11 copies a 3-gram from it; doc 12 does not.
    val dir = writeFixture(documents = Seq(
      doc(0, "alpha beta gamma delta epsilon"),
      doc(11, "prefix words alpha beta gamma suffix"),
      doc(12, "completely different tokens everywhere now")))
    val got = Curation.contamination(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shared_shingles")).toMap
    assert(got.contains(11L) && got(11L) >= 1L)
    assert(!got.contains(12L))
  }

  test("bigram frequency counts occurrences with multiplicity and df per doc") {
    val dir = writeFixture(documents = Seq(
      doc(0, "a b a b c"),  // bigrams: "a b"×2, "b a", "b c"
      doc(1, "a b"),        // "a b" once more, second doc
      doc(2, "x")))         // sub-w doc contributes nothing
    val got = Curation.bigramFreq(spark, dir).collect()
      .map(r => r.getAs[String]("gram") ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"))).toMap
    assert(got === Map(
      "a b" -> ((3L, 2L)), "b a" -> ((1L, 1L)), "b c" -> ((1L, 1L))))
  }

  test("length trim keeps docs within per-source p5..p95 of n_chars") {
    // srcA lengths 1..21 (text of k chars): p5 = 2.0, p95 = 20.0 under
    // type-7 ((n-1)·p rank, linear interpolation) — so exactly the two
    // extreme docs fall outside. srcB is uniform; nothing trims.
    val dir = writeFixture(documents =
      (1 to 21).map(k => doc(k.toLong, "x" * k, source = "srcA")) ++
        Seq(doc(100, "yyyy", source = "srcB"), doc(101, "zzzz", source = "srcB")))
    val got = Curation.lengthTrim(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(got === ((2L to 20L).toSet ++ Set(100L, 101L)))
  }

  test("vocab frequency counts tf with multiplicity and df per doc") {
    val dir = writeFixture(documents = Seq(
      doc(0, "cat cat dog"), doc(1, "cat bird")))
    val got = operators.Curation.vocabFreq(spark, dir).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"))).toMap
    assert(got("cat") === (3L, 2L))
    assert(got("dog") === (1L, 1L))
    assert(got("bird") === (1L, 1L))
  }

  test("IVF cell probing: nprobe=1 stays in the query's cell, nprobe ranks across probed cells") {
    // Cell 0: vectors near +e1; cell 1: vectors near -e1. Query 0 sits in
    // cell 0.
    def v(sign: Float, jitter: Float) =
      Array.tabulate(8)(i => if (i == 0) sign else jitter * (i - 4))
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, v(1f, 0.01f), 0), EmbRow(1, v(1f, 0.02f), 0),
      EmbRow(2, v(1f, -0.01f), 0),
      EmbRow(3, v(-1f, 0.01f), 1), EmbRow(4, v(-1f, 0.02f), 1)))
    // Single-cell probing restricts candidates to the query's own cell.
    val single = Similarity.ivfTopKNprobe(spark, dir, 1).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(single === Set(1L, 2L))
    // Default nprobe=3 covers both cells here: all 4 others are
    // candidates, and exact cosine puts the aligned cell-0 vectors
    // ahead of the opposed cell-1 ones.
    val probed = Similarity.ivfTopK(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
      .map(_.getAs[Long]("neighbor_id")).toSeq
    assert(probed.length === 4)
    assert(probed.take(2).toSet === Set(1L, 2L))
    assert(probed.drop(2).toSet === Set(3L, 4L))
  }

  test("stratified sample: content-hash fate, per-source rates, exact accounting") {
    import org.apache.spark.sql.functions.{col, pmod}
    import graft.functions.TextHashOps
    // Controlled corpus: 40 docs across two sources with distinct texts.
    val docs = (0 until 40).map(i =>
      doc(i.toLong, s"document number $i with some words", source = s"src${i % 2}"))
    val dir = writeFixture(documents = docs)
    val got = Curation.stratifiedSample(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("bps"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(got.keySet === Set("src0", "src1"))
    got.foreach { case (src, (bps, nDocs, nKept)) =>
      assert(bps === 2500L + (src.length.toLong * 1777L) % 7000L)
      assert(nDocs === 20L)
      assert(nKept >= 0L && nKept <= nDocs)
    }
    // The fate of every doc is the pure function fp % 10000 < bps:
    // recompute it from the same expression and match the accounting.
    val bps = got("src0")._1 // both sources same name length -> same rate
    val kept = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        pmod(TextHashOps.polyHash(col("text")), org.apache.spark.sql.functions.lit(10000L)).as("m"))
      .collect().groupBy(_.getAs[String]("source"))
      .map { case (s, rows) => s -> rows.count(_.getAs[Long]("m") < bps).toLong }
    assert(got.map { case (s, v) => s -> v._3 } === kept)
    // Determinism: a second run returns byte-identical accounting.
    val again = Curation.stratifiedSample(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("bps"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(again === got)
  }

  test("source-overlap minhash: estimate and truth equal the driver " +
      "recompute over per-source fingerprint sets") {
    import graft.functions.Parity
    // three sources: A/B share 2 of their docs (one an exact duplicate
    // within A too — distinct fps collapse it), C is disjoint
    val texts = Seq(
      (0L, "alpha beta gamma", "srcA"), (1L, "delta epsilon zeta", "srcA"),
      (2L, "alpha beta gamma", "srcA"), // dup within A: same fp as doc 0
      (3L, "alpha beta gamma", "srcB"), (4L, "delta epsilon zeta", "srcB"),
      (5L, "eta theta iota", "srcB"),
      (6L, "kappa lambda mu", "srcC"))
    val dir = writeFixture(documents =
      texts.map { case (id, t, s) => doc(id, t, source = s) })
    // driver-side: fp31 = polyHash div Pack, distinct per source
    def fp31(t: String): Long =
      graft.functions.TextKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) / Parity.Pack
    val sets: Map[String, Set[Long]] = texts.groupBy(_._3).view
      .mapValues(_.map(x => fp31(x._2)).toSet).toMap
    def sig(hs: Set[Long]): IndexedSeq[Long] =
      Parity.minhashCoeffs.map { case (a, b) =>
        hs.map(h => (a * h + b) % Parity.P).min }
    val want = (for {
      sa <- sets.keys; sb <- sets.keys if sa < sb
    } yield {
      val (ha, hb) = (sets(sa), sets(sb))
      val matches = sig(ha).zip(sig(hb)).count { case (x, y) => x == y }.toLong
      val inter = ha.intersect(hb).size.toLong
      val uni = ha.size.toLong + hb.size.toLong - inter
      (sa, sb, matches, matches * 1000000L / Parity.NumHashes,
        inter, uni, inter * 1000000L / uni)
    }).toSet
    val got = graft.operators.Curation.sourceOverlapMinhash(spark, dir)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("sig_matches"), r.getAs[Long]("est_jaccard_ppm"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"),
        r.getAs[Long]("true_jaccard_ppm"))).toSet
    assert(got === want)
    // the planted overlap must be visible through BOTH faces: A∩B has
    // 2 shared fps (truth 2/3), A∩C and B∩C are disjoint (truth 0)
    val byPair = got.map(x => (x._1, x._2) -> (x._5, x._7)).toMap
    assert(byPair(("srcA", "srcB")) === ((2L, 666666L)))
    assert(byPair(("srcA", "srcC"))._1 === 0L)
    assert(byPair(("srcB", "srcC"))._1 === 0L)
    // signature-agreement estimate must also separate them: more
    // matches on the overlapping pair than on either disjoint pair
    val m = got.map(x => (x._1, x._2) -> x._3).toMap
    assert(m(("srcA", "srcB")) > m(("srcA", "srcC")))
    assert(m(("srcA", "srcB")) > m(("srcB", "srcC")))
  }

  test("incremental source signatures: stored ⊕ day-2 merge equals the " +
      "full recompute, slot for slot") {
    import graft.functions.Parity
    // srcA has both day-1 (even id) and day-2 (odd id) docs; srcNew
    // exists ONLY in the day-2 batch (the full-outer merge's null arm)
    val texts = Seq(
      (0L, "alpha beta gamma", "srcA"), (2L, "delta epsilon", "srcA"),
      (1L, "zeta eta theta", "srcA"),
      (4L, "iota kappa", "srcB"),
      (5L, "lambda mu nu", "srcNew"))
    val dir = writeFixture(documents =
      texts.map { case (id, t, s) => doc(id, t, source = s) })
    def fp31(t: String): Long =
      graft.functions.TextKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) / Parity.Pack
    // full driver recompute over the WHOLE corpus
    val want = texts.groupBy(_._3).map { case (src, docs) =>
      val hs = docs.map(d => fp31(d._2)).toSet
      src -> Parity.minhashCoeffs.map { case (a, b) =>
        hs.map(h => (a * h + b) % Parity.P).min }
    }
    val got = graft.operators.Curation.incrementalSourceSigs(spark, dir)
      .collect().map { r =>
        r.getAs[String]("source") ->
          (0 until Parity.NumHashes).map(i => r.getAs[Long](s"m$i"))
      }.toMap
    assert(got === want)
    // the day-2 batch must actually CHANGE srcA's signature somewhere
    // (otherwise the merge arm is untested): at least one slot's min
    // comes from the odd-id doc
    val day1A = Set(fp31("alpha beta gamma"), fp31("delta epsilon"))
    val day1Sig = Parity.minhashCoeffs.map { case (a, b) =>
      day1A.map(h => (a * h + b) % Parity.P).min }
    assert(got("srcA") !== day1Sig)
    assert(got.keySet === Set("srcA", "srcB", "srcNew"))
  }
}
