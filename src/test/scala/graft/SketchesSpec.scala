package graft

import graft.operators.{Dedup, Sketches}
import org.apache.spark.sql.functions._

/** Sketch-structure checks, each a FULL independent driver-side
  * recomputation over the sf0.001 fixture (500 docs / ~28k token
  * occurrences — small enough to fold in the driver, large enough that
  * the 3×1024 CMS grid actually collides):
  *
  *   - the Count-Min grid, probe mins, and heavy-token report are
  *     rebuilt in plain Scala from [[Sketches.cmsCoeffs]] and compared
  *     row-for-row (exact, est, overcount);
  *   - the Bloom semi-join report's nine columns are recomputed from
  *     scratch (bit set, per-key membership, pass/true tallies);
  *   - every edit-distance pair is re-derived by running a handwritten
  *     Levenshtein DP over the 120-char prefixes of the LSH candidate
  *     set (set equality, not spot checks).
  */
class SketchesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val P = graft.functions.Parity.P

  private def tok31(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % P)

  // ---- Count-Min ------------------------------------------------------

  private lazy val occurrences: Array[Long] = {
    val texts = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0))
    // split(text, ' ') keeps trailing empties (Spark limit -1 semantics)
    texts.flatMap(_.split(" ", -1)).map(tok31)
  }

  private def cells(h: Long): IndexedSeq[Long] =
    Sketches.cmsCoeffs.map { case (a, b) => ((a * h + b) % P) % Sketches.CmsWidth }

  test("CMS heavy-token report equals a full driver-side sketch rebuild") {
    val grid = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    occurrences.foreach { h =>
      cells(h).zipWithIndex.foreach { case (c, j) => grid((j, c)) += 1L }
    }
    val exact = occurrences.groupBy(identity).map { case (h, v) => h -> v.length.toLong }
    val tot = occurrences.length.toLong
    // heavy tokens by hash; token strings re-derived for the label column
    val tokOf = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).map(t => tok31(t) -> t).toMap
    val want = exact.collect {
      case (h, cnt) if cnt * Sketches.HHDen > tot =>
        val est = cells(h).zipWithIndex.map { case (c, j) => grid((j, c)) }.min
        (tokOf(h), cnt, est, est - cnt)
    }.toSet
    val got = Sketches.cmsTokenFreq(spark, sfDir).collect().map { r =>
      (r.getAs[String]("token"), r.getAs[Long]("exact_cnt"),
        r.getAs[Long]("est_cnt"), r.getAs[Long]("overcount"))
    }.toSet
    assert(got.nonEmpty, "no heavy tokens at sf0.001 — threshold miscalibrated")
    assert(got === want)
    // CMS error is one-sided: est never undercounts
    got.foreach { case (t, ex, est, over) =>
      assert(est >= ex && over === est - ex, s"token $t")
    }
  }

  test("CMS self-join-size estimate equals a full driver-side rebuild and never undershoots") {
    val grid = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    occurrences.foreach { h =>
      cells(h).zipWithIndex.foreach { case (c, j) => grid((j, c)) += 1L }
    }
    val exact = occurrences.groupBy(identity).map { case (_, v) => v.length.toLong }
    val trueSjs = exact.map(c => c * c).sum
    val estSjs = (0 until Sketches.CmsDepth).map { j =>
      grid.collect { case ((jj, _), c) if jj == j => c * c }.sum
    }.min
    val r = Sketches.cmsJoinSize(spark, sfDir).collect() match {
      case Array(only) => only
      case other       => fail(s"expected one row, got ${other.length}")
    }
    assert(r.getAs[Long]("depth") === Sketches.CmsDepth.toLong)
    assert(r.getAs[Long]("width") === Sketches.CmsWidth)
    assert(r.getAs[Long]("true_sjs") === trueSjs)
    assert(r.getAs[Long]("est_sjs") === estSjs)
    assert(r.getAs[Long]("overcount") === estSjs - trueSjs)
    // inner-product estimate is one-sided: collisions only ADD mass
    assert(estSjs >= trueSjs)
    // and it is a useful signal, not a degenerate total² bound
    val n = occurrences.length.toLong
    assert(estSjs < n * n, "estimate no better than the trivial N² bound")
  }

  test("CMS stats row matches the rebuild and the mergeable-grid bounds") {
    val r = Sketches.cmsSketchStats(spark, sfDir).collect() match {
      case Array(only) => only
      case other       => fail(s"expected one row, got ${other.length}")
    }
    assert(r.getAs[Long]("depth") === Sketches.CmsDepth.toLong)
    assert(r.getAs[Long]("width") === Sketches.CmsWidth)
    assert(r.getAs[Long]("n_occurrences") === occurrences.length.toLong)
    assert(r.getAs[Long]("total_updates") ===
      Sketches.CmsDepth * occurrences.length.toLong,
      "every occurrence increments exactly depth cells")
    val occupied = r.getAs[Long]("occupied_cells")
    assert(occupied > 0 && occupied <= Sketches.CmsDepth * Sketches.CmsWidth)
    assert(r.getAs[Long]("sum_overcount") > 0L,
      "the fixture grid is sized to collide; zero overcount means the error " +
        "columns are vacuous")
    assert(r.getAs[Long]("max_cell") >= r.getAs[Long]("total_updates") / occupied)
  }

  // ---- Bloom semi-join -------------------------------------------------

  test("Bloom report equals a scratch recompute; no false negatives") {
    val dimKeys = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0)).toSet
    val m = Sketches.mForCount(dimKeys.size.toLong)
    assert(m >= Sketches.BloomBitsPerKey * dimKeys.size,
      s"size policy must give ≥ bitsPerKey·n (m=$m, n=${dimKeys.size})")
    def bitsOf(k: Long): Seq[Long] =
      Sketches.bloomCoeffs.map { case (a, b) => ((a * (k % P) + b) % P) % m }
    val bitSet = dimKeys.flatMap(bitsOf)
    val byKey = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").cast("long").as("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("n"))
    val pass = byKey.filter { case (k, _) => bitsOf(k).forall(bitSet) }
    val isTrue = byKey.filter { case (k, _) => dimKeys(k) }
    val r = Sketches.bloomSemijoin(spark, sfDir).collect() match {
      case Array(only) => only
      case other       => fail(s"expected one row, got ${other.length}")
    }
    assert(r.getAs[Long]("filter_bits") === m)
    assert(r.getAs[Long]("bloom_bits_set") === bitSet.size.toLong)
    assert(r.getAs[Long]("keys_total") === byKey.length.toLong)
    assert(r.getAs[Long]("keys_pass_bloom") === pass.length.toLong)
    assert(r.getAs[Long]("keys_true") === isTrue.length.toLong)
    assert(r.getAs[Long]("keys_false_positive") ===
      (pass.length - pass.count { case (k, _) => dimKeys(k) }).toLong)
    assert(r.getAs[Long]("orders_total") === byKey.map(_._2).sum)
    assert(r.getAs[Long]("orders_pass_bloom") === pass.map(_._2).sum)
    assert(r.getAs[Long]("orders_true_match") === isTrue.map(_._2).sum)
    // the filter contract: membership is never missed
    assert(r.getAs[Long]("keys_true") <= r.getAs[Long]("keys_pass_bloom"))
    assert(isTrue.forall { case (k, _) => bitsOf(k).forall(bitSet) })
  }

  test("Bloom hash survives keys past the 64-bit multiply wall (key mod P first)") {
    // sf10-regime keys reach 9.9e9; with a < P = 2^31-1, a*key overflows
    // a long around 4.3e9 — the r18 campaign hit ANSI ARITHMETIC_OVERFLOW.
    // The fix reduces the key mod P before the multiply (the Carter-Wegman
    // family is defined over Z_P). Pin: the bit expression evaluates on a
    // 9.9e9 key under ANSI mode, and a key pair congruent mod P shares all
    // K bit positions (the documented false-positive source), while the
    // no-false-negative side is covered by the report test above.
    val big = 9900014999L
    val m = 1L << 12
    // BIGINT-cast the literals: the production key is a BIGINT column, but
    // a bare int-range literal would type the whole expression INT and
    // overflow on a*key before the mod-P fix even applies.
    val df = spark.range(1).select(
      array(Sketches.bloomBitColsForTest(
        s"CAST($big AS BIGINT)", m): _*).as("big_bits"),
      array(Sketches.bloomBitColsForTest(
        s"CAST(${big % P} AS BIGINT)", m): _*).as("cong_bits"))
    val row = df.collect()(0)
    val bigBits = row.getSeq[Long](0)
    val congBits = row.getSeq[Long](1)
    assert(bigBits.size === Sketches.BloomK)
    assert(bigBits.forall(b => b >= 0 && b < m))
    assert(bigBits === congBits,
      "keys congruent mod P must share all K positions by construction")
  }

  // ---- Edit-distance refinement ----------------------------------------

  private def lev(a: String, b: String): Long = {
    val prev = Array.tabulate(b.length + 1)(_.toLong)
    val cur = new Array[Long](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i.toLong
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0L else 1L)
        cur(j) = math.min(math.min(prev(j) + 1L, cur(j - 1) + 1L), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("edit-distance pairs = Levenshtein DP over the LSH candidate set") {
    val pfx = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(s"substring(text, 1, ${Sketches.EditPrefixLen})"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cands = Dedup.minhashLshPairs(spark, sfDir).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.nonEmpty, "no LSH candidates at sf0.001")
    val want = cands.map { case (a, b) => (a, b, lev(pfx(a), pfx(b))) }
      .filter(_._3 <= Sketches.EditMax).toSet
    val got = Sketches.editdistNearDup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("edit_distance"))).toSet
    assert(got === want)
    assert(got.nonEmpty, "planted near-dups must survive the refinement")
    assert(got.forall(_._3 <= Sketches.EditMax))
    // candidate-bounded: the refinement can only ever shrink the set
    assert(got.size <= cands.length)
  }
}
