package graft.operators

import graft.{CacheRegistry, Tables}
import graft.functions.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Probabilistic summary structures as exact relational arithmetic —
  * the fixed-memory side of the frequency/membership queries the suite
  * already answers exactly (`q3_heavy_hitters`, `d_exact_dedup`), plus
  * the edit-distance refinement of the MinHash candidate set.
  *
  * Everything here is deterministic integer math (seeded coefficient
  * tables shared between the Spark and DuckDB texts), so unlike real
  * randomized sketches each output is exactly oracle-able — the point
  * is to gate the STRUCTURE (counter layout, probe semantics, error
  * accounting), which is what survives to 100 TB:
  *
  *   - Count-Min sketch (Cormode–Muthukrishnan): depth×width counter
  *     grid, est(k) = min_j counter[j][h_j(k)]. The counters are plain
  *     additive sums, so Spark's partial aggregation IS the sketch
  *     merge: every task reduces its slice of the token stream to
  *     ≤ depth·width cells before the one tiny shuffle — the classic
  *     mergeable-summary contract, realized by the engine instead of
  *     hand-written combine logic. The reference's heavy-hitter path
  *     keeps exact per-key state
  *     (one-group-state/src/main/scala/cluster/DGrouping.scala's
  *     per-key HashMap); the sketch is its bounded-memory stand-in at corpus
  *     scale, and `t_cms_token_freq` reports est−exact per heavy
  *     token so the error is measured, not assumed.
  *
  *   - Bloom-filter semi-join: the runtime-filter economics behind
  *     Spark's own `spark.sql.optimizer.runtimeFilter.*` — build K
  *     bit positions per dimension key, prune the fact side by bit
  *     membership, count what the filter passed vs what the exact
  *     semi-join matches. The filter relation is ≤ min(K·|dim|, M)
  *     8-byte rows → broadcast; the fact table never shuffles for the
  *     probe. M follows a corpus-density policy (smallest power of
  *     two ≥ [[BloomBitsPerKey]]·|dim|, the same
  *     adaptivity-from-one-statistic move as Parity.planesForCount
  *     and the reference's dynamic fan-out d = ⌊p1·m⌋+1,
  *     stateless/src/main/scala/cluster/PartialKeyDynamicJoin.scala:57)
  *     so the false-positive rate holds at any scale factor instead
  *     of saturating.
  *
  *   - Edit-distance near-dup (`d_editdist_neardup`): Levenshtein over
  *     a fixed 120-char prefix, evaluated ONLY on the cached MinHash
  *     LSH candidate pairs — the character-level refinement filter of
  *     the standard dedup cascade (shingle Jaccard is word-level and
  *     misses transposition-heavy edits). Candidate-bounded: the DP
  *     cost is pairs·120², never corpus², and the prefix cap keeps
  *     each DP constant-size regardless of document length.
  *
  * 100 TB shape: the CMS counter relation is a constant ≤ depth·width
  * rows however large the corpus (partial agg collapses per-task
  * before the shuffle); the Bloom bit relation is ≤ M bits and rides a
  * broadcast; the edit-distance stage inherits the LSH candidate
  * generation's equi-shuffle-on-8-byte-keys discipline. No stage here
  * shuffles corpus text.
  */
object Sketches {

  // ------------------------------------------------------------------
  // Count-Min sketch over the documents token stream.
  // ------------------------------------------------------------------

  /** Counter grid: depth independent hash rows × width cells — a
    * constant byte budget at any corpus size (a production corpus
    * would run depth 5 × width 2^16 ≅ 2.6 MB; the merge/probe
    * structure is identical). The fixture grid is 3×16, deliberately
    * NARROWER than the 31-token fixture vocabulary so collisions are
    * VISIBLE (overcount > 0) — the error-accounting columns would be
    * vacuous on a sketch too wide to collide.
    */
  val CmsDepth = 3
  val CmsWidth = 16L

  /** Heavy-token report threshold: exact_cnt · HHDen > total
    * occurrences, i.e. frequency > 1% — scale-free, mirroring the
    * q3_heavy_hitters integer-predicate form. Selective on the
    * fixture: the 30 body tokens sit at ~3.3%, the planted `dup`
    * marker at ~0.1% falls below it.
    */
  val HHDen = 100L

  /** Affine row hashes h_j(x) = ((a_j·x + b_j) mod P) mod width, seeded
    * once so both dialects embed identical literals. a,x < P < 2^31
    * keeps every product under 2^62.
    */
  val cmsCoeffs: IndexedSeq[(Long, Long)] = {
    val rnd = new Random(2026)
    IndexedSeq.fill(CmsDepth)((1L + rnd.nextLong(P - 1), rnd.nextLong(P)))
  }

  /** 31-bit char-poly hash of a scalar string column — the per-token
    * key the row hashes permute (same fold as Parity.hashedArraySpark,
    * scalar form).
    */
  private[graft] def tok31Spark(c: String): String =
    s"aggregate(transform(split($c, ''), ch -> CAST(ascii(ch) AS BIGINT)), " +
      s"0L, (acc, x) -> (acc * 31 + x) % $P)"

  private def tok31Duck(c: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($c, ''), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $P)"

  /** One cell expression per depth row over hash column `h` — the width
    * parameterizes so the dedup plan-choice grid (Dedup.AdaptiveCmsWidth)
    * shares THIS hash family instead of duplicating it: a change to the
    * hash form lands in every grid at once.
    */
  private[graft] def cmsCellExprs(h: String,
      width: Long = CmsWidth): IndexedSeq[String] =
    cmsCoeffs.map { case (a, b) => s"(($a * $h + $b) % $P) % $width" }

  /** (tok, h) for every token OCCURRENCE (non-distinct — CMS counts
    * frequencies). Cached: both CMS queries consume it.
    */
  private def occRel(spark: SparkSession, sfDir: String): DataFrame =
    CacheRegistry.cached(spark, s"sketch.cmsOcc:$sfDir") {
      Tables.documents(spark, sfDir)
        .select(explode(expr(tokensSpark("text"))).as("tok"))
        .select(col("tok"), expr(tok31Spark("tok")).as("h"))
    }

  /** The counter grid: ≤ depth·width rows. Partial aggregation bounds
    * every task's shuffle contribution to the grid size — the sketch
    * merge property, executed by the engine.
    */
  private def counterRel(spark: SparkSession, sfDir: String): DataFrame =
    CacheRegistry.cached(spark, s"sketch.cmsCounters:$sfDir") {
      occRel(spark, sfDir)
        .select(posexplode(array(cmsCellExprs("h").map(expr): _*)))
        .toDF("j", "cell")
        .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
    }

  /** (tok, exact_cnt, est_cnt) for EVERY distinct token: the exact
    * counts (one grouped agg) probed against the broadcast counter
    * grid. Cached for the freq + stats queries.
    */
  private def estRel(spark: SparkSession, sfDir: String): DataFrame =
    CacheRegistry.cached(spark, s"sketch.cmsEst:$sfDir") {
      val probes = occRel(spark, sfDir)
        .groupBy("tok", "h").agg(count(lit(1)).as("exact_cnt"))
        .select(col("tok"), col("exact_cnt"),
          posexplode(array(cmsCellExprs("h").map(expr): _*)))
        .toDF("tok", "exact_cnt", "j", "cell")
      probes.join(broadcast(counterRel(spark, sfDir)), Seq("j", "cell"))
        .groupBy("tok", "exact_cnt").agg(min("cnt").as("est_cnt"))
    }

  /** Gated: per heavy token (frequency > 1/[[HHDen]]), the exact count
    * next to the sketch estimate and the overcount — est ≥ exact always
    * (CMS one-sided error), and the overcount column is the measured
    * price of the 24 KB counter budget.
    */
  def cmsTokenFreq(spark: SparkSession, sfDir: String): DataFrame = {
    val tot = occRel(spark, sfDir).agg(count(lit(1)).as("n"))
    estRel(spark, sfDir).crossJoin(broadcast(tot))
      .where(col("exact_cnt") * HHDen > col("n"))
      .select(col("tok").as("token"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
  }

  /** Gated: one-row sketch health report — grid occupancy, the largest
    * counter, and the total overcount across ALL distinct tokens (the
    * exact Σ collision mass, not a bound).
    */
  def cmsSketchStats(spark: SparkSession, sfDir: String): DataFrame = {
    val c = counterRel(spark, sfDir).agg(
      count(lit(1)).as("occupied_cells"),
      max("cnt").as("max_cell"),
      sum("cnt").as("total_updates"))
    val t = estRel(spark, sfDir).agg(
      count(lit(1)).as("n_tokens"),
      sum("exact_cnt").as("n_occurrences"),
      sum(col("est_cnt") - col("exact_cnt")).as("sum_overcount"))
    c.crossJoin(t).select(
      lit(CmsDepth.toLong).as("depth"), lit(CmsWidth).as("width"),
      col("occupied_cells"), col("max_cell"), col("total_updates"),
      col("n_tokens"), col("n_occurrences"), col("sum_overcount"))
  }

  /** Gated: sketch-based SELF-JOIN SIZE estimation — the optimizer
    * statistic that predicts the Σ cnt² row blowup of an equi-self-join
    * BEFORE running it (the cost that makes `d_jaccard_pairs` a labeled
    * quadratic baseline; a planner reading this estimate picks the
    * prefix/LSH sibling instead). Classic CMS inner-product estimate
    * (Cormode–Muthukrishnan): per depth row j, est_j = Σ_cell cnt_j²;
    * est = min_j est_j — one-sided (est ≥ truth: each row's sum is
    * Σ cnt² plus nonnegative cross terms from colliding keys), so
    * `overcount` is the measured collision price, same accounting as
    * `t_cms_token_freq`. The modern form of the reference's
    * cost-model-before-strategy discipline
    * (one-group-stateless/src/main/scala/partitioner/DPartitioner.scala:31-54
    * picks HH vs APK from measured stats): estimate the join, then pick
    * the plan.
    *
    * 100 TB shape: the estimate needs ONLY the grid (constant rows,
    * built by partial aggregation in one corpus pass) — never the
    * per-key frequency relation the exact Σ cnt² needs; truth here is
    * the fixture-affordable audit column. Grid cell sums stay < 2^31
    * per ~10⁹-occurrence corpus slice, so cnt² sums sit far under
    * BIGINT; past that, the DECIMAL(38,0) hop (q4 discipline).
    */
  def cmsJoinSize(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = estRel(spark, sfDir)
      .agg(sum(col("exact_cnt") * col("exact_cnt")).as("true_sjs"))
    val est = counterRel(spark, sfDir)
      .groupBy("j").agg(sum(col("cnt") * col("cnt")).as("s"))
      .agg(min("s").as("est_sjs"))
    truth.crossJoin(est).select(
      lit(CmsDepth.toLong).as("depth"), lit(CmsWidth).as("width"),
      col("true_sjs"), col("est_sjs"),
      (col("est_sjs") - col("true_sjs")).as("overcount"))
  }

  // ---- CMS SQL (both dialects generated from the same constants) ----

  private def cmsBaseSql(unnest: String => String, hash: String => String): String = {
    val cells = cmsCellExprs("h").zipWithIndex
      .map { case (e, j) => s"SELECT $j AS j, $e AS cell FROM oh" }
      .mkString("\n  UNION ALL ")
    val probes = cmsCellExprs("h").zipWithIndex
      .map { case (e, j) => s"SELECT tok, exact_cnt, $j AS j, $e AS cell FROM ex" }
      .mkString("\n  UNION ALL ")
    s"""occ AS (SELECT ${unnest("text")} AS tok FROM documents),
       |oh AS (SELECT tok, ${hash("tok")} AS h FROM occ),
       |cells AS (
       |  $cells),
       |counters AS (
       |  SELECT j, cell, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY j, cell),
       |ex AS (
       |  SELECT tok, h, CAST(count(*) AS BIGINT) AS exact_cnt FROM oh GROUP BY tok, h),
       |probes AS (
       |  $probes),
       |est AS (
       |  SELECT p.tok, p.exact_cnt, min(c.cnt) AS est_cnt
       |  FROM probes p JOIN counters c ON p.j = c.j AND p.cell = c.cell
       |  GROUP BY p.tok, p.exact_cnt)""".stripMargin
  }

  private val cmsBaseDuck: String =
    cmsBaseSql(t => s"unnest(string_split($t, ' '))", tok31Duck)
  private val cmsBaseSpark: String =
    cmsBaseSql(t => s"explode(split($t, ' '))", tok31Spark)

  // One SELECT body per query, parameterized on the dialect base CTE —
  // a report-column edit cannot diverge the two faces.
  private def cmsFreqSql(base: String): String =
    s"""WITH $base
       |SELECT tok AS token, exact_cnt, est_cnt, est_cnt - exact_cnt AS overcount
       |FROM est WHERE exact_cnt * $HHDen > (SELECT count(*) FROM occ)""".stripMargin

  private def cmsStatsSql(base: String): String =
    s"""WITH $base
       |SELECT CAST($CmsDepth AS BIGINT) AS depth, CAST($CmsWidth AS BIGINT) AS width,
       |  (SELECT count(*) FROM counters) AS occupied_cells,
       |  (SELECT max(cnt) FROM counters) AS max_cell,
       |  (SELECT CAST(sum(cnt) AS BIGINT) FROM counters) AS total_updates,
       |  (SELECT count(*) FROM est) AS n_tokens,
       |  (SELECT CAST(sum(exact_cnt) AS BIGINT) FROM est) AS n_occurrences,
       |  (SELECT CAST(sum(est_cnt - exact_cnt) AS BIGINT) FROM est) AS sum_overcount""".stripMargin

  private def cmsJoinSizeSql(base: String): String =
    s"""WITH $base
       |SELECT depth, width, true_sjs, est_sjs, est_sjs - true_sjs AS overcount
       |FROM (
       |  SELECT CAST($CmsDepth AS BIGINT) AS depth, CAST($CmsWidth AS BIGINT) AS width,
       |    (SELECT CAST(sum(exact_cnt * exact_cnt) AS BIGINT) FROM est) AS true_sjs,
       |    (SELECT CAST(min(s) AS BIGINT) FROM (
       |       SELECT j, sum(cnt * cnt) AS s FROM counters GROUP BY j) rows_per_depth)
       |      AS est_sjs) x""".stripMargin

  val cmsTokenFreqSql: String = cmsFreqSql(cmsBaseDuck)
  val cmsTokenFreqSparkSql: String = cmsFreqSql(cmsBaseSpark)
  val cmsSketchStatsSql: String = cmsStatsSql(cmsBaseDuck)
  val cmsSketchStatsSparkSql: String = cmsStatsSql(cmsBaseSpark)
  val cmsJoinSizeDuckSql: String = cmsJoinSizeSql(cmsBaseDuck)
  val cmsJoinSizeSparkSql: String = cmsJoinSizeSql(cmsBaseSpark)

  // ------------------------------------------------------------------
  // Bloom-filter semi-join economics.
  // ------------------------------------------------------------------

  val BloomK = 3
  val BloomBitsPerKey = 8L
  val BloomMinBits = 256L
  val BloomMaxBits: Long = 1L << 22

  val bloomCoeffs: IndexedSeq[(Long, Long)] = {
    val rnd = new Random(77)
    IndexedSeq.fill(BloomK)((1L + rnd.nextLong(P - 1), rnd.nextLong(P)))
  }

  /** Filter size policy: smallest power of two ≥ bitsPerKey·n, clamped
    * to [min, max] — one dimension-count statistic decides M, so the
    * false-positive rate is scale-invariant instead of the filter
    * saturating at 10× the keys.
    */
  def mForCount(n: Long): Long = {
    var m = BloomMinBits
    while (m < BloomMaxBits && n * BloomBitsPerKey > m) m <<= 1
    m
  }

  /** DuckDB/Spark-SQL replica of [[mForCount]] over a count column. */
  def mForCountSql(n: String): String = {
    val arms = Iterator.iterate(BloomMinBits)(_ << 1)
      .takeWhile(_ < BloomMaxBits)
      .map(m => s"WHEN $n * $BloomBitsPerKey <= $m THEN $m")
      .mkString(" ")
    s"CAST((CASE $arms ELSE $BloomMaxBits END) AS BIGINT)"
  }

  // The key is reduced mod P BEFORE the multiply: the Carter–Wegman
  // family is defined over Z_P, so keys ≥ P always needed this
  // reduction for the math to be the advertised hash — and without it
  // a·key overflows the 64-bit long at keys ≳ 2^63/P ≈ 4.3·10⁹ (hit at
  // the sf10 tree, where custkeys reach 9.9·10⁹; ANSI mode raised
  // ARITHMETIC_OVERFLOW — r18). After reduction a·(key mod P) ≤
  // (P−1)² ≈ 4.6·10¹⁸ < 2^63. Two keys congruent mod P share all K bit
  // positions — a false-positive source the filter contract already
  // absorbs (no false negatives: a member's own bits are still set).
  private def bloomBitCols(key: String, m: Long): IndexedSeq[Column] =
    bloomCoeffs.map { case (a, b) =>
      expr(s"(($a * (($key) % $P) + $b) % $P) % $m")
    }

  /** Test-only window onto the bit expressions (SketchesSpec pins the
    * overflow-wall behavior on a literal key without a full report run).
    */
  private[graft] def bloomBitColsForTest(key: String, m: Long): IndexedSeq[Column] =
    bloomBitCols(key, m)

  /** Gated: the runtime-filter report. Dimension = BUILDING-segment
    * customers; fact = orders grouped per custkey. One row: how many
    * probe keys / fact rows the Bloom filter passes vs the exact
    * semi-join, the false-positive surplus, and the filter size
    * actually used. keys_true ≤ keys_pass_bloom always (no false
    * negatives — asserted in SketchesSpec).
    */
  def bloomSemijoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("long").as("key"))
    // One count() action resolves the filter size — the same
    // statistic-then-plan move as Parity.planesForCount.
    val m = mForCount(dim.count())
    val bits = dim.select(explode(array(bloomBitCols("key", m): _*)).as("bit")).distinct()
    val byKey = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").cast("long").as("key"))
      .agg(count(lit(1)).as("n_orders"))
    val probeBits = byKey
      .select(col("key"), col("n_orders"),
        posexplode(array(bloomBitCols("key", m): _*)))
      .toDF("key", "n_orders", "j", "bit")
    val hits = probeBits
      .join(broadcast(bits.withColumn("present", lit(1L))), Seq("bit"), "left")
      .groupBy("key", "n_orders")
      .agg(sum(coalesce(col("present"), lit(0L))).as("hits"))
    val joined = hits
      .join(broadcast(dim.distinct().withColumn("member", lit(1L))), Seq("key"), "left")
      .select(col("key"), col("n_orders"),
        when(col("hits") === BloomK.toLong, 1L).otherwise(0L).as("pass"),
        coalesce(col("member"), lit(0L)).as("is_true"))
    val nbits = bits.agg(count(lit(1)).as("bloom_bits_set"))
    joined.agg(
        count(lit(1)).as("keys_total"),
        sum("pass").as("keys_pass_bloom"),
        sum("is_true").as("keys_true"),
        sum(when(col("pass") === 1L && col("is_true") === 0L, 1L).otherwise(0L))
          .as("keys_false_positive"),
        sum("n_orders").as("orders_total"),
        sum(when(col("pass") === 1L, col("n_orders")).otherwise(0L))
          .as("orders_pass_bloom"),
        sum(when(col("is_true") === 1L, col("n_orders")).otherwise(0L))
          .as("orders_true_match"))
      .crossJoin(broadcast(nbits))
      .withColumn("filter_bits", lit(m))
  }

  private def bloomSqlText(): String = {
    def bitSelects(rel: String, extra: String): String =
      bloomCoeffs.zipWithIndex.map { case ((a, b), j) =>
        // key reduced mod P before the multiply — see bloomBitCols.
        s"SELECT $extra$j AS j, (($a * (key % $P) + $b) % $P) % (SELECT m FROM mm) AS bit FROM $rel"
      }.mkString("\n  UNION ALL ")
    s"""WITH dim AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS key FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |mm AS (SELECT ${mForCountSql("count(*)")} AS m FROM dim),
       |bits AS (SELECT DISTINCT bit FROM (
       |  ${bitSelects("dim", "")})),
       |bykey AS (
       |  SELECT CAST(o_custkey AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS n_orders
       |  FROM orders GROUP BY 1),
       |pb AS (
       |  ${bitSelects("bykey", "key, n_orders, ")}),
       |hits AS (
       |  SELECT p.key, p.n_orders,
       |    CAST(sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
       |  FROM pb p LEFT JOIN bits b ON p.bit = b.bit
       |  GROUP BY p.key, p.n_orders),
       |j AS (
       |  SELECT h.key, h.n_orders,
       |    CASE WHEN h.hits = $BloomK THEN 1 ELSE 0 END AS pass,
       |    CASE WHEN d.key IS NOT NULL THEN 1 ELSE 0 END AS is_true
       |  FROM hits h LEFT JOIN (SELECT DISTINCT key FROM dim) d ON h.key = d.key)
       |SELECT count(*) AS keys_total,
       |  CAST(sum(pass) AS BIGINT) AS keys_pass_bloom,
       |  CAST(sum(is_true) AS BIGINT) AS keys_true,
       |  CAST(sum(CASE WHEN pass = 1 AND is_true = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS keys_false_positive,
       |  CAST(sum(n_orders) AS BIGINT) AS orders_total,
       |  CAST(sum(CASE WHEN pass = 1 THEN n_orders ELSE 0 END) AS BIGINT)
       |    AS orders_pass_bloom,
       |  CAST(sum(CASE WHEN is_true = 1 THEN n_orders ELSE 0 END) AS BIGINT)
       |    AS orders_true_match,
       |  (SELECT count(*) FROM bits) AS bloom_bits_set,
       |  (SELECT m FROM mm) AS filter_bits
       |FROM j""".stripMargin
  }

  /** Both engines run the IDENTICAL text modulo `1`-vs-`key, n_orders`
    * GROUP BY shorthand — ANSI subset.
    */
  val bloomSemijoinSql: String = bloomSqlText()
  val bloomSemijoinSparkSql: String = bloomSqlText()

  // ------------------------------------------------------------------
  // Edit-distance near-dup refinement.
  // ------------------------------------------------------------------

  /** Levenshtein prefix window and acceptance threshold: distance ≤ 30
    * over the first 120 chars keeps genuinely-revised near-dups and
    * drops band-collision accidents; the fixed window caps each DP at
    * 120² cells.
    */
  val EditPrefixLen = 120
  val EditMax = 30L

  /** Gated: (id_a, id_b, edit_distance) for MinHash LSH candidate pairs
    * whose 120-char-prefix Levenshtein distance is ≤ [[EditMax]] — the
    * character-level refinement stage of the dedup cascade, bounded by
    * the candidate set (never corpus²).
    */
  def editdistNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(s"substring(text, 1, $EditPrefixLen)").as("pfx"))
    Dedup.minhashLshPairs(spark, sfDir).select("id_a", "id_b")
      .join(docs.select(col("doc_id").as("id_a"), col("pfx").as("pfx_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("pfx").as("pfx_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pfx_a"), col("pfx_b")).cast("long").as("edit_distance"))
      .where(col("edit_distance") <= EditMax)
  }

  /** One text for both engines (ANSI subset — `substr` and
    * `levenshtein` are common), parameterized on the candidate CTE so
    * each dialect injects its own minhash-pairs text.
    */
  private def editdistSql(candsSql: String): String =
    s"""WITH cands AS ($candsSql),
       |d AS (SELECT doc_id, substr(text, 1, $EditPrefixLen) AS pfx FROM documents)
       |SELECT c.id_a, c.id_b,
       |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_distance
       |FROM cands c
       |JOIN d a ON a.doc_id = c.id_a
       |JOIN d b ON b.doc_id = c.id_b
       |WHERE levenshtein(a.pfx, b.pfx) <= $EditMax""".stripMargin

  val editdistNearDupSql: String = editdistSql(Dedup.minhashLshPairsSql)

  /** Spark-dialect face over the minhash text in [[graft.SqlQueries]];
    * the candidate CTE is injected there to share the one existing
    * text.
    */
  def editdistNearDupSparkSql(candsSql: String): String = editdistSql(candsSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_cms_token_freq" -> (cmsTokenFreq _),
    "t_cms_sketch_stats" -> (cmsSketchStats _),
    "t_cms_join_size" -> (cmsJoinSize _),
    "a_bloom_semijoin" -> (bloomSemijoin _),
    "d_editdist_neardup" -> (editdistNearDup _))

  val oracles: Map[String, String] = Map(
    "t_cms_token_freq" -> cmsTokenFreqSql,
    "t_cms_sketch_stats" -> cmsSketchStatsSql,
    "t_cms_join_size" -> cmsJoinSizeDuckSql,
    "a_bloom_semijoin" -> bloomSemijoinSql,
    "d_editdist_neardup" -> editdistNearDupSql)
}
