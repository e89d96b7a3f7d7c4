package graft

import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Planted-fixture specs for the windowed-analytics operators (as-of join,
  * sessionization incl. the streaming session_window twin). The oracle
  * gate proves them at corpus scale; these pin the semantics on
  * hand-checkable rows.
  */
class AnalyticsSpec extends SparkSpec {

  /** Independent Scala recompute of the derived partsupp relation
    * (Analytics.partsupp): (ps_partkey, ps_suppkey, ps_availqty,
    * ps_supplycost_cents). Pure integer arithmetic, no Spark plan shared
    * with the implementation under test.
    */
  private def refPartsupp(sfDir: String): Seq[(Long, Long, Long, Long)] = {
    val stride = Analytics.PartSuppStride
    val s0 = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").cast("long")).collect()
      .count(_.getLong(0) < stride).toLong
    val step = math.max(1L, s0 / 4)
    Tables.part(spark, sfDir).select(col("p_partkey").cast("long"))
      .collect().map(_.getLong(0)).toSeq.flatMap { pk =>
        val bp = pk % stride
        val off = pk - bp
        (0L to 3L).map { i =>
          val bs = (bp + i * step) % s0
          (pk, off + bs,
            (bp * 17 + bs * 31) % 9999 + 1,
            (bp * 293 + bs * 577) % 99901 + 100)
        }
      }.distinct
  }

  test("derived partsupp: generator parity, primary key, referential integrity") {
    val sfDir = "/root/testdata/sf0.001"
    val want = refPartsupp(sfDir).toSet
    val got = Analytics.partsupp(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("ps_partkey"), r.getAs[Long]("ps_suppkey"),
        r.getAs[Long]("ps_availqty"), r.getAs[Long]("ps_supplycost_cents")))
    assert(got.toSet === want)
    // (partkey, suppkey) is a primary key after the DISTINCT
    assert(got.map(x => (x._1, x._2)).distinct.length === got.length)
    // referential integrity: every derived key exists in its dimension
    val sKeys = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").cast("long")).collect().map(_.getLong(0)).toSet
    val pKeys = Tables.part(spark, sfDir)
      .select(col("p_partkey").cast("long")).collect().map(_.getLong(0)).toSet
    assert(got.forall(x => sKeys(x._2) && pKeys(x._1)))
    // sf0.001 has S0=10 ≥ 4·step/…: all four ring steps are distinct,
    // so every part carries exactly 4 suppliers
    assert(got.groupBy(_._1).forall(_._2.length == 4))
    // domains: availqty in [1, 9999], cost in [100, 100000] cents
    assert(got.forall(x => x._3 >= 1 && x._3 <= 9999 &&
      x._4 >= 100 && x._4 <= 100000))
  }

  test("as-of join picks the latest quote at or before each trade, per user") {
    // Even event_id = trade, odd = quote (the operator's convention).
    // user 1: quotes (1, t=100, x=10), (3, t=300, x=30), (5, t=300, x=50)
    //         — the t=300 tie dedupes to max event_id 5.
    //         trades (2, t=200) → quote 1; (4, t=300) → quote 5 (inclusive);
    //                (6, t=50)  → no prior quote, dropped.
    // user 2: trade (8, t=500) with only user-1 quotes → dropped
    //         (as-of never crosses the partition key).
    val dir = writeFixture(events = Seq(
      event(1, 100, 1, "q", 10.0), event(3, 300, 1, "q", 30.0),
      event(5, 300, 1, "q", 50.0),
      event(2, 200, 1, "t"), event(4, 300, 1, "t"), event(6, 50, 1, "t"),
      event(8, 500, 2, "t")))
    val got = rows(Analytics.asofJoin(spark, dir))
    assert(got === Set(
      Seq(1L, 2L, 200L, 1L, 10L),
      Seq(1L, 4L, 300L, 5L, 50L)))
  }

  test("sessionize breaks sessions on gaps above the threshold, per user") {
    val gap = Analytics.SessionGapMs
    // user 1: events at 0, gap (boundary-inclusive), and 3·gap — the first
    // two are one session (diff == gap, not >), the third starts a new one.
    // user 2: one event → its own session. Same-timestamp rows collapse
    // into the same session regardless of tie order.
    val dir = writeFixture(events = Seq(
      event(1, 0, 1, "a"), event(2, gap, 1, "a"), event(3, 3 * gap, 1, "a"),
      event(4, 3 * gap, 1, "a"),
      event(5, 42, 2, "a")))
    val got = rows(Analytics.sessionize(spark, dir))
    assert(got === Set(
      Seq(1L, 0L, gap, gap, 2L),
      Seq(1L, 3 * gap, 3 * gap, 0L, 2L),
      Seq(2L, 42L, 42L, 0L, 1L)))
  }

  test("streaming session_window matches the batch gaps-and-islands sessions") {
    import graft.streaming.StreamingParity
    import graft.streaming.StreamingParity.PwEvent
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val gap = 1000L
    val input = MemoryStream[PwEvent]
    val query = StreamingParity.sessionWindowStream(input.toDS(), gap)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // word A: 10, 500, 1400 chain into ONE session (each gap ≤ 1000);
      // then 5000 starts a second. word B: single event at 200.
      input.addData(Seq(
        PwEvent(10, 0, "A"), PwEvent(500, 0, "A"), PwEvent(1400, 0, "A"),
        PwEvent(200, 0, "B")))
      query.processAllAvailable()
      input.addData(Seq(PwEvent(5000, 0, "A")))
      query.processAllAvailable()
      // Sentinel far ahead closes every session.
      input.addData(Seq(PwEvent(100000, 0, "SENT")))
      query.processAllAvailable()
      val got = s.table("sessions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === Set(
        ("A", 10L, 1400L, 3L), ("A", 5000L, 5000L, 1L), ("B", 200L, 200L, 1L)))
    } finally query.stop()
  }

  test("HLL++ approximate distinct tracks the exact count within its error bound") {
    // The sketch path for COUNT(DISTINCT) at 100 TB — one pass, fixed
    // memory, mergeable across partitions — vs the exact shuffle. Not
    // oracle-gatable (sketch hashes are engine-specific); asserted
    // against the exact count on the shared fixture instead.
    val s = spark
    val sfDir = "/root/testdata/sf0.01"
    val ev = Tables.events(s, sfDir)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val rsd = 0.05
    val approx = ev.select(approx_count_distinct(col("user_id"), rsd)).head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 3 * rsd, s"approx $approx vs exact $exact: relErr $relErr")
  }

  test("expectations suite: every check evaluates and passes on the clean fixture") {
    import graft.operators.Analytics
    val got = Analytics.expectations(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("observed"), r.getAs[Boolean]("passed")))).toMap
    assert(got.keySet === Set("lineitem_nonempty", "null_orderkeys",
      "orphan_lineitems", "dup_orderkeys", "qty_out_of_range",
      "nonpositive_price"))
    // The generated fixture is referentially clean: the volume check
    // observes rows, every violation check observes zero.
    assert(got("lineitem_nonempty")._1 > 0L)
    got.filter(_._1 != "lineitem_nonempty").foreach { case (name, (obs, _)) =>
      assert(obs === 0L, name)
    }
    assert(got.values.forall(_._2), "all checks pass")
  }

  test("large orders equal the driver-side quantity scan at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long").as("k"), col("l_quantity")).collect()
      .groupBy(_.getAs[Long]("k"))
      .map { case (k, rs) =>
        k -> BigDecimal(rs.map(_.getAs[Double]("l_quantity")).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      .filter(_._2 > Analytics.LargeOrderQty)
    val got = Analytics.largeOrders(spark, sfDir).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("total_qty")).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("sole-blame suppliers equal the driver-side scan (EXISTS/NOT-EXISTS rule)") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").cast("long").as("ok"),
        col("l_suppkey").cast("long").as("sk"),
        (col("l_shipdate") > col("o_orderdate") +
          expr(s"INTERVAL ${Analytics.LateDays} DAYS")).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = rows.groupBy(_._1)
    val want = byOrder.toSeq.flatMap { case (_, ls) =>
      val sups = ls.map(_._2).distinct
      val lateSups = ls.filter(_._3).map(_._2).distinct
      if (sups.size >= 2 && lateSups.size == 1) lateSups else Seq.empty
    }.groupBy(identity).map { case (s, o) => s -> o.size.toLong }
    val got = Analytics.soleBlameSuppliers(spark, sfDir).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("numwait")).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("small-quantity revenue equals the driver-side correlated-avg scan") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long"),
        col("l_quantity").cast("decimal(18,2)").cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perPart = rows.groupBy(_._1).map { case (p, ls) =>
      p -> ((ls.map(_._2).sum, ls.size.toLong))
    }
    val small = rows.filter { case (p, q, _) =>
      val (sum, n) = perPart(p); 5L * q * n < sum
    }
    val r = Analytics.smallQtyRevenue(spark, sfDir).head()
    assert(r.getAs[Long]("n_small_lines") === small.size.toLong)
    assert(r.getAs[Long]("sum_price_cents") === small.map(_._3).sum)
    assert(small.nonEmpty)
  }

  test("idle customers equal the driver-side balance/anti-join scan") {
    val sfDir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val withOrders = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(Analytics.IdleCutoff).cast("timestamp"))
      .select(col("o_custkey").cast("long")).collect().map(_.getLong(0)).toSet
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pos = cust.filter(_._3 > 0)
    val total = pos.map(_._3).sum
    val n = pos.size.toLong
    val want = pos
      .filter(c => c._3 * n > total && !withOrders.contains(c._1))
      .groupBy(c => nations(c._2))
      .map { case (name, cs) => name -> ((cs.size.toLong, cs.map(_._3).sum)) }
    val got = Analytics.idleCustomers(spark, sfDir).collect()
      .map(r => r.getAs[String]("n_name") ->
        ((r.getAs[Long]("n_customers"), r.getAs[Long]("sum_bal_cents")))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("SCD-2 build: intervals tile per key, one open current row, version shapes") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = Analytics.scd2Build(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("version"),
        r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"),
        r.getAs[Long]("is_current")))
    val byKey = rows.groupBy(_._1)
    assert(byKey.nonEmpty)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._2)
      // first interval opens at 1992; exactly one open current row.
      assert(sorted.head._3 === 1992L)
      assert(vs.count(_._5 == 1L) === 1)
      assert(sorted.last._4 === Analytics.Scd2OpenYear)
      // no gaps, no overlap: valid_to + 1 chains to the next valid_from.
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0)._4 + 1 === w(1)._3, s"key $k")
      }
      // change-feed shape: %8==1 keys have 3 versions, %4==1 two, else one.
      val expected = if (k % 8 == 1) 3 else if (k % 4 == 1) 2 else 1
      assert(vs.size === expected, s"key $k")
    }
  }

  test("SCD-2 as-of: every order matches exactly one version; CASE recomputation agrees") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Analytics.scd2Asof(spark, sfDir).collect()
      .map(r => r.getAs[Long]("version") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("n_customers")))).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("long").as("k"),
        year(col("o_orderdate")).cast("long").as("y"))
    // Independent per-order version rule, no window/interval machinery.
    val want = orders.select(expr(
        """CASE WHEN k % 8 = 1 AND y >= 1996 THEN 3L
          |     WHEN k % 4 = 1 AND y >= 1994 THEN 2L
          |     ELSE 1L END""".stripMargin).as("version"), col("k"))
      .groupBy("version")
      .agg(count(lit(1)).as("n"), countDistinct("k").as("nc"))
      .collect().map(r => r.getAs[Long]("version") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("nc")))).toMap
    assert(got === want)
    assert(got.values.map(_._1).sum === orders.count())
  }

  test("column profile reports invariant-consistent stats per profiled column") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Analytics.profileLineitem(spark, sfDir).collect()
    val nRows = graft.Tables.lineitem(spark, sfDir).count()
    assert(got.map(_.getAs[String]("col_name")).toSet === Set(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity_floor"))
    got.foreach { r =>
      assert(r.getAs[Long]("n_rows") === nRows)
      assert(r.getAs[Long]("n_null") === 0L)
      val nd = r.getAs[Long]("n_distinct")
      assert(nd > 0L && nd <= nRows)
      assert(r.getAs[Long]("min_v") <= r.getAs[Long]("max_v"))
    }
    // Exact anchor: line numbers start at 1 and stay a tiny domain.
    val ln = got.find(_.getAs[String]("col_name") == "l_linenumber").get
    assert(ln.getAs[Long]("min_v") === 1L)
    assert(ln.getAs[Long]("n_distinct") <= 7L)
  }

  test("exact quantiles interpolate type-7 on a known distribution") {
    // Not the gated relation — a direct check of the percentile contract
    // on values 1..5: p25 = 2.0, p50 = 3.0, p75 = 4.0.
    val s = spark
    import s.implicits._
    val got = Seq(1L, 2L, 3L, 4L, 5L).toDF("q")
      .selectExpr("percentile(q, array(0.25D, 0.5D, 0.75D)) AS qs")
      .head().getAs[scala.collection.Seq[Double]]("qs").toSeq
    assert(got === Seq(2.0, 3.0, 4.0))
  }

  test("bucketed moving window equals the single-partition RANGE form") {
    // The hot-key mitigation must be a pure plan change: same rows out.
    val sfDir = "/root/testdata/sf0.001"
    val a = rows(Analytics.movingWindow(spark, sfDir))
    val b = rows(Analytics.movingWindowBucketed(spark, sfDir))
    assert(a === b)
    // And each input row emits exactly once (the explode+filter round trip).
    assert(Analytics.movingWindowBucketed(spark, sfDir).count() ===
      Analytics.movingWindow(spark, sfDir).count())
  }

  test("approx quantiles are exact type-1 when accuracy exceeds group size") {
    // The a_quantiles_approx contract (its exact regime): with accuracy
    // above n, the GK summary never compresses, so approx_percentile
    // returns precisely the value at rank ceil(p·n). Values 10,20,30,40,
    // 50,60 (n=6): ceil ranks 2,3,5 → 20,30,50. Note rank 5 at p=0.75 —
    // a lower-index convention (floor(p·(n-1))+1 = 4 → 40) would differ,
    // which is why the oracle computes ceil(p·n) explicitly.
    val s = spark
    import s.implicits._
    val got = Seq(10L, 20L, 30L, 40L, 50L, 60L).toDF("q")
      .selectExpr("approx_percentile(q, array(0.25D, 0.5D, 0.75D), 1000000) AS qs")
      .head().getAs[scala.collection.Seq[Long]]("qs").toSeq
    assert(got === Seq(20L, 30L, 50L))
    // And on the gated relation at sf0.001: approx ≡ the oracle's rank
    // formula per (group, p) — the whole-query exactness the gate hashes.
    val sfDir = "/root/testdata/sf0.001"
    val approx = rows(Analytics.quantilesApprox(spark, sfDir))
    val vals = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = vals.groupBy(_._1).flatMap { case (flag, xs) =>
      val sorted = xs.map(_._2).sorted
      Seq(0.25, 0.5, 0.75).zipWithIndex.map { case (p, i) =>
        Seq[Any](flag, i.toLong, sorted(math.ceil(p * sorted.length).toInt - 1))
      }
    }.toSet
    assert(approx === expected)
  }

  test("regional revenue matches a driver-side recomputation on sf0.001") {
    // Independent reference: collect the five joined tables and redo the
    // Q5 join + decimal sum imperatively (hash maps, BigDecimal), then
    // compare the full (nation → revenue, count) maps.
    val sfDir = "/root/testdata/sf0.001"
    val nationsInAsia = graft.Tables.nation(spark, sfDir)
      .join(graft.Tables.region(spark, sfDir).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val custNation = graft.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val suppNation = graft.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ordCust = graft.Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount").collect()
    val acc = scala.collection.mutable.Map[String, (BigDecimal, Long)]()
    li.foreach { r =>
      for {
        custkey <- ordCust.get(r.getLong(0))
        cNation <- custNation.get(custkey)
        sNation <- suppNation.get(r.getLong(1))
        if cNation == sNation
        name <- nationsInAsia.get(sNation)
      } {
        val price = BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val disc = BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val rev = price * (BigDecimal(1) - disc)
        val (s, n) = acc.getOrElse(name, (BigDecimal(0), 0L))
        acc(name) = (s + rev, n + 1)
      }
    }
    val want = acc.map { case (name, (s, n)) =>
      Seq[Any](name, s.toDouble, n)
    }.toSet
    assert(want.nonEmpty) // the slice is non-trivial at sf0.001
    assert(rows(Analytics.regionalRevenue(spark, sfDir)) === want)
  }

  test("funnel counts only ordered view -> click -> purchase progressions") {
    // user 1 completes the funnel in order; user 2 clicks BEFORE its first
    // view (click must not count); user 3 views only; user 4 purchases
    // with no view at all (no stage). Same-timestamp progression (user 1's
    // purchase at the click's exact ms) counts — the >= contract.
    val dir = writeFixture(events = Seq(
      event(1, 100, 1, "view"), event(2, 200, 1, "click"),
      event(3, 200, 1, "purchase"),
      event(4, 100, 2, "click"), event(5, 200, 2, "view"),
      event(6, 300, 3, "view"),
      event(7, 100, 4, "purchase")))
    assert(rows(Analytics.funnel(spark, dir)) === Set(
      Seq(1L, "view", 3L), Seq(2L, "click", 1L), Seq(3L, "purchase", 1L)))
  }

  test("windowed funnel drops conversions outside the stage window") {
    val w = Analytics.FunnelWindowMs
    // user 1 converts inside both windows; user 2's click comes a window
    // and a bit after its first view (dropped at stage 2, so its
    // in-window purchase can't count either); user 3's click is
    // in-window but the purchase is late.
    val dir = writeFixture(events = Seq(
      event(1, 0, 1, "view"), event(2, w, 1, "click"),
      event(3, 2 * w, 1, "purchase"),
      event(4, 0, 2, "view"), event(5, w + 1, 2, "click"),
      event(6, w + 2, 2, "purchase"),
      event(7, 0, 3, "view"), event(8, 10, 3, "click"),
      event(9, w + 11, 3, "purchase")))
    assert(rows(Analytics.funnelWindowed(spark, dir)) === Set(
      Seq(1L, "view", 3L), Seq(2L, "click", 2L), Seq(3L, "purchase", 1L)))
    // The unbounded funnel admits all three full conversions.
    assert(rows(Analytics.funnel(spark, dir)) === Set(
      Seq(1L, "view", 3L), Seq(2L, "click", 3L), Seq(3L, "purchase", 3L)))
  }

  test("retention buckets users by first-active day and counts comebacks") {
    val day = Analytics.DayMs
    // users 1,2 first active day 0; user 1 returns day 1 and day 3;
    // user 2 never returns; user 3 first active day 1, returns day 2.
    val dir = writeFixture(events = Seq(
      event(1, 10, 1, "e"), event(2, day + 5, 1, "e"),
      event(3, 3 * day + 1, 1, "e"), event(4, day - 1, 1, "e"),
      event(5, 20, 2, "e"),
      event(6, day + 7, 3, "e"), event(7, 2 * day + 7, 3, "e")))
    assert(rows(Analytics.retention(spark, dir)) === Set(
      Seq(0L, 0L, 2L), Seq(0L, 1L, 1L), Seq(0L, 3L, 1L),
      Seq(1L, 0L, 1L), Seq(1L, 1L, 1L)))
  }

  test("event deltas pair each event with its per-user predecessor") {
    // user 1: events at t=100 (x=5), t=300 (x=2), t=300 (x=9, higher id
    // breaks the tie AFTER id 3), t=900 (x=9). user 2: single event, no
    // predecessor, emits nothing.
    val dir = writeFixture(events = Seq(
      event(1, 100, 1, "e", 5.0), event(3, 300, 1, "e", 2.0),
      event(4, 300, 1, "e", 9.0), event(5, 900, 1, "e", 9.0),
      event(9, 50, 2, "e", 1.0)))
    assert(rows(Analytics.eventDeltas(spark, dir)) === Set(
      Seq(1L, 3L, 300L, 2L, 200L, -3L),
      Seq(1L, 4L, 300L, 9L, 0L, 7L),
      Seq(1L, 5L, 900L, 9L, 600L, 0L)))
  }

  test("outliers flag only >2-sigma deviations, integer-exactly") {
    // user 1: five x=10 and one x=100 → mean 25, population sigma ≈ 33.5;
    // only the 100 exceeds 2 sigma ((100·6−150)² = 202500 > 4·(6·10500−150²)
    // = 162000; the 10s give 8100). user 2 is constant → zero variance,
    // nothing can exceed it (0 > 0 is false).
    val dir = writeFixture(events = Seq(
      event(1, 100, 1, "e", 10.0), event(2, 200, 1, "e", 10.0),
      event(3, 300, 1, "e", 10.0), event(4, 400, 1, "e", 10.0),
      event(5, 500, 1, "e", 10.0), event(6, 600, 1, "e", 100.0),
      event(7, 100, 2, "e", 7.0), event(8, 200, 2, "e", 7.0)))
    assert(rows(Analytics.outliers(spark, dir)) === Set(
      Seq(1L, 6L, 100L, 6L)))
  }

  test("late-order priority count: semi-join emits each order once") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Analytics.orderPriorityLate(spark, sfDir).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n_late_orders"))
      .toMap
    // Independent recount: inner join + distinct orderkey, driver-side.
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("od_ms"),
        col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val lateOrders = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("sd_ms")).collect()
      .flatMap { r =>
        o.get(r.getLong(0)).collect {
          case (odMs, prio) if r.getLong(1) >
            odMs + Analytics.LateDays * 86400000L => (r.getLong(0), prio)
        }
      }.toSet
    val want = lateOrders.groupBy(_._2).map { case (p, s) => p -> s.size.toLong }
    assert(want.values.sum > 0)
    assert(got === want)
    // Plan shape: the existence test must be a semi join, not join+distinct.
    val plan = Analytics.orderPriorityLate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
  }

  test("brand revenue covers every brand with positive exact revenue") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Analytics.brandRevenue(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("revenue") > 0.0)
      assert(r.getAs[Long]("sum_qty") > 0L)
    }
    // Items must conserve: every lineitem has exactly one part.
    val totalItems = got.map(_.getAs[Long]("n_items")).sum
    assert(totalItems === graft.Tables.lineitem(spark, sfDir).count())
  }

  test("market share: per-year shares sum to 1 and revenues match regional slices") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Analytics.marketShare(spark, sfDir).collect()
    assert(got.nonEmpty)
    val byYear = got.groupBy(_.getAs[Long]("o_year"))
    byYear.foreach { case (_, rs) =>
      val shareSum = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-9)
      rs.foreach(r => assert(r.getAs[Double]("revenue") > 0.0))
    }
    assert(byYear.keySet === Set(1996L, 1997L))
  }

  test("regional revenue plan: date slice pushed to the orders scan, dims broadcast") {
    val sfDir = "/root/testdata/sf0.001"
    val plan = Analytics.regionalRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    // The one-year slice must reach the parquet reader as a pushed filter
    // (at 100 TB this is the difference between scanning one year and
    // scanning the table), and the nation⋈region product must broadcast.
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"o_orderdate lower bound must push into the scan:\n$plan")
    assert(plan.contains("LessThan(o_orderdate"),
      s"o_orderdate upper bound must push into the scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the dim chain must broadcast:\n$plan")
  }

  test("moving window is a 5s range frame: sums follow timestamps, not row order") {
    // user 1: t=0 (x=1), t=4000 (x=2), t=5000 (x=4), t=9500 (x=8),
    //   t=20000 (x=16). Frames ([t-5000, t] inclusive):
    //   t=0     → {1}          sum 1
    //   t=4000  → {1,2}        sum 3
    //   t=5000  → {1,2,4}      sum 7   (0 is inclusive at -5000)
    //   t=9500  → {4,8}        sum 12  (4000 just aged out at 9500? 9500-5000=4500 → 4000 < 4500 → out)
    //   t=20000 → {16}         sum 16
    // user 2 at t=0 is untouched by user 1's rows.
    val dir = writeFixture(events = Seq(
      event(1, 0, 1, "e", 1.0), event(2, 4000, 1, "e", 2.0),
      event(3, 5000, 1, "e", 4.0), event(4, 9500, 1, "e", 8.0),
      event(5, 20000, 1, "e", 16.0), event(6, 0, 2, "e", 32.0)))
    val got = Analytics.movingWindow(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tms")) ->
        (r.getAs[Long]("win_sum"), r.getAs[Long]("win_n"))).toMap
    assert(got((1L, 0L)) === (1L, 1L))
    assert(got((1L, 4000L)) === (3L, 2L))
    assert(got((1L, 5000L)) === (7L, 3L))
    assert(got((1L, 9500L)) === (12L, 2L))
    assert(got((1L, 20000L)) === (16L, 1L))
    assert(got((2L, 0L)) === (32L, 1L))
  }

  test("interval join: half-open window, self excluded, bin-aligned anchors exact") {
    val W = Analytics.ContextWindowMs
    // anchor 10 at t=1000: events at +1 and +W-1 are in (half-open
    // [t, t+W)), the event at exactly +W is out, t=500 is before, and the
    // anchor never pairs with itself. anchor 20 sits exactly ON a bin
    // boundary (t = 2W) — its interval covers ONE bin, exercising the
    // explode copy whose bin never matches.
    val dir = writeFixture(events = Seq(
      event(10, 1000, 1, "a", Analytics.AnchorMinValue),
      event(11, 1001, 1, "e"), event(12, 1000 + W - 1, 2, "e"),
      event(13, 1000 + W, 1, "e"), event(14, 500, 1, "e"),
      event(20, 2 * W, 2, "a", Analytics.AnchorMinValue + 1),
      event(21, 2 * W + 5, 1, "e")))
    val got = rows(Analytics.intervalJoin(spark, dir))
    assert(got === Set(
      Seq(10L, 11L, 1L), Seq(10L, 12L, W - 1L), Seq(20L, 21L, 5L)))
  }

  test("interval join equals the naive range join; plan is an equi-join, never BNLJ") {
    val sfDir = "/root/testdata/sf0.001"
    val W = Analytics.ContextWindowMs
    val raw = graft.Tables.events(spark, sfDir)
    val ev = raw.select(col("event_id"), graft.Shapes.eventTimeMs(raw).as("t"),
      col("value"))
    val anchors = ev.where(col("value") >= Analytics.AnchorMinValue)
      .select(col("event_id").as("anchor_id"), col("t").as("a_t"))
    val naive = ev.join(anchors,
        col("t") >= col("a_t") && col("t") < col("a_t") + W &&
          col("event_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("event_id"), (col("t") - col("a_t")).as("delta_ms"))
    assert(rows(Analytics.intervalJoin(spark, sfDir)) === rows(naive))
    // The whole point of the bin composition: the range predicate must
    // ride an equi-join on the bin key, not a nested-loop scan product.
    val plan = Analytics.intervalJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"bin bucketing must avoid the nested-loop range join:\n$plan")
    // And the naive form really is the plan Spark would otherwise pick.
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoop"),
      s"baseline sanity: the keyless range join nested-loops:\n$naivePlan")
  }

  test("the five r14 TPC-H shapes equal their driver-side recomputes") {
    val sfDir = "/root/testdata/sf0.001"
    // shared collected base relations (exact integer cents throughout)
    val euSupp = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey").cast("long")).collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sfDir).select(
        col("l_partkey").cast("long"), col("l_suppkey").cast("long"),
        col("l_orderkey").cast("long"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
          "* 10000 AS BIGINT)"), // disc_price in exact 1e-4 units
        expr("year(CAST(l_shipdate AS TIMESTAMP))").cast("long"),
        expr(s"CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '${Analytics.TopSupplierFrom}'" +
          s" AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '${Analytics.TopSupplierTo}'"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))

    // Q2 shape (r15: real derived partsupp): per-part min supply cost
    // among EU partsupp entries, min-suppkey ties
    val psEu = refPartsupp(sfDir).filter(x => euSupp(x._2))
    val wantMin = psEu.groupBy(_._1).map { case (pk, xs) =>
      val m = xs.map(_._4).min
      (pk, m, xs.filter(_._4 == m).map(_._2).min)
    }.toSet
    val gotMin = Analytics.minCostSupplier(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("min_cost_cents"),
        r.getAs[Long]("best_suppkey"))).toSet
    assert(gotMin.nonEmpty && gotMin === wantMin)

    // Q11 shape: per-part EU stock value (cost·availqty) vs the
    // above-average global line
    val values = psEu.groupBy(_._1).map { case (pk, xs) =>
      pk -> xs.map(x => x._4 * x._3).sum }
    val total = values.values.sum
    val nParts = values.size.toLong
    val wantImp = values.filter(_._2 * nParts > total).toSet
    val gotImp = Analytics.importantParts(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("value_cents"))).toSet
    assert(gotImp.nonEmpty && gotImp === wantImp)
    assert(gotImp.size < values.size) // the line must actually cut

    // Q14 shape: promo share per ship-year (exact 1e-4 sums -> doubles)
    val promoParts = Tables.part(spark, sfDir)
      .where(col("p_type") === "PROMO")
      .select(col("p_partkey").cast("long")).collect().map(_.getLong(0)).toSet
    val wantPromo = li.groupBy(_._6).map { case (y, xs) =>
      val promo = xs.filter(x => promoParts(x._1)).map(_._5).sum
      val tot = xs.map(_._5).sum
      (y, promo / 1e4, tot / 1e4, (promo / 1e4) / (tot / 1e4))
    }.toSet
    val gotPromo = Analytics.promoRevenue(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("ship_year"), r.getAs[Double]("promo_revenue"),
        r.getAs[Double]("total_revenue"), r.getAs[Double]("promo_share"))).toSet
    assert(gotPromo.nonEmpty && gotPromo === wantPromo)

    // Q15 shape: tie-safe max-revenue suppliers in the window
    val revs = li.filter(_._7).groupBy(_._2).map { case (sk, xs) =>
      sk -> xs.map(_._4).sum }
    val mx = revs.values.max
    val wantTop = revs.filter(_._2 == mx).toSet
    val gotTop = Analytics.topSupplier(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("revenue_cents"))).toSet
    assert(gotTop.nonEmpty && gotTop === wantTop)

    // Q7 shape: nation-pair volume per ship year
    val suppNation = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orderNation = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .select(col("o_orderkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wantVol = li
      .map(x => (suppNation(x._2), orderNation(x._3), x._6, x._4))
      .filter(x => x._1 != x._2)
      .groupBy(x => (x._1, x._2, x._3)).map { case ((sn, cn, y), xs) =>
        (sn, cn, y, xs.map(_._4).sum) }.toSet
    val gotVol = Analytics.nationTradeVolume(spark, sfDir).collect()
      .map(r => (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"),
        r.getAs[Long]("ship_year"), r.getAs[Long]("volume_cents"))).toSet
    assert(gotVol.nonEmpty && gotVol === wantVol)

    // Q19 shape: disjunctive brand/size/quantity bands
    val partMeta = Tables.part(spark, sfDir)
      .select(col("p_partkey").cast("long"), col("p_brand"),
        col("p_size").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val qty = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long"),
        col("l_quantity").cast("long"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
          "* 10000 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def inBand(pk: Long, q: Long): Boolean = {
      val (b, s) = partMeta(pk)
      (b == "Brand#12" && s >= 1 && s <= 15 && q >= 1 && q <= 11) ||
      (b == "Brand#23" && s >= 1 && s <= 25 && q >= 10 && q <= 20) ||
      (b == "Brand#34" && s >= 1 && s <= 50 && q >= 20 && q <= 30)
    }
    val hits = qty.filter(x => inBand(x._1, x._2))
    val gotDis = Analytics.disjunctiveRevenue(spark, sfDir).head()
    assert(gotDis.getAs[Long]("revenue_e4") === hits.map(_._3).sum)
    assert(gotDis.getAs[Long]("n_rows") === hits.length.toLong)
    assert(hits.nonEmpty) // the disjunction must actually select rows

    // Q20 shape: per-part dominant (supp, part) pairs
    val pairQ = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPairQ = pairQ.groupBy(x => (x._1, x._2)).map { case ((pk, sk), xs) =>
      (pk, sk, xs.map(_._3).sum) }
    val byPartQ = byPairQ.groupBy(_._1).map { case (pk, xs) =>
      pk -> (xs.map(_._3).sum, xs.size.toLong) }
    val wantDom = byPairQ.collect {
      case (pk, sk, pq) if pq * byPartQ(pk)._2 > byPartQ(pk)._1 =>
        (pk, sk, pq, byPartQ(pk)._1, byPartQ(pk)._2)
    }.toSet
    val gotDom = Analytics.dominantSuppliers(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("s_suppkey"),
        r.getAs[Long]("pair_qty"), r.getAs[Long]("part_qty"),
        r.getAs[Long]("n_supp"))).toSet
    assert(gotDom.nonEmpty && gotDom === wantDom)
    assert(gotDom.size < byPairQ.size) // the fair-share line must cut
  }

  test("the six closing TPC-H shapes equal their driver-side recomputes") {
    val sfDir = "/root/testdata/sf0.001"
    // one collected lineitem image with every derived measure the six
    // shapes need (exact units derived by the same decimal chains the
    // queries use; epoch-day ship date for the delay bands)
    val li = Tables.lineitem(spark, sfDir).select(
        col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
        col("l_suppkey").cast("long"), col("l_quantity").cast("long"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
          "* 10000 AS BIGINT)"), // disc_e4
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT)"), // disc_rev_e4
        expr("year(CAST(l_shipdate AS TIMESTAMP))").cast("long"),
        expr("CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07"),
        col("l_returnflag"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7), r.getString(8), r.getLong(9)))
    val orders = Tables.orders(spark, sfDir).select(
        col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        expr("year(CAST(o_orderdate AS TIMESTAMP))").cast("long"),
        col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01")).cast("long"),
        expr(s"CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '${Analytics.ReturnedFrom}'" +
          s" AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '${Analytics.ReturnedTo}'"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getBoolean(5)))
    val ordByKey = orders.map(o => o._1 -> o).toMap

    // Q6 shape: one tight scan, exact 1e-4 revenue + row count
    val q6 = li.filter(x => x._7 == Analytics.ForecastYear && x._8 && x._4 < 24)
    val gotQ6 = Analytics.forecastRevenue(spark, sfDir).head()
    assert(gotQ6.getAs[Long]("revenue_e4") === q6.map(_._6).sum)
    assert(gotQ6.getAs[Long]("n_rows") === q6.length.toLong)
    assert(q6.nonEmpty)

    // Q9 shape (r15: real derived partsupp): (nation, order-year) profit
    // with the part's min supply cost as the reference cost
    val refCost = refPartsupp(sfDir).groupBy(_._1)
      .map { case (pk, xs) => pk -> xs.map(_._4).min }
    val patParts = Tables.part(spark, sfDir)
      .where(col("p_name").like(Analytics.ProfitNamePattern))
      .select(col("p_partkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val suppNat = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wantQ9 = li.filter(x => patParts(x._2))
      .map(x => (suppNat(x._3), ordByKey(x._1)._3,
        x._5 - refCost(x._2) * x._4 * 100))
      .groupBy(x => (x._1, x._2)).map { case ((n, y), xs) =>
        (n, y, xs.map(_._3).sum) }.toSet
    val gotQ9 = Analytics.nationProfit(spark, sfDir).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year"),
        r.getAs[Long]("profit_e4"))).toSet
    assert(gotQ9.nonEmpty && gotQ9 === wantQ9)

    // Q10 shape: returned revenue per customer in the quarter
    val custAttrs = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").cast("long"), col("c_name"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        col("n_name"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getString(3))).toMap
    val wantQ10 = li.filter(x => x._9 == "R" && ordByKey(x._1)._6)
      .groupBy(x => ordByKey(x._1)._2).map { case (ck, xs) =>
        val (nm, ab, nat) = custAttrs(ck)
        (ck, nm, ab, nat, xs.map(_._5).sum) }.toSet
    val gotQ10 = Analytics.returnedRevenue(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_name"),
        r.getAs[Long]("acctbal_cents"), r.getAs[String]("nation"),
        r.getAs[Long]("revenue_e4"))).toSet
    assert(gotQ10.nonEmpty && gotQ10 === wantQ10)

    // Q12 shape: clamped signed half-year delay bands × priority split
    val high = Set("1-URGENT", "2-HIGH")
    val wantQ12 = li.map { x =>
      val o = ordByKey(x._1)
      val band = math.max(-4L, math.min(4L,
        math.floor((x._10 - o._5) / 180.0).toLong))
      (band, o._4)
    }.groupBy(_._1).map { case (b, xs) =>
      (b, xs.count(x => high(x._2)).toLong,
        xs.count(x => !high(x._2)).toLong) }.toSet
    val gotQ12 = Analytics.shipDelayPriority(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("delay_band"), r.getAs[Long]("high_line_count"),
        r.getAs[Long]("low_line_count"))).toSet
    assert(gotQ12.nonEmpty && gotQ12 === wantQ12)
    assert(wantQ12.exists(_._1 < 0)) // negative bands are real on this generator

    // Q13 shape: order-count distribution INCLUDING zero-order customers
    val countedOrders = orders.filter(_._4 != "4-NOT SPECIFIED")
      .groupBy(_._2).map { case (ck, xs) => ck -> xs.size.toLong }
    val allCust = custAttrs.keySet
    val wantQ13 = allCust.toSeq.map(ck => countedOrders.getOrElse(ck, 0L))
      .groupBy(identity).map { case (c, xs) => (c, xs.size.toLong) }.toSet
    val gotQ13 = Analytics.orderCountDistribution(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("c_count"), r.getAs[Long]("custdist"))).toSet
    assert(gotQ13.nonEmpty && gotQ13 === wantQ13)

    // Q16 proper (r15: real derived partsupp): supplier variety per
    // (brand, type, size) from the part↔supplier bridge
    val varietyParts = Tables.part(spark, sfDir)
      .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "ECONOMY" &&
        col("p_size").isin(Analytics.VarietySizes: _*))
      .select(col("p_partkey").cast("long"), col("p_brand"), col("p_type"),
        col("p_size").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getLong(3))).toMap
    val wantQ16 = refPartsupp(sfDir).filter(x => varietyParts.contains(x._1))
      .map(x => (varietyParts(x._1), x._2)).distinct
      .groupBy(_._1).map { case ((b, t, s), xs) =>
        (b, t, s, xs.size.toLong) }.toSet
    val gotQ16 = Analytics.supplierVariety(spark, sfDir).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Long]("p_size"), r.getAs[Long]("supplier_cnt"))).toSet
    assert(gotQ16.nonEmpty && gotQ16 === wantQ16)
  }

  test("Q13 zero-order bucket survives the left join at sf0.1") {
    // Every sf0.001/sf0.01 customer has a qualifying order, so the
    // left-join structural point only materializes from sf0.1 up
    // (7 zero-order customers measured there). assume(), not a silent
    // if: a missing bench fixture reports this as CANCELED — visible
    // dropped coverage — while the unit suite stays runnable with only
    // the sf0.001 fixture present (r15 ADVICE).
    val benchDir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$benchDir/orders.parquet").exists(),
      s"bench fixture $benchDir absent")
    val q13AtBench = Analytics.orderCountDistribution(spark, benchDir)
      .collect().map(r => (r.getAs[Long]("c_count"), r.getAs[Long]("custdist"))).toSet
    assert(q13AtBench.exists(_._1 == 0L),
      "the zero-order bucket must survive the left join at sf0.1")
  }

  test("pivot revenue: wide table equals the conditional-agg recompute, flag for flag") {
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sfDir).select(
        expr("year(CAST(l_shipdate AS TIMESTAMP))").cast("long"),
        col("l_returnflag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
          "* 10000 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def want(flag: String): Map[Long, Long] = li.filter(_._2 == flag)
      .groupBy(_._1).map { case (y, xs) => y -> xs.map(_._3).sum }
    val got = Analytics.pivotRevenue(spark, sfDir).collect()
      .map(r => r.getAs[Long]("ship_year") ->
        ((r.getAs[Double]("rev_a"), r.getAs[Double]("rev_n"),
          r.getAs[Double]("rev_r")))).toMap
    assert(got.nonEmpty)
    assert(got.keySet === li.map(_._1).toSet)
    for ((flag, pick) <- Seq[(String, ((Double, Double, Double)) => Double)](
        ("A", _._1), ("N", _._2), ("R", _._3));
        (y, cents4) <- want(flag)) {
      assert(pick(got(y)) === cents4.toDouble / 10000.0, s"$flag/$y")
    }
    // round trip: melt(pivot(x)) ≡ the direct long form, cell for cell
    val melted = Analytics.unpivotRevenue(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("ship_year"), r.getAs[String]("flag")) ->
        r.getAs[Double]("revenue")).toMap
    val direct = (for (flag <- Seq("A", "N", "R"); (y, c4) <- want(flag))
      yield (y, flag) -> c4.toDouble / 10000.0).toMap
    assert(melted === direct)
  }

  test("gap fill: dense hourly spine, LOCF carries the last observed sum, leading gaps are 0") {
    val sfDir = "/root/testdata/sf0.001"
    import graft.Shapes
    val hourly = Shapes.zxEvents(spark, sfDir)
      .select(col("z"), expr(s"event_time div ${Analytics.GapFillSlotMs}").as("h"),
        col("x"))
      .collect().map(r => (r.getAs[String]("z"), r.getAs[Long]("h"), r.getAs[Long]("x")))
      .groupBy(t => (t._1, t._2)).map { case (k, xs) => k -> xs.map(_._3).sum }
    val lo = hourly.keys.map(_._2).min
    val hi = hourly.keys.map(_._2).max
    val types = hourly.keys.map(_._1).toSet
    val got = Analytics.gapFill(spark, sfDir).collect()
      .map(r => (r.getAs[String]("z"), r.getAs[Long]("h")) ->
        ((r.getAs[Long]("filled_sum"), r.getAs[Long]("is_gap")))).toMap
    // dense spine: every (type, hour) cell present, exactly once
    assert(got.size === types.size * (hi - lo + 1).toInt)
    // LOCF recompute per type in hour order
    for (z <- types) {
      var lastSeen = 0L
      for (h <- lo to hi) {
        val cell = got((z, h))
        hourly.get((z, h)) match {
          case Some(s) =>
            lastSeen = s
            assert(cell === ((s, 0L)), s"$z/$h observed")
          case None =>
            assert(cell === ((lastSeen, 1L)), s"$z/$h gap")
        }
      }
    }
    // the fixture genuinely exercises the fill: gaps exist at this SF
    assert(got.valuesIterator.count(_._2 == 1L) > 0)
  }
}
