package graft

/** Physical-plan shape guards — structural scale properties asserted on
  * the PRE-AQE plan (`queryExecution.sparkPlan`: AQE can upgrade a
  * shuffle join to broadcast at runtime but never introduces a
  * cartesian, so the static plan is the conservative surface to pin).
  *
  * The headline sweep: NO gated query may plan a `CartesianProduct` —
  * the both-sides-shuffled row multiplication that turns a 100 TB join
  * into corpus² — except the labeled all-pairs baselines whose
  * documentation says exactly that (each has a gated linear/sublinear
  * sibling as the scale path). `BroadcastNestedLoopJoin` is NOT banned
  * globally: the repo's 1-row stats crossJoins (`crossJoin(broadcast(
  * totals))`) legitimately plan as broadcast nested loops over a
  * single-row side, which is scale-safe. A query that silently grows a
  * non-equi join in a refactor fails here before any fixture slows
  * down enough for a human to notice.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Labeled quadratic / brute-force oracle baselines where an
    * all-pairs plan IS the documented contract.
    */
  private val allPairsBaselines = Set(
    "d_jaccard_pairs", "d_embedding_neardup", "s_cosine_topk",
    "d_minhash_jaccard_eval", "s_lsh_recall", "s_ivf_recall",
    "s_pq_recall", "s_knn_agreement", "s_text_cosine_topk",
    "d_modality_agreement", "a_timeseries_similarity")

  test("no gated query plans a CartesianProduct except the labeled " +
      "all-pairs baselines") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => allPairsBaselines(name) }
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.sparkPlan.toString
          catch { case e: Throwable =>
            fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
          }
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"queries planning a cartesian join: ${offenders.mkString(", ")}")
  }

  test("the triangle audits' wedge and close joins are equi-joins " +
      "(never cartesian, never nested-loop over the edge relation)") {
    Seq("g_dup_triangles", "g_dup_triangles_simhash").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"), q)
      // the only nested-loop joins allowed are the final 1-row stat
      // combines; the oriented-edge self-join must key on src (and the
      // close join on (src, dst)) — both appear as equi-join conditions
      assert(plan.contains("src"), q)
    }
  }

  test("PPJoin v3 verify: the array-attach joins are shuffle-hash (never " +
      "a sort over array-carrying rows) and score through the merge kernel") {
    // The r16 fix pinned: the per-doc sorted shingle arrays ride ONLY
    // through ShuffledHashJoin (no SMJ sort ever touches an
    // array-payload row — the r5–r14 sf10 disk-spill vector), and the
    // multiset join-count comes from the codegen'd sorted-merge kernel,
    // not a row expansion. Dropping either hint or the kernel turns
    // this red before a bench run has to.
    val plan = SparkEntry.queries("d_jaccard_prefix_pairs")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("sorted_join_count"),
      s"verify must score through the merge kernel:\n$plan")
    assert("ShuffledHashJoin".r.findAllIn(plan).size >= 2,
      s"both array-attach joins must be shuffle-hash:\n$plan")
  }

  test("feature ANN: the probe side broadcasts and candidates ride a bucket equi-join") {
    // s_feature_topk's scale shape (r17): |queries|·(p+1) probe rows
    // broadcast against the corpus's bucket column — a BroadcastHashJoin
    // on the bucket key, never a shuffle of the corpus for a 20-query
    // probe and never a cartesian (the =!= is a residual condition on
    // the equi-join, not the join itself).
    val plan = SparkEntry.queries("s_feature_topk")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe side must broadcast onto the bucket equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"feature ANN must never degrade to all-pairs:\n$plan")
  }

  /** r15: POSITIVE pins on the warehouse face — the no-cartesian sweep
    * catches catastrophic shapes, but a stats change could still flip a
    * dimension chain from broadcast to shuffle without planning a
    * cartesian. This sweep pins, uniformly for the biggest TPC-H
    * shapes, (a) a minimum count of BroadcastHashJoin nodes — every
    * `broadcast()`-hinted dimension chain must survive planning as an
    * actual broadcast — and (b) that each query's SELECTIVE predicates
    * reach the parquet scan (`PushedFilters`), not a post-scan Filter.
    * Asserted on the pre-AQE plan: AQE may upgrade further at runtime
    * but must inherit at least this static shape.
    */
  private val tpchFacePins: Seq[(String, Int, Seq[String])] = Seq(
    // (query, min BroadcastHashJoin nodes, pushed-filter fragments)
    ("a_regional_revenue", 2, Seq("EqualTo(r_name,ASIA)",
      "GreaterThanOrEqual(o_orderdate,1996-01-01")),
    ("a_market_share", 3, Seq("EqualTo(r_name,ASIA)",
      "LessThan(o_orderdate,1998-01-01")),
    ("a_returned_revenue", 2, Seq("EqualTo(l_returnflag,R)",
      "GreaterThanOrEqual(o_orderdate,1996-10-01")),
    ("a_nation_profit", 2, Seq("StringContains(p_name,gear)")),
    ("a_shipping_priority", 2, Seq("EqualTo(c_mktsegment,BUILDING)",
      "GreaterThan(l_shipdate,1998-01-01")),
    ("a_promo_revenue", 1, Seq()),
    ("a_min_cost_supplier", 3, Seq("EqualTo(r_name,EUROPE)",
      "LessThan(s_suppkey,100000000)")),
    ("a_important_parts", 3, Seq("EqualTo(r_name,EUROPE)")),
    ("a_supplier_variety", 1, Seq("In(p_size")),
    ("a_forecast_revenue", 0, Seq("LessThan(l_quantity,24.0)",
      "IsNotNull(l_shipdate)")))

  test("TPC-H face positive pins: dimension chains broadcast, selective " +
      "filters reach the parquet scans") {
    tpchFacePins.foreach { case (name, minBcast, pushed) =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.sparkPlan
      val b = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }.size
      assert(b >= minBcast,
        s"$name: expected ≥$minBcast broadcast dimension joins, got $b:\n$plan")
      // plan.toString elides long scan metadata, so read PushedFilters
      // off the scan nodes themselves
      val pushedAll = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metadata.getOrElse("PushedFilters", "")
      }.mkString("\n")
      pushed.foreach { f =>
        assert(pushedAll.contains(f),
          s"$name: filter '$f' not pushed to any scan; pushed:\n$pushedAll")
      }
    }
    // Q6 is the pure-scan shape: no join may appear at all
    val q6 = SparkEntry.queries("a_forecast_revenue")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(!q6.contains("Join"), s"Q6 must stay join-free:\n$q6")
  }

  test("the capped BM25 prune is a broadcast join on the token hash") {
    val plan = SparkEntry.queries("s_bm25_topk_capped")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the capped-vocab prune must broadcast, never shuffle the index")
  }

  test("the hashed top-ngrams twin counts on the 8-byte fp and recovers " +
      "strings through a broadcast join, and its output equals the " +
      "string form row-for-row") {
    val hashed = SparkEntry.queries("t_top_ngrams_hashed")(spark, sfDir)
    val plan = hashed.queryExecution.sparkPlan.toString
    // the heavy count shuffle keys on (source, gram_fp), never the gram
    // string; the candidate set rides a broadcast, not a shuffle join
    assert(plan.contains("gram_fp"), "count stage must key on the fp")
    assert(plan.contains("BroadcastHashJoin"),
      "display-gram recovery must broadcast the candidate fps")
    val plain = SparkEntry.queries("t_top_ngrams")(spark, sfDir)
    assert(hashed.collect().toSet === plain.collect().toSet)
  }
}
