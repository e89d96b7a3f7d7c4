package graft

import graft.operators.Bucketing
import org.apache.spark.sql.DataFrame

/** Bucketed co-located join contract: same result as the shuffled join,
  * with NO shuffle exchange below the join in the executed plan.
  */
class BucketingSpec extends SparkSpec {

  private def shuffleCount(df: DataFrame): Int = {
    // AQE hides finalized exchanges inside query-stage nodes that tree
    // traversal does not descend into; the printed final plan shows every
    // shuffle as "Exchange hashpartitioning" (broadcasts print as
    // BroadcastExchange and don't match).
    // Two r18 adjustments, both forced by Par.widen appearing inside the
    // REGISTRY-CACHED signature build whose plan the probe's printout
    // embeds (TableCacheQueryStage prints the cached AdaptiveSparkPlan,
    // nested "== Initial Plan ==" sections included, so splitting on
    // that marker truncates the OUTER final plan early):
    //   - count unique plan_ids instead of raw occurrences — the same
    //     exchange prints once per section and once per cache-stage
    //     repetition;
    //   - count only ENSURE_REQUIREMENTS origins: REPARTITION_BY_NUM is
    //     the widen exchange inside the warm cache's build plan, which
    //     the probe never executes. The contract pinned here is the
    //     probe's own shuffles: routing the batch + the distinct.
    // The OUTER initial-plan marker is at column 0 ("+- == Initial Plan
    // =="); the nested cache sections print indented, so splitting on the
    // unindented marker keeps the whole outer final plan and drops only
    // the outer pre-AQE section.
    val s = df.queryExecution.executedPlan.toString
      .split("(?m)^\\+- == Initial Plan ==$")(0)
    s.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("ENSURE_REQUIREMENTS"))
  }

  test("bucketed join matches the shuffled join and reads without an exchange") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val loc = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val (li, o) = ("graft_li_bucketed", "graft_o_bucketed")
    try {
      Bucketing.writeBucketed(s, sfDir, loc, li, o)
      val bucketed = Bucketing.bucketedJoinCounts(s, li, o)
      val plain = Bucketing.unbucketedJoinCounts(s, sfDir)
      // Contract 1: identical results.
      assert(rows(bucketed) === rows(plain))
      assert(rows(bucketed).nonEmpty)
      // Contract 2: the bucketed join's inputs arrive shuffle-free. Both
      // plans keep exactly ONE shuffle — the final groupBy(o_custkey) —
      // while the plain join adds one exchange per join input.
      bucketed.collect() // materialize so AQE finalizes the executed plan
      plain.collect()
      assert(shuffleCount(bucketed) === 1,
        s"bucketed join must only shuffle for the final groupBy:\n${bucketed.queryExecution.executedPlan}")
      assert(shuffleCount(plain) === 3,
        s"baseline sanity: the unbucketed join shuffles both inputs:\n${plain.queryExecution.executedPlan}")
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $li")
      s.sql(s"DROP TABLE IF EXISTS $o")
    }
  }

  test("bucketed band index: the day-2 probe never shuffles the corpus side") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val loc = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    val t = "graft_band_index"
    try {
      Bucketing.writeBandIndex(s, sfDir, loc, t)
      val bucketed = Bucketing.bucketedBandProbe(s, sfDir, t)
      val plain = Bucketing.unbucketedBandProbe(s, sfDir)
      // Contract 1: identical candidate pairs, and the fixture actually
      // produces some (the corpus has cross-parity near-dups).
      assert(rows(bucketed) === rows(plain))
      assert(rows(bucketed).nonEmpty)
      // Contract 2: probing the bucketed index costs exactly 2 exchanges
      // (routing the ephemeral batch side to the corpus's bucketing + the
      // final distinct); the raw-relation baseline also shuffles the
      // corpus side (3). The corpus index itself is read in place.
      bucketed.collect(); plain.collect()
      assert(shuffleCount(bucketed) === 2,
        s"bucketed probe must not shuffle the corpus index:\n${bucketed.queryExecution.executedPlan}")
      assert(shuffleCount(plain) === 3,
        s"baseline sanity: the raw probe shuffles the corpus side too:\n${plain.queryExecution.executedPlan}")
    } finally s.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("bucketed simhash band index: the day-2 CLUSTER probe never shuffles the corpus") {
    // Same layout lever applied to incremental cluster maintenance: the
    // new-pair probe (its one expensive step) reads the corpus band
    // index in place, Hamming verify included.
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val loc = java.nio.file.Files.createTempDirectory("graft-shidx").toString
    val t = "graft_simhash_band_index"
    try {
      Bucketing.writeSimhashBandIndex(s, sfDir, loc, t)
      val bucketed = Bucketing.bucketedSimhashProbe(s, sfDir, t)
      val plain = Bucketing.unbucketedSimhashProbe(s, sfDir)
      assert(rows(bucketed) === rows(plain))
      assert(rows(bucketed).nonEmpty)
      bucketed.collect(); plain.collect()
      assert(shuffleCount(bucketed) === 2,
        s"bucketed cluster probe must not shuffle the corpus index:\n${bucketed.queryExecution.executedPlan}")
      assert(shuffleCount(plain) === 3,
        s"baseline sanity: the raw cluster probe shuffles the corpus side too:\n${plain.queryExecution.executedPlan}")
    } finally s.sql(s"DROP TABLE IF EXISTS $t")
  }
}
