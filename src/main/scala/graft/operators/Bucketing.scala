package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the storage-layout lever for the 100 TB
  * fact-to-fact join: writing both sides bucketed (and sorted) by the join
  * key pins rows to bucket files by `hash(key) % n`, so an equi-join on
  * that key reads matching buckets pairwise and the plan carries NO
  * shuffle exchange on either side — the exchange the reference's
  * hand-rolled hash partitioners (T1/T8) existed to align. At cluster
  * scale this is the difference between re-shuffling the full fact table
  * on every join and a scan-local sort-merge; AQE cannot remove that
  * exchange at runtime, only the layout can.
  *
  * Not an oracle-gated query (bucketing is a physical property — the
  * RESULT is identical to the plain join, which IS gated as
  * `q4_star_join`); BucketingSpec asserts both halves of the contract:
  * result equality with the unbucketed join, and shuffle-freedom of the
  * executed plan.
  */
object Bucketing {

  val NumBuckets = 8

  /** Write lineitem + orders as bucketed-sorted tables on the join key
    * into `location` (external tables registered in the session catalog).
    */
  def writeBucketed(spark: SparkSession, sfDir: String, location: String,
      liTable: String, oTable: String): Unit = {
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$location/$liTable")
      .saveAsTable(liTable)
    Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$location/$oTable")
      .saveAsTable(oTable)
  }

  /** Fact-to-fact join over the bucketed tables: per-orderkey line counts.
    * With matching bucket specs the planner reads bucket i against bucket
    * i — no Exchange on either input. The `merge` hint pins sort-merge —
    * at 100 TB neither fact side broadcasts, so SMJ is the natural
    * strategy; at test SF AQE would broadcast and hide the layout effect
    * the spec asserts.
    */
  def bucketedJoinCounts(spark: SparkSession, liTable: String, oTable: String): DataFrame =
    spark.table(liTable).hint("merge")
      .join(spark.table(oTable), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n_lines"))

  /** The identical logical join over the raw parquet — same `merge` pin —
    * the equality-and-shuffle baseline for the spec.
    */
  def unbucketedJoinCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity").hint("merge")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n_lines"))

  // ------------------------------------------------------------------
  // The incremental-ingest band index as a bucketed table — the storage
  // answer behind d_incremental_neardup's 100 TB claim: the CORPUS side
  // of the band join is the big relation, and maintaining its
  // (corpus_id, bkey) index bucketed by the band key means every day-2
  // batch probe reads corpus buckets in place — the only exchanges in
  // the probe plan are the (small, ephemeral) batch side being routed to
  // the corpus's bucketing, plus the final distinct.
  // ------------------------------------------------------------------
  import graft.functions.Parity

  /** Band rows with the band id FOLDED into one key (bkey·NumBands + band,
    * < 2³⁴ — same information as the (band, bkey) pair): the join key then
    * equals the bucket key exactly, which is what lets the bucketed scan's
    * partitioning satisfy the join outright — co-partitioning on a strict
    * SUBSET of the join keys is not accepted by default
    * (spark.sql.requireAllClusterKeysForCoPartition), so a composite
    * (band, bkey) join would re-shuffle both sides.
    */
  private def bandRows(sigs: DataFrame, idName: String): DataFrame =
    (0 until Parity.NumBands).map(b =>
      sigs.select(col("doc_id").as(idName),
        (expr(Parity.bandKeySpark("sig", b)) * Parity.NumBands + b).as("bkey")))
      .reduce(_ union _)

  /** Writes the parity-0 corpus band index bucketed+sorted by bkey. */
  def writeBandIndex(spark: SparkSession, sfDir: String, location: String,
      table: String): Unit =
    bandRows(Dedup.minhashSignatures(spark, sfDir)
        .where(col("doc_id") % 2 === 0), "corpus_id")
      .write.mode("overwrite")
      .bucketBy(NumBuckets, "bkey").sortBy("bkey")
      .option("path", s"$location/$table")
      .saveAsTable(table)

  /** Distinct batch→corpus candidate pairs via the bucketed index; the
    * `merge` pin keeps the layout effect visible at test SF (AQE would
    * broadcast the tiny batch and hide it).
    */
  def bucketedBandProbe(spark: SparkSession, sfDir: String, table: String): DataFrame =
    bandRows(Dedup.minhashSignatures(spark, sfDir)
        .where(col("doc_id") % 2 === 1), "batch_id").hint("merge")
      .join(spark.table(table), Seq("bkey"))
      .select("batch_id", "corpus_id").distinct()

  /** Same candidates over the raw relations — the baseline that shuffles
    * the corpus side too.
    */
  def unbucketedBandProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = Dedup.minhashSignatures(spark, sfDir)
    bandRows(sigs.where(col("doc_id") % 2 === 1), "batch_id").hint("merge")
      .join(bandRows(sigs.where(col("doc_id") % 2 === 0), "corpus_id"),
        Seq("bkey"))
      .select("batch_id", "corpus_id").distinct()
  }

  // ------------------------------------------------------------------
  // The SAME layout lever for day-2 CLUSTER maintenance
  // (Dedup.incrementalClustersSplit): its one expensive step is the
  // batch-bands ⋈ corpus-bands simhash probe, so the corpus's
  // (corpus_id, folded band key, simhash) index persisted bucketed by
  // the band key makes that probe corpus-shuffle-free too — the
  // fingerprint rides along for the in-join Hamming verify, which
  // filters joined rows and costs no extra exchange.
  // ------------------------------------------------------------------
  /** Folded simhash band rows: bkey = bandValue·SimHashBands + band
    * (< 2¹⁷) — one join key equal to the bucket key, same reasoning as
    * [[bandRows]].
    */
  private def simhashBandRows(sh: DataFrame, idName: String,
      simhashName: String): DataFrame =
    (0 until Parity.SimHashBands).map(i =>
      sh.select(col("doc_id").as(idName),
        (expr(Parity.simhashBandSpark("simhash", i)) * Parity.SimHashBands + i)
          .as("bkey"),
        col("simhash").as(simhashName)))
      .reduce(_ union _)

  /** Writes the parity-corpus simhash band index bucketed+sorted by bkey. */
  def writeSimhashBandIndex(spark: SparkSession, sfDir: String, location: String,
      table: String): Unit =
    simhashBandRows(Dedup.simhash(spark, sfDir)
        .where(col("doc_id") % 2 === 0), "corpus_id", "c_simhash")
      .write.mode("overwrite")
      .bucketBy(NumBuckets, "bkey").sortBy("bkey")
      .option("path", s"$location/$table")
      .saveAsTable(table)

  /** Verified batch→corpus near-dup pairs via the bucketed simhash index —
    * the day-2 cluster probe's NEW-pair relation (batch-corpus arm),
    * Hamming-verified in the join output.
    */
  def bucketedSimhashProbe(spark: SparkSession, sfDir: String, table: String): DataFrame =
    simhashBandRows(Dedup.simhash(spark, sfDir)
        .where(col("doc_id") % 2 === 1), "batch_id", "b_simhash").hint("merge")
      .join(spark.table(table), Seq("bkey"))
      .where(expr(Parity.hammingSpark("b_simhash", "c_simhash")) <= Dedup.MaxHamming)
      .select("batch_id", "corpus_id").distinct()

  /** Same verified pairs over the raw relations — the shuffling baseline. */
  def unbucketedSimhashProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.simhash(spark, sfDir)
    simhashBandRows(sh.where(col("doc_id") % 2 === 1), "batch_id", "b_simhash")
      .hint("merge")
      .join(simhashBandRows(sh.where(col("doc_id") % 2 === 0), "corpus_id", "c_simhash"),
        Seq("bkey"))
      .where(expr(Parity.hammingSpark("b_simhash", "c_simhash")) <= Dedup.MaxHamming)
      .select("batch_id", "corpus_id").distinct()
  }
}
