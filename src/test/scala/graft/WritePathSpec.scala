package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Output-layout contract for the pipeline write path: split-partitioned
  * parquet, and partition PRUNING (not filtering) when a split is read
  * back — at 100 TB reading `split=train` must scan zero bytes of val/
  * test, which only the directory layout guarantees.
  */
class WritePathSpec extends SparkSpec {

  test("split-partitioned write prunes partitions on read-back") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-writepath").toString
    // The gated split assignment (fingerprint-keyed) becomes the physical
    // layout: one directory per split.
    Curation.splitAssign(s, sfDir)
      .write.mode("overwrite").partitionBy("split").parquet(out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("split=")).toSet
    assert(dirs === Set("split=train", "split=val", "split=test"))

    val train = s.read.parquet(out).where(col("split") === "train")
    val expected = Curation.splitAssign(s, sfDir).where(col("split") === "train")
    assert(rows(train.select("doc_id", "fp", "bucket", "split")) ===
      rows(expected.select("doc_id", "fp", "bucket", "split")))
    // Pruning, not filtering: the split predicate must land in
    // PartitionFilters on the scan (zero data read from other splits),
    // and must NOT appear as a post-scan Filter.
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"),
      s"split predicate must prune partitions:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(split"),
      "split is a partition column, not a data column")
  }
}
