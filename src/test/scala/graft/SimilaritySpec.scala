package graft

import graft.functions.VectorOps
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("LongVectorDot matches a hand-computed dot product (eval + codegen)") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    // Codegen path (projection) and interpreted path (filter on eval).
    assert(df.select(VectorOps.longDot(col("a"), col("b"))).head().getLong(0) === 32L)
    assert(df.where(VectorOps.longDot(col("a"), col("b")) === 32L).count() === 1L)
  }

  test("LongVectorDot is null-safe and dots over the common prefix") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Array(1L, 2L)), Some(Array(3L, 4L, 5L))),
      (None: Option[Array[Long]], Some(Array(1L)))).toDF("a", "b")
    val got = df.select(VectorOps.longDot(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) === 11L)
    assert(got(1).isNullAt(0))
  }

  test("brute-force top-k ranks the aligned vector first, ties broken by id") {
    // q (vec 0) is aligned with vec 1, orthogonal to vec 2, opposed to 3.
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, Array(1f, 0f, 0f, 0f), 0),
      EmbRow(1, Array(0.9f, 0.1f, 0f, 0f), 0),
      EmbRow(2, Array(0f, 1f, 0f, 0f), 1),
      EmbRow(3, Array(-1f, 0f, 0f, 0f), 1)))
    val got = Similarity.cosineTopK(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
      .map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("identical vectors land in the same LSH bucket; top-k finds them") {
    val v = Array.tabulate(16)(i => (i % 5 - 2) * 0.2f)
    val dir = writeFixture(embeddings = Seq(
      EmbRow(0, v, 0), EmbRow(1, v.clone(), 0),
      EmbRow(2, v.map(-_), 1)))
    val buckets = Similarity.lshBucketStats(spark, dir).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("n_vectors")).toMap
    assert(buckets.values.sum === 3L)
    val topk = Similarity.lshTopK(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(topk.contains(1L))
  }
}
