package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (r19): per-query PLANNING vs EXECUTION split over the whole
  * suite (or a subset), warm, Bench methodology. "Planning" here is
  * everything driver-side before the first task can run: frame
  * construction (Scala builders + analysis) plus physical planning
  * (`executedPlan` force); "execution" is the remaining `toRdd.count()`
  * wall time (which still contains AQE re-planning between stages, but
  * that part is interleaved with task work and not separable from the
  * driver). The r18 continuation measured the suite at ~33 s planning vs
  * ~117 s execution per run on a loaded window with an ad-hoc harness;
  * this makes that split a one-command per-query table so the
  * planning-bound queries can be targeted individually.
  *
  * Usage: runMain graft.SplitBench [q1,q2,...] — no args = full suite.
  * Prints one line per query: `SPLIT <name> plan=<s> exec=<s>` (min over
  * 3 warm runs, split measured on the same run that yields the min total)
  * and a final `SPLIT-TOTAL` line.
  */
object SplitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    // SPARK_GRAFT_CONF="k=v;k=v" — extra session confs for A/B runs.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(key, v) = kv.split("=", 2)
      spark.conf.set(key.trim, v.trim)
    })
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1)
    // untimed warmup sweep: JIT + registry chains, exactly like Bench
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    var totPlan = 0.0
    var totExec = 0.0
    selected.foreach { case (name, fn) =>
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val qe = fn(spark, sfDir).queryExecution
        qe.executedPlan // force analysis + optimization + physical planning
        val t1 = System.nanoTime()
        qe.toRdd.count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val best = runs.minBy(r => r._1 + r._2)
      totPlan += best._1
      totExec += best._2
      println(f"SPLIT $name%-40s plan=${best._1}%6.3f exec=${best._2}%6.3f")
    }
    println(f"SPLIT-TOTAL plan=$totPlan%.1f exec=$totExec%.1f n=${selected.size}")
    spark.stop()
  }
}
