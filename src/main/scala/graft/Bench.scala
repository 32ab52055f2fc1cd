package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query against
  * `SPARK_GRAFT_SF_DIR` and emits machine-readable JSON on stdout.
  *
  * Measurement contract (round-4 hardening — the r1..r3 driver records
  * were unusable or load-distorted):
  *  - each query is executed `SPARK_GRAFT_BENCH_RUNS` times (default 3)
  *    after the global session warmup, and the per-query MEDIAN is
  *    reported, so one loaded scheduling window on the shared machine
  *    can't write a 5x outlier into the permanent record;
  *  - stdout passes through sbt RAW (build.sbt sets
  *    `run / outputStrategy := StdoutOutput`), so the JSON lines carry
  *    no "[info] " logger prefix and line-level json.loads succeeds;
  *  - the driver captures only a ~4 KB stdout tail, and a single line
  *    carrying all ~100 per-query timings exceeds that, so: the FULL
  *    per-query map line is printed first (and written to
  *    /tmp/graft_bench.json), and a COMPACT summary line (total + the
  *    10 slowest queries, always well under 1 KB) is printed LAST —
  *    the tail's final complete line is guaranteed parseable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warmup OUTSIDE any query's timer: executor spin-up, first
    // codegen, datasource/noop-writer init — otherwise whichever query
    // happens to run first absorbs ~3-5 s of one-time cost
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet")
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    def r4(v: Double): Double = math.round(v * 10000.0) / 10000.0
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // optional comma-separated subset for isolated profiling runs
    // (e.g. SPARK_GRAFT_BENCH_ONLY=sink_overwrite,retention_expire)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(kv => s(kv._1)))
    // INTERLEAVED sampling (round-16 hardening): round-robin the full
    // key list `runs` times instead of running each key's samples
    // back-to-back. With back-to-back samples, one loaded scheduling
    // window on the shared machine poisoned ALL of a key's samples and
    // the median recorded the distortion as if it were the query (r15:
    // q1_agg 9.4 s driver vs 1.2 s isolated). Interleaved, a load spike
    // spreads one bad sample across many keys and each key's median
    // survives it.
    val keys = selected.toSeq
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val failures = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    for (r <- 1 to runs; (name, fn) <- keys) {
      val t0 = System.nanoTime()
      // label every job with its key (guide §1.5) so UI/event-log
      // attribution maps jobs back to registry keys
      spark.sparkContext.setJobDescription(s"bench:$name run$r")
      // noop sink: forces full materialization of every output column
      // (a bare count() would let Catalyst prune computed columns and
      // under-measure narrow projections)
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case _: Throwable => failures(name) += 1; false }
      spark.sparkContext.setJobDescription(null)
      // a failed attempt's elapsed time is NOT a measurement of the
      // query (a fast throw would record a misleadingly good number) —
      // it is excluded from median/min and surfaced in `failures`
      if (ok) samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
    }
    // a key whose every sample failed reports -1 (loud in any diff)
    val results = keys.map { case (name, _) =>
      name -> (if (samples(name).isEmpty) -1.0 else r4(median(samples(name)))) }.toMap
    // min-of-N beside the median: the min is the least load-contaminated
    // sample, so (median - min) per key diagnoses residual contention
    val mins = keys.map { case (name, _) =>
      name -> (if (samples(name).isEmpty) -1.0 else r4(samples(name).min)) }.toMap
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = r4(if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0)
    val failJson = failures.toSeq.sortBy(_._1)
      .map { case (k, n) => "\"" + k + "\":" + n }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"agg":"median","interleaved":true,"queries":${jsonMap(results.toSeq.sortBy(_._1))},"queries_min":${jsonMap(mins.toSeq.sortBy(_._1))},"failures":$failJson,"sf":"$sfDir"}"""
    // the summary line's `queries` map is all the round-over-round PERF
    // comparison ever sees, and the driver keeps only a 2000-char stdout
    // tail — a fixed top-10 starved it (r19: n_common = 3) while ~1 KB
    // of tail budget sat unused, but ALL ~277 keys (~8 KB of names
    // alone) can never fit. So: still slowest-first (the top-10 keys of
    // the old contract are always a prefix — additions-only), extended
    // greedily with the next-slowest keys while the whole line stays
    // under SummaryBudget bytes, leaving room for the trailing sbt
    // "[success]" line inside the tail window.
    val SummaryBudget = 1800
    def summaryWith(qs: Seq[(String, Double)]): String =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"runs_per_query":$runs,"agg":"median","queries":${jsonMap(qs)},"n_failed_samples":${failures.values.sum},"sf":"$sfDir","full":"/tmp/graft_bench.json"}"""
    val sortedDesc = results.toSeq.sortBy(-_._2)
    var topN = math.min(10, sortedDesc.size)
    var summaryLine = summaryWith(sortedDesc.take(topN))
    while (topN < sortedDesc.size && {
        val cand = summaryWith(sortedDesc.take(topN + 1))
        cand.length <= SummaryBudget && { summaryLine = cand; true }
      }) topN += 1
    // the full per-query map is persisted TWICE: /tmp for ad-hoc
    // profiling, and BENCH_FULL.json in the working directory (the repo,
    // when run from it) so every round leaves a diffable all-keys record
    // in-repo — the driver's BENCH_r{N}.json tail truncates past top-10
    // (round close also commits a BENCH_FULL_r{N}.json copy)
    // (subset runs skip the repo copy — a SPARK_GRAFT_BENCH_ONLY profile
    // must not masquerade as the round's all-keys record)
    for (p <- Seq("/tmp/graft_bench.json") ++
        (if (only.isEmpty) Seq("BENCH_FULL.json") else Nil))
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    spark.stop()
    // after spark.stop() so no shutdown logging can interleave past them;
    // summary LAST — the tail's final complete line must be the short one
    println(fullLine)
    println(summaryLine)
    Console.out.flush()
  }
}
