package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query against
  * `SPARK_GRAFT_SF_DIR` and emits ONE compact machine-readable JSON line
  * (rounded seconds) as the LAST stdout line, plus a copy at
  * `/tmp/graft_bench.json` — the round-1 output survived only as
  * truncated tail text in the driver, so the line is kept short (4 dp)
  * and log noise is silenced to ERROR.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces full materialization of every output column
      // (a bare count() would let Catalyst prune computed columns and
      // under-measure narrow projections)
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      name -> r4((System.nanoTime() - t0) / 1e9)
    }
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = r4(if (results.nonEmpty) results.values.sum else 0.0)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_bench.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
    // after spark.stop() so no shutdown logging can interleave past it
    println(line)
    Console.out.flush()
  }
}
