package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for `corpus_boilerplate` (diagnostic main, not
  * part of the registry). Documents the round-6 finding that led to the
  * slice-zip rewrite: a `transform(sequence(...), i -> struct(...))`
  * window builder ran interpreted at ~60 µs/element (15 s per
  * evaluation at sf0.1, evaluated once per consumer = 30 s+); the
  * zip-of-shifted-slices + posexplode form plus the plan-keyed window
  * cache brings the query to ~1.5 s. Run:
  *   sbt -batch "runMain graft.ProfileBoilerplate /root/testdata/sf0.1"
  */
object ProfileBoilerplate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"STAGE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    import Queries.tbl
    import graft.text.TextAnalysis

    val docs = tbl(spark, dir, "documents")
    TextAnalysis.clearCaches()
    time("boilerplate_COLD")(TextAnalysis.boilerplateCoverage(docs, "text", 3, 10))
    time("boilerplate_WARM")(TextAnalysis.boilerplateCoverage(docs, "text", 3, 10))
    TextAnalysis.boilerplateCoverage(docs, "text", 3, 10).explain("formatted")
    spark.stop()
  }
}
