package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Microbenchmark of the native TextHashScan expressions vs the HOF
  * shapes they replaced (diagnostic main, not part of the registry).
  *   sbt -batch "runMain graft.ProfileTextHash /root/testdata/sf0.1"
  */
object ProfileTextHash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String, reps: Int = 3)(df: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $label%-40s ${ts.min}%8.3f s (min of $reps: ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val docs = Queries.tbl(spark, dir, "documents")
    val k = 8
    def hash60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")

    // raw expression cost, no downstream
    time("native minShingle xx")(docs.select(col("doc_id"),
      graft.functions.TextHashScan.minShingleHash(col("text"), k, md5Mode = false)))
    time("native minShingle md5")(docs.select(col("doc_id"),
      graft.functions.TextHashScan.minShingleHash(col("text"), k, md5Mode = true)))
    time("native cdcBounds xx")(docs.select(col("doc_id"),
      graft.functions.TextHashScan.cdcBoundaries(col("text"), k, 64, md5Mode = false)))
    time("native cdcBounds md5")(docs.select(col("doc_id"),
      graft.functions.TextHashScan.cdcBoundaries(col("text"), k, 64, md5Mode = true)))
    def hofBounds(gram: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val len = length(col("text"))
      when(len >= k,
        filter(
          transform(sequence(lit(k), len), i =>
            when(gram(col("text").substr(i - (k - 1), lit(k))) % 64 === 0, i)),
          x => x.isNotNull && x < len)).otherwise(array().cast("array<int>"))
    }
    time("hof cdcBounds xx")(docs.select(col("doc_id"), hofBounds(xxhash64(_))))
    time("hof cdcBounds md5")(docs.select(col("doc_id"), hofBounds(hash60)))

    // full operators
    time("cdcChunksFast (native)")(graft.text.TextAnalysis.cdcChunksFast(docs, "text", 8, 64))
    time("cdcChunksBoundedFast (native)")(
      graft.text.TextAnalysis.cdcChunksBoundedFast(docs, "text", 8, 64, 32, 128))
    time("fingerprintFast (native)")(graft.text.TextAnalysis.fingerprintFast(docs, "text", 8))
    time("fingerprint md5 (native)")(graft.text.TextAnalysis.fingerprint(docs, "text", 8))
    spark.stop()
  }
}
