package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level profiler for the `corpus_clean` capstone (diagnostic
  * main, not part of the registry): times each pipeline stage in
  * isolation so bench hotspots can be attributed to a stage instead of
  * guessed at. Run:
  *   sbt -batch "runMain graft.ProfileCorpus /root/testdata/sf0.1"
  */
object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warmup (executor spin-up + first codegen), untimed
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"STAGE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    import Queries.tbl
    import graft.dedup.Dedup
    import graft.text.TextAnalysis

    val docs = tbl(spark, dir, "documents")
    def kept = docs
      .filter(TextAnalysis.qualityScoreCol(col("text")) >= 0.7 &&
        TextAnalysis.predictedLangCol(col("text")) === "en")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)))
      .filter(col("_rn") === 1).drop("_rn")

    time("scan_only")(docs.select("doc_id", "n_chars"))
    time("quality_lang_filter")(docs
      .filter(TextAnalysis.qualityScoreCol(col("text")) >= 0.7 &&
        TextAnalysis.predictedLangCol(col("text")) === "en")
      .select("doc_id"))
    time("kept(filters+md5window)")(kept.select("doc_id"))
    Dedup.clearCaches()
    time("postings_build_full(cold)")(Dedup.sharedPostings(docs, "text", 3))
    time("postings_read_full(warm)")(Dedup.sharedPostings(docs, "text", 3))
    time("kept_postings_semijoin")(
      Dedup.sharedPostings(docs, "text", 3).join(kept.select("doc_id"), "doc_id"))
    time("jaccard_on_kept_postings")(Dedup.jaccardPairs(
      Dedup.sharedPostings(docs, "text", 3).join(kept.select("doc_id"), "doc_id"),
      minJaccard = 0.6, maxDf = 10))

    val clean = DedupQueries.defs("corpus_clean").fn
    Dedup.clearCaches()
    time("corpus_clean_COLD")(clean(spark, dir))
    time("corpus_clean_WARM")(clean(spark, dir))

    Dedup.clearCaches()
    time("simhash_sigs_COLD")(Dedup.sharedSimhash(docs, "text"))
    time("simhash_sigs_WARM")(Dedup.sharedSimhash(docs, "text"))
    time("simhash_pairs")(Dedup.simhashPairs(docs, "text", maxHamming = 2))
    val t0 = System.nanoTime()
    val cc = Dedup.connectedComponents(Dedup.simhashPairs(docs, "text", maxHamming = 2))
    println(f"STAGE connected_components(eager)    ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    time("cc_reread")(cc)

    spark.stop()
  }
}
