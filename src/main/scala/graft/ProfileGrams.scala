package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for the positional n-gram assembler under REAL input
  * parallelism (diagnostic main, not part of the registry).
  *
  * Context (r19 verdict): every committed fixture is single-row-group
  * parquet, so its scan is ONE task and the r19 map-side gram rewrite —
  * correct at the 100 TB target, where the old window shape shuffled
  * every token row — ran gram assembly serially and regressed the
  * family at fixture scale. This main settles the scale question the
  * fixtures cannot: it rewrites the documents fixture as MULTI-file
  * parquet (>= `tasks` scan tasks, the shape any real corpus has) and
  * times the three assembler generations on BOTH inputs:
  *   window — r18: posexplode every token + window-lead (full shuffle)
  *   hof    — r19: map-side transform/slice/array_join (interpreted HOF)
  *   native — r20: map-side WordGramScan (one pass, codegen-embeddable)
  *
  *   sbt -batch "runMain graft.ProfileGrams /root/testdata/sf0.1 16"
  */
object ProfileGrams {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tasks = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val n = 3
    def toks(c: Column): Column = split(trim(c), "\\s+")

    def windowShape(docs: DataFrame): DataFrame = {
      val tokRows = docs.select(col("doc_id"), posexplode(toks(col("text"))))
        .toDF("doc_id", "pos", "tok")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val gram = concat_ws(" ",
        (0 until n).map(i => if (i == 0) col("tok") else lead(col("tok"), i).over(w)): _*)
      tokRows
        .withColumn("last", lead(col("tok"), n - 1).over(w))
        .withColumn("gram", gram)
        .filter(col("last").isNotNull)
        .select("doc_id", "pos", "gram")
    }

    def hofShape(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), toks(col("text")).as("_toks"))
        .select(col("doc_id"),
          posexplode(when(size(col("_toks")) >= n,
            transform(sequence(lit(0), size(col("_toks")) - n), j =>
              array_join(slice(col("_toks"), j + 1, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))))
        .toDF("doc_id", "pos", "gram")

    def nativeShape(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), toks(col("text")).as("_toks"))
        .select(col("doc_id"),
          posexplode(graft.functions.WordGramScan.wordGrams(col("_toks"), n)))
        .toDF("doc_id", "pos", "gram")

    // downstream the postings consumers share: distinct (doc_id, gram)
    // with map-side partial agg — identical for every arm
    def postings(grams: DataFrame): DataFrame =
      grams.select(col("doc_id"), col("gram").as("sh")).distinct()

    def time(label: String, reps: Int = 3)(df: => DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $label%-46s ${ts.min}%8.3f s (min of $reps: ${ts.map(t => f"$t%.2f").mkString(",")})")
      ts.min
    }

    // the committed fixture: single row group -> single scan task
    val single = Queries.tbl(spark, dir, "documents")
      .select("doc_id", "text")
    // the multi-file copy: `tasks` files -> `tasks` scan tasks (verified
    // below), the input shape of any real corpus
    val multiPath = "/tmp/graft_grams_ab_parquet"
    single.repartition(tasks).write.mode("overwrite").parquet(multiPath)
    val multi = spark.read.parquet(multiPath)
    println(s"single-file scan partitions: ${single.rdd.getNumPartitions}")
    println(s"multi-file  scan partitions: ${multi.rdd.getNumPartitions}")

    val arms = Seq[(String, DataFrame => DataFrame)](
      "window(r18)" -> windowShape,
      "hof(r19)" -> hofShape,
      "native(r20)" -> nativeShape)
    for ((inputName, input) <- Seq("single-task" -> single, s"$tasks-task" -> multi);
         (armName, arm) <- arms) {
      time(s"$inputName $armName grams")(arm(input))
      time(s"$inputName $armName postings")(postings(arm(input)))
    }
    spark.stop()
  }
}
