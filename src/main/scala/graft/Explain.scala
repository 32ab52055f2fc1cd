package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: print `explain(formatted)` for the named registry
  * queries (all of them with no names) — the iterate-on-the-plan loop the
  * build runs after correctness goes green. Usage:
  *   runMain graft.Explain <sfDir> [key ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val only = args.tail.toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.all
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, d) =>
        println(s"\n========== $name ==========")
        try println(d.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"[explain failed] ${e.getMessage}") }
      }
    spark.stop()
  }
}
