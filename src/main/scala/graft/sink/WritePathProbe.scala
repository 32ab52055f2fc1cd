package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Micro-probe for the optimistic-commit write path: separates the
  * O(1) metadata-swap cost (the part round 3's CAS machinery added)
  * from the O(delta) data-write cost, so a bench regression on a sink
  * query can be attributed with numbers instead of suspicion.
  *
  * For each commit it records, via [[SnapshotTable.beforeSwapHook]],
  * the wall time from swap-attempt start to commit return — metadata
  * read + CAS check + metadata write + audit, everything the commit
  * protocol does AFTER the data is on disk. Prints one JSON line:
  * total per-commit latency vs swap-only latency (medians over N).
  */
object WritePathProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_COMMITS", "50").toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t = SnapshotTable(Files.createTempDirectory("graft_probe").toString, "probe", "t")
    val df = Seq(1, 2, 3).toDF("v")
    t.overwrite(df)

    @volatile var swapStart = 0L
    val swapNanos = Array.ofDim[Long](n)
    val commitNanos = Array.ofDim[Long](n)
    SnapshotTable.beforeSwapHook = (_, _) => swapStart = System.nanoTime()
    try {
      var i = 0
      while (i < n) {
        val t0 = System.nanoTime()
        t.append(df)
        val t1 = System.nanoTime()
        commitNanos(i) = t1 - t0
        swapNanos(i) = t1 - swapStart
        i += 1
      }
    } finally SnapshotTable.beforeSwapHook = (_, _) => ()

    def medianMs(xs: Array[Long]): Double = {
      val s = xs.sorted
      val m = if (s.length % 2 == 1) s(s.length / 2).toDouble
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      math.round(m / 1e3) / 1e3
    }
    spark.stop()
    println(
      s"""{"metric":"write_path_probe","commits":$n,"commit_median_ms":${medianMs(commitNanos)},"swap_median_ms":${medianMs(swapNanos)}}""")
    Console.out.flush()
  }
}
