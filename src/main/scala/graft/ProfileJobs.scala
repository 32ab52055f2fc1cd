package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profiler for registry keys (diagnostic main, not part of
  * the registry): runs each named key under a SparkListener that
  * records every Spark job's wall time, task count, and call site, so a
  * multi-action key's bench seconds can be attributed to its individual
  * jobs (commit protocol vs rewrite join vs final scan) instead of
  * guessed at. Also reports driver-only time (wall minus job sum) —
  * planning, file IO, metadata commits. Run:
  *   sbt -batch "runMain graft.ProfileJobs /root/testdata/sf0.1 key1 key2"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet")
      .write.mode("overwrite").format("noop").save()

    final case class JobRec(id: Int, desc: String, secs: Double, tasks: Int)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[JobRec]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("")
        starts.put(js.jobId, (desc.take(90), js.time,
          js.stageInfos.map(_.numTasks).sum)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(starts.remove(je.jobId)).foreach { case (d, t0, nt) =>
          done.synchronized { done += JobRec(je.jobId, d, (je.time - t0) / 1e3, nt) }: Unit
        }
    })

    // two passes per key: run 1 pays per-key warm-base builds + codegen;
    // run 2 is the bench steady state
    for (k <- keys; run <- 1 to 2) {
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      try Queries.all(k).fn(spark, dir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"KEY $k FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      val recs = done.synchronized(done.sortBy(_.id).toList)
      val jobSum = recs.map(_.secs).sum
      println(f"\nKEY $k run$run wall=$wall%.2f s  jobSum=$jobSum%.2f s  driverOnly=${wall - jobSum}%.2f s  nJobs=${recs.size}")
      recs.foreach(r => println(f"  job#${r.id}%-4d ${r.secs}%7.3f s  tasks=${r.tasks}%-5d ${r.desc}"))
    }
    spark.stop()
  }
}
