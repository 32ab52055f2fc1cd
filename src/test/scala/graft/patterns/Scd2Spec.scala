package graft.patterns

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** SCD2 invariants, property-style over seeded random dimension/feed
  * pairs (SURVEY.md §5): at most one current row per natural_key,
  * closed rows get the merge instant, unchanged/absent rows pass through
  * untouched, new keys open exactly one current version.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  val MergeAt = 1709251200000L

  def mkDim(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("natural_key", "segment", "acctbal")
      .withColumn("effective_from", timestamp_millis(lit(1704067200000L)))
      .withColumn("effective_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

  def doMerge(dim: DataFrame, feed: DataFrame): DataFrame =
    Scd2.merge(dim, feed, Seq("segment", "acctbal"), timestamp_millis(lit(MergeAt)))

  test("merge invariants hold over seeded random dim/feed pairs") {
    val rnd = new Random(42)
    for (_ <- 1 to 5) {
      val nKeys = 20 + rnd.nextInt(30)
      val dimRows = (1L to nKeys).map(k =>
        (k, s"seg${rnd.nextInt(3)}", rnd.nextInt(1000).toDouble))
      // feed: random subset changed, random subset unchanged, some new keys
      val feedRows = dimRows.collect {
        case (k, seg, bal) if rnd.nextBoolean() =>
          if (rnd.nextBoolean()) (k, seg, bal) // unchanged
          else (k, s"seg${rnd.nextInt(3)}X", bal + 1) // changed
      } ++ (1 to 5).map(i => (1000L + i, "new", 0.0))
      val dim = mkDim(dimRows)
      val feed = feedRows.toDF("natural_key", "segment", "acctbal")
      val out = doMerge(dim, feed).cache()

      // (1) at most one current row per key, and exactly one for every
      // key that was ever seen
      val perKey = out.filter($"is_current")
        .groupBy($"natural_key").count().agg(max($"count")).as[Long].head()
      assert(perKey == 1L)
      val allKeys = (dimRows.map(_._1) ++ feedRows.map(_._1)).distinct.size
      assert(out.filter($"is_current").count() == allKeys.toLong)

      // (2) every non-current row is closed with the merge instant
      val closed = out.filter(!$"is_current")
      assert(closed.filter($"effective_to".isNull).count() == 0)

      // (3) row conservation: |out| = |dim| + changed + new
      val changedKeys = feedRows.count { case (k, seg, bal) =>
        dimRows.exists(d => d._1 == k && (d._2 != seg || d._3 != bal)) }
      val newKeys = feedRows.count(f => !dimRows.exists(_._1 == f._1))
      assert(out.count() == dimRows.size + changedKeys + newKeys)
      out.unpersist()
    }
  }

  test("unchanged and absent rows pass through byte-identical") {
    val dim = mkDim(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val feed = Seq((2L, "b", 2.0)).toDF("natural_key", "segment", "acctbal")
    val out = doMerge(dim, feed)
    assert(out.count() == 3)
    assert(out.filter($"is_current" && $"effective_to".isNull).count() == 3)
  }

  test("a changed key yields a closed old version and an open new one") {
    val dim = mkDim(Seq((1L, "a", 1.0)))
    val feed = Seq((1L, "a", 99.0)).toDF("natural_key", "segment", "acctbal")
    val out = doMerge(dim, feed).orderBy($"effective_from")
    val rows = out.collect()
    assert(rows.length == 2)
    val closed = rows.find(!_.getAs[Boolean]("is_current")).get
    val opened = rows.find(_.getAs[Boolean]("is_current")).get
    assert(closed.getAs[java.sql.Timestamp]("effective_to").getTime == MergeAt)
    assert(opened.getAs[Double]("acctbal") == 99.0)
    assert(opened.getAs[java.sql.Timestamp]("effective_from").getTime == MergeAt)
    assert(opened.getAs[java.sql.Timestamp]("effective_to") == null)
  }

  test("ScalaCheck: invariants hold under random CDC update streams") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small key space so streams revisit keys (repeat updates, revert-to-
    // old-value cases); each batch has unique keys (a CDC delta)
    val attrGen = for {
      s <- Gen.oneOf("a", "b", "c")
      b <- Gen.choose(0, 4)
    } yield (s, b.toDouble)
    val batchGen: Gen[Map[Long, (String, Double)]] =
      Gen.mapOf(Gen.zip(Gen.choose(1L, 8L), attrGen)).map(_.take(6))
    val streamGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, batchGen))

    val prop = Prop.forAll(streamGen) { batches =>
      val seed = Seq((1L, "a", 1.0), (2L, "b", 2.0))
      var dim = mkDim(seed)
      var t = MergeAt
      batches.foreach { b =>
        val feed = b.toSeq.map { case (k, (s, bal)) => (k, s, bal) }
          .toDF("natural_key", "segment", "acctbal")
        // localCheckpoint: cut the growing full_outer-join plan per round
        dim = Scd2.merge(dim, feed, Seq("segment", "acctbal"),
          timestamp_millis(lit(t))).localCheckpoint()
        t += 3600000L
      }
      val rows = dim.collect().map { r =>
        (r.getAs[Long]("natural_key"),
          r.getAs[java.sql.Timestamp]("effective_from").getTime,
          Option(r.getAs[java.sql.Timestamp]("effective_to")).map(_.getTime),
          r.getAs[Boolean]("is_current"))
      }
      val everSeen = (seed.map(_._1) ++ batches.flatMap(_.keys)).toSet
      val byKey = rows.groupBy(_._1)
      val keysOk = byKey.keySet == everSeen
      val invariantsOk = byKey.values.forall { vs =>
        val sorted = vs.sortBy(_._2)
        val oneCurrent = vs.count(_._4) == 1
        // non-overlapping, chained ranges: every non-last version closed,
        // close instant <= the next version's open instant; exactly the
        // open-ended row is the current one
        val chained = sorted.init.forall(_._3.isDefined) &&
          sorted.zip(sorted.tail).forall { case (a, b) => a._3.exists(_ <= b._2) } &&
          sorted.last._3.isEmpty && sorted.last._4
        oneCurrent && chained
      }
      keysOk && invariantsOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, s"SCD2 stream invariants failed: ${res.status}")
  }

  test("windowClose derives non-overlapping ranges with one current row") {
    val versions = Seq(
      (1L, 1000L), (1L, 2000L), (1L, 3000L), (2L, 1500L))
      .toDF("natural_key", "ms")
      .withColumn("effective_from", timestamp_millis($"ms")).drop("ms")
    val out = Scd2.windowClose(versions).cache()
    // exactly one current per key
    assert(out.filter($"is_current").groupBy($"natural_key").count()
      .agg(max($"count")).as[Long].head() == 1L)
    // ranges chain: effective_to of version n = effective_from of n+1
    val k1 = out.filter($"natural_key" === 1L).orderBy($"effective_from")
      .select(unix_millis($"effective_from"), unix_millis($"effective_to")).as[(Long, Option[Long])]
      .collect()
    assert(k1.toSeq == Seq((1000L, Some(2000L)), (2000L, Some(3000L)), (3000L, None)))
    out.unpersist()
  }
}
