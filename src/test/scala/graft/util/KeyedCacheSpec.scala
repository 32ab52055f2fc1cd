package graft.util

import graft.SparkSpec

class KeyedCacheSpec extends SparkSpec {

  import spark.implicits._

  test("persisted entries are cached by plan key and unpersisted on clear") {
    val cache = new KeyedCache()
    val src = Seq(1, 2, 3).toDF("v")
    var builds = 0
    def build() = { builds += 1; src.selectExpr("v * 2 as v2") }
    val a = cache.getOrBuild(src, "v", 7)(build())
    val b = cache.getOrBuild(src, "v", 7)(build())
    assert(builds == 1, "second lookup must hit the cache")
    assert(a eq b)
    assert(cache.peek(src, "v", 7).isDefined)
    assert(cache.peek(src, "v", 8).isEmpty)
    cache.clear()
    assert(cache.peek(src, "v", 7).isEmpty)
  }

  test("non-persisted (localCheckpoint-backed) entries release checkpoint blocks on clear") {
    val cache = new KeyedCache(persistEntries = false)
    val src = Seq(1, 2, 3, 4).toDF("v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val built = cache.getOrBuild(src, "v", 1)(src.localCheckpoint())
    assert(built.count() == 4)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint registers a persisted RDD")
    cache.clear()
    // df.unpersist is a no-op on a never-persisted frame; the cache must
    // release the checkpoint RDD's blocks explicitly or they leak until GC
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(id => !after.contains(id)),
      s"checkpoint RDD blocks ${added -- (added -- after)} must be released on clear")
  }
}
