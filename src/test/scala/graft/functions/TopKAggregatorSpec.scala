package graft.functions

import graft.SparkSpec

import scala.util.Random

class TopKAggregatorSpec extends SparkSpec {

  import spark.implicits._

  test("keeps the k best by (score desc, id asc) across reduce and merge") {
    val agg = new TopKAggregator(3)
    val rnd = new Random(13)
    for (_ <- 1 to 20) {
      val entries = (1L to 30L).map(id => (id, rnd.nextInt(10).toDouble))
      // property: any split into partial buffers merges to the same top-3
      val (l, r) = rnd.shuffle(entries).splitAt(rnd.nextInt(entries.size))
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val expected = entries.sortBy { case (id, s) => (-s, id) }.take(3)
      assert(merged == expected)
    }
  }

  test("groups smaller than k return all entries, ranked") {
    val agg = new TopKAggregator(10)
    val out = agg.finish(Seq((5L, 1.0), (2L, 2.0)).foldLeft(agg.zero)(agg.reduce))
    assert(out == Seq((2L, 2.0), (5L, 1.0)))
  }

  test("heap-ranked similarity equals the window-ranked query exactly") {
    import org.apache.spark.sql.functions._
    val emb = graft.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") < 3)
    val win = graft.similarity.Similarity.bruteForceTopK(q, emb, 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val heap = graft.similarity.Similarity.bruteForceTopKHeap(q, emb, 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(heap == win)
  }
}
