package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a custom typed aggregate.
  *
  * The window realization of per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(score))`) must SORT every
  * group in full — O(n log n) per group and the whole group resident in
  * the sort — before discarding all but k rows. This Aggregator keeps
  * only the k best entries per group at every stage: map-side partial
  * aggregation already truncates to k, so the shuffle carries at most
  * k entries per (partition, group) instead of the full group, and
  * reducer memory is O(k). That asymmetry (k=10 vs a hot group with 10^9
  * rows) is what makes top-k viable at 100 TB.
  *
  * Entries are (id, score); "best" = highest score, lowest id on ties —
  * the registry's standard deterministic ranking. The buffer is a
  * sorted-array bounded insert (k is small; a binary heap would win for
  * large k).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Long, Double)]] {

  require(k > 0, s"k must be positive, got $k")

  /** Order: better first = (score desc, id asc). */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, (in._2, in._1))

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && better(buf.last, e)) buf // below the cut, O(1) reject
    else {
      val i = buf.indexWhere(x => better(e, x))
      val at = if (i < 0) buf.size else i
      (buf.take(at) :+ e) ++ buf.drop(at) match {
        case grown if grown.size > k => grown.dropRight(1)
        case grown => grown
      }
    }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
