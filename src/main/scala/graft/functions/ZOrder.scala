package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional file-layout
  * strategy Iceberg's `rewrite_data_files(strategy => 'sort',
  * sort_order => 'zorder(a, b)')` and Delta's `OPTIMIZE ... ZORDER BY`
  * ship: interleaving the bits of several columns' normalized values
  * makes rows close in z-value close in EVERY clustered dimension, so a
  * rewrite sorted by z-value yields files whose per-file min/max ranges
  * are tight on all dimensions at once — parquet row-group/file stat
  * skipping then works for predicates on ANY of them, where a linear
  * sort only serves its leading column.
  *
  * The mapping is the practical two-step used by both engines: each
  * column is affinely normalized to `bits`-bit unsigned ints via its
  * min/max (one bounded stats job, collected once at build), then the
  * bit planes are interleaved. The interleave unrolls to
  * `bits × |cols|` shift/mask/or terms over built-in expressions —
  * whole-stage codegen'd, no UDF.
  */
object ZOrder {

  /** Z-value column for `cols` (numeric), each quantized to `bits` bits.
    * Runs one min/max aggregation over `df` (driver-collected, O(cols)
    * scalars) to anchor the normalization; NULL values sort to bucket 0.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.size >= 2, "z-ordering needs at least two columns (sort for one)")
    require(bits > 0 && bits * cols.size <= 63, s"bits=$bits x ${cols.size} cols must fit a long")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"min_$c"), max(col(c).cast("double")).as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = (1L << bits) - 1
    val quantized = cols.zipWithIndex.map { case (c, i) =>
      // an empty frame or an all-null column aggregates to null min/max;
      // treat it like the hi==lo degenerate case (bucket 0) instead of
      // letting getDouble NPE (compact(clusterBy=…) on an empty table)
      val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val hi = if (row.isNullAt(2 * i + 1)) lo else row.getDouble(2 * i + 1)
      val q =
        if (hi == lo) lit(0L)
        else least(lit(buckets), greatest(lit(0L),
          floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets.toDouble)).cast("long")))
      coalesce(q, lit(0L))
    }
    // interleave: bit j of column i lands at position j * ncols + i
    val n = cols.size
    val terms = for {
      i <- 0 until n
      j <- 0 until bits
    } yield shiftleft(shiftright(quantized(i), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce((a, b) => a.bitwiseOR(b)).as("z_value")
  }
}
