package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("z-value interleaves bit planes (known Morton codes)") {
    // bits=2, cols=(x, y): bit j of col i lands at j*2+i, so
    // z = x0 + 2*y0 + 4*x1 + 8*y1 with x,y already spanning [0, 3]
    val df = Seq((0, 0), (3, 3), (3, 0), (0, 3), (1, 2)).toDF("x", "y")
    val out = df.withColumn("z", ZOrder.zValue(df, Seq("x", "y"), bits = 2))
      .select("x", "y", "z").as[(Int, Int, Long)].collect().toMap2
    assert(out((0, 0)) == 0L)
    assert(out((3, 3)) == 15L)
    assert(out((3, 0)) == 5L) // x bits only: 1 + 4
    assert(out((0, 3)) == 10L) // y bits only: 2 + 8
    assert(out((1, 2)) == 9L) // x0=1 -> 1; y1=1 -> 8
  }

  test("z-ordered files are compact in BOTH dimensions; a linear sort is not") {
    // 32x32 uniform grid; 4 output files. A linear sort on x gives files
    // covering the full y range; the z-order curve split into 4 chunks
    // gives files covering about half of each dimension.
    val grid = (0 until 1024).map(i => (i % 32, i / 32)).toDF("x", "y")
    def fileRanges(df: org.apache.spark.sql.DataFrame): (Double, Double, Long) = {
      val r = df.groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .agg(avg("xr"), avg("yr"), count(lit(1))).head()
      (r.getDouble(0), r.getDouble(1), r.getLong(2))
    }
    def rewrite(clusterBy: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column) = {
      val t = graft.sink.SnapshotTable(
        java.nio.file.Files.createTempDirectory("graft_z").toString, "ns", "t")
      t.overwrite(grid.repartition(8))
      t.compact(spark, targetFileBytes = math.max(1L, t.dataBytes / 4),
        clusterBy = Seq(clusterBy(t.read(spark))))
      t.read(spark)
    }
    val (zx, zy, zn) = fileRanges(rewrite(df => ZOrder.zValue(df, Seq("x", "y"), bits = 5)))
    val (lx, ly, ln) = fileRanges(rewrite(_ => col("x")))
    assert(zn >= 3 && ln >= 3, s"need multiple files to compare ($zn, $ln)")
    // linear: x tight but y spans the whole grid in every file
    assert(ly > 30.0, s"linear-sort y range should be ~full, got $ly")
    assert(lx < 16.0, s"linear-sort x range should be tight, got $lx")
    // z-order: BOTH dimensions well under the full range
    assert(zx < 20.0 && zy < 20.0, s"z-order ranges should tighten both dims: ($zx, $zy)")
  }

  test("degenerate and invalid inputs") {
    val df = Seq((1, 5), (1, 9)).toDF("a", "b")
    // constant column quantizes to bucket 0 everywhere (no divide-by-zero)
    val z = df.withColumn("z", ZOrder.zValue(df, Seq("a", "b"), bits = 4))
      .select("z").as[Long].collect().toSeq
    assert(z.length == 2 && z.forall(_ >= 0))
    intercept[IllegalArgumentException](ZOrder.zValue(df, Seq("a"), bits = 4))
    intercept[IllegalArgumentException](ZOrder.zValue(df, Seq("a", "b"), bits = 40))
  }

  test("null min/max (empty frame, all-null column) buckets to 0 instead of NPE") {
    // empty frame: min/max aggregate to null — must not getDouble-NPE
    val empty = Seq.empty[(Int, Int)].toDF("a", "b")
    val zEmpty = empty.withColumn("z", ZOrder.zValue(empty, Seq("a", "b"), bits = 4))
    assert(zEmpty.count() == 0)
    // all-null column: its plane contributes bucket 0 for every row
    val allNull = Seq((null.asInstanceOf[Integer], 1), (null.asInstanceOf[Integer], 2))
      .toDF("a", "b")
    val zs = allNull.withColumn("z", ZOrder.zValue(allNull, Seq("a", "b"), bits = 4))
      .select("z").as[Long].collect().toSeq
    assert(zs.forall(_ >= 0))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
