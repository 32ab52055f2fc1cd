package graft.props

import com.google.common.hash.Hashing
import graft.functions.{DotProduct, IcebergBucketHash, SumSquares, TopKAggregator}
import graft.types.IcebergTypes
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the engine's pure kernels (SURVEY.md §5):
  * hashing parity with Iceberg's reference implementation, top-k
  * aggregation invariants under arbitrary splits, type-mapping totality.
  */
object EngineProps extends Properties("graft") {

  // ---------------------------------------------------------------- hashing

  property("icebergBucket.long matches Guava murmur3_32 for all longs") =
    forAll { (v: Long) =>
      IcebergBucketHash.hashLong(v) == Hashing.murmur3_32_fixed().hashLong(v).asInt()
    }

  property("icebergBucket.bytes matches Guava for arbitrary byte arrays") =
    forAll { (bytes: Array[Byte]) =>
      IcebergBucketHash.hashBytes(bytes) ==
        Hashing.murmur3_32_fixed().hashBytes(bytes).asInt()
    }

  property("bucket values land in [0, n) for any positive n") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.chooseNum(1, 1 << 20)) {
      (v: Long, n: Int) =>
        val b = (IcebergBucketHash.hashLong(v) & Int.MaxValue) % n
        b >= 0 && b < n
    }

  // ----------------------------------------------------------------- top-k

  private val entriesGen: Gen[List[(Long, Double)]] = Gen.listOf(
    Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0, 9).map(_.toDouble)))

  property("topK(k) == sort.take(k) regardless of arrival order") =
    forAll(entriesGen, Gen.chooseNum(1, 8)) { (entries, k) =>
      val agg = new TopKAggregator(k)
      val out = agg.finish(entries.foldLeft(agg.zero)(agg.reduce))
      out == entries.sortBy { case (id, s) => (-s, id) }.take(k)
    }

  property("topK merge is associative with reduce (partial aggregation safety)") =
    forAll(entriesGen, entriesGen, Gen.chooseNum(1, 6)) { (l, r, k) =>
      val agg = new TopKAggregator(k)
      val whole = agg.finish((l ++ r).foldLeft(agg.zero)(agg.reduce))
      val split = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      split == whole
    }

  // ----------------------------------------------------------- vector math

  private def lit(a: Array[Double]) = Literal.create(a, ArrayType(DoubleType))
  private def dot(a: Array[Double], b: Array[Double]): Double =
    DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]
  private def ss(a: Array[Double]): Double =
    SumSquares(lit(a)).eval(null).asInstanceOf[Double]

  private val vecGen: Gen[Array[Double]] =
    Gen.listOf(Gen.chooseNum(-1e6, 1e6)).map(_.toArray)

  property("dot(a, a) is bit-identical to sumSquares(a) (same fold order)") =
    forAll(vecGen) { a => dot(a, a) == ss(a) }

  property("dot product is bit-identical under argument swap") =
    forAll(Gen.zip(vecGen, vecGen)) { case (a, b) =>
      val n = math.min(a.length, b.length)
      dot(a.take(n), b.take(n)) == dot(b.take(n), a.take(n))
    }

  property("dot matches the sequential left-to-right reference fold") =
    forAll(Gen.zip(vecGen, vecGen)) { case (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val ref = (0 until n).foldLeft(0.0)((s, i) => s + a(i) * b(i))
      dot(a, b) == ref
    }

  property("length-mismatched arrays dot to NULL, never a truncated value") =
    forAll(Gen.zip(vecGen, vecGen)) { case (a, b) =>
      (a.length == b.length) ||
        DotProduct(lit(a), lit(b)).eval(null) == null
    }

  // ------------------------------------------------------------------ types

  property("every iceberg type string maps to a Spark type (total, no throw)") =
    forAll(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(
      "boolean", "int", "long", "float", "double", "date", "time",
      "timestamp", "timestamptz", "string", "uuid", "binary", "decimal(9,2)"))) {
      (t: String) => IcebergTypes.toSpark(t) != null
    }

  property("decimal mapping round-trips precision and scale") =
    forAll(Gen.chooseNum(1, 38), Gen.chooseNum(0, 18)) { (p, s0) =>
      val s = math.min(s0, p)
      Prop(IcebergTypes.toSpark(s"decimal($p,$s)") ==
        org.apache.spark.sql.types.DecimalType(p, s))
    }
}
