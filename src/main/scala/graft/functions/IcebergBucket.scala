package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, TimestampType, TimestampNTZType}
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec `bucket[N]` partition transform as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Iceberg's hidden partitioning hashes values with murmur3_x86_32 over a
  * canonical byte layout (int/long/date/timestamp as 8-byte
  * little-endian, strings as UTF-8 — Iceberg spec "Appendix B: 32-bit
  * Hash Requirements") and buckets by `(hash & MaxInt) % N`. Spark's
  * builtin `hash()` is also murmur3 but uses a different seed and byte
  * layout, so its buckets do NOT line up with Iceberg's — a table
  * written with `pmod(hash(col), N)` directories could not be read back
  * by an Iceberg catalog with partition pruning intact. This expression
  * reproduces the spec exactly (validated against Guava's murmur3_32,
  * which Iceberg itself uses), so `TableSink` emits Iceberg-compatible
  * bucket directories.
  *
  * Why a custom Expression and not a UDF: doGenCode inlines a static
  * call into the generated Java, keeping the surrounding projection in
  * one WholeStageCodegen stage — no boxing, no lambda dispatch, no
  * codegen fence — which is what you want on a 100 TB write path.
  */
case class IcebergBucketHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket_hash does not support type $other")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType => IcebergBucketHash.hashLong(input.asInstanceOf[Int].toLong)
    case DateType    => IcebergBucketHash.hashLong(input.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucketHash.hashLong(input.asInstanceOf[Long])
    case StringType =>
      IcebergBucketHash.hashUtf8(input.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"unsupported: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = IcebergBucketHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c => s"$h.hashLong((long) $c)")
      case LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"$h.hashLong($c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$h.hashUtf8($c)")
      case other => throw new IllegalStateException(s"unsupported: $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketHash =
    copy(child = newChild)
}

object IcebergBucketHash {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593
  private final val Seed = 0

  /** murmur3_x86_32 over an 8-byte little-endian long (Iceberg spec:
    * int/long/date/time/timestamp all hash through this layout).
    */
  def hashLong(v: Long): Int = {
    // two 4-byte little-endian blocks
    var h = Seed
    h = mixH(h, mixK((v & 0xffffffffL).toInt))
    h = mixH(h, mixK((v >>> 32).toInt))
    fmix(h ^ 8)
  }

  /** murmur3_x86_32 over UTF-8 bytes. */
  def hashUtf8(s: UTF8String): Int = hashBytes(s.getBytes)

  def hashBytes(bytes: Array[Byte]): Int = {
    val n = bytes.length
    var h = Seed
    var i = 0
    while (i + 4 <= n) {
      val k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      h = mixH(h, mixK(k))
      i += 4
    }
    var k = 0
    var shift = 0
    while (i < n) { // tail, little-endian accumulation
      k |= (bytes(i) & 0xff) << shift
      shift += 8
      i += 1
    }
    if (shift > 0) h ^= mixK(k)
    fmix(h ^ n)
  }

  @inline private def mixK(k0: Int): Int = {
    var k = k0 * C1
    k = Integer.rotateLeft(k, 15)
    k * C2
  }

  @inline private def mixH(h0: Int, k: Int): Int = {
    var h = h0 ^ k
    h = Integer.rotateLeft(h, 13)
    h * 5 + 0xe6546b64
  }

  @inline private def fmix(h0: Int): Int = {
    var h = h0
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** Column API: Iceberg bucket number in [0, n). */
  def bucket(n: Int, c: Column): Column = {
    require(n > 0, s"bucket count must be positive, got $n")
    val hash = GraftSqlBridge.toColumn(IcebergBucketHash(GraftSqlBridge.toExpression(c)))
    org.apache.spark.sql.functions.pmod(
      hash.bitwiseAND(org.apache.spark.sql.functions.lit(Int.MaxValue)),
      org.apache.spark.sql.functions.lit(n))
  }
}
