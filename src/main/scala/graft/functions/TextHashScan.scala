package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-position k-gram hash scans — the native replacements
  * for the higher-order `transform(sequence(k, len), i => hash(substr))`
  * / `explode(sequence) + groupBy(min)` shapes in the CDC chunkers and
  * rolling fingerprints. Those shapes are correct but pay, per char
  * position: an interpreted lambda evaluation (HOFs don't participate in
  * whole-stage codegen), a `substr` call that re-scans the string from
  * byte 0 to find char offsets (O(position) each, O(len²) per document),
  * and a UTF8String allocation per gram. The natives walk the document
  * ONCE: char-boundary byte offsets are computed incrementally, each
  * gram hashes in place over the original byte buffer (zero copies for
  * xxhash64; one `MessageDigest.update(bytes, off, len)` for md5), and
  * the per-doc result (candidate-boundary array / min hash) is produced
  * without materializing intermediate rows — so the fingerprint loses
  * its explode + shuffle + join entirely.
  *
  * BIT-PARITY CONTRACT (spec-pinned in TextHashScanSpec): both hash
  * modes reproduce the Column-expression values exactly —
  *  - xx mode = `xxhash64(gram)` (XXH64 of the gram's UTF-8 bytes,
  *    seed 42, Spark's fixed default);
  *  - md5 mode = `TextAnalysis.hash60(gram)` =
  *    `conv(substring(md5(gram), 1, 15), 16, 10)` cast long, i.e. the
  *    first 15 hex nibbles of the digest = (first 8 bytes as big-endian
  *    unsigned) >>> 4 — computed from the digest bytes directly, no
  *    hex/conv round-trip.
  * The DuckDB oracles replay the same arithmetic, so oracle parity is
  * untouched.
  */
object TextHashScan {

  /** Spark's fixed seed for the no-seed `xxhash64` function. */
  private val XxSeed = 42L

  /** Byte offset of each char start: offs(i) = start of 1-based char
    * i+1; offs(numChars) = numBytes. One linear walk.
    */
  private[functions] def charStarts(bytes: Array[Byte], from: Int, until: Int): Array[Int] = {
    // count chars first (cheap: one pass over lead bytes)
    var n = 0
    var i = from
    while (i < until) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      n += 1
    }
    val offs = new Array[Int](n + 1)
    var c = 0
    i = from
    while (i < until) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(n) = until
    offs
  }

  private[functions] def xxHash(bytes: Array[Byte], off: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, XxSeed)

  /** hash60 of a byte slice: first 60 bits of the md5 digest as an
    * unsigned big-endian long (== `conv(substring(md5(x),1,15),16,10)`).
    */
  private[functions] def md5Hash60(
      md: MessageDigest, buf: Array[Byte], bytes: Array[Byte], off: Int, len: Int): Long =
    md5First8(md, buf, bytes, off, len) >>> 4

  // one digest + output buffer per thread: expression instances can be
  // shared across an executor's task threads
  private val tlMd5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val tlBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  private[functions] def threadMd5(): MessageDigest = tlMd5.get()
  private[functions] def threadBuf(): Array[Byte] = tlBuf.get()

  /** Column surface: CDC candidate boundaries (ascending char positions
    * i in [k, len) whose trailing k-gram hash ≡ 0 mod divisor).
    */
  def cdcBoundaries(text: Column, k: Int, divisor: Int, md5Mode: Boolean): Column =
    GraftSqlBridge.toColumn(
      CdcBoundaryCandidates(GraftSqlBridge.toExpression(text), k, divisor, md5Mode))

  /** Column surface: min k-gram (char shingle) hash of the document. */
  def minShingleHash(text: Column, k: Int, md5Mode: Boolean): Column =
    GraftSqlBridge.toColumn(
      MinShingleHash(GraftSqlBridge.toExpression(text), k, md5Mode))

  /** Column surface: chunk rows (start char, length, content key) from
    * a per-doc ascending boundary array — one O(len) walk.
    */
  def chunkSlices(text: Column, bounds: Column, md5HexMode: Boolean): Column =
    GraftSqlBridge.toColumn(CdcChunkSlices(
      GraftSqlBridge.toExpression(text), GraftSqlBridge.toExpression(bounds), md5HexMode))

  /** Column surface: first `nibbles` hex digits of md5(c) as an unsigned
    * long — bit-identical to `conv(substring(md5(c), 1, nibbles), 16,
    * 10).cast("long")` without the four string round-trips that shape
    * pays per row (32-char hex render, substring slice, conv's hex
    * parse + DECIMAL STRING render, cast's decimal parse).
    */
  def md5Prefix(c: Column, nibbles: Int): Column =
    GraftSqlBridge.toColumn(Md5PrefixBits(GraftSqlBridge.toExpression(c), nibbles))

  /** First 8 digest bytes as an unsigned big-endian long. */
  private[functions] def md5First8(
      md: MessageDigest, buf: Array[Byte], bytes: Array[Byte], off: Int, len: Int): Long = {
    md.update(bytes, off, len)
    md.digest(buf, 0, 16): Unit // writes the digest and resets
    ((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
      ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
      ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
      ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of an md5 digest over a byte slice — bit-identical
    * to `md5(substr(...))`'s hex string, no substring materialization.
    */
  private[functions] def md5Hex(
      md: MessageDigest, buf: Array[Byte], bytes: Array[Byte], off: Int, len: Int): UTF8String = {
    md.update(bytes, off, len)
    md.digest(buf, 0, 16): Unit
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((buf(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(buf(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Chunk rows of one document, given its ascending CHAR boundary array
  * (0 and len sentinels included): element j =
  * (s = b(j), l = b(j+1) - b(j), k = key of chars [s, s+l)), where the
  * key is `md5(substr(text, s+1, l))`'s hex string (md5HexMode) or
  * `xxhash64(substr(text, s+1, l))` — bit parity with the former
  * per-chunk `chunkKey(_t.substr(s + 1, l))` projection, spec-pinned.
  * That shape re-walked the text from byte 0 to locate each chunk's
  * char offset (O(start) per chunk, Σ = O(len²/expected-chunk-len) per
  * document); this walks the char offsets ONCE and hashes each chunk
  * in place over the original byte buffer, so the whole chunker is
  * O(len·k) end to end. A null document or boundary array yields null
  * (no chunk rows after posexplode); fixtures contain no null
  * documents, and the former shape's single degenerate
  * (null-key, null-len) row for one was an accident of `concat` null
  * propagation, not a contract.
  */
case class CdcChunkSlices(left: Expression, right: Expression, md5HexMode: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("l", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("k",
        if (md5HexMode) StringType else LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"chunk_slices expects (string, array<int>), got ($l, $r)")
    }

  override protected def nullSafeEval(textIn: Any, boundsIn: Any): Any = {
    val s = textIn.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val offs = TextHashScan.charStarts(bytes, 0, bytes.length)
    val len = offs.length - 1 // numChars
    val b = boundsIn.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = b.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val md = if (md5HexMode) TextHashScan.threadMd5() else null
    val buf = if (md5HexMode) TextHashScan.threadBuf() else null
    val out = new Array[Any](m - 1)
    var j = 0
    while (j < m - 1) {
      val c0 = math.min(math.max(b.getInt(j), 0), len)
      val c1 = math.min(math.max(b.getInt(j + 1), c0), len)
      val from = offs(c0)
      val until = offs(c1)
      val key: Any =
        if (md5HexMode) TextHashScan.md5Hex(md, buf, bytes, from, until - from)
        else TextHashScan.xxHash(bytes, from, until - from)
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        b.getInt(j), b.getInt(j + 1) - b.getInt(j), key)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunkSlices", this, classOf[CdcChunkSlices].getName)
    nullSafeCodeGen(ctx, ev, (t, bnds) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalChunks($t, $bnds);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def evalChunks(t: UTF8String, b: org.apache.spark.sql.catalyst.util.ArrayData): AnyRef =
    nullSafeEval(t, b).asInstanceOf[AnyRef]

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CdcChunkSlices =
    copy(left = newLeft, right = newRight)
}

/** Candidate CDC boundary positions of a document: every 1-based char
  * position i with k <= i < len whose trailing k-gram (chars
  * [i-k+1, i]) hashes ≡ 0 (mod divisor) — exactly the surviving
  * elements of `filter(transform(sequence(k, len), i =>
  * when(hash(substr(i-(k-1), k)) % divisor === 0, i)), x => x.isNotNull
  * && x < len)`, in the same ascending order. Returns an empty array
  * when len < k (no full gram exists); null input yields null (callers
  * coalesce, matching the HOF shape's `when`-otherwise empty).
  */
case class CdcBoundaryCandidates(child: Expression, k: Int, divisor: Int, md5Mode: Boolean)
    extends UnaryExpression {
  require(k > 0 && divisor > 0, s"need k > 0 and divisor > 0, got $k/$divisor")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"cdc_boundaries expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val offs = TextHashScan.charStarts(bytes, 0, bytes.length)
    val len = offs.length - 1 // numChars
    if (len < k) return new GenericArrayData(Array.empty[Int])
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val md = if (md5Mode) TextHashScan.threadMd5() else null
    val buf = if (md5Mode) TextHashScan.threadBuf() else null
    var i = k // 1-based char position of the gram's LAST char
    while (i < len) { // i == len is always filtered (end sentinel)
      val from = offs(i - k)
      val until = offs(i)
      val h =
        if (md5Mode) TextHashScan.md5Hash60(md, buf, bytes, from, until - from)
        else TextHashScan.xxHash(bytes, from, until - from)
      if (h % divisor == 0) out += i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // the per-row work IS the loop; codegen would only inline the row-level
  // call, so delegate to eval (keeps the expression inside codegen'd
  // projects without a Janino blowup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcBoundaries", this, classOf[CdcBoundaryCandidates].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalGram($s);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def evalGram(s: UTF8String): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaryCandidates =
    copy(child = newChild)
}

/** Minimum k-char-gram hash of a document — the rolling min-shingle
  * fingerprint as ONE scalar: min over i in [1, max(len-k+1, 1)] of
  * hash(substr(i, k)) (the i = 1 window of a shorter-than-k document is
  * the whole document, `substr` truncation semantics). Replaces the
  * explode(sequence) + groupBy(min) + join shape with a map-side
  * column — same values, no shuffle.
  */
case class MinShingleHash(child: Expression, k: Int, md5Mode: Boolean)
    extends UnaryExpression {
  require(k > 0, s"need k > 0, got $k")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"min_shingle_hash expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val offs = TextHashScan.charStarts(bytes, 0, bytes.length)
    val len = offs.length - 1
    val n = math.max(len - (k - 1), 1)
    val md = if (md5Mode) TextHashScan.threadMd5() else null
    val buf = if (md5Mode) TextHashScan.threadBuf() else null
    var minH = Long.MaxValue
    var i0 = 0 // 0-based start char
    while (i0 < n) {
      val from = offs(i0)
      val until = offs(math.min(i0 + k, len))
      val h =
        if (md5Mode) TextHashScan.md5Hash60(md, buf, bytes, from, until - from)
        else TextHashScan.xxHash(bytes, from, until - from)
      if (h < minH) minH = h
      i0 += 1
    }
    minH
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minShingle", this, classOf[MinShingleHash].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.evalMin($s);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def evalMin(s: UTF8String): Long = nullSafeEval(s).asInstanceOf[Long]

  override protected def withNewChildInternal(newChild: Expression): MinShingleHash =
    copy(child = newChild)
}

/** First `nibbles` hex digits of md5 as an unsigned long — the
  * cross-engine-stable hash behind minhash signatures, simhash, and
  * the deterministic samplers. Bit-identical (spec-pinned in
  * TextHashScanSpec) to `conv(substring(md5(c), 1, nibbles), 16,
  * 10).cast("long")`, which paid per row: a 32-char hex render, a
  * substring slice, conv's hex parse PLUS decimal-string render, and
  * cast's decimal parse. Nullable like Conv (null input -> null), so
  * consumer schemas do not move.
  */
case class Md5PrefixBits(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15,
    s"md5_prefix needs 1..15 hex digits (60 bits max in a positive long), got $nibbles")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // matches Conv's unconditional nullability

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"md5_prefix expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(hashPrefix(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Prefix", this, classOf[Md5PrefixBits].getName)
    // primitive-long call — no boxing on the codegen'd per-row path
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.hashPrefix($s);")
  }

  /** Codegen entry point, primitive end to end. */
  def hashPrefix(s: UTF8String): Long = {
    val b = s.getBytes
    TextHashScan.md5First8(TextHashScan.threadMd5(), TextHashScan.threadBuf(),
      b, 0, b.length) >>> (64 - 4 * nibbles)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixBits =
    copy(child = newChild)
}
