package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass replacements for the two 72-term expression
  * chains in the perceptual-hash dedup operator
  * ([[graft.multimodal.Multimodal.phashDedup]]):
  *
  *  - the dHash BIT STRING, formerly
  *    `concat((1 to 72).map(i => when(conv(hex(substring(payload,
  *    i+1, 1)), 16, 10) > conv(hex(substring(payload, i, 1)), 16, 10),
  *    "1").otherwise("0")))` — per BIT a binary substring slice, a hex
  *    string render, and a base-16 reparse, ~432 expression nodes per
  *    row and an analysis/codegen tree to match;
  *  - the HAMMING DISTANCE between two bit strings, formerly
  *    `(1 to 72).map(i => when(substring(a, i, 1) =!= substring(b, i,
  *    1), 1).otherwise(0)).reduce(_ + _)` — 144 substring
  *    materializations per candidate pair.
  *
  * Both natives walk the input bytes once. VALUE-PARITY CONTRACTS
  * (spec-pinned in PhashScanSpec):
  *
  *  - [[PhashBits]]: char j (0-based, j in [0, n-1]) is '1' iff bytes
  *    j and j+1 BOTH exist and unsigned(byte j+1) > unsigned(byte j),
  *    else '0' — matching the `when` chain, where an out-of-range
  *    `substring` yields an empty slice, `conv` of it yields null, and
  *    a null comparison falls to the '0' branch.
  *  - [[CharDiffCount]]: positions 1..n compared as 1-char substrings —
  *    two missing chars (both strings exhausted) are EQUAL (the `""
  *    =!= ""` branch), one missing differs, otherwise code-point
  *    bytes compare. Inputs here are always n-char ASCII bit strings,
  *    but the walk advances by UTF-8 char widths so the contract holds
  *    for any input.
  */
object PhashScan {

  def phashBits(payload: Column, n: Int): Column =
    GraftSqlBridge.toColumn(PhashBits(GraftSqlBridge.toExpression(payload), n))

  def charDiffCount(a: Column, b: Column, n: Int): Column =
    GraftSqlBridge.toColumn(
      CharDiffCount(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b), n))
}

/** dHash bit string of a binary payload: n chars, char j = '1' iff
  * unsigned(bytes[j+1]) > unsigned(bytes[j]) with both in range, else
  * '0' (null input yields null).
  */
case class PhashBits(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"need n > 0, got $n")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"phash_bits expects binary, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Byte](n)
    var j = 0
    while (j < n) {
      out(j) =
        if (j + 1 < bytes.length && (bytes(j + 1) & 0xff) > (bytes(j) & 0xff)) '1'
        else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phashBits", this, classOf[PhashBits].getName)
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.evalBits($b);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def evalBits(b: Array[Byte]): AnyRef = nullSafeEval(b).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): PhashBits =
    copy(child = newChild)
}

/** Count of positions 1..n where the 1-char substrings of two strings
  * differ (missing-vs-missing equal, missing-vs-present different);
  * null if either input is null.
  */
case class CharDiffCount(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n > 0, s"need n > 0, got $n")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"char_diff_count expects (string, string), got ($l, $r)")
    }

  // UTF-8 char width from the leading byte (same table Spark's
  // UTF8String uses: ASCII 1, continuation-safe for well-formed input)
  private def charWidth(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1 else if (u < 0xe0) 2 else if (u < 0xf0) 3 else 4
  }

  override protected def nullSafeEval(aIn: Any, bIn: Any): Any = {
    val a = aIn.asInstanceOf[UTF8String].getBytes
    val b = bIn.asInstanceOf[UTF8String].getBytes
    var ia = 0
    var ib = 0
    var diff = 0
    var j = 0
    while (j < n) {
      val hasA = ia < a.length
      val hasB = ib < b.length
      if (hasA && hasB) {
        val wa = charWidth(a(ia))
        val wb = charWidth(b(ib))
        var same = wa == wb
        var k = 0
        while (same && k < wa) {
          if (a(ia + k) != b(ib + k)) same = false
          k += 1
        }
        if (!same) diff += 1
        ia += wa
        ib += wb
      } else if (hasA != hasB) {
        diff += 1
        if (hasA) ia += charWidth(a(ia))
        if (hasB) ib += charWidth(b(ib))
      }
      j += 1
    }
    diff
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charDiff", this, classOf[CharDiffCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.evalDiff($a, $b);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def evalDiff(a: UTF8String, b: UTF8String): Int =
    nullSafeEval(a, b).asInstanceOf[Int]

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharDiffCount =
    copy(left = newLeft, right = newRight)
}
