package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram assembler — the native replacement for the
  * higher-order `transform(sequence(0, size - n), j =>
  * array_join(slice(toks, j + 1, n), " "))` shape behind the shingle
  * postings / positional-gram views. That shape is correct but pays,
  * per gram position: an interpreted lambda evaluation (HOFs don't
  * participate in whole-stage codegen), a `slice` that allocates an
  * n-element intermediate array, and `array_join`'s generic
  * StringBuilder append loop. The native walks the token array ONCE,
  * assembling each gram with a single exact-size byte-buffer copy of
  * its n tokens — no lambda dispatch, no intermediate array, no
  * builder growth — and is itself embeddable in whole-stage codegen'd
  * projects.
  *
  * VALUE-PARITY CONTRACT (spec-pinned in WordGramScanSpec): output ==
  * `transform(sequence(0, size(toks) - n), j =>
  * array_join(slice(toks, j + 1, n), " "))` for size(toks) >= n,
  * empty array for shorter inputs (the caller's `when` guard, folded
  * in), null for null input. Null tokens are skipped exactly as
  * `array_join` with no null replacement skips them (no separator is
  * emitted for a skipped element); `split` never produces null tokens,
  * so this branch is unreachable from the production tokenizer but the
  * expression is total anyway.
  */
object WordGramScan {

  /** Column surface: all `n`-token space-joined grams of a token array,
    * in order (gram j starts at 0-based token j).
    */
  def wordGrams(tokens: Column, n: Int): Column =
    GraftSqlBridge.toColumn(WordNGrams(GraftSqlBridge.toExpression(tokens), n))

  /** Column surface: all adjacent token pairs as `struct<prev, tok>`,
    * in order (pair j = (tokens[j], tokens[j+1])).
    */
  def wordPairs(tokens: Column): Column =
    GraftSqlBridge.toColumn(WordPairs(GraftSqlBridge.toExpression(tokens)))
}

/** All adjacent token pairs of a token array: element j =
  * (tokens[j], tokens[j+1]), j in [0, size - 2]; empty array when
  * size < 2; null input yields null. Value-identical (spec-pinned in
  * WordGramScanSpec) to the zip-of-shifted-slices shape
  * `zip_with(slice(toks, 1, sz-1), slice(toks, 2, sz-1),
  * (p, w) => struct(p, w))` guarded by `size >= 2` — which paid an
  * interpreted lambda call plus two slice copies per row; this is one
  * walk of the array, embeddable in whole-stage codegen'd projects.
  */
case class WordPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("prev", StringType),
      org.apache.spark.sql.types.StructField("tok", StringType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"word_pairs expects array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](sz - 1)
    var j = 0
    while (j < sz - 1) {
      out(j) = org.apache.spark.sql.catalyst.InternalRow(toks(j), toks(j + 1))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPairs", this, classOf[WordPairs].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalPairs($s);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def evalPairs(s: ArrayData): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): WordPairs =
    copy(child = newChild)
}

/** All n-token space-joined grams of a token array: element j =
  * tokens[j..j+n-1] joined by a single space, j in [0, size - n];
  * empty array when size < n; null input yields null (posexplode
  * consumers treat the two identically — zero rows emitted).
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"need n > 0, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"word_ngrams expects array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    // one UTF8String fetch per token (not per (gram, token) pair)
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](sz - n + 1)
    var j = 0
    while (j <= sz - n) {
      // exact output size first: sum of non-null token bytes + one
      // separator between consecutive NON-NULL tokens (array_join with
      // no null replacement emits nothing — not even a separator — for
      // a null element)
      var bytes = 0
      var present = 0
      var t = 0
      while (t < n) {
        val u = toks(j + t)
        if (u != null) { bytes += u.numBytes; present += 1 }
        t += 1
      }
      val buf = new Array[Byte](bytes + math.max(present - 1, 0))
      var off = 0
      var emitted = 0
      t = 0
      while (t < n) {
        val u = toks(j + t)
        if (u != null) {
          if (emitted > 0) { buf(off) = ' '; off += 1 }
          u.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += u.numBytes
          emitted += 1
        }
        t += 1
      }
      out(j) = UTF8String.fromBytes(buf)
      j += 1
    }
    new GenericArrayData(out)
  }

  // the per-row work IS the loop; codegen would only inline the
  // row-level call, so delegate to eval (same pattern as TextHashScan —
  // keeps the expression inside codegen'd projects without a Janino
  // blowup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNGrams", this, classOf[WordNGrams].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalGrams($s);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def evalGrams(s: ArrayData): AnyRef = nullSafeEval(s).asInstanceOf[AnyRef]

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
