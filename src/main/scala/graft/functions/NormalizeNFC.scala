package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the first
  * cleaning step of a multi-source text pipeline: scraped corpora mix
  * composed and decomposed forms of the same grapheme ("é" vs
  * "e"+U+0301), which breaks exact dedup hashes, tokenizer merges and
  * equality joins on text keys unless every document is canonicalized
  * first. (The reference's quality layer assumes canonical text;
  * `quality/runner.py` checks operate on whatever bytes arrive.)
  *
  * Why an expression and not a UDF: the normalize call sits inside
  * whole-stage codegen like any built-in (no serialization boundary, no
  * Row boxing), and `Normalizer.isNormalized` gives a cheap
  * already-canonical fast path — ASCII and most real text return the
  * INPUT UTF8String unchanged with zero allocation beyond the check.
  * Scale shape: map-side, per-row, no shuffle; 100 TB of text
  * normalizes at scan speed.
  *
  * Parity: java.text.Normalizer implements standard Unicode NFC — the
  * same algorithm DuckDB's `nfc_normalize` implements, so results are
  * bit-identical cross-engine (oracle-checked).
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"normalize_nfc expects string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    NormalizeNFC.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNFC.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}

object NormalizeNFC {

  /** NFC-normalize one UTF8String; returns the INPUT instance when the
    * text is already canonical. Pure-ASCII rows (the overwhelmingly
    * common case) short-circuit on a byte scan without even decoding to
    * String; non-ASCII rows pay `isNormalized` (quick check) and only
    * genuinely decomposed text re-encodes. Static so generated code can
    * call it directly.
    */
  def nfc(u: UTF8String): UTF8String = {
    if (u.isFullAscii) return u // ASCII is NFC by construction
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** Column surface. */
  def normalizeNfc(c: Column): Column =
    GraftSqlBridge.toColumn(NormalizeNFC(GraftSqlBridge.toExpression(c)))
}
