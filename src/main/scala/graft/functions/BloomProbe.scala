package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Map-side bloom membership test over a string column, as ONE native
  * codegen expression: the filter rides along as a single reference
  * object (serialized once per stage with the plan, NOT per row/task),
  * so probing costs a few hash ops per row and the expression's size is
  * independent of the filter's bit width.
  *
  * The sidecar-probe primitive of the streaming ingest-dedup gate
  * ([[graft.streaming.Streaming.startDedupIngest]]): rows whose key
  * cannot be in the persisted hash index (bloom says no — bloom filters
  * have NO false negatives) skip the exact index anti-join entirely;
  * false POSITIVES fall through to it, so the bloom only ever saves
  * work, never admits a duplicate.
  *
  * Probe/build symmetry: builders insert with `putString`, which hashes
  * the UTF-8 bytes — `mightContainBinary(utf8Bytes)` here is the same
  * computation without materializing a java.lang.String per row.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects string, got $other")
    }

  override protected def nullSafeEval(s: Any): Any =
    bloom.mightContainBinary(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $bf.mightContainBinary($s.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column surface. */
  def bloomMightContain(c: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.toColumn(
      BloomMightContain(GraftSqlBridge.toExpression(c), bloom))
}
