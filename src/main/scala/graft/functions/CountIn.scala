package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a FIXED string set — the
  * stopword/marker-hit counter of the text-quality and language-ID
  * operators, as a native codegen expression.
  *
  * Why not `size(filter(arr, t => array_contains(lit_array, t)))`: that
  * form is a higher-order lambda — interpreted per ELEMENT, and Catalyst
  * inlines any shared input subtree (the tokenizer) into every lambda
  * reference, so a filter stage with six marker lists re-tokenizes each
  * row six times (measured ~6 s for the corpus_clean prefix at sf0.1).
  * This expression is a plain loop over the array with an O(1) hash-set
  * probe, inside whole-stage codegen, and the tokenize feeding it is
  * CSE'd like any other deterministic subtree (~4x on that stage).
  *
  * Semantics match the lambda form exactly: every (non-null) element
  * occurrence in the set counts — duplicates count each time.
  */
case class CountIn(child: Expression, values: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"count_in expects array<string>, got $other")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}

object CountIn {
  /** Column surface. */
  def countIn(arr: Column, values: Seq[String]): Column =
    GraftSqlBridge.toColumn(CountIn(GraftSqlBridge.toExpression(arr), values))
}
