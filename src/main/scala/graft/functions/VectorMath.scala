package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for embedding math: dot product and sum of
  * squares over `array<double>` columns, with whole-stage codegen.
  *
  * Why native expressions (§2.12 preference ladder): the built-in
  * higher-order alternatives (`aggregate(zip_with(a, b, *), ...)`) run on
  * the INTERPRETED expression path — per-element lambda dispatch, no
  * codegen — and a Scala UDF adds boxing and a codegen fence on top.
  * `doGenCode` here inlines a tight `for` loop over the unsafe array
  * data into the surrounding generated stage: exactly the code a native
  * engine would emit for a 10^9-pair scoring loop.
  *
  * Evaluation order is a SEQUENTIAL left-to-right fold — bit-identical
  * to the DuckDB oracle's `list_reduce`, with none of the
  * partition-order float nondeterminism of a groupBy-sum formulation.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // degenerate inputs (length mismatch, null elements) yield NULL — the
  // same visible error signal the higher-order `zip_with` form gave —
  // so the result must stay nullable even over non-null array columns
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product expects (array<double>, array<double>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sum of squared elements (the squared L2 norm) of an `array<double>`.
  * A null ELEMENT nulls the result (see [[DotProduct]]).
  */
case class SumSquares(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"sum_squares expects array<double>, got $other")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSquares =
    copy(child = newChild)
}

object VectorMath {
  /** Column surface for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(
      DotProduct(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Column surface for [[SumSquares]]. */
  def sumSquares(v: Column): Column =
    GraftSqlBridge.toColumn(SumSquares(GraftSqlBridge.toExpression(v)))

  /** Euclidean norm via [[SumSquares]]. */
  def l2Norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(sumSquares(v))
}
