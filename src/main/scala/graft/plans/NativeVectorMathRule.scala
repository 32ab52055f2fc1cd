package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted higher-order dot-product
  * idiom
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, e) -> acc + e) }}}
  * into the native codegen'd [[graft.functions.DotProduct]].
  *
  * The HOF form runs on the interpreted expression path (per-element
  * lambda dispatch — measured ~9x slower than the native expression on
  * the pair-scoring loop, VectorMath.scala) but is what users naturally
  * write; with this rule they get the tight loop for free. Semantics
  * are identical, including the degenerate signals: a length mismatch
  * or null element yields NULL in both forms, and both fold
  * sequentially left-to-right (same float rounding).
  *
  * Deliberately conservative: fires only on exactly this shape over
  * `array<double>` inputs with a 0.0 zero and an identity (or absent)
  * finish lambda.
  */
object NativeVectorMathRule extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (x, y) -> x * y over exactly the lambda's own two variables. */
  private def isElementwiseProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x, y), _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  /** (acc, e) -> acc + e in either operand order. */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), Seq(acc, e), _) =>
      (sameVar(l, acc) && sameVar(r, e)) || (sameVar(l, e) && sameVar(r, acc))
    case _ => false
  }

  /** finish is id -> id (the default when the 3-arg form is used). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v), _) => sameVar(body, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, product), Literal(0.0, DoubleType), merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isElementwiseProduct(product) && isSum(merge) && isIdentity(finish) =>
        DotProduct(a, b)
    }
}
