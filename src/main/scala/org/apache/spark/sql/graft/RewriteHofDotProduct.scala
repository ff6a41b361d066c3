package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the natural higher-order dot-product
  * formulation
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, el) -> acc + el)
  *
  * into the codegen'd [[DotProduct]] expression. The HOF form is
  * CodegenFallback — interpreted lambda dispatch per element plus an
  * intermediate array per row — which is the dominant cost when the
  * expression sits inside an all-pairs or top-k similarity join. The
  * rewrite keeps the declarative spelling users reach for first and
  * gives them the tight fused loop.
  *
  * Semantics: the rewrite always emits [[DotProductSafe]], which
  * reproduces the HOF form's behavior exactly — any null element or a
  * LENGTH MISMATCH nulls the result. Element non-nullability
  * (containsNull=false, e.g. collect_list of a non-nullable column)
  * does NOT imply equal lengths, so the unchecked [[DotProduct]] would
  * silently turn the HOF form's NULL into a partial sum over min(len);
  * DotProductSafe elides the per-slot null test at codegen time when
  * both element types are provably non-null, so the only residual cost
  * on that branch is one length comparison per row. The fully unchecked
  * [[DotProduct]] is reserved for the engine's own call sites, where
  * embeddings are contract-non-null and equal-dimension.
  */
/** Column <-> Expression bridge for code outside the sql package (the
  * converters are private[sql]; this namespace trick is the same one
  * [[DotProduct]] documents).
  */
object ColumnBridge {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  /** Eagerly converts the Column's node tree to catalyst expressions
    * (any UnresolvedFunction nodes inside are then resolved by the
    * analyzer's normal fixed point). ExpressionUtils.expression would
    * instead wrap the tree in a lazy Unevaluable leaf the analyzer
    * never descends into — fine inside a DataFrame transform, fatal in
    * a FunctionRegistry builder.
    */
  def toExpression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}

object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVarPair(
      e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean = (e1, e2) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
      Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
    case _ => false
  }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(m1, m2, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(s1, s2, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
      if isVarPair(m1, m2, x, y) && isVarPair(s1, s2, acc, el) &&
        fin.exprId == facc.exprId && doubleArray(a) && doubleArray(b) =>
      DotProductSafe(a, b)
  }
}
