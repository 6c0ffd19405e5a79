package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.DotProductF

/** Optimizer extension (SURVEY.md §4): rewrites the composable dot-product
  * fold
  *
  *   `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *              0.0D, (acc, v) -> acc + v)`
  *
  * over two `array<float>` columns into the whole-stage-codegen'd
  * [[DotProductF]] — so a user who writes the idiomatic higher-order-function
  * SQL gets the native expression automatically (higher-order functions are
  * `CodegenFallback`: each element round-trips through lambda-variable
  * boxing, vs one tight primitive loop after the rewrite).
  *
  * Strictly semantics-preserving: [[DotProductF]] reproduces the fold's
  * null behavior exactly (null array / mismatched lengths / null element →
  * null), double multiplication and addition are commutative, and ANSI mode
  * adds no error cases for doubles — so operand order is accepted both ways
  * and the rewrite changes no observable result, only the execution path.
  * Registered via `SparkSessionExtensions.injectOptimizerRule` (the same
  * hook the reference's Iceberg extensions use); excludable like any rule
  * through `spark.sql.optimizer.excludedRules`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def castToDoubleOfVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case nv: NamedLambdaVariable => Some(nv)
        case _ => None
      }
    case _ => None
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg: ArrayAggregate => tryRewrite(agg).getOrElse(agg)
  }

  private def tryRewrite(agg: ArrayAggregate): Option[Expression] = agg.argument match {
    case zw: ZipWith if isFloatArray(zw.left) && isFloatArray(zw.right) =>
      (zw.function, agg.zero, agg.merge, agg.finish) match {
        case (LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _),
              Literal(0.0, DoubleType),
              LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
              LambdaFunction(finishBody, Seq(fv: NamedLambdaVariable), _))
            if sameVar(finishBody, fv) =>
          val mulOk = (castToDoubleOfVar(m.left), castToDoubleOfVar(m.right)) match {
            case (Some(p), Some(q)) =>
              (p.exprId == x.exprId && q.exprId == y.exprId) ||
                (p.exprId == y.exprId && q.exprId == x.exprId)
            case _ => false
          }
          val addOk =
            (sameVar(a.left, acc) && sameVar(a.right, el)) ||
              (sameVar(a.left, el) && sameVar(a.right, acc))
          if (mulOk && addOk) Some(DotProductF(zw.left, zw.right)) else None
        case _ => None
      }
    case _ => None
  }
}
