package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `array<float>` (SURVEY.md §2.K K4).
  *
  * The composable alternative — `aggregate(zip_with(a, b, * ), 0.0, +)` —
  * allocates an intermediate array and evaluates two lambda closures per
  * element in the interpreter; this expression compiles to a tight
  * primitive loop inside whole-stage codegen, which is what an
  * all-pairs similarity scan needs at 100 TB. Accumulation is
  * left-to-right in double precision — bit-identical to the zip_with
  * form and to a SQL SUM over unnested elements, so oracle hashes are
  * unchanged.
  *
  * Null semantics are EXACTLY those of the composable fold: a null array,
  * mismatched lengths (zip_with null-pads the shorter side, so the fold
  * goes null), or any null element yields null. This bit-for-bit parity is
  * what lets [[graft.plans.DotProductRewrite]] substitute this expression
  * for the fold as a pure optimization.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float> arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch / null element
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: Java forbids shadowing an enclosing local, and Spark's
      // generated methods routinely declare `i` — a literal `int i` here
      // failed janino compilation whenever this expression was inlined
      // into such a method
      val i = ctx.freshName("i")
      s"""
         |int ${ev.value}_n = $a.numElements();
         |if ($b.numElements() != ${ev.value}_n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}_acc = 0.0;
         |  for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = ${ev.value}_acc;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the native functions, the same injection
  * point the reference's engine uses for its Iceberg extensions
  * (`/root/reference/conf/spark-defaults.conf:1`). Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductF(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGramsGenerator].getName, "graft_ngrams"),
      (children: Seq[Expression]) => NGramsGenerator(children(0), children(1))))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}
