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

/** Native nearest-centroid assignment over `array<float>` against a
  * CONSTANT k×dim centroid table (the IVF cell-assignment hot loop).
  *
  * The composable form — `transform(centsLit, c -> 1.0 - dot/(…))` +
  * `array_position(array_min)` — evaluates k×dim lambda closures per
  * ROW in the interpreter (higher-order functions never enter
  * whole-stage codegen), which at the √N-sized k = ⌈√N⌉ makes the
  * index ENCODE scan O(N·√N·dim) interpreted allocations — measured
  * minutes at sf1 (k=200, 40k rows). This expression caches the
  * centroid table (the left child must be foldable — it is always a
  * literal) as primitive arrays with their norms and assigns each row
  * in a tight double loop invoked from generated code.
  *
  * Arithmetic is BIT-IDENTICAL to the composable form: the query norm
  * and each dot accumulate left-to-right in double precision, the
  * distance is `1.0 - dt / (sqrt(qn) * cn)` with cn = the same
  * index-ordered `sqrt(Σc²)`, and strict `<` keeps the FIRST (lowest)
  * cell on exact ties — `array_position(array_min)` semantics. The
  * 1-based cell id matches the IVF family throughout. A zero-norm
  * embedding fails loudly with the same message as the fallback's
  * `raise_error` guard. */
case class NearestCellF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(FloatType, _), _), ArrayType(FloatType, _))
          if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_nearest_cell requires (foldable array<array<float>>, " +
          s"array<float>), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = right.nullable
  override def prettyName: String = "graft_nearest_cell"

  @transient private lazy val centArrays: Array[Array[Float]] = {
    val ad = left.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(j => ad.getArray(j).toFloatArray())
  }
  @transient private lazy val centNorms: Array[Double] =
    centArrays.map { c =>
      var acc = 0.0; var p = 0
      while (p < c.length) { val x = c(p).toDouble; acc += x * x; p += 1 }
      math.sqrt(acc)
    }

  override def nullSafeEval(cs: Any, e: Any): Any =
    evalVec(e.asInstanceOf[ArrayData])

  def evalVec(v: ArrayData): Long = {
    val dim = v.numElements()
    var qn = 0.0
    var p = 0
    while (p < dim) {
      // a null ELEMENT has no cosine contribution — scoring it as
      // 0/garbage would silently assign a wrong cell (the row lands in
      // an arbitrary inverted list and the right probes never find it),
      // so fail the encode scan loudly, like the zero-norm guard below
      // and like the composable fallback's exists(isnull) branch
      if (v.isNullAt(p)) throw new IllegalArgumentException(
        "null-element embedding cannot be cell-assigned (vec_id row " +
          "would be silently mis-indexed); drop or re-embed it first")
      val x = v.getFloat(p).toDouble; qn += x * x; p += 1
    }
    if (qn == 0.0) throw new IllegalArgumentException(
      "zero-norm embedding cannot be cell-assigned (vec_id row " +
        "would become unsearchable); drop or re-embed it first")
    val sq = math.sqrt(qn)
    var bestD = Double.MaxValue
    var best = 0
    var j = 0
    while (j < centArrays.length) {
      val c = centArrays(j)
      require(c.length == dim,
        s"embedding dim $dim != centroid dim ${c.length}")
      var dt = 0.0
      p = 0
      while (p < dim) { dt += v.getFloat(p).toDouble * c(p); p += 1 }
      val d = 1.0 - dt / (sq * centNorms(j))
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best + 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this,
      classOf[NearestCellF].getName)
    nullSafeCodeGen(ctx, ev, (_, e) => s"${ev.value} = $ref.evalVec($e);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellF =
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
      new FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCellF].getName, "graft_nearest_cell"),
      (children: Seq[Expression]) => NearestCellF(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGramsGenerator].getName, "graft_ngrams"),
      (children: Seq[Expression]) => NGramsGenerator(children(0), children(1))))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}
