package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-valued function (UDTF, SURVEY.md §2.K K3):
  * `graft_ngrams(tokens array<string>, n int)` generates one output row per
  * word n-gram — `(pos int, ngram string)` — the row-generating counterpart
  * of the scalar/aggregate extension points ([[DotProductF]], GeoMean).
  *
  * A Catalyst `Generator` beats the composable alternative
  * (`posexplode(transform(sequence(...), i -> ...))`) by materializing no
  * intermediate array-of-ngrams per row: each n-gram is built and emitted
  * lazily from the token array. For a 100 TB corpus the explosion is a flat
  * map — embarrassingly parallel, no shuffle — and the per-row working set
  * stays O(n-gram), not O(document). Executes through `GenerateExec`'s
  * non-codegen path (like every non-`explode` generator); the parent scan
  * stage still whole-stage-codegens.
  *
  * Null/short inputs produce zero rows (matching `explode` of an empty
  * array); null tokens inside the array are skipped at window granularity
  * (any window containing a null emits nothing, keeping output strings
  * non-null).
  */
case class NGramsGenerator(tokens: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, n)
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = (tokens.dataType, n.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (t, i) => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams requires (array<string>, int), got ${t.sql} and ${i.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    val kv = n.eval(input)
    if (arr == null || kv == null) Iterator.empty
    else {
      val k = kv.asInstanceOf[Int]
      val len = arr.numElements()
      if (k <= 0 || len < k) Iterator.empty
      else Iterator.range(0, len - k + 1).flatMap { i =>
        val window = Array.tabulate(k)(j =>
          if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j))
        if (window.contains(null)) None
        else Some(InternalRow(i, UTF8String.concatWs(space, window: _*)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGenerator =
    copy(tokens = newChildren(0), n = newChildren(1))
}
