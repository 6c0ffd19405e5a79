package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the graft_ngrams table function (UDTF, §2.K K3). */
class NGramsGeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def ngrams(toks: Seq[String], n: Int): Seq[(Int, String)] =
    Seq(Tuple1(toks)).toDF("t")
      .selectExpr(s"graft_ngrams(t, $n) AS (pos, ngram)")
      .as[(Int, String)].collect().toSeq

  test("emits one row per sliding window with 0-based positions") {
    assert(ngrams(Seq("a", "b", "c", "d"), 2)
      === Seq((0, "a b"), (1, "b c"), (2, "c d")))
    assert(ngrams(Seq("a", "b", "c", "d"), 3) === Seq((0, "a b c"), (1, "b c d")))
  }

  test("short, empty, and n<=0 inputs produce zero rows") {
    assert(ngrams(Seq("a", "b"), 3).isEmpty)
    assert(ngrams(Seq.empty, 1).isEmpty)
    assert(ngrams(Seq("a"), 0).isEmpty)
  }

  test("null array produces zero rows; windows containing null are skipped") {
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .selectExpr("graft_ngrams(t, 2) AS (pos, ngram)").count()
    assert(nullArr === 0)
    assert(ngrams(Seq("a", null, "c", "d"), 2) === Seq((2, "c d")))
  }

  test("agrees with the composable posexplode(transform(sequence)) form") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')").as("toks"))
    val viaUdtf = docs.selectExpr("doc_id", "graft_ngrams(toks, 3) AS (pos, ngram)")
    val viaCompose = docs
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', slice(toks, i + 1, 3)))")).as(Seq("pos", "ngram")))
    assert(viaUdtf.exceptAll(viaCompose).count() === 0)
    assert(viaCompose.exceptAll(viaUdtf).count() === 0)
    assert(viaUdtf.count() > 0)
  }

  test("rejects wrong argument types at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(1)).toDF("t").selectExpr("graft_ngrams(t, 2)").collect()
    }
  }
}
