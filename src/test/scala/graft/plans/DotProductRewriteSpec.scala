package graft.plans

import graft.SparkSpec
import graft.functions.DotProductF
import org.apache.spark.sql.functions._

/** The injected optimizer rule: the composable fold becomes the native
  * expression, results and null semantics are unchanged, and the rule is
  * excludable like any stock optimization.
  */
class DotProductRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val foldSql =
    "aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0D, (acc, v) -> acc + v)"

  test("the fold is rewritten to graft_dot in the optimized plan") {
    // parquet-backed input: a pure-literal relation would be evaluated whole
    // by ConvertToLocalRelation and leave no expressions to inspect
    val df = graft.Tables.embeddings(spark, sfDir)
      .withColumn("a", col("embedding")).withColumn("b", col("embedding"))
      .selectExpr("vec_id", s"$foldSql AS dot")
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[DotProductF])))
    // dot(v, v) = |v|² > 0 for our dense embeddings
    assert(df.orderBy("vec_id").select("dot").as[Double].head() > 0.0)
  }

  test("rewritten and excluded-rule results agree, including null cases") {
    val withNulls = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)),
        |  (array(1.0F, 2.0F),       array(1.0F, 2.0F, 3.0F)),
        |  (array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 1.0F)),
        |  (CAST(NULL AS ARRAY<FLOAT>), array(1.0F))
        |AS t(a, b)""".stripMargin)
    withNulls.createOrReplaceTempView("dot_pairs")
    val q = s"SELECT $foldSql AS dot FROM dot_pairs"
    val rewritten = spark.sql(q).as[Option[Double]].collect().toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", DotProductRewrite.ruleName)
    try {
      val plain = spark.sql(q)
      assert(!plain.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[DotProductF])))
      assert(plain.as[Option[Double]].collect().toSeq === rewritten)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert(rewritten === Seq(Some(32.0), None, None, None))
  }

  test("non-matching folds are left alone") {
    // different zero, a sum-of-squares fold, and an int-array fold
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val other = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 1.0D, (acc, v) -> acc + v) AS d1",
      "aggregate(zip_with(a, a, (x, y) -> double(x) + double(y)), 0.0D, (acc, v) -> acc + v) AS d2")
    assert(!other.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProductF])))
    assert(other.as[(Double, Double)].collect().head === ((12.0, 6.0)))
  }
}
