package graft.sql

import graft.SparkSpec

/** SQL entry + BI shims (SURVEY.md §2.I, §2.C C4). */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("rewrite: SHOW CREATE VIEW → SHOW CREATE TABLE, everything else untouched") {
    assert(GraftSql.rewrite("SHOW CREATE VIEW ns.v") === "SHOW CREATE TABLE ns.v")
    assert(GraftSql.rewrite("  show create view v2") === "SHOW CREATE TABLE v2")
    assert(GraftSql.rewrite("SELECT 1") === "SELECT 1")
    assert(GraftSql.rewrite("SHOW CREATE TABLE t") === "SHOW CREATE TABLE t")
  }

  test("sql entry runs full statements over temp views") {
    Seq((1, "a"), (2, "b")).toDF("id", "v").createOrReplaceTempView("sqlspec_t")
    val out = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM sqlspec_t WHERE id > 0").collect()
    assert(out.head.getLong(0) === 2L)
  }

  test("showViews lists session temp views as (namespace, viewName, true)") {
    Seq(1).toDF("x").createOrReplaceTempView("sqlspec_view_probe")
    val views = GraftSql.showViews(spark, "default")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(views.contains(("default", "sqlspec_view_probe", true)))
  }

  test("viewDefinition: SKIP_VIEW_DDL short-circuits; permanent view DDL returned") {
    spark.sql("CREATE OR REPLACE VIEW sqlspec_perm_view AS SELECT 1 AS one")
    // flag on: None without issuing any statement (pyhive_spark_patch.py:22-23)
    assert(GraftSql.viewDefinition(spark, "sqlspec_perm_view",
      skipViewDdl = true).isEmpty)
    val ddl = GraftSql.viewDefinition(spark, "sqlspec_perm_view")
    assert(ddl.exists(_.toUpperCase.contains("CREATE VIEW")))
    // missing view degrades to None like the shim's try/except
    assert(GraftSql.viewDefinition(spark, "sqlspec_no_such_view").isEmpty)
    // permanent views also appear in SHOW VIEWS with isTemporary=false
    val views = GraftSql.showViews(spark, "default")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(views.contains(("sqlspec_perm_view", false)))
  }

  test("serveIncremental streams every row without a full collect") {
    val df = spark.range(1000).toDF("id")
    val it = GraftSql.serveIncremental(df)
    assert(it.map(_.getLong(0)).sum === (0L until 1000L).sum)
  }
}
