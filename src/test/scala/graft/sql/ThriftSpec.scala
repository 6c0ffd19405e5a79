package graft.sql

import graft.SparkSpec

/** The REAL HiveThriftServer2 endpoint (SURVEY.md §2.C4/§0 serving layer):
  * TCP listen, NOSASL JDBC round-trip parity with the in-process plan,
  * 6-client concurrency with a no-starvation race, per-connection session
  * isolation, and wire introspection — the reference's Superset-facing
  * topology end-to-end. */
class ThriftSpec extends SparkSpec {

  test("meta_thrift_serve declared query: all invariants hold") {
    val rows = graft.queries.Meta.queries("meta_thrift_serve")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSeq === Seq("server_listening",
      "jdbc_matches_inprocess", "six_concurrent_clients",
      "short_not_starved_by_long", "thrift_session_isolation",
      "show_tables_over_wire").sorted) // query emits phase-sorted
    assert(rows.forall(_._3), s"invariant failed: ${rows.mkString(", ")}")
  }

  test("meta_e2e_serve declared query: import -> catalog -> Thrift -> BI SQL holds") {
    val rows = graft.queries.Meta.queries("meta_e2e_serve")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSeq === Seq("describe_over_wire", "import_tables",
      "introspection_tables", "serve_join_over_wire",
      "show_create_view_rewrite")) // query emits phase-sorted
    assert(rows.forall(_._3), s"invariant failed: ${rows.mkString(", ")}")
    // the e2e query must leave the serving session in ISOLATED mode —
    // its singleSession flip is scoped to its own connections
    assert(spark.sessionState.conf.getConfString(
      "spark.sql.hive.thriftServer.singleSession", "false") === "false")
  }

  test("wire statement cancel: a long statement dies promptly, the connection survives") {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val port = ThriftServe.ensureStarted(spark)
    // the cancelled operation logs server-side like any failed one —
    // expected here, so the operation logger is off for this probe only
    val opLogger =
      "org.apache.spark.sql.hive.thriftserver.SparkExecuteStatementOperation"
    val prevLevel = LogManager.getLogger(opLogger).getLevel
    Configurator.setLevel(opLogger, Level.OFF)
    try ThriftServe.withConnection(port) { c =>
      val st = c.createStatement()
      @volatile var err: Throwable = null
      @volatile var returned = false
      val t = new Thread(() => {
        try {
          val rs = st.executeQuery(
            "SELECT sum(id % 7) FROM range(0, 200000000000, 1, 400)")
          rs.next(); returned = true
        } catch { case e: Throwable => err = e }
      })
      t.start()
      Thread.sleep(1500) // let the statement reach the executors
      st.cancel()
      t.join(30000)
      assert(!t.isAlive, "cancel must terminate the in-flight statement")
      assert(err != null && !returned,
        "the cancelled statement must error out, not return rows")
      // the session is still serviceable on the same connection
      val st2 = c.createStatement()
      val rs2 = st2.executeQuery("SELECT 41 + 1 AS x")
      assert(rs2.next() && rs2.getInt(1) === 42)
      st2.close()
    } finally Configurator.setLevel(opLogger, prevLevel)
  }

  test("wire results carry correct JDBC types and the dialect shims apply") {
    val port = ThriftServe.ensureStarted(spark)
    // a computed projection with aliases — types survive the Thrift hop
    val rows = ThriftServe.query(port,
      "SELECT cast(2 as bigint) AS a, 'x' AS b, cast(1.5 as double) AS c")
    assert(rows === Seq(Seq(2L, "x", 1.5)))
    // the SHOW CREATE VIEW rewrite (I1) happens server-side of the BI
    // client: GraftSql.sql() is the entry the server session exposes.
    // Permanent view — SHOW CREATE TABLE does not cover temp views.
    spark.sql("CREATE OR REPLACE VIEW shim_pv AS SELECT 1 AS one")
    try {
      val ddl = GraftSql.viewDefinition(spark, "shim_pv")
      assert(ddl.exists(_.toUpperCase.contains("CREATE")), ddl.toString)
    } finally spark.sql("DROP VIEW IF EXISTS shim_pv")
  }

  test("wire-level dialect shim: SHOW CREATE VIEW succeeds over JDBC via queryBi") {
    val port = ThriftServe.ensureStarted(spark)
    spark.sql("CREATE OR REPLACE VIEW shim_wire_pv AS SELECT 1 AS one")
    try {
      // raw statement dies in the server's parser — Spark has no
      // SHOW CREATE VIEW — proving the shim is doing real work
      intercept[java.sql.SQLException] {
        ThriftServe.query(port, "SHOW CREATE VIEW shim_wire_pv")
      }
      val rows = ThriftServe.queryBi(port, "SHOW CREATE VIEW shim_wire_pv")
      assert(rows.nonEmpty)
      val ddl = rows.map(_.head.toString).mkString("\n").toUpperCase
      assert(ddl.contains("CREATE") && ddl.contains("SHIM_WIRE_PV"), ddl)
    } finally spark.sql("DROP VIEW IF EXISTS shim_wire_pv")
  }

  test("committed-index retrieval over the wire: CALL search_text matches the Scala entry row-for-row") {
    import org.apache.spark.sql.functions.{asc, desc}
    val port = ThriftServe.ensureStarted(spark)
    val cat = graft.queries.Extensions.textIndexFor(spark, sfDir)
    val terms = graft.queries.Extensions.bm25ParamTerms
    val expected = graft.operators.TextIndex
      .bm25Candidates(spark, cat, "txt", "docs", terms)
      .select(graft.queries.Extensions.bm25RankCols(terms.length): _*)
      .orderBy(desc("score"), asc("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    // the catalog registers through the WIRE (session-scoped SET), the
    // retrieval runs as a SQL CALL — the whole path a BI client has
    ThriftServe.withConnection(port) { c =>
      val st = c.createStatement()
      val cname = "gwire_" + java.util.UUID.randomUUID.toString.take(8)
      st.execute(s"SET spark.sql.catalog.$cname=" +
        classOf[graft.catalog.GraftSparkCatalog].getName)
      st.execute(s"SET spark.sql.catalog.$cname.warehouse=${cat.warehouse}")
      val rs = st.executeQuery(s"CALL $cname.system.search_text(" +
        s"'txt.docs', '${terms.mkString(" ")}', 10)")
      val got = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
      assert(got === expected,
        "wire CALL search_text diverged from the Scala retrieval entry")
      st.close()
    }
  }

  test("ANN retrieval over the wire: CALL search_vec matches the Scala entry row-for-row") {
    import org.apache.spark.sql.functions.col
    val port = ThriftServe.ensureStarted(spark)
    val cat = graft.queries.Extensions.ivfPqIndexCatalog(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val (probeId, probeVec) =
      graft.operators.ProductQuantizer.sampleRows(emb).head
    val expected = graft.operators.IvfPq
      .search(spark, cat, "vec", "emb", emb, probeId, probeVec, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(expected.size === 10)
    // the same registration-over-SET + CALL path a BI client has — the
    // vector twin of the search_text wire test above
    ThriftServe.withConnection(port) { c =>
      val st = c.createStatement()
      val cname = "gwirev_" + java.util.UUID.randomUUID.toString.take(8)
      st.execute(s"SET spark.sql.catalog.$cname=" +
        classOf[graft.catalog.GraftSparkCatalog].getName)
      st.execute(s"SET spark.sql.catalog.$cname.warehouse=${cat.warehouse}")
      val rs = st.executeQuery(s"CALL $cname.system.search_vec(" +
        s"'vec.emb', $probeId, 10)")
      val got = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got === expected,
        "wire CALL search_vec diverged from the Scala ANN entry")
      st.close()
    }
  }

  test("a cancelled CALL mid-probe leaves a clean session: next CALL serves exact rows, no tmp debris") {
    // round-16 verdict item 7: statement CANCEL is proven for plain SQL;
    // a cancelled index-search CALL must additionally leave (a) no stale
    // per-thread inspection handle pinned on the pooled server thread
    // (IvfPq.clearInspection runs in the CALL body's finally — on the
    // cancel path too), (b) no half-written _tmp/staging dirs in the
    // warehouse, and (c) a session that serves the NEXT call with rows
    // identical to the Scala entry.
    import org.apache.spark.sql.functions.col
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val port = ThriftServe.ensureStarted(spark)
    val cat = graft.queries.Extensions.ivfPqIndexCatalog(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val (probeId, probeVec) =
      graft.operators.ProductQuantizer.sampleRows(emb).head
    val expected = graft.operators.IvfPq
      .search(spark, cat, "vec", "emb", emb, probeId, probeVec, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val opLogger =
      "org.apache.spark.sql.hive.thriftserver.SparkExecuteStatementOperation"
    val prevLevel = LogManager.getLogger(opLogger).getLevel
    Configurator.setLevel(opLogger, Level.OFF)
    try ThriftServe.withConnection(port) { c =>
      val st0 = c.createStatement()
      val cname = "gwcan_" + java.util.UUID.randomUUID.toString.take(8)
      st0.execute(s"SET spark.sql.catalog.$cname=" +
        classOf[graft.catalog.GraftSparkCatalog].getName)
      st0.execute(s"SET spark.sql.catalog.$cname.warehouse=${cat.warehouse}")
      val call = s"CALL $cname.system.search_vec('vec.emb', $probeId, 10)"
      // cancel at staggered offsets — some land mid-probe, some after
      // completion; EVERY schedule must leave the session serviceable
      for (delayMs <- Seq(0L, 50L, 200L)) {
        val st = c.createStatement()
        val t = new Thread(() => {
          try { val rs = st.executeQuery(call); while (rs.next()) () }
          catch { case _: Throwable => () } // cancelled — expected shape
        })
        t.start()
        Thread.sleep(delayMs)
        st.cancel()
        t.join(30000)
        assert(!t.isAlive, s"cancelled CALL (delay ${delayMs}ms) hung")
        // the SAME session serves the identical CALL, row-for-row
        val st2 = c.createStatement()
        val rs2 = st2.executeQuery(call)
        val got = Iterator.continually(rs2).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
        assert(got === expected,
          s"post-cancel CALL (delay ${delayMs}ms) diverged from the Scala entry")
        st2.close()
      }
      st0.close()
    } finally Configurator.setLevel(opLogger, prevLevel)
    // no half-written staging/tmp debris anywhere in the index warehouse
    val wh = java.nio.file.Paths.get(cat.warehouse)
    val stray = graft.catalog.Fs.walk(wh).filter(p =>
      p.getFileName.toString.startsWith("_tmp") ||
        p.getFileName.toString.endsWith(".tmp"))
    assert(stray.isEmpty, s"cancelled CALLs left tmp debris: $stray")
  }

  test("session modes: temp view crosses the wire in singleSession, not in isolated") {
    val port = ThriftServe.ensureStarted(spark)
    // serving a connection in single-session mode mutates the SHARED
    // session (Spark's session manager turns on the java8 datetime API
    // for every session it serves) — snapshot and restore, or every
    // later suite in this JVM reads Instant where it expects Timestamp
    val java8Before = spark.conf.get("spark.sql.datetime.java8API.enabled")
    spark.sql("CREATE OR REPLACE TEMP VIEW mode_tv AS SELECT 42 AS v")
    try {
      // isolated (default, the reference's default too): each connection
      // is a fresh Spark session — plain temp views do not cross
      ThriftServe.setSingleSession(spark, on = false)
      intercept[java.sql.SQLException] {
        ThriftServe.query(port, "SELECT v FROM mode_tv")
      }
      // singleSession parity (entrypoint-spark.sh:42,:109): every client
      // shares the serving session, so the same temp view is visible
      ThriftServe.setSingleSession(spark, on = true)
      assert(ThriftServe.query(port, "SELECT v FROM mode_tv") === Seq(Seq(42)))
    } finally {
      ThriftServe.setSingleSession(spark, on = false)
      spark.conf.set("spark.sql.datetime.java8API.enabled", java8Before)
      spark.sql("DROP VIEW IF EXISTS mode_tv")
    }
  }

  test("a concurrent client cannot open a connection inside a singleSession window") {
    // round-10 verdict finding 5: the toggle window must be safe BY
    // CONSTRUCTION — a wire client opening during the window blocks on
    // the server-wide lock until restore, then gets the default
    // ISOLATED session (proved by the temp view being invisible to it).
    val port = ThriftServe.ensureStarted(spark)
    val java8Before = spark.conf.get("spark.sql.datetime.java8API.enabled")
    spark.sql("CREATE OR REPLACE TEMP VIEW window_tv AS SELECT 7 AS v")
    val entered = new java.util.concurrent.CountDownLatch(1)
    val windowClosedAt = new java.util.concurrent.atomic.AtomicLong(0)
    val insideSaw = new java.util.concurrent.atomic.AtomicReference[Seq[Seq[Any]]]
    val window = new Thread(() => {
      ThriftServe.withSingleSession(spark) {
        entered.countDown()
        // a connection opened INSIDE the window (same thread) shares the
        // session and must see the temp view
        insideSaw.set(ThriftServe.query(port, "SELECT v FROM window_tv"))
        Thread.sleep(500)
        windowClosedAt.set(System.nanoTime())
      }
    })
    try {
      window.start()
      entered.await()
      // this open races the window: it must WAIT the window out...
      val ex = intercept[java.sql.SQLException] {
        ThriftServe.query(port, "SELECT v FROM window_tv")
      }
      val finishedAt = System.nanoTime()
      window.join()
      // ...and then land in an ISOLATED session (temp view invisible)
      assert(ex.getMessage.toLowerCase.contains("window_tv") ||
        ex.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND"))
      assert(finishedAt >= windowClosedAt.get(),
        "the concurrent open must block until the window closes")
      assert(insideSaw.get() === Seq(Seq(7)),
        "the window's own connection shares the serving session")
    } finally {
      window.join()
      spark.conf.set("spark.sql.datetime.java8API.enabled", java8Before)
      spark.sql("DROP VIEW IF EXISTS window_tv")
    }
  }
}
