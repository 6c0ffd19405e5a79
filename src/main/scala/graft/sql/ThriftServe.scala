package graft.sql

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** A REAL HiveServer2 Thrift endpoint over the shared Graft session — the
  * reference's PRIMARY serving surface: `HiveThriftServer2` on a TCP port,
  * binary transport, NOSASL auth, incremental collect, consumed by
  * PyHive/Superset over JDBC/Thrift
  * (`/root/reference/entrypoint-spark.sh:66-142`, `:103-110`;
  * `/root/reference/entrypoint-superset.sh:19-22`;
  * `/root/reference/docker-compose.yml:36-37`).
  *
  * One server per JVM (like the reference's one container-wide server);
  * every JDBC connection becomes a Thrift session sharing this
  * SparkContext under the FAIR scheduler — the multi-client topology
  * meta_concurrent models in-process is exercised here over the wire.
  * Serve shared state through GLOBAL temp views (`global_temp.<name>`) or
  * a registered catalog: Thrift sessions are isolated Spark sessions, so
  * plain temp views deliberately do NOT cross the boundary.
  */
object ThriftServe {
  @volatile private var startedPort: Option[Int] = None

  /** Start the Thrift server on this session's context (once per JVM) and
    * return the TCP port it listens on. Subsequent calls return the
    * already-running endpoint's port. */
  def ensureStarted(spark: SparkSession): Int = synchronized {
    startedPort.getOrElse {
      val port = freePort()
      // HiveConf reads hive.* from system properties at construction, and
      // Spark folds session-conf entries into the Hadoop conf it builds
      // the server's HiveConf from — set both so the envelope holds
      // whichever path this Spark version takes.
      val conf = Map(
        "hive.server2.thrift.port" -> port.toString,
        "hive.server2.thrift.bind.host" -> "localhost",
        // binary NOSASL — the reference's exact transport contract
        // (`entrypoint-spark.sh:103-106`)
        "hive.server2.authentication" -> "NOSASL",
        // one partition collected at a time — C4's incremental contract
        // (`entrypoint-spark.sh:110`)
        "spark.sql.hive.thriftServer.incrementalCollect" -> "true")
      conf.foreach { case (k, v) =>
        System.setProperty(k, v)
        spark.conf.set(k, v)
      }
      HiveThriftServer2.startWithSparkSession(spark, exitOnError = false)
      awaitListening(port)
      startedPort = Some(port)
      port
    }
  }

  /** NOSASL JDBC URL for the endpoint — what PyHive's
    * `auth=NOSASL` connection string becomes on the JDBC side. */
  def url(port: Int): String =
    s"jdbc:hive2://localhost:$port/default;auth=noSasl"

  def withConnection[A](port: Int)(f: Connection => A): A = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val c = DriverManager.getConnection(url(port), "anonymous", "")
    try f(c) finally c.close()
  }

  /** Execute one statement over the wire; rows come back as
    * JDBC-object sequences (the client-side shape, not Spark Rows —
    * proving the result really crossed the Thrift boundary). */
  def query(port: Int, statement: String): Seq[Seq[Any]] =
    withConnection(port) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(statement)
        val n = rs.getMetaData.getColumnCount
        val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
        while (rs.next()) buf += (1 to n).map(rs.getObject(_)).toSeq
        buf.toSeq
      } finally st.close()
    }

  private def freePort(): Int = {
    val ss = new ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  private def awaitListening(port: Int, timeoutMs: Long = 90000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var up = false
    while (!up) {
      val s = new Socket()
      try { s.connect(new InetSocketAddress("localhost", port), 500); up = true }
      catch {
        case _: java.io.IOException =>
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"Thrift server did not open port $port within ${timeoutMs} ms")
          Thread.sleep(200)
      } finally s.close()
    }
  }
}
