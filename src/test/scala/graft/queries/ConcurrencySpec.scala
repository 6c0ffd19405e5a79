package graft.queries

import graft.SparkSpec

/** Multi-client serving (reference: FAIR Thrift server,
  * entrypoint-spark.sh:103-110,135-136): N newSession() clients on one
  * context, per-client scheduler pools, session-state isolation, and the
  * no-starvation liveness check — via the meta_concurrent declared query. */
class ConcurrencySpec extends SparkSpec {

  test("meta_concurrent: all five serving invariants hold") {
    val rows = Meta.queries("meta_concurrent")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSeq === Seq("all_clients_completed",
      "session_isolation", "no_parent_conf_leak", "fair_scheduler_mode",
      "short_not_starved_by_long").sorted) // query emits phase-sorted
    assert(rows.forall(_._3), s"invariant failed: ${rows.mkString(", ")}")
  }
}
