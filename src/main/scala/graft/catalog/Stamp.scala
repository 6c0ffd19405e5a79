package graft.catalog

import java.util.concurrent.atomic.AtomicLong

/** The ONE collision-safe stamp for data/index/layout commit
  * directories (`data/<kind>-<stamp>`). Every write path that stages
  * files for a catalog commit names its directory through here —
  * previously the paths split between `nanoTime` and `currentTimeMillis`
  * conventions, and a millisecond stamp collides whenever two commits
  * land inside 1 ms (two streaming maintainers, a test loop): the
  * second writer would stage INTO a directory an earlier snapshot
  * already references, corrupting committed state.
  *
  * Shape: `<nanoTime>-<seq>`. nanoTime gives ~ns resolution within a
  * JVM; the per-JVM sequence makes same-JVM stamps unique even if the
  * clock source is coarse; cross-JVM writers racing the same table are
  * serialized by the catalog's optimistic version claim, and the
  * nanoTime origin differs per JVM, so a cross-JVM collision would need
  * both identical origins and identical call offsets. (Replay-keyed
  * paths — `ivfpq-batch-<id>`, content-fingerprint tags — deliberately
  * do NOT use this: their directory name IS the idempotency key.) */
object Stamp {
  private val seq = new AtomicLong()

  def next(): String = s"${System.nanoTime()}-${seq.incrementAndGet()}"
}
