package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Scoped registry of intermediate frames an operator persisted to avoid a
 * double scan (JsonFlattener's inference input, Dedup's gram frames).
 * Spark's `CacheManager` holds a strong reference to every
 * `Dataset.persist`, so without an explicit release each call pins its
 * MEMORY_AND_DISK blocks for the session lifetime — fine in a run-once
 * batch job, an accumulating leak in a long-lived session.
 *
 * Every tracked entry is a PURE cache: releasing it early only re-derives
 * the frame from lineage, never changes results. What release DOES affect
 * is the single-scan guarantee — which is why tracking is scoped
 * per-query, not process-global: with one global queue, two concurrent
 * queries in a shared session would release each other's pinned frames
 * mid-flight, silently degrading a single scan to a double scan.
 *
 * Usage: wrap each query (plan construction AND its consuming action) in
 * [[scoped]] — frames tracked inside are released exactly when that body
 * finishes, regardless of what other threads track meanwhile. Bench and
 * Verify do this per query. `track` calls outside any scope fall back to
 * a process-global scope drained by bare [[release]] — the pre-scoping
 * behavior, still right for strictly sequential use.
 */
object Caches {

  /** One query's tracked persists; [[release]] unpersists exactly these. */
  final class Scope private[Caches] () {
    private val tracked =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    private[Caches] def add(df: DataFrame): Unit = tracked.add(df)
    def release(): Unit = {
      var d = tracked.poll()
      while (d != null) { d.unpersist(false); d = tracked.poll() }
    }
  }

  private val global = new Scope
  // Inheritable so a scope opened on a driver thread covers any worker
  // threads the body itself spawns; Spark's own (pre-existing, pooled)
  // threads never call track — it is driver-side plan-construction code.
  private val active = new InheritableThreadLocal[Scope] {
    override def initialValue(): Scope = global
  }

  /** Register a persisted frame with the calling thread's active scope
    * (the global scope if none is open). Returns the frame for call-site
    * chaining. */
  def track(df: DataFrame): DataFrame = { active.get.add(df); df }

  /** Run `body` with a fresh scope as this thread's active one; release
    * the scope's frames when `body` finishes. Put the consuming action
    * INSIDE the body — releasing before the action would force the very
    * double scan the persist exists to avoid. */
  def scoped[T](body: => T): T = {
    val prev = active.get
    val s = new Scope
    active.set(s)
    try body finally { active.set(prev); s.release() }
  }

  /** Release the calling thread's active scope (the global scope if none
    * is open). Safe at any time (cache-only — lineage recomputes). */
  def release(): Unit = active.get.release()
}
