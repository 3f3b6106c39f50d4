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

  /** One query's tracked persists; [[release]] unpersists exactly these.
    *
    * A scope is CLOSED once its `scoped` body exits. Closing matters for
    * pooled threads: `active` is inheritable, copied at thread CREATION,
    * so a worker thread a query's body spawned into a long-lived pool
    * still references that query's scope when a LATER query reuses the
    * pool. Without the closed flag, frames tracked there after the
    * owner's exit landed in a scope nothing would ever release again — a
    * silent session-lifetime pin. With it, `add` on a closed scope falls
    * through to the scope that was ACTIVE when the closed one was opened
    * (its enclosing scope — usually the global one), so a frame tracked
    * by an outliving pooled thread is freed at the enclosing scope's
    * exit, or by any bare [[Caches.release]] once it reaches the global
    * scope. Fallbacks chain: a closed enclosing scope hands off again. */
  final class Scope private[Caches] (fallback: Scope) {
    private val tracked =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    @volatile private var closed = false
    private[Caches] def add(df: DataFrame): Unit =
      if (closed) fallback.add(df)
      else {
        tracked.add(df)
        // `closed` may flip between the check and the enqueue; close()
        // drains AFTER setting the flag, but a frame enqueued after that
        // drain would be stranded — hand the lost race to the fallback
        if (closed && tracked.remove(df)) fallback.add(df)
      }
    private def drain(): Unit = {
      var d = tracked.poll()
      while (d != null) { d.unpersist(false); d = tracked.poll() }
    }
    private[Caches] def close(): Unit = { closed = true; drain() }
    def release(): Unit = drain()
  }

  // the global scope is never closed, so its `add` never recurses into a
  // fallback — `null` is unreachable
  private val global = new Scope(null)
  // Inheritable so a scope opened on a driver thread covers any worker
  // threads the body itself spawns; a pooled thread that OUTLIVES the
  // scope is handled by the closed-scope fallback above.
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
    // fallback = the ENCLOSING scope (not always global): a pooled thread
    // that outlives a nested scope hands its late tracks to the scope
    // that contained it, which still drains them at ITS exit; the chain
    // bottoms out at the never-closed global scope
    val s = new Scope(prev)
    active.set(s)
    // close (not just release): pooled threads created inside `body`
    // inherit `s` forever — closing redirects their later tracks to the
    // ENCLOSING scope (chaining on until the never-closed global scope)
    // instead of pinning frames in a dead scope
    try body finally { active.set(prev); s.close() }
  }

  /** Release the calling thread's active scope (the global scope if none
    * is open). Safe at any time (cache-only — lineage recomputes). */
  def release(): Unit = active.get.release()
}
