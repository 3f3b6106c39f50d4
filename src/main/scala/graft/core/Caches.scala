package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Session-scoped registry of intermediate frames an operator persisted to
 * avoid a double scan (JsonFlattener's inference input, Dedup's gram
 * frames). Spark's `CacheManager` holds a strong reference to every
 * `Dataset.persist`, so without an explicit release each call pins its
 * MEMORY_AND_DISK blocks for the session lifetime — fine in a run-once
 * batch job, an accumulating leak in a long-lived session.
 *
 * Every tracked entry is a PURE cache: releasing it early only re-derives
 * the frame from lineage, never changes results. Callers therefore call
 * [[release]] after the consuming action (Bench and Verify do, once per
 * query); library users embedding operators in a long-lived session own
 * the same hook.
 */
object Caches {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted frame for deterministic release. Returns the
    * frame for call-site chaining. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every frame tracked since the last call. Safe at any time
    * (cache-only — lineage recomputes); call after the consuming action
    * for the intended single-scan + bounded-residue behavior. */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(false); d = tracked.poll() }
  }
}
