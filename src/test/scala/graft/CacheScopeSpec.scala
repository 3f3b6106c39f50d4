package graft

import java.util.concurrent.CountDownLatch
import org.apache.spark.storage.StorageLevel

/**
 * Caches scoping (round-11, verdict item 2): with one process-global
 * queue, two concurrent queries in a shared session released each
 * other's pinned frames mid-flight — results stayed correct (pure
 * caches recompute from lineage) but the single-scan persist silently
 * degraded to a double scan. `Caches.scoped` gives each query its own
 * scope; these tests prove interleaved queries keep their pins until
 * THEIR OWN scope exits.
 */
class CacheScopeSpec extends SparkTestBase {

  test("scoped release frees exactly the scope's frames at body exit") {
    val df = spark.range(100).toDF("a").persist()
    graft.core.Caches.scoped {
      graft.core.Caches.track(df).count()
      assert(df.storageLevel != StorageLevel.NONE, "pinned inside the scope")
    }
    assert(df.storageLevel == StorageLevel.NONE,
      "scope exit must unpersist its tracked frames")
  }

  test("interleaved scopes: one query's release leaves another's pins intact") {
    val dfA = spark.range(100).selectExpr("id as a").persist()
    val dfB = spark.range(200).selectExpr("id as b").persist()
    val bTracked = new CountDownLatch(1)
    val aDone = new CountDownLatch(1)
    @volatile var bPinnedAfterA = false
    @volatile var threadFailure: Throwable = null
    val tB = new Thread(() => {
      try graft.core.Caches.scoped {
        graft.core.Caches.track(dfB).count()
        bTracked.countDown()
        aDone.await()
        // query A has opened, tracked, finished, and released by now —
        // under the old global queue that release() drained B's frame too
        bPinnedAfterA = dfB.storageLevel != StorageLevel.NONE
      } catch { case t: Throwable => threadFailure = t; bTracked.countDown() }
    })
    tB.start()
    bTracked.await()
    graft.core.Caches.scoped { graft.core.Caches.track(dfA).count() }
    assert(dfA.storageLevel == StorageLevel.NONE, "A released at its scope exit")
    aDone.countDown()
    tB.join()
    assert(threadFailure == null, s"thread B failed: $threadFailure")
    assert(bPinnedAfterA,
      "query A's scoped release unpersisted query B's in-flight frame")
    assert(dfB.storageLevel == StorageLevel.NONE, "B released at ITS scope exit")
  }

  test("pooled thread outliving its creating scope: track falls through to global") {
    // the round-11 latent hazard: `active` is an InheritableThreadLocal,
    // copied at thread CREATION — a pool thread created inside scope A
    // references A forever. Before the closed-scope fix, a track() on
    // that thread AFTER A exited added the frame to a dead scope nothing
    // would ever drain again (a silent session-lifetime pin). Now a
    // closed scope hands the frame to the global scope, so a bare
    // release() still frees it.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      graft.core.Caches.scoped {
        // force the pool's single thread into existence INSIDE scope A,
        // so it inherits A as its active scope
        pool.submit(new Runnable { def run(): Unit = () }).get()
      }
      // scope A is closed and drained; reuse the same pool thread for a
      // "later query B" that tracks a persist
      val df = spark.range(75).selectExpr("id as d").persist()
      pool.submit(new Runnable {
        def run(): Unit = graft.core.Caches.track(df).count()
      }).get()
      assert(df.storageLevel != StorageLevel.NONE, "pinned after track")
      // bare release on a thread with no open scope drains the GLOBAL
      // scope — which is where the closed-scope fallback must have put B's
      // frame (pre-fix it sat in dead scope A and stayed pinned forever)
      graft.core.Caches.release()
      assert(df.storageLevel == StorageLevel.NONE,
        "frame tracked on a pooled thread after its scope closed must fall " +
          "through to the global scope, not pin in the dead scope")
    } finally pool.shutdown()
  }

  test("track outside any scope falls back to the global scope + bare release") {
    val df = spark.range(50).selectExpr("id as c").persist()
    graft.core.Caches.track(df).count()
    assert(df.storageLevel != StorageLevel.NONE)
    graft.core.Caches.release()
    assert(df.storageLevel == StorageLevel.NONE,
      "bare release() must drain the global scope (pre-scoping behavior)")
  }
}
