package graft

import java.util.concurrent.Executors
import org.apache.spark.sql.SparkSession

/**
 * Long-session soak for the cache-scope machinery (round-13 verdict item
 * 5): CacheScopeSpec proves each hazard per-case; this proves them
 * in-the-large, in a JVM whose session the soak owns end-to-end (inside
 * sbt test the shared session's cacheManager legitimately holds OTHER
 * suites' caches under parallel execution, so global-emptiness is only
 * assertable here).
 *
 * One session runs 200+ mixed gates — including every operator family
 * that persists through Caches.track (JsonFlattener's inference input,
 * Dedup's gram/eval frames) — through the three execution patterns a
 * long-lived service mixes:
 *
 *   1. driver-thread `Caches.scoped` (what Bench/Verify do per query);
 *   2. scoped bodies run ON a shared pool whose threads were born inside
 *      a scope that has long since closed (the InheritableThreadLocal
 *      hazard: those threads' inherited scope is dead, so scopes they
 *      open chain to it as fallback);
 *   3. UNSCOPED runs on that same pool — every track falls through the
 *      closed-scope chain to the global scope.
 *
 * At the end, after one bare release (what a sequential driver does
 * between queries anyway), the session must hold ZERO cached plans and
 * ZERO persisted RDD blocks — storage memory back to baseline, nothing
 * leaked across 200+ queries. Exit 0 iff so; writes a JSON artifact.
 *
 * Usage: Soak [sfDir] [outJson] (defaults /root/testdata/sf0.001,
 * target/soak.json)
 */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "target/soak.json"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // mixed gate diet: the Caches.track users (explode_json /
    // decontaminate / span dedup) plus one representative per major
    // family — joins, aggs, dedup, sampling, reshape, text, top-k, windows
    val gates = Seq(
      "q_explode_json", "q_explode_json_flat", "q_explode_json_array",
      "q_decontaminate", "q_decontaminate_bloom", "q_contamination_report",
      "q_dup_spans", "q_strip_spans",
      "q_agg_basic", "q_inner_join", "q_dedup_exact", "q_dedup_minhash_lsh",
      "q_group_by_key", "q_sort_take", "q_topk_per_group",
      "q_window_tumbling", "q_text_quality", "q_sample_hash",
      "q_union", "q_transpose")
    val qs = SparkEntry.queries
    gates.foreach(g => require(qs.contains(g), s"unknown gate $g"))

    def storageUsed(): Long = {
      val st = spark.sparkContext.getExecutorMemoryStatus.values
      st.map { case (max, remaining) => max - remaining }.sum
    }
    val baselineStorage = storageUsed()

    // birth the pool's threads INSIDE a scope that immediately closes, so
    // every later use runs on threads whose inherited scope is dead
    val pool = Executors.newFixedThreadPool(4)
    var run = 0
    try {
      graft.core.Caches.scoped {
        (1 to 4).map(_ => pool.submit(new Runnable {
          def run(): Unit = Thread.sleep(50)
        })).foreach(_.get())
      }
      val reps = 11 // 20 gates x 11 = 220 runs
      for (_ <- 1 to reps; g <- gates) {
        run += 1
        def body(): Unit = { qs(g)(spark, sfDir).count(); () }
        run % 3 match {
          case 0 => // driver-thread scoped (the Bench/Verify pattern)
            graft.core.Caches.scoped(body())
          case 1 => // scoped ON a dead-scope pool thread
            pool.submit(new Runnable {
              def run(): Unit = graft.core.Caches.scoped(body())
            }).get()
          case _ => // unscoped on the pool: tracks chain to global
            pool.submit(new Runnable { def run(): Unit = body() }).get()
        }
        if (run % 50 == 0) System.err.println(s"[soak] $run queries")
      }
      require(run >= 200, s"soak must cover 200+ queries, ran $run")

      // the one bare release a sequential driver performs between queries
      // drains whatever the unscoped pattern parked in the global scope
      graft.core.Caches.release()

      val cacheEmpty = spark.sharedState.cacheManager.isEmpty
      val persisted = spark.sparkContext.getPersistentRDDs
      // remaining storage is broadcast blocks (small-dim join sides),
      // which Spark's ContextCleaner reaps when their variables are
      // GC'd — give it one cycle so the artifact shows the true floor
      System.gc(); Thread.sleep(2000)
      val endStorage = storageUsed()
      val ok = cacheEmpty && persisted.isEmpty
      val json =
        s"""{"note":"cache-scope soak: $run mixed gates through one session across driver-scoped / pool-scoped(dead inherited scope) / pool-unscoped patterns; asserts zero leaked persists at end","queries_run":$run,"gates":${gates.size},"patterns":3,"cache_manager_empty":$cacheEmpty,"persisted_rdds":${persisted.size},"storage_bytes_baseline":$baselineStorage,"storage_bytes_end":$endStorage,"pass":$ok}"""
      val p = java.nio.file.Paths.get(outJson)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      println(json)
      spark.stop()
      if (!ok) {
        System.err.println(s"[soak] LEAK: cacheManagerEmpty=$cacheEmpty " +
          s"persistedRDDs=${persisted.size}: " +
          persisted.values.take(5).map(_.name).mkString(", "))
        sys.exit(1)
      }
    } finally pool.shutdownNow()
  }
}
