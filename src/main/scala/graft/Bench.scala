package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}} for the driver. */
object Bench {

  /** Fixture integrity stamp — ALGORITHM-IDENTICAL to
    * scripts/fixture_stamp.py (the two must move together): per-table
    * file count + byte sum over the sf dir's sorted top-level entries
    * (directories recursed with '.'/'_' basenames skipped), md5 over
    * "name:files:bytes" entries joined with ';'. Lets every bench
    * artifact self-describe the exact fixture bytes it measured. */
  /** Minimal JSON string escaper for interpolated path/table names — a
    * name containing a quote or backslash must not yield a malformed
    * artifact (ADVICE round 16). */
  private def jstr(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  def stampFixture(sfDir: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(sfDir).normalize()
    if (!Files.isDirectory(root))
      return s"""{"dir":"${jstr(sfDir)}","fingerprint":"unavailable","tables":{}}"""
    val list = Files.list(root)
    val entries =
      try list.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
      finally list.close()
    val tables = entries.flatMap { p =>
      val name = p.getFileName.toString
      if (Files.isRegularFile(p)) Some((name, 1L, Files.size(p)))
      else if (Files.isDirectory(p)) {
        val walk = Files.walk(p)
        try {
          val fs = walk.iterator().asScala
            .filter(f => Files.isRegularFile(f))
            .filterNot { f =>
              val b = f.getFileName.toString
              b.startsWith(".") || b.startsWith("_")
            }.toSeq
          Some((name, fs.size.toLong, fs.map(Files.size(_)).sum))
        } finally walk.close()
      } else None
    }
    val manifest = tables.map { case (n, f, b) => s"$n:$f:$b" }.mkString(";")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(manifest.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tablesJson = tables.map { case (n, f, b) =>
      s""""${jstr(n)}":{"files":$f,"bytes":$b}""" }.mkString("{", ",", "}")
    s"""{"dir":"${jstr(root.toString)}","fingerprint":"$fp","tables":$tablesJson}"""
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions default to the thread count (right up to ~sf10
    // locally) but are overridable: at sf100 a 600M-row join across 32
    // partitions carries ~19M rows each and spills — the same
    // shuffle-partition sizing a cluster job does (SCALE.md) applies
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // AQE auto-sizing alternative to the manual decade knob above: when
    // set, every shuffle STARTS at this many partitions and AQE's
    // partition coalescing merges them down to fit the data — one config
    // across scale decades instead of a per-decade
    // SPARK_GRAFT_SHUFFLE_PARTITIONS a user must know to turn (SCALE.md
    // round-15 experiment)
    // parsed at read time: a typo ("auto") would otherwise surface as
    // invalid JSON in the artifact or a late Spark config error
    val aqeInitial: Option[Int] =
      sys.env.get("SPARK_GRAFT_AQE_INITIAL_PARTITIONS").map { s =>
        s.toIntOption.getOrElse(sys.error(
          s"SPARK_GRAFT_AQE_INITIAL_PARTITIONS must be an integer, got '$s'"))
      }
    val sessionBuilder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-plan the output partitioning of cached plans: the
      // dedup operators persist small derived frames (LSH bands, gram
      // hashes) consumed twice, and with this off (the conservative
      // default) every shuffle UNDER a persist runs at the raw
      // shuffle-partition count with no coalescing — measured 1.2-1.5x
      // on the minhashClusters gate family at sf0.1 (OPTIMIZATION_r18)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    aqeInitial.foreach(n => sessionBuilder.config(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      n.toString))
    val spark = sessionBuilder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen + scheduler warm-up so the first timed query doesn't
    // absorb session startup
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    // Optional per-query task-metrics capture (SPARK_GRAFT_TASK_METRICS=1):
    // accumulates spill/shuffle bytes across all tasks so a superlinear
    // grower can be attributed (e.g. sf100's 600M-row join across 32
    // partitions spilling ~19M rows/partition) instead of guessed at.
    // Listener delivery is async, so when enabled each query drains the
    // listener bus AFTER its timing stops — the wait never enters the
    // numbers, and (being a real drain, not a guessed sleep) a long
    // query's late task-end events can't bleed into the next query's
    // deltas.
    val metricsEnabled = sys.env.get("SPARK_GRAFT_TASK_METRICS").contains("1")
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    if (metricsEnabled) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            memSpill.addAndGet(m.memoryBytesSpilled)
            diskSpill.addAndGet(m.diskBytesSpilled)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
        }
      })
    // per-query metric deltas of the LAST pass (keyed after timing ends);
    // each entry records its `pass` index so a reader knows the metrics
    // may describe a different pass than the one `best` selected (spill /
    // shuffle bytes are plan properties and stable across passes; wall
    // time is not — that's exactly why `best` is min() but metrics aren't)
    val taskMetrics =
      scala.collection.mutable.Map.empty[String, Map[String, Long]]
    // failed pass records a sentinel so min() can never report a
    // fast-failure as a benchmark time
    val FailSentinel = 1e9
    // dev-loop convenience: SPARK_GRAFT_QUERY_FILTER=substr1,substr2
    // times only matching queries (the driver never sets it)
    val nameFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_QUERY_FILTER") match {
        case Some(f) if f.nonEmpty =>
          val pats = f.split(",").map(_.trim).filter(_.nonEmpty)
          n => pats.exists(n.contains)
        case _ => _ => true
      }
    def timeAll(pass: Int): Seq[(String, (Double, Long))] =
      SparkEntry.queries.toSeq.filter(p => nameFilter(p._1))
        .sortBy(_._1).map { case (name, fn) =>
        val m0 = (memSpill.get, diskSpill.get, shufWrite.get, shufRead.get)
        val t0 = System.nanoTime()
        // scoped: the query's operator persists are released when (and
        // only when) ITS action finishes — never another query's
        val n = try graft.core.Caches.scoped { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage.take(200)}")
            -1L
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // drain any frame a pooled thread tracked after its scope closed
        // (falls through to the enclosing/global scope — see Caches)
        graft.core.Caches.release()
        if (metricsEnabled) {
          // deterministic drain of the async bus (ADVICE r13: a fixed
          // sleep could attribute a long query's late task-end events to
          // the next query); falls back to a beat if the bus stays busy
          try org.apache.spark.sql.graft.bridge
            .waitListenerBusEmpty(spark.sparkContext)
          catch { case _: java.util.concurrent.TimeoutException =>
            Thread.sleep(500) }
          taskMetrics(name) = Map(
            "mem_spill" -> (memSpill.get - m0._1),
            "disk_spill" -> (diskSpill.get - m0._2),
            "shuffle_write" -> (shufWrite.get - m0._3),
            "shuffle_read" -> (shufRead.get - m0._4),
            "pass" -> pass.toLong)
        }
        name -> (if (n >= 0) dt else FailSentinel, n)
      }
    // best of N passes (default 3): the first pass absorbs page-cache/JIT
    // warm-up noise, and recording every pass lets round-over-round trend
    // lines separate real regressions from this machine's ±20-30% jitter.
    // (time, rows) travel together per pass — the reported rows always
    // come from the pass whose time was selected, and a query that fails
    // in ANY pass reports the sentinel + rows=-1 (never a valid-looking
    // mixed record).
    val passes = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    val allPasses = (1 to passes).map(p => timeAll(p).toMap)
    val results = SparkEntry.queries.keys.toSeq.filter(nameFilter).sorted.map { k =>
      val ps = allPasses.map(_(k))
      val times = ps.map(_._1)
      if (ps.exists(_._2 < 0)) (k, FailSentinel, -1L, times)
      else { val (bt, bn) = ps.minBy(_._1); (k, bt, bn, times) }
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // result row count per query: a sanity signal alongside the timing
    // (a fast-but-empty result would otherwise look like a win)
    val rows = results.map { case (k, _, c, _) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    // total excludes fail sentinels — one failed query must not turn the
    // headline value into 1e9 garbage; `failed` reports the count instead
    val failed = results.count(_._3 < 0)
    val total = results.filter(_._3 >= 0).map(_._2).sum
    // FULL artifact to a file: the driver's stdout capture truncates the
    // one-liner, losing the head of the queries map every round — the file
    // keeps every query's best time, rows, and all per-pass times so
    // per-query regressions can be diffed across rounds.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
    // explicit ROOT locale: the f-interpolator uses the JVM default, and a
    // comma-decimal locale would turn these fixed-point fields into
    // invalid JSON
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val perQuery = results.map { case (k, best, n, times) =>
      val spread = if (times.min > 0) (times.max - times.min) / times.min else 0.0
      val tm = taskMetrics.get(k).map { m =>
        "," + m.toSeq.sortBy(_._1)
          .map { case (mk, mv) => "\"" + mk + "\":" + mv }
          .mkString("\"task_metrics\":{", ",", "}")
      }.getOrElse("")
      s""""$k":{"best":$best,"rows":$n,"times":[${times.mkString(",")}],"spread":${fmt3(spread)}$tm}"""
    }.mkString("{", ",", "}")
    // artifacts must be self-describing (round-14 lesson: growth claims
    // name their denominators) — record the AQE knob alongside the manual
    // one so cross-round compares can't mix sizing regimes unnoticed
    val aqeField = aqeInitial.map(n => s""","aqe_initial_partitions":$n""").getOrElse("")
    // fixture integrity stamp (round-16): WHICH bytes this bench ran
    // against, so cross-round compares can prove they divided numbers
    // from the same pinned fixture (a regeneration changed row-group
    // layout and moved scan-bound gates up to 11x in round 14)
    val fixtureJson = stampFixture(sfDir)
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","passes":$passes,"failed":$failed,"shuffle_partitions":$shufflePartitions$aqeField,"fixture":$fixtureJson,"queries":$perQuery}"""
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, fullJson.getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // full line first (humans + logs keep every per-query time)...
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","passes":$passes,"failed":$failed,"rows":$rows,"queries":$qs}""")
    // ...then a COMPACT summary as the last JSON on stdout: the driver
    // keeps only a ~2 kB tail of output, which through round 11 sliced
    // the big line mid-JSON (parsed: null). This line is a few hundred
    // bytes, so the tail always contains one complete object; the
    // per-query map lives in the big line and the SPARK_GRAFT_BENCH_OUT
    // file artifact.
    val slowest = results.filter(_._3 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v, _, _) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    val fixtureFp = "\"fingerprint\":\"([0-9a-f]+|unavailable)\"".r
      .findFirstMatchIn(fixtureJson).map(_.group(1)).getOrElse("unavailable")
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","passes":$passes,"failed":$failed,"shuffle_partitions":$shufflePartitions$aqeField,"fixture_fingerprint":"$fixtureFp","queries_count":${results.size},"slowest":$slowest,"full":"$outPath"}"""
    println(compact)
    // ...and a stderr copy: if a future harness decorates stdout again,
    // the summary still survives somewhere undecorated
    System.err.println(compact)
    System.out.flush()
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
