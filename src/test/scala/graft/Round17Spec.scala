package graft

import java.nio.file.{Files, Path, StandardOpenOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-17 laws (VERDICT r16 items 2 and 3):
  * 1. `explodeMapsFetched(strictOnce = true)` makes a RETRIED fetch task
  *    fail fast before re-invoking the generator — proven in a forked
  *    JVM (tools/StrictOnceProbe) because retries need maxFailures > 1,
  *    which the shared local[4] test master doesn't have.
  * 2. Streaming RESTART RECOVERY for the remaining stateful operators:
  *    `sessionize` (flatMapGroupsWithState — custom state encoder) and
  *    the stream-stream `intervalJoin` (join state store). Same harness
  *    as Round16Spec: durable checkpoint, stop mid-state, feed late +
  *    new data, restart, assert equality with the batch truth
  *    exactly-once into a file sink. */
class Round17Spec extends SparkTestBase {
  import spark.implicits._

  test("strictOnce fails a retried fetch task before any re-fetch (forked probe)") {
    val out = graft.core.TempDirs.scratchPath("graft_r17_strict")
      .resolve("probe.json")
    val rc = scala.sys.process.Process(
      Seq("scripts/run_main.sh", "graft.tools.StrictOnceProbe", out.toString),
      new java.io.File(sys.props("user.dir")), "SPARK_DRIVER_MEM" -> "4g").!
    assert(rc == 0, s"StrictOnceProbe exited $rc")
    val json = new String(Files.readAllBytes(out), "UTF-8")
    def field(k: String): String =
      s""""$k":([^,}]+)""".r.findFirstMatchIn(json).map(_.group(1))
        .getOrElse(fail(s"no $k in probe output: $json"))
    // strict arm: job failed with the strict-once message and NO row was
    // fetched twice (the retried attempt was refused before any fetch)
    assert(field("strict_failed_with_message") == "true", json)
    assert(field("strict_max_fetch") == "1", json)
    // loose arm on the same poison: the retry re-drives the partition —
    // the job succeeds but rows ARE fetched twice (the measured hazard
    // strictOnce exists to refuse)
    assert(field("loose_rows") == "8", json)
    assert(field("loose_max_fetch") == "2", json)
  }

  // ---------- streaming restart/recovery harness (as Round16Spec) ----------

  private def jline(ts: String, k: String, v: Int): String =
    s"""{"ts":"2024-01-01T$ts.000Z","k":"$k","v":$v}"""

  private def appendFile(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), (lines.mkString("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  private def runOnce(srcDir: Path, ckptDir: String, outDir: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val stream = ss.readStream.schema("ts TIMESTAMP, k STRING, v INT")
      .json(srcDir.toString)
    val q = build(stream).writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckptDir)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def readSink(outDir: String) = spark.read.parquet(outDir)

  private def epochMs(ts: String): Long =
    java.time.Instant.parse(s"2024-01-01T$ts.000Z").toEpochMilli

  test("sessionize recovers flatMapGroupsWithState state across a restart") {
    val src = graft.core.TempDirs.scratchPath("graft_r17_sess_src")
    val ckpt = graft.core.TempDirs.scratch("graft_r17_sess_ckpt")
    val out = graft.core.TempDirs.scratch("graft_r17_sess_out")
    def run(): Unit = runOnce(src, ckpt, out) { stream =>
      streaming.StreamOps.sessionize(stream, "k", "ts", "v",
        gapMillis = 600000L, watermark = "10 minutes").toDF
    }
    // run 1: one OPEN session for key a ([00:01, 00:05], n=2, sum=3) —
    // watermark 23:55, nothing emitted; the session exists ONLY in the
    // checkpointed flatMapGroupsWithState store across the stop
    appendFile(src, "b1.json", Seq(
      jline("00:01:00", "a", 1), jline("00:05:00", "a", 2)))
    run()
    // run 2 (RESTART): 00:08 extends the RECOVERED session (gap 3 min —
    // if state were lost this would start a fresh session at 00:08);
    // 00:30 exceeds the 10-min gap, closing+emitting [00:01,00:08] and
    // opening a new session; sentinel key z advances the watermark
    appendFile(src, "b2.json", Seq(
      jline("00:08:00", "a", 100), jline("00:30:00", "a", 7),
      jline("01:00:00", "z", 999)))
    run()
    // run 3: a second z event 02:00 pushes the watermark past a's second
    // session's timeout (00:40) and closes z's first session by gap —
    // emission then happens in a DATA batch deterministically
    if (readSink(out).count() < 3) {
      appendFile(src, "b3.json", Seq(jline("02:00:00", "z", 111)))
      run()
    }
    val got = readSink(out)
      .select($"key", $"session_start", $"session_end", $"n_events", $"value_sum")
      .as[(String, Long, Long, Long, Double)].collect().toList.sorted
    assert(got == List(
      // recovered session: start 00:01 from RUN 1's state, late 00:08
      // merged in across the restart
      ("a", epochMs("00:01:00"), epochMs("00:08:00"), 3L, 103.0),
      ("a", epochMs("00:30:00"), epochMs("00:30:00"), 1L, 7.0),
      ("z", epochMs("01:00:00"), epochMs("01:00:00"), 1L, 999.0)),
      s"sessionize restart recovery mismatch: $got")
    // exactly-once: no session emitted twice across the restarts
    assert(got.distinct.size == got.size)
  }

  test("intervalJoin recovers stream-stream join state across a restart") {
    val srcL = graft.core.TempDirs.scratchPath("graft_r17_ij_lsrc")
    val srcR = graft.core.TempDirs.scratchPath("graft_r17_ij_rsrc")
    val ckpt = graft.core.TempDirs.scratch("graft_r17_ij_ckpt")
    val out = graft.core.TempDirs.scratch("graft_r17_ij_out")
    def lline(ts: String, k: String, v: Int): String =
      s"""{"lts":"2024-01-01T$ts.000Z","lk":"$k","lv":$v}"""
    def rline(ts: String, k: String, v: Int): String =
      s"""{"rts":"2024-01-01T$ts.000Z","rk":"$k","rv":$v}"""
    def run(): Unit = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val l = ss.readStream.schema("lts TIMESTAMP, lk STRING, lv INT")
        .json(srcL.toString)
      val r = ss.readStream.schema("rts TIMESTAMP, rk STRING, rv INT")
        .json(srcR.toString)
      val joined = streaming.StreamOps.intervalJoin(
        l, "lk", "lts", r, "rk", "rts",
        lowerMs = 0L, upperMs = 600000L, watermark = "10 minutes")
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: left a@00:05 arrives; right a@00:06 matches immediately
    // (emitted in run 1). The left row stays BUFFERED in the join state
    // store — its second match only exists after the restart.
    appendFile(srcL, "b1.json", Seq(lline("00:05:00", "a", 1)))
    appendFile(srcR, "b1.json", Seq(rline("00:06:00", "a", 5)))
    run()
    val afterRun1 = readSink(out).count()
    assert(afterRun1 == 1, s"run 1 should emit exactly the a@00:06 match, got $afterRun1")
    // run 2 (RESTART): right a@00:09 pairs with the RECOVERED buffered
    // left a@00:05 (00:09 in [00:05, 00:15]) — the state-survival proof —
    // plus a fresh post-restart pair on key b
    appendFile(srcR, "b2.json", Seq(rline("00:09:00", "a", 7)))
    appendFile(srcL, "b2.json", Seq(lline("00:20:00", "b", 2)))
    appendFile(srcR, "b3.json", Seq(rline("00:25:00", "b", 9)))
    run()
    val got = readSink(out).select($"lk", $"lv", $"rv")
      .as[(String, Int, Int)].collect().toList.sorted
    // batch truth over all data; the run-1 pair appears exactly once
    // (exactly-once across the restart), and the a/7 pair proves the
    // buffered left row survived the checkpoint
    assert(got == List(("a", 1, 5), ("a", 1, 7), ("b", 2, 9)),
      s"intervalJoin restart recovery mismatch: $got")
  }
}
