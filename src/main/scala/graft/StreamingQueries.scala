package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Streaming-twin gates (batch equivalents of the StreamOps surface):
 * sessionize, windowed aggregation, dedup, distinct, interval join.
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object StreamingQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Session for a streaming gate, with a small state-partition count.
    * The number of state partitions is pinned from
    * spark.sql.shuffle.partitions at the FIRST micro-batch, and each one
    * costs a state-store init plus a per-batch commit — at gate scale (a
    * few thousand keys) 32 partitions is pure fixed overhead (~20% of
    * each streaming gate's wall, measured round 12). Production streams
    * size this knob to their key cardinality. Values are unaffected —
    * this is parallelism, not semantics (the stream==batch law specs run
    * the same operators unwrapped).
    *
    * The override lives in a CLONED session (`newSession()`: own SQLConf
    * and temp-view catalog, shared SparkContext), never in the caller's:
    * the whole streaming pipeline — readStream, transforms, the memory
    * sink, and the sink's temp view — is built on the clone, so a batch
    * query running CONCURRENTLY on `s` can never observe the 8-partition
    * override (round-13 verdict item 3 retired the old set/restore-on-`s`
    * window plus its lock and sequential-driver caveat; graft.Soak's
    * `concurrent` phase now proves the isolation empirically). The clone
    * also isolates the memory-sink query NAME, so the same gate can run
    * concurrently with itself. Clones are cheap session-state shells; they
    * are unreferenced after the gate's frame is consumed. */
  private def streamSession(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(



    // ===== sessionize (batch twin): gap-based sessions per user over the
    // events fixture; value quantized to cents so sums are order-exact =====
    "q_sessionize_batch" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"),
        Tables.tsMillis("ts").as("ts_ms"),
        round(col("value") * 100).as("cents"))
      StreamOps.sessionizeBatch(e, "user_id", "ts_ms", "cents", 40000000L)
        .orderBy("key", "session_start")
    }),



    // ===== STREAMING windowed aggregate, driver-oracled: the events
    // table round-trips through a JSON file stream -> Structured
    // Streaming tumbling-window agg -> complete-mode memory sink, and
    // the emitted windows must match DuckDB's batch GROUP BY. This
    // gates the streaming ENGINE path (previously law-tested only) =====
    "q_stream_window_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("ts"),
          col("event_type"), col("value"))
      val tmp = graft.core.TempDirs.scratch("graft_swa")
      ev.write.mode("overwrite").json(tmp)
      val ss = streamSession(s)
      val stream = streaming.StreamOps.readJsonStream(ss, tmp,
        "ts TIMESTAMP, event_type STRING, value DOUBLE")
      val agged = streaming.StreamOps.windowedAggregate(stream, "ts",
        "1 hour", null, "1 minute", Seq("event_type"), Seq("value"), Seq("sum"))
      val qn = "q_stream_window_agg_sink"
      val q = agged.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      // staged JSON only feeds the file source; free it once drained
      try q.processAllAvailable() finally {
        q.stop()
        graft.core.TempDirs.deleteRecursively(java.nio.file.Paths.get(tmp))
      }
      ss.table(qn)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"), round(col("value:sum"), 2).as("value:sum"))
        .orderBy("hour", "event_type")
    }),



    // ===== streaming dedup, driver-oracled: dropDuplicatesWithinWatermark
    // over the file stream keyed by (event_type, user_id % 100). Keys
    // only in the output — WHICH row survives per key depends on stream
    // arrival order, but the surviving KEY SET is exactly the distinct
    // keys, which DuckDB checks =====
    "q_stream_dedup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("ts"),
          col("event_type"), (col("user_id") % 100).as("user_bucket"))
      val tmp = graft.core.TempDirs.scratch("graft_sdd")
      ev.write.mode("overwrite").json(tmp)
      val ss = streamSession(s)
      val stream = streaming.StreamOps.readJsonStream(ss, tmp,
        "ts TIMESTAMP, event_type STRING, user_bucket BIGINT")
      val deduped = streaming.StreamOps.streamingDedup(stream, "ts",
        "10 minutes", Seq("event_type", "user_bucket"))
      val qn = "q_stream_dedup_sink"
      val q = deduped.select("event_type", "user_bucket")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try q.processAllAvailable() finally {
        q.stop()
        graft.core.TempDirs.deleteRecursively(java.nio.file.Paths.get(tmp))
      }
      ss.table(qn).orderBy("event_type", "user_bucket")
    }),



    // batch twin of StreamOps.intervalJoin (the streaming pair is
    // law-tested in RangeJoinSpec): purchases within 2h after a view by
    // the same user — equality on user + the interval as residual, so
    // the plan is a keyed shuffle join, never a nested loop
    "q_interval_join_batch" -> ((s, dir) => {
      val base = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_millis(Tables.tsMillis("ts")).as("tsx"))
      val a = base.filter(col("event_type") === "view")
        .select(col("event_id").as("a_id"), col("user_id").as("a_uid"),
          col("tsx").as("a_ts"))
      val b = base.filter(col("event_type") === "purchase")
        .select(col("event_id").as("b_id"), col("user_id").as("b_uid"),
          col("tsx").as("b_ts"))
      graft.streaming.StreamOps.intervalJoin(a, "a_uid", "a_ts",
          b, "b_uid", "b_ts", lowerMs = 0L, upperMs = 7200000L)
        .select(col("a_id"), col("b_id"),
          (unix_millis(col("b_ts")) - unix_millis(col("a_ts"))).as("gap_ms"))
        .orderBy("a_id", "b_id")
    }),



    // streaming x sketches: a REAL Structured Streaming run (file source
    // -> watermark -> windowed HLL sketch aggregate -> memory sink)
    // computing approximate-distinct users per hour per event type. The
    // user domain folds mod 200 (< the 384-coupon exact threshold at
    // lgK 12), so the streaming estimate equals the batch
    // count(DISTINCT) oracle exactly — the streaming twin of
    // q_hll_distinct_union.
    "q_stream_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("ts"),
        col("event_type"), pmod(col("user_id"), lit(200L)).as("ub"))
      val tmp = graft.core.TempDirs.scratchPath("graft_sdi")
      ev.write.mode("overwrite").json(tmp.toString)
      val ss = streamSession(s)
      val stream = graft.streaming.StreamOps.readJsonStream(ss, tmp.toString,
        "ts TIMESTAMP, event_type STRING, ub BIGINT")
      val agged = stream.withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(Sketches.hllSketch(col("ub")).as("sk"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"), Sketches.hllEstimate(col("sk")).as("nd_users"))
      val qn = "q_stream_distinct_sink"
      val q = agged.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      // the staged JSON exists only to feed the file source; once the
      // stream has drained into the memory sink the files are dead — a
      // fresh temp dir per invocation would otherwise accumulate a full
      // events copy per run
      try q.processAllAvailable() finally {
        q.stop()
        graft.core.TempDirs.deleteRecursively(tmp)
      }
      ss.table(qn).orderBy("hour", "event_type")
    }),
  )

  def oracleSql: Map[String, String] = Map(


    "q_sessionize_batch" ->
      """WITH e AS (
           SELECT user_id::VARCHAR AS key, epoch_ns(ts) // 1000000 AS ts_ms,
                  round(value * 100) AS cents
           FROM events
         ),
         f AS (
           SELECT *, CASE WHEN ts_ms - lag(ts_ms) OVER (PARTITION BY key ORDER BY ts_ms) > 40000000
                          THEN 1 ELSE 0 END AS brk
           FROM e
         ),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY key ORDER BY ts_ms) AS sid FROM f)
         SELECT key, min(ts_ms) AS session_start, max(ts_ms) AS session_end,
                count(*)::BIGINT AS n_events, sum(cents) AS value_sum
         FROM s GROUP BY key, sid
         ORDER BY key, session_start""",



    "q_stream_dedup" ->
      """SELECT DISTINCT event_type, user_id % 100 AS user_bucket
         FROM events ORDER BY event_type, user_bucket""",



    "q_stream_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
                event_type, round(sum(value), 2) AS "value:sum"
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",



    "q_interval_join_batch" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
                    FROM events),
          a AS (SELECT event_id AS a_id, user_id AS u, ms AS a_ms FROM e
                WHERE event_type = 'view'),
          b AS (SELECT event_id AS b_id, user_id AS u, ms AS b_ms FROM e
                WHERE event_type = 'purchase')
         SELECT a_id, b_id, b_ms - a_ms AS gap_ms
         FROM a JOIN b ON a.u = b.u
           AND b_ms >= a_ms AND b_ms <= a_ms + 7200000
         ORDER BY a_id, b_id""",



    "q_stream_distinct" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
                event_type,
                CAST(count(DISTINCT user_id % 200) AS BIGINT) AS nd_users
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
  )
}
