package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.XDF

/**
 * Round-6 correctness gates: the pseudo-array predicate family
 * (reference dataframe.py:5395-5473), greedy token packing
 * (operators/Packing.scala, previously spec-only), and the 1000-column
 * wide-data name-algebra path (reference README's "100s or 1000s of
 * columns" headline) — each driver-oracled against DuckDB.
 */
object Round6Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Pseudo-array frame in the reference's flattened convention: order
    * facts as positional slots `slot[i]` / nested `line[i].field`. */
  private def pseudoArray(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_orderpriority").as("slot[0]"),
      col("o_orderstatus").as("slot[1]"),
      concat(lit("c"), col("o_custkey") % 50).as("slot[2]"),
      col("o_orderpriority").as("line[0].pri"),
      concat(lit("o"), col("o_custkey")).as("line[0].txt"),
      col("o_orderstatus").as("line[1].pri"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== array_matches / array_value_exists: keep rows where ANY
    // slot[i] carries the value — one OR-folded codegen'd predicate =====
    "q_array_matches" -> ((s, dir) =>
      XDF(pseudoArray(s, dir).select(
          col("o_orderkey"), col("`slot[0]`"), col("`slot[1]`"), col("`slot[2]`")))
        .arrayValueExists("slot", "c7")
        .sort(Seq("o_orderkey")).toDF),

    // ===== nested_array_matches over `line[].pri` + substring find =====
    "q_nested_array_matches" -> ((s, dir) =>
      XDF(pseudoArray(s, dir))
        .nestedArrayValueExists("line[].pri", "3-MEDIUM")
        .nestedArrayValueFind("line[].txt", "7")
        .select("o_orderkey", "line\\[0\\].pri", "line\\[0\\].txt")
        .sort(Seq("o_orderkey")).toDF),

    // ===== greedy token-budget packing, single shard so the bin ids are
    // the global greedy recurrence DuckDB can replay =====
    "q_pack_greedy" -> ((s, dir) =>
      operators.Packing.packGreedy(
          t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
            .select(col("doc_id"), col("n_chars")),
          "n_chars", capacity = 2000, orderCols = Seq("doc_id"),
          numPartitions = 1)
        .select("doc_id", "n_chars", "bin_id")
        .orderBy("doc_id")),

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
      val stream = streaming.StreamOps.readJsonStream(s, tmp,
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
      s.table(qn)
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
      val stream = streaming.StreamOps.readJsonStream(s, tmp,
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
      s.table(qn).orderBy("event_type", "user_bucket")
    }),

    // ===== representative election, STRING-id fallback path: the k=1
    // bounded-heap aggregate (max_by needs an integral id; string ids
    // take the heap with the identical (score desc, id asc) order).
    // Synthetic clusters so the oracle is a plain window, not a CC =====
    "q_dedup_elect_str" -> ((s, dir) => {
      val clustered = t(s, dir, "documents").select(
        concat(lit("g"), col("doc_id") % 40).as("cluster_id"),
        col("n_chars"),
        concat(lit("d"), lpad(col("doc_id").cast("string"), 7, "0")).as("doc_sid"),
        col("source"))
      operators.Dedup.electRepresentative(clustered, "cluster_id", "n_chars", "doc_sid")
        .orderBy("cluster_id")
    }),

    // ===== GLOBAL running sum — the distributed prefix-sum path (no
    // partition cols; the per-entity path is gated by q_cumulative_sum) =====
    "q_cumsum_global" -> ((s, dir) =>
      XDF(t(s, dir, "orders"))
        .cumulativeSum("o_totalprice", "running_total",
          orderCols = Seq("o_orderdate", "o_orderkey"))
        .transform("running_total", round(col("running_total"), 2))
        .select("o_orderkey", "running_total")
        .sort(Seq("o_orderkey")).toDF),

    // ===== wide data end to end: 1000 generated columns -> one-pass
    // dropEmptyCols sweep -> prefix rename -> regex select; the name
    // algebra stays driver-side (plan-spec'd in ScaleSpec), the gate
    // checks the VALUES survive the 1000-column round trip =====
    "q_wide_cols" -> ((s, dir) => {
      // row-capped: the gate exercises 1000-column NAME ALGEBRA (one-pass
      // sweep, prefix rename, regex select) — the 1000 synthesized
      // expressions per row are fixture cost, not library cost, and a
      // >64KB generated method never JITs (measured 17s at 60k rows). The
      // deterministic sort+limit keeps the fixture the same size at every
      // scale factor.
      // the limit order must DETERMINE the output row: (l_orderkey,
      // l_linenumber) is not unique in the fixture, so the boundary sort
      // carries the two value columns the wide projection derives from
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") % 20 === 0)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .limit(3000)
      val wide = base.select(
        col("l_orderkey") +: col("l_linenumber") +:
          ((1 to 499).map(i => round(col("l_quantity") * i, 2).as(s"m:q$i")) ++
            (1 to 499).map(i =>
              (if (i % 2 == 0) lit("") // all-empty: dropEmptyCols must drop
               else concat(col("l_returnflag"), lit(i.toString))).as(s"t$i"))): _*)
      XDF(wide)
        .dropEmptyCols()
        .renamePrefix("m", "metric")
        .select("l_orderkey", "l_linenumber", "metric:q7", "metric:q499", "t3")
        .sort(Seq("l_orderkey", "l_linenumber", "metric:q7", "metric:q499",
          "t3")).toDF
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q_array_matches" ->
      """SELECT o_orderkey,
                o_orderpriority        AS "slot[0]",
                o_orderstatus          AS "slot[1]",
                'c' || (o_custkey % 50) AS "slot[2]"
         FROM orders
         WHERE o_orderpriority = 'c7'
            OR o_orderstatus   = 'c7'
            OR 'c' || (o_custkey % 50) = 'c7'
         ORDER BY o_orderkey""",

    "q_nested_array_matches" ->
      """SELECT o_orderkey,
                o_orderpriority    AS "line[0].pri",
                'o' || o_custkey   AS "line[0].txt"
         FROM orders
         WHERE (o_orderpriority = '3-MEDIUM' OR o_orderstatus = '3-MEDIUM')
           AND contains('o' || o_custkey, '7')
         ORDER BY o_orderkey""",

    // the greedy recurrence replayed row-by-row over the doc_id order
    // (single shard, so Spark's "pid:bin" label is always "0:<bin>")
    "q_pack_greedy" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, n_chars,
                  row_number() OVER (ORDER BY doc_id) AS rn
           FROM documents WHERE doc_id % 2 = 0),
         rec AS (
           SELECT rn, doc_id, n_chars,
                  0::BIGINT AS bin,
                  greatest(0, n_chars)::BIGINT AS used
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.rn, d.doc_id, d.n_chars,
                  CASE WHEN rec.used > 0 AND rec.used + greatest(0, d.n_chars) > 2000
                       THEN rec.bin + 1 ELSE rec.bin END,
                  CASE WHEN rec.used > 0 AND rec.used + greatest(0, d.n_chars) > 2000
                       THEN greatest(0, d.n_chars)
                       ELSE rec.used + greatest(0, d.n_chars) END
           FROM rec JOIN d ON d.rn = rec.rn + 1)
         SELECT doc_id, n_chars, '0:' || bin AS bin_id
         FROM rec ORDER BY doc_id""",

    "q_stream_dedup" ->
      """SELECT DISTINCT event_type, user_id % 100 AS user_bucket
         FROM events ORDER BY event_type, user_bucket""",

    "q_stream_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
                event_type, round(sum(value), 2) AS "value:sum"
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    "q_dedup_elect_str" ->
      """WITH c AS (SELECT 'g' || (doc_id % 40) AS cluster_id, n_chars,
                           'd' || lpad(doc_id::VARCHAR, 7, '0') AS doc_sid,
                           source
                    FROM documents),
           ranked AS (SELECT cluster_id, n_chars, doc_sid, source,
                        row_number() OVER (PARTITION BY cluster_id
                          ORDER BY n_chars DESC, doc_sid ASC) AS rn
                      FROM c)
         SELECT cluster_id, n_chars, doc_sid, source FROM ranked
         WHERE rn = 1 ORDER BY cluster_id""",

    "q_cumsum_global" ->
      """SELECT o_orderkey,
                round(sum(o_totalprice) OVER (ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_total
         FROM orders ORDER BY o_orderkey""",

    "q_wide_cols" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_quantity * 7, 2)   AS "metric:q7",
                round(l_quantity * 499, 2) AS "metric:q499",
                l_returnflag || '3'        AS t3
         FROM (SELECT * FROM lineitem WHERE l_orderkey % 20 = 0
               ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
               LIMIT 3000)
         ORDER BY l_orderkey, l_linenumber, "metric:q7", "metric:q499", t3"""
  )
}
