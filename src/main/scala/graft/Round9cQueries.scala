package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.operators.RangeJoin
import graft.functions.Sketches

/**
 * Third round-9 batch: beyond-parity operators with first-class oracle
 * gates — cell-bucketed range joins (point-in-interval and
 * interval-overlap, [[graft.operators.RangeJoin]]) and mergeable HLL
 * distinct-count sketches in their exact coupon regime
 * ([[graft.functions.Sketches]]). Intervals are synthesized
 * deterministically from lineitem ([l_shipdate, l_shipdate +
 * floor(l_quantity) days]) so every SF shares the construction.
 */
object Round9cQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Days since 1992-01-01 as a long — the integral range-join dimension. */
  private def dayOf(c: org.apache.spark.sql.Column) =
    datediff(to_date(c), to_date(lit("1992-01-01"))).cast(LongType)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // point-in-interval: urgent orders of a customer slice against the
    // ship windows of high-quantity lineitems — one cell equi-join, the
    // exact BETWEEN runs on co-bucketed pairs only
    "q_range_join_point" -> ((s, dir) => {
      val points = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_custkey") < 300)
        .select(col("o_orderkey"), dayOf(col("o_orderdate")).as("p_day"))
      val ivs = t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 45 && col("l_partkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          dayOf(col("l_shipdate")).as("s_day"),
          (dayOf(col("l_shipdate")) + floor(col("l_quantity")).cast(LongType))
            .as("e_day"))
      RangeJoin.pointInInterval(points, "p_day", ivs, "s_day", "e_day",
          bucketWidth = 32)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_hits"), min("l_orderkey").as("min_l_orderkey"),
          max("e_day").as("max_e_day"))
        .orderBy("o_orderkey")
    }),

    // interval-overlap between two disjoint lineitem slices; pairs are
    // emitted exactly once via first-shared-cell responsibility
    "q_range_join_overlap" -> ((s, dir) => {
      def side(flag: String, p: String): DataFrame =
        t(s, dir, "lineitem")
          .filter(col("l_returnflag") === flag && col("l_partkey") < 500)
          .select(col("l_orderkey").as(s"${p}_ok"),
            col("l_linenumber").as(s"${p}_ln"),
            dayOf(col("l_shipdate")).as(s"${p}_s"),
            (dayOf(col("l_shipdate")) + floor(col("l_quantity")).cast(LongType))
              .as(s"${p}_e"))
      RangeJoin.intervalOverlap(side("R", "a"), "a_s", "a_e",
          side("A", "b"), "b_s", "b_e", bucketWidth = 64)
        .groupBy("a_ok", "a_ln", "a_s")
        .agg(count(lit(1)).as("n_overlap"), min("b_ok").as("min_b_ok"))
        .orderBy("a_ok", "a_ln", "a_s")
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

    // Morton/Z interleave for layout clustering (Layout.zValue) — the
    // oracle recomputes the interleave arithmetically in DuckDB, so the
    // bit math is pinned cross-engine; the layout side (contiguous
    // Z-range partitions) is law-tested in LayoutSpec
    "q_zorder_value" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber"), pmod(col("l_partkey"), lit(1024)).as("x"),
        pmod(col("l_suppkey"), lit(1024)).as("y"))
      base.withColumn("z", graft.operators.Layout.zValue(col("x"), col("y"), 10))
        .orderBy("l_orderkey", "l_linenumber", "x", "y", "z")
    }),

    // two-level mergeable rollup: per-(flag,status,year) sketches built
    // once, merged to (flag,status) WITHOUT rescanning rows — the
    // pre-aggregated sketch-table pattern. mod 256 pins the coupon-exact
    // regime (set mode holds 3/4 * 2^(lgK-3) = 384 values at the default
    // lgK = 12 — measured: 256 exact, 400 already off by 1-3), so the
    // DuckDB oracle is plain count(DISTINCT)
    "q_hll_distinct_union" -> ((s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          year(col("l_shipdate")).as("yr"))
        .agg(Sketches.hllSketch(pmod(col("l_partkey"), lit(256))).as("sk"),
          count(lit(1)).as("n"))
      daily.groupBy("l_returnflag", "l_linestatus")
        .agg(Sketches.hllEstimate(Sketches.hllMerge(col("sk"))).as("nd_mod256"),
          sum("n").as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }))

  def oracleSql: Map[String, String] = Map(

    "q_range_join_point" ->
      """WITH p AS (SELECT o_orderkey,
               date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS p_day
             FROM orders
             WHERE o_orderpriority = '1-URGENT' AND o_custkey < 300),
          iv AS (SELECT l_orderkey, l_linenumber,
               date_diff('day', DATE '1992-01-01', l_shipdate::DATE) AS s_day,
               date_diff('day', DATE '1992-01-01', l_shipdate::DATE)
                 + CAST(floor(l_quantity) AS BIGINT) AS e_day
             FROM lineitem WHERE l_quantity >= 45 AND l_partkey < 2000)
         SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_hits,
                min(l_orderkey) AS min_l_orderkey, max(e_day) AS max_e_day
         FROM p JOIN iv ON p_day BETWEEN s_day AND e_day
         GROUP BY o_orderkey ORDER BY o_orderkey""",

    "q_range_join_overlap" ->
      """WITH a AS (SELECT l_orderkey AS a_ok, l_linenumber AS a_ln,
               date_diff('day', DATE '1992-01-01', l_shipdate::DATE) AS a_s,
               date_diff('day', DATE '1992-01-01', l_shipdate::DATE)
                 + CAST(floor(l_quantity) AS BIGINT) AS a_e
             FROM lineitem WHERE l_returnflag = 'R' AND l_partkey < 500),
          b AS (SELECT l_orderkey AS b_ok, l_linenumber AS b_ln,
               date_diff('day', DATE '1992-01-01', l_shipdate::DATE) AS b_s,
               date_diff('day', DATE '1992-01-01', l_shipdate::DATE)
                 + CAST(floor(l_quantity) AS BIGINT) AS b_e
             FROM lineitem WHERE l_returnflag = 'A' AND l_partkey < 500)
         SELECT a_ok, a_ln, a_s, CAST(count(*) AS BIGINT) AS n_overlap,
                min(b_ok) AS min_b_ok
         FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
         GROUP BY a_ok, a_ln, a_s ORDER BY a_ok, a_ln, a_s""",

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

    "q_zorder_value" ->
      """SELECT l_orderkey, l_linenumber, x, y,
                CAST(list_sum(list_transform(range(0, 10), i ->
                  (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))))
                  AS BIGINT) AS z
         FROM (SELECT l_orderkey, l_linenumber, l_partkey % 1024 AS x,
                      l_suppkey % 1024 AS y FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, x, y, z""",

    "q_hll_distinct_union" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(count(DISTINCT l_partkey % 256) AS BIGINT) AS nd_mod256,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""")
}
