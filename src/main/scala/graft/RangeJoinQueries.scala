package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Range-join gates: point-in-interval and interval-overlap joins via
 * cell-bucketed equi-joins (operators/RangeJoin).
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object RangeJoinQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

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
  )

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
  )
}
