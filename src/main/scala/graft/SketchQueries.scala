package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Mergeable-sketch gates: HLL distinct/union, Theta set algebra, KLL
 * quantiles.
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object SketchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(



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
    }),



    "q_theta_overlap" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        year(to_date(col("o_orderdate"))).as("yr"),
        month(to_date(col("o_orderdate"))).as("mo"),
        pmod(col("o_custkey"), lit(1024L)).as("ck"),
        col("o_orderpriority"), col("o_orderstatus"))
      val fine = o.groupBy("yr", "mo").agg(
        Sketches.thetaSketch(when(col("o_orderpriority") === "1-URGENT",
          col("ck"))).as("ska"),
        Sketches.thetaSketch(when(col("o_orderstatus") === "F",
          col("ck"))).as("skb"))
      fine.groupBy("yr")
        .agg(Sketches.thetaUnion(col("ska")).as("ua"),
          Sketches.thetaUnion(col("skb")).as("ub"))
        .select(col("yr"),
          Sketches.thetaEstimate(col("ua")).as("nd_a"),
          Sketches.thetaEstimate(col("ub")).as("nd_b"),
          Sketches.thetaEstimate(Sketches.thetaUnionPair(col("ua"), col("ub")))
            .as("nd_union"),
          Sketches.thetaEstimate(Sketches.thetaIntersect(col("ua"), col("ub")))
            .as("nd_both"),
          Sketches.thetaEstimate(Sketches.thetaANotB(col("ua"), col("ub")))
            .as("nd_a_only"))
        .orderBy("yr")
    }),



    "q_kll_quantiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(1009L)) === 0)
        .select(col("l_returnflag"),
          year(to_date(col("l_shipdate"))).as("yr"),
          floor(col("l_extendedprice")).cast(DoubleType).as("v"))
      val fine = li.groupBy("l_returnflag", "yr")
        .agg(Sketches.kllSketch(col("v"), 8192).as("sk"))
      fine.groupBy("l_returnflag")
        .agg(Sketches.kllMerge(col("sk"), 8192).as("m"))
        .select(col("l_returnflag"),
          Sketches.kllQuantile(col("m"), 0.25).as("p25"),
          Sketches.kllQuantile(col("m"), 0.5).as("p50"),
          Sketches.kllQuantile(col("m"), 0.75).as("p75"),
          Sketches.kllN(col("m")).as("n_rows"))
        .orderBy("l_returnflag")
    }),
  )

  def oracleSql: Map[String, String] = Map(


    "q_hll_distinct_union" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(count(DISTINCT l_partkey % 256) AS BIGINT) AS nd_mod256,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",



    "q_theta_overlap" ->
      """WITH o AS (SELECT year(o_orderdate::DATE) AS yr,
               o_custkey % 1024 AS ck,
               o_orderpriority = '1-URGENT' AS ia,
               o_orderstatus = 'F' AS ib
             FROM orders)
         SELECT yr,
           CAST(count(DISTINCT CASE WHEN ia THEN ck END) AS BIGINT) AS nd_a,
           CAST(count(DISTINCT CASE WHEN ib THEN ck END) AS BIGINT) AS nd_b,
           CAST(count(DISTINCT CASE WHEN ia OR ib THEN ck END) AS BIGINT)
             AS nd_union,
           CAST(count(DISTINCT CASE WHEN ia THEN ck END)
              + count(DISTINCT CASE WHEN ib THEN ck END)
              - count(DISTINCT CASE WHEN ia OR ib THEN ck END) AS BIGINT)
             AS nd_both,
           CAST(count(DISTINCT CASE WHEN ia OR ib THEN ck END)
              - count(DISTINCT CASE WHEN ib THEN ck END) AS BIGINT)
             AS nd_a_only
         FROM o GROUP BY yr ORDER BY yr""",



    "q_kll_quantiles" ->
      """WITH v AS (SELECT l_returnflag,
               CAST(floor(l_extendedprice) AS DOUBLE) AS v
             FROM lineitem WHERE l_orderkey % 1009 = 0)
         SELECT l_returnflag,
           (list_sort(list(v)))[CAST(ceil(0.25 * count(*)) AS BIGINT)] AS p25,
           (list_sort(list(v)))[CAST(ceil(0.5 * count(*)) AS BIGINT)] AS p50,
           (list_sort(list(v)))[CAST(ceil(0.75 * count(*)) AS BIGINT)] AS p75,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM v GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}
