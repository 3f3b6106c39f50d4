package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Sampling-family gates: portable hash gates, per-class caps, batch
 * splits, shuffles, weighted sampling without replacement.
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object SamplingQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(



    // ===== sample_group_by_col_value (portable gate): all-or-nothing
    // group sampling conditioned on the group's value =====
    "q_sample_group_by_col_value" -> ((s, dir) => {
      val df = t(s, dir, "lineitem")
        .withColumn("bucket7", (col("l_orderkey") % 7).cast(StringType))
      Sampling.sampleGroupByColValuePortable(df, Seq("l_orderkey"),
          "bucket7", "3", "40")
        .select(col("l_orderkey"), col("l_linenumber"), col("bucket7"))
        .orderBy("l_orderkey", "l_linenumber")
    }),



    // ===== sample_group_by_max_uniq_values_per_class: per-class cap on
    // distinct values within each group (exact md5-ranked variant);
    // value column is derived (ship month) — the fixture lineitem carries
    // no categorical value column beyond the class/group ones =====
    "q_sample_per_class_cap" -> ((s, dir) =>
      Sampling.sampleGroupByMaxUniqValuesPerClass(
          t(s, dir, "lineitem").withColumn("ship_month",
            month(col("l_shipdate")).cast(StringType)),
          Seq("l_returnflag"), "l_linestatus",
          "ship_month", Map("O" -> 2), defMaxUniq = Some(3))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("ship_month"))
        // full-row ordering: (orderkey, linenumber) is not unique in the
        // synthetic fixture, and non-unique sort keys flake the row-order
        // compare
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag",
          "l_linestatus", "ship_month")),



    // ===== sample_n with replacement: exact-n multinomial draw;
    // RNG-dependent, rows-only gate (count must be exactly n) =====
    "q_sample_n_replace" -> ((s, dir) =>
      Sampling.sampleNWithReplacement(
          t(s, dir, "orders").select(col("o_orderkey")), 100, seed = 7)),



    // hash-partition into n batches: the partition function itself is
    // engine-local (xxhash64), so the gate pins the invariants — total
    // row conservation, batch ids exactly covering [0, n)
    "q_split_batches" -> ((s, dir) =>
      Sampling.splitBatchesCol(t(s, dir, "orders"), Seq("o_orderkey"), 8, 42L)
        .agg(count(lit(1)).as("total"),
          countDistinct(col("__batch__")).as("n_batches"),
          min(col("__batch__")).as("min_b"), max(col("__batch__")).as("max_b"))),



    // seeded shuffle preserves the exact multiset (order is the ONLY
    // thing allowed to change — re-sorting must recover the input)
    "q_random_shuffle" -> ((s, dir) =>
      Sampling.randomShuffle(
          t(s, dir, "customer").select("c_custkey", "c_mktsegment"), 7L)
        .orderBy("c_custkey")),



    // global distinct-value cap via the md5-portable ranking: the kept
    // value set is identical in any engine, so the semi-join output is
    // fully oracle-comparable
    "q_sample_col_uniq" -> ((s, dir) =>
      Sampling.sampleColumnByMaxUniqValuesPortable(
          t(s, dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment"),
          "c_nationkey", 10, "7")
        .orderBy("c_custkey")),



    // weighted sample without replacement (Efraimidis-Spirakis A-ES):
    // key u^(1/w), top-n by key. The portable variant pins power-of-two
    // weights so the key is a sqrt ladder over the md5 fraction — both
    // correctly-rounded IEEE ops, so the SELECTED SET is bit-identical
    // in DuckDB (a pow()-computed key is ulp-hazardous cross-engine)
    "q_weighted_sample" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        pow(lit(2.0), pmod(col("doc_id"), lit(3)).cast("double"))
          .cast("long").as("w"))
      graft.core.Sampling.weightedSampleNPortable(d, 60, col("w"),
          Seq("doc_id"), seedStr = "9")
        .orderBy("doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(


    "q_sample_group_by_col_value" ->
      """SELECT l_orderkey, l_linenumber, (l_orderkey % 7)::VARCHAR AS bucket7
         FROM lineitem
         WHERE (l_orderkey % 7) <> 3
            OR substr(md5(coalesce(l_orderkey::VARCHAR, chr(0)) || chr(1) || '0'), 1, 2) < '40'
         ORDER BY l_orderkey, l_linenumber""",



    "q_sample_per_class_cap" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, ship_month
         FROM (
           SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, ship_month,
                  dense_rank() OVER (PARTITION BY l_returnflag
                    ORDER BY md5(coalesce(ship_month, chr(0)) || chr(1) || '0'),
                             ship_month) AS dr
           FROM (SELECT *, month(l_shipdate)::VARCHAR AS ship_month FROM lineitem))
         WHERE dr <= CASE WHEN l_linestatus = 'O' THEN 2 ELSE 3 END
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, ship_month""",



    "q_split_batches" ->
      """SELECT count(*) AS total, 8 AS n_batches, 0 AS min_b, 7 AS max_b
         FROM orders""",



    "q_random_shuffle" ->
      "SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey",



    "q_sample_col_uniq" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
         WHERE c_nationkey IN (
           SELECT c_nationkey FROM (SELECT DISTINCT c_nationkey FROM customer)
           ORDER BY md5(c_nationkey::VARCHAR || chr(1) || '7'), c_nationkey
           LIMIT 10)
         ORDER BY c_custkey""",



    "q_weighted_sample" ->
      """WITH s AS (SELECT doc_id, lang,
               CAST(pow(2, doc_id % 3) AS BIGINT) AS w FROM documents),
          r AS (SELECT doc_id, lang, w,
                  (('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '9'),
                    1, 8))::BIGINT / 4294967296.0) AS u FROM s),
          k AS (SELECT doc_id, lang, w,
                  CASE WHEN w = 1 THEN u WHEN w = 2 THEN sqrt(u)
                       ELSE sqrt(sqrt(u)) END AS rnk FROM r),
          top AS (SELECT doc_id, lang, w FROM k
                  ORDER BY rnk DESC, doc_id LIMIT 60)
         SELECT doc_id, lang, w FROM top ORDER BY doc_id""",
  )
}
