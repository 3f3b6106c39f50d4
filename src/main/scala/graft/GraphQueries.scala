package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Graph-operator gates: forward-edge contracts, time-respecting
 * variants, edge filters, cycle removal, leaf merging.
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object GraphQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cyclicEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      concat(lit("c"), col("o_custkey") % 20).as("src"),
      concat(lit("c"), col("o_orderkey") % 20).as("target"),
      (col("o_orderkey") % 1000).as("ts"))

  private def treeEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(
        concat(lit("r"), col("n_regionkey")).as("src"),
        concat(lit("n"), col("n_nationkey")).as("target"))
      .union(t(s, dir, "supplier").filter(col("s_suppkey") <= 100).select(
        concat(lit("n"), col("s_nationkey")).as("src"),
        concat(lit("s"), col("s_suppkey")).as("target")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(



    // ===== full get_forward_edges_only contract over a diamond DAG:
    // region->nation->supplier plus direct region->supplier edges =====
    "q_graph_forward_edges" -> ((s, dir) => {
      val rn = t(s, dir, "nation").select(
        concat(lit("r"), col("n_regionkey")).as("src"),
        concat(lit("n"), col("n_nationkey")).as("target"))
      val ns = t(s, dir, "supplier").filter(col("s_suppkey") <= 100).select(
        concat(lit("n"), col("s_nationkey")).as("src"),
        concat(lit("s"), col("s_suppkey")).as("target"))
      val rs = t(s, dir, "supplier").filter(col("s_suppkey") <= 100).select(
        concat(lit("r"), col("s_suppkey") % 5).as("src"),
        concat(lit("s"), col("s_suppkey")).as("target"))
      GraphOps.forwardEdgesOnly(rn.union(ns).union(rs), "fwd")
        .orderBy("src", "target")
    }),



    // ===== time-based forward edges: chain with mixed timestamps, so
    // time-respecting reachability is a strict subset of reachability =====
    "q_graph_time_forward" -> ((s, dir) => {
      val e = t(s, dir, "nation").select(
        concat(lit("a"), col("n_nationkey")).as("src"),
        concat(lit("a"), col("n_nationkey") + 1).as("target"),
        (col("n_nationkey") * 3 % 7).as("ts"))
      GraphOps.timeBasedForwardEdgesOnly(e, "ts", "tfwd")
        .orderBy("src", "target")
    }),



    // ===== split_graph_filter: retention windows around detections =====
    "q_graph_split_filter" -> ((s, dir) => {
      val e = t(s, dir, "lineitem").select(
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("target"),
        col("l_orderkey").as("ts"))
      val retained = t(s, dir, "part").filter(col("p_partkey") < 50)
        .select(concat(lit("p"), col("p_partkey")).as("node_id"),
          (col("p_partkey") * 100).as("ts_min"),
          (col("p_partkey") * 1000).as("ts_max"))
      GraphOps.splitGraphFilter(e, "ts", retained, _ => lit(false))
        .orderBy("src", "target", "ts")
    }),



    // ===== apply_time_order_based_filter: prune edges whose every
    // adjacent pairing violates time order (strict variant) =====
    "q_graph_time_order_filter" -> ((s, dir) => {
      val e = t(s, dir, "nation").select(
        concat(lit("a"), col("n_nationkey")).as("src"),
        concat(lit("a"), col("n_nationkey") + 1).as("target"),
        when(col("n_nationkey") % 4 === 0, lit(1000))
          .otherwise(col("n_nationkey")).as("ts"))
      GraphOps.applyTimeOrderBasedFilter(e, "ts", Nil, strictOrdering = true)
        .orderBy("src", "target")
    }),



    // ===== remove_cycles: drop edges departing a node before its first
    // observed arrival (DAG-izing filter for event graphs) =====
    "q_graph_remove_cycles" -> ((s, dir) =>
      GraphOps.removeCycles(cyclicEdges(s, dir), "ts")
        .orderBy("src", "target", "ts")),



    // ===== merge_similar_leaf_nodes: leaves sharing (parent, key) merge
    // into one grp node with a count; similarity key = last char =====
    "q_graph_merge_leaves" -> ((s, dir) =>
      GraphOps.mergeSimilarLeafNodes(treeEdges(s, dir),
          _ => substring(col("target"), -1, 1))
        .orderBy("src", "target", "merged_count")),
  )

  def oracleSql: Map[String, String] = Map(


    "q_graph_forward_edges" ->
      """WITH RECURSIVE edges AS (
           SELECT 'r' || n_regionkey AS src, 'n' || n_nationkey AS target FROM nation
           UNION ALL
           SELECT 'n' || s_nationkey, 's' || s_suppkey FROM supplier WHERE s_suppkey <= 100
           UNION ALL
           SELECT 'r' || (s_suppkey % 5), 's' || s_suppkey FROM supplier WHERE s_suppkey <= 100
         ),
         anc AS (
           SELECT target AS node, src AS a FROM edges
           UNION
           SELECT anc.node, e.src FROM anc JOIN edges e ON anc.a = e.target
         ),
         paths AS (
           SELECT target AS dest, target AS head, target::VARCHAR AS path
           FROM (SELECT DISTINCT target FROM edges)
           UNION ALL
           SELECT p.dest, e.src, p.path || ',' || e.src
           FROM paths p JOIN edges e ON p.head = e.target
         ),
         sp AS (SELECT node, string_agg(DISTINCT a, ',' ORDER BY a) AS s FROM anc GROUP BY node),
         ap AS (SELECT dest, string_agg(DISTINCT path, '|' ORDER BY path) AS s
                FROM paths WHERE head NOT IN (SELECT target FROM edges) GROUP BY dest)
         SELECT e.src, e.target,
                coalesce(sp.s, '') AS "fwd:src_paths",
                coalesce(sp.s, '') AS "fwd:all_paths",
                coalesce(ap.s, '') AS "fwd:ancestors"
         FROM edges e
         LEFT JOIN sp ON sp.node = e.target
         LEFT JOIN ap ON ap.dest = e.target
         ORDER BY e.src, e.target""",



    "q_graph_time_forward" ->
      """WITH RECURSIVE e AS (
           SELECT 'a' || n_nationkey AS src, 'a' || (n_nationkey + 1) AS target,
                  (n_nationkey * 3) % 7 AS ts
           FROM nation
         ),
         tr AS (
           SELECT target AS node, src AS anc, ts AS last FROM e
           UNION
           SELECT e.target, tr.anc, e.ts FROM tr JOIN e
             ON e.src = tr.node AND e.ts >= tr.last
         ),
         allr AS (
           SELECT target AS node, src AS anc FROM e
           UNION
           SELECT allr.node, e.src FROM allr JOIN e ON allr.anc = e.target
         ),
         tp AS (SELECT node, string_agg(DISTINCT anc, ',' ORDER BY anc) AS s FROM tr GROUP BY node),
         ap AS (SELECT node, string_agg(DISTINCT anc, ',' ORDER BY anc) AS s FROM allr GROUP BY node)
         SELECT e.src, e.target, e.ts,
                coalesce(tp.s, '') AS "tfwd:src_paths",
                coalesce(ap.s, '') AS "tfwd:all_paths"
         FROM e
         LEFT JOIN tp ON tp.node = e.target
         LEFT JOIN ap ON ap.node = e.target
         ORDER BY e.src, e.target""",



    "q_graph_split_filter" ->
      """WITH e AS (
           SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS target,
                  l_orderkey AS ts
           FROM lineitem
         ),
         ret AS (
           SELECT 'p' || p_partkey AS node_id, p_partkey * 100 AS ts_min,
                  p_partkey * 1000 AS ts_max
           FROM part WHERE p_partkey < 50
         )
         SELECT e.src, e.target, e.ts
         FROM e
         LEFT JOIN ret rs ON e.src = rs.node_id
         LEFT JOIN ret rt ON e.target = rt.node_id
         WHERE (rs.node_id IS NULL AND rt.node_id IS NULL)
            OR (rs.node_id IS NOT NULL AND rt.node_id IS NOT NULL)
            OR (rt.node_id IS NOT NULL AND e.ts <= rt.ts_max)
            OR (rs.node_id IS NOT NULL AND e.ts >= rs.ts_min)
         ORDER BY e.src, e.target, e.ts""",



    "q_graph_time_order_filter" ->
      """WITH e AS (
           SELECT 'a' || n_nationkey AS src, 'a' || (n_nationkey + 1) AS target,
                  CASE WHEN n_nationkey % 4 = 0 THEN 1000 ELSE n_nationkey END AS ts
           FROM nation
         ),
         mm AS (SELECT src, target, min(ts) AS ts_min, max(ts) AS ts_max
                FROM e GROUP BY src, target),
         p AS (SELECT l.src AS l_src, l.target AS l_tgt,
                      r.src AS r_src, r.target AS r_tgt,
                      CASE WHEN l.ts_min <= r.ts_max THEN 1 ELSE 0 END AS ok
               FROM mm l JOIN mm r ON l.target = r.src),
         lf AS (SELECT l_src, l_tgt, max(ok) AS l_any FROM p GROUP BY l_src, l_tgt),
         rf AS (SELECT r_src, r_tgt, max(ok) AS r_any FROM p GROUP BY r_src, r_tgt),
         x AS (SELECT DISTINCT p.r_src AS src, p.r_tgt AS target
               FROM p JOIN lf ON p.l_src = lf.l_src AND p.l_tgt = lf.l_tgt
                      JOIN rf ON p.r_src = rf.r_src AND p.r_tgt = rf.r_tgt
               WHERE p.ok = 0 AND (lf.l_any = 0 OR rf.r_any = 0))
         SELECT e.src, e.target, e.ts FROM e
         WHERE NOT EXISTS (SELECT 1 FROM x WHERE x.src = e.src AND x.target = e.target)
         ORDER BY e.src, e.target""",


    "q_graph_remove_cycles" ->
      """WITH e AS (
           SELECT 'c' || (o_custkey % 20) AS src,
                  'c' || (o_orderkey % 20) AS target,
                  o_orderkey % 1000 AS ts
           FROM orders
         ),
         fs AS (SELECT target AS node_id, min(ts) AS first_in FROM e GROUP BY target)
         SELECT e.src, e.target, e.ts
         FROM e LEFT JOIN fs ON e.src = fs.node_id
         WHERE fs.first_in IS NULL OR fs.first_in <= e.ts
         ORDER BY src, target, ts""",



    "q_graph_merge_leaves" ->
      """WITH e AS (
           SELECT 'r' || n_regionkey AS src, 'n' || n_nationkey AS target FROM nation
           UNION ALL
           SELECT 'n' || s_nationkey, 's' || s_suppkey FROM supplier WHERE s_suppkey <= 100
         ),
         srcs AS (SELECT DISTINCT src FROM e)
         SELECT src, target, merged_count FROM (
           SELECT e.src, e.target, 1::BIGINT AS merged_count
           FROM e WHERE e.target IN (SELECT src FROM srcs)
           UNION ALL
           SELECT e.src, 'grp:' || e.src || ':' || right(e.target, 1),
                  count(*)::BIGINT
           FROM e WHERE e.target NOT IN (SELECT src FROM srcs)
           GROUP BY e.src, right(e.target, 1)
         )
         ORDER BY src, target, merged_count""",
  )
}
