package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Sampling
import graft.operators.{Dedup, GraphOps}

/**
 * Round-2 correctness-gate queries: the planted hot-bucket dedup
 * fixture, the sampling long tail (sample_group_by_col_value,
 * sample_group_by_max_uniq_values_per_class, sample_n with
 * replacement), and the graph long tail (full get_forward_edges_only
 * contract, time-based variant, edge filters). Merged into
 * SparkEntry.queries.
 */
object Round2Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Planted corpus: one hot cluster of `hot` identical docs plus
    * `distinctN` mutually-dissimilar docs (disjoint shingle sets). The
    * dedup survivors are closed-form: doc 0 + every distinct doc. */
  private def hotCorpus(s: SparkSession, hot: Int, distinctN: Int): DataFrame =
    s.range(0, hot + distinctN).select(col("id").as("doc_id"),
      when(col("id") < hot,
          lit("the same boilerplate page body repeated verbatim across the corpus"))
        .otherwise(concat_ws(" ",
          concat(lit("alpha"), col("id")), concat(lit("beta"), col("id")),
          concat(lit("gamma"), col("id")), concat(lit("delta"), col("id")),
          concat(lit("epsilon"), col("id")))).as("text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== dedup under a planted hot bucket: 100k identical docs share
    // every LSH band bucket; survivors = min id of the hot cluster plus
    // all mutually-dissimilar docs. The per-bucket min is a map-side
    // combinable groupBy — no window, no single-task bucket. =====
    "q_dedup_hot_bucket" -> ((s, _) =>
      Dedup.minhashDedup(hotCorpus(s, 100000, 500), "doc_id", "text")
        .select(col("doc_id")).orderBy("doc_id")),

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
  )

  def oracleSql: Map[String, String] = Map(
    // survivors are closed-form for the planted corpus: the hot cluster
    // collapses to its min id, every distinct doc survives
    "q_dedup_hot_bucket" ->
      """SELECT i::BIGINT AS doc_id FROM range(0, 100500) t(i)
         WHERE i = 0 OR i >= 100000 ORDER BY doc_id""",

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
  )
}
