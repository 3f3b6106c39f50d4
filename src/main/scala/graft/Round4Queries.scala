package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, Skew}
import graft.streaming.StreamOps

/**
 * Round-4 correctness gates for operators that were previously
 * spec-only: removeCycles, mergeSimilarLeafNodes (reference
 * graph_traversal.py:288-342, 344-444), the salted-aggregate/join skew
 * tooling, and the sessionize batch twin (gaps-and-islands oracle).
 * Merged into SparkEntry.queries.
 */
object Round4Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Dense cyclic event graph derived from orders (custkey/orderkey mod
    * rings), with a bounded ts so first-incoming minima are stable. */
  private def cyclicEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      concat(lit("c"), col("o_custkey") % 20).as("src"),
      concat(lit("c"), col("o_orderkey") % 20).as("target"),
      (col("o_orderkey") % 1000).as("ts"))

  /** region->nation->supplier tree: suppliers (and childless nations)
    * are leaves — the mergeSimilarLeafNodes input shape. */
  private def treeEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(
        concat(lit("r"), col("n_regionkey")).as("src"),
        concat(lit("n"), col("n_nationkey")).as("target"))
      .union(t(s, dir, "supplier").filter(col("s_suppkey") <= 100).select(
        concat(lit("n"), col("s_nationkey")).as("src"),
        concat(lit("s"), col("s_suppkey")).as("target")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // ===== salted two-phase aggregation: result must equal the plain
    // groupBy whatever the salt draw (l_quantity is integer-valued, so
    // double sums are order-exact) =====
    "q_salted_agg" -> ((s, dir) =>
      Skew.saltedSumCount(t(s, dir, "lineitem"), Seq("l_returnflag"),
          "l_quantity", saltBuckets = 16)
        .orderBy("l_returnflag")),

    // ===== salted join: replicate-right/salt-left must equal the plain
    // inner join =====
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val p = t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      Skew.saltedJoin(li, p, Seq("l_partkey"), saltBuckets = 8)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "p_name")
    }),

    // ===== plain (UN-salted) join on a planted 90%-hot key: the path a
    // 100-TB user hits first, surviving via AQE's runtime skew-split
    // rather than manual salting. 90% of lineitem rows land on skey=0;
    // the merge hint keeps the small right side from broadcasting the
    // demo away; the aggregate groups on a DIFFERENT key than the join,
    // so its exchange exists regardless and AQE's OptimizeSkewedJoin can
    // split the hot partition without introducing an extra shuffle.
    // SkewSpec asserts the split actually happens under production-shaped
    // thresholds; this gate pins the VALUES equal the plain join =====
    // (the right side must be a BARE scan — an aggregate/distinct between
    // the shuffle and the join's Sort breaks OptimizeSkewedJoin's
    // pattern match and silently forfeits the split; nation's keys are
    // already unique)
    "q_skew_aqe_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 =!= 0, lit(0L))
          .otherwise(col("l_orderkey") % 24 + 1).as("skey"),
        col("l_quantity"))
      val r = t(s, dir, "nation")
        .select(col("n_nationkey").as("rkey"), col("n_regionkey").as("cat"))
      l.hint("merge").join(r, col("skey") === col("rkey"))
        .groupBy("cat")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("cat")
    }),

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
  )

  def oracleSql: Map[String, String] = Map(
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

    "q_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum, count(*)::BIGINT AS count
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_name
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         ORDER BY l_orderkey, l_linenumber, l_partkey, p_name""",

    "q_skew_aqe_join" ->
      """WITH l AS (SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
                               ELSE l_orderkey % 24 + 1 END AS skey,
                          l_quantity FROM lineitem)
         SELECT n_regionkey AS cat, CAST(count(*) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_qty
         FROM l JOIN nation ON skey = n_nationkey
         GROUP BY n_regionkey ORDER BY cat""",

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
  )
}
