package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Skew-handling gates: salted aggregate/join tooling plus the plain
 * un-salted join rescued by AQE's runtime skew split (see SkewSpec).
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object SkewQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(



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
  )

  def oracleSql: Map[String, String] = Map(


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
  )
}
