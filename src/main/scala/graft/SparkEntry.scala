package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` (same column
 * names, same deterministic ORDER BY). Queries exercise the graft library
 * (XDF / Reshape / Sampling / WindowOps / ...) — not raw Spark — so the
 * correctness gate also gates the library.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)
  private def x(spark: SparkSession, dir: String, name: String): XDF =
    XDF(t(spark, dir, name))

  /** Flagship query on sf=0.001: pricing summary (TPC-H Q1 shape). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_basic")(spark, "/root/testdata/sf0.001")

  // Registries are grouped by operator family (round-numbered history
  // lives in git): core scalar gates below, the LLM-pipeline family in
  // TrainingQueries, reference-parity long tail in ParityQueries, seeded
  // differential gates in FuzzQueries, and the family files for
  // io/columns/sampling/graph/skew/streaming/sketch/range-join/dedup.
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ TrainingQueries.queries ++ ParityQueries.queries ++
      FuzzQueries.queries ++ IoQueries.queries ++ ColumnOpsQueries.queries ++
      SamplingQueries.queries ++ GraphQueries.queries ++ SkewQueries.queries ++
      StreamingQueries.queries ++ SketchQueries.queries ++
      RangeJoinQueries.queries ++ DedupQueries.queries

  def oracleSql: Map[String, String] =
    coreOracleSql ++ TrainingQueries.oracleSql ++ ParityQueries.oracleSql ++
      FuzzQueries.oracleSql ++ IoQueries.oracleSql ++ ColumnOpsQueries.oracleSql ++
      SamplingQueries.oracleSql ++ GraphQueries.oracleSql ++ SkewQueries.oracleSql ++
      StreamingQueries.oracleSql ++ SketchQueries.oracleSql ++
      RangeJoinQueries.oracleSql ++ DedupQueries.oracleSql

  private[graft] def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== §2.2 projections / column ops =====
    "q_select" -> ((s, dir) =>
      x(s, dir, "part").select("p_partkey", "p_name")
        .sort(Seq("p_partkey")).toDF),

    "q_select_regex" -> ((s, dir) =>
      x(s, dir, "lineitem").select("l_.*key", "l_linenumber")
        .sort(Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")).toDF),

    "q_not_select" -> ((s, dir) =>
      x(s, dir, "region").notSelect("r_name").sort(Seq("r_regionkey")).toDF),

    "q_drop_cols" -> ((s, dir) =>
      x(s, dir, "nation").dropCols("n_regionkey").sort(Seq("n_nationkey")).toDF),

    "q_add_const_copy" -> ((s, dir) =>
      x(s, dir, "region").addConst("src", "tpch").copyCol("r_name", "r_name2")
        .sort(Seq("r_regionkey")).toDF),

    "q_add_seq_num" -> ((s, dir) =>
      x(s, dir, "nation").sort(Seq("n_nationkey"))
        .addSeqNum("sno", Seq("n_nationkey")).toDF),

    "q_prefix_rename" -> ((s, dir) =>
      x(s, dir, "region").addPrefix("t").sort(Seq("t:r_regionkey")).toDF),

    // ===== §2.3 filters =====
    "q_filter_eq_str" -> ((s, dir) =>
      x(s, dir, "customer").eqStr("c_mktsegment", "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
        .sort(Seq("c_custkey")).toDF),

    // NOTE on lineitem sorts: (l_orderkey, l_linenumber) is NOT unique in
    // the synthetic fixture (dup pairs at every SF) — every gate must
    // sort by a set of columns that DETERMINES its output row, or tie
    // order diverges between engines and flakes the row-order compare.
    "q_filter_gt_float" -> ((s, dir) =>
      x(s, dir, "lineitem").gtFloat("l_quantity", 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .sort(Seq("l_orderkey", "l_linenumber", "l_quantity")).toDF),

    "q_filter_in" -> ((s, dir) =>
      x(s, dir, "orders").valuesIn("o_orderpriority", Seq("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority").sort(Seq("o_orderkey")).toDF),

    "q_filter_regex" -> ((s, dir) =>
      x(s, dir, "part").regexMatch("p_type", "PROMO")
        .select("p_partkey", "p_type").sort(Seq("p_partkey")).toDF),

    "q_filter_range" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .transform("ship_day", date_format(col("l_shipdate"), "yyyy-MM-dd"))
        .where(col("ship_day") >= "1996-01-01" && col("ship_day") < "1997-01-01")
        .select("l_orderkey", "l_linenumber", "ship_day")
        .sort(Seq("l_orderkey", "l_linenumber", "ship_day")).toDF),

    "q_filter_multi_col_exists" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .filterAnyCols(Seq("l_tax", "l_discount"), _.cast(DoubleType) >= 0.08)
        .select("l_orderkey", "l_linenumber", "l_tax", "l_discount")
        .sort(Seq("l_orderkey", "l_linenumber", "l_tax", "l_discount")).toDF),

    // ===== §2.4 transforms =====
    "q_transform_ratio" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .ratio("disc_tax_ratio", "l_discount", "l_tax", default = -1.0)
        .transform("disc_tax_ratio", round(col("disc_tax_ratio"), 4))
        .select("l_orderkey", "l_linenumber", "disc_tax_ratio")
        .sort(Seq("l_orderkey", "l_linenumber", "disc_tax_ratio")).toDF),

    "q_transform_log" -> ((s, dir) =>
      x(s, dir, "orders")
        .transform("log_price", round(log1p(col("o_totalprice")), 6))
        .select("o_orderkey", "log_price").sort(Seq("o_orderkey")).toDF),

    "q_apply_precision" -> ((s, dir) =>
      x(s, dir, "orders").applyPrecision("o_totalprice", 2)
        .select("o_orderkey", "o_totalprice").sort(Seq("o_orderkey")).toDF),

    "q_cap_clamp" -> ((s, dir) =>
      x(s, dir, "lineitem").capMaxInline("l_quantity", 25.0)
        .capMinInline("l_quantity", 5.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .sort(Seq("l_orderkey", "l_linenumber", "l_quantity")).toDF),

    "q_if_else" -> ((s, dir) =>
      x(s, dir, "orders")
        .transform("bucket",
          when(col("o_totalprice") >= 200000, "high")
            .when(col("o_totalprice") >= 100000, "mid").otherwise("low"))
        .select("o_orderkey", "bucket").sort(Seq("o_orderkey")).toDF),

    // ===== §2.6 aggregations =====
    "q_agg_basic" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .aggregate(Seq("l_returnflag", "l_linestatus"),
          Seq("l_quantity", "l_extendedprice", "l_quantity"),
          Seq("sum", "mean", "count"))
        .transform("l_quantity:sum", round(col("l_quantity:sum"), 2))
        .transform("l_extendedprice:mean", round(col("l_extendedprice:mean"), 2))
        .sort(Seq("l_returnflag", "l_linestatus")).toDF),

    "q_agg_funcs" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .aggregate(Seq("l_returnflag"),
          Seq("l_quantity", "l_quantity", "l_extendedprice", "l_orderkey"),
          Seq("minint", "maxint", "std_dev", "uniq_count"))
        .transform("l_extendedprice:std_dev", round(col("l_extendedprice:std_dev"), 2))
        .sort(Seq("l_returnflag")).toDF),

    "q_agg_mkstr" -> ((s, dir) =>
      x(s, dir, "nation")
        .aggregate(Seq("n_regionkey"), Seq("n_name"), Seq("uniq_mkstr"))
        .sort(Seq("n_regionkey")).toDF),

    "q_group_count" -> ((s, dir) =>
      x(s, dir, "orders").groupCount("o_orderpriority").toDF),

    "q_arg_max" -> ((s, dir) =>
      x(s, dir, "orders")
        .sampleGroupByTopk(Seq("o_orderpriority"), "o_totalprice", 1)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .sort(Seq("o_orderpriority")).toDF),

    "q_distinct" -> ((s, dir) =>
      x(s, dir, "lineitem").distinctCols("l_returnflag", "l_linestatus")
        .sort(Seq("l_returnflag", "l_linestatus")).toDF),

    "q_agg_collapse_false" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .aggregate(Seq("l_returnflag"), Seq("l_quantity"), Seq("sum"),
          collapse = false)
        .transform("l_quantity:sum", round(col("l_quantity:sum"), 2))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity:sum")
        .sort(Seq("l_orderkey", "l_linenumber", "l_returnflag")).toDF),

    "q_cumulative_sum" -> ((s, dir) =>
      x(s, dir, "orders")
        .cumulativeSum("o_totalprice", "running_total",
          orderCols = Seq("o_orderdate", "o_orderkey"),
          partitionCols = Seq("o_custkey"))
        .transform("running_total", round(col("running_total"), 2))
        .select("o_custkey", "o_orderkey", "running_total")
        .sort(Seq("o_custkey", "o_orderkey")).toDF),

    "q_topk_per_group" -> ((s, dir) =>
      x(s, dir, "orders")
        .sampleGroupByTopk(Seq("o_custkey"), "o_totalprice", 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .sort(Seq("o_custkey", "o_orderkey")).toDF),

    // ===== §2.5 joins =====
    "q_inner_join" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .innerJoin(x(s, dir, "orders"), Seq("l_orderkey"), Seq("o_orderkey"))
        .aggregate(Seq("o_orderpriority"), Seq("l_extendedprice"), Seq("sum"))
        .transform("l_extendedprice:sum", round(col("l_extendedprice:sum"), 2))
        .sort(Seq("o_orderpriority")).toDF),

    "q_left_join" -> ((s, dir) =>
      x(s, dir, "customer")
        .leftJoin(x(s, dir, "orders"), Seq("c_custkey"), Seq("o_custkey"))
        .aggregate(Seq("c_custkey", "c_name"), Seq("o_orderkey"), Seq("get_non_empty_len"))
        .rename("o_orderkey:get_non_empty_len", "n_orders")
        .sort(Seq("c_custkey")).toDF),

    "q_map_join" -> ((s, dir) =>
      x(s, dir, "lineitem")
        .innerMapJoin(x(s, dir, "part"), Seq("l_partkey"), Seq("p_partkey"))
        .aggregate(Seq("p_brand"), Seq("l_quantity"), Seq("sum"))
        .transform("l_quantity:sum", round(col("l_quantity:sum"), 2))
        .sort(Seq("p_brand")).toDF),

    "q_natural_join" -> ((s, dir) =>
      XDF(t(s, dir, "nation").withColumnRenamed("n_regionkey", "r_regionkey"))
        .naturalJoin(x(s, dir, "region"))
        .select("n_nationkey", "n_name", "r_regionkey", "r_name")
        .sort(Seq("n_nationkey")).toDF),

    "q_semi_join" -> ((s, dir) =>
      XDF(t(s, dir, "customer"))
        .semiJoin(XDF(t(s, dir, "orders").withColumnRenamed("o_custkey", "c_custkey")),
          Seq("c_custkey"))
        .select("c_custkey", "c_name").sort(Seq("c_custkey")).toDF),

    // anti-join against the URGENT subset: every customer HAS an order
    // below sf0.1, so the unfiltered variant compared empty-to-empty at
    // the driver's gate SF — ~13% of customers lack an urgent order at
    // every SF, which is an anti-join that can actually fail
    "q_anti_join" -> ((s, dir) =>
      XDF(t(s, dir, "customer"))
        .antiJoin(XDF(t(s, dir, "orders")
            .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
            .withColumnRenamed("o_custkey", "c_custkey")),
          Seq("c_custkey"))
        .select("c_custkey", "c_name").sort(Seq("c_custkey")).toDF),

    "q_multiway_join" -> ((s, dir) =>
      x(s, dir, "supplier")
        .innerMapJoin(x(s, dir, "nation"), Seq("s_nationkey"), Seq("n_nationkey"))
        .innerMapJoin(x(s, dir, "region"), Seq("n_regionkey"), Seq("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "r_name")
        .sort(Seq("s_suppkey")).toDF),

    // ===== §2.7 set ops =====
    "q_union" -> ((s, dir) => {
      val urgent = x(s, dir, "orders").eqStr("o_orderpriority", "1-URGENT")
      val high = x(s, dir, "orders").eqStr("o_orderpriority", "2-HIGH")
      urgent.union(high).select("o_orderkey", "o_orderpriority")
        .sort(Seq("o_orderkey")).toDF
    }),

    "q_merge_union" -> ((s, dir) => {
      val a = x(s, dir, "nation").select("n_nationkey", "n_name")
      val b = x(s, dir, "nation").select("n_nationkey", "n_regionkey")
      a.mergeUnion(Seq(b), defValMap = Map("n_name" -> "", "n_regionkey" -> "-1"))
        .sort(Seq("n_nationkey", "n_name", "n_regionkey")).toDF
    }),

    "q_difference" -> ((s, dir) => {
      val all = x(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val bld = x(s, dir, "customer").eqStr("c_mktsegment", "BUILDING")
        .select("c_custkey", "c_mktsegment")
      all.difference(bld).sort(Seq("c_custkey")).toDF
    }),

    "q_intersect" -> ((s, dir) => {
      val a = x(s, dir, "orders").gtFloat("o_totalprice", 100000.0)
        .select("o_custkey").distinct()
      val b = x(s, dir, "orders").eqStr("o_orderstatus", "O")
        .select("o_custkey").distinct()
      a.intersectRows(b).sort(Seq("o_custkey")).toDF
    }),

    // ===== §2.8 reshape =====
    "q_explode_split" -> ((s, dir) =>
      XDF(Reshape.splitStr(t(s, dir, "documents"), Seq("text"), " ", "tok"))
        .aggregate(Seq("lang"), Seq("tok:text"), Seq("uniq_count"))
        .rename("tok:text:uniq_count", "n_uniq_tokens")
        .sort(Seq("lang")).toDF),

    "q_explode_json" -> ((s, dir) =>
      x(s, dir, "events")
        .transform("k", get_json_object(col("props"), "$.k").cast(LongType))
        .aggregate(Seq("event_type"), Seq("k", "k"), Seq("sum", "count"))
        .rename("k:sum", "sum_k").rename("k:count", "n")
        .transform("sum_k", col("sum_k").cast(LongType))
        .sort(Seq("event_type")).toDF),

    "q_pivot" -> ((s, dir) =>
      XDF(Reshape.reverseTranspose(t(s, dir, "lineitem"),
          Seq("l_linestatus"), "l_returnflag", "l_quantity",
          values = Seq("A", "N", "R"), aggFunc = "sum"))
        .transformInline(Seq("l_quantity:l_returnflag:A", "l_quantity:l_returnflag:N",
            "l_quantity:l_returnflag:R"),
          c => round(coalesce(c, lit(0.0)), 2))
        .sort(Seq("l_linestatus")).toDF),

    "q_replicate_rows" -> ((s, dir) =>
      XDF(Reshape.replicateRows(t(s, dir, "nation"), "n_regionkey"))
        .select("n_nationkey", "n_regionkey")
        .sort(Seq("n_nationkey")).toDF),

    // ===== §2.9/§2.10 sort / sample =====
    "q_sort_take" -> ((s, dir) =>
      XDF(t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc))
        .take(100).select("o_orderkey", "o_totalprice")
        .sort(Seq("o_orderkey")).toDF),

    "q_sample_hash" -> ((s, dir) =>
      // deterministic md5 hash-gate sample (~25%): expressible identically
      // in DuckDB, unlike seeded RNG - see Sampling scaladoc
      x(s, dir, "orders")
        .where(substring(md5(col("o_orderkey").cast(StringType)), 1, 2) < "40")
        .select("o_orderkey", "o_totalprice").sort(Seq("o_orderkey")).toDF),

    // ===== §2.12 windows =====
    "q_window_tumbling" -> ((s, dir) =>
      XDF(WindowOps.tumblingTimeAggregate(t(s, dir, "events"), "ts", "1 hour",
          Seq("event_type"), Seq("value", "value"), Seq("sum", "count")))
        .transform("hour", date_format(col("window_start"), "yyyy-MM-dd HH:mm"))
        .transform("value:sum", round(col("value:sum"), 2))
        .select("hour", "event_type", "value:sum", "value:count")
        .sort(Seq("hour", "event_type")).toDF),

    "q_window_aggregate_ref" -> ((s, dir) =>
      XDF(WindowOps.windowAggregate(
          t(s, dir, "orders")
            .withColumn("o_date", date_format(col("o_orderdate"), "yyyy-MM-dd")),
          "o_date", Seq("o_totalprice"), Seq("sum"), winSize = 100))
        .transform("o_totalprice:sum", round(col("o_totalprice:sum"), 2))
        .sort(Seq("o_date:window")).toDF),
  )

  private def coreOracleSql: Map[String, String] = Map(
    "q_select" ->
      "SELECT p_partkey, p_name FROM part ORDER BY p_partkey",

    "q_select_regex" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem
         ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""",

    "q_not_select" ->
      "SELECT r_regionkey FROM region ORDER BY r_regionkey",

    "q_drop_cols" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",

    "q_add_const_copy" ->
      """SELECT r_regionkey, r_name, 'tpch' AS src, r_name AS r_name2
         FROM region ORDER BY r_regionkey""",

    "q_add_seq_num" ->
      """SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS INT) AS sno,
                n_nationkey, n_name, n_regionkey
         FROM nation ORDER BY n_nationkey""",

    "q_prefix_rename" ->
      """SELECT r_regionkey AS "t:r_regionkey", r_name AS "t:r_name"
         FROM region ORDER BY "t:r_regionkey"""",

    "q_filter_eq_str" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""",

    "q_filter_gt_float" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 45.0
         ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "q_filter_in" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey""",

    "q_filter_regex" ->
      """SELECT p_partkey, p_type FROM part
         WHERE regexp_matches(p_type, '^PROMO') ORDER BY p_partkey""",

    "q_filter_range" ->
      """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         ORDER BY l_orderkey, l_linenumber, ship_day""",

    "q_filter_multi_col_exists" ->
      """SELECT l_orderkey, l_linenumber, l_tax, l_discount FROM lineitem
         WHERE l_tax >= 0.08 OR l_discount >= 0.08
         ORDER BY l_orderkey, l_linenumber, l_tax, l_discount""",

    "q_transform_ratio" ->
      """SELECT l_orderkey, l_linenumber,
                CASE WHEN l_tax = 0 THEN -1.0 ELSE round(l_discount / l_tax, 4) END AS disc_tax_ratio
         FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_tax_ratio""",

    "q_transform_log" ->
      """SELECT o_orderkey, round(ln(1 + o_totalprice), 6) AS log_price
         FROM orders ORDER BY o_orderkey""",

    "q_apply_precision" ->
      """SELECT o_orderkey, printf('%.2f', o_totalprice) AS o_totalprice
         FROM orders ORDER BY o_orderkey""",

    "q_cap_clamp" ->
      """SELECT l_orderkey, l_linenumber,
                greatest(least(l_quantity, 25.0), 5.0) AS l_quantity
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "q_if_else" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice >= 200000 THEN 'high'
                     WHEN o_totalprice >= 100000 THEN 'mid' ELSE 'low' END AS bucket
         FROM orders ORDER BY o_orderkey""",

    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS "l_quantity:sum",
                round(avg(l_extendedprice), 2) AS "l_extendedprice:mean",
                count(l_quantity) AS "l_quantity:count"
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_agg_funcs" ->
      """SELECT l_returnflag,
                CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS "l_quantity:minint",
                CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS "l_quantity:maxint",
                round(stddev_samp(l_extendedprice), 2) AS "l_extendedprice:std_dev",
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS "l_orderkey:uniq_count"
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_mkstr" ->
      """SELECT n_regionkey,
                string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS "n_name:uniq_mkstr"
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "q_group_count" ->
      """SELECT o_orderpriority,
                count(*) AS "o_orderpriority:count",
                printf('%.6f', count(*) / CAST(sum(count(*)) OVER () AS DOUBLE))
                  AS "o_orderpriority:ratio"
         FROM orders GROUP BY o_orderpriority
         ORDER BY "o_orderpriority:count" DESC, o_orderpriority""",

    "q_arg_max" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey, o_custkey, o_orderstatus,
                             o_orderdate, o_orderpriority) AS rn
           FROM orders) WHERE rn = 1 ORDER BY o_orderpriority""",

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",

    "q_agg_collapse_false" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                round(sum(l_quantity) OVER (PARTITION BY l_returnflag), 2)
                  AS "l_quantity:sum"
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_returnflag""",

    "q_cumulative_sum" ->
      """SELECT o_custkey, o_orderkey,
                round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey, o_custkey, o_orderstatus,
                             o_orderdate, o_orderpriority) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""",

    "q_inner_join" ->
      """SELECT o_orderpriority, round(sum(l_extendedprice), 2) AS "l_extendedprice:sum"
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_left_join" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",

    "q_map_join" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS "l_quantity:sum"
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q_natural_join" ->
      """SELECT n_nationkey, n_name, n_regionkey AS r_regionkey, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey""",

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""",

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "q_multiway_join" ->
      """SELECT s_suppkey, s_name, n_name, r_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         ORDER BY s_suppkey""",

    "q_union" ->
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
         UNION ALL
         SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
         ORDER BY o_orderkey""",

    "q_merge_union" ->
      """SELECT * FROM (
           SELECT n_nationkey, n_name, '-1' AS n_regionkey FROM nation
           UNION ALL
           SELECT n_nationkey, '' AS n_name, CAST(n_regionkey AS VARCHAR) AS n_regionkey
           FROM nation)
         ORDER BY n_nationkey, n_name, n_regionkey""",

    "q_difference" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         EXCEPT
         SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
         ORDER BY c_custkey""",

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey""",

    "q_explode_split" ->
      """SELECT lang, count(DISTINCT tok) AS n_uniq_tokens
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY lang ORDER BY lang""",

    "q_explode_json" ->
      """SELECT event_type,
                CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
                count(props->>'k') AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_pivot" ->
      """SELECT l_linestatus,
                round(coalesce(sum(CASE WHEN l_returnflag='A' THEN l_quantity END), 0), 2)
                  AS "l_quantity:l_returnflag:A",
                round(coalesce(sum(CASE WHEN l_returnflag='N' THEN l_quantity END), 0), 2)
                  AS "l_quantity:l_returnflag:N",
                round(coalesce(sum(CASE WHEN l_returnflag='R' THEN l_quantity END), 0), 2)
                  AS "l_quantity:l_returnflag:R"
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q_replicate_rows" ->
      """SELECT n_nationkey, n_regionkey
         FROM nation JOIN range(1, 1000) r ON r.range <= n_regionkey
         ORDER BY n_nationkey""",

    "q_sort_take" ->
      """SELECT o_orderkey, o_totalprice FROM
           (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
         ORDER BY o_orderkey""",

    "q_sample_hash" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '40'
         ORDER BY o_orderkey""",

    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
                round(sum(value), 2) AS "value:sum",
                count(value) AS "value:count"
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    "q_window_aggregate_ref" ->
      """WITH d AS (
           SELECT strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice FROM orders),
         r AS (SELECT DISTINCT o_date FROM d),
         w AS (SELECT o_date,
                      CAST(floor((row_number() OVER (ORDER BY o_date) - 1) / 100) AS BIGINT) AS win
               FROM r)
         SELECT concat(min(d.o_date), ' - ', max(d.o_date)) AS "o_date:window",
                round(sum(d.o_totalprice), 2) AS "o_totalprice:sum"
         FROM d JOIN w USING (o_date)
         GROUP BY w.win ORDER BY "o_date:window"""",
  )
}
