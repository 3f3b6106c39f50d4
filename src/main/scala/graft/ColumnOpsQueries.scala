package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Projection / filter / transform / reshape / sort-topk gates over the
 * scalar column surface.
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object ColumnOpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

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

    // ===== reorder / reverse_reorder (round 11: upgraded from spec-only
    // to oracle-gated): the driver compare sorts columns by NAME, so
    // column order is encoded into a VALUE — a csv of each row in the
    // post-reorder column order. A wrong order changes the csv. =====
    "q_reorder" -> ((s, dir) => {
      val front = XDF(t(s, dir, "nation")).reorder("n_regionkey")
      val back = XDF(t(s, dir, "nation")).reverseReorder("n_nationkey")
      val fcsv = concat_ws(",", front.getHeader.map(c => col(c).cast(StringType)): _*)
      val bcsv = concat_ws(",", back.getHeader.map(c => col(c).cast(StringType)): _*)
      front.toDF.select(col("n_nationkey"), fcsv.as("front_csv"))
        .join(back.toDF.select(col("n_nationkey"), bcsv.as("back_csv")),
          Seq("n_nationkey"))
        .orderBy("n_nationkey")
    }),

    // ===== assign_value: constant overwrite of an existing column =====
    "q_assign_value" -> ((s, dir) =>
      XDF(t(s, dir, "region")).assignValue("r_name", "REDACTED")
        .sort(Seq("r_regionkey")).toDF),

    // ===== is_nonzero_int / is_nonzero_float: int(float(x)) != 0
    // semantics on a derived signed column =====
    "q_is_nonzero" -> ((s, dir) =>
      XDF(t(s, dir, "lineitem")
          .withColumn("qdev", col("l_quantity") - 25))
        .isNonzeroInt("qdev").isNonzeroFloat("l_tax")
        .select("l_orderkey", "l_linenumber", "qdev", "l_tax")
        .sort(Seq("l_orderkey", "l_linenumber", "qdev", "l_tax")).toDF),

    // ===== startswith / endswith ± not (reference dataframe.py prefix
    // predicates): chained on a string column AND a numeric column to
    // pin the cast-to-string semantics (startswith("p_partkey","1")
    // means the RENDERED key starts with '1') =====
    "q_startswith" -> ((s, dir) =>
      XDF(t(s, dir, "part"))
        .startswith("p_type", "STANDARD")
        .notEndswith("p_brand", "3")
        .startswith("p_partkey", "1")
        .select("p_partkey", "p_type", "p_brand")
        .sort(Seq("p_partkey")).toDF),

    // ===== flatmap: per-row list fan-out from a Column expression
    // (Reshape.flatmapCol = one explode, no driver loop); oracle is
    // DuckDB unnest over the same split =====
    "q_flatmap" -> ((s, dir) =>
      Reshape.flatmapCol(
          t(s, dir, "part").select("p_partkey", "p_type"),
          split(col("p_type"), " "), "word")
        .select("p_partkey", "word")
        .orderBy("p_partkey", "word")),

    // ===== get_max_size_cols_stats: per-column max rendered length,
    // computed by ONE Spark agg pass (Display.maxSizeColsStats), result
    // re-lifted to a frame; sorted by name for a total order (the
    // reference's by-size order ties arbitrarily) =====
    "q_col_stats" -> ((s, dir) => {
      val src = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      val stats = graft.core.Display.maxSizeColsStats(src, topN = 3)
        .sortBy(_._1)
      import s.implicits._
      stats.toDF("col_name", "max_len")
        .withColumn("max_len", col("max_len").cast(LongType))
        .orderBy("col_name")
    }),

    // ===== select_cols_with_cond_exists (round 11: upgraded from
    // spec-only): keep columns where ANY value matches — the surviving
    // header is the result, re-lifted as rows so the oracle re-derives
    // each column's existence check from the SOURCE data =====
    "q_select_cols_cond" -> ((s, dir) => {
      val kept = XDF(t(s, dir, "nation"))
        .selectColsWithCondExists(c =>
          c.cast(StringType).rlike("EGYPT|^1[0-9]$"))
      import s.implicits._
      kept.getHeader.sorted.toDF("kept_col")
    }),

    // ===== first_value_with_default_if_missing (driver-side scalar by
    // contract, dataframe.py:5383-5393): first row of a SORTED frame,
    // plus the default on an empty frame; re-lifted to one row =====
    "q_first_value_default" -> ((s, dir) => {
      val first = XDF(t(s, dir, "region").orderBy("r_regionkey"))
        .firstValueWithDefault("r_name", "none")
      val onEmpty = XDF(t(s, dir, "region").where(lit(false)))
        .firstValueWithDefault("r_name", "none")
      import s.implicits._
      Seq((first, onEmpty)).toDF("first_name", "empty_default")
    }),

    // ===== resolve_all_url_encoded_cols (dataframe.py:2271-2292):
    // auto-detect `:url_encoded` columns, decode in place, strip the
    // suffix; non-suffixed columns untouched. Round-trip through the
    // engine's own encoder; the codec convention itself is pinned
    // separately by q_url_codec =====
    "q_resolve_url_enc" -> ((s, dir) =>
      XDF(t(s, dir, "part").select(
          col("p_partkey"),
          url_encode(col("p_name")).as("p_name:url_encoded"),
          url_encode(col("p_type")).as("p_type:url_encoded"),
          col("p_brand").as("plain")))
        .resolveAllUrlEncodedCols()
        .sort(Seq("p_partkey")).toDF),

    // ===== lenient time-parse format matrix: every wire format of the
    // TimeFuncs cascade (reference timefuncs.py:7-81 trial list) plus
    // epoch-seconds strings, rendered from events.ts and parsed back.
    // The oracle re-derives each recovered epoch with the truncation
    // that format can carry (second / minute / day), so a cascade entry
    // matching the WRONG format (e.g. the minute format swallowing a
    // seconds string) shifts a whole column and fails =====
    "q_time_parse_matrix" -> ((s, dir) => {
      val fmts = Seq(
        "f_iso_us" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        "f_iso" -> "yyyy-MM-dd'T'HH:mm:ss",
        "f_sql_us" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "f_sql" -> "yyyy-MM-dd HH:mm:ss",
        "f_min" -> "yyyy-MM-dd HH:mm",
        "f_date" -> "yyyy-MM-dd",
        "f_compact" -> "yyyyMMdd",
        "f_us_full" -> "MM/dd/yyyy HH:mm:ss",
        "f_us_date" -> "MM/dd/yyyy")
      val base = t(s, dir, "events").select(col("event_id"), col("ts"))
      val parsed = fmts.foldLeft(base) { case (d, (n, f)) =>
        d.withColumn(n,
          TimeFuncs.datetimeToUtcTimestampSec(date_format(col("ts"), f)))
      }.withColumn("f_epoch", TimeFuncs.datetimeToUtcTimestampSec(
        unix_timestamp(col("ts")).cast(StringType)))
      parsed.select((Seq("event_id") ++ fmts.map(_._1) :+ "f_epoch")
          .map(col): _*)
        .orderBy("event_id")
    }),

    // ===== AggRegistry numeric long tail (sum/sumint/mean/median/
    // quantile10/get_range_int — the registry paths q_agg_funcs and
    // q_agg_quantile don't reach). Floating sums are rounded: at sf1 a
    // 2M-row double sum is order-dependent in the last bits on BOTH
    // engines =====
    "q_agg_registry_num" -> ((s, dir) =>
      // sum on l_quantity: integer-valued doubles, so the float sum is
      // EXACT at any SF (an l_extendedprice sum would be order-dependent
      // in the last bits on both engines at sf1)
      XDF(t(s, dir, "lineitem"))
        .aggregate(Seq("l_returnflag"),
          Seq("l_quantity", "l_extendedprice", "l_quantity",
            "l_orderkey", "l_quantity", "l_quantity"),
          Seq("sum", "sumint", "mean", "get_range_int", "median",
            "quantile10"))
        .transform("l_quantity:mean", round(col("l_quantity:mean"), 6))
        .sort(Seq("l_returnflag")).toDF),

    // ===== AggRegistry string long tail (sorted_mkstr / merge_uniq /
    // uniq_len / get_non_empty_len / minstr / maxstr) on nation's
    // fixed-size groups; merge_uniq and uniq_len see comma-joined cells
    // (the reference's split-merge semantics), get_non_empty_len sees
    // planted empties =====
    "q_agg_registry_str" -> ((s, dir) =>
      XDF(t(s, dir, "nation")
          .withColumn("csv",
            concat(col("n_name"), lit(","), substring(col("n_name"), 1, 1)))
          .withColumn("maybe_empty",
            when(col("n_nationkey") % 3 === 0, lit("")).otherwise(col("n_name"))))
        .aggregate(Seq("n_regionkey"),
          Seq("n_name", "csv", "csv", "maybe_empty", "n_name", "n_name"),
          Seq("sorted_mkstr", "merge_uniq", "uniq_len", "get_non_empty_len",
            "minstr", "maxstr"))
        .transform("csv:uniq_len", col("csv:uniq_len").cast(LongType))
        .sort(Seq("n_regionkey")).toDF),

    // ===== AggRegistry order-dependent funcs (first/last/mkstr/mkstr4f)
    // pinned on single-row groups — the one shape where the reference's
    // row-order semantics are engine-independent; mkstr4f pins the %.4f
    // rendering =====
    "q_agg_registry_row" -> ((s, dir) =>
      XDF(t(s, dir, "nation"))
        .aggregate(Seq("n_nationkey"),
          Seq("n_name", "n_name", "n_name", "n_regionkey"),
          Seq("first", "last", "mkstr", "mkstr4f"))
        .sort(Seq("n_nationkey")).toDF),

    // ===== AggRegistry approximate funcs (round 12: closes the registry
    // at 25/25 driver-visible checks). approx_uniq_count (HLL++,
    // rsd 0.05) and approx_median (percentile_approx, accuracy 10000)
    // have no exact SQL oracle by contract; scripts/check_oracle.py
    // value-checks them against DuckDB exact counts/quantiles with the
    // sketches' own error bounds (4-sigma on HLL rsd; a rank window 100x
    // the GK guarantee) — same pattern as the IVF recall gate =====
    "q_agg_registry_approx" -> ((s, dir) =>
      XDF(t(s, dir, "lineitem"))
        .aggregate(Seq("l_returnflag"),
          Seq("l_orderkey", "l_quantity", "l_extendedprice"),
          Seq("approx_uniq_count", "approx_median", "approx_median"))
        .sort(Seq("l_returnflag")).toDF),

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
    }),



    // per-user sorted pairwise event gaps, humanized "2d 4h,13m" CSV —
    // the aggregate-expression form (one collect per group, groups are
    // per-user event streams, bounded by contract)
    "q_time_diffs" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id").cast("long").as("user_id"),
        (Tables.tsMillis("ts") / 1000).cast("long").as("sec"))
      e.groupBy("user_id")
        .agg(Udfs.getTimeDiffs(col("sec")).as("time_diffs"))
        .orderBy("user_id")
    }),



    // "" is the null of the reference data model: rows whose every field
    // is empty drop; rows with ANY non-empty field survive
    "q_drop_empty_rows" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").select(
        when(col("l_quantity") < 10, "").otherwise(col("l_returnflag")).as("a"),
        when(col("l_extendedprice") > 50000, "").otherwise(col("l_linestatus")).as("b"))
      XDF(base).dropEmptyRows().toDF.orderBy("a", "b")
    }),



    // limit reached (lineitem row count >> 1000 at every SF): top-5 per
    // returnflag by extendedprice through the bounded-heap path
    "q_topk_conditional" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_extendedprice")
      XDF(base)
        .sampleGroupByTopkIfReachedLimit(1000, Seq("l_returnflag"),
          "l_extendedprice", 5)
        .toDF.orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_returnflag", "l_extendedprice")
    }),



    // under the limit (nation is 25 rows at every SF): verbatim
    // passthrough, no top-k applied, no shuffle
    "q_topk_conditional_pass" -> ((s, dir) =>
      XDF(t(s, dir, "nation"))
        .sampleGroupByTopkIfReachedLimit(1000, Seq("n_regionkey"),
          "n_nationkey", 2)
        .toDF.orderBy("n_nationkey")),



    // {colname} placeholders in a template column fill from row values
    "q_template_col" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .withColumn("tmpl", lit("st={o_orderstatus},pri={o_orderpriority}"))
      XDF(base).resolveTemplateCol("tmpl", "resolved")
        .toDF.orderBy("o_orderkey")
    }),



    // schema evolution: requested-but-absent columns materialize as ""
    "q_select_missing" -> ((s, dir) =>
      XDF(t(s, dir, "customer").select("c_custkey", "c_mktsegment"))
        .addEmptyColsIfMissing("c_alias")
        .toDF.orderBy("c_custkey")),



    // literal row append: assign_value + add_map_as_row with a default
    // for unmapped columns; coercion "0" -> BIGINT exercised
    "q_add_row_map" -> ((s, dir) => {
      val base = t(s, dir, "region").select(
        col("r_regionkey").cast(LongType).as("r_regionkey"), col("r_name"))
      XDF(base).assignValue("tag", "x")
        .addMapAsRow(Map("r_name" -> "ZED", "tag" -> "y"), defaultVal = "0")
        .toDF.orderBy("r_regionkey", "r_name")
    }),



    // inline literal replace, then ""-null backfill — order matters:
    // replace sees the raw cell, set_missing_values sees its output
    "q_replace_set_missing" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 7 === 0, "").otherwise(col("c_mktsegment")).as("seg"))
      XDF(base).replaceStrInline(Seq("seg"), "BUILD", "Bld_")
        .setMissingValues(Seq("seg"), "NONE")
        .toDF.orderBy("c_custkey")
    }),



    // url_encode (URLEncoder semantics: ' '->'+', '/'->'%2F', ':'->'%3A')
    // then the :url_encoded-suffix resolve path decodes back to the raw
    // value — both directions against an explicit replace-chain oracle
    "q_url_codec" -> ((s, dir) => {
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("k"),
        concat(col("n_name"), lit(" a/b:c")).as("s:url_encoded"))
      XDF(base)
        .urlEncodeInline("s:url_encoded")
        .copyCol("s:url_encoded", "enc")
        .resolveUrlEncodedCols("s:url_encoded")
        .toDF.orderBy("k")
    }),



    // base64 encode + decode round-trip vs DuckDB's to_base64
    "q_base64_roundtrip" -> ((s, dir) => {
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("k"), col("n_name").as("s"))
      XDF(base).copyCol("s", "b64").base64EncodeInline("b64")
        .copyCol("b64", "back").base64DecodeInline("back")
        .toDF.orderBy("k")
    }),



    // dotted-quad -> 8-char lowercase hex; octets derived from the order
    // key so every SF covers the 0..255 domain incl. sub-0x10 padding
    "q_ipv4_hex" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(col("o_orderkey").cast(LongType).as("k"))
        .withColumn("ip", concat_ws(".",
          pmod(col("k"), lit(256)).cast(StringType),
          pmod((col("k") / 3).cast(LongType), lit(256)).cast(StringType),
          pmod((col("k") / 7).cast(LongType), lit(256)).cast(StringType),
          pmod((col("k") / 11).cast(LongType), lit(256)).cast(StringType)))
      base.withColumn("hex", Udfs.convertIpv4ToHex(col("ip")))
        .select("k", "ip", "hex").orderBy("k")
    }),



    // keep rows whose JSON-path value satisfies the predicate; the json
    // payload itself is part of the compared output (byte-exact format)
    "q_filter_json_xpath" -> ((s, dir) => {
      val j = t(s, dir, "orders").select(
        col("o_orderkey").cast(LongType).as("k"),
        to_json(struct(col("o_orderpriority").as("pri"),
          col("o_custkey").cast(LongType).as("ck"))).as("js"))
      XDF(j).filterJsonByXpath("js", "$.pri", v => v === "1-URGENT")
        .toDF.select("k", "js").orderBy("k")
    }),



    // display transpose of the first 3 rows (driver-side by contract)
    "q_transpose" -> ((s, dir) => {
      val top = t(s, dir, "region").orderBy("r_regionkey").select(
        col("r_regionkey").cast(LongType).as("k"), col("r_name").as("nm"))
      Reshape.transpose(top, 3).orderBy("col_name")
    }),



    // "NdNhNm" grammar -> seconds -> humanized display, round-tripped
    // through both duration directions
    "q_duration_roundtrip" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey").cast(LongType).as("k"))
        .withColumn("dur", concat(
          pmod(col("k"), lit(4)).cast(StringType), lit("d"),
          pmod(col("k"), lit(30)).cast(StringType), lit("h"),
          pmod(col("k"), lit(60)).cast(StringType), lit("m")))
        .withColumn("sec", TimeFuncs.durationToSec(col("dur")))
        .withColumn("rel", TimeFuncs.displayRelativeTime(col("sec")))
        .select("k", "dur", "sec", "rel").orderBy("k")),

    // ===== duration grammar partials: q_duration_roundtrip always
    // carries d+h+m; this gate cycles the four PARTIAL shapes the
    // reference grammar admits ("NdNh", "NhNm", "NmNs", "Ns") so absent
    // units parse as 0 and the `s` unit — previously unexercised — is
    // pinned =====
    "q_duration_grammar" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey").cast(LongType).as("k"))
        .withColumn("d", pmod(col("k"), lit(3)).cast(StringType))
        .withColumn("h", pmod(col("k"), lit(24)).cast(StringType))
        .withColumn("m", pmod(col("k"), lit(60)).cast(StringType))
        .withColumn("sv", pmod(col("k") * 7, lit(60)).cast(StringType))
      base.withColumn("dur",
          when(pmod(col("k"), lit(4)) === 0,
            concat(col("d"), lit("d"), col("h"), lit("h")))
          .when(pmod(col("k"), lit(4)) === 1,
            concat(col("h"), lit("h"), col("m"), lit("m")))
          .when(pmod(col("k"), lit(4)) === 2,
            concat(col("m"), lit("m"), col("sv"), lit("s")))
          .otherwise(concat(col("sv"), lit("s"))))
        .withColumn("sec", TimeFuncs.durationToSec(col("dur")))
        .select("k", "dur", "sec").orderBy("k")
    }),
  )

  def oracleSql: Map[String, String] = Map(

    // column order is encoded in the csv values: front = reorder
    // (n_regionkey first), back = reverse_reorder (n_nationkey last)
    "q_reorder" ->
      """SELECT n_nationkey,
                n_regionkey || ',' || n_nationkey || ',' || n_name AS front_csv,
                n_name || ',' || n_regionkey || ',' || n_nationkey AS back_csv
         FROM nation ORDER BY n_nationkey""",

    "q_assign_value" ->
      """SELECT r_regionkey, 'REDACTED' AS r_name FROM region
         ORDER BY r_regionkey""",

    "q_is_nonzero" ->
      """SELECT l_orderkey, l_linenumber, l_quantity - 25 AS qdev, l_tax
         FROM lineitem
         WHERE CAST(CAST(l_quantity - 25 AS DOUBLE) AS BIGINT) <> 0
           AND l_tax <> 0.0
         ORDER BY l_orderkey, l_linenumber, qdev, l_tax""",

    "q_startswith" ->
      """SELECT p_partkey, p_type, p_brand FROM part
         WHERE p_type LIKE 'STANDARD%'
           AND p_brand NOT LIKE '%3'
           AND CAST(p_partkey AS VARCHAR) LIKE '1%'
         ORDER BY p_partkey""",

    "q_flatmap" ->
      """SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
         FROM part ORDER BY p_partkey, word""",

    "q_col_stats" ->
      """SELECT col_name, max_len FROM (
           SELECT 'c_custkey' AS col_name,
                  CAST(max(length(CAST(c_custkey AS VARCHAR))) AS BIGINT) AS max_len
           FROM customer
           UNION ALL
           SELECT 'c_mktsegment', CAST(max(length(c_mktsegment)) AS BIGINT)
           FROM customer
           UNION ALL
           SELECT 'c_name', CAST(max(length(c_name)) AS BIGINT) FROM customer)
         ORDER BY col_name""",

    // the oracle re-derives each column's survival from the source data
    // with the same pattern (rlike = unanchored regex search, like
    // DuckDB regexp_matches). Schema-DERIVED (round 12): UNPIVOT over
    // COLUMNS(*) enumerates nation's columns from the parquet itself, so
    // a column added to the fixture participates in the check without a
    // hand-edit here (a hand enumeration could silently narrow the gate)
    "q_select_cols_cond" ->
      """SELECT DISTINCT name AS kept_col
         FROM (UNPIVOT (SELECT COLUMNS(*)::VARCHAR FROM nation)
               ON COLUMNS(*) INTO NAME name VALUE value)
         WHERE regexp_matches(value, 'EGYPT|^1[0-9]$')
         ORDER BY kept_col""",

    "q_first_value_default" ->
      """SELECT (SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1)
                  AS first_name,
                'none' AS empty_default""",

    "q_resolve_url_enc" ->
      """SELECT p_partkey, p_name, p_type, p_brand AS plain FROM part
         ORDER BY p_partkey""",

    // per-format truncation: sub-second formats floor to the second
    // (unix_timestamp returns whole seconds), minute format to the
    // minute, date formats to the day
    "q_time_parse_matrix" ->
      """SELECT event_id,
                epoch(date_trunc('second', ts))::BIGINT AS f_iso_us,
                epoch(date_trunc('second', ts))::BIGINT AS f_iso,
                epoch(date_trunc('second', ts))::BIGINT AS f_sql_us,
                epoch(date_trunc('second', ts))::BIGINT AS f_sql,
                epoch(date_trunc('minute', ts))::BIGINT AS f_min,
                epoch(date_trunc('day', ts))::BIGINT AS f_date,
                epoch(date_trunc('day', ts))::BIGINT AS f_compact,
                epoch(date_trunc('second', ts))::BIGINT AS f_us_full,
                epoch(date_trunc('day', ts))::BIGINT AS f_us_date,
                epoch(date_trunc('second', ts))::BIGINT AS f_epoch
         FROM events ORDER BY event_id""",

    // sumint truncates EACH value toward zero before summing (the
    // reference's int(float(x)) per cell), not the final sum
    "q_agg_registry_num" ->
      """SELECT l_returnflag,
                CAST(sum(l_quantity) AS DOUBLE) AS "l_quantity:sum",
                CAST(sum(CAST(trunc(l_extendedprice) AS BIGINT)) AS BIGINT)
                  AS "l_extendedprice:sumint",
                round(avg(l_quantity), 6) AS "l_quantity:mean",
                CAST(max(l_orderkey) - min(l_orderkey) AS BIGINT)
                  AS "l_orderkey:get_range_int",
                CAST(median(l_quantity) AS DOUBLE) AS "l_quantity:median",
                array_to_string(quantile_cont(l_quantity,
                  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]), ',')
                  AS "l_quantity:quantile10"
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_registry_str" ->
      """WITH src AS (
           SELECT n_regionkey, n_name,
                  n_name || ',' || substr(n_name, 1, 1) AS csv,
                  CASE WHEN n_nationkey % 3 = 0 THEN '' ELSE n_name END
                    AS maybe_empty
           FROM nation)
         SELECT n_regionkey,
                string_agg(n_name, ',' ORDER BY n_name)
                  AS "n_name:sorted_mkstr",
                array_to_string(list_sort(list_distinct(
                  flatten(list(string_split(csv, ','))))), ',')
                  AS "csv:merge_uniq",
                CAST(len(list_distinct(flatten(list(string_split(csv, ',')))))
                  AS BIGINT) AS "csv:uniq_len",
                CAST(count(*) FILTER (WHERE maybe_empty <> '') AS BIGINT)
                  AS "maybe_empty:get_non_empty_len",
                min(n_name) AS "n_name:minstr",
                max(n_name) AS "n_name:maxstr"
         FROM src GROUP BY n_regionkey ORDER BY n_regionkey""",

    "q_duration_grammar" ->
      """WITH b AS (SELECT o_orderkey::BIGINT AS k FROM orders),
         p AS (SELECT k, k % 3 AS d, k % 24 AS h, k % 60 AS m,
                      (k * 7) % 60 AS sv
               FROM b),
         g AS (SELECT k,
                 CASE WHEN k % 4 = 0 THEN d::VARCHAR || 'd' || h::VARCHAR || 'h'
                      WHEN k % 4 = 1 THEN h::VARCHAR || 'h' || m::VARCHAR || 'm'
                      WHEN k % 4 = 2 THEN m::VARCHAR || 'm' || sv::VARCHAR || 's'
                      ELSE sv::VARCHAR || 's' END AS dur,
                 CASE WHEN k % 4 = 0 THEN d * 86400 + h * 3600
                      WHEN k % 4 = 1 THEN h * 3600 + m * 60
                      WHEN k % 4 = 2 THEN m * 60 + sv
                      ELSE sv END AS sec
               FROM p)
         SELECT k, dur, sec FROM g ORDER BY k""",

    "q_agg_registry_row" ->
      """SELECT n_nationkey,
                n_name AS "n_name:first",
                n_name AS "n_name:last",
                n_name AS "n_name:mkstr",
                printf('%.4f', CAST(n_regionkey AS DOUBLE))
                  AS "n_regionkey:mkstr4f"
         FROM nation ORDER BY n_nationkey""",

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
         ORDER BY l_orderkey, l_linenumber, "metric:q7", "metric:q499", t3""",


    "q_time_diffs" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id,
                    epoch_ns(ts) // 1000000000 AS sec FROM events),
         g AS (SELECT user_id, list_sort(list(sec)) AS ss FROM e GROUP BY user_id)
         SELECT user_id,
           -- DuckDB joins an EMPTY list to NULL where Spark's array_join
           -- yields '' (the single-event-user case): coalesce aligns them
           coalesce(array_to_string([CASE
               WHEN (ss[i+1]-ss[i]) // 86400 > 0
                 THEN ((ss[i+1]-ss[i]) // 86400)::VARCHAR || 'd ' ||
                      (((ss[i+1]-ss[i]) % 86400) // 3600)::VARCHAR || 'h'
               WHEN ((ss[i+1]-ss[i]) % 86400) // 3600 > 0
                 THEN (((ss[i+1]-ss[i]) % 86400) // 3600)::VARCHAR || 'h ' ||
                      (((ss[i+1]-ss[i]) % 3600) // 60)::VARCHAR || 'm'
               ELSE (((ss[i+1]-ss[i]) % 3600) // 60)::VARCHAR || 'm'
             END FOR i IN range(1, len(ss))], ','), '') AS time_diffs
         FROM g ORDER BY user_id""",



    "q_drop_empty_rows" ->
      """SELECT a, b FROM (
           SELECT CASE WHEN l_quantity < 10 THEN '' ELSE l_returnflag END AS a,
                  CASE WHEN l_extendedprice > 50000 THEN '' ELSE l_linestatus END AS b
           FROM lineitem) t
         WHERE a || b <> '' ORDER BY a, b""",



    "q_topk_conditional" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_extendedprice
         FROM (
           SELECT *, row_number() OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC,
                      l_quantity ASC, l_returnflag ASC, l_extendedprice ASC) AS rn
           FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
                        l_extendedprice FROM lineitem) p) b
         WHERE rn <= 5
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_extendedprice""",



    "q_topk_conditional_pass" ->
      "SELECT * FROM nation ORDER BY n_nationkey",



    "q_template_col" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
                'st={o_orderstatus},pri={o_orderpriority}' AS tmpl,
                'st=' || o_orderstatus || ',pri=' || o_orderpriority AS resolved
         FROM orders ORDER BY o_orderkey""",



    "q_select_missing" ->
      """SELECT c_custkey, c_mktsegment, '' AS c_alias
         FROM customer ORDER BY c_custkey""",


    "q_add_row_map" ->
      """SELECT r_regionkey::BIGINT AS r_regionkey, r_name, 'x' AS tag FROM region
         UNION ALL SELECT 0, 'ZED', 'y'
         ORDER BY r_regionkey, r_name""",



    "q_replace_set_missing" ->
      """SELECT c_custkey,
                CASE WHEN seg = '' THEN 'NONE' ELSE seg END AS seg
         FROM (SELECT c_custkey,
                      CASE WHEN c_custkey % 7 = 0 THEN ''
                           ELSE replace(c_mktsegment, 'BUILD', 'Bld_') END AS seg
               FROM customer)
         ORDER BY c_custkey""",



    "q_url_codec" ->
      """SELECT n_nationkey::BIGINT AS k,
                n_name || ' a/b:c' AS s,
                replace(replace(replace(n_name || ' a/b:c',
                  '/', '%2F'), ':', '%3A'), ' ', '+') AS enc
         FROM nation ORDER BY k""",



    "q_base64_roundtrip" ->
      """SELECT n_nationkey::BIGINT AS k, n_name AS s,
                to_base64(encode(n_name)) AS b64, n_name AS back
         FROM nation ORDER BY k""",



    "q_ipv4_hex" ->
      """WITH b AS (SELECT o_orderkey::BIGINT AS k FROM orders),
         o AS (SELECT k, k % 256 AS o1, (k // 3) % 256 AS o2,
                      (k // 7) % 256 AS o3, (k // 11) % 256 AS o4 FROM b)
         SELECT k,
                o1::VARCHAR || '.' || o2::VARCHAR || '.' ||
                o3::VARCHAR || '.' || o4::VARCHAR AS ip,
                lpad(lower(to_hex(o1)), 2, '0') || lpad(lower(to_hex(o2)), 2, '0') ||
                lpad(lower(to_hex(o3)), 2, '0') || lpad(lower(to_hex(o4)), 2, '0') AS hex
         FROM o ORDER BY k""",



    "q_filter_json_xpath" ->
      """SELECT o_orderkey::BIGINT AS k,
                '{"pri":"' || o_orderpriority || '","ck":' || o_custkey || '}' AS js
         FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY k""",



    "q_transpose" ->
      """WITH t AS (SELECT row_number() OVER (ORDER BY r_regionkey) AS rn,
                           r_regionkey::VARCHAR AS k, r_name AS nm
                    FROM (SELECT * FROM region ORDER BY r_regionkey LIMIT 3)),
         u AS (SELECT rn, 'k' AS col_name, k AS v FROM t
               UNION ALL SELECT rn, 'nm', nm FROM t)
         SELECT col_name,
                max(CASE WHEN rn = 1 THEN v END) AS "row:1",
                max(CASE WHEN rn = 2 THEN v END) AS "row:2",
                max(CASE WHEN rn = 3 THEN v END) AS "row:3"
         FROM u GROUP BY col_name ORDER BY col_name""",



    "q_duration_roundtrip" ->
      """WITH b AS (SELECT o_orderkey::BIGINT AS k FROM orders),
         d AS (SELECT k,
                 (k % 4)::VARCHAR || 'd' || (k % 30)::VARCHAR || 'h' ||
                   (k % 60)::VARCHAR || 'm' AS dur,
                 (k % 4) * 86400 + (k % 30) * 3600 + (k % 60) * 60 AS sec
               FROM b)
         SELECT k, dur, sec,
                CASE WHEN sec // 86400 > 0
                       THEN (sec // 86400)::VARCHAR || 'd ' ||
                            ((sec % 86400) // 3600)::VARCHAR || 'h'
                     WHEN (sec % 86400) // 3600 > 0
                       THEN ((sec % 86400) // 3600)::VARCHAR || 'h ' ||
                            ((sec % 3600) // 60)::VARCHAR || 'm'
                     ELSE ((sec % 3600) // 60)::VARCHAR || 'm' END AS rel
         FROM d ORDER BY k""",
  )
}
