package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{TimeFuncs, Udfs}

/**
 * Second round-9 promotion batch: the remaining SURVEY §2 rows that were
 * spec-verified only become full DuckDB-oracle gates — row append
 * (dataframe.py:2499-2560 add_row / add_map_as_row), inline string
 * surgery (dataframe.py:1474-1520 replace_str_inline /
 * set_missing_values), url/base64 codecs + resolve_url_encoded_cols
 * (dataframe.py:2189-2292), convert_ipv4_to_hex (utils.py:845-861),
 * filter_json_by_xpath (dataframe.py:4955-4957), from_maps
 * (dataframe.py:5581-5611), to_csv_text (dataframe.py:2245-2251),
 * split_batches (dataframe.py:3929-4054), transpose
 * (dataframe.py:4767-4788), duration grammar round-trip
 * (funclib.py:283-355), random_shuffle (utils.py:601-618), and
 * sample_column_by_max_uniq_values (dataframe.py:3278-3297) via the
 * md5-portable ranking variant.
 */
object Round9bQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // list-of-maps ingestion: union-of-keys schema, "" for missing
    "q_from_maps" -> ((s, dir) =>
      XDF.fromMaps(s, Seq(
        Map("a" -> "1", "b" -> "x"),
        Map("b" -> "y", "c" -> "z"),
        Map("a" -> "2", "c" -> "w"))).toDF.orderBy("a", "b", "c")),

    // DF -> CSV text lines; null cells MUST render as "" without
    // shifting later columns (the concat_ws null-skip trap)
    "q_to_csv_text" -> ((s, dir) => {
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("k"), col("n_name"),
        when(col("n_regionkey") === 2, lit(null).cast(StringType))
          .otherwise(col("n_regionkey").cast(StringType)).as("r"))
      XDF(base).toCsvText().toDF.orderBy("csv")
    }),

    // hash-partition into n batches: the partition function itself is
    // engine-local (xxhash64), so the gate pins the invariants — total
    // row conservation, batch ids exactly covering [0, n)
    "q_split_batches" -> ((s, dir) =>
      Sampling.splitBatchesCol(t(s, dir, "orders"), Seq("o_orderkey"), 8, 42L)
        .agg(count(lit(1)).as("total"),
          countDistinct(col("__batch__")).as("n_batches"),
          min(col("__batch__")).as("min_b"), max(col("__batch__")).as("max_b"))),

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
        .orderBy("c_custkey"))
  )

  def oracleSql: Map[String, String] = Map(
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

    "q_from_maps" ->
      """SELECT * FROM (
           SELECT '1' AS a, 'x' AS b, '' AS c
           UNION ALL SELECT '', 'y', 'z'
           UNION ALL SELECT '2', '', 'w')
         ORDER BY a, b, c""",

    "q_to_csv_text" ->
      """SELECT n_nationkey::VARCHAR || ',' || n_name || ',' ||
                CASE WHEN n_regionkey = 2 THEN '' ELSE n_regionkey::VARCHAR END AS csv
         FROM nation ORDER BY csv""",

    "q_split_batches" ->
      """SELECT count(*) AS total, 8 AS n_batches, 0 AS min_b, 7 AS max_b
         FROM orders""",

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

    "q_random_shuffle" ->
      "SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey",

    "q_sample_col_uniq" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
         WHERE c_nationkey IN (
           SELECT c_nationkey FROM (SELECT DISTINCT c_nationkey FROM customer)
           ORDER BY md5(c_nationkey::VARCHAR || chr(1) || '7'), c_nationkey
           LIMIT 10)
         ORDER BY c_custkey"""
  )
}
