package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.XDF
import graft.functions.Udfs

/**
 * Round-9 parity upgrades: operators that until now were spec-verified
 * only (SURVEY §2's "spec" rows) promoted to full DuckDB-oracle gates —
 * get_time_diffs (reference funclib.py:208-238), drop_empty_rows
 * (dataframe.py:618-635), sample_group_by_topk_if_reached_limit both
 * branches (dataframe.py:2938-2946), resolve_template_col
 * (dataframe.py:5321-5381), and the add-empty-cols-if-missing schema
 * evolution verb (dataframe.py:446-476).
 */
object Round9Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // plain-CSV write/read round-trip (reference hydra.py:127-140
    // read_csv): all cells come back string-typed
    "q_csv_roundtrip" -> ((s, dir) => {
      val out = graft.core.TempDirs.scratch("graft_csv")
      t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        .write.mode("overwrite").option("header", "true").csv(out)
      graft.sources.TsvIO.readCsv(s, out)
        .orderBy(col("c_custkey").cast("long"))
    }),

    // gzip'd URL-encoded TSV round-trip — the reference's `.tsv.gz`
    // on-disk layout; Spark's codec handles decompression at the scan
    "q_tsv_gz_roundtrip" -> ((s, dir) => {
      val out = graft.core.TempDirs.scratch("graft_tsvgz")
      graft.sources.TsvIO.write(t(s, dir, "nation"), out, codec = "gzip")
      graft.sources.TsvIO.read(s, out)
        .orderBy(col("n_nationkey").cast("long"))
    }),

    // JSON-lines directory -> 1-col `json` frame (reference
    // hydra.py:325-356); payloads built via to_json so the wire format
    // is deterministic on both engines
    "q_read_json_dir" -> ((s, dir) => {
      val out = graft.core.TempDirs.scratch("graft_jsond")
      t(s, dir, "nation")
        .select(to_json(struct(col("n_nationkey").cast("long").as("k"))).as("value"))
        .write.mode("overwrite").text(out)
      graft.sources.TsvIO.readJsonDir(s, Seq(out)).orderBy("json")
    })
  )

  def oracleSql: Map[String, String] = Map(
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

    "q_csv_roundtrip" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_mktsegment
         FROM customer ORDER BY c_custkey::BIGINT""",

    "q_tsv_gz_roundtrip" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
                CAST(n_regionkey AS VARCHAR) AS n_regionkey
         FROM nation ORDER BY n_nationkey::BIGINT""",

    "q_read_json_dir" ->
      """SELECT '{"k":' || n_nationkey || '}' AS json
         FROM nation ORDER BY json"""
  )
}
