package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Sources, sinks, and physical layout gates: TSV/CSV/JSON round-trips,
 * map bridges, bucketed co-located joins, Z-order clustering, shards.
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object IoQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private lazy val bucketRunId: String =
    java.util.UUID.randomUUID.toString.take(8)

  private lazy val bucketRunDir: String =
    graft.core.TempDirs.scratch(s"graft_bucketed_$bucketRunId")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(



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

    // `.tsv.zip` round-trip (round 11: upgraded from spec-only): zip
    // isn't a Spark codec, so the read decompresses via binaryFiles on
    // executors. The fixture zips TsvIO.write's own part files as
    // separate entries — the reference's multi-entry layout, each entry
    // carrying its own header line.
    "q_tsv_zip_roundtrip" -> ((s, dir) => {
      val out = graft.core.TempDirs.scratch("graft_tsvzip")
      graft.sources.TsvIO.write(t(s, dir, "nation"), s"$out/plain")
      val parts = new java.io.File(s"$out/plain").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.length > 0)
        .sortBy(_.getName)
      val zipPath = s"$out/nation.tsv.zip"
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(zipPath))
      try parts.zipWithIndex.foreach { case (f, i) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(s"entry_$i.tsv"))
        zos.write(java.nio.file.Files.readAllBytes(f.toPath))
        zos.closeEntry()
      } finally zos.close()
      graft.sources.TsvIO.readZip(s, zipPath)
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
    }),



    // list-of-maps ingestion: union-of-keys schema, "" for missing
    "q_from_maps" -> ((s, dir) =>
      XDF.fromMaps(s, Seq(
        Map("a" -> "1", "b" -> "x"),
        Map("b" -> "y", "c" -> "z"),
        Map("a" -> "2", "c" -> "w"))).toDF.orderBy("a", "b", "c")),

    // ===== cols_as_map (round 11: upgraded from spec-only): the
    // driver-side Map bridge, re-lifted to a frame so the oracle
    // value-checks every (key, stringified value) pair =====
    "q_cols_as_map" -> ((s, dir) => {
      val m = XDF(t(s, dir, "nation")).colsAsMap("n_name", "n_nationkey")
      import s.implicits._
      m.toSeq.toDF("k", "v").orderBy("k")
    }),



    // DF -> CSV text lines; null cells MUST render as "" without
    // shifting later columns (the concat_ws null-skip trap)
    "q_to_csv_text" -> ((s, dir) => {
      val base = t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("k"), col("n_name"),
        when(col("n_regionkey") === 2, lit(null).cast(StringType))
          .otherwise(col("n_regionkey").cast(StringType)).as("r"))
      XDF(base).toCsvText().toDF.orderBy("csv")
    }),



    // Morton/Z interleave for layout clustering (Layout.zValue) — the
    // oracle recomputes the interleave arithmetically in DuckDB, so the
    // bit math is pinned cross-engine; the layout side (contiguous
    // Z-range partitions) is law-tested in LayoutSpec
    "q_zorder_value" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber"), pmod(col("l_partkey"), lit(1024)).as("x"),
        pmod(col("l_suppkey"), lit(1024)).as("y"))
      base.withColumn("z", graft.operators.Layout.zValue(col("x"), col("y"), 10))
        .orderBy("l_orderkey", "l_linenumber", "x", "y", "z")
    }),



    // bucketed co-located join: both sides pre-shuffled at write time
    // into 8 buckets on the join key, so the join AND the groupBy on
    // that key plan with zero Exchange (asserted in BucketingSpec; the
    // oracle only pins values — plain join + aggregate)
    "q_bucket_join" -> ((s, dir) => {
      import graft.sources.Bucketing
      // per-process-unique path + table names: a fixed shared path would
      // let concurrent sessions clobber each other's buckets mid-read,
      // and a fresh name per INVOCATION would accumulate a table copy per
      // bench pass — one suffix per JVM (cleaned on exit) gives
      // overwrite-in-place within a run and isolation across runs
      val tmp = bucketRunDir
      Bucketing.saveBucketed(
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .filter(col("o_custkey") < 500),
        s"graft_b_orders_$bucketRunId", s"$tmp/o", Seq("o_orderkey"), 8,
        Seq("o_orderkey"))
      Bucketing.saveBucketed(
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .filter(col("l_quantity") >= 30),
        s"graft_b_lineitem_$bucketRunId", s"$tmp/l", Seq("l_orderkey"), 8,
        Seq("l_orderkey"))
      Bucketing.table(s, s"graft_b_orders_$bucketRunId")
        .join(Bucketing.table(s, s"graft_b_lineitem_$bucketRunId"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          max("o_totalprice").as("o_total"))
        .orderBy("o_orderkey")
    }),



    "q_shard_assign" -> ((s, dir) => {
      val sharded = Layout.shardAssign(
        t(s, dir, "orders").select("o_orderkey"), Seq("o_orderkey"),
        nShards = 8, seedStr = "42")
      sharded.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("ord").as("min_ord"),
          max("ord").as("max_ord"), min("o_orderkey").as("min_key"))
        .orderBy("shard")
    }),
  )

  def oracleSql: Map[String, String] = Map(


    "q_csv_roundtrip" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_mktsegment
         FROM customer ORDER BY c_custkey::BIGINT""",



    "q_tsv_gz_roundtrip" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
                CAST(n_regionkey AS VARCHAR) AS n_regionkey
         FROM nation ORDER BY n_nationkey::BIGINT""",

    "q_tsv_zip_roundtrip" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
                CAST(n_regionkey AS VARCHAR) AS n_regionkey
         FROM nation ORDER BY n_nationkey::BIGINT""",



    "q_read_json_dir" ->
      """SELECT '{"k":' || n_nationkey || '}' AS json
         FROM nation ORDER BY json""",



    "q_from_maps" ->
      """SELECT * FROM (
           SELECT '1' AS a, 'x' AS b, '' AS c
           UNION ALL SELECT '', 'y', 'z'
           UNION ALL SELECT '2', '', 'w')
         ORDER BY a, b, c""",

    "q_cols_as_map" ->
      """SELECT n_name AS k, CAST(n_nationkey AS VARCHAR) AS v
         FROM nation ORDER BY k""",



    "q_to_csv_text" ->
      """SELECT n_nationkey::VARCHAR || ',' || n_name || ',' ||
                CASE WHEN n_regionkey = 2 THEN '' ELSE n_regionkey::VARCHAR END AS csv
         FROM nation ORDER BY csv""",



    "q_zorder_value" ->
      """SELECT l_orderkey, l_linenumber, x, y,
                CAST(list_sum(list_transform(range(0, 10), i ->
                  (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))))
                  AS BIGINT) AS z
         FROM (SELECT l_orderkey, l_linenumber, l_partkey % 1024 AS x,
                      l_suppkey % 1024 AS y FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, x, y, z""",



    "q_bucket_join" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
               WHERE o_custkey < 500),
          l AS (SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem
                WHERE l_quantity >= 30)
         SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
                round(sum(l_quantity), 2) AS sum_qty,
                max(o_totalprice) AS o_total
         FROM o JOIN l ON o_orderkey = l_orderkey
         GROUP BY o_orderkey ORDER BY o_orderkey""",



    "q_shard_assign" ->
      """WITH s AS (SELECT o_orderkey,
               CAST(('0x' || substr(md5(coalesce(o_orderkey::VARCHAR, chr(0))
                   || chr(1) || '42'), 1, 8))::BIGINT % 8 AS INT) AS shard,
               md5(coalesce(o_orderkey::VARCHAR, chr(0)) || chr(1) || '42#o')
                 AS ord
             FROM orders)
         SELECT shard, CAST(count(*) AS BIGINT) AS n, min(ord) AS min_ord,
                max(ord) AS max_ord, min(o_orderkey) AS min_key
         FROM s GROUP BY shard ORDER BY shard""",
  )
}
