package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.Sketches
import graft.operators.Layout

/**
 * Fourth round-9 batch: the mergeable-summary algebra beyond HLL and the
 * deterministic training-shard layout.
 *
 * - q_theta_overlap: Theta sketches ([[graft.plans.ThetaSketchAgg]]) in
 *   their exact regime — per-year audience union/intersection/difference
 *   from a (year, month) sketch table rolled up WITHOUT rescanning rows;
 *   the custkey domain is folded mod 1024 (< nomEntries 4096) so every
 *   estimate is exact and the DuckDB oracle is count(DISTINCT) +
 *   inclusion-exclusion.
 * - q_kll_quantiles: KLL quantile sketches ([[graft.plans.KllQuantileAgg]])
 *   in their exact regime — per-flag p25/p50/p75 from (flag, year)
 *   sketches merged per flag; total n per sketch stays under k = 8192,
 *   where getQuantile(q, INCLUSIVE) is exactly the sorted item at
 *   1-based index ceil(q*n), reproduced in the oracle via
 *   list_sort(list(v))[ceil(q*count(*))].
 * - q_shard_assign: [[graft.operators.Layout.shardAssign]] — md5-seeded
 *   shard id + within-shard order, the engine-portable deterministic
 *   global shuffle for training output; the oracle recomputes both
 *   hashes verbatim.
 */
object Round9dQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-JVM suffix for q_bucket_join's bucketed tables/paths — computed
    * once; the directory lives under TempDirs' per-JVM root, deleted on
    * exit (catalog entries are in-memory and die with the session
    * anyway). */
  private lazy val bucketRunId: String =
    java.util.UUID.randomUUID.toString.take(8)
  private lazy val bucketRunDir: String =
    graft.core.TempDirs.scratch(s"graft_bucketed_$bucketRunId")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_theta_overlap" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        year(to_date(col("o_orderdate"))).as("yr"),
        month(to_date(col("o_orderdate"))).as("mo"),
        pmod(col("o_custkey"), lit(1024L)).as("ck"),
        col("o_orderpriority"), col("o_orderstatus"))
      val fine = o.groupBy("yr", "mo").agg(
        Sketches.thetaSketch(when(col("o_orderpriority") === "1-URGENT",
          col("ck"))).as("ska"),
        Sketches.thetaSketch(when(col("o_orderstatus") === "F",
          col("ck"))).as("skb"))
      fine.groupBy("yr")
        .agg(Sketches.thetaUnion(col("ska")).as("ua"),
          Sketches.thetaUnion(col("skb")).as("ub"))
        .select(col("yr"),
          Sketches.thetaEstimate(col("ua")).as("nd_a"),
          Sketches.thetaEstimate(col("ub")).as("nd_b"),
          Sketches.thetaEstimate(Sketches.thetaUnionPair(col("ua"), col("ub")))
            .as("nd_union"),
          Sketches.thetaEstimate(Sketches.thetaIntersect(col("ua"), col("ub")))
            .as("nd_both"),
          Sketches.thetaEstimate(Sketches.thetaANotB(col("ua"), col("ub")))
            .as("nd_a_only"))
        .orderBy("yr")
    }),

    "q_kll_quantiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(1009L)) === 0)
        .select(col("l_returnflag"),
          year(to_date(col("l_shipdate"))).as("yr"),
          floor(col("l_extendedprice")).cast(DoubleType).as("v"))
      val fine = li.groupBy("l_returnflag", "yr")
        .agg(Sketches.kllSketch(col("v"), 8192).as("sk"))
      fine.groupBy("l_returnflag")
        .agg(Sketches.kllMerge(col("sk"), 8192).as("m"))
        .select(col("l_returnflag"),
          Sketches.kllQuantile(col("m"), 0.25).as("p25"),
          Sketches.kllQuantile(col("m"), 0.5).as("p50"),
          Sketches.kllQuantile(col("m"), 0.75).as("p75"),
          Sketches.kllN(col("m")).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // cross-document repeated-substring spans (ExactSubstr-style): every
    // token position whose 8-gram recurs in ANOTHER doc, merged to
    // maximal spans — the boilerplate/quote-block finder. Oracle is the
    // same relational pipeline in DuckDB (grams -> min!=max doc test ->
    // gaps-and-islands), so the whole shape is value-pinned.
    "q_dup_spans" -> ((s, dir) => {
      graft.operators.Dedup.duplicatedNgramSpans(
          t(s, dir, "documents"), "doc_id", "text", n = 8)
        .select(col("doc_id"), col("span_start").cast("long"),
          col("span_end").cast("long"), col("n_grams"))
        .orderBy("doc_id", "span_start")
    }),

    // streaming x sketches: a REAL Structured Streaming run (file source
    // -> watermark -> windowed HLL sketch aggregate -> memory sink)
    // computing approximate-distinct users per hour per event type. The
    // user domain folds mod 200 (< the 384-coupon exact threshold at
    // lgK 12), so the streaming estimate equals the batch
    // count(DISTINCT) oracle exactly — the streaming twin of
    // q_hll_distinct_union.
    "q_stream_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("ts"),
        col("event_type"), pmod(col("user_id"), lit(200L)).as("ub"))
      val tmp = graft.core.TempDirs.scratchPath("graft_sdi")
      ev.write.mode("overwrite").json(tmp.toString)
      val stream = graft.streaming.StreamOps.readJsonStream(s, tmp.toString,
        "ts TIMESTAMP, event_type STRING, ub BIGINT")
      val agged = stream.withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(Sketches.hllSketch(col("ub")).as("sk"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"), Sketches.hllEstimate(col("sk")).as("nd_users"))
      val qn = "q_stream_distinct_sink"
      val q = agged.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      // the staged JSON exists only to feed the file source; once the
      // stream has drained into the memory sink the files are dead — a
      // fresh temp dir per invocation would otherwise accumulate a full
      // events copy per run
      try q.processAllAvailable() finally {
        q.stop()
        graft.core.TempDirs.deleteRecursively(tmp)
      }
      s.table(qn).orderBy("hour", "event_type")
    }),

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

    // strip the duplicated spans: covered tokens drop, survivors re-join
    // with single spaces (token-normalized on both sides). n=5 marks a
    // wider set than q_dup_spans' n=8, so the two gates pin different
    // mark densities.
    "q_strip_spans" -> ((s, dir) => {
      graft.operators.Dedup.stripDuplicatedSpans(
          t(s, dir, "documents").filter(col("text").isNotNull)
            .select("doc_id", "text"), "doc_id", "text", n = 5)
        .select(col("doc_id"), col("clean_text"), col("n_kept"),
          col("n_removed"))
        .orderBy("doc_id")
    }),

    "q_shard_assign" -> ((s, dir) => {
      val sharded = Layout.shardAssign(
        t(s, dir, "orders").select("o_orderkey"), Seq("o_orderkey"),
        nShards = 8, seedStr = "42")
      sharded.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("ord").as("min_ord"),
          max("ord").as("max_ord"), min("o_orderkey").as("min_key"))
        .orderBy("shard")
    }))

  def oracleSql: Map[String, String] = Map(

    "q_theta_overlap" ->
      """WITH o AS (SELECT year(o_orderdate::DATE) AS yr,
               o_custkey % 1024 AS ck,
               o_orderpriority = '1-URGENT' AS ia,
               o_orderstatus = 'F' AS ib
             FROM orders)
         SELECT yr,
           CAST(count(DISTINCT CASE WHEN ia THEN ck END) AS BIGINT) AS nd_a,
           CAST(count(DISTINCT CASE WHEN ib THEN ck END) AS BIGINT) AS nd_b,
           CAST(count(DISTINCT CASE WHEN ia OR ib THEN ck END) AS BIGINT)
             AS nd_union,
           CAST(count(DISTINCT CASE WHEN ia THEN ck END)
              + count(DISTINCT CASE WHEN ib THEN ck END)
              - count(DISTINCT CASE WHEN ia OR ib THEN ck END) AS BIGINT)
             AS nd_both,
           CAST(count(DISTINCT CASE WHEN ia OR ib THEN ck END)
              - count(DISTINCT CASE WHEN ib THEN ck END) AS BIGINT)
             AS nd_a_only
         FROM o GROUP BY yr ORDER BY yr""",

    "q_kll_quantiles" ->
      """WITH v AS (SELECT l_returnflag,
               CAST(floor(l_extendedprice) AS DOUBLE) AS v
             FROM lineitem WHERE l_orderkey % 1009 = 0)
         SELECT l_returnflag,
           (list_sort(list(v)))[CAST(ceil(0.25 * count(*)) AS BIGINT)] AS p25,
           (list_sort(list(v)))[CAST(ceil(0.5 * count(*)) AS BIGINT)] AS p50,
           (list_sort(list(v)))[CAST(ceil(0.75 * count(*)) AS BIGINT)] AS p75,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM v GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_dup_spans" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts
             FROM documents WHERE length(text) > 0
               AND len(regexp_split_to_array(text, '\s+')) >= 8),
          p AS (SELECT doc_id, unnest(range(1, len(ts) - 8 + 2)) AS i, ts
                FROM t),
          gr AS (SELECT doc_id, i,
                   md5(array_to_string(ts[i:i+7], ' ')) AS g FROM p),
          dup AS (SELECT g FROM gr GROUP BY g
                  HAVING min(doc_id) <> max(doc_id)),
          m AS (SELECT doc_id, i FROM gr SEMI JOIN dup USING (g)),
          b AS (SELECT doc_id, i,
                  CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                    < 8 THEN 0 ELSE 1 END AS brk FROM m),
          isl AS (SELECT doc_id, i,
                    sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
                  FROM b)
         SELECT doc_id, min(i) AS span_start, max(i) + 7 AS span_end,
                CAST(count(*) AS BIGINT) AS n_grams
         FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""",

    "q_stream_distinct" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
                event_type,
                CAST(count(DISTINCT user_id % 200) AS BIGINT) AS nd_users
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

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

    "q_strip_spans" ->
      """WITH t AS (SELECT doc_id, text,
               regexp_split_to_array(text, '\s+') AS ts
             FROM documents WHERE text IS NOT NULL),
          eligible AS (SELECT doc_id, ts FROM t
               WHERE length(text) > 0 AND len(ts) >= 5),
          p AS (SELECT doc_id, unnest(range(1, len(ts) - 5 + 2)) AS i, ts
                FROM eligible),
          gr AS (SELECT doc_id, i,
                   md5(array_to_string(ts[i:i+4], ' ')) AS g FROM p),
          dup AS (SELECT g FROM gr GROUP BY g
                  HAVING min(doc_id) <> max(doc_id)),
          m AS (SELECT doc_id, i FROM gr SEMI JOIN dup USING (g)),
          cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + 5)) AS pp
                  FROM m),
          tok AS (SELECT doc_id, unnest(range(1, len(ts) + 1)) AS pp, ts
                  FROM t),
          tk AS (SELECT tok.doc_id, tok.pp, ts[tok.pp] AS tk,
                   cov.pp IS NOT NULL AS covered
                 FROM tok LEFT JOIN cov
                   ON tok.doc_id = cov.doc_id AND tok.pp = cov.pp)
         SELECT doc_id,
           coalesce(array_to_string(
             list(tk ORDER BY pp) FILTER (WHERE NOT covered), ' '), '')
             AS clean_text,
           CAST(count(*) FILTER (WHERE NOT covered) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE covered) AS BIGINT) AS n_removed
         FROM tk GROUP BY doc_id ORDER BY doc_id""",

    "q_shard_assign" ->
      """WITH s AS (SELECT o_orderkey,
               CAST(('0x' || substr(md5(coalesce(o_orderkey::VARCHAR, chr(0))
                   || chr(1) || '42'), 1, 8))::BIGINT % 8 AS INT) AS shard,
               md5(coalesce(o_orderkey::VARCHAR, chr(0)) || chr(1) || '42#o')
                 AS ord
             FROM orders)
         SELECT shard, CAST(count(*) AS BIGINT) AS n, min(ord) AS min_ord,
                max(ord) AS max_ord, min(o_orderkey) AS min_key
         FROM s GROUP BY shard ORDER BY shard""")
}
