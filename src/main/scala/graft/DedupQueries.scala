package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Reshape, Sampling, XDF}
import graft.functions.{Sketches, TimeFuncs, Udfs}
import graft.operators.{Dedup, GraphOps, Layout, RangeJoin, Skew}
import graft.streaming.StreamOps

/**
 * Dedup long-tail gates: planted hot-bucket LSH dedup, string-keyed
 * representative election, ExactSubstr-style span dedup and strip.
 *
 * Round-11 reorganization: gates regrouped by operator family from the
 * round-numbered registries (Round2/4/6/9/9b/9c/9d); query names, plans,
 * and oracles unchanged — per-round history lives in git.
 */
object DedupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

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



    // ===== representative election, STRING-id fallback path: the k=1
    // bounded-heap aggregate (max_by needs an integral id; string ids
    // take the heap with the identical (score desc, id asc) order).
    // Synthetic clusters so the oracle is a plain window, not a CC =====
    "q_dedup_elect_str" -> ((s, dir) => {
      val clustered = t(s, dir, "documents").select(
        concat(lit("g"), col("doc_id") % 40).as("cluster_id"),
        col("n_chars"),
        concat(lit("d"), lpad(col("doc_id").cast("string"), 7, "0")).as("doc_sid"),
        col("source"))
      operators.Dedup.electRepresentative(clustered, "cluster_id", "n_chars", "doc_sid")
        .orderBy("cluster_id")
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
  )

  def oracleSql: Map[String, String] = Map(

    // survivors are closed-form for the planted corpus: the hot cluster
    // collapses to its min id, every distinct doc survives
    "q_dedup_hot_bucket" ->
      """SELECT i::BIGINT AS doc_id FROM range(0, 100500) t(i)
         WHERE i = 0 OR i >= 100000 ORDER BY doc_id""",



    "q_dedup_elect_str" ->
      """WITH c AS (SELECT 'g' || (doc_id % 40) AS cluster_id, n_chars,
                           'd' || lpad(doc_id::VARCHAR, 7, '0') AS doc_sid,
                           source
                    FROM documents),
           ranked AS (SELECT cluster_id, n_chars, doc_sid, source,
                        row_number() OVER (PARTITION BY cluster_id
                          ORDER BY n_chars DESC, doc_sid ASC) AS rn
                      FROM c)
         SELECT cluster_id, n_chars, doc_sid, source FROM ranked
         WHERE rn = 1 ORDER BY cluster_id""",



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
  )
}
