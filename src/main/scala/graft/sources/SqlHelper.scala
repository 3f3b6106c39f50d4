package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * SQL pushdown sugar (reference: EXT/sql_helper.py:8-158 builds SELECT
 * strings and runs them in Spark-on-YARN / Presto; EXT/spark_ext.py:9-57
 * literally calls spark.sql). Here the engine IS Spark, so the builder
 * compiles to `spark.sql` directly; the same SQL string works against any
 * ANSI engine for differential checks.
 */
object SqlHelper {

  /** Build the SELECT string (reference sql_helper.py:58-87 — it emits
    * positional GROUP BY 1..N, which silently groups by the WRONG columns
    * unless the grouping columns happen to lead the select list; here the
    * caller's column names are emitted as given). */
  def buildQuery(columns: Seq[String], table: String,
                 where: String = null, groupBy: Seq[String] = Nil,
                 having: String = null, orderBy: Seq[String] = Nil,
                 limit: Int = -1): String = {
    val sb = new StringBuilder(s"SELECT ${columns.mkString(", ")} FROM $table")
    if (where != null) sb.append(s" WHERE $where")
    if (groupBy.nonEmpty)
      sb.append(s" GROUP BY ${groupBy.mkString(", ")}")
    if (having != null) sb.append(s" HAVING $having")
    if (orderBy.nonEmpty) sb.append(s" ORDER BY ${orderBy.mkString(", ")}")
    if (limit >= 0) sb.append(s" LIMIT $limit")
    sb.toString
  }

  /** Register a DF as a temp view and run a built query against it. */
  def executeQuery(spark: SparkSession, tables: Map[String, DataFrame],
                   sql: String): DataFrame = {
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    spark.sql(sql)
  }
}
