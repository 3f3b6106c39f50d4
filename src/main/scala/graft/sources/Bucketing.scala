package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed datasource tables: pre-shuffle ONCE at write time so that
 * every later equi-join or aggregation on the bucket key runs with ZERO
 * exchange. At 100 TB the repeated shuffle of a fact table is the
 * dominant cost of a join-heavy workload; bucketing moves that shuffle
 * into the (single) write. Two tables bucketed into the same number of
 * buckets on their join keys sort-merge join with no Exchange on either
 * side (asserted in BucketingSpec), and a groupBy on the bucket key
 * needs no re-partition either.
 *
 * Beyond-parity: the reference streams TSVs and re-hashes per join
 * (hydra cluster plumbing); physical co-location is not a concept it
 * has. Spark-first: this is plain `DataFrameWriter.bucketBy` +
 * `sortBy` into the session catalog — Catalyst reads the bucket spec
 * from the catalog and drops the exchanges on its own.
 */
object Bucketing {

  /**
   * Persist `df` as a bucketed (and optionally sorted) parquet
   * datasource table at `path`, registered as `table` in the session
   * catalog. Sorting within buckets additionally removes the SORT step
   * of later sort-merge joins on the bucket key.
   */
  def saveBucketed(df: DataFrame, table: String, path: String,
                   bucketCols: Seq[String], nBuckets: Int,
                   sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    // the name lands inside a SQL statement: reject anything a backtick
    // quote can't make safe, then quote — an interpolated raw name with
    // special characters would break the DROP or execute unintended SQL
    // every dot-separated segment must be non-empty: '.a' would quote to
    // the invalid ``.`a` and 'a.' would silently create table `a`
    require(table.matches("[A-Za-z0-9_]+(\\.[A-Za-z0-9_]+)*"),
      s"table name must be dot-separated [A-Za-z0-9_]+ segments: '$table'")
    val quoted = table.split('.').map(p => s"`$p`").mkString(".")
    // a previous table at a DIFFERENT path must not shadow the new data
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $quoted")
    val w = df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** The read side: bucket metadata only lives in the catalog, so
    * consumers must go through the table name, not the path. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
