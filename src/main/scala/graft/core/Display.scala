package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Diagnostics / display surface (reference: dataframe.py §2.15 —
 * show_transpose DF:1731-1791, print_stats DF:5195-5210, get_hash
 * DF:4973-4990, size_in_bytes DF:1592-1603, get_max_size_cols_stats
 * DF:5221-5251).
 */
object Display {

  /** Transposed display of the first n rows (delegates to
    * Reshape.transpose; a driver-side display utility by design). */
  def showTranspose(df: DataFrame, n: Int = 3): Unit =
    Reshape.transpose(df, n).show(df.columns.length, truncate = false)

  /** num_rows / num_cols headline (print_stats). */
  def stats(df: DataFrame): (Long, Int) = (df.count(), df.columns.length)

  def printStats(df: DataFrame, msg: String = ""): Unit = {
    val (r, c) = stats(df)
    println(s"[stats]$msg num_rows=$r num_cols=$c")
  }

  /** Deterministic content hash of the whole DF, independent of row
    * order and partitioning: sum of per-row xxhash64 over canonicalized
    * cells (reference get_hash hashes the sorted row dump; an
    * order-independent commutative sum scales without a global sort). */
  def contentHash(df: DataFrame): Long = {
    // hashes fold into [0, p) and sum as decimal so the commutative sum
    // can't overflow even at trillions of rows (ANSI mode throws on
    // long overflow)
    val p = 1000000007L
    val rowHash = pmod(xxhash64(df.columns.map(c => col(c).cast(StringType)): _*), lit(p))
    val total = df.select(sum(rowHash.cast(DecimalType(38, 0))).as("h")).head()
      .getDecimal(0)
    if (total == null) 0L else total.remainder(new java.math.BigDecimal(p)).longValue()
  }

  /** Approximate in-memory size: sum of string lengths (reference
    * size_in_bytes counts str bytes). One aggregate pass. */
  def sizeInBytes(df: DataFrame): Long = {
    val cellBytes = df.columns.map(c =>
      sum(coalesce(length(col(c).cast(StringType)).cast(LongType), lit(0L))))
    df.agg(cellBytes.head, cellBytes.tail: _*).head()
      .toSeq.map(v => Option(v).map(_.asInstanceOf[Long]).getOrElse(0L)).sum
  }

  /** Top columns by max value length (get_max_size_cols_stats). */
  def maxSizeColsStats(df: DataFrame, topN: Int = 10): Seq[(String, Int)] = {
    val aggs = df.columns.map(c =>
      max(length(col(c).cast(StringType))).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    df.columns.zipWithIndex
      .map { case (c, i) => c -> (if (row.isNullAt(i)) 0 else row.getInt(i)) }
      .sortBy(-_._2).take(topN).toSeq
  }
}
