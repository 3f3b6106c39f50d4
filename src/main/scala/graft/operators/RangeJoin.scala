package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Distributed range joins without a nested-loop fallback (beyond-parity;
 * the reference has equi-joins only — dataframe.py:1106-1278). Vanilla
 * Spark plans a non-equi join as BroadcastNestedLoopJoin (quadratic work,
 * one-executor bottleneck when neither side fits in memory); here both
 * relations are mapped onto fixed-width cells of the join dimension so
 * candidates meet through an ordinary shuffled equi-join on cell id, and
 * the exact range predicate runs only on co-bucketed pairs.
 *
 * Scale contract (100 TB posture):
 *  - `bucketWidth` is the one tuning knob: pick it near a high quantile
 *    of interval length (one `approxQuantile` probe on a sample at
 *    cluster scale), so each interval replicates to O(1) cells and each
 *    cell holds a bounded slice of both sides.
 *  - a hot cell is ordinary equi-join skew: AQE skew-join splitting (or
 *    [[Skew.saltedJoin]]) applies unchanged — which is exactly why the
 *    composition bottoms out in an equi-join instead of a custom
 *    physical operator.
 *  - points are never replicated; intervals pay ceil(len/width)+1 rows;
 *    overlap pairs are emitted exactly once via first-shared-cell
 *    responsibility, so no `distinct` shuffle follows the join.
 *
 * Join keys must be integral (epoch days/seconds/millis or any long
 * dimension); |value| must stay below 2^53 so the cell arithmetic is
 * exact. Intervals are CLOSED ([start, end], both inclusive); rows whose
 * end < start denote empty intervals and are dropped.
 */
object RangeJoin {

  /** Floor-division cell id, exact for |v| < 2^53 (pmod keeps the
    * numerator an exact multiple of the width, so the double division
    * is lossless; plain long `/` would truncate toward zero for
    * negative values). */
  private def cellOf(v: Column, width: Long): Column =
    ((v - pmod(v, lit(width))) / lit(width)).cast(LongType)

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty,
      s"range join sides must have disjoint column names, both have: " +
        s"${overlap.toSeq.sorted.mkString(", ")}")
  }

  /**
   * Point-in-interval join: every (point, interval) pair with
   * start <= point <= end. A point lives in exactly one cell and an
   * interval covers that cell exactly once, so each qualifying pair
   * meets exactly once — no dedup pass.
   */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0: $bucketWidth")
    requireDisjoint(points, intervals)
    val cell = "__graft_cell__"
    val p = points.withColumn(cell, cellOf(col(pointCol), bucketWidth))
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn(cell, explode(sequence(
        cellOf(col(startCol), bucketWidth), cellOf(col(endCol), bucketWidth))))
    p.join(iv, Seq(cell))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(cell)
  }

  /**
   * Interval-overlap join: every (a, b) pair with
   * a.start <= b.end AND b.start <= a.end. Overlapping intervals share
   * at least one cell; the pair is counted only in the FIRST shared
   * cell — max(cell(a.start), cell(b.start)) — so output is
   * exactly-once without a distinct.
   */
  def intervalOverlap(a: DataFrame, aStartCol: String, aEndCol: String,
                      b: DataFrame, bStartCol: String, bEndCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0: $bucketWidth")
    requireDisjoint(a, b)
    val cell = "__graft_cell__"
    def expand(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn(cell, explode(sequence(
          cellOf(col(s), bucketWidth), cellOf(col(e), bucketWidth))))
    expand(a, aStartCol, aEndCol).join(expand(b, bStartCol, bEndCol), Seq(cell))
      .filter(col(aStartCol) <= col(bEndCol) && col(bStartCol) <= col(aEndCol))
      .filter(col(cell) === greatest(
        cellOf(col(aStartCol), bucketWidth), cellOf(col(bStartCol), bucketWidth)))
      .drop(cell)
  }
}
