package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Windows & time series (reference: dataframe.py:638-729 window_aggregate;
 * §2.12).
 *
 * The reference windows over the *sorted distinct values* of the window
 * column (not raw rows): tumbling chunks of `winsize` distinct values, or
 * sliding windows replicating each row into every window containing it.
 * For time-typed columns the idiomatic Spark mapping is `window(ts, ...)`
 * (tumbling) / duplicated membership via slide (sliding) — both below.
 */
object WindowOps {

  /** Tumbling time window aggregate: groups by `window(ts, size)` plus
    * optional keys. Map-side partial agg + one shuffle. */
  def tumblingTimeAggregate(df: DataFrame, tsCol: String, size: String,
                            keys: Seq[String], aggCols: Seq[String],
                            aggFuncs: Seq[String]): DataFrame = {
    val exprs = aggCols.zip(aggFuncs).map { case (c, f) =>
      AggRegistry.expr(f, col(c)).as(AggRegistry.outputName(c, f)) }
    val g = df.groupBy(window(col(tsCol), size) +: keys.map(col): _*)
    g.agg(exprs.head, exprs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Sliding time window aggregate — rows replicated into every window
    * they fall in, exactly the reference's sliding semantics
    * (dataframe.py:674-678, 711-715). */
  def slidingTimeAggregate(df: DataFrame, tsCol: String, size: String,
                           slide: String, keys: Seq[String],
                           aggCols: Seq[String], aggFuncs: Seq[String]): DataFrame = {
    val exprs = aggCols.zip(aggFuncs).map { case (c, f) =>
      AggRegistry.expr(f, col(c)).as(AggRegistry.outputName(c, f)) }
    val g = df.groupBy(window(col(tsCol), size, slide) +: keys.map(col): _*)
    g.agg(exprs.head, exprs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /**
   * Reference-faithful `window_aggregate`: tumbling count-based windows
   * over the sorted DISTINCT values of `winCol` (dataframe.py:655-672),
   * window label = "first - last" of the value range (dataframe.py:713).
   *
   * Distributed shape: dense_rank over distinct values gives each value
   * its ordinal; `floor((rank-1)/winsize)` is its tumbling window id; the
   * label is the min/max value within the window. Two shuffles total
   * (rank + final agg) regardless of data size.
   */
  /** Sliding count-based variant (dataframe.py:674-678, 711-715): every
    * run of `winSize` consecutive distinct values is a window; a value
    * with ordinal o replicates into windows [max(0, o-winSize+1) .. o] —
    * explode(sequence) fan-out, then one aggregation. */
  def slidingWindowAggregate(df: DataFrame, winCol: String, aggCols: Seq[String],
                             aggFuncs: Seq[String], winSize: Int): DataFrame = {
    // null winCol rows are excluded up front: a null would take an ordinal
    // in distinctVals but never match the equi-join, silently losing rows
    // AND misaligning every window after it. localCheckpoint: the frame is
    // consumed twice (count + join) — without it the distinct + global
    // row_number shuffle executes twice.
    val distinctVals = df.filter(col(winCol).isNotNull)
      .select(col(winCol).cast(StringType).as(winCol)).distinct()
      .withColumn("__ord__",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(winCol))) - 1)
      .localCheckpoint()
    // only COMPLETE windows exist (reference dataframe.py:676-678 assigns
    // win_index only while num_values - win_index >= winsize): valid
    // window starts are 0 .. n-winSize
    val n = distinctVals.count()
    val maxStart = n - winSize
    if (maxStart < 0)
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        windowAggregate(df.limit(0), winCol, aggCols, aggFuncs, winSize).schema)
    val tagged = df.withColumn(winCol, col(winCol).cast(StringType))
      .join(broadcast(distinctVals), Seq(winCol), "inner")
      .withColumn("__win__", explode(sequence(
        greatest(lit(0L), col("__ord__") - (winSize - 1)),
        least(col("__ord__").cast("long"), lit(maxStart)))))
    val label = concat_ws(" - ", min(col(winCol)), max(col(winCol)))
    val exprs = label.as(s"$winCol:window") +:
      aggCols.zip(aggFuncs).map { case (c, f) =>
        AggRegistry.expr(f, col(c)).as(AggRegistry.outputName(c, f)) }
    tagged.groupBy(col("__win__")).agg(exprs.head, exprs.tail: _*).drop("__win__")
  }

  def windowAggregate(df: DataFrame, winCol: String, aggCols: Seq[String],
                      aggFuncs: Seq[String], winSize: Int): DataFrame = {
    // null winCol rows excluded for the same reason as the sliding variant
    val distinctVals = df.filter(col(winCol).isNotNull)
      .select(col(winCol).cast(StringType).as(winCol)).distinct()
      .withColumn("__ord__",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(winCol))))
      .withColumn("__win__", floor((col("__ord__") - 1) / winSize))
      .drop("__ord__")
    val tagged = df.withColumn(winCol, col(winCol).cast(StringType))
      .join(broadcast(distinctVals), Seq(winCol), "inner")
    val label = concat_ws(" - ", min(col(winCol)), max(col(winCol)))
    val exprs = label.as(s"$winCol:window") +:
      aggCols.zip(aggFuncs).map { case (c, f) =>
        AggRegistry.expr(f, col(c)).as(AggRegistry.outputName(c, f)) }
    tagged.groupBy(col("__win__")).agg(exprs.head, exprs.tail: _*).drop("__win__")
  }
}
