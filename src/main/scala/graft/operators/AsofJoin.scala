package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of join: for every left row, attach the most recent right row with
 * the same key whose timestamp is <= the left timestamp (backward
 * direction; the time-series point-in-time join Spark has no native
 * operator for, and the reference lacks entirely — SURVEY §2.5 "theta/
 * range/as-of joins: not implemented").
 *
 * Implementation is the scalable union+window composition (guide's
 * "compose built-ins first" preference): tag both sides, union by name,
 * one window per key ordered by (ts, side) carrying last-non-null right
 * values forward, keep left rows. ONE shuffle on the key — never the
 * range-explosion of an inequality join, and no per-key driver work.
 * Equal timestamps match (right sorts before left at the same instant).
 */
object AsofJoin {

  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], leftTs: String, rightTs: String,
                       rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val collide = rightValueCols.intersect(leftCols)
    require(collide.isEmpty,
      s"rightValueCols $collide already exist on the left side — rename first")
    // normalize: shared key names, one __ts__ column, right side = 0 so
    // it precedes left rows at an identical timestamp
    val l = left
      .withColumn("__ts__", col(leftTs))
      .withColumn("__side__", lit(1))
    // right must already use the key names; (key, ts) pairs should be
    // unique for a deterministic pick (pre-aggregate otherwise — the
    // standard merge_asof contract)
    // values ride in a single-field struct: the struct is non-null for
    // every right row even when the VALUE is null, so last(ignoreNulls)
    // skips only the left-side placeholders — a right row with a null
    // value correctly supersedes an earlier non-null one (merge_asof
    // attaches the most recent ROW, not the most recent non-null value)
    val r = right.select(
      (keyCols.map(col) :+ col(rightTs).as("__ts__") :+ lit(0).as("__side__")) ++
        rightValueCols.map(c => struct(col(c).as("v")).as(s"__rv_$c")): _*)
    val lAligned = l.select(
      (leftCols.map(col) :+ col("__ts__") :+ col("__side__")) ++
        rightValueCols.map(c => lit(null).cast(r.schema(s"__rv_$c").dataType).as(s"__rv_$c")): _*)
    val unioned = lAligned.unionByName(r.select(
      (keyCols.map(col) :+ col("__ts__") :+ col("__side__")) ++
        rightValueCols.map(c => col(s"__rv_$c")): _*),
      allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts__"), col("__side__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.foldLeft(unioned)((d, c) =>
      d.withColumn(c,
        last(col(s"__rv_$c"), ignoreNulls = true).over(w).getField("v")))
    carried.filter(col("__side__") === 1)
      .select((leftCols ++ rightValueCols).map(col): _*)
  }
}
