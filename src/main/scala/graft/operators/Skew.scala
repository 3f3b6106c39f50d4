package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation utilities for hot keys at cluster scale. AQE's skew
 * handling (spark.sql.adaptive.skewJoin.enabled) covers sort-merge joins
 * at runtime; these helpers cover the cases AQE doesn't: skewed
 * aggregations, and broadcast-ineligible joins planned ahead of time.
 */
object Skew {

  /**
   * Two-phase salted aggregation: partial aggregate on (keys, salt) —
   * spreading a hot key over `saltBuckets` reducers — then final
   * aggregate on keys. Works for any algebraic aggregate (sum/count/
   * min/max); for avg pass sum+count and divide after.
   *
   * exprs maps output name -> (partialExpr, finalExpr-over-partial).
   */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      exprs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt__",
      (rand(0) * saltBuckets).cast("int")) // uniform draw, same as saltedJoin
    val partialAggs = exprs.toSeq.map { case (n, (p, _)) => p.as(s"__p_$n") }
    val partial = salted.groupBy((keys.map(col) :+ col("__salt__")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = exprs.toSeq.map { case (n, (_, f)) => f(col(s"__p_$n")).as(n) }
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Convenience: salted sum/count per key (the common hot-key shape). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valCol: String,
                     saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, keys, saltBuckets, Map(
      "sum" -> (sum(col(valCol)), (c: Column) => sum(c)),
      "count" -> (count(lit(1)), (c: Column) => sum(c))))

  /**
   * Salted join for a skewed LEFT side against a small-ish right side
   * that still exceeds the broadcast threshold: left rows get a random
   * salt in [0, n); right rows replicate n times. The join key becomes
   * (key, salt) — a hot left key spreads over n reducers at the cost of
   * n-fold replication of the right side.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // right/full would emit every unmatched right row once PER SALT —
    // the replication scheme only preserves left-side multiplicity
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType),
      s"saltedJoin supports left-preserving join types only, got '$joinType'")
    val l = left.withColumn("__salt__",
      (rand(0) * saltBuckets).cast("int"))
    val r = right.withColumn("__salt__",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt__", joinType).drop("__salt__")
  }
}
