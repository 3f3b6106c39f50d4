package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Statistical comparisons (reference: EXT carries a t-test helper in its
 * analytics extensions). Welch's unequal-variance t-test between two
 * classes of a metric column, computed entirely as one aggregation —
 * no per-group collect.
 */
object Stats {

  /**
   * Welch's t statistic + Welch–Satterthwaite degrees of freedom per
   * grouping key, comparing `metricCol` between rows where
   * `classCol == classA` vs `classCol == classB`.
   * Output: groupCols ++ (n_a, n_b, mean_a, mean_b, t_stat, df).
   */
  def welchTTest(df: DataFrame, groupCols: Seq[String], classCol: String,
                 classA: String, classB: String, metricCol: String): DataFrame = {
    def side(v: String, f: Column => Column, alias: String): Column =
      f(when(col(classCol) === v, col(metricCol).cast(DoubleType))).as(alias)
    val agged = df.groupBy(groupCols.map(col): _*).agg(
      side(classA, count, "n_a"), side(classB, count, "n_b"),
      side(classA, avg, "mean_a"), side(classB, avg, "mean_b"),
      side(classA, c => coalesce(var_samp(c), lit(0.0)), "var_a"),
      side(classB, c => coalesce(var_samp(c), lit(0.0)), "var_b"))
    val sa = col("var_a") / col("n_a")
    val sb = col("var_b") / col("n_b")
    agged
      .withColumn("t_stat", (col("mean_a") - col("mean_b")) / sqrt(sa + sb))
      .withColumn("df",
        pow(sa + sb, 2) /
          (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1)))
      .drop("var_a", "var_b")
  }
}
