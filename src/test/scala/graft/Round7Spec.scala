package graft

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.compat._

/** Round-7 hardening: advisor-flagged compat semantics + null-cast laws. */
class Round7Spec extends SparkTestBase {
  import spark.implicits._

  private def multiset(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  // ===== advisor: is_nonzero must use the FLOAT test (reference delegation) =====

  test("compat is_nonzero keeps fractional values like the reference") {
    val df = Seq(("a", "0.5"), ("b", "0"), ("c", "0.0"), ("d", "2"))
      .toDF("k", "v")
    val kept = core.XDF(df).is_nonzero("v").toDF.select("k")
      .as[String].collect().sorted
    // int truncation would drop "0.5"; the reference's float path keeps it
    assert(kept.toSeq == Seq("a", "d"))
  }

  // ===== advisor: ratio semantics for sample_without/with_replacement =====

  test("compat sample_without_replacement takes a ratio, not a row count") {
    val df = (1 to 2000).map(i => (i, s"r$i")).toDF("id", "s")
    val viaCompat = core.XDF(df).sample_without_replacement(0.99, 42L)
    val viaSample = core.XDF(df).sample(0.99, 42L)
    // same delegation, same seed -> identical surviving rows; and a ratio
    // near 1.0 must keep ~all rows (the old row-count reading kept 0 or 1)
    assert(multiset(viaCompat.toDF) == multiset(viaSample.toDF))
    assert(viaCompat.toDF.count() > 1500)
    intercept[UnsupportedOperationException] {
      core.XDF(df).sample_with_replacement(0.5, 42L)
    }
  }

  // ===== advisor: use_approx defaults true like the reference =====

  test("compat sample_group_by_max_uniq_values dispatches approx by default") {
    val df = (1 to 3000).map { i => (s"g${i % 5}", s"v${i % 200}", i) }
      .toDF("g", "v", "ord")
    val viaDefault = core.XDF(df)
      .sample_group_by_max_uniq_values(Seq("g"), "v", 10, 7L)
    val viaApprox = core.XDF(df)
      .sample_group_by_max_uniq_values_approx(Seq("g"), "v", 10, 7L)
    val viaExactArg = core.XDF(df)
      .sample_group_by_max_uniq_values(Seq("g"), "v", 10, 7L, use_approx = false)
    val viaExact = core.XDF(df)
      .sample_group_by_max_uniq_values_exact(Seq("g"), "v", 10, 7L)
    assert(multiset(viaDefault.toDF) == multiset(viaApprox.toDF))
    assert(multiset(viaExactArg.toDF) == multiset(viaExact.toDF))
    // the exact path hard-caps; the approx path is ratio-based (expected
    // ~= cap, may overshoot) so only assert it actually reduced
    val exactCaps = viaExactArg.toDF.groupBy("g")
      .agg(countDistinct(col("v")).as("n")).as[(String, Long)].collect()
    assert(exactCaps.forall(_._2 <= 10))
    val approxCaps = viaDefault.toDF.groupBy("g")
      .agg(countDistinct(col("v")).as("n")).as[(String, Long)].collect()
    assert(approxCaps.forall(_._2 < 200))
  }

  // ===== advisor: global cumsum null gate counts the CAST column =====

  test("law: global cumulativeSum treats uncastable strings as nulls (window law)") {
    // string-typed value column where some non-null cells don't cast to
    // double: the running total must stay null until the first CASTABLE
    // value, exactly like the unpartitioned-window formulation. Under
    // ANSI (the default) both formulations throw on the malformed cast —
    // the scenario only exists with ansi off, so pin it for this law.
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try cumSumNullLaw()
    finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  private def cumSumNullLaw(): Unit = {
    val rows = (0 until 500).map { i =>
      val v = if (i < 30) "not-a-number"
              else if (i % 7 == 0) null
              else if (i % 11 == 0) "xyz"
              else (i / 10.0).toString
      (i, v)
    }
    val df = spark.createDataFrame(rows).toDF("ord", "v").repartition(5)
    val viaPrefix = core.XDF(df)
      .cumulativeSum("v", "rt", orderCols = Seq("ord"))
      .toDF.select(col("ord"), round(col("rt"), 6).as("rt"))
    val w = Window.orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWin = df
      .withColumn("rt", sum(col("v").cast("double")).over(w))
      .select(col("ord"), round(col("rt"), 6).as("rt"))
    assert(multiset(viaPrefix) == multiset(viaWin))
    // the first 30 rows (uncastable prefix) must be null, not 0.0
    val head = viaPrefix.filter(col("ord") < 30).select("rt").collect()
    assert(head.length == 30 && head.forall(_.isNullAt(0)))
  }
}
