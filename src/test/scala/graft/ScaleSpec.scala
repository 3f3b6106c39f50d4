package graft

import org.apache.spark.sql.functions._

/** Scale-mechanism evidence: bucketing removes the join shuffle,
  * broadcast map-join plans broadcast, salting spreads a hot key. */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables co-locate the join: no exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // plan-property-sized fixture: the test proves an Exchange is ABSENT,
      // which a 120-row bucketed table proves exactly as well as 1000 rows
      // (round-19 verdict: the suite must fit the driver's budget even on a
      // degraded box; the bucketed WRITE volume was the suite's slowest I/O)
      val orders = (1 to 120).map(i => (i % 12, i, i * 10.0))
        .toDF("custkey", "orderkey", "price")
      val cust = (0 until 12).map(i => (i, s"cust$i")).toDF("custkey", "name")
      orders.write.mode("overwrite").bucketBy(8, "custkey")
        .sortBy("custkey").saveAsTable("b_orders")
      cust.write.mode("overwrite").bucketBy(8, "custkey")
        .sortBy("custkey").saveAsTable("b_cust")
      val joined = spark.table("b_orders").join(spark.table("b_cust"), "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n${plan.take(800)}")
      assert(joined.count() == 120)
      // unbucketed baseline DOES shuffle
      val plain = orders.join(cust, "custkey")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("wide data: name algebra over a 1000-column table") {
    // the reference's headline use case (README "100s or 1000s of
    // columns"): regex select, prefix drop/rename, bulk inline transform
    // must stay driver-side name algebra — one projection, no data pass
    // per column
    import graft.core.XDF
    val n = 1000
    val row = org.apache.spark.sql.Row.fromSeq((1 to n).map(i => i.toString))
    val schema = org.apache.spark.sql.types.StructType(
      (1 to n).map(i => org.apache.spark.sql.types.StructField(
        if (i % 3 == 0) s"m:f$i" else s"f$i",
        org.apache.spark.sql.types.StringType)))
    val df = XDF(spark.createDataFrame(
      java.util.Collections.singletonList(row), schema))
    assert(df.select("f1.*").getHeader.size ==
      (1 to n).count(i => i % 3 != 0 && i.toString.startsWith("1")))
    assert(df.dropColsWithPrefix("m").getHeader.size == n - n / 3)
    val renamed = df.renamePrefix("m", "metric")
    assert(renamed.getHeader.count(_.startsWith("metric:")) == n / 3)
    // bulk inline transform across a regex family is a single projection
    val t = df.transformInline(Seq("m:.*"), c => concat(c, lit("x")))
    assert(t.toDF.head().getString(2) == "3x") // m:f3 is the 3rd column
    assert(t.getHeader.size == n)
    // ... and the physical plan is exactly ONE Project over the scan —
    // resolution is driver-side name algebra, never a per-column data pass
    val plan = t.toDF.queryExecution.executedPlan.toString
    assert("(?m)^\\s*\\+?-?\\s*\\*?\\(?\\d*\\)?\\s*Project".r
      .findAllIn(plan).length <= 1, s"plan:\n${plan.take(500)}")
    // dropEmptyCols sweeps all 1000 columns in ONE aggregate job: every
    // per-column emptiness probe lives in a single Aggregate node
    val half = XDF(spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row.fromSeq(
        (1 to n).map(i => if (i % 2 == 0) "" else i.toString))), schema))
    val jobsBefore = sc.statusTracker.getJobIdsForGroup(null).length
    val swept = half.dropEmptyCols()
    assert(swept.getHeader.size == n / 2)
    val jobsAfter = sc.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter - jobsBefore <= 2,
      s"dropEmptyCols ran ${jobsAfter - jobsBefore} jobs over $n columns")
  }

  test("map-join plans a broadcast hash join") {
    val big = (1 to 1000).map(i => (i % 10, i)).toDF("k", "v")
    val dim = (0 until 10).map(i => (i, s"d$i")).toDF("k", "d")
    val joined = graft.core.XDF(big)
      .innerMapJoin(graft.core.XDF(dim), Seq("k"))
    val plan = joined.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("windowAggregate on a near-unique column: no single-partition window, guarded broadcast") {
    import graft.core.WindowOps
    // near-unique window column (every row distinct) — the input that made
    // the old row_number-over-one-partition ordinal a scale-killer
    val df = (1 to 5000).map(i => (f"ts$i%05d", i.toDouble)).toDF("w", "v")
    val out = WindowOps.windowAggregate(df, "w", Seq("v"), Seq("sum"), 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"ordinal must not use a WindowExec, got:\n${plan.take(800)}")
    assert(out.count() == 50)
    // values are correct: window 0 covers ordinals 0..99 = v 1..100
    val first = out.orderBy(col("w:window")).head()
    assert(first.getString(0) == "ts00001 - ts00100")
    assert(first.getDouble(1) == (1 to 100).sum.toDouble)
    // cardinality guard: above the limit the initial plan must NOT pin a
    // broadcast via hint (size-based auto-broadcast disabled so the hint
    // path is the only one under test; AQE may still promote at runtime —
    // assert on the pre-adaptive plan)
    spark.conf.set("graft.window.distinctBroadcastLimit", "10")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = WindowOps.windowAggregate(df, "w", Seq("v"), Seq("sum"), 100)
      val initial = guarded.queryExecution.sparkPlan.toString
      // the guard governs the DISTINCT-VALUES join (keyed on the window
      // column, data-sized); the ordinal's per-partition offsets join is
      // O(partition count) and stays broadcast by design
      assert(!raw"BroadcastHashJoin \[w#".r.findFirstIn(initial).isDefined,
        s"distinct-values broadcast above the limit, got:\n${initial.take(800)}")
      assert(guarded.count() == 50)
      // and below the limit the hint forces the broadcast regardless of
      // the size threshold
      spark.conf.set("graft.window.distinctBroadcastLimit", "1000000")
      val hinted = WindowOps.windowAggregate(df, "w", Seq("v"), Seq("sum"), 100)
      assert(raw"BroadcastHashJoin \[w#".r
        .findFirstIn(hinted.queryExecution.sparkPlan.toString).isDefined)
    } finally {
      spark.conf.unset("graft.window.distinctBroadcastLimit")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted aggregate spreads a hot key over buckets") {
    val hot = (1 to 10000).map(i => ("hot", 1.0)).toDF("k", "v")
    val out = graft.operators.Skew.saltedSumCount(hot, Seq("k"), "v", 16)
    val r = out.head()
    assert(r.getDouble(1) == 10000.0 && r.getLong(2) == 10000L)
    // the partial stage groups on (k, salt): verify the plan aggregates twice
    val plan = out.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 4) // partial+final x2 phases
  }
}
