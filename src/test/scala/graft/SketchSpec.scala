package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches._

/** Laws for the Theta (distinct algebra) and KLL (quantile) sketches:
  * exact-regime equality against brute force, merge/partitioning
  * independence in that regime, and the documented error bounds beyond
  * it. The driver gates (q_theta_overlap, q_kll_quantiles) pin the exact
  * regime against DuckDB; these specs own everything the SQL oracle
  * can't say. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic multiset with controlled distinct counts and overlap:
  // a = {0..599}, b = {300..899}, each value repeated 1 + (v % 3) times
  private lazy val pairs: Seq[(String, Long)] =
    (for { v <- 0L until 600L; _ <- 0 to (v % 3).toInt } yield ("a", v)) ++
    (for { v <- 300L until 900L; _ <- 0 to (v % 3).toInt } yield ("b", v))

  test("theta exact regime: sketch/union/intersect/aNotB match set brute force") {
    val df = pairs.toDF("side", "v").repartition(7)
    val sk = df.groupBy("side").agg(thetaSketch(col("v"), 4096).as("sk"))
      .groupBy().pivot("side", Seq("a", "b")).agg(first("sk"))
    val row = sk.select(
      thetaEstimate(col("a")).as("na"),
      thetaEstimate(col("b")).as("nb"),
      thetaEstimate(thetaUnionPair(col("a"), col("b"))).as("nu"),
      thetaEstimate(thetaIntersect(col("a"), col("b"))).as("ni"),
      thetaEstimate(thetaANotB(col("a"), col("b"))).as("nd")).head()
    assert(row.getLong(0) === 600L)
    assert(row.getLong(1) === 600L)
    assert(row.getLong(2) === 900L)
    assert(row.getLong(3) === 300L)
    assert(row.getLong(4) === 300L)
  }

  test("theta rollup: union-agg of fine-grain sketches == direct sketch, any partitioning") {
    val df = pairs.toDF("side", "v").withColumn("g", pmod(col("v"), lit(13)))
    for (nPart <- Seq(1, 5, 16)) {
      val fine = df.repartition(nPart)
        .groupBy("g").agg(thetaSketch(col("v"), 1024).as("sk"))
      val rolled = fine.agg(thetaEstimate(thetaUnion(col("sk"), 1024)).as("nd")).head()
      assert(rolled.getLong(0) === 900L, s"nPart=$nPart")
    }
  }

  test("theta estimation regime: RSE bound holds at 100k distinct, nomEntries 4096") {
    val nd = spark.range(100000)
      .agg(thetaEstimate(thetaSketch(col("id"), 4096)).as("nd"))
      .head().getLong(0)
    // ~1/sqrt(4096) = 1.56% RSE; assert within 5 sigma
    assert(math.abs(nd - 100000L) < 100000 * 0.078, s"estimate $nd")
  }

  test("theta null and empty-group handling") {
    val df = Seq[(String, java.lang.Long)](("a", 1L), ("a", null), ("b", null))
      .toDF("side", "v")
    val out = df.groupBy("side").agg(thetaEstimate(thetaSketch(col("v"))).as("nd"))
      .orderBy("side").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 1L), ("b", 0L)))
  }

  test("kll exact regime: quantile == sorted item at ceil(q*n), any partitioning") {
    // group sizes 37 and 200 (<= k=256), awkward values incl. ties
    val vals = (0 until 37).map(i => ("g1", (i * 7 % 19).toDouble)) ++
      (0 until 200).map(i => ("g2", (i % 83).toDouble))
    for (nPart <- Seq(1, 4, 11)) {
      val df = vals.toDF("g", "v").repartition(nPart)
      val sk = df.groupBy("g").agg(kllSketch(col("v"), 256).as("sk"))
      val got = sk.select(col("g"), kllQuantile(col("sk"), 0.25).as("p25"),
          kllQuantile(col("sk"), 0.5).as("p50"),
          kllQuantile(col("sk"), 0.75).as("p75"),
          kllQuantile(col("sk"), 1.0).as("p100"), kllN(col("sk")).as("n"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
        .toMap
      for ((g, group) <- vals.groupBy(_._1)) {
        val sorted = group.map(_._2).sorted
        val n = sorted.length
        def exp(q: Double) = sorted(math.ceil(q * n).toInt - 1)
        assert(got(g) === ((exp(0.25), exp(0.5), exp(0.75), exp(1.0), n.toLong)),
          s"group $g nPart=$nPart")
      }
    }
  }

  test("kll two-level merge stays exact while total n <= k") {
    val df = (0 until 500).map(i => (i % 10, ((i * 37) % 251).toDouble))
      .toDF("g", "v").repartition(9)
    val fine = df.groupBy("g").agg(kllSketch(col("v"), 1024).as("sk"))
    val row = fine.agg(kllQuantile(kllMerge(col("sk"), 1024), 0.5).as("p50"),
      kllN(kllMerge(col("sk"), 1024)).as("n")).head()
    val sorted = (0 until 500).map(i => ((i * 37) % 251).toDouble).sorted
    assert(row.getLong(1) === 500L)
    assert(row.getDouble(0) === sorted(math.ceil(0.5 * 500).toInt - 1))
  }

  test("kll estimation regime: rank error within the documented bound") {
    // 100k uniform values through k=200: normalized rank error ~1.65/sqrt(200)
    // at 1 sigma; assert the p50 estimate's true rank within 5x that
    val p50 = spark.range(100000)
      .agg(kllQuantile(kllSketch(col("id").cast("double"), 200), 0.5).as("p50"))
      .head().getDouble(0)
    val trueRank = p50 / 100000.0
    assert(math.abs(trueRank - 0.5) < 5 * 1.65 / math.sqrt(200.0), s"p50=$p50")
  }

  test("kll empty sketch probes NULL, count 0") {
    val df = Seq[(String, java.lang.Double)](("a", null)).toDF("g", "v")
    val row = df.groupBy("g").agg(
      kllQuantile(kllSketch(col("v")), 0.5).as("p50"),
      kllN(kllSketch(col("v"))).as("n")).head()
    assert(row.isNullAt(1) && row.getLong(2) === 0L)
  }
}
