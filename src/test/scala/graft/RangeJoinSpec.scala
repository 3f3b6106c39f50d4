package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.functions.Sketches

/**
 * Laws for the cell-bucketed range joins and the HLL sketch surface.
 * RangeJoin's contract is equivalence with the naive cross-join filter
 * at EVERY bucket width (the width tunes the plan, never the answer) —
 * proved here on seeded data with negative values, empty intervals, and
 * duplicate rows; exactly-once emission is proved by counting pairs.
 */
class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  private val rnd = new scala.util.Random(99111L)

  private lazy val points: DataFrame =
    (1 to 300).map(i => (i.toLong, rnd.nextLong(2000) - 1000))
      .toDF("p_id", "p")

  // ~10% inverted (empty) intervals; lengths 0..120; offsets can be negative
  private lazy val intervals: DataFrame =
    (1 to 200).map { i =>
      val s = rnd.nextLong(2000) - 1000
      val len = rnd.nextLong(120)
      val (lo, hi) = if (rnd.nextInt(10) == 0) (s, s - 1 - rnd.nextLong(50))
                     else (s, s + len)
      (i.toLong, lo, hi)
    }.toDF("iv_id", "s", "e")

  private def naivePoint: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet

  test("pointInInterval matches the naive join at widths 1, 7, 64, 5000") {
    val expected = naivePoint
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("p_id", "iv_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width $w emitted duplicates")
      assert(got.toSet === expected, s"width $w diverged from naive join")
    }
  }

  test("intervalOverlap matches the naive join and emits exactly once") {
    val a = intervals.select(col("iv_id").as("a_id"), col("s").as("a_s"),
      col("e").as("a_e"))
    val b = intervals.select(col("iv_id").as("b_id"), col("s").as("b_s"),
      col("e").as("b_e"))
    val expected = a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      // naive side must also drop empty intervals to match the contract
      .filter(col("a_e") >= col("a_s") && col("b_e") >= col("b_s"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 13L, 100L, 5000L)) {
      val got = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width $w emitted duplicates")
      assert(got.toSet === expected, s"width $w diverged from naive join")
    }
  }

  test("range join rejects non-positive widths and colliding column names") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 0L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumnRenamed("p_id", "iv_id"),
        "p", intervals, "s", "e", 10L)
    }
  }

  test("intervalJoin: streaming result equals the batch twin") {
    import graft.streaming.StreamOps
    val dirA = graft.core.TempDirs.scratch("graft_ij_a")
    val dirB = graft.core.TempDirs.scratch("graft_ij_b")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dirA/a.json"),
      """{"a_ts": "2024-01-01T00:00:00", "a_uid": "u1", "a_id": 1}
        |{"a_ts": "2024-01-01T00:30:00", "a_uid": "u1", "a_id": 2}
        |{"a_ts": "2024-01-01T00:00:00", "a_uid": "u2", "a_id": 3}
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dirB/b.json"),
      """{"b_ts": "2024-01-01T00:05:00", "b_uid": "u1", "b_id": 10}
        |{"b_ts": "2024-01-01T00:35:00", "b_uid": "u1", "b_id": 11}
        |{"b_ts": "2024-01-01T02:00:00", "b_uid": "u1", "b_id": 12}
        |{"b_ts": "2024-01-01T00:04:00", "b_uid": "u2", "b_id": 13}
        |""".stripMargin)
    val aSchema = "a_ts TIMESTAMP, a_uid STRING, a_id BIGINT"
    val bSchema = "b_ts TIMESTAMP, b_uid STRING, b_id BIGINT"
    val joinedStream = StreamOps.intervalJoin(
      StreamOps.readJsonStream(spark, dirA, aSchema), "a_uid", "a_ts",
      StreamOps.readJsonStream(spark, dirB, bSchema), "b_uid", "b_ts",
      lowerMs = 0L, upperMs = 10 * 60 * 1000L, watermark = "1 hour")
    StreamOps.runToMemory(joinedStream.select("a_id", "b_id"), "ij_test")
    val streamed = spark.sql("SELECT a_id, b_id FROM ij_test")
      .as[(Long, Long)].collect().toSet
    val batch = StreamOps.intervalJoin(
        spark.read.schema(aSchema).json(dirA), "a_uid", "a_ts",
        spark.read.schema(bSchema).json(dirB), "b_uid", "b_ts",
        lowerMs = 0L, upperMs = 10 * 60 * 1000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // (1,10), (2,11), (3,13) qualify; (2,10) is before the view, (12) is
    // beyond the 10-minute bound
    assert(batch === Set((1L, 10L), (2L, 11L), (3L, 13L)))
    assert(streamed === batch)
  }

  test("hll sketch is exact in the coupon regime and merge-invariant") {
    // 256 distinct values per group: inside the coupon-set capacity of
    // 3/4 * 2^(lgK-3) = 384 at the default lgK = 12, where the sketch is
    // exact (400 would already drift by 1-3)
    val df = (1 to 5000).map(i => (i % 7, (i * 31) % 256)).toDF("g", "v")
    // direct sketch per group == exact distinct
    val direct = df.groupBy("g")
      .agg(Sketches.hllEstimate(Sketches.hllSketch(col("v"))).as("nd"))
      .as[(Int, Long)].collect().toMap
    val exact = df.groupBy("g")
      .agg(countDistinct(col("v")).as("nd")).as[(Int, Long)].collect().toMap
    assert(direct === exact)
    // two-level: per-(g, v%10) partials merged up to g — same answer,
    // proving the sketch column re-aggregates without a rescan
    val merged = df.groupBy(col("g"), (col("v") % 10).as("sub"))
      .agg(Sketches.hllSketch(col("v")).as("sk"))
      .groupBy("g")
      .agg(Sketches.hllEstimate(Sketches.hllMerge(col("sk"))).as("nd"))
      .as[(Int, Long)].collect().toMap
    assert(merged === exact)
  }
}
