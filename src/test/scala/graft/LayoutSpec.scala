package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Laws for the Z-order layout operator. */
class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  /** Plain-Scala reference interleave. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave on random values") {
    val rnd = new scala.util.Random(43210L)
    val rows = (1 to 500).map(_ => (rnd.nextLong(1 << 16), rnd.nextLong(1 << 16)))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === zRef(x, y, 16), s"($x, $y)") }
  }

  test("zValue quadrant prefix: top two bits are (yHi, xHi)") {
    val b = 8
    val rows = for (x <- 0 until 256 by 17; y <- 0 until 256 by 13) yield (x.toLong, y.toLong)
    rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), b).as("z"))
      .as[(Long, Long, Long)].collect()
      .foreach { case (x, y, z) =>
        val quadrant = ((y >> (b - 1)) << 1) | (x >> (b - 1))
        assert(z >> (2 * b - 2) === quadrant, s"($x, $y) -> $z")
      }
  }

  test("zorderRepartition preserves rows and yields contiguous Z ranges") {
    val rnd = new scala.util.Random(777L)
    val rows = (1 to 4000).map(i => (i.toLong, rnd.nextLong(1024), rnd.nextLong(1024)))
    val df = rows.toDF("id", "x", "y")
    val laid = Layout.zorderRepartition(df, "x", "y", numPartitions = 8, bits = 10)
    assert(laid.select("id").as[Long].collect().sorted.toSeq ===
      rows.map(_._1).sorted.toSeq)
    // repartitionByRange contract frozen: partitions own disjoint,
    // ordered Z ranges (this is what makes file-level min/max skipping
    // effective on BOTH x and y)
    val spans = laid
      .select(spark_partition_id().as("p"), Layout.zValue(col("x"), col("y"), 10).as("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("p").as[(Int, Long, Long)].collect()
    assert(spans.length > 1)
    spans.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("shardAssign is a seeded permutation: deterministic, balanced-ish, seed-sensitive") {
    val df = spark.range(2000).toDF("id")
    val a = Layout.shardAssign(df, Seq("id"), 8, "42")
      .select("id", "shard", "ord").as[(Long, Int, String)].collect().sortBy(_._1)
    val b = Layout.shardAssign(df, Seq("id"), 8, "42")
      .select("id", "shard", "ord").as[(Long, Int, String)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq) // re-run identical
    val c = Layout.shardAssign(df, Seq("id"), 8, "43")
      .select("id", "shard").as[(Long, Int)].collect().sortBy(_._1)
    assert(a.map(_._2).toSeq !== c.map(_._2).toSeq) // new seed reshuffles
    val sizes = a.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size === 8)
    // md5 spread: every shard within 2x of the mean at n=2000
    sizes.values.foreach(n => assert(n > 125 && n < 500, sizes.toMap))
  }

  test("shardRepartition: shards are whole, contiguous, and ord-sorted in partitions") {
    val df = spark.range(1500).toDF("id")
    val parts = Layout.shardRepartition(df, Seq("id"), 6, "7")
      .select(spark_partition_id().as("p"), col("shard"), col("ord"), col("id"))
      .as[(Int, Int, String, Long)].collect()
      .groupBy(_._1)
    // a shard never straddles two partitions
    val shardHomes = parts.toSeq.flatMap { case (p, rows) =>
      rows.map(_._2).distinct.map(_ -> p) }
    assert(shardHomes.map(_._1).distinct.length === shardHomes.length,
      s"shard split across partitions: $shardHomes")
    // within a partition: shards contiguous, each shard ord-sorted
    parts.values.foreach { rows =>
      assert(rows.map(r => (r._2, r._3)).toSeq ===
        rows.map(r => (r._2, r._3)).sortBy(identity).toSeq,
        "rows must be (shard, ord)-sorted within the partition")
    }
    // all 6 shards present, rows conserved
    assert(parts.values.flatMap(_.map(_._4)).toSeq.sorted === (0L until 1500L))
    assert(parts.values.flatMap(_.map(_._2)).toSet.size === 6)
  }
}
