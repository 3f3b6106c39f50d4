package graft

import org.apache.spark.sql.functions._
import graft.functions.Mmh3
import graft.plans.Mmh3Hash64
import graft.core.XDF

/** Bit-compat vectors for murmur3-64 (generated from the public-domain
  * x64_128 algorithm; "foo" matches the widely-published
  * mmh3.hash64("foo") value). */
class Mmh3Spec extends SparkTestBase {
  import spark.implicits._

  val vectors: Seq[(String, Long)] = Seq(
    "" -> 0L,
    "foo" -> -2129773440516405919L,
    "hello world" -> 5998619086395760910L,
    "a" -> -8839064797231613815L,
    "0123456789abcdef" -> 5467490433528156583L, // exact 16-byte block
    "key1\tval1" -> -7651664971763848624L,
    "日本語" -> 1349821744801378292L,
  )

  test("scala Mmh3.hash64 matches python mmh3.hash64 vectors") {
    vectors.foreach { case (s, expected) =>
      assert(Mmh3.hash64(s, 0L) == expected, s"for input '$s'")
    }
    assert(Mmh3.hash64("foo", 42L) == -840311307571801102L)
  }

  test("catalyst expression evaluates and codegens identically") {
    val df = vectors.map(_._1).toDF("s")
    val out = df.select(col("s"), Mmh3Hash64.mmh3_64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vectors.foreach { case (s, expected) => assert(out(s) == expected) }
  }

  test("expression survives whole-stage codegen in a filter+agg plan") {
    val df = (1 to 1000).map(_.toString).toDF("s")
    val n = df.filter(Mmh3Hash64.mmh3_64(col("s")) % 2 === 0).count()
    assert(n > 400 && n < 600) // uniform-ish split
  }

  test("mmh3_64 registers as a SQL function") {
    // getOrCreate would reuse the shared suite session (extensions only
    // apply at session build), so exercise the same builder via the
    // registry directly, plus check GraftExtensions applies cleanly
    new graft.plans.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mmh3_64", exprs => graft.plans.Mmh3Hash64(exprs.head, 0L), "scala_udf")
    val out = spark.sql("SELECT mmh3_64('foo') AS h").head()
    assert(out.getLong(0) == -2129773440516405919L)
  }

  test("AggRegistry custom function registration") {
    graft.core.AggRegistry.register("second_largest",
      c => sort_array(collect_set(c), asc = false).getItem(1))
    val out = Seq(1, 5, 3, 5, 4).toDF("v")
      .agg(graft.core.AggRegistry.expr("second_largest", col("v"))).head()
    assert(out.getInt(0) == 4)
  }

  test("reservoir sample: exact k, subset of input, deterministic") {
    val df = (1 to 1000).map(_.toString).toDF("v").repartition(8)
    val s1 = graft.core.Sampling.sampleNOnePass(df, 50, seed = 7)
      .collect().map(_.getString(0)).toSeq
    assert(s1.length == 50 && s1.distinct.length == 50)
    assert(s1.forall(v => v.toInt >= 1 && v.toInt <= 1000))
    // statistical sanity: mean of a 50-of-1000 uniform sample
    val mean = s1.map(_.toDouble).sum / 50
    assert(mean > 300 && mean < 700)
    // k > n returns everything
    val all = graft.core.Sampling.sampleNOnePass(df.limit(10), 50)
    assert(all.count() == 10)
  }

  test("generateKeyHash compat mode equals abs(mmh3 of tab-joined cells)") {
    val df = XDF(Seq(("k1", "v1")).toDF("a", "b"))
    val h = df.generateKeyHash("h", Seq("a", "b"), compat = true)
      .toDF.head().getAs[Long]("h")
    assert(h == math.abs(Mmh3.hash64("k1\tv1", 0L)))
  }
}
