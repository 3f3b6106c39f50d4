package graft

import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Invocation-count tracker for the fetch-once law. An `object` so the
  * executor-side lambda reaches it statically (local-mode shared JVM)
  * instead of capturing spec state. */
object Round15FetchCounter {
  val calls = new AtomicInteger(0)
  def reset(): Unit = calls.set(0)
}

/** Round-15 laws:
  * 1. `explodeMapsFetched` runs its generator EXACTLY once per input row
  *    and keeps keys the two-pass `explodeMaps` would silently drop when
  *    the generator is non-idempotent (the remote fan-out hazard —
  *    VERDICT r14 finding 1).
  * 2. The image-decode path is decode-identical with the in-memory stream
  *    cache and does NOT mutate the JVM-global `ImageIO` cache flag
  *    (ADVICE r14: a library operator must not flip global state other
  *    ImageIO callers observe). */
class Round15Spec extends SparkTestBase {
  import spark.implicits._

  test("explodeMapsFetched invokes the generator exactly once per row") {
    Round15FetchCounter.reset()
    val df = (1 to 6).map(i => (s"r$i", i)).toDF("row_id", "n")
    val out = graft.core.Reshape.explodeMapsFetched(df, Seq("row_id", "n"),
      m => {
        Round15FetchCounter.calls.incrementAndGet()
        Seq(Map("v" -> m("n"), "twice" -> (m("n").toInt * 2).toString))
      }, prefix = "p", collapse = false)
    val rows = out.collect()
    assert(Round15FetchCounter.calls.get == 6,
      s"generator ran ${Round15FetchCounter.calls.get} times for 6 rows")
    assert(rows.length == 6)
    // projection reads the SAME fetched maps the probe saw
    assert(out.columns.sorted.toSeq == Seq("n", "p:twice", "p:v", "row_id"))
    val r3 = rows.find(_.getAs[String]("row_id") == "r3").get
    assert(r3.getAs[String]("p:v") == "3" && r3.getAs[String]("p:twice") == "6")
    // re-collecting the result must NOT re-run the generator (lineage is
    // cut at the materialized fetch — a cluster retry semantics guard)
    out.collect()
    assert(Round15FetchCounter.calls.get == 6,
      "re-executing the output plan re-invoked the generator")
  }

  test("explodeMapsFetched keeps keys a non-idempotent generator emits once") {
    Round15FetchCounter.reset()
    val df = (1 to 4).map(i => Tuple1(s"d$i")).toDF("id")
    // each INVOCATION emits a key unique to that invocation: under the
    // two-pass explodeMaps the fan-out pass would produce keys the probe
    // pass never saw, and their values would silently drop; fetch-once
    // must surface every emitted key with its value
    val out = graft.core.Reshape.explodeMapsFetched(df, Seq("id"),
      m => {
        val n = Round15FetchCounter.calls.incrementAndGet()
        Seq(Map(s"k$n" -> m("id")))
      }, prefix = "e", collapse = false)
    val rows = out.collect()
    assert(Round15FetchCounter.calls.get == 4)
    val keyCols = out.columns.filter(_.startsWith("e:k"))
    assert(keyCols.length == 4, s"expected 4 invocation keys, got ${keyCols.toSeq}")
    // every row carries exactly one non-empty invocation key — nothing
    // was dropped on the floor between discovery and projection
    rows.foreach { r =>
      val nonEmpty = keyCols.map(c => r.getAs[String](c)).count(_.nonEmpty)
      assert(nonEmpty == 1, s"row ${r.getAs[String]("id")}: $nonEmpty non-empty keys")
    }
    assert(rows.flatMap(r => keyCols.map(r.getAs[String]).filter(_.nonEmpty))
      .sorted.toSeq == Seq("d1", "d2", "d3", "d4"))
  }

  test("explodeMapsFetched preserves kept-column types and collapse semantics") {
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "s", "x")
    val out = graft.core.Reshape.explodeMapsFetched(df, Seq("s"),
      m => Seq(Map("up" -> m("s").toUpperCase)), prefix = "p")
    // collapse=true drops the input cols, keeps the rest WITH their types
    assert(out.columns.toSeq == Seq("id", "x", "p:up"))
    assert(out.schema("id").dataType.typeName == "long")
    assert(out.schema("x").dataType.typeName == "double")
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 2.5, "A"), (2L, 3.5, "B")))
    // empty generator result drops the row, like explodeMaps
    val dropped = graft.core.Reshape.explodeMapsFetched(df, Seq("s"),
      m => if (m("s") == "a") Seq(Map("up" -> "A")) else Nil, prefix = "p")
    assert(dropped.count() == 1)
  }

  test("explodeMapsFetched == explodeMaps for pure generators (differential law)") {
    // the fetch-once variant must be a drop-in for the two-pass surface
    // whenever the generator is pure — same columns, same row multiset,
    // for both collapse modes and for multi-map fan-outs
    val df = spark.range(40).selectExpr("id", "cast(id % 7 as string) AS k",
      "id * 1.5 AS x").repartition(8)
    val gen = (m: Map[String, String]) => {
      val n = m("k").toInt
      (0 to n % 3).map(i => Map("g" -> s"${m("k")}_$i", s"lane$i" -> m("id")))
    }
    for (collapse <- Seq(true, false)) {
      val two = graft.core.Reshape.explodeMaps(df, Seq("k", "id"), gen,
        prefix = "p", collapse = collapse)
      val one = graft.core.Reshape.explodeMapsFetched(df, Seq("k", "id"), gen,
        prefix = "p", collapse = collapse)
      assert(one.columns.toSeq == two.columns.toSeq, s"collapse=$collapse")
      val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
      assert(one.collect().map(key).sorted.toSeq ==
        two.collect().map(key).sorted.toSeq, s"collapse=$collapse")
    }
  }

  test("explodeMapsFetched fetch-once law holds across many partitions") {
    Round15FetchCounter.reset()
    val df = spark.range(200).selectExpr("id", "cast(id as string) AS s")
      .repartition(16)
    val out = graft.core.Reshape.explodeMapsFetched(df, Seq("s"),
      m => { Round15FetchCounter.calls.incrementAndGet(); Seq(Map("v" -> m("s"))) },
      prefix = "p")
    assert(out.count() == 200)
    assert(Round15FetchCounter.calls.get == 200,
      s"generator ran ${Round15FetchCounter.calls.get} times for 200 rows")
  }

  test("image decode is identical with the per-call memory cache and never " +
       "mutates the global ImageIO flag") {
    import graft.operators.Multimodal
    val before = javax.imageio.ImageIO.getUseCache
    // solid-color 8x8 PNG: decoded luminance is closed-form (r+g+b)/765
    def png(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) { var x = 0; while (x < 8) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rgb = (40 << 16) | (80 << 8) | 120 // lum = 240/765
    val Some((w, h, feats)) = Multimodal.decodeImageFeatures(png(rgb))
    assert(w == 8 && h == 8)
    val expected = math.round(240.0 / 765.0 * 1e6) / 1e6
    assert(feats.toSeq == Seq.fill(Multimodal.FeatureDim)(expected))
    // the distributed path decodes too, and leaves the JVM-global cache
    // flag exactly as it found it (the operator must not flip state other
    // ImageIO callers in this JVM observe)
    val df = Seq((1L, png(rgb)), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val rows = Multimodal.extractFeatures(df, "id", "payload")
      .orderBy("id").collect()
    assert(rows(0).getAs[Int]("width") == 8)
    assert(rows(1).isNullAt(rows(1).fieldIndex("width"))) // fallback path
    assert(javax.imageio.ImageIO.getUseCache == before,
      "extractFeatures mutated the JVM-global ImageIO cache flag")
    assert(before, "expected the JVM default useCache=true to be untouched")
  }
}
