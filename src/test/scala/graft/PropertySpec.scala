package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{Reshape, XDF}
import graft.functions.TextOps
import graft.operators.Dedup

/** Algebraic-law property tests (SURVEY §5: union/merge schema evolution,
  * explode row-count laws, sort stability, dedup invariants). Small
  * generator sizes — each case spins Spark jobs. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic generator sampling (no scalatest-scalacheck bridge in
    * the offline cache): 5 cases per law, sizes <= 8. */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      g.apply(Gen.Parameters.default.withSize(8), Seed(i.toLong))
        .foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private val text = Gen.listOfN(6, word).map(_.mkString(" "))

  test("law: mergeUnion row count = sum of inputs; header = union") {
    forAll(Gen.listOf(Gen.zip(Gen.alphaLowerStr.suchThat(_.nonEmpty), text))) { rows =>
      whenever(rows.nonEmpty) {
        val a = XDF(rows.toDF("k", "t"))
        val b = XDF(rows.map { case (k, t) => (k, t.length) }.toDF("k", "len"))
        val m = a.mergeUnion(Seq(b))
        assert(m.toDF.count() == 2L * rows.length)
        assert(m.getHeader.toSet == Set("k", "t", "len"))
      }
    }
  }

  test("law: replicateRows output count = sum of clamped counts") {
    forAll(Gen.listOf(Gen.choose(-2, 5))) { ns =>
      whenever(ns.nonEmpty) {
        val df = ns.zipWithIndex.map { case (n, i) => (i.toString, n.toString) }
          .toDF("id", "n")
        val out = Reshape.replicateRows(df, "n")
        assert(out.count() == ns.map(n => math.max(n, 0).toLong).sum)
      }
    }
  }

  test("law: splitStr fan-out count = total split parts") {
    forAll(Gen.listOf(Gen.listOfN(3, word).map(_.mkString(",")))) { cells =>
      whenever(cells.nonEmpty) {
        val df = cells.zipWithIndex.map { case (c, i) => (i.toString, c) }
          .toDF("id", "csv")
        val out = Reshape.splitStr(df, Seq("csv"), ",", "s")
        assert(out.count() == cells.map(_.split(",", -1).length.toLong).sum)
      }
    }
  }

  test("law: dedup output ⊆ input and is a fixpoint") {
    forAll(Gen.listOf(text)) { texts =>
      whenever(texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val once = Dedup.exact(df, "text", "doc_id")
        val twice = Dedup.exact(once, "text", "doc_id")
        assert(once.count() == texts.distinct.length)
        assert(twice.count() == once.count())
      }
    }
  }

  test("law: minhash signature is permutation-invariant over shingle sets") {
    forAll(Gen.listOfN(8, word)) { ws =>
      whenever(ws.distinct.length >= 4) {
        // same multiset of 1-gram shingles in different order -> same sig
        val t1 = ws.mkString(" ")
        val t2 = ws.reverse.mkString(" ")
        val df = Seq((1L, t1), (2L, t2)).toDF("id", "text")
          .withColumn("sig", Dedup.minhashSignature(col("text"), 1, 4))
        val sigs = df.select("sig").collect()
          .map(_.getAs[scala.collection.Seq[String]](0).toSeq)
        assert(sigs(0) == sigs(1))
      }
    }
  }

  test("law: connectedComponents equals local union-find on random graphs") {
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 15), Gen.choose(0, 15)).suchThat(p => p._1 != p._2))
    forAll(edgeGen) { es =>
      whenever(es.nonEmpty) {
        // local union-find ground truth
        val parent = scala.collection.mutable.Map[Int, Int]()
        def find(x: Int): Int = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        // min node id per root = expected component label
        val byRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
        val expected = nodes.map(n => f"n$n%02d" -> f"n${byRoot(find(n))}%02d").toMap
        val edges = es.map { case (a, b) => (f"n$a%02d", f"n$b%02d") }
          .toDF("src", "target")
        val got = graft.operators.GraphOps.connectedComponents(edges).collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        assert(got == expected)
      }
    }
  }

  test("law: simhashDedupHamming = union-find over true hamming pairs, k=0..2") {
    var k = -1
    forAll(Gen.listOfN(6, text)) { texts =>
      whenever(texts.nonEmpty) {
        k = (k + 1) % 3
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val hashes = df.withColumn("sh", TextOps.simhash16(col("text")))
          .select("doc_id", "sh").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        for (a <- hashes.keys; b <- hashes.keys if a < b
             if Integer.bitCount(hashes(a) ^ hashes(b)) <= k) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = hashes.keys.filter(x => find(x) == x).toSet
        val got = graft.operators.Dedup
          .simhashDedupHamming(df, "doc_id", "text", maxHamming = k)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(got == expected, s"k=$k texts=$texts")
      }
    }
  }

  test("law: sort is total and stable on key ties") {
    forAll(Gen.listOf(Gen.choose(0, 3))) { ks =>
      whenever(ks.nonEmpty) {
        val df = XDF(ks.zipWithIndex.map { case (k, i) => (k.toString, i.toString) }
          .toDF("k", "v"))
        val sorted = df.sort(Seq("k")).toDF.collect().map(_.getString(0))
        assert(sorted.toSeq == sorted.sorted.toSeq)
      }
    }
  }

  test("law: quality score stays in [0,1]") {
    forAll(Gen.listOf(text)) { texts =>
      whenever(texts.nonEmpty) {
        val scores = texts.toDF("text")
          .select(TextOps.qualityScore(col("text")).as("q"))
          .collect().map(_.getDouble(0))
        scores.foreach(s => assert(s >= 0.0 && s <= 1.0))
      }
    }
  }
}
