package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Dedup

/** Round-18 optimization laws: the rewritten one-scan simhash dedups
  * must select EXACTLY the rows the original two-scan join-back
  * formulation did, on inputs that exercise the edge cases the rewrite
  * reasoned about (null text, hash collisions via duplicate content,
  * hamming-adjacent hashes merging transitively). */
class Round18Spec extends SparkTestBase {
  import spark.implicits._

  /** A corpus with: exact duplicate bodies (same simhash bucket), near
    * variants (hamming-close), distinct texts, and null text rows. */
  private def corpus: DataFrame = {
    val rows = Seq.tabulate(60) { i =>
      val text =
        if (i % 7 == 3) null
        else if (i < 20) "the same boilerplate body repeated verbatim"
        else if (i < 30) s"slightly different page variant number ${i % 3}"
        else s"wholly distinct document alpha$i beta$i gamma$i delta$i"
      (i.toLong, text)
    }
    rows.toDF("doc_id", "text")
  }

  /** The pre-rewrite simhashDedup: hash everything, join back on the
    * hash, keep rows whose id equals the per-hash min. */
  private def legacySimhashDedup(df: DataFrame): DataFrame = {
    val hashed = df.withColumn("__sh__", TextOps.simhash16(col("text")))
    val reps = hashed.groupBy(col("__sh__")).agg(min(col("doc_id")).as("__rep__"))
    hashed.join(reps, Seq("__sh__"))
      .filter(col("doc_id") === col("__rep__"))
      .drop("__sh__", "__rep__")
  }

  /** The pre-rewrite simhashDedupHamming tail: broadcast the
    * (hash -> component) map over a re-hashed corpus and keep
    * id == component rows. */
  private def legacyHammingDedup(df: DataFrame, maxHamming: Int): DataFrame = {
    val masks: Seq[Int] =
      (0 until 16).map(1 << _) ++
        (if (maxHamming >= 2)
          for { i <- 0 until 16; j <- (i + 1) until 16 } yield (1 << i) | (1 << j)
        else Nil)
    val base = df.withColumn("__sh__", TextOps.simhash16(col("text")))
    val bucketReps = base.groupBy(col("__sh__"))
      .agg(min(col("doc_id")).as("__rep__"))
    val probes = bucketReps.select(col("__rep__").as("__pid__"),
      explode(array(masks.map(m => col("__sh__").bitwiseXOR(lit(m))): _*)).as("__p__"))
    val idx = bucketReps.select(col("__rep__").as("__tid__"), col("__sh__").as("__tsh__"))
    val edges = probes.join(idx,
        col("__p__") === col("__tsh__") && col("__pid__") < col("__tid__"))
      .select(col("__pid__").as("src"), col("__tid__").as("target"))
      .distinct()
    val comp = graft.operators.GraphOps.connectedComponents(edges)
      .select(col("node_id").as("__rep__"), col("component"))
    val bucketComp = bucketReps.join(comp, Seq("__rep__"), "left")
      .select(col("__sh__"), coalesce(col("component"), col("__rep__")).as("__comp__"))
    base.join(broadcast(bucketComp), Seq("__sh__"))
      .filter(col("doc_id") === col("__comp__"))
      .drop("__sh__", "__comp__")
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("simhashDedup one-scan rewrite == legacy join-back survivors") {
    val got = ids(Dedup.simhashDedup(corpus, "doc_id", "text"))
    val want = ids(legacySimhashDedup(corpus))
    assert(got == want)
    // sanity: the boilerplate cluster collapsed, null-text rows dropped
    assert(got.count(_ < 20) == 1)
    assert(!got.exists(i => i % 7 == 3))
  }

  test("simhashDedupHamming one-scan rewrite == legacy broadcast-map survivors") {
    for (h <- Seq(1, 2)) {
      val got = ids(Dedup.simhashDedupHamming(corpus, "doc_id", "text", maxHamming = h))
      val want = ids(legacyHammingDedup(corpus, h))
      assert(got == want, s"maxHamming=$h")
    }
  }

  test("simhashDedup schema and non-id columns survive the semi join") {
    val out = Dedup.simhashDedup(corpus, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    // every surviving row is an original row (semi join adds nothing)
    val orig = corpus.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    out.collect().foreach { r =>
      assert(orig(r.getLong(0)) == Option(r.getString(1)))
    }
  }
}
