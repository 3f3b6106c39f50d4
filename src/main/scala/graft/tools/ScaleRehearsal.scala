package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, GraphOps}
import graft.core.Sampling

/**
 * Scale rehearsal: the iterative/bucketed operators on fixtures 100x
 * beyond the gate scale — a 10M-edge random graph through
 * connectedComponents, a 1M-doc corpus (with planted duplicate
 * clusters) through minhashDedupCC, and the same corpus through
 * mixBySource. Prints wall time and the Spark job count per operator
 * (job count is the cadence signal: it must stay O(log diameter) /
 * O(rounds), never O(data)). Results recorded in SCALE.md.
 */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/tmp/graft_scale_spill")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(name: String)(f: => Long): Unit = {
      val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0
      println(f"[rehearsal] $name%-28s ${secs}%8.1fs jobs=$jobs%-4d rows=$n%d")
    }

    // ---- 10M-edge random graph over 1M nodes (expected: one giant
    // component + small islands; diameter small => few doubling rounds)
    val edges = spark.range(10000000L).select(
      pmod(hash(col("id"), lit(1)), lit(1000000L)).cast("string").as("src"),
      pmod(hash(col("id"), lit(2)), lit(1000000L)).cast("string").as("target"))
    run("connectedComponents 10M-e") {
      GraphOps.connectedComponents(edges, maxIter = 25)
        .select(countDistinct("component")).head().getLong(0)
    }

    // ---- long-chain graph: worst-case diameter for pointer doubling
    val chain = spark.range(100000L).select(
      concat(lit("n"), col("id")).as("src"),
      concat(lit("n"), col("id") + 1).as("target"))
    run("ancestorClosure 8k-chain (33M pairs)") {
      // closure of a 100k chain is 5G pairs — too big to materialize
      // locally; an 8k chain (33.5M closure pairs, 14 doubling rounds,
      // worst-case diameter) exercises the frontier-composition path
      GraphOps.ancestorClosure(chain.limit(1 << 13), maxIter = 15).count()
    }

    // ---- 1M docs, ~100k planted duplicate clusters of 5 + 500k distinct
    val docs = spark.range(1000000L).select(col("id").as("doc_id"),
      when(col("id") < 500000L,
          concat(lit("repeated boilerplate body variant number "),
            (col("id") % 100000L).cast("string")))
        .otherwise(concat_ws(" ",
          concat(lit("alpha"), col("id")), concat(lit("beta"), col("id")),
          concat(lit("gamma"), col("id")), concat(lit("delta"), col("id")),
          concat(lit("epsilon"), col("id")))).as("text"))
    run("minhashDedupCC 1M docs") {
      Dedup.minhashDedupCC(docs, "doc_id", "text", 3, 12, 4).count()
    }

    // ---- corpus mixing on 1M rows, 100 sources -> target weights
    val sourced = spark.range(1000000L).select(col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(100L)).cast("string")).as("source"))
    run("mixBySource 1M rows/100 src") {
      Sampling.mixBySource(sourced, "source",
        (0 until 100).map(i => s"s$i" -> 1.0 / 100).toMap,
        keyCols = Seq("doc_id")).count()
    }

    // ---- cross-doc repeated-substring spans on the same 1M-doc corpus:
    // the 500k boilerplate docs duplicate whole texts across docs (100k
    // distinct texts x 5), the 500k tails are unique — every boilerplate
    // position marks, no unique position may
    run("duplicatedNgramSpans 1M docs") {
      Dedup.duplicatedNgramSpans(docs, "doc_id", "text", n = 4).count()
    }

    // ---- mergeable sketches over 10M values, 100-group fine grain +
    // rollup: partials are sketches, the shuffle carries KBs per group
    import graft.functions.Sketches
    val vals = spark.range(10000000L).select(
      pmod(col("id"), lit(100L)).as("g"),
      pmod(hash(col("id")), lit(1000000L)).as("v"))
    run("theta sketch+rollup 10M vals") {
      vals.groupBy("g").agg(Sketches.thetaSketch(col("v")).as("sk"))
        .agg(Sketches.thetaEstimate(Sketches.thetaUnion(col("sk"))))
        .head(); 10000000L
    }
    run("kll sketch+rollup 10M vals") {
      vals.groupBy("g")
        .agg(Sketches.kllSketch(col("v").cast("double"), 200).as("sk"))
        .agg(Sketches.kllQuantile(Sketches.kllMerge(col("sk"), 200), 0.5))
        .head(); 10000000L
    }

    // ---- deterministic shard layout: 1M rows -> 64 shards, one
    // hash-partition exchange + partition-local sorts
    run("shardRepartition 1M/64") {
      graft.operators.Layout.shardRepartition(sourced, Seq("doc_id"), 64)
        .count()
    }

    // ---- weighted sample: 1M rows, top-10k by A-ES key — bounded
    // top-n, zero data shuffle (PLAN_AUDIT: exchanges=0 for the gate)
    run("weightedSampleN 1M -> 10k") {
      Sampling.weightedSampleN(sourced, 10000,
        pmod(col("doc_id"), lit(7L)).cast("double") + lit(1.0),
        Seq("doc_id")).count()
    }

    spark.stop()
  }
}
