package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.operators.{Dedup, GraphOps}

/** Reliable-checkpoint cost probe (round-16, verdict item 4; NOT a gate).
  *
  * The iterative operators default to `localCheckpoint` (fast; blocks die
  * with an executor) and offer `reliable = true` (HDFS-style checkpoint
  * files that survive executor loss — what a 1000-executor job wants for
  * long CC iterations). reliable=true was spec-proven at toy scale
  * (Round3Spec); this probe measures its WALL COST at data volume so a
  * cluster operator knows the price before flipping the switch.
  *
  * Runs the two iterative gate pipelines (q_graph_cc's chain CC over
  * orders; q_dedup_minhash_cc's transitive LSH dedup over documents) at
  * the given fixture in both modes, N passes each, asserts the outputs
  * are value-identical across modes, and prints one JSON line per
  * (gate, mode, pass). Usage:
  *   scripts/run_main.sh graft.tools.ReliableCheckpointProbe \
  *     [sfDir] [passes] [checkpointDir]
  */
object ReliableCheckpointProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val ckptDir = if (args.length > 2) args(2)
                  else graft.core.TempDirs.scratch("graft_reliable_ckpt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(ckptDir)
    spark.range(1000000).selectExpr("sum(id)").collect()

    // the two iterative gate pipelines, parameterized by `reliable` —
    // operator inputs identical to q_graph_cc / q_dedup_minhash_cc
    def graphCc(reliable: Boolean): DataFrame = {
      val rn = graft.core.XDF.globalOrdinal(
        spark.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey")),
        Seq(col("o_orderkey")), "rn")
      val edges = rn.filter(col("rn") % 4 =!= 0)
        .select(lpad(col("rn").cast(StringType), 10, "0").as("src"),
          lpad((col("rn") + 1).cast(StringType), 10, "0").as("target"))
      GraphOps.connectedComponents(edges, maxIter = 10, reliable = reliable)
    }
    def minhashCc(reliable: Boolean): DataFrame =
      Dedup.minhashDedupCC(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        shingleSize = 3, numHashes = 12, bands = 4, maxIter = 10,
        reliable = reliable).select("doc_id")

    // order-independent value fingerprint: count + sum of row-hash
    // (decimal sum: a long sum of ~1M random 64-bit hashes overflows
    // under ANSI mode)
    def fingerprint(df: DataFrame): (Long, String) = {
      val r = df.select(
        count(lit(1)),
        sum(xxhash64(df.columns.map(col).toIndexedSeq: _*)
          .cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), r.getDecimal(1).toString)
    }

    Seq("q_graph_cc" -> graphCc _, "q_dedup_minhash_cc" -> minhashCc _)
      .foreach { case (name, mk) =>
        var fps = Map.empty[Boolean, (Long, String)]
        for (pass <- 1 to passes; reliable <- Seq(false, true)) {
          val t0 = System.nanoTime()
          val fp = fingerprint(mk(reliable))
          val dt = (System.nanoTime() - t0) / 1e9
          fps.get(reliable) match {
            case Some(prev) => require(prev == fp,
              s"$name reliable=$reliable fingerprint drift: $prev vs $fp")
            case None => fps += reliable -> fp
          }
          println(f"""{"probe":"reliable_ckpt","gate":"$name","reliable":$reliable,"pass":$pass,"wall_sec":$dt%.2f,"rows":${fp._1}}""")
        }
        require(fps(true) == fps(false),
          s"$name: reliable and local checkpoint outputs DIFFER: " +
            s"${fps(true)} vs ${fps(false)}")
        println(s"""{"probe":"reliable_ckpt","gate":"$name","values_identical_across_modes":true}""")
      }
    spark.stop()
  }
}
