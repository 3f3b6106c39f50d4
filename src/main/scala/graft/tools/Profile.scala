package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Dedup

/** Dev tool: stage-by-stage timing of the heaviest pipelines, to aim
  * optimization work at the actual hotspot rather than the assumed one.
  * Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n1 = f
      val t1 = System.nanoTime(); val n2 = f
      val t2 = System.nanoTime()
      println(f"[profile] $name%-28s best=${math.min(t1 - t0, t2 - t1) / 1e9}%6.2fs rows=$n1%d")
      require(n1 == n2)
    }

    time("read+count")(docs.count())
    time("tokens explode") {
      docs.select(explode(TextOps.tokens(col("text")))).count()
    }
    time("shingles explode") {
      docs.select(explode(TextOps.wordShingles(col("text"), 3))).count()
    }
    time("shingles+md5") {
      docs.select(explode(TextOps.wordShingles(col("text"), 3)).as("s"))
        .select(max(md5(col("s")))).count()
    }
    time("lanes agg (12 mins)") {
      Dedup.lshBands(docs, "doc_id", "text", 3, 12, 4).count()
    }
    time("full minhashDedup") {
      Dedup.minhashDedup(docs, "doc_id", "text", 3, 12, 4).count()
    }
    time("minhashDedupCC") {
      Dedup.minhashDedupCC(docs, "doc_id", "text", 3, 12, 4).count()
    }
    time("q_graph_cc") {
      graft.SparkEntry.queries("q_graph_cc")(spark, sfDir).count()
    }
    // scaling linearity: same pipeline on a 10x corpus (shifted copies, so
    // every original doc gains 9 planted duplicates)
    val docs10 = (0 until 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ union _)
    time("minhashDedup 10x corpus") {
      Dedup.minhashDedup(docs10, "doc_id", "text", 3, 12, 4).count()
    }
    time("minhashDedupCC 10x corpus") {
      Dedup.minhashDedupCC(docs10, "doc_id", "text", 3, 12, 4).count()
    }
    spark.stop()
  }
}
