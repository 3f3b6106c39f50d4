package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time named gate queries under the Bench session config.
  * Usage: runMain graft.tools.TimeGates q_graph_cc q_graph_time_forward
  * (SPARK_GRAFT_SF_DIR selects the scale, default sf0.1). */
object TimeGates {
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
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/codegen warm

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_graph_forward_edges", "q_graph_time_forward")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val t1 = System.nanoTime()
      graft.core.JsonFlattener.releaseInferredCaches()
      println(f"[timegates] $name%-28s ${(t1 - t0) / 1e9}%7.2fs rows=$n%d")
    }
    spark.stop()
  }
}
