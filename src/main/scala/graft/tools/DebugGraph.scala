package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.GraphOps

/** Scratch main for iterating on graph operators (not part of the API). */
object DebugGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "target")
    try {
      val c = GraphOps.ancestorClosure(e)
      println("closure: " + c.orderBy("node_id", "anc").collect().mkString(" "))
    } catch {
      case ex: Throwable => ex.printStackTrace()
    }
    try {
      val et = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "d", 0L))
        .toDF("src", "target", "ts")
      val tf = GraphOps.timeBasedForwardEdgesOnly(et, "ts", "tfwd")
      println("timefwd: " + tf.orderBy("src", "target").collect().mkString(" "))
    } catch {
      case ex: Throwable => println("TIMEFWD FAIL"); ex.printStackTrace()
    }
    try {
      val ed = Seq(("r", "a"), ("r", "b"), ("a", "c"), ("b", "c"))
        .toDF("src", "target")
      val f = GraphOps.forwardEdgesOnly(ed, "fwd")
      println("fwdedges: " + f.orderBy("src", "target").collect().mkString(" "))
    } catch {
      case ex: Throwable => println("FWDEDGES FAIL"); ex.printStackTrace()
    }
    Seq("q_graph_forward_edges", "q_graph_time_forward").foreach { q =>
      try {
        val n = graft.GraphQueries.queries(q)(spark, "/root/testdata/sf0.001").count()
        println(s"$q rows=$n")
      } catch {
        case ex: Throwable => println(s"$q FAIL"); ex.printStackTrace()
      }
    }
    spark.stop()
  }
}
