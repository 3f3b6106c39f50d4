package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 19): does a localCheckpoint leaf carry its child's
  * HashPartitioning through to the NEXT query's planning under AQE —
  * i.e. can a pre-checkpoint repartition make per-round loop joins
  * exchange-free on the checkpointed side? Prints the leaf's
  * outputPartitioning and the Exchange count of a join against it. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = (1 to 10000).map(i => (i % 97, i)).toDF("k", "v")

    // 1. checkpoint WITHOUT repartition
    val plain = df.localCheckpoint()
    // 2. checkpoint WITH repartition on k
    val parted = df.repartition(col("k")).localCheckpoint()
    // 2b. explicit-N repartition: AQE may not rewrite a user-specified
    // partition count, so the final stage should keep HashPartitioning
    val partedN = df.repartition(32, col("k")).localCheckpoint()
    // 3. groupBy output partitioning through checkpoint
    val agged = df.groupBy("k").agg(sum("v").as("s")).localCheckpoint()

    def leafPart(d: org.apache.spark.sql.DataFrame): String =
      d.queryExecution.executedPlan.collectLeaves()
        .map(_.outputPartitioning.toString).mkString(" | ")
    println(s"plain leaf partitioning:  ${leafPart(plain)}")
    println(s"parted leaf partitioning: ${leafPart(parted)}")
    println(s"partedN leaf partitioning: ${leafPart(partedN)}")
    println(s"agged leaf partitioning:  ${leafPart(agged)}")

    val other = (1 to 500).map(i => (i % 97, s"x$i")).toDF("k", "name")
      .repartition(col("k"))

    def exchanges(d: org.apache.spark.sql.DataFrame, label: String): Unit = {
      d.write.format("noop").mode("overwrite").save()
      val plan = d.queryExecution.executedPlan.toString
      val n = "Exchange".r.findAllIn(plan).length
      println(s"$label: $n Exchange node(s)")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    exchanges(plain.join(other, Seq("k")), "join on plain-checkpoint side")
    exchanges(parted.join(other, Seq("k")), "join on parted-checkpoint side")
    exchanges(partedN.join(other, Seq("k")), "join on partedN-checkpoint side")
    exchanges(agged.join(other, Seq("k")), "join on agged-checkpoint side")
    // subset-clustering: groupBy (k, v) over a leaf partitioned by k only
    val g = parted.groupBy("k", "v").agg(count(lit(1)).as("c"))
    exchanges(g, "groupBy(k,v) over k-partitioned leaf")
    // alias pass-through: rename k and join on the new name
    val renamed = parted.select(col("k").as("b"), col("v"))
    exchanges(renamed.join(other.select(col("k").as("b"), col("name")), Seq("b")),
      "join on aliased leaf column")

    // ==== bridge rewrap: declare the known partitioning on the leaf ====
    import org.apache.spark.sql.graft.bridge
    val declared = bridge.withDeclaredHashPartitioning(partedN, Seq("k"), 32)
    println(s"declared leaf partitioning: ${leafPart(declared)}")
    exchanges(declared.join(other, Seq("k")), "join on declared-leaf side")
    exchanges(declared.groupBy("k", "v").agg(count(lit(1)).as("c")),
      "groupBy(k,v) over declared k-leaf")
    val renamedD = declared.select(col("k").as("b"), col("v"))
    exchanges(renamedD.join(other.select(col("k").as("b"), col("name")), Seq("b")),
      "join on aliased declared-leaf column")
    // correctness: declared join result == plain join result
    val a = declared.join(other, Seq("k")).groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("c"))
    val b = plain.join(other, Seq("k")).groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("c"))
    val diff = a.except(b).count() + b.except(a).count()
    println(s"declared-vs-plain join diff rows: $diff")
    // two declared leaves with DIFFERENT N: which side re-shuffles?
    val big = bridge.withDeclaredHashPartitioning(
      df.repartition(32, col("k")).localCheckpoint(), Seq("k"), 32)
    val small = bridge.withDeclaredHashPartitioning(
      (1 to 300).map(i => (i % 97, s"y$i")).toDF("k", "name")
        .repartition(4, col("k")).localCheckpoint(), Seq("k"), 4)
    val j2 = big.join(small, Seq("k"))
    j2.write.format("noop").mode("overwrite").save()
    println("mismatched-N join final plan:\n" +
      j2.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan ExistingRDD"))
        .mkString("\n"))
    spark.stop()
  }
}
