package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import graft.sources.Bucketing

/** The bucketing contract: two tables bucketed into the same bucket
  * count on their join keys sort-merge join with ZERO exchange, and a
  * groupBy on the bucket key re-uses the write-time shuffle too. The
  * value side is pinned by q_bucket_join's oracle; this spec pins the
  * PLAN — the whole point of bucketing at 100 TB. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // finalize AQE
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other
    }
    unwrap(df.queryExecution.executedPlan)
  }

  // AQE wraps materialized exchanges in ShuffleQueryStageExec LEAVES —
  // a children-only walk would count zero shuffles in any adaptive plan
  // and prove nothing (caught by the negative control below)
  private def countShuffles(p: SparkPlan): Int = {
    var n = 0
    def walk(q: SparkPlan): Unit = {
      q match {
        case _: ShuffleExchangeLike => n += 1
        case s: ShuffleQueryStageExec => n += 1; walk(s.plan)
        case s: QueryStageExec => walk(s.plan)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
      q.children.foreach(walk)
      q.subqueries.foreach(walk)
    }
    walk(p)
    n
  }

  private val tmp = System.getProperty("java.io.tmpdir") + "/graft_bucket_spec"

  test("co-bucketed join + bucket-key aggregate plan with zero exchange") {
    val left = (1 to 5000).map(i => (i.toLong, i % 97)).toDF("k", "a")
    val right = (1 to 5000).filter(_ % 3 == 0).map(i => (i.toLong, i % 13))
      .toDF("k", "b")
    Bucketing.saveBucketed(left, "spec_bkt_l", s"$tmp/l", Seq("k"), 6, Seq("k"))
    Bucketing.saveBucketed(right, "spec_bkt_r", s"$tmp/r", Seq("k"), 6, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "spec_bkt_l")
        .join(Bucketing.table(spark, "spec_bkt_r"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("a").as("sa"))
      val plan = executed(joined)
      assert(countShuffles(plan) === 0, plan.treeString.take(2000))
      // values equal the plain (shuffling) join
      val expected = left.join(right, "k").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("a").as("sa"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val got = joined.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("negative control: joining a bucketed to an unbucketed side still shuffles") {
    val left = (1 to 2000).map(i => (i.toLong, i % 7)).toDF("k", "a")
    Bucketing.saveBucketed(left, "spec_bkt_solo", s"$tmp/solo", Seq("k"), 6)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = (500 to 2500).map(i => (i.toLong, i % 5)).toDF("k", "b")
      val plan = executed(
        Bucketing.table(spark, "spec_bkt_solo").join(plain, "k")
          .agg(count(lit(1)).as("n")))
      assert(countShuffles(plan) > 0,
        "unbucketed side must shuffle - if this starts passing, the " +
          "positive test above is not proving anything")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("overwrite at a new path does not shadow stale data") {
    val v1 = Seq((1L, "old")).toDF("k", "v")
    val v2 = Seq((2L, "new")).toDF("k", "v")
    Bucketing.saveBucketed(v1, "spec_bkt_ow", s"$tmp/ow1", Seq("k"), 2)
    Bucketing.saveBucketed(v2, "spec_bkt_ow", s"$tmp/ow2", Seq("k"), 2)
    assert(Bucketing.table(spark, "spec_bkt_ow").as[(Long, String)].collect()
      .toSeq === Seq((2L, "new")))
  }
}
