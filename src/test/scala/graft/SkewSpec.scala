package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

/**
 * Gate-level proof that the PLAIN (un-salted) join path survives a
 * planted 90%-hot key via AQE's runtime skew-split — the thing a 100-TB
 * user hits first without reaching for Skew.saltedJoin. Skew.scala's
 * gates prove the manual tooling; this proves the default path:
 * q_skew_aqe_join joins lineitem (90% of rows on skey=0) to nation, and
 * under production-shaped thresholds AQE's OptimizeSkewedJoin must split
 * the hot partition (isSkewJoin=true on the executed join). The gate's
 * VALUES are separately oracle-gated in CORRECTNESS; this spec pins the
 * PLAN behavior.
 *
 * Two environment traps this spec encodes (both found building it):
 *  - the split's unit is a MAP output range, and the single-row-group
 *    fixture parquet yields ONE map task, which makes the hot reducer
 *    partition unsplittable however skewed — so the spec stages lineitem
 *    as multi-file parquet (production shape: thousands of map tasks)
 *    and runs the UNCHANGED gate against the staged dir;
 *  - an aggregate/distinct between the shuffle and the join's Sort
 *    breaks OptimizeSkewedJoin's pattern match and silently forfeits the
 *    split, which is why the gate's dim side is a bare nation scan.
 */
class SkewSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def skewJoins(p: SparkPlan): Seq[SparkPlan] = {
    val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def walk(q: SparkPlan): Unit = {
      q match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec        => walk(s.plan)
        case j: SortMergeJoinExec if j.isSkewJoin    => out += j
        case j: ShuffledHashJoinExec if j.isSkewJoin => out += j
        case _ =>
      }
      q.children.foreach(walk)
    }
    walk(p)
    out.toSeq
  }

  /** The fixture tables re-staged as multi-file parquet: the fixtures are
    * single-row-group files (one map task), which makes any reducer
    * partition unsplittable by AQE — unlike any real corpus. */
  private lazy val stagedDir: String = {
    val d = graft.core.TempDirs.scratch("skew_stage_")
    spark.read.parquet(s"$dir/lineitem.parquet").repartition(8)
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    spark.read.parquet(s"$dir/nation.parquet")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    d
  }

  test("q_skew_aqe_join: AQE splits the planted hot partition (isSkewJoin)") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    // thresholds scaled to the fixture: the hot skey=0 shuffle partition
    // (~54k rows, ~240KB at sf0.01) clears the 32k bar and dwarfs the
    // ~11KB median; at cluster scale the same ratio trips the 256MB
    // default
    withConfs(Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val df = SparkEntry.queries("q_skew_aqe_join")(spark, stagedDir)
      // collect() (not count()) so THIS queryExecution finalizes its own
      // adaptive plan — count() is a separate execution and would leave
      // df's plan in its initial, never-skew-split state
      val n = df.collect().length
      assert(n == 5, s"expected 5 region rows, got $n")
      val splits = skewJoins(df.queryExecution.executedPlan)
      assert(splits.nonEmpty,
        "AQE did not skew-split the planted 90%-hot join partition " +
          "(no isSkewJoin join in the executed plan)")
    }
  }

  test("q_skew_aqe_join values are split-invariant (skew rescue never changes results)") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    // default thresholds at fixture scale: no split (256MB bar) — and the
    // result must equal the split run above row for row
    val plain = SparkEntry.queries("q_skew_aqe_join")(spark, dir).collect()
    withConfs(Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val split = SparkEntry.queries("q_skew_aqe_join")(spark, stagedDir).collect()
      assert(plain.map(_.toString).toSeq == split.map(_.toString).toSeq,
        "skew-split changed the join result")
    }
  }
}
