package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.XDF

/** One-off wide-data ceiling probe (round-16, verdict item 6; NOT a gate).
  *
  * q_wide_cols holds ~5-6 s at every scale factor — scale-CONSTANT, i.e.
  * driver/plan-compile cost, not data cost. The survey's headline is
  * "100s or 1000s of columns", so this probe measures where that ceiling
  * is: for N in 1000/2000/5000 generated columns it splits wall time into
  *   build_sec  — pipeline construction incl. dropEmptyCols' one-pass
  *                emptiness aggregate (a real 1-job scan over N columns)
  *   plan_sec   — forcing the final executedPlan (pure Catalyst:
  *                analysis + optimization + physical planning)
  *   run_sec    — the terminal action on the 5-column projection
  * Rows are capped exactly like the gate (3000) so the numbers isolate
  * column-count growth. Emits one JSON line per N; results recorded in
  * SCALE.md ("wide-data ceiling"). Usage:
  *   scripts/run_main.sh graft.tools.WideColsProbe [sfDir] [n1,n2,...]
  */
object WideColsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val ns = (if (args.length > 1) args(1) else "1000,2000,5000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up: JIT + codegen + scheduler, so N=first isn't inflated
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    ns.foreach { n =>
      val half = n / 2
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_orderkey") % 20 === 0)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .limit(3000)
      // build split three ways so the superlinear term is attributable:
      //   select_sec — constructing + ANALYZING the N-column projection
      //   sweep_sec  — dropEmptyCols' one-pass emptiness agg (a real job:
      //                N aggregates, plan + codegen + execute)
      //   tail_sec   — renamePrefix/select/sort name algebra
      val (wide, selectSec) = timed {
        val w = base.select(
          col("l_orderkey") +: col("l_linenumber") +:
            ((1 to half).map(i =>
              round(col("l_quantity") * i, 2).as(s"m:q$i")) ++
              (1 to half).map(i =>
                (if (i % 2 == 0) lit("")
                 else concat(col("l_returnflag"), lit(i.toString))).as(s"t$i"))): _*)
        w.schema // force analysis
        w
      }
      val (swept, sweepSec) = timed(XDF(wide).dropEmptyCols())
      val (finalDf, tailSec) = timed {
        swept
          .renamePrefix("m", "metric")
          .select("l_orderkey", "l_linenumber", "metric:q7",
            s"metric:q$half", "t3")
          .sort(Seq("l_orderkey", "l_linenumber")).toDF
      }
      val (_, planSec) = timed(finalDf.queryExecution.executedPlan)
      val (rows, runSec) = timed(finalDf.count())
      val total = selectSec + sweepSec + tailSec + planSec + runSec
      println(s"""{"probe":"wide_cols","source":"synthetic","cols":${2 * half + 2},"rows":$rows,""" +
        s""""select_sec":${f"$selectSec%.2f"},"sweep_sec":${f"$sweepSec%.2f"},""" +
        s""""tail_sec":${f"$tailSec%.2f"},"plan_sec":${f"$planSec%.2f"},""" +
        s""""run_sec":${f"$runSec%.2f"},"total_sec":${f"$total%.2f"}}""")

      // MATERIALIZED arm (round-17, verdict item 6): the synthetic arm's
      // residue includes the N-column projection's OWN analysis+codegen.
      // Writing the wide frame to parquet once and probing the read-back
      // measures the library's cost at N cols alone — a real user's wide
      // table arrives as stored bytes, not as a 5000-expression select.
      val scratch = graft.core.TempDirs.scratchPath(s"graft_wide_$n")
      val widePath = scratch.resolve("wide.parquet").toString
      val (_, writeSec) = timed {
        wide.write.mode("overwrite").parquet(widePath)
      }
      val stored = spark.read.parquet(widePath)
      val (sweptP, sweepSecP) = timed(XDF(stored).dropEmptyCols())
      val (finalP, tailSecP) = timed {
        sweptP
          .renamePrefix("m", "metric")
          .select("l_orderkey", "l_linenumber", "metric:q7",
            s"metric:q$half", "t3")
          .sort(Seq("l_orderkey", "l_linenumber")).toDF
      }
      val (_, planSecP) = timed(finalP.queryExecution.executedPlan)
      val (rowsP, runSecP) = timed(finalP.count())
      val totalP = sweepSecP + tailSecP + planSecP + runSecP
      println(s"""{"probe":"wide_cols","source":"parquet","cols":${2 * half + 2},"rows":$rowsP,""" +
        s""""write_sec":${f"$writeSec%.2f"},"sweep_sec":${f"$sweepSecP%.2f"},""" +
        s""""tail_sec":${f"$tailSecP%.2f"},"plan_sec":${f"$planSecP%.2f"},""" +
        s""""run_sec":${f"$runSecP%.2f"},"total_sec":${f"$totalP%.2f"}}""")
    }
    spark.stop()
  }
}
