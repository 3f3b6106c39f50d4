package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}

/**
 * Plan audit for the explode_json fuzz families (q_fuzz_76..85): the
 * payloads are to_json over a handful of source columns, and column
 * pruning must SURVIVE the to_json -> inference-persist -> from_json ->
 * flatten chain — a regression here (e.g. a persist of the raw table
 * instead of the projected frame) would read every table column at
 * corpus scale and show up nowhere in the value compare.
 */
class ExplodePlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: ShuffleQueryStageExec => walk(s.plan)
        case s: QueryStageExec        => walk(s.plan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(m.relation.cachedPlan)
        case f: FileSourceScanExec => Seq(f)
      }.flatten
    walk(df.queryExecution.executedPlan)
  }

  test("explode_json fuzz gates prune the parquet scan to the payload's source columns") {
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val gates = (76 to 85).map(i => f"q_fuzz_$i%02d")
    val unpruned = gates.flatMap { g =>
      val df = SparkEntry.queries(g)(spark, dir)
      df.collect() // finalize the adaptive plan (and populate caches)
      val scans = fileScans(df)
      graft.core.Caches.release()
      assert(scans.nonEmpty, s"$g: no parquet scan found in the executed plan")
      // 3-column nation legitimately uses every column (id + str + int);
      // the pruning claim is about WIDE tables, where reading everything
      // is the regression
      scans.collect {
        case s if s.relation.dataSchema.size > 3 &&
            s.requiredSchema.size >= s.relation.dataSchema.size =>
          s"$g reads ALL ${s.requiredSchema.size} columns of " +
            s"${s.relation.location.rootPaths.headOption.getOrElse("?")}"
      }
    }
    assert(unpruned.isEmpty,
      s"column pruning lost through the explode_json chain: $unpruned")
  }

  test("q_fuzz_77 reads exactly its payload + filter columns") {
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val df = SparkEntry.queries("q_fuzz_77")(spark, dir)
    df.collect()
    val cols = fileScans(df).map(_.requiredSchema.fieldNames.toSet)
      .reduce(_ union _)
    graft.core.Caches.release()
    // payload = f(o_orderkey, o_custkey); the seeded filter may add one
    // more column — but the wide unused ones must never be scanned
    assert(cols.contains("o_orderkey"), s"scanned: $cols")
    val banned = Set("o_orderdate", "o_comment", "o_clerk", "o_shippriority")
    assert((cols & banned).isEmpty,
      s"scan reads columns the gate never uses: ${cols & banned}")
  }
}
