package graft

/**
 * Debug tool: print the registered DuckDB oracle SQL for one or more gate
 * names (all gates when called with no args). Pure — no SparkSession, no
 * IO beyond stdout — so it runs in milliseconds; useful when a generated
 * fuzz gate needs inspection without a full Verify run.
 */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) SparkEntry.oracleSql.keys.toSeq.sorted
                else args.toSeq
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.oracleSql.getOrElse(n, "<no oracle (value-checked gate)>"))
    }
  }
}
