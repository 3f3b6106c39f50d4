package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}} for the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen + scheduler warm-up so the first timed query doesn't
    // absorb session startup
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    // failed pass records a sentinel so min() can never report a
    // fast-failure as a benchmark time
    val FailSentinel = 1e9
    // dev-loop convenience: SPARK_GRAFT_QUERY_FILTER=substr1,substr2
    // times only matching queries (the driver never sets it)
    val nameFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_QUERY_FILTER") match {
        case Some(f) if f.nonEmpty =>
          val pats = f.split(",").map(_.trim).filter(_.nonEmpty)
          n => pats.exists(n.contains)
        case _ => _ => true
      }
    def timeAll(): Seq[(String, (Double, Long))] =
      SparkEntry.queries.toSeq.filter(p => nameFilter(p._1))
        .sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage.take(200)}")
            -1L
        }
        graft.core.JsonFlattener.releaseInferredCaches()
        name -> (if (n >= 0) (System.nanoTime() - t0) / 1e9 else FailSentinel, n)
      }
    // best of 2 passes: first pass absorbs page-cache/JIT warm-up noise.
    // (time, rows) travel together per pass — the reported rows always
    // come from the pass whose time was selected, and a query that fails
    // in EITHER pass reports the sentinel + rows=-1 (never a valid-looking
    // mixed record).
    val p1 = timeAll().toMap
    val p2 = timeAll().toMap
    val results = SparkEntry.queries.keys.toSeq.filter(nameFilter).sorted.map { k =>
      val (t1, n1) = p1(k); val (t2, n2) = p2(k)
      if (n1 < 0 || n2 < 0) (k, FailSentinel, -1L)
      else if (t1 <= t2) (k, t1, n1) else (k, t2, n2)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // result row count per query: a sanity signal alongside the timing
    // (a fast-but-empty result would otherwise look like a win)
    val rows = results.map { case (k, _, c) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    // total excludes fail sentinels — one failed query must not turn the
    // headline value into 1e9 garbage; `failed` reports the count instead
    val failed = results.count(_._3 < 0)
    val total = results.filter(_._3 >= 0).map(_._2).sum
    // per-query times print LAST in the line: the driver's capture keeps
    // a truncated line's TAIL, so the queries map is what must survive
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","failed":$failed,"rows":$rows,"queries":$qs}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
