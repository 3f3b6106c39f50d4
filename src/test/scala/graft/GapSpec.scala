package graft

import org.apache.spark.sql.functions._
import graft.core.XDF
import graft.functions.Udfs
import graft.operators.GraphOps
import graft.sources.TsvIO

/** Specs for the long-tail reference surface: misc scalar UDFs,
  * URL-encoded column resolution, zip TSV read, cycle removal. */
class GapSpec extends SparkTestBase {
  import spark.implicits._

  test("misc scalars: file base name, n-digit, prob, ipv4 hex") {
    val df = Seq(("/a/b/report.tsv.gz", "7", "0.72", "10.0.255.1"))
      .toDF("path", "n", "p", "ip")
    val out = df.select(
      Udfs.parseFileBaseName(col("path")).as("base"),
      Udfs.toNDigit(col("n"), 4).as("n4"),
      Udfs.convertProbToBinary(col("p")).as("b"),
      Udfs.convertIpv4ToHex(col("ip")).as("hex")).head()
    assert(out.getString(0) == "report.tsv")
    assert(out.getString(1) == "0007")
    assert(out.getInt(2) == 1)
    assert(out.getString(3) == "0a00ff01")
  }

  test("selectFirstNonEmpty coalesces blanks") {
    val df = Seq(("", "x", "y")).toDF("a", "b", "c")
    val out = df.select(Udfs.selectFirstNonEmpty(col("a"), col("b"), col("c"))).head()
    assert(out.getString(0) == "x")
  }

  test("getTimeDiffs humanizes sorted gaps") {
    val df = Seq(("g", 0L), ("g", 3600L), ("g", 3600L + 90060L)).toDF("k", "t")
    val out = df.groupBy("k").agg(Udfs.getTimeDiffs(col("t")).as("d")).head()
    assert(out.getString(1) == "1h 0m,1d 1h")
  }

  test("resolveAllUrlEncodedCols decodes and renames") {
    val df = XDF(Seq(("a%20b", "plain")).toDF("v:url_encoded", "w"))
    val out = df.resolveAllUrlEncodedCols()
    assert(out.getHeader == Seq("v", "w"))
    assert(out.toDF.head().getString(0) == "a b")
  }

  test("firstValueWithDefault on empty and non-empty") {
    val df = XDF(Seq("x").toDF("c"))
    assert(df.firstValueWithDefault("c", "d") == "x")
    assert(XDF(df.toDF.limit(0)).firstValueWithDefault("c", "d") == "d")
  }

  test("zip TSV read decodes entries") {
    val dir = graft.core.TempDirs.scratchPath("graft_zip")
    val zipPath = dir.resolve("data.tsv.zip")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("part.tsv"))
    zos.write("id\tname\n1\ta+b\n2\tc%09d\n".getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val out = TsvIO.readZip(spark, zipPath.toString).orderBy("id").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "a b"), ("2", "c\td")))
  }

  test("removeCycles keeps time-consistent edges") {
    // a->b at t=1, b->c at t=2 fine; c->a at t=3 closes a cycle back to
    // a (first seen incoming t... a has no incoming before) — keep; the
    // filter drops edges leaving a node before it was ever reached
    val edges = Seq(("a", "b", 5L), ("b", "c", 6L), ("b", "d", 1L))
      .toDF("src", "target", "ts")
    val out = GraphOps.removeCycles(edges, "ts").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // b first reached at t=5; its t=1 outgoing edge predates that -> cut
    assert(out == Set(("a", "b"), ("b", "c")))
  }

  test("salted aggregate equals plain aggregate") {
    val df = (1 to 500).map(i => ("hot", i.toDouble)) ++ Seq(("cold", 1.0))
    val d = df.toDF("k", "v")
    val salted = graft.operators.Skew.saltedSumCount(d, Seq("k"), "v", 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted("hot") == ((250.0 * 501, 500L)))
    assert(salted("cold") == ((1.0, 1L)))
  }

  test("salted join equals plain join") {
    val l = (1 to 100).map(i => ("hot", i)).toDF("k", "v")
    val r = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val plain = l.join(r, Seq("k")).count()
    val salted = graft.operators.Skew.saltedJoin(l, r, Seq("k"), 4).count()
    assert(plain == salted && salted == 100)
  }

  test("date-partitioned write prunes on scan") {
    val dir = graft.core.TempDirs.scratch("graft_etl_spec")
    val df = Seq(("2024-01-01 10:00:00", 1.0), ("2024-01-02 10:00:00", 2.0),
      ("2024-01-05 10:00:00", 4.0)).toDF("ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    graft.sources.TsvIO.writePartitionedByDate(df, "ts", dir)
    val scanned = graft.sources.TsvIO.scanByDateRange(spark, dir, "20240101", "20240102")
    assert(scanned.agg(sum("v")).head().getDouble(0) == 3.0)
    // partition pruning visible in the plan
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"))
  }

  test("log shim: warnOnce dedups, extend composes") {
    graft.core.Log.warnOnce("w1"); graft.core.Log.warnOnce("w1")
    assert(graft.core.Log.extend("", "a") == "a")
    assert(graft.core.Log.extend("a", "b") == "a: b")
  }

  test("readJsonDir wraps lines in a json column") {
    val dir = graft.core.TempDirs.scratch("graft_jsonl")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      "{\"x\":1}\n{\"x\":2}\n")
    val out = TsvIO.readJsonDir(spark, Seq(dir))
    assert(out.columns.toSeq == Seq("json") && out.count() == 2)
  }
}
