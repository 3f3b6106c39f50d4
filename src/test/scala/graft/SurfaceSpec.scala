package graft

import org.apache.spark.sql.functions._
import graft.core.{Display, XDF}
import graft.sources.{SqlHelper, WsClient}
import graft.streaming.StreamOps

/** Specs for collect bridges, display utilities, SQL builder, streaming
  * and the HTTP->DF client (against an in-JVM HTTP server). */
class SurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("toTuples / colsAsMap / colAsArray bridges") {
    val df = XDF(Seq(("a", "1"), ("b", "2")).toDF("k", "v"))
    assert(df.toTuples().toSet == Set(Seq("a", "1"), Seq("b", "2")))
    assert(df.colsAsMap("k", "v") == Map("a" -> "1", "b" -> "2"))
    assert(df.colAsArray("k").sorted == Seq("a", "b"))
    val dup = XDF(Seq(("a", "1"), ("a", "2")).toDF("k", "v"))
    intercept[IllegalArgumentException] { dup.colsAsMap("k", "v") }
  }

  test("fromMaps union-of-keys schema") {
    val df = XDF.fromMaps(spark, Seq(
      Map("a" -> "1", "b" -> "2"), Map("b" -> "3", "c" -> "4")))
    assert(df.getHeader == Seq("a", "b", "c"))
    assert(df.toTuples().toSet == Set(Seq("1", "2", ""), Seq("", "3", "4")))
  }

  test("transformFunc N-in M-out") {
    val out = XDF(Seq(("1-URGENT", "x")).toDF("p", "o"))
      .transformFunc(Seq("p"), Seq("code", "word"), vs => vs.head.split("-", 2).toSeq)
      .toDF.head()
    assert(out.getAs[String]("code") == "1" && out.getAs[String]("word") == "URGENT")
  }

  test("selectColsWithCondExists prunes dead columns") {
    val df = XDF(Seq(("x", "", "1"), ("y", "", "2")).toDF("keep", "empty", "num"))
    val out = df.selectColsWithCondExists(c => c =!= "")
    assert(out.getHeader == Seq("keep", "num"))
  }

  test("display: content hash is order/partition independent") {
    val a = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
    val b = a.orderBy(desc("k")).repartition(3)
    assert(Display.contentHash(a) == Display.contentHash(b))
    assert(Display.sizeInBytes(a) == 6)
    assert(Display.maxSizeColsStats(a).head._2 == 1)
  }

  test("sql builder composes clauses in order") {
    val sql = SqlHelper.buildQuery(
      Seq("k", "count(*) AS n"), "t", where = "v > 0",
      groupBy = Seq("k"), having = "count(*) > 1", orderBy = Seq("n DESC"),
      limit = 5)
    assert(sql == "SELECT k, count(*) AS n FROM t WHERE v > 0 GROUP BY k " +
      "HAVING count(*) > 1 ORDER BY n DESC LIMIT 5")
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = SqlHelper.executeQuery(spark, Map("t" -> df), sql).collect()
    assert(out.length == 1 && out.head.getString(0) == "a")
  }

  test("streaming windowed aggregate over a file source") {
    val dir = graft.core.TempDirs.scratch("graft_stream")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part1.json"),
      """{"ts": "2024-01-01T00:05:00", "k": "a", "v": 1.0}
        |{"ts": "2024-01-01T00:10:00", "k": "a", "v": 2.0}
        |{"ts": "2024-01-01T01:05:00", "k": "a", "v": 10.0}
        |{"ts": "2024-01-01T00:20:00", "k": "b", "v": 5.0}
        |""".stripMargin)
    val stream = StreamOps.readJsonStream(spark, dir,
      "ts TIMESTAMP, k STRING, v DOUBLE")
    val agged = StreamOps.windowedAggregate(stream, "ts", "1 hour", null,
      "10 minutes", Seq("k"), Seq("v"), Seq("sum"))
    // complete mode: append would hold windows open until the watermark
    // passes them, which never happens on a bounded AvailableNow run
    StreamOps.runToMemory(agged, "stream_test", outputMode = "complete")
    val out = spark.sql(
      "SELECT k, window_start, `v:sum` FROM stream_test ORDER BY k, window_start")
      .collect().map(r => (r.getString(0), r.getAs[Double]("v:sum")))
    assert(out.toSeq == Seq(("a", 3.0), ("a", 10.0), ("b", 5.0)))
  }

  test("streamingDedup suppresses key re-occurrence at a NEW timestamp") {
    val dir = graft.core.TempDirs.scratch("graft_dedup")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/p.json"),
      """{"ts": "2024-01-01T00:00:00", "k": "a", "v": 1.0}
        |{"ts": "2024-01-01T00:01:00", "k": "a", "v": 2.0}
        |{"ts": "2024-01-01T00:02:00", "k": "b", "v": 3.0}
        |""".stripMargin)
    val stream = StreamOps.readJsonStream(spark, dir,
      "ts TIMESTAMP, k STRING, v DOUBLE")
    val deduped = StreamOps.streamingDedup(stream, "ts", "1 hour", Seq("k"))
    StreamOps.runToMemory(deduped, "dedup_test")
    val out = spark.sql("SELECT k, v FROM dedup_test ORDER BY k")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // key-only dedup: a's second event (different ts) must be suppressed
    assert(out.toSeq == Seq(("a", 1.0), ("b", 3.0)))
  }

  test("flatMapGroupsWithState sessionization over a file stream") {
    val dir = graft.core.TempDirs.scratch("graft_sess")
    // key a: burst at 00:00-00:02, quiet, burst at 01:00; gap 10min
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/p.json"),
      """{"ts": "2024-01-01T00:00:00", "k": "a", "v": 1.0}
        |{"ts": "2024-01-01T00:02:00", "k": "a", "v": 2.0}
        |{"ts": "2024-01-01T01:00:00", "k": "a", "v": 5.0}
        |{"ts": "2024-01-01T02:30:00", "k": "b", "v": 7.0}
        |{"ts": "2024-01-01T03:00:00", "k": "a", "v": 9.0}
        |""".stripMargin)
    val stream = StreamOps.readJsonStream(spark, dir,
      "ts TIMESTAMP, k STRING, v DOUBLE")
    val sessions = StreamOps.sessionize(stream, "k", "ts", "v",
      gapMillis = 10 * 60 * 1000, watermark = "0 seconds")
    StreamOps.runToMemory(sessions.toDF(), "sessions_test")
    val out = spark.sql(
      "SELECT key, n_events, value_sum FROM sessions_test ORDER BY key, session_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // the 00:00 burst closes when the 01:00 event arrives (gap exceeded);
    // later sessions stay open at end-of-stream (bounded run) unless a
    // newer event or watermark closes them
    assert(out.contains(("a", 2L, 3.0)), s"got ${out.mkString(",")}")
    assert(out.forall(_._1 == "a") || out.exists(_._1 == "b"))
  }

  test("wsclient reads json and tsv from a live HTTP server") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    def serve(path: String, body: String, status: Int = 200): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.sendResponseHeaders(status, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    serve("/data.json", """{"id": 1, "name": "x"}
                          |{"id": 2, "name": "y"}""".stripMargin)
    serve("/data.tsv", "id\tname\n1\tx\n2\ty")
    serve("/data.csv", "id,name\n1,\"Doe, Jane\"\n2,plain")
    server.start()
    try {
      val port = server.getAddress.getPort
      val j = WsClient.readUrlAsDf(spark, s"http://localhost:$port/data.json")
      assert(j.count() == 2 && j.columns.toSet == Set("id", "name"))
      val t = WsClient.readUrlAsDf(spark, s"http://localhost:$port/data.tsv", "tsv")
      assert(t.count() == 2 && t.columns.toSeq == Seq("id", "name"))
      assert(t.orderBy("id").head().getString(1) == "x")

      // quoted CSV field with an embedded separator stays one field
      val c = WsClient.readUrlAsDf(spark, s"http://localhost:$port/data.csv", "csv")
      assert(c.orderBy("id").head().getString(1) == "Doe, Jane")

      // distributed fan-out: one URL per slice, fetched on executors;
      // a bad slice reports status instead of failing the job
      val slices = Seq(
        ("s1", s"http://localhost:$port/data.tsv"),
        ("s2", s"http://localhost:$port/data.json"),
        ("s3", s"http://localhost:$port/missing")).toDF("slice", "url")
      val fetched = WsClient.fetchUrls(slices, "url")
        .select("slice", "resp_status", "resp_body")
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(fetched("s1")._1 == 200 && fetched("s1")._2.startsWith("id\tname"))
      assert(fetched("s2")._1 == 200)
      assert(fetched("s3")._1 == 404)
    } finally server.stop(0)
  }
}
