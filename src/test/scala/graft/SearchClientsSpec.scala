package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{LogScaleClient, SplunkClient}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

/** Splunk/LogScale clients against a local stub server speaking the
  * public REST protocol: submit -> poll (not ready first) -> paged
  * results, limit-triggered time-slice fan-out on the executors,
  * internal-field filtering, and the error-frame fallback. */
class SearchClientsSpec extends SparkTestBase {

  // ---------- stub splunk/logscale server ----------
  private var server: HttpServer = _
  private var port: Int = _
  private val submits = TrieMap[String, (String, String, String)]() // sid -> (query, earliest, latest)
  private val polls = TrieMap[String, Int]()
  @volatile private var failAll = false

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def formParams(body: String): Map[String, String] =
    body.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap

  /** rows for a slot: distinct ids so the union is checkable; full range
    * reports 250 (over limit), each quarter slot 40. Non-numeric
    * (Splunk-relative) time strings parse as 0 — narrow range. */
  private def slotRows(e: String, l: String): Seq[Long] = {
    val earliest = e.toLongOption.getOrElse(0L)
    val latest = l.toLongOption.getOrElse(0L)
    if (latest - earliest >= 1000) (0L until 250L)
    else (0L until 40L).map(i => earliest * 1000 + i)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort

    server.createContext("/services/search/jobs", (ex: HttpExchange) => try {
      if (failAll) { respond(ex, 500, "boom"); }
      else {
        val path = ex.getRequestURI.getPath.stripPrefix("/services/search/jobs")
        (ex.getRequestMethod, path) match {
          case ("POST", "" | "/") =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val p = formParams(body)
            val sid = s"sid${submits.size}_${p("earliest_time")}_${p("latest_time")}"
            submits.put(sid, (p("search"), p("earliest_time"), p("latest_time")))
            respond(ex, 201, s"""{"sid":"$sid"}""")
          case ("GET", p0) if p0.endsWith("/results") =>
            val sid = p0.stripPrefix("/").stripSuffix("/results")
            val (_, e, l) = submits(sid)
            val q = ex.getRequestURI.getQuery
            val params = formParams(q.replace("&", "&")) // count/offset
            val count = params("count").toInt
            val offset = params("offset").toInt
            val ids = slotRows(e, l).slice(offset, offset + count)
            // one internal field to drop, one :: field, _time kept, a list
            val rows = ids.map(i =>
              s"""{"id":"$i","host":"h${i % 3}","_time":"t$i","_raw":"secret",""" +
              s""""tag::eventtype":"x","vals":["a","b"]}""").mkString(",")
            respond(ex, 200, s"""{"results":[$rows]}""")
          case ("GET", p0) =>
            val sid = p0.stripPrefix("/")
            val n = polls.updateWith(sid) { c => Some(c.getOrElse(0) + 1) }.get
            val (_, e, l) = submits(sid)
            val done = n >= 2 // force one not-done poll cycle
            val total = slotRows(e, l).size
            respond(ex, 200,
              s"""{"entry":[{"content":{"isDone":"${if (done) "1" else "0"}",""" +
              s""""dispatchState":"RUNNING","resultCount":$total}}]}""")
          case ("DELETE", _) => respond(ex, 200, "{}")
          case _ => respond(ex, 404, "{}")
        }
      }
    } catch { case t: Throwable => respond(ex, 500, t.toString) })

    server.createContext("/api/v1/repositories/testrepo/queryjobs",
      (ex: HttpExchange) => try {
        val path = ex.getRequestURI.getPath
          .stripPrefix("/api/v1/repositories/testrepo/queryjobs")
        (ex.getRequestMethod, path) match {
          case ("POST", "" | "/") =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            require(ex.getRequestHeaders.getFirst("Authorization") == "Bearer tok123",
              "missing bearer token")
            val node = com.fasterxml.jackson.databind.json.JsonMapper.builder()
              .build().readTree(body)
            val id = s"lsq${submits.size}_${node.path("start").asLong()}"
            submits.put(id, (node.path("queryString").asText(),
              node.path("start").asLong().toString, node.path("end").asLong().toString))
            respond(ex, 200, s"""{"id":"$id"}""")
          case ("GET", p0) =>
            val id = p0.stripPrefix("/")
            val n = polls.updateWith(id) { c => Some(c.getOrElse(0) + 1) }.get
            if (n < 2) respond(ex, 200, """{"done":false,"events":[]}""")
            else {
              val (_, s0, _) = submits(id)
              val evs = (0 until 3).map(i =>
                s"""{"ts":"${s0.toLong + i}","user":"u$i","noise":"z","#repo":"r"}""")
                .mkString(",")
              respond(ex, 200, s"""{"done":true,"events":[$evs]}""")
            }
          case ("DELETE", _) => respond(ex, 200, "{}")
          case _ => respond(ex, 404, "{}")
        }
      } catch { case t: Throwable => respond(ex, 500, t.toString) })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def splunkCfg = SplunkClient.Config.basicAuth(
    s"http://127.0.0.1:$port", "myapp", "user", "pass")
    .copy(waitMs = 20, attemptSleepMs = 20, pageSize = 7, timeoutSec = 30)

  // ---------- specs ----------

  test("splunk: filter query builder matches the reference SPL shape") {
    val q = SplunkClient.buildFilterQuery(
      Seq("index" -> "main", "status" -> "500"), Seq("host", "uri"), 1000)
    assert(q == """search index="main" and status="500" | table host uri | head 1000""")
    intercept[IllegalArgumentException] {
      SplunkClient.buildFilterQuery(Nil, Nil, 10)
    }
  }

  test("splunk: submit/poll/paged results with internal-field filtering") {
    submits.clear(); polls.clear()
    val df = SplunkClient.callSearch(spark, splunkCfg,
      """search index="main" | head 50""", "2000", "2040")
    val rows = df.collect()
    assert(rows.length == 40) // slot width 40 for narrow ranges
    assert(df.columns.sorted.toSeq == Seq("_time", "host", "id", "vals"),
      s"internal fields must be dropped: ${df.columns.toSeq}")
    val first = df.filter(df("id") === "2000000").head()
    assert(first.getAs[String]("vals") == "a,b")     // list joined with ","
    assert(first.getAs[String]("_time") == "t2000000") // _time survives
    // pagination happened (pageSize 7 over 40 rows) and polling looped
    assert(polls.values.exists(_ >= 2))
  }

  test("splunk: limit overflow splits the time range across executors") {
    submits.clear(); polls.clear()
    val df = SplunkClient.callSearch(spark, splunkCfg,
      """search index="main"""", "0", "1000",
      limit = Some(100), numParOnLimit = 4)
    assert(df.count() == 160) // 4 slots x 40 rows
    // the stub saw the probe plus exactly the 4 quarter slots
    val ranges = submits.values.map(v => (v._2.toLong, v._3.toLong)).toSet
    assert(ranges == Set((0L, 1000L), (0L, 250L), (250L, 500L),
      (500L, 750L), (750L, 1000L)), s"got $ranges")
    // slot rows carry distinct id spaces -> the union is a real merge
    assert(df.select("id").distinct().count() == 160)
  }

  test("splunk: relative-time ranges degrade to unsliced partial, not a throw") {
    submits.clear(); polls.clear()
    // 40 rows >= limit 10 and numParOnLimit asks for slicing, but
    // "-24h"/"now" cannot be sliced -> full unsliced results + warn
    val df = SplunkClient.callSearch(spark, splunkCfg,
      """search index="main"""", "-24h", "now",
      limit = Some(10), numParOnLimit = 4)
    assert(df.count() == 40)
    // exactly one search ran (no wasted re-submissions)
    assert(submits.size == 1)
  }

  test("splunk: terminal failure returns the reference error frame, not a throw") {
    failAll = true
    try {
      val df = SplunkClient.callSearch(spark, splunkCfg, "search x", "0", "10")
      val row = df.head()
      assert(df.count() == 1)
      assert(row.getAs[String]("__count__") == "0")
      assert(row.getAs[String]("__error_msg__").nonEmpty)
      assert(row.getAs[String]("__start_time__") == "0")
    } finally failAll = false
  }

  test("logscale: queryjob flow with accepted/excluded column filtering") {
    submits.clear(); polls.clear()
    val cfg = LogScaleClient.Config(s"http://127.0.0.1:$port", "testrepo",
      "tok123", waitMs = 20, attemptSleepMs = 20, timeoutSec = 30)
    val df = LogScaleClient.callSearch(spark, cfg, "#type=accesslog",
      5000L, 6000L, excludedCols = Seq("noise"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(df.columns.sorted.toSeq == Seq("#repo", "ts", "user"))
    assert(rows.map(_.getAs[String]("ts")).sorted.toSeq ==
      Seq("5000", "5001", "5002"))
  }

  test("logscale: per-row event fan-out joins prefixed events onto each row") {
    submits.clear(); polls.clear()
    import spark.implicits._
    val cfg = LogScaleClient.Config(s"http://127.0.0.1:$port", "testrepo",
      "tok123", waitMs = 20, attemptSleepMs = 20, timeoutSec = 30)
    val alerts = Seq(("a1", 1000L, 2000L), ("a2", 7000L, 8000L))
      .toDF("alert_id", "st_ms", "et_ms")
    val out = LogScaleClient.getEventsPar(alerts, cfg, "#type=accesslog",
      "st_ms", "et_ms", prefix = "ev")
    // 3 events per row, event cols prefixed, originals intact
    assert(out.count() == 6)
    assert(out.columns.contains("ev:ts") && out.columns.contains("alert_id"))
    val a2 = out.filter(out("alert_id") === "a2")
      .select("ev:ts").collect().map(_.getString(0)).sorted.toSeq
    assert(a2 == Seq("7000", "7001", "7002"))
    // fetch-once law (VERDICT r14 finding 1): exactly ONE query job was
    // submitted per input row — the two-pass explodeMaps submitted two
    assert(submits.size == 2,
      s"expected 1 submit per input row (2), saw ${submits.size}: ${submits.keys}")
    // re-reading the result does not re-submit (lineage cut at the fetch)
    out.count()
    assert(submits.size == 2,
      s"re-reading the fan-out result re-submitted jobs: ${submits.size}")
  }
}
