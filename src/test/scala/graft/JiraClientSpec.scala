package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.JiraClient
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** JiraClient against a local stub server speaking the public Jira v2
  * REST shapes: /rest/api/2/field registry, paged /rest/api/2/search.
  * Covers the reference jira_ext.py behaviors — customfield rename, the
  * per-type value shaping (json sniffing, array joins, :json_encoded
  * columns), null/empty skipping, the recursively-renamed `raw` column,
  * env-var auth resolution, pagination, and the per-row templated
  * fan-out on executors. */
class JiraClientSpec extends SparkTestBase {

  private var server: HttpServer = _
  private var port: Int = _
  private val searchCalls = new AtomicInteger(0)
  @volatile private var lastAuth: String = ""

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def queryParams(q: String): Map[String, String] =
    if (q == null) Map.empty
    else q.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap

  // the field registry: two custom fields with display names, standard
  // fields with/without schema types
  private val fieldRegistry =
    """[
      {"id":"summary","name":"Summary","schema":{"type":"string"}},
      {"id":"created","name":"Created","schema":{"type":"datetime"}},
      {"id":"votes","name":"Votes","schema":{"type":"number"}},
      {"id":"assignee","name":"Assignee","schema":{"type":"user"}},
      {"id":"labels","name":"Labels","schema":{"type":"array"}},
      {"id":"issuelinks","name":"Linked Issues","schema":{"type":"array"}},
      {"id":"customfield_10001","name":"Severity","schema":{"type":"string"}},
      {"id":"customfield_10002","name":"Regions","schema":{"type":"array"}},
      {"id":"nofschema","name":"No Schema"}
    ]"""

  // issues keyed by project so the templated fan-out can select subsets
  private def issuesFor(jql: String): Seq[String] = {
    if (jql.contains("ALPHA")) Seq(
      """{"key":"AL-1","fields":{
           "summary":"plain text",
           "customfield_10001":"{\"sev\": 2, \"src\": \"scan\"}",
           "customfield_10002":["us","eu"],
           "assignee":{"name":"sam","active":true},
           "created":"2024-01-02T03:04:05.000+0000",
           "votes":7,
           "reporter":null,
           "labels":[],
           "issuelinks":[{"id":"L1","dir":"out"},{"id":"L2","dir":"in"}]
         }}""",
      """{"key":"AL-2","fields":{
           "summary":"{'quoted': 1}",
           "customfield_10002":[],
           "watchers":{}
         }}""")
    else if (jql.contains("BIG")) (0 until 120).map(i =>
      s"""{"key":"BG-$i","fields":{"summary":"row $i"}}""")
    else Seq.empty
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.createContext("/rest/api/2/field", (ex: HttpExchange) => try {
      lastAuth = ex.getRequestHeaders.getFirst("Authorization")
      respond(ex, 200, fieldRegistry)
    } catch { case t: Throwable => respond(ex, 500, t.toString) })
    server.createContext("/rest/api/2/search", (ex: HttpExchange) => try {
      searchCalls.incrementAndGet()
      lastAuth = ex.getRequestHeaders.getFirst("Authorization")
      val p = queryParams(ex.getRequestURI.getRawQuery)
      val all = issuesFor(p("jql"))
      val startAt = p.getOrElse("startAt", "0").toInt
      val max = p.getOrElse("maxResults", "50").toInt
      val page = all.slice(startAt, startAt + max)
      respond(ex, 200,
        s"""{"startAt":$startAt,"maxResults":$max,"total":${all.size},
             "issues":[${page.mkString(",")}]}""")
    } catch { case t: Throwable => respond(ex, 500, t.toString) })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def cfg = JiraClient.Config.basicAuth(
    s"http://127.0.0.1:$port", "user", "pass").copy(pageSize = 50)

  test("jira: auth resolution follows the reference env-var cascade") {
    val byBasic = JiraClient.Config.fromEnv("http://x", Map(
      JiraClient.JiraApiUser -> "u", JiraClient.JiraApiPass -> "p",
      JiraClient.JiraApiAuthToken -> "t").get)
    assert(byBasic.authHeader.startsWith("Basic ")) // user+pass wins
    val byToken = JiraClient.Config.fromEnv("http://x",
      Map(JiraClient.JiraApiAuthToken -> "t").get)
    assert(byToken.authHeader == "Bearer t")
    val e = intercept[IllegalArgumentException] {
      JiraClient.Config.fromEnv("http://x", Map.empty[String, String].get)
    }
    assert(e.getMessage.contains("No valid authentication mechanism found"))
    intercept[IllegalArgumentException] { JiraClient.Config("", "Bearer t") }
  }

  test("jira: search shapes fields per the reference rules") {
    val df = JiraClient.searchIssues(spark, cfg, "project = ALPHA",
      maxResults = 10)
    assert(lastAuth.startsWith("Basic "))
    val rows = df.collect().map(r =>
      df.columns.zip(r.toSeq.map(v => String.valueOf(v))).toMap)
    assert(rows.length == 2)
    val al1 = rows.find(_("key") == "AL-1").get
    val al2 = rows.find(_("key") == "AL-2").get
    // customfield with string type carrying JSON -> renamed + :json_encoded,
    // canonically re-encoded (jackson compact)
    assert(al1("Severity:json_encoded") == """{"sev":2,"src":"scan"}""")
    // customfield array of scalars -> renamed + ","-join
    assert(al1("Regions") == "us,eu")
    // object value (user type) -> json_encoded
    assert(al1("assignee:json_encoded") == """{"name":"sam","active":true}""")
    // datetime + number -> stringified under mapped key semantics
    assert(al1("created") == "2024-01-02T03:04:05.000+0000")
    assert(al1("votes") == "7")
    // array of dicts -> json_encoded
    assert(al1("issuelinks:json_encoded") ==
      """[{"id":"L1","dir":"out"},{"id":"L2","dir":"in"}]""")
    // plain string stays a plain column
    assert(al1("summary") == "plain text")
    // null / empty list / empty dict fields are SKIPPED -> "" in the
    // union header (reporter null, labels [], watchers {},
    // customfield_10002 [] on AL-2)
    assert(!df.columns.contains("reporter") && !df.columns.contains("labels")
      && !df.columns.contains("watchers"))
    assert(al2("Regions") == "")
    // single-quoted pseudo-JSON string: best-effort converted
    assert(al2("summary:json_encoded") == """{"quoted":1}""")
    assert(al2("summary") == "") // union header fills the plain variant
    // raw column: full issue JSON with customfield keys recursively renamed
    assert(al1("raw").contains("\"Severity\"") &&
      !al1("raw").contains("customfield_10001"))
    assert(al1("raw").contains("\"key\":\"AL-1\""))
  }

  test("jira: empty search returns an empty frame, not a throw") {
    val df = JiraClient.searchIssues(spark, cfg, "project = NONE")
    assert(df.count() == 0)
  }

  test("jira: pagination pages by pageSize and stops at maxResults") {
    searchCalls.set(0)
    val df = JiraClient.searchIssues(spark, cfg, "project = BIG",
      maxResults = 75)
    assert(df.count() == 75)
    // 2 search pages (50 + 25); +0 for the fields call (separate context)
    assert(searchCalls.get == 2, s"calls=${searchCalls.get}")
    // unbounded-ish request stops at the server's total
    searchCalls.set(0)
    val all = JiraClient.searchIssues(spark, cfg, "project = BIG",
      maxResults = 1000)
    assert(all.count() == 120)
    assert(searchCalls.get == 3) // 50+50+20
  }

  test("jira: per-row templated fan-out resolves {col} and prefixes results") {
    import spark.implicits._
    val seeds = Seq(("r1", "ALPHA"), ("r2", "NONE")).toDF("row_id", "proj")
    val out = JiraClient.searchIssuesPar(seeds, cfg,
      "project = {proj} AND id = {row_id}", prefix = "jr", maxResults = 10)
    // NONE matches nothing -> its row drops (reference explode of empty)
    assert(out.select("row_id").distinct().collect().map(_.getString(0))
      .toSeq == Seq("r1"))
    assert(out.count() == 2) // AL-1, AL-2 joined onto r1
    assert(out.columns.contains("jr:key") && out.columns.contains("row_id"))
    assert(out.columns.contains("jr:Severity:json_encoded"))
    val keys = out.select("jr:key").collect().map(_.getString(0)).sorted.toSeq
    assert(keys == Seq("AL-1", "AL-2"))
  }

  test("jira: fan-out runs exactly ONE search per input row (fetch-once law)") {
    import spark.implicits._
    searchCalls.set(0)
    // three rows, each a single-page search (ALPHA: 2 issues; BIG capped
    // at maxResults=10 -> one page; NONE: empty) -> exactly 3 search
    // requests total. The two-pass explodeMaps would make 6 (VERDICT r14
    // finding 1: doubled API load + silently dropped pass-2-only keys).
    val seeds = Seq(("r1", "ALPHA"), ("r2", "BIG"), ("r3", "NONE"))
      .toDF("row_id", "proj")
    val out = JiraClient.searchIssuesPar(seeds, cfg, "project = {proj}",
      prefix = "jr", maxResults = 10)
    assert(out.count() == 12) // 2 ALPHA + 10 BIG (capped), NONE drops
    assert(searchCalls.get == 3,
      s"expected 1 search per input row (3), saw ${searchCalls.get}")
    // and re-reading the result does not re-fetch (lineage cut at the
    // materialized fetch)
    out.count()
    assert(searchCalls.get == 3,
      s"re-reading the fan-out result re-ran searches: ${searchCalls.get}")
  }
}
