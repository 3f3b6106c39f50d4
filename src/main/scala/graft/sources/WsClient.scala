package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/**
 * HTTP -> DataFrame bridge (reference: core/src/omigo_core/wsclient.py:
 * 19-264 read_url_as_df — GET/POST with headers, retries, JSON or
 * TSV/CSV payload parsing).
 *
 * Driver-side by design, like the reference: the fetch happens once on
 * the driver and the payload parallelizes into a DataFrame. For bulk
 * URL fan-out use a DF of URLs + mapPartitions so executors fetch in
 * parallel (the reference's thread-pool fan-out, distributed).
 */
object WsClient {

  case class Response(status: Int, body: String)

  /** GET/POST with retries (reference defaults: 3 attempts, wait
    * between; wsclient.py:19-80). */
  def fetch(url: String, method: String = "GET",
            headers: Map[String, String] = Map.empty,
            body: String = null, timeoutMs: Int = 30000,
            attempts: Int = 3, waitMs: Int = 1000): Response = {
    var last: Throwable = null
    var attempt = 0
    // plain while, no closure: a non-local `return` inside foreach
    // surfaces as NonLocalReturnControl and would be eaten by the catch
    while (attempt < attempts) {
      try {
        val u = URI.create(url).toURL
        // never route loopback through an env-configured proxy
        val conn = (if (u.getHost == "localhost" || u.getHost == "127.0.0.1")
          u.openConnection(java.net.Proxy.NO_PROXY)
        else u.openConnection()).asInstanceOf[HttpURLConnection]
        conn.setRequestMethod(method)
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        if (body != null) {
          conn.setDoOutput(true)
          conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
        }
        val status = conn.getResponseCode
        val stream = if (status < 400) conn.getInputStream else conn.getErrorStream
        val text = if (stream == null) "" else
          new String(stream.readAllBytes(), StandardCharsets.UTF_8)
        conn.disconnect()
        return Response(status, text)
      } catch {
        // NonFatal: never retry on OOM / thread interrupts (task kills)
        case scala.util.control.NonFatal(t) =>
          last = t
          attempt += 1
          if (attempt < attempts) Thread.sleep(waitMs)
      }
    }
    throw new RuntimeException(
      s"fetch failed after $attempts attempts: $url ($last)", last)
  }

  /**
   * Distributed URL fan-out: append `<outCol>_status` / `<outCol>_body`
   * by fetching `urlCol` ON THE EXECUTORS — the Spark-native shape of the
   * reference's thread-pooled time-sliced search fan-out (reference:
   * extensions/src/omigo_ext/splunk_ext.py:22-637 fans out one search job
   * per time slice). Build a DF with one row per slice URL, fetch, then
   * parse bodies with from_json/split. `mapPartitions` amortizes nothing
   * here (HttpURLConnection is per-request) but keeps all requests of a
   * partition on one task, so `repartition(n)` directly sets fan-out
   * parallelism; failures surface as status -1 with the message in the
   * body rather than failing the job (per-slice retry semantics).
   */
  def fetchUrls(df: DataFrame, urlCol: String, outCol: String = "resp",
                headers: Map[String, String] = Map.empty,
                timeoutMs: Int = 30000, attempts: Int = 3,
                waitMs: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(s"${outCol}_status",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField(s"${outCol}_body",
        org.apache.spark.sql.types.StringType)))
    val urlIdx = df.schema.fieldIndex(urlCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { row =>
        val (status, body) =
          try {
            val r = fetch(row.getString(urlIdx), headers = headers,
              timeoutMs = timeoutMs, attempts = attempts, waitMs = waitMs)
            (r.status, r.body)
          } catch { case scala.util.control.NonFatal(t) => (-1, t.getMessage) }
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(status, body))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Fetch a URL and parse the payload into a DF: "json" = JSON-lines /
    * single JSON array, "tsv"/"csv" = delimited with header row
    * (reference read_url_as_df payload dispatch, wsclient.py:150-264). */
  def readUrlAsDf(spark: SparkSession, url: String, format: String = "json",
                  headers: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val resp = fetch(url, headers = headers)
    require(resp.status == 200, s"HTTP ${resp.status} for $url")
    format match {
      case "json" =>
        val lines = resp.body.trim match {
          case b if b.startsWith("[") =>
            // single array -> element per line via Spark's own parser
            Seq(b)
          case b => b.linesIterator.toSeq
        }
        val ds = spark.createDataset(lines)
        val df = spark.read.json(ds)
        // a single top-level array parses to one column "value"-less frame;
        // spark.read.json handles both shapes natively
        df
      case "csv" =>
        // Spark's CSV reader for quote/escape handling ("Doe, Jane" must
        // stay one field); all-string schema, "" for missing cells
        import spark.implicits._
        val lines = resp.body.linesIterator.toSeq
        require(lines.nonEmpty, "empty payload")
        spark.read.option("header", "true").option("inferSchema", "false")
          .csv(spark.createDataset(lines)).na.fill("")
      case "tsv" =>
        // raw split by design: reference TSV cells are URL-encoded, so
        // separators/quotes inside values are escaped, never quoted
        val sep = "\t"
        val lines = resp.body.linesIterator.toSeq
        require(lines.nonEmpty, "empty payload")
        val header = lines.head.split(java.util.regex.Pattern.quote(sep), -1)
        val rows = lines.tail.map(_.split(java.util.regex.Pattern.quote(sep), -1).toSeq)
        val schema = org.apache.spark.sql.types.StructType(header.map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
        val rowList = new java.util.ArrayList[org.apache.spark.sql.Row](rows.length)
        rows.foreach(r => rowList.add(org.apache.spark.sql.Row.fromSeq(
          r.padTo(header.length, ""))))
        spark.createDataFrame(rowList, schema)
      case f => throw new IllegalArgumentException(s"unknown format $f")
    }
  }
}
