package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState,
  GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.core.AggRegistry

/**
 * Structured Streaming surface. The reference has no continuous runtime —
 * its closest artifact is bounded Kafka polling (reference:
 * EXT/kafka_ext.py:39-104) and date-partitioned incremental scans
 * (HYDRA/etl.py:148). This module is the additive streaming capability:
 * the same windowed-aggregate semantics as WindowOps (§2.12), run
 * incrementally with watermarks + state store.
 *
 * Source mapping: `readStream.format("kafka")` drops in when the Kafka
 * connector jar ships with the cluster (not present in this offline
 * container); the file source below exercises identical plan shapes.
 */
object StreamOps {

  /** Streaming file source over a directory of JSON-lines (schema
    * required up front — streaming can't infer). */
  def readJsonStream(spark: SparkSession, dir: String,
                     schemaDdl: String): DataFrame =
    spark.readStream.schema(schemaDdl).json(dir)

  /**
   * Kafka source configuration (reference: EXT/kafka_ext.py:13-104 —
   * bounded topic polling into a DataFrame). Maps 1:1 onto the options
   * of Spark's `format("kafka")` source; `maxOffsetsPerTrigger` bounds
   * each micro-batch the way the reference's `max_records` bounds a
   * poll. The kafka connector jar ships with the cluster, not with this
   * library — `load()` resolves the provider at runtime, so the builder
   * is testable offline and the source usable wherever the jar exists.
   */
  final case class KafkaSourceConfig(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      extra: Map[String, String] = Map.empty) {
    def toOptions: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topics.mkString(","),
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
        extra
  }

  /** `readStream.format("kafka")` with the config's options; value/key
    * arrive as binary — pair with `from_json(col("value").cast("string"),
    * schema)` downstream. Requires the kafka connector jar on the
    * cluster classpath (absent in this offline container). */
  def readKafkaStream(spark: SparkSession, config: KafkaSourceConfig): DataFrame =
    spark.readStream.format("kafka").options(config.toOptions).load()

  /** Batch (bounded) kafka read — the closest analogue of the
    * reference's poll-then-return contract. */
  def readKafkaBatch(spark: SparkSession, config: KafkaSourceConfig): DataFrame =
    spark.read.format("kafka").options(config.toOptions)
      .option("endingOffsets", "latest").load()

  /**
   * Tumbling/sliding event-time windowed aggregate with a watermark —
   * the streaming twin of WindowOps.tumblingTimeAggregate. Late rows
   * beyond `watermark` drop; state for closed windows evicts.
   */
  def windowedAggregate(stream: DataFrame, tsCol: String, size: String,
                        slide: String, watermark: String,
                        keys: Seq[String], aggCols: Seq[String],
                        aggFuncs: Seq[String]): DataFrame = {
    val exprs = aggCols.zip(aggFuncs).map { case (c, f) =>
      AggRegistry.expr(f, col(c)).as(AggRegistry.outputName(c, f)) }
    val win = if (slide == null) window(col(tsCol), size)
              else window(col(tsCol), size, slide)
    stream.withWatermark(tsCol, watermark)
      .groupBy(win +: keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /**
   * Custom per-key running state via flatMapGroupsWithState-shaped API:
   * here the common case — dedup-by-key over a stream (first occurrence
   * wins), which is `dropDuplicates` with watermark state eviction.
   */
  def streamingDedup(stream: DataFrame, tsCol: String, watermark: String,
                     keyCols: Seq[String]): DataFrame =
    // dropDuplicatesWithinWatermark dedups on the KEYS alone while still
    // evicting state past the watermark; the older dropDuplicates(keys :+
    // ts) idiom dedups (key, ts) pairs — a re-occurrence with a new
    // timestamp would NOT be suppressed
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class SessionEvent(key: String, ts: java.sql.Timestamp, value: Double) {
    def tsMillis: Long = ts.getTime
  }
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(key: String, session_start: Long, session_end: Long,
                     n_events: Long, value_sum: Double)

  /**
   * Custom per-key state via flatMapGroupsWithState: gap-based
   * sessionization — events for a key belong to one session until a
   * quiet period of `gapMillis`; a closed session emits one row.
   * Event-time timeout closes sessions when the watermark passes the
   * gap. Input columns: (key string, ts timestamp, value double).
   */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, gapMillis: Long,
                 watermark: String): Dataset[Session] = {
    implicit val se = Encoders.product[SessionEvent]
    implicit val ss = Encoders.product[SessionState]
    implicit val so = Encoders.product[Session]
    implicit val str = Encoders.STRING
    val typed = events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("value"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(key, s.start, s.end, s.n, s.sum))
          } else {
            val sorted = events.toSeq.sortBy(_.tsMillis)
            var cur = state.getOption
            // out-of-order events older than the live session's reach
            // accumulate into ONE provisional past session (consecutive
            // late events within gap of each other merge) instead of each
            // closing as its own singleton. Because events are sorted
            // ascending and the too-old threshold (start - gap) only
            // moves down, all too-old events form a prefix — once an
            // event joins the live session no later one can be too-old.
            var late: Option[SessionState] = None
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMillis < s.start - gapMillis =>
                  late match {
                    case Some(l) if e.tsMillis - l.end <= gapMillis =>
                      late = Some(SessionState(l.start,
                        math.max(l.end, e.tsMillis), l.n + 1, l.sum + e.value))
                    case Some(l) =>
                      closed += Session(key, l.start, l.end, l.n, l.sum)
                      late = Some(SessionState(e.tsMillis, e.tsMillis, 1, e.value))
                    case None =>
                      late = Some(SessionState(e.tsMillis, e.tsMillis, 1, e.value))
                  }
                case Some(s) if e.tsMillis - s.end <= gapMillis =>
                  // late events extend bounds monotonically - never
                  // rewind `end` (that would split future sessions and
                  // produce a below-watermark timeout)
                  cur = Some(SessionState(math.min(s.start, e.tsMillis),
                    math.max(s.end, e.tsMillis), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(key, s.start, s.end, s.n, s.sum)
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1, e.value))
              }
            }
            // the live session's start may have moved down into the late
            // chain's reach — merge rather than emit a split session
            late.foreach { l =>
              cur match {
                case Some(s) if s.start - l.end <= gapMillis =>
                  cur = Some(SessionState(math.min(l.start, s.start),
                    math.max(l.end, s.end), s.n + l.n, s.sum + l.sum))
                case _ =>
                  closed += Session(key, l.start, l.end, l.n, l.sum)
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a timeout at/below the watermark throws; clamp just past
              // it so very-late sessions close on the next trigger
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.end + gapMillis, wm + 1))
            }
            closed.iterator
          }
      }
  }

  /**
   * Batch twin of `sessionize`: identical gap semantics expressed as
   * gaps-and-islands over window functions — a session break wherever
   * the inter-event gap exceeds `gapMillis`, session id = running count
   * of breaks. Every window is PARTITIONED BY key (no single-task sort),
   * and the whole operator is two window passes + one aggregation.
   * `tsMillisCol` is epoch millis (long). The streaming/batch pair is
   * law-tested for equivalence (Round4Spec); this one carries the DuckDB
   * gaps-and-islands oracle gate (q_sessionize_batch).
   */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsMillisCol: String,
                      valueCol: String, gapMillis: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("ts_ms")
    val e = events.select(col(keyCol).cast("string").as("key"),
      col(tsMillisCol).cast("long").as("ts_ms"),
      col(valueCol).cast("double").as("value"))
    val flagged = e.withColumn("__brk__",
      when(col("ts_ms") - lag("ts_ms", 1).over(w) > gapMillis, 1).otherwise(0))
    flagged.withColumn("__sid__", sum("__brk__").over(w))
      .groupBy(col("key"), col("__sid__"))
      .agg(min("ts_ms").as("session_start"), max("ts_ms").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("value_sum"))
      .drop("__sid__")
  }

  /**
   * Stream-stream event-time interval join: (l, r) pairs with equal keys
   * where r's timestamp falls in [l.ts + lowerMs, l.ts + upperMs] — the
   * "action A followed by action B within T" primitive (view->purchase
   * attribution, error->retry correlation). Both inputs get the same
   * watermark, and the time bound lives IN the join condition, which is
   * what lets Structured Streaming size and evict join state instead of
   * buffering both streams forever. Column names must be disjoint; the
   * key columns are passed per side so the joined row keeps both.
   *
   * Also usable with two BATCH frames: the equality conjunct makes the
   * batch planner pick a shuffled hash/sort-merge join on key with the
   * interval as a residual predicate — never a nested-loop — so the
   * batch twin (gated as q_interval_join_batch) is the same code path
   * a backfill would run at 100 TB.
   */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String,
                   right: DataFrame, rKey: String, rTs: String,
                   lowerMs: Long, upperMs: Long,
                   watermark: String = null): DataFrame = {
    require(lowerMs <= upperMs,
      s"interval lower bound must be <= upper: [$lowerMs, $upperMs]")
    val overlapping = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapping.isEmpty,
      s"interval join sides must have disjoint column names, both have: " +
        s"${overlapping.toSeq.sorted.mkString(", ")}")
    val (l, r) =
      if (watermark == null) (left, right)
      else (left.withWatermark(lTs, watermark),
            right.withWatermark(rTs, watermark))
    l.join(r, col(lKey) === col(rKey) &&
      col(rTs) >= col(lTs) + expr(s"INTERVAL $lowerMs MILLISECONDS") &&
      col(rTs) <= col(lTs) + expr(s"INTERVAL $upperMs MILLISECONDS"))
  }

  /** Write to an in-memory sink for tests / bounded polls (the
    * reference's bounded-read semantics: process what arrived, stop). */
  def runToMemory(stream: DataFrame, queryName: String,
                  outputMode: String = "append"): Unit = {
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
