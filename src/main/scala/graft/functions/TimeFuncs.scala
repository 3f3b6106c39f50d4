package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Lenient timestamp parsing / formatting (reference:
 * python-packages/core/src/omigo_core/timefuncs.py:7-133 parses ~10
 * formats by trial; funclib.py:283-355 humanized durations).
 *
 * Spark-first shape: a `coalesce` cascade of `to_timestamp` attempts —
 * codegen'd, null on miss, first success wins; exactly the reference's
 * try-chain but vectorized.
 */
object TimeFuncs {

  /** Formats tried in order (reference timefuncs.py:7-81's list, ISO first). */
  val Formats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "yyyyMMdd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy",
  )

  /** Parse a string column leniently: first matching format wins;
    * numeric strings are treated as epoch seconds. try_to_timestamp
    * (null on miss) keeps the cascade working under ANSI mode. */
  def parseLenient(c: Column): Column = {
    val attempts = Formats.map(f => try_to_timestamp(c, lit(f)))
    val epoch = when(c.rlike("^[0-9]{9,11}$"),
      timestamp_seconds(c.cast(LongType)))
    coalesce(epoch +: attempts: _*)
  }

  /** datetime string -> UTC epoch seconds (timefuncs.py:83-95). */
  def datetimeToUtcTimestampSec(c: Column): Column =
    unix_timestamp(parseLenient(c))

  /** datetime string -> UTC epoch millis. unix_millis is exact — the
    * double round-trip lost sub-ms bits (off-by-one-ms results). */
  def datetimeToUtcTimestampMillis(c: Column): Column =
    unix_millis(parseLenient(c))

  /** epoch seconds -> ISO datetime string (timefuncs.py:97-110). */
  def utcTimestampToDatetimeStr(c: Column): Column =
    date_format(timestamp_seconds(c.cast(LongType)), "yyyy-MM-dd HH:mm:ss")

  /** "3d4h" / "2h30m" / "45m" style reference durations -> seconds
    * (funclib.py:330-355 resolve_reference_time grammar). */
  def durationToSec(c: Column): Column = {
    // regexp_extract yields "" on no match; nullif keeps the cast
    // ANSI-safe (a bare cast("") throws in Spark 4)
    def part(unit: String, mult: Long): Column =
      coalesce(nullif(regexp_extract(c, s"(\\d+)$unit", 1), lit("")).cast(LongType),
        lit(0L)) * mult
    part("d", 86400L) + part("h", 3600L) + part("m", 60L) + part("s", 1L)
  }

  /** Humanized duration "1d 2h" / "3h 4m" / "5m" from seconds
    * (funclib.py:283-310 get_display_relative_time_str). */
  def displayRelativeTime(sec: Column): Column = {
    val d = floor(sec / 86400)
    val h = floor((sec % 86400) / 3600)
    val m = floor((sec % 3600) / 60)
    when(d > 0, concat(d.cast(StringType), lit("d "), h.cast(StringType), lit("h")))
      .when(h > 0, concat(h.cast(StringType), lit("h "), m.cast(StringType), lit("m")))
      .otherwise(concat(m.cast(StringType), lit("m")))
  }
}
