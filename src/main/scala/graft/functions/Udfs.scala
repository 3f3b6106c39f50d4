package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Misc scalar function library (reference: udfs.py / utils.py /
 * funclib.py scalars not already covered by TextOps/TimeFuncs). All pure
 * Column expressions.
 */
object Udfs {

  /** Last path segment minus extension (udfs.py:9-18 parse_file_base_name). */
  def parseFileBaseName(c: Column): Column =
    regexp_extract(element_at(split(c, "/"), -1), "^(.*?)(\\.[^.]*)?$", 1)

  /** String length (udfs.py:32). */
  def getStringLen(c: Column): Column = length(c.cast(StringType))

  /** Zero-padded fixed-width rendering (udfs.py:260-267 to2digit/4/6). */
  def toNDigit(c: Column, n: Int): Column =
    lpad(c.cast(LongType).cast(StringType), n, "0")

  /** Probability -> 0/1 at 0.5 (udfs.py:269-273 convert_prob_to_binary). */
  def convertProbToBinary(c: Column): Column =
    when(c.cast(DoubleType) >= 0.5, 1).otherwise(0)

  /** Dotted IPv4 -> 8-char lowercase hex (utils.py:845-861). */
  def convertIpv4ToHex(c: Column): Column = {
    val parts = split(c, "\\.")
    concat((1 to 4).map(i =>
      lpad(lower(conv(element_at(parts, i), 10, 16)), 2, "0")): _*)
  }

  /** if_else over string cells (udfs.py:275-340 family). */
  def ifElseStr(cond: Column, ifVal: Column, elseVal: Column): Column =
    when(cond, ifVal).otherwise(elseVal)

  /** First non-empty among columns (udfs.py:342-406 select_first_non_empty). */
  def selectFirstNonEmpty(cols: Column*): Column =
    coalesce(cols.map(c => nullif(c.cast(StringType), lit(""))): _*)

  /** Sorted pairwise gaps between collected epoch seconds, humanized CSV
    * (funclib.py:208-238 get_time_diffs) — aggregate expression. */
  def getTimeDiffs(epochSec: Column): Column =
    // let-bound: each element_at reference would otherwise re-sort the
    // collected list (O(g^2 log g) per group)
    TextOps.letOnce(array_sort(collect_list(epochSec.cast(LongType)))) { sorted =>
      val diffs = when(size(sorted) < 2, array())
        .otherwise(transform(sequence(lit(1), size(sorted) - 1),
          i => element_at(sorted, i + 1) - element_at(sorted, i)))
      array_join(transform(diffs, d => TimeFuncs.displayRelativeTime(d)), ",")
    }
}
