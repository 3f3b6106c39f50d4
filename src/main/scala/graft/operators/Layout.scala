package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Multi-dimensional write-layout clustering (beyond-parity; the
 * reference never controls physical layout — its TSVs are row streams).
 * Z-ordering interleaves the bits of two dimensions into one Morton
 * value; range-partitioning + sorting by that value makes every output
 * file cover a small RECTANGLE of (x, y) space instead of a stripe of
 * one dimension. Parquet min/max column statistics then let a reader
 * filtering on EITHER dimension skip most files — the standard lakehouse
 * layout optimization for the second-most-selective predicate, worth
 * orders of magnitude of scan I/O at 100 TB.
 *
 * Columns must be non-negative integral surrogates (bucketize floats /
 * dictionary-encode strings first); values must fit in `bits` bits —
 * higher bits are ignored by construction (only the low `bits` are
 * interleaved), which keeps the expression total rather than throwing
 * mid-write.
 */
object Layout {

  /** Morton/Z value: the low `bits` bits of x and y interleaved
    * (x in even positions, y in odd). Pure bit arithmetic on longs —
    * whole-stage-codegen friendly, no UDF. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val xs = x.cast(LongType)
    val ys = y.cast(LongType)
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /**
   * Cluster a frame for writing: range-partition on the Z value (each
   * output partition owns a contiguous Z range = a small (x, y) tile),
   * then sort within partitions so row groups inside each file tile
   * further. One shuffle; the sort is partition-local.
   */
  def zorderRepartition(df: DataFrame, xCol: String, yCol: String,
                        numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    val z = zValue(col(xCol), col(yCol), bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  // ===== deterministic training shards =====
  // The OUTPUT side of a training-data pipeline: examples must land in a
  // fixed number of shards, globally shuffled, and the assignment must be
  // reproducible across engines and re-runs (resumable jobs, differential
  // audits). Both the shard id and the within-shard order derive from
  // md5 of (id columns, seed) — the same portable-hash contract as the
  // sampling gates (core/Sampling.scala portableKeyMaterial) — so the
  // exact layout reproduces in any engine with md5, and changing the
  // seed is a fresh global shuffle without touching the data.

  private def keyMaterial(keys: Seq[Column], seedStr: String): Column =
    concat_ws("\u0001",
      keys.map(k => coalesce(k.cast(org.apache.spark.sql.types.StringType),
        lit("\u0000"))) :+ lit(seedStr): _*)

  /** Add `shard` (0..nShards-1) and `ord` (within-shard sort key): shard
    * from the first 8 md5 hex digits of (ids, seed), order from the full
    * md5 of (ids, seed+"#o"). Pure column expressions — no shuffle until
    * [[shardRepartition]]. */
  def shardAssign(df: DataFrame, idCols: Seq[String], nShards: Int,
                  seedStr: String = "0"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    require(idCols.nonEmpty, "idCols must be non-empty")
    val ids = idCols.map(col)
    df.withColumn("shard",
        pmod(conv(substring(md5(keyMaterial(ids, seedStr)), 1, 8), 16, 10)
          .cast(LongType), lit(nShards.toLong)).cast("int"))
      .withColumn("ord", md5(keyMaterial(ids, seedStr + "#o")))
  }

  /** One shuffle to the physical shard layout: hash-partition on the
    * shard id — every shard lands WHOLE in exactly one task partition
    * (a partition may carry several shards; hash is not identity) — then
    * sort within partitions by (shard, ord) so each shard's rows are
    * contiguous and deterministically shuffled. `.write.partitionBy
    * ("shard")` then emits exactly one sorted file per shard per
    * partition. */
  def shardRepartition(df: DataFrame, idCols: Seq[String], nShards: Int,
                       seedStr: String = "0"): DataFrame =
    shardAssign(df, idCols, nShards, seedStr)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"),
        keyMaterial(idCols.map(col), "tie"))
}
