package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Sequence assembly for LLM training pipelines (beyond-parity; the
 * reference stops at row-level text ops): context-window chunking and
 * token-budget bin packing — the two shapes every pretraining data
 * pipeline needs between "clean corpus" and "batches".
 */
object Packing {

  /**
   * Split each document into consecutive windows of at most `maxTokens`
   * whitespace tokens: one output row per (input row, chunk), with
   * `indexCol` (0-based) and `chunkCol` appended. Pure column
   * expressions — tokenize once, explode a chunk-index sequence, slice;
   * lazy, codegen'd, no shuffle. Null-text rows produce no chunks
   * (sequence over null explodes to nothing), matching the SQL oracle's
   * NULL range semantics.
   */
  def chunkByTokens(df: DataFrame, textCol: String, maxTokens: Int,
                    indexCol: String = "chunk_index",
                    chunkCol: String = "chunk_text"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(!df.columns.contains(indexCol) && !df.columns.contains(chunkCol),
      s"output columns $indexCol/$chunkCol must not exist")
    df.withColumn("__toks__", split(col(textCol), "\\s+"))
      // integer ceil; split never returns an empty array so nc >= 1 for
      // non-null text. The explicit null guard matters under
      // spark.sql.ansi.enabled=false, where size(null) is -1 (not null)
      // and sequence(0, -1) would emit bogus [0, -1] chunks per null row
      .withColumn("__nc__", when(col(textCol).isNotNull,
        expr(s"(size(__toks__) + ${maxTokens - 1}) div $maxTokens")))
      .withColumn(indexCol, explode(sequence(lit(0L), col("__nc__") - 1)))
      .withColumn(chunkCol, concat_ws(" ",
        slice(col("__toks__"), (col(indexCol) * maxTokens + 1).cast("int"),
          lit(maxTokens))))
      .drop("__toks__", "__nc__")
  }

  /**
   * Greedy token-budget packing: in `orderCols` order, documents
   * accumulate into a bin until the next one would exceed `capacity`,
   * then a new bin starts; a single document over capacity gets a bin
   * of its own. Appends `binCol` = "partition:bin".
   *
   * Packing is a sequential recurrence, so the global-greedy form is
   * inherently single-threaded; production pipelines pack
   * PARTITION-LOCALLY (each worker packs its shard, bin ids namespaced
   * by shard) and accept the at-most-one-partial-bin-per-partition
   * slack. That is exactly this shape: range-partition by `orderCols`
   * (keeps neighbors by length/order together, preserving the greedy
   * locality that makes packing effective), sort within partitions, one
   * mapPartitions pass. Bin-capacity invariants are law-spec'd; bin ids
   * depend on the partitioning, which is the documented contract.
   */
  def packGreedy(df: DataFrame, lenCol: String, capacity: Long,
                 orderCols: Seq[String], binCol: String = "bin_id",
                 numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(!df.columns.contains(binCol), s"output column $binCol must not exist")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ordered = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val lenIdx = ordered.schema.fieldIndex(lenCol)
    val schema = StructType(ordered.schema.fields :+
      StructField(binCol, StringType, nullable = false))
    val rdd = ordered.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var bin = 0L
      var used = 0L
      rows.map { row =>
        val len = math.max(0L, row.get(lenIdx) match {
          case null => 0L
          case n: Number => n.longValue()
          case other => other.toString.toLong
        })
        if (used > 0L && used + len > capacity) { bin += 1; used = 0L }
        used += len
        Row.fromSeq(row.toSeq :+ s"$pid:$bin")
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
