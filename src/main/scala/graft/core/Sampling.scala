package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/**
 * Sampling family (reference: dataframe.py:2831-3325, 3929-4054,
 * utils.py:601-618).
 *
 * Determinism model: the reference seeds Python's RNG and murmur3 row
 * hashes. Here, hash-gated ops use a deterministic per-row hash
 * (`pmod(xxhash64(keys, seed), M) < ratio*M`) — the same decision on every
 * run, every cluster size, and every partitioning, which is the property
 * the reference's seeding actually provides. Shuffle-style ops use Spark's
 * seeded `rand`/`sample` (deterministic per seed, not bit-identical to
 * CPython's Mersenne Twister — asserted statistically in tests).
 */
object Sampling {

  private val M = 1000000L

  /** Deterministic hash gate: keep row iff hash(keys, seed) lands in the
    * first `ratio` fraction of hash space. */
  def hashGate(keys: Seq[Column], seed: Long, ratio: Double): Column =
    pmod(xxhash64(keys :+ lit(seed): _*), lit(M)) < (ratio * M).toLong

  /** Bernoulli row sample (dataframe.py:2831-2858). */
  def sample(df: DataFrame, ratio: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, ratio, seed)

  /** Exact-n sample (dataframe.py:2868-2909): global sort by seeded rand —
    * per-partition top-n + driver merge via TakeOrderedAndProject. */
  def sampleN(df: DataFrame, n: Int, seed: Long): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** Exact-n sample in ONE aggregation pass via the native reservoir
    * aggregate (plans/ReservoirSampleAgg): partial reservoirs merge on
    * executors — no sort key, no per-partition k-row driver merge. Rows
    * round-trip through JSON to ride the string-typed aggregate. */
  def sampleNOnePass(df: DataFrame, n: Int, seed: Long = 0L): DataFrame = {
    import graft.plans.ReservoirSampleAgg.reservoir_sample
    val packed = df.select(to_json(struct(df.columns.map(col): _*)).as("__j__"))
    packed.agg(reservoir_sample(col("__j__"), n, seed).as("__s__"))
      .select(explode(col("__s__")).as("__j__"))
      .select(from_json(col("__j__"), df.schema).as("__r__"))
      .select(col("__r__.*"))
  }

  /** Downsample only rows of one class, others untouched
    * (dataframe.py:2984-3021). Hash-gated → deterministic. */
  def sampleClass(df: DataFrame, classCol: String, value: String,
                  ratio: Double, seed: Long, gateCols: Seq[String]): DataFrame =
    // explicit null escape: (null =!= v) is null, and (null || gate)
    // would drop null-class rows at the gate rate instead of keeping them
    df.filter(col(classCol).isNull ||
      col(classCol).cast(StringType) =!= value ||
      hashGate(gateCols.map(col), seed, ratio))

  /** All-or-nothing group sampling by key hash (dataframe.py:3241-3276). */
  def sampleGroupByKey(df: DataFrame, groupCols: Seq[String], ratio: Double,
                       seed: Long): DataFrame =
    df.filter(hashGate(groupCols.map(col), seed, ratio))

  /** Cap distinct values of `col` per group — exact variant
    * (dataframe.py:3081-3142): dense_rank over hashed value within group. */
  def sampleGroupByMaxUniqValues(df: DataFrame, groupCols: Seq[String],
                                 valCol: String, maxUniq: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(xxhash64(col(valCol), lit(seed)), col(valCol))
    df.withColumn("__dr__", dense_rank().over(w))
      .filter(col("__dr__") <= maxUniq).drop("__dr__")
  }

  /** Approx variant (dataframe.py:3144-3189): scale sampling ratio by the
    * group's approx distinct count — single pass + broadcast-joined ratios. */
  def sampleGroupByMaxUniqValuesApprox(df: DataFrame, groupCols: Seq[String],
                                       valCol: String, maxUniq: Int,
                                       seed: Long): DataFrame = {
    val ratios = df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valCol)).as("__uniq__"))
      .withColumn("__ratio__",
        when(col("__uniq__") <= maxUniq, lit(1.0))
          .otherwise(lit(maxUniq.toDouble) / col("__uniq__")))
      .drop("__uniq__")
      .select(groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__ratio__"): _*)
    // null-safe join: a plain equi-join would drop null-keyed groups that
    // the exact (window) variant keeps
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(ratios), cond, "inner")
      .filter(pmod(xxhash64(col(valCol), lit(seed)), lit(M)).cast(DoubleType) < col("__ratio__") * M)
      .drop(groupCols.map(c => s"__g_$c") :+ "__ratio__": _*)
  }

  /** Balance classes down to the minority class count
    * (dataframe.py:3299-3312). */
  def sampleClassByMinClassCount(df: DataFrame, classCol: String, seed: Long): DataFrame = {
    val counts = df.groupBy(classCol).agg(count(lit(1)).as("__n__"))
    val row = counts.agg(min("__n__")).head()
    if (row.isNullAt(0)) df // empty input: min is NULL, nothing to balance
    else {
      // clamp instead of toInt: a >2^31 minority count must mean "no cap",
      // not a negative cap that drops every row
      val minN = math.min(row.getLong(0), Int.MaxValue.toLong).toInt
      sampleClassByMaxValues(df, classCol, minN, seed)
    }
  }

  /** Cap each class at n rows (dataframe.py:3314-3325). */
  def sampleClassByMaxValues(df: DataFrame, classCol: String, n: Int,
                             seed: Long): DataFrame = {
    val w = Window.partitionBy(col(classCol))
      .orderBy(xxhash64(struct(df.columns.map(col): _*), lit(seed)))
    df.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= n).drop("__rn__")
  }

  /** Global distinct-value cap via semi-join against a sampled distinct
    * list (dataframe.py:3278-3297). */
  def sampleColumnByMaxUniqValues(df: DataFrame, valCol: String, maxUniq: Int,
                                  seed: Long): DataFrame = {
    val keep = df.select(valCol).distinct()
      .orderBy(xxhash64(col(valCol), lit(seed))).limit(maxUniq)
    df.join(broadcast(keep), Seq(valCol), "left_semi")
  }

  /** Hash-partition into n batches by key cols (dataframe.py:3929-4054).
    * Returns a partition-id column rather than n materialized DFs — the
    * caller filters; at scale this is `repartition(n, keys)` territory. */
  def splitBatchesCol(df: DataFrame, cols: Seq[String], n: Int, seed: Long): DataFrame =
    df.withColumn("__batch__", pmod(xxhash64(cols.map(col) :+ lit(seed): _*), lit(n.toLong)))

  def splitBatches(df: DataFrame, cols: Seq[String], n: Int, seed: Long): Seq[DataFrame] = {
    val tagged = splitBatchesCol(df, cols, n, seed)
    (0 until n).map(i => tagged.filter(col("__batch__") === i).drop("__batch__"))
  }

  /** Seeded shuffle (utils.py:601-618). */
  def randomShuffle(df: DataFrame, seed: Long): DataFrame = df.orderBy(rand(seed))

  // ===== portable (md5-gated) variants =====
  // Same determinism contract as the xxhash64 gates but reproducible in
  // any engine with md5 — used by the DuckDB-differential gate, and by
  // users who need sampling decisions stable across systems.

  /** Unit-separator-delimited, null-sentineled key material: distinct key tuples
    * must hash differently — a bare concat would collide ("ab","c") with
    * ("a","bc") and correlate their sampling decisions. */
  private def portableKeyMaterial(keys: Seq[Column], seedStr: String): Column =
    concat_ws("\u0001",
      keys.map(k => coalesce(k.cast(StringType), lit("\u0000"))) :+ lit(seedStr): _*)

  /** Keep rows whose md5(key material) hex prefix is below `hexThreshold`
    * (e.g. "40" keeps ~25%). */
  def portableGate(keys: Seq[Column], seedStr: String, hexThreshold: String): Column =
    substring(md5(portableKeyMaterial(keys, seedStr)),
      1, hexThreshold.length) < hexThreshold

  /** All-or-nothing group sampling, portable gate. */
  def sampleGroupByKeyPortable(df: DataFrame, groupCols: Seq[String],
                               hexThreshold: String, seedStr: String = "0"): DataFrame =
    df.filter(portableGate(groupCols.map(col), seedStr, hexThreshold))

  /** Cap each class at n rows, md5-ranked — deterministic in any engine. */
  def sampleClassByMaxValuesPortable(df: DataFrame, classCol: String, n: Int,
                                     seedStr: String = "0"): DataFrame = {
    val w = Window.partitionBy(col(classCol))
      .orderBy(md5(portableKeyMaterial(df.columns.map(col).toSeq, seedStr)))
    df.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= n).drop("__rn__")
  }
}
