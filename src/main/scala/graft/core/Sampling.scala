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

  /**
   * Exact-n sample WITH replacement (dataframe.py:2873-2936 `sample_n`
   * with `replace=True` / `sample_n_with_replacement`): n independent
   * uniform draws over the rows, duplicates allowed. Distributed shape:
   * the n draw indices are generated driver-side from the seed (n is a
   * sample size — small by contract), collapsed to (index, copies)
   * multiplicities, and joined against a zipWithIndex-numbered corpus
   * (offset-based, no shuffle of the data); each matched row replicates
   * by its multiplicity. One count, one broadcast join — never a global
   * sort or single-partition window.
   */
  def sampleNWithReplacement(df: DataFrame, n: Int, seed: Long): DataFrame = {
    require(n >= 0, s"n cant be negative: $n")
    val spark = df.sparkSession
    if (n == 0) return df.limit(0)
    val cnt = df.count()
    if (cnt == 0) return df
    val rng = new scala.util.Random(seed)
    // uniform bounded draw via rejection sampling — floorMod(nextLong, cnt)
    // carries a (tiny, but avoidable) modulo bias toward the low residues
    // whenever cnt doesn't divide 2^64; reject draws beyond the largest
    // exact multiple of cnt instead. Explicit (not JDK nextLong(bound)) so
    // the oracle replica in scripts/check_oracle.py stays a 5-liner.
    def boundedLong(): Long = {
      val max = (Long.MaxValue / cnt) * cnt
      var v = rng.nextLong() & Long.MaxValue // uniform non-negative 63-bit
      while (v >= max) v = rng.nextLong() & Long.MaxValue
      v % cnt
    }
    val draws = Seq.fill(n)(boundedLong())
    val copies = draws.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    import spark.implicits._
    val picks = broadcast(copies.toDF("__idx__", "__copies__"))
    // scan-order ordinal (Tungsten-native zipWithIndex): same row<->index
    // mapping as file order, no RDD hop, no shuffle
    val numbered = XDF.scanOrdinal(df, "__idx__")
    numbered.join(picks, Seq("__idx__"))
      .withColumn("__rep__", explode(sequence(lit(1L), col("__copies__"))))
      .drop("__idx__", "__copies__", "__rep__")
  }

  /** Downsample to `limit` rows only if the input exceeds it
    * (dataframe.py:2911-2930 `sample_n_with_warn`): over-limit inputs are
    * warned about and sampled; within-limit inputs pass through
    * unchanged (no shuffle, no sort). */
  def sampleNWithWarn(df: DataFrame, limit: Int, seed: Long,
                      msg: String = null): DataFrame = {
    val n = df.count()
    if (n > limit) {
      val detail = if (msg != null) msg else "Input exceeds the limit"
      graft.core.Log.warn(s"sample_n_with_warn: $detail. $n > $limit. Taking a sample")
      sampleN(df, limit, seed)
    } else df
  }

  /**
   * All-or-nothing group gate conditioned on the group's value of `col`
   * (dataframe.py:3023-3079 `sample_group_by_col_value`): every group is
   * assumed to carry one value of `col`; groups whose value != `colValue`
   * always survive, groups AT the value survive at `ratio`. The
   * reference's per-group `random.random()` is replaced by the
   * deterministic per-group hash gate — same all-or-nothing contract,
   * stable across runs and partitionings. Skew-reduction tool: thin out
   * the one dominant value without touching the rest.
   */
  def sampleGroupByColValue(df: DataFrame, groupCols: Seq[String], valCol: String,
                            colValue: String, ratio: Double, seed: Long): DataFrame = {
    require(ratio >= 0 && ratio <= 1, s"Sampling ratio has to be between 0 and 1: $ratio")
    df.filter(col(valCol).isNull ||
      col(valCol).cast(StringType) =!= colValue ||
      hashGate(groupCols.map(col), seed, ratio))
  }

  /** Portable (md5-gated) variant of `sampleGroupByColValue` — the
    * DuckDB-differential gate mirrors it exactly. */
  def sampleGroupByColValuePortable(df: DataFrame, groupCols: Seq[String],
                                    valCol: String, colValue: String,
                                    hexThreshold: String,
                                    seedStr: String = "0"): DataFrame =
    df.filter(col(valCol).isNull ||
      col(valCol).cast(StringType) =!= colValue ||
      portableGate(groupCols.map(col), seedStr, hexThreshold))

  /**
   * Per-class cap on distinct `valCol` values within each group
   * (dataframe.py:3191-3239 `sample_group_by_max_uniq_values_per_class`):
   * the allowed number of distinct values depends on each row's class —
   * `maxUniqMap(class)`, falling back to `defMaxUniq` (None = unlimited).
   * The reference gates rows at ratio cap/uniq_count with a hash of
   * (group, class, value); this exact variant ranks distinct values
   * deterministically (md5 of the null-sentineled value) within each
   * group and keeps rows whose value rank is within their class's cap —
   * same intent, exactly-capped, and portable to a SQL oracle. One
   * window shuffle on the grouping key.
   */
  def sampleGroupByMaxUniqValuesPerClass(df: DataFrame, groupCols: Seq[String],
                                         classCol: String, valCol: String,
                                         maxUniqMap: Map[String, Int],
                                         defMaxUniq: Option[Int] = None,
                                         seedStr: String = "0"): DataFrame = {
    maxUniqMap.values.foreach(v =>
      require(v > 0, s"max_uniq_values has to be more than 0: $v"))
    defMaxUniq.foreach(v =>
      require(v > 0, s"max_uniq_values has to be more than 0: $v"))
    val capExpr = maxUniqMap.foldLeft(
        when(lit(false), lit(0))) { case (acc, (k, v)) =>
        acc.when(col(classCol).cast(StringType) === k, lit(v))
      }.otherwise(defMaxUniq.map(lit(_)).getOrElse(lit(Int.MaxValue)))
    // the deepest rank any finite cap can admit — ranks beyond it never
    // survive, so the bounded heap only ever needs this many values
    val kNeeded = (maxUniqMap.values.toSeq ++ defMaxUniq.toSeq)
      .foldLeft(0)(math.max)
    if (maxUniqMap.isEmpty && defMaxUniq.isEmpty) df // every cap unlimited
    else if (kNeeded > graft.plans.BoundedTopKAgg.MaxHeapK) {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(md5(portableKeyMaterial(Seq(col(valCol)), seedStr)), col(valCol))
      df.withColumn("__dr__", dense_rank().over(w))
        .filter(col("__dr__") <= capExpr)
        .drop("__dr__")
    } else {
      // bounded-heap ranks over the distinct pairs; a row survives iff its
      // class cap is unlimited (defMaxUniq=None classes) or its value's
      // rank is within the cap (absent rank = deeper than every cap)
      val keys = groupCols :+ valCol
      val ranked = topDistinctValueRanks(df, groupCols, valCol,
          md5(portableKeyMaterial(Seq(col(valCol)), seedStr)), kNeeded)
        .toDF(groupCols.map("__k_" + _) ++ Seq("__dr__", s"__k_$valCol"): _*)
      val cond = keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
      df.join(ranked, cond, "left")
        .filter(capExpr === lit(Int.MaxValue) ||
          coalesce(col("__dr__"), lit(Long.MaxValue)) <= capExpr)
        .drop(ranked.columns.toSeq: _*)
    }
  }

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
    * (dataframe.py:3081-3142). The surviving values are the maxUniq
    * hash-smallest distinct values per group (identical selection to the
    * dense_rank window this used to be, minus the all-rows-through-one-
    * task-per-group shuffle): bounded-heap rank over the DISTINCT pairs,
    * then a null-safe left-semi join keeps exactly the rows carrying a
    * surviving value. */
  def sampleGroupByMaxUniqValues(df: DataFrame, groupCols: Seq[String],
                                 valCol: String, maxUniq: Int, seed: Long): DataFrame = {
    if (maxUniq > graft.plans.BoundedTopKAgg.MaxHeapK) {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(xxhash64(col(valCol), lit(seed)), col(valCol))
      df.withColumn("__dr__", dense_rank().over(w))
        .filter(col("__dr__") <= maxUniq).drop("__dr__")
    } else {
      val keys = groupCols :+ valCol
      val keep = topDistinctValueRanks(df, groupCols, valCol,
          xxhash64(col(valCol), lit(seed)), maxUniq)
        .drop("__dr__").toDF(keys.map("__k_" + _): _*)
      val cond = keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
      df.join(keep, cond, "left_semi")
    }
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

  /**
   * Shared per-class row-cap tail: keep the n hash-smallest rows of each
   * class. A bounded-heap aggregate (BoundedTopKAgg) replaces the
   * `row_number().over(Window.partitionBy(class))` window — the window
   * funnels every row of a class through ONE task, so the dominant class
   * of a skewed corpus is a guaranteed straggler; the aggregate keeps at
   * most n rows per class per map partial (shuffle carries O(n x classes
   * x partitions) bounded buffers). Ordering is (hash asc, full row asc)
   * — the same selection as the window, with hash ties additionally
   * deterministic. Above the heap budget the spill-safe window remains
   * the fallback.
   */
  private def capRowsPerClass(df: DataFrame, classCol: String, n: Int,
                              orderKey: Column): DataFrame =
    if (n <= graft.plans.BoundedTopKAgg.MaxHeapK) {
      val entry = struct(orderKey.as("k"),
        struct(df.columns.map(col): _*).as("r"))
      df.groupBy(col(classCol))
        .agg(graft.plans.BoundedTopKAgg.bounded_top_k(entry, n, reverse = false)
          .as("__tk__"))
        .select(explode(col("__tk__")).as("__e__"))
        .select(col("__e__.r.*"))
    } else {
      val w = Window.partitionBy(col(classCol)).orderBy(orderKey)
      df.withColumn("__rn__", row_number().over(w))
        .filter(col("__rn__") <= n).drop("__rn__")
    }

  /**
   * Per-group 1-based ranks of the k first distinct `valCol` values in
   * `(orderKey, value)` order — the scale-safe core of the distinct-value
   * caps: the corpus collapses to distinct (group, value) pairs map-side,
   * a bounded heap keeps k values per group, and posexplode restores the
   * dense ranks. Output: (groupCols..., __dr__, valCol); the tiny ranked
   * frame joins back null-safely. Never a data-cardinality window.
   */
  private def topDistinctValueRanks(df: DataFrame, groupCols: Seq[String],
                                    valCol: String, orderKey: Column,
                                    k: Int): DataFrame = {
    val pairs = df.select((groupCols :+ valCol).map(col): _*).distinct()
    val entry = struct(orderKey.as("k"), col(valCol).as("r"))
    pairs.groupBy(groupCols.map(col): _*)
      .agg(graft.plans.BoundedTopKAgg.bounded_top_k(entry, k, reverse = false)
        .as("__tk__"))
      .select(groupCols.map(col) :+
        posexplode(col("__tk__")).as(Seq("__pos__", "__e__")): _*)
      .select(groupCols.map(col) :+ (col("__pos__") + 1).as("__dr__") :+
        col("__e__.r").as(valCol): _*)
  }

  /** Cap each class at n rows (dataframe.py:3314-3325). */
  def sampleClassByMaxValues(df: DataFrame, classCol: String, n: Int,
                             seed: Long): DataFrame =
    capRowsPerClass(df, classCol, n,
      xxhash64(struct(df.columns.map(col): _*), lit(seed)))

  /** Global distinct-value cap via semi-join against a sampled distinct
    * list (dataframe.py:3278-3297). */
  def sampleColumnByMaxUniqValues(df: DataFrame, valCol: String, maxUniq: Int,
                                  seed: Long): DataFrame = {
    val keep = df.select(valCol).distinct()
      .orderBy(xxhash64(col(valCol), lit(seed))).limit(maxUniq)
    df.join(broadcast(keep), Seq(valCol), "left_semi")
  }

  /** Global distinct-value cap, md5-ranked — same semantics as
    * `sampleColumnByMaxUniqValues` but the value ranking is reproducible
    * in any engine with md5 (the DuckDB-differential gate's variant). */
  def sampleColumnByMaxUniqValuesPortable(df: DataFrame, valCol: String,
                                          maxUniq: Int,
                                          seedStr: String = "0"): DataFrame = {
    val keep = df.select(valCol).distinct()
      .orderBy(md5(portableKeyMaterial(Seq(col(valCol)), seedStr)), col(valCol))
      .limit(maxUniq)
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

  /**
   * Corpus mixing for training-data pipelines (beyond-parity): given a
   * corpus tagged by `sourceCol` and target mixing `weights`, downsample
   * each source so the output approximates the weight proportions at the
   * largest achievable total WITHOUT upsampling: with c = min_i(n_i/w_i),
   * each source keeps ~c*w_i rows — the binding source passes whole,
   * every other source hash-gates down. Sources absent from `weights`
   * (weight 0) drop entirely.
   *
   * Determinism/scale: per-source keep rates are computed driver-side
   * from one groupBy count (the number of SOURCES is small by contract —
   * the rows are not collected); the row gate is the portable md5 hash of
   * `keyCols`, so decisions are stable across runs, partitionings and
   * engines, and the corpus is filtered in a single scan with a broadcast
   * threshold join — no shuffle, no sort, no per-source pass.
   */
  def mixBySource(df: DataFrame, sourceCol: String,
                  weights: Map[String, Double], keyCols: Seq[String],
                  seedStr: String = "0"): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    weights.foreach { case (s, w) =>
      require(w > 0, s"mixing weight must be positive: $s -> $w") }
    val counts = classCounts(df, sourceCol)
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    if (present.isEmpty) return df.limit(0)
    val c = present.map { case (s, w) => counts(s) / w }.min
    val rates = present.map { case (s, w) =>
      (s, math.min(1.0, c * w / counts(s))) }.toSeq
    gateByClassRates(df, sourceCol, rates, keyCols, seedStr)
  }

  /**
   * Temperature / alpha-flattening sampler (beyond-parity; the
   * multilingual "alpha sampling" rule): downsample each class so
   * effective sizes follow n_c^alpha instead of n_c — alpha = 1 keeps
   * the natural distribution, alpha = 0 flattens toward uniform. Keep
   * rate per class is (n_min/n_c)^(1-alpha): the smallest class passes
   * whole (no upsampling), larger classes thin toward it, and the
   * retained size n_c*(n_min/n_c)^(1-alpha) = n_min^(1-alpha)*n_c^alpha
   * is proportional to n_c^alpha as required. Same driver-side-rates +
   * portable md5 row gate shape as `mixBySource`.
   */
  def flattenClasses(df: DataFrame, classCol: String, alpha: Double,
                     keyCols: Seq[String], seedStr: String = "0"): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1]: $alpha")
    val counts = classCounts(df, classCol)
    if (counts.isEmpty) return df.limit(0)
    val nMin = counts.values.min.toDouble
    val rates = counts.map { case (cls, n) =>
      (cls, math.pow(nMin / n, 1.0 - alpha))
    }.toSeq
    gateByClassRates(df, classCol, rates, keyCols, seedStr)
  }

  /** Per-class row counts, collected to the driver — the number of
    * CLASSES is small by contract, never the rows. */
  private def classCounts(df: DataFrame, classCol: String): Map[String, Long] =
    df.groupBy(col(classCol).cast(StringType).as("__cls__"))
      .agg(count(lit(1)).as("__n__"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .toMap

  /** One-scan per-class Bernoulli gate: broadcast (class -> keep rate)
    * thresholds over the md5 32-bit fraction space (floor() at the edge
    * matches the SQL-oracle arithmetic bit for bit); classes without a
    * rate drop. */
  private def gateByClassRates(df: DataFrame, classCol: String,
                               rates: Seq[(String, Double)],
                               keyCols: Seq[String], seedStr: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thr = broadcast(rates.map { case (s, r) =>
      (s, math.floor(r * 4294967296.0).toLong) }.toDF("__cls__", "__thr__"))
    val hash32 = conv(substring(
        md5(portableKeyMaterial(keyCols.map(col), seedStr)), 1, 8), 16, 10)
      .cast(LongType)
    df.join(thr, col(classCol).cast(StringType) === col("__cls__"))
      .filter(hash32 < col("__thr__"))
      .drop("__cls__", "__thr__")
  }

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
                                     seedStr: String = "0"): DataFrame =
    capRowsPerClass(df, classCol, n,
      md5(portableKeyMaterial(df.columns.map(col).toSeq, seedStr)))

  // ===== weighted sampling without replacement (A-ES) =====
  // Efraimidis & Spirakis 2006: give each row the key u^(1/w) for a
  // per-row uniform u in (0,1); the n LARGEST keys are an exact weighted
  // sample without replacement (inclusion intuition: a heavier w pulls
  // the key toward 1). The training-pipeline use is "keep n documents,
  // quality-weighted". One global bounded top-n
  // (TakeOrderedAndProject: per-partition heaps + driver merge of n),
  // no shuffle of the data itself; u derives from a seeded hash, so the
  // sample is deterministic and re-runnable.

  /** The 32-bit md5 fraction in [0, 1): exact in both engines — the
    * integer is < 2^32 and the division is by a power of two. */
  private def md5Fraction(keys: Seq[Column], seedStr: String): Column =
    conv(substring(md5(portableKeyMaterial(keys, seedStr)), 1, 8), 16, 10)
      .cast(DoubleType) / lit(4294967296.0)

  /** Exactly-n weighted sample without replacement. Rows with a null,
    * zero, or negative weight are excluded (A-ES is defined for w > 0).
    * `pow` is engine-dependent in its last ulp — use
    * [[weightedSampleNPortable]] when a SQL-oracle-exact variant is
    * needed. */
  def weightedSampleN(df: DataFrame, n: Int, weight: Column,
                      keyCols: Seq[String], seedStr: String = "0"): DataFrame = {
    require(n >= 0, s"n must be >= 0: $n")
    val u = md5Fraction(keyCols.map(col), seedStr)
    val key = pow(u, lit(1.0) / weight.cast(DoubleType))
    df.filter(weight.isNotNull && weight.cast(DoubleType) > 0)
      .withColumn("__aes__", key)
      .orderBy(col("__aes__").desc, struct(keyCols.map(col): _*))
      .limit(n)
      .drop("__aes__")
  }

  /**
   * Cross-engine-exact variant for POWER-OF-TWO weights: u^(1/2^k) is k
   * applications of sqrt, and IEEE sqrt is correctly rounded in every
   * engine — so the selected set reproduces bit-for-bit in the DuckDB
   * oracle, unlike a `pow`-computed key. Weights outside
   * {1, 2, 4, ..., 2^maxLog2} raise at runtime (silent fallback would
   * quietly change the distribution).
   */
  def weightedSampleNPortable(df: DataFrame, n: Int, weight: Column,
                              keyCols: Seq[String], seedStr: String = "0",
                              maxLog2: Int = 8): DataFrame = {
    require(n >= 0, s"n must be >= 0: $n")
    require(maxLog2 >= 0 && maxLog2 <= 30, s"maxLog2 out of range: $maxLog2")
    val u = md5Fraction(keyCols.map(col), seedStr)
    val w = weight.cast(LongType)
    val key = (0 to maxLog2).foldLeft(
      when(lit(false), lit(0.0))) { (acc, k) =>
        acc.when(w === (1L << k),
          (0 until k).foldLeft(u)((e, _) => sqrt(e)))
      }.otherwise(raise_error(concat(
        lit(s"weightedSampleNPortable: weight must be a power of two <= ${1L << maxLog2}, got "),
        w.cast(StringType))))
    df.filter(weight.isNotNull)
      .withColumn("__aes__", key)
      .orderBy(col("__aes__").desc, struct(keyCols.map(col): _*))
      .limit(n)
      .drop("__aes__")
  }
}
