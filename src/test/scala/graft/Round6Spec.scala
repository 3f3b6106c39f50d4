package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Round-6 laws: every per-group `row_number` window rewritten to a
 * bounded-heap / max_by aggregate must return the window plan's exact
 * result (ties, nulls, both orders), and NO correctness gate may plan a
 * window partitioned by a data-cardinality column outside the audited
 * whitelist.
 */
class Round6Spec extends SparkTestBase {
  import spark.implicits._

  private def multiset(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  // ===== plan audit over every gate =====

  /** Gates whose plans legitimately contain a window, with why. Anything
    * else planning a Window node is a scale regression and fails here. */
  private val windowWhitelist: Map[String, String] = Map(
    "q_asof_join" ->
      "last-value carry within the join-key partition is the as-of merge itself",
    "q_sessionize_batch" ->
      "lag/cumsum within the session entity key — per-entity event streams, bounded by contract",
    "q_cumulative_sum" ->
      "per-entity running sums: window keyed by the caller's entity column, bounded per entity by contract (the GLOBAL path is a distributed prefix sum, no window)",
    "q_cumsum_global" ->
      "distributed prefix sum: its only window is keyed by the BOUNDED physical partition id (one partition per task), never a data column",
    "q_graph_time_forward" ->
      "ancestor-closure dominance prune, state bounded per (node, ancestor) pair",
    "q_graph_forward_edges" ->
      "ancestor-closure dominance prune, state bounded per (node, ancestor) pair",
    "q_fuzz_36" ->
      "window-fuzz per-entity cumsum: window keyed by o_custkey (per-customer running totals, entity-bounded by contract)",
    "q_fuzz_39" ->
      "window-fuzz per-entity cumsum: window keyed by o_custkey (per-customer running totals, entity-bounded by contract)",
    "q_fuzz_42" ->
      "window-fuzz per-entity cumsum: window keyed by o_custkey (per-customer running totals, entity-bounded by contract)",
    "q_fuzz_37" ->
      "window-fuzz GLOBAL cumsum: distributed prefix sum, window keyed by the BOUNDED physical partition id only",
    "q_fuzz_40" ->
      "window-fuzz GLOBAL cumsum: distributed prefix sum, window keyed by the BOUNDED physical partition id only",
    "q_fuzz_43" ->
      "window-fuzz GLOBAL cumsum: distributed prefix sum, window keyed by the BOUNDED physical partition id only",
    "q_fuzz_60" ->
      "asof-fuzz: last-value carry within the join-key partition is the as-of merge itself (same shape as q_asof_join)",
    "q_fuzz_61" ->
      "asof-fuzz: last-value carry within the join-key partition is the as-of merge itself (same shape as q_asof_join)",
    "q_fuzz_62" ->
      "asof-fuzz: last-value carry within the join-key partition is the as-of merge itself (same shape as q_asof_join)",
    "q_fuzz_63" ->
      "asof-fuzz: last-value carry within the join-key partition is the as-of merge itself (same shape as q_asof_join)",
    "q_fuzz_64" ->
      "sessionize-fuzz: lag/cumsum within the session entity key — per-entity event streams, bounded by contract (same shape as q_sessionize_batch)",
    "q_fuzz_65" ->
      "sessionize-fuzz: lag/cumsum within the session entity key — per-entity event streams, bounded by contract (same shape as q_sessionize_batch)",
    "q_fuzz_66" ->
      "sessionize-fuzz: lag/cumsum within the session entity key — per-entity event streams, bounded by contract (same shape as q_sessionize_batch)",
    "q_fuzz_67" ->
      "sessionize-fuzz: lag/cumsum within the session entity key — per-entity event streams, bounded by contract (same shape as q_sessionize_batch)",
    "q_dup_spans" ->
      "span merge: lag/cumsum keyed by doc_id — per-document marked positions, bounded by doc length (the gram-dup test itself is a capped groupBy, not a window)",
    "q_strip_spans" ->
      "span merge inside duplicatedNgramSpans (per-doc lag/cumsum, doc-length-bounded); the strip is HOF column exprs, no further window",
    "q_fuzz_71" ->
      "span-fuzz: per-doc lag/cumsum span merge, doc-length-bounded (same shape as q_dup_spans)"
  )

  test("plan audit: no gate windows outside the audited whitelist") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    // a gate whose plan won't even ANALYZE must fail this audit by name,
    // not abort the suite and mask regressions in the other 142 gates
    val broken = scala.collection.mutable.ListBuffer.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        scala.util.Try(q(spark, dir).queryExecution.optimizedPlan.toString) match {
          case scala.util.Failure(e) =>
            broken += s"$name (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)})"
            None
          case scala.util.Success(plan) =>
            if (plan.contains("windowspecdefinition") && !windowWhitelist.contains(name))
              Some(name)
            else None
        }
    }
    assert(broken.isEmpty, s"gates whose plan failed to analyze: $broken")
    assert(offenders.isEmpty,
      s"gates planning an unaudited window (straggler risk at scale): $offenders")
  }

  // ===== electRepresentative: aggregate == window =====

  test("law: electRepresentative agg == window; ties, null scores, string ids") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 3000).map { i =>
      (s"c${rnd.nextInt(5)}",
       if (rnd.nextInt(8) == 0) null else Integer.valueOf(rnd.nextInt(4)), // heavy ties
       i.toLong, s"p$i")
    }
    val base = spark.createDataFrame(rows).toDF("cluster", "score", "id", "payload")
    // one cluster with ONLY null scores — the window's nulls-last edge —
    // and one with a Long.MinValue id tie, where a long-space negation
    // would overflow back to MinValue and invert the tie ordering
    val allNull = Seq(("cnull", null.asInstanceOf[Integer], 9001L, "x"),
      ("cnull", null.asInstanceOf[Integer], 9000L, "y"),
      ("cmin", Integer.valueOf(1), Long.MinValue, "m"),
      ("cmin", Integer.valueOf(1), 5L, "n"))
    val df = base.union(spark.createDataFrame(allNull)
      .toDF("cluster", "score", "id", "payload"))

    def viaWindow(d: DataFrame, idCol: String): DataFrame = {
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("score").desc, col(idCol).asc)
      d.withColumn("__rn__", row_number().over(w))
        .filter(col("__rn__") === 1).drop("__rn__")
    }

    // numeric-id (max_by) path
    val agg = operators.Dedup.electRepresentative(df, "cluster", "score", "id")
    assert(multiset(agg) == multiset(viaWindow(df, "id")))
    assert(!agg.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"),
      "numeric-id election must not plan a window")

    // string-id (bounded-heap) fallback path
    val sdf = df.withColumn("id", concat(lit("id"), format_string("%05d", col("id"))))
    val aggS = operators.Dedup.electRepresentative(sdf, "cluster", "score", "id")
    assert(multiset(aggS) == multiset(viaWindow(sdf, "id")))
    assert(!aggS.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"),
      "string-id election must not plan a window")
  }

  // ===== class row caps: aggregate == window =====

  test("law: sampleClassByMaxValues(+Portable) agg == window selection") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map { i =>
      (if (i < 3500) "dominant" else s"c${rnd.nextInt(4)}", i.toLong, rnd.nextInt(100))
    }
    val df = spark.createDataFrame(rows).toDF("cls", "id", "v")
    for (n <- Seq(1, 7, 120)) {
      val viaAgg = core.Sampling.sampleClassByMaxValues(df, "cls", n, seed = 42)
      val w = Window.partitionBy(col("cls"))
        .orderBy(xxhash64(struct(df.columns.map(col): _*), lit(42L)))
      val viaWin = df.withColumn("__rn__", row_number().over(w))
        .filter(col("__rn__") <= n).drop("__rn__")
      assert(multiset(viaAgg) == multiset(viaWin), s"n=$n")
      assert(!viaAgg.queryExecution.optimizedPlan.toString
        .contains("windowspecdefinition"))

      val viaAggP = core.Sampling.sampleClassByMaxValuesPortable(df, "cls", n)
      assert(viaAggP.count() ==
        df.select("cls").distinct().collect().map { r =>
          math.min(n, df.filter(col("cls") === r.getString(0)).count())
        }.sum, s"portable n=$n row count")
    }
  }

  // ===== distinct-value caps: pair-rank join == dense_rank window =====

  test("law: sampleGroupByMaxUniqValues agg == dense_rank window, null keys included") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 3000).map { i =>
      (if (rnd.nextInt(20) == 0) null else s"g${rnd.nextInt(3)}",
       if (rnd.nextInt(15) == 0) null else s"v${rnd.nextInt(40)}",
       i)
    }
    val df = spark.createDataFrame(rows).toDF("g", "v", "payload")
    for (cap <- Seq(1, 5, 25)) {
      val viaAgg = core.Sampling.sampleGroupByMaxUniqValues(df, Seq("g"), "v", cap, 17L)
      val w = Window.partitionBy(col("g"))
        .orderBy(xxhash64(col("v"), lit(17L)), col("v"))
      val viaWin = df.withColumn("__dr__", dense_rank().over(w))
        .filter(col("__dr__") <= cap).drop("__dr__")
      assert(multiset(viaAgg) == multiset(viaWin), s"cap=$cap")
      assert(!viaAgg.queryExecution.optimizedPlan.toString
        .contains("windowspecdefinition"))
    }
  }

  test("law: sampleGroupByMaxUniqValuesPerClass agg == dense_rank window") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 3000).map { i =>
      (s"g${rnd.nextInt(3)}", s"k${rnd.nextInt(3)}",
       if (rnd.nextInt(15) == 0) null else s"v${rnd.nextInt(30)}", i)
    }
    val df = spark.createDataFrame(rows).toDF("g", "cls", "v", "payload")
    def viaWindow(capExprOf: DataFrame => org.apache.spark.sql.Column,
                  d: DataFrame): DataFrame = {
      val key = concat_ws("\u0001",
        coalesce(col("v").cast("string"), lit("\u0000")), lit("0"))
      val w = Window.partitionBy(col("g")).orderBy(md5(key), col("v"))
      d.withColumn("__dr__", dense_rank().over(w))
        .filter(col("__dr__") <= capExprOf(d)).drop("__dr__")
    }
    // mapped caps + finite default
    val a1 = core.Sampling.sampleGroupByMaxUniqValuesPerClass(
      df, Seq("g"), "cls", "v", Map("k0" -> 2, "k1" -> 7), defMaxUniq = Some(4))
    val w1 = viaWindow(_ => when(col("cls") === "k0", 2)
      .when(col("cls") === "k1", 7).otherwise(4), df)
    assert(multiset(a1) == multiset(w1), "finite default")
    assert(!a1.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"))
    // unlimited default: unmapped classes keep every value
    val a2 = core.Sampling.sampleGroupByMaxUniqValuesPerClass(
      df, Seq("g"), "cls", "v", Map("k0" -> 3), defMaxUniq = None)
    val w2 = viaWindow(_ => when(col("cls") === "k0", 3)
      .otherwise(Int.MaxValue), df)
    assert(multiset(a2) == multiset(w2), "unlimited default")
  }

  // ===== similarity top-k tails =====

  test("law: similarity top-k agg tail == window tail; no window planned") {
    val rnd = new scala.util.Random(23)
    val corpus = (0 until 400).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = (0 until 5).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("query_id", "embedding")
    val topk = operators.Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", "query_id", k = 7)
    assert(!topk.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"),
      "top-k tail must be the bounded-heap aggregate, not a window")
    // window reference, built inline
    val q = broadcast(queries.select(col("query_id"), col("embedding").as("__qvec__")))
    val scored = corpus.select(col("vec_id"), col("embedding").as("__cvec__"))
      .crossJoin(q)
      .withColumn("cosine", operators.Similarity.cosine(col("__cvec__"), col("__qvec__")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val ref = scored.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= 7)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
    assert(multiset(topk) == multiset(ref))
  }

  // ===== collapse=false: agg+join-back == per-group window =====

  test("law: aggregate(collapse=false) join-back == window, null keys included") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 3000).map { i =>
      (if (rnd.nextInt(20) == 0) null else s"g${rnd.nextInt(3)}",
       rnd.nextInt(100), i)
    }
    val df = spark.createDataFrame(rows).toDF("g", "v", "payload")
    val viaAgg = core.XDF(df)
      .aggregate(Seq("g"), Seq("v", "v"), Seq("sum", "count"), collapse = false)
    // identical AggRegistry expressions, window plan (the old physical shape)
    val w = Window.partitionBy(col("g"))
    val viaWin = df
      .withColumn("v:sum", core.AggRegistry.expr("sum", col("v")).over(w))
      .withColumn("v:count", core.AggRegistry.expr("count", col("v")).over(w))
    assert(multiset(viaAgg.toDF) == multiset(viaWin))
    assert(!viaAgg.toDF.queryExecution.optimizedPlan.toString
      .contains("windowspecdefinition"),
      "collapse=false must not plan a per-group window")
    // empty group cols keep the (global-window) replacement path
    val global = core.XDF(df).aggregate(Nil, Seq("v"), Seq("sum"), collapse = false)
    assert(global.toDF.select("v:sum").distinct().count() == 1)
  }

  // ===== global cumulative sum: prefix sum == unpartitioned window =====

  test("law: global cumulativeSum prefix-sum == window, leading nulls included") {
    val rnd = new scala.util.Random(37)
    val rows = (0 until 3000).map { i =>
      // leading rows all-null in the value col: the running total must
      // stay null until the first non-null value, exactly like the window
      (i, if (i < 40 || rnd.nextInt(10) == 0) null
          else java.lang.Double.valueOf(rnd.nextInt(1000) / 10.0))
    }
    val df = spark.createDataFrame(rows).toDF("ord", "v")
      .repartition(7) // scrambled input: the operator must sort
    val viaPrefix = core.XDF(df)
      .cumulativeSum("v", "rt", orderCols = Seq("ord"))
      .toDF.select(col("ord"), round(col("rt"), 6).as("rt"))
    val w = Window.orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWin = df
      .withColumn("rt", sum(col("v").cast("double")).over(w))
      .select(col("ord"), round(col("rt"), 6).as("rt"))
    assert(multiset(viaPrefix) == multiset(viaWin))
    // and the plan's only window is keyed by the bounded partition id
    val plan = core.XDF(df).cumulativeSum("v", "rt", Seq("ord"))
      .toDF.queryExecution.optimizedPlan.toString
    assert(!raw"windowspecdefinition\((ord|v)#".r.findFirstIn(plan).isDefined,
      s"global running sum must not window over data columns:\n${plan.take(500)}")
  }

  // ===== pseudo-array predicates over flattened JSON =====

  test("array predicates consume pivoted explode_json output") {
    val rows = Seq(
      (1L, """{"items":[{"n":"a"},{"n":"b"}]}"""),
      (2L, """{"items":[{"n":"c"}]}"""),
      (3L, """{"items":[]}""")).toDF("id", "payload")
    val flat = core.JsonFlattener.explodeJson(rows, "payload", "j")
    // fan-out positions -> the reference's positional slot convention
    val slots = flat.groupBy("id")
      .pivot("j:items:__explode_json_index__", Seq(0, 1))
      .agg(first(col("j:items:n")))
      .withColumnRenamed("0", "item[0].n")
      .withColumnRenamed("1", "item[1].n")
    val hasB = core.XDF(slots).nestedArrayValueExists("item[].n", "b")
      .toDF.select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(hasB == Seq(1L))
    // bare positional form: rename to item[i] and match any slot
    val bare = slots
      .withColumnRenamed("item[0].n", "item[0]")
      .withColumnRenamed("item[1].n", "item[1]")
    val hasC = core.XDF(bare).arrayValueExists("item", "c")
      .toDF.select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(hasC == Seq(2L))
    // substring find + no-match validation
    val found = core.XDF(bare).arrayValueFind("item", "a")
      .toDF.select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(found == Seq(1L))
    intercept[IllegalArgumentException] {
      core.XDF(bare).arrayMatches("nosuch", _.isNotNull)
    }
    // slot names survive the whole name-algebra surface, not just select:
    // sort and reorder must treat `[`/`.` names verbatim too
    val sorted = core.XDF(slots).sort(Seq("item[0].n"), reverse = true)
      .reorder("item[1].n").toDF
    assert(sorted.columns.head == "item[1].n")
    assert(sorted.select("id").head().getLong(0) == 2L) // "c" sorts last desc... "c" > "a"
  }

  test("array predicate OR-fold pushes down to the parquet scan") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        col("o_orderpriority").as("slot[0]"),
        col("o_orderstatus").as("slot[1]"))
    val plan = core.XDF(df).arrayValueExists("slot", "F")
      .toDF.queryExecution.executedPlan.toString
    // the alias-projected OR predicate must reach the scan as a single
    // pushed filter over the source columns, with the read schema pruned
    assert(plan.contains("PushedFilters: [Or(EqualTo(o_orderpriority,F),EqualTo(o_orderstatus,F))]")
      || plan.contains("PushedFilters: [Or(EqualTo(o_orderstatus,F),EqualTo(o_orderpriority,F))]"),
      s"OR-fold not pushed:\n${plan.take(600)}")
  }

  // ===== reference API parity census =====

  test("every reference dataframe verb resolves same-name (minus documented N/A)") {
    val refPath = java.nio.file.Paths.get(
      "/root/reference/python-packages/core/src/omigo_core/dataframe.py")
    assume(java.nio.file.Files.exists(refPath))
    val ref = new String(java.nio.file.Files.readAllBytes(refPath))
    val refVerbs = raw"(?m)^    def ([a-z_0-9]+)\(self".r
      .findAllMatchIn(ref).map(_.group(1)).filterNot(_.startsWith("__")).toSet
    def defs(path: String): Set[String] = {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)))
      raw"def `?([A-Za-z_0-9]+)`?[\(:\[]".r.findAllMatchIn(s).map(_.group(1)).toSet
    }
    val ours = defs("src/main/scala/graft/compat/package.scala") ++
      defs("src/main/scala/graft/core/XDF.scala")
    // permanent N/A in a JVM engine: pandas bridge, clipboard, Python
    // dynamic class extension (toTuples/toMaps/fromMaps are the JVM forms)
    val na = Set("to_pandas_df", "export_to_df", "to_clipboard",
      "extend_class", "extend_external_class")
    val missing = (refVerbs -- na).filterNot(ours.contains)
    assert(missing.isEmpty,
      s"reference verbs without a same-name call: ${missing.toSeq.sorted}")
  }

  // ===== native IVF cell assignment =====

  test("law: NearestCellsExpression == reference scala argmin, float and double") {
    val rnd = new scala.util.Random(29)
    val centers = Array.fill(6)(Array.fill(5)(rnd.nextGaussian()))
    def refNearest(v: Array[Double], n: Int): Seq[Int] =
      centers.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.sortBy(_._1).take(n).map(_._2).toSeq
    val vecs = (0 until 200).map(i => (i, Array.fill(5)(rnd.nextGaussian())))
    // double input
    val dfD = vecs.toDF("id", "vec")
    for (n <- Seq(1, 3, 6)) {
      val got = dfD.select(col("id"),
          graft.plans.NearestCellsExpression.nearest_cells(col("vec"), centers, n).as("cells"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { case (i, v) =>
        assert(got(i) == refNearest(v, n), s"id=$i n=$n") }
    }
    // float input (the embeddings table's element type)
    val dfF = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("id", "vec")
    val gotF = dfF.select(col("id"),
        graft.plans.NearestCellsExpression.nearest_cells(col("vec"), centers, 2).as("cells"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (i, v) =>
      assert(gotF(i) == refNearest(v.map(_.toFloat.toDouble), 2), s"float id=$i") }
    // distance ties resolve to the lower cell index
    val tied = Seq((0, Array(0.0, 0.0, 0.0, 0.0, 0.0))).toDF("id", "vec")
    val eq = Array(Array(1.0, 0.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0, 0.0))
    val t = tied.select(graft.plans.NearestCellsExpression
      .nearest_cells(col("vec"), eq, 2).as("c")).head().getSeq[Int](0)
    assert(t == Seq(0, 1))
  }
}
