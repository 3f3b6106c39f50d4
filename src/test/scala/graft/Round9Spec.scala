package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/**
 * Round-9 plan audits: scans must keep their pushdown. The window audit
 * (Round6Spec) freezes the shuffle story; this freezes the SCAN story —
 * a gate that filters a parquet read must show those filters in
 * `PushedFilters`, a gate that projects must show a pruned `ReadSchema`,
 * and the date-partitioned scan must prune partitions. At 100 TB these
 * are the difference between reading terabytes and reading everything;
 * any regression fails here by gate name.
 */
class Round9Spec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // AQE wraps the physical plan in AdaptiveSparkPlanExec, whose collect
  // does not descend into the wrapped plan — unwrap every adaptive
  // layer. A persist() similarly hides its child scan inside an
  // InMemoryRelation (q_dup_spans' gram frame); descend into the cached
  // plan so the pushdown/pruning assertions still see the parquet read.
  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(m.relation.cachedPlan)
        case f: FileSourceScanExec    => Seq(f)
      }.flatten
    walk(df.queryExecution.executedPlan)
  }

  private def gateScans(name: String): Seq[FileSourceScanExec] =
    fileScans(SparkEntry.queries(name)(spark, dir))

  /** gate -> (column that must appear in PushedFilters,
    *          superset of data columns the scan may read) */
  private val scanExpectations: Seq[(String, Option[String], Set[String])] = Seq(
    ("q_filter_gt_float", Some("l_quantity"),
      Set("l_orderkey", "l_linenumber", "l_quantity")),
    ("q_filter_in", Some("o_orderpriority"),
      Set("o_orderkey", "o_orderpriority")),
    ("q_filter_eq_str", Some("c_mktsegment"),
      Set("c_custkey", "c_name", "c_mktsegment")),
    ("q_filter_range", Some("l_shipdate"),
      Set("l_orderkey", "l_linenumber", "l_shipdate")),
    // prune-only gates: no scan-translatable filter, but the projection
    // must reach the reader — 2 of part's 9 cols, 4 of lineitem's 16
    ("q_select", None, Set("p_partkey", "p_name")),
    ("q_select_regex", None,
      Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")),
    // the 1000 synthesized wide columns derive from 4 source columns;
    // the scan must read only those 4
    ("q_wide_cols", None,
      Set("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),
    // single-key derivation gates: everything computes from o_orderkey,
    // so the orders scan must read exactly that one column
    ("q_ipv4_hex", None, Set("o_orderkey")),
    ("q_duration_roundtrip", None, Set("o_orderkey")),
    // the xpath filter itself is not scan-translatable (get_json_object
    // over a computed column), but the projection must still prune
    ("q_filter_json_xpath", None,
      Set("o_orderkey", "o_orderpriority", "o_custkey")),
    // two-table range join: the allowed set is the union of both sides'
    // live columns (names are disjoint per table, so the bound is still
    // tight per scan); the quantity filter must reach the lineitem scan
    ("q_range_join_point", Some("l_quantity"),
      Set("o_orderkey", "o_orderdate", "o_orderpriority", "o_custkey",
        "l_orderkey", "l_linenumber", "l_quantity", "l_partkey", "l_shipdate")),
    // the event_type filters must reach the events scan (both branches),
    // and only 4 of events' 6 columns may be read
    ("q_interval_join_batch", Some("event_type"),
      Set("event_id", "user_id", "event_type", "ts")),
    ("q_zorder_value", None,
      Set("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),
    ("q_hll_distinct_union", None,
      Set("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey")),
    // round-9d sketch/shard/span gates: 4 of orders' 9 cols for the
    // theta rollup; the kll mod-filter is not scan-translatable but its
    // projection prunes to 4 of lineitem's 16; shards derive from the
    // single id column; span gates read exactly (doc_id, text)
    ("q_theta_overlap", None,
      Set("o_orderdate", "o_custkey", "o_orderpriority", "o_orderstatus")),
    ("q_kll_quantiles", None,
      Set("l_returnflag", "l_shipdate", "l_extendedprice", "l_orderkey")),
    ("q_shard_assign", None, Set("o_orderkey")),
    ("q_dup_spans", None, Set("doc_id", "text")),
    ("q_strip_spans", None, Set("doc_id", "text"))
  )

  test("plan audit: filter pushdown + column pruning reach the parquet scan") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val problems = scanExpectations.flatMap { case (gate, pushedCol, allowedCols) =>
      val scans = gateScans(gate)
      if (scans.isEmpty) Seq(s"$gate: no FileSourceScanExec in executed plan")
      else {
        val pushErr = pushedCol.flatMap { c =>
          val hit = scans.exists(_.metadata.get("PushedFilters").exists { pf =>
            pf != "[]" && pf.contains(c)
          })
          if (hit) None
          else Some(s"$gate: no pushed filter on '$c' " +
            s"(PushedFilters=${scans.map(_.metadata.getOrElse("PushedFilters", "?")).mkString("; ")})")
        }
        // every scan the gate plans must read only allowed data columns
        // (identity: the gate reads ONE table; tmp-dir side reads none)
        val pruneErr = scans.flatMap { s =>
          val read = s.requiredSchema.fieldNames.toSet
          if (read.subsetOf(allowedCols)) None
          else Some(s"$gate: scan reads unpruned columns ${read -- allowedCols} " +
            s"(ReadSchema=${read.toSeq.sorted.mkString(",")})")
        }
        pushErr.toSeq ++ pruneErr
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  // ===== schema-from-data probes are capped =====
  // Both discovery paths (explodeMaps' key union, explode_json's inferred
  // schema) must refuse a pathological key space instead of OOMing the
  // driver; the error names the declared-schema alternative.

  test("explodeMaps refuses a key space wider than maxKeys") {
    import spark.implicits._
    val df = (0 until 50).toDF("i")
    val ex = intercept[IllegalStateException] {
      graft.core.Reshape.explodeMaps(df, Seq("i"),
        m => Seq((0 until 5).map(j => s"k${m("i")}_$j" -> "1").toMap),
        "e", maxKeys = 100).count()
    }
    assert(ex.getMessage.contains("explodeRows"))
    // under the cap, the same generator runs: 50 rows, 250 columns
    val ok = graft.core.Reshape.explodeMaps(df, Seq("i"),
      m => Seq((0 until 5).map(j => s"k${m("i")}_$j" -> "1").toMap),
      "e", maxKeys = 250)
    assert(ok.columns.length == 250 && ok.count() == 50)
  }

  test("explode_json inference refuses a payload wider than maxFields") {
    import spark.implicits._
    val wide = (0 until 200).map(i => s""""k$i":1""").mkString("{", ",", "}")
    val df = Seq(wide).toDF("js")
    val ex = intercept[IllegalStateException] {
      graft.core.JsonFlattener.inferSchema(df, "js", maxFields = 100)
    }
    assert(ex.getMessage.contains("schema="))
    assert(graft.core.JsonFlattener.inferSchema(df, "js", maxFields = 200)
      .fields.length == 200)
  }

  test("plan audit: TSV read prunes columns through the url_decode projection") {
    // Data filters cannot push into this scan — every cell is URL-decoded
    // at read time, and a filter over a value-transforming codec is not
    // scan-evaluable by construction. Column PRUNING must still reach the
    // csv reader: a 2-column projection + 1-column filter over the
    // 6-column orders table may read exactly those 3 columns.
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val tmp = graft.core.TempDirs.scratch("graft_tsvaudit")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    graft.sources.TsvIO.write(orders, s"$tmp/orders")
    val df = graft.sources.TsvIO.readWithFilterTransform(spark,
      Seq(s"$tmp/orders"),
      cols = Seq("o_orderkey", "o_orderpriority"),
      filterCond = org.apache.spark.sql.functions.col("o_orderstatus") === "F")
    val scans = fileScans(df)
    assert(scans.nonEmpty, "no file scan planned for the TSV read")
    val read = scans.flatMap(_.requiredSchema.fieldNames).toSet
    val allowed = Set("o_orderkey", "o_orderpriority", "o_orderstatus")
    assert(read.subsetOf(allowed),
      s"TSV scan reads unpruned columns ${read -- allowed} — the decode " +
        s"projection must not defeat column pruning (read=$read)")
    assert(df.count() > 0)
  }

  // ===== broadcast-Bloom decontamination =====

  test("bloom probe: no false negatives, build/probe hashing symmetric") {
    import spark.implicits._
    val members = (0 until 1000).map(i => s"gram_member_$i")
    val bf = graft.operators.Dedup.buildGramBloom(
      members.toDF("g"), "g", expectedItems = 1000, fpp = 0.001)
    val bc = spark.sparkContext.broadcast(bf)
    // every put value must probe true — a false negative would let a
    // contaminated doc survive decontaminateBloom
    val memberHits = members.toDF("g")
      .filter(graft.plans.BloomMightContain.might_contain(
        org.apache.spark.sql.functions.col("g"), bc))
      .count()
    assert(memberHits == 1000L, s"false negatives: only $memberHits/1000 probed true")
    // non-members mostly fail (fpp 0.001 over 1000 probes: a handful at
    // most — 50 is a >10-sigma bound; deterministic for fixed inputs)
    val fpHits = (0 until 1000).map(i => s"other_value_$i").toDF("g")
      .filter(graft.plans.BloomMightContain.might_contain(
        org.apache.spark.sql.functions.col("g"), bc))
      .count()
    assert(fpHits < 50, s"bloom passes non-members far above fpp: $fpHits/1000")
  }

  test("law: decontaminateBloom == decontaminate at any fpp") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val eval = docs.filter(col("doc_id") % 37 === 0)
    val exact = graft.operators.Dedup
      .decontaminate(docs, "doc_id", "text", eval, "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // fpp 0.5 floods the confirm join with false positives; 0.01 starves
    // it — the answer must not move either way
    for (fpp <- Seq(0.5, 0.01)) {
      val bloomed = graft.operators.Dedup
        .decontaminateBloom(docs, "doc_id", "text", eval, "text", n = 3,
          fpp = fpp)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(bloomed.sameElements(exact),
        s"fpp=$fpp: bloom path diverged (${bloomed.length} vs ${exact.length} rows)")
    }
  }

  test("plan audit: bloom probe runs before the confirm join") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val df = SparkEntry.queries("q_decontaminate_bloom")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      "q_decontaminate_bloom plans no bloom_might_contain probe — the " +
        "pre-filter fell out of the plan")
  }

  // ===== Misra-Gries heavy hitters =====

  test("law: freq_items_mg exact regime == groupBy count, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 20000).map(_ => s"k${rnd.nextInt(40)}")
    val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("k").repartition(parts)
      val got = graft.plans.FreqItemsAgg.heavyHitters(df, "k", capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == exact, s"parts=$parts: MG diverged from exact counts")
    }
  }

  test("law: freq_items_mg approximation bounds (capacity 4, skewed stream)") {
    import spark.implicits._
    // n = 10000: hot x5000, warm x3000, 2000 distinct cold singletons.
    // MG guarantees: reported <= true, true - reported <= n/capacity
    // (2500), and any key with true count > n/capacity is present.
    val rows = scala.util.Random.shuffle(
      Seq.fill(5000)("hot") ++ Seq.fill(3000)("warm") ++
        (0 until 2000).map(i => s"cold_$i"))
    val got = graft.plans.FreqItemsAgg
      .heavyHitters(rows.toDF("k").repartition(8), "k", capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.size <= 4, s"summary exceeded capacity: ${got.size}")
    for ((k, truth) <- Seq("hot" -> 5000L, "warm" -> 3000L)) {
      assert(got.contains(k), s"guaranteed heavy hitter '$k' missing: $got")
      assert(got(k) <= truth, s"'$k' overcounted: ${got(k)} > $truth")
      assert(truth - got(k) <= 2500L,
        s"'$k' undercounted beyond n/capacity: ${got(k)} vs $truth")
    }
  }

  test("plan audit: scanByDateRange prunes partitions at the scan") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val scans = gateScans("q_etl_scan")
    assert(scans.nonEmpty, "q_etl_scan planned no file scan")
    val pruned = scans.exists { s =>
      s.partitionFilters.exists(_.references.exists(_.name == "dt"))
    }
    assert(pruned,
      s"q_etl_scan: no partition filter on 'dt' — unselected days would be " +
        s"listed and read (partitionFilters=${scans.map(_.partitionFilters).mkString("; ")})")
  }
}
