package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Graph algorithms over edge-list DataFrames with the reference's
 * convention columns `src` / `target` (reference:
 * python-packages/core/src/omigo_core/graph_traversal.py).
 *
 * Pregel-style shape: a driver loop of joins, each iteration fully
 * distributed; the frontier is cached and the loop exits on an empty
 * frontier (or maxIter). No GraphFrames dependency.
 */
object GraphOps {

  /**
   * Iteration checkpoint strategy. `reliable = false` (default) uses
   * `localCheckpoint` — fast, lineage-truncating, but blocks live only in
   * executor block managers: an executor loss mid-iteration kills the job.
   * `reliable = true` writes reliable checkpoint files (caller must
   * `spark.sparkContext.setCheckpointDir(...)` first, typically on the
   * cluster's DFS) so iterative jobs survive executor loss — the mode to
   * run at cluster scale (see SCALE.md "Reliable checkpointing").
   *
   * Constraint propagation is suppressed for the duration of the
   * checkpoint: `Dataset.checkpoint` copies the source plan's constraint
   * set onto the new LogicalRDD leaf, and when the source lineage holds a
   * deduplicated SELF-JOIN of an earlier checkpoint (exactly what the
   * pointer-doubling closures build every round) those constraints can
   * reference rewritten attribute ids that no longer resolve —
   * `java.util.NoSuchElementException: key not found: <attr>` from Union
   * constraint rewriting at the next checkpoint. A constraint-free leaf
   * only forgoes derived-filter inference on frames the loop re-filters
   * anyway.
   */
  private[graft] def chk(df: DataFrame, reliable: Boolean): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.constraintPropagation.enabled"
    val prev = conf.get(key, "true")
    conf.set(key, "false")
    try if (reliable) df.checkpoint() else df.localCheckpoint()
    finally conf.set(key, prev)
  }

  /** [[chk]] plus one aggregate metric computed DURING the checkpoint's
    * materialization job via `Dataset.observe` — the loops below need a
    * fixpoint probe every round, and a separate `count()` over the new
    * leaf costs a full Catalyst plan + job per round (measured: about
    * half of a small-graph closure gate's wall time is driver planning
    * between jobs, and the probe is one of the two plans per round).
    * The metric must be null-safe on an empty frame (sum -> null): a
    * present-but-null value reads as 0, but a MISSING metric entry is an
    * engine-contract breach (CollectMetricsExec failed to surface the
    * node) and THROWS — reading it as 0 would make every iterative loop
    * silently "converge" on round 1 with wrong results (ADVICE r18).
    *
    * Exactness note: probes that compare VALUE SUMS across rounds (e.g.
    * forwardPaths' total-path fixpoint) additionally assume observed
    * metrics are exact — true here because speculative execution is off
    * in every shipped session config; a speculatively re-run task can
    * double-count into a `Dataset.observe` accumulator. */
  private def chkWithMetric(df: DataFrame, metric: Column,
                            reliable: Boolean): (DataFrame, Long) = {
    val (out, vs) = chkWithMetrics(df, Seq(metric), reliable)
    (out, vs.head)
  }

  /** [[chkWithMetric]] for several aggregates riding the same checkpoint
    * job (the loops below need a fixpoint probe AND the frame's row count
    * — the count sizes the next round's partitioning, see [[loopN]]). */
  private def chkWithMetrics(df: DataFrame, metrics: Seq[Column],
                             reliable: Boolean): (DataFrame, Seq[Long]) = {
    val observed = df.observe("__chk_probe__",
      metrics.head.as("m0"), metrics.tail.zipWithIndex.map {
        case (m, i) => m.as(s"m${i + 1}") }: _*)
    val out = chk(observed, reliable)
    val row = observed.queryExecution.observedMetrics.getOrElse("__chk_probe__",
      throw new IllegalStateException(
        "chkWithMetric: '__chk_probe__' missing from observedMetrics after " +
          "checkpoint materialization — the fixpoint probe did not run; " +
          "refusing to treat it as converged"))
    val vs = metrics.indices.map { i =>
      Option(row.get(i)).map {
        case l: java.lang.Long    => l.longValue
        case i2: java.lang.Integer => i2.longValue
        case x                    => x.toString.toLong
      }.getOrElse(0L)
    }
    (out, vs)
  }

  /** Declare the hash partitioning a checkpointed leaf is KNOWN to carry.
    * `Dataset.localCheckpoint` documents partitioning preservation, but
    * under AQE the capture reads `UnknownPartitioning` (Spark 4.1.2,
    * measured by graft.tools.PartProbe) — so every loop round's join
    * against the leaf re-shuffled it. The caller must have produced `df`
    * from a plan whose FINAL exchange is `repartition(n, keys)` followed
    * only by partition-preserving operators (filter/project/hash-agg on a
    * superset of `keys`/window/observe) — then the materialized layout is
    * exactly HashPartitioning(keys, n) and declaring it only restores
    * what the engine dropped (the bridge re-checks the partition count). */
  private def declared(df: DataFrame, keys: Seq[String], n: Int): DataFrame =
    org.apache.spark.sql.graft.bridge.withDeclaredHashPartitioning(df, keys, n)

  /** Partition count of a materialized checkpoint leaf — a free,
    * data-adaptive size reading (AQE already coalesced the leaf's final
    * shuffle from its actual bytes): no job, no driver collect. */
  private def leafN(df: DataFrame): Int = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.getNumPartitions
    case _ => df.rdd.getNumPartitions
  }

  /** Scale-adaptive loop partition count: sized from the frame's observed
    * row count (the checkpoint's fused count metric — free), targeting
    * `graft.loop.rowsPerPartition` rows per partition (default 1M, about
    * 10-100 MB for typical edge/label rows), capped by the session's
    * shuffle-partition sizing so a cluster's knob governs the ceiling.
    * Never a constant tuned to either local mode or one cluster. */
  private def loopN(df: DataFrame, rows: Long): Int = {
    val conf = df.sparkSession.conf
    val rowsPer = math.max(1L,
      conf.get("graft.loop.rowsPerPartition", "1000000").toLong)
    math.max(1, math.min(loopNCap(df), ((rows + rowsPer - 1) / rowsPer).toInt))
  }

  /** Ceiling for [[loopN]] and the sizing of seed frames whose row count
    * is not yet known: the session's shuffle-partition knob — the same
    * sizing every non-loop exchange starts from. */
  private def loopNCap(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt

  /** Seed partition count before any row count is observable: the input
    * plan's own partition count (scan parallelism is sized from input
    * bytes — data-adaptive at every scale), capped by the session knob.
    * Reading it plans the RDD but runs no job. */
  private def seedN(df: DataFrame): Int =
    math.max(1, math.min(loopNCap(df), df.rdd.getNumPartitions))

  /** Unpersist a superseded localCheckpoint's blocks (no-op for reliable
    * checkpoint files). `Dataset.unpersist` only clears cache-manager
    * entries — a localCheckpoint's blocks belong to the RDD inside the
    * plan's LogicalRDD leaf, so that is what gets unpersisted. Only ever
    * called on frames that are provably not returned — a truncated-
    * lineage frame cannot be recomputed once its blocks are gone. */
  private def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }

  /**
   * BFS level assignment from root nodes (reference GT:7-78
   * `get_bfs_levels`): returns (node_id, level) with level 0 at roots;
   * unreachable nodes are absent. Cycle-tolerant — a node keeps its
   * first (minimal) level.
   */
  def bfsLevels(edges: DataFrame, roots: DataFrame, maxIter: Int = 20,
                reliable: Boolean = false): DataFrame = {
    // loop-invariant edge frame, joined on `src` by every BFS iteration:
    // materialized ONCE (r18 persisted it so iterations stop re-deriving
    // it from source; r19 additionally pins it to a declared hash(src)
    // layout via a sized re-checkpoint, so the per-iteration frontier
    // join never re-shuffles the edge side again — at corpus scale that
    // was one full edge shuffle per BFS level). Blocks released after
    // the loop: the returned `levels` references only frontier leaves.
    val e0 = chk(edges.select(col("src"), col("target")), reliable)
    val nE = math.max(1, leafN(e0))
    val e =
      if (leafN(e0) <= 1) declared(e0, Seq("src"), 1)
      else {
        val d = declared(chk(e0.repartition(nE, col("src")), reliable),
          Seq("src"), nE)
        release(e0)
        d
      }
    var levels = roots.select(col("node_id")).distinct()
      .withColumn("level", lit(0))
    var frontier = levels
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      // checkpoint: materializes the frontier AND truncates lineage,
      // so iteration depth never grows the plan (a cache alone leaves a
      // recursive DAG that re-plans ever larger each round); the
      // emptiness probe rides the same job (chkWithMetric), not a
      // separate isEmpty plan+job per round
      val (next, n) = chkWithMetric(
        frontier.join(e, frontier("node_id") === e("src"), "inner")
          .select(col("target").as("node_id"), (col("level") + 1).as("level"))
          .join(levels.select(col("node_id").as("seen")),
            col("node_id") === col("seen"), "left_anti")
          .groupBy("node_id").agg(min("level").as("level")),
        count(lit(1)), reliable)
      if (n == 0L) done = true
      else {
        levels = levels.union(next)
        frontier = next
      }
      i += 1
    }
    if (!done)
      graft.core.Log.warn(s"bfsLevels stopped at maxIter=$maxIter with a " +
        "non-empty frontier; nodes deeper than that are missing levels")
    release(e)
    levels
  }

  /**
   * Iteratively prune dangling edges (reference GT:215-285
   * `remove_dangling_edges`): an edge dangles when its target has no
   * outgoing edge and is not in `retainIds`. Each iteration removes the
   * current leaf fringe; fixpoint or maxIter.
   */
  def removeDanglingEdges(edges: DataFrame, retainIds: Seq[String],
                          maxIter: Int = 10): DataFrame = {
    // persisted: the first iteration reads the input edges twice (the
    // src-set distinct AND the prune join probe side) — without the
    // persist both evaluate the upstream lineage from source. Later
    // iterations read the previous iteration's own cache instead. Pure
    // cache, released by the caller's Caches scope. The persist target is
    // a DERIVED projection (select of the input's own columns), never the
    // caller-owned frame itself: persisting `edges` directly would let
    // this scope's release unpersist a cache the caller created for its
    // own reuse (ADVICE r18 — Spark treats the second persist as a no-op
    // and the single unpersist drops both).
    var e = graft.core.Caches.track(
      edges.select(edges.columns.map(col).toSeq: _*).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var cached: DataFrame = null
    var prevCount = -1L
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val srcs = e.select(col("src").as("__s__")).distinct()
      val pruned = e
        .join(srcs, e("target") === col("__s__"), "left")
        .filter(col("__s__").isNotNull || col("target").isin(retainIds: _*))
        .drop("__s__")
      // fixpoint check only matters if another iteration would run; the
      // single count() doubles as the cache materialization
      if (i + 1 < maxIter) {
        pruned.cache()
        val n = pruned.count()
        // the superseded iteration's cache is dead weight once the new
        // one is materialized — unpersist or maxIter-1 copies pin memory
        if (cached != null) cached.unpersist()
        cached = pruned
        if (n == prevCount) done = true
        prevCount = n
      }
      e = pruned
      i += 1
    }
    if (!done)
      graft.core.Log.warn(s"removeDanglingEdges stopped at maxIter=$maxIter " +
        "without reaching a fixpoint; some dangling chains may remain — " +
        "raise maxIter for deep prune cascades")
    e
  }

  /** In/out degree per node — building block for the pruning family. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node_id"))
      .agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col("target").as("node_id"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node_id"), "full")
      .na.fill(0, Seq("out_degree", "in_degree"))
  }

  /**
   * Remove cycle-closing edges using timestamp order (reference
   * GT:288-342 `remove_cycles` relies on time-ordered forward edges):
   * keep only edges whose target's earliest incoming timestamp is not
   * earlier than the src's — a DAG-izing filter for event graphs.
   */
  def removeCycles(edges: DataFrame, tsCol: String): DataFrame = {
    val firstSeen = edges.groupBy(col("target").as("node_id"))
      .agg(min(col(tsCol)).as("__first_in__"))
    edges.join(firstSeen, edges("src") === col("node_id"), "left")
      .filter(col("__first_in__").isNull || col("__first_in__") <= col(tsCol))
      .drop("node_id", "__first_in__")
  }

  /**
   * Collapse similar leaf nodes into grouped super-nodes (reference
   * GT:344-444 `merge_similar_nodes_reference` — flagged buggy there and
   * treated as spec): leaves (no outgoing edges) sharing the same parent
   * and the same `similarityKey` value merge into one `grp:<parent>:<key>`
   * node with a `merged_count`. One aggregation, no iteration.
   */
  def mergeSimilarLeafNodes(edges: DataFrame,
                            similarityKey: DataFrame => Column): DataFrame = {
    val srcs = edges.select(col("src").as("__s__")).distinct()
    // persisted: BOTH output branches (leaves, non-leaves) read `tagged`,
    // and without the persist each re-executes the leaf-marking join —
    // two shuffles of the edge list where one suffices. Pure cache,
    // released by the caller's Caches scope.
    val tagged = graft.core.Caches.track(
      edges.join(srcs, edges("target") === col("__s__"), "left")
        .withColumn("__is_leaf__", col("__s__").isNull).drop("__s__")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val leaves = tagged.filter(col("__is_leaf__"))
      .withColumn("__simkey__", similarityKey(tagged))
      .groupBy(col("src"), col("__simkey__"))
      .agg(count(lit(1)).as("merged_count"))
      .select(col("src"),
        concat(lit("grp:"), col("src"), lit(":"), col("__simkey__")).as("target"),
        col("merged_count"))
    val nonLeaves = tagged.filter(!col("__is_leaf__"))
      .select(col("src"), col("target"), lit(1L).as("merged_count"))
    nonLeaves.unionByName(leaves)
  }

  /**
   * Connected components over the undirected view of the edge list:
   * (node_id, component) where component = the minimum node id reachable.
   * Hash-min label propagation PLUS pointer doubling: each round first
   * takes the min over neighbor labels (1 hop), then shortcuts every
   * label to its label's label — so label information travels 2^i hops
   * after i rounds and convergence is O(log diameter), not O(diameter)
   * (a 1M-node chain resolves in ~20 rounds instead of 1M). Each round
   * is two joins + one aggregation, fully distributed; label frontiers
   * are localCheckpoint'ed so plan depth stays constant; `maxIter`
   * bounds adversarial topologies.
   *
   * Beyond-parity: the reference has no component/closure operator — its
   * graph layer stops at BFS levels (reference GT:7-78).
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          reliable: Boolean = false): DataFrame = {
    // symmetric view via ONE explode pass, not union(edges, swapped):
    // a self-union evaluates the upstream lineage twice in the same job,
    // and CC callers feed it expensive lineages (the full MinHash
    // signature pipeline, a distributed ordinal) — measured as the
    // dominant cost of the dedup-CC gates before this change (round 18)
    val sym0 = chk(edges.select(explode(array(
        struct(col("src").as("a"), col("target").as("b")),
        struct(col("target").as("a"), col("src").as("b")))).as("__e__"))
      .select(col("__e__.a").as("a"), col("__e__.b").as("b"))
      .distinct(), reliable)
    // round 19 (verdict item 3): ALL loop frames share ONE hash layout so
    // the per-round joins start co-partitioned and stop re-shuffling.
    // nSym is data-adaptive — AQE already sized sym0's materialization
    // from its bytes, so reading the leaf's partition count is a free,
    // scale-correct answer (1 on a toy graph, input-sized on a corpus).
    // The edge view is re-checkpointed ONCE partitioned by the join side
    // `b` and the partitioning is DECLARED on the leaf (localCheckpoint
    // drops it under AQE — see `declared`); labels/frontier leaves carry
    // hash(node_id, nSym) the same way. Measured effect: the frontier
    // join and the labels join plan ZERO exchanges; only the aggregation,
    // the doubling self-join's left side and the final layout repartition
    // move data — jobs per round drop from ~9 to ~4 and the corpus-sized
    // edge view is never shuffled again after setup (guide §2.4).
    // N == 1 fast path: a single-partition frame trivially satisfies ANY
    // hash partitioning (all rows co-located), so tiny/derived graphs —
    // the dedup-CC family's case — get the declared layout for free
    // instead of paying a second materialization (measured: the rechk
    // cost the small-CC gates 10-25% while buying nothing)
    val nSym = math.max(1, leafN(sym0))
    val sym =
      if (leafN(sym0) <= 1) declared(sym0, Seq("b"), 1)
      else {
        val s = declared(chk(sym0.repartition(nSym, col("b")), reliable),
          Seq("b"), nSym)
        release(sym0)
        s
      }
    // node set from the `b` side (sym is symmetric, so {a} == {b}): the
    // leaf is already hash(b)-partitioned, making the distinct free
    val labels0 = declared(chk(
      sym.select(col("b").as("node_id")).distinct()
        .withColumn("component", col("node_id")), reliable),
      Seq("node_id"), nSym)
    var labels = labels0
    var prev: DataFrame = null // superseded label frame, released each round
    var i = 0
    var changed = 1L
    // delta propagation: only labels lowered LAST round can lower a
    // neighbor this round — a stable neighbor's label was already folded
    // into v's min when it last changed (round 1 seeds with everyone).
    // The changed set collapses geometrically; it is a projection of the
    // hash(node_id)-partitioned label leaf, so its join against the
    // hash(b)-partitioned edge view is exchange-free at any size.
    var changedSet = labels0
    while (i < maxIter && changed > 0) {
      val nbrMin = sym.join(changedSet.select(col("node_id").as("b"), col("component")),
          Seq("b"), "inner")
        // land the aggregation shuffle directly on the loop layout: a
        // planner-chosen exchange would use the session default count and
        // force a SECOND exchange to co-partition with the label leaf
        .repartition(nSym, col("a"))
        .groupBy(col("a").as("node_id"))
        .agg(min(col("component")).as("__nbr_min__"))
      // persist, not checkpoint: the self-join below reads `hopped` twice
      // and the cache dedups that within the SAME job that materializes
      // `next` — a checkpoint here would add a whole extra eager job per
      // round (measured ~1/3 of CC wall time at toy scale, pure
      // scheduler overhead). Plan depth stays bounded because `labels`
      // is a checkpointed leaf.
      val hopped = labels.join(nbrMin, Seq("node_id"), "left")
        .select(col("node_id"), col("component").as("__old__"),
          least(col("component"), coalesce(col("__nbr_min__"), col("component")))
            .as("component"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pointer doubling: component <- component's component. Labels are
      // node ids, so the lookup is a self-join on the hopped labels.
      // The change-count probe rides the checkpoint job (chkWithMetric)
      // instead of a separate count plan+job per round; it still runs
      // every round, including the last allowed one: a loop that exits
      // at maxIter while labels are still moving has NON-MINIMAL labels
      // — components silently split (same contract as ancestorClosure).
      val hop2 = hopped.join(
          hopped.select(col("node_id").as("component"),
            col("component").as("__cc__")),
          Seq("component"), "left")
        .select(col("node_id"),
          coalesce(col("__cc__"), col("component")).as("component"),
          (coalesce(col("__cc__"), col("component")) < col("__old__")).as("__chg__"))
      // at nSym == 1 the layout repartition is a pure extra shuffle of the
      // label set (AQE coalesces the self-join output to one partition
      // anyway, and a 1-partition leaf is declarable as-is); above 1 it
      // replaces the labels-side and frontier-side exchanges of the NEXT
      // round, a net win of one exchange per round
      val (next, changed2) = chkWithMetric(
        if (nSym > 1) hop2.repartition(nSym, col("node_id")) else hop2,
        sum(when(col("__chg__"), 1L).otherwise(0L)), reliable)
      val nextD =
        if (nSym > 1) declared(next, Seq("node_id"), nSym)
        else if (leafN(next) == 1) declared(next, Seq("node_id"), 1)
        else next
      // `next` is materialized (checkpoint is eager) with truncated
      // lineage — the intra-round cache and the superseded label frame
      // are dead weight now; without the release up to ~2*maxIter block
      // sets pin block-manager memory for the life of the job
      hopped.unpersist(false)
      if (prev != null) release(prev)
      prev = if (labels eq labels0) null else labels // labels0 never returned early, but keep release simple
      changed = changed2
      changedSet = nextD.filter(col("__chg__")).select(col("node_id"), col("component"))
      labels = nextD.drop("__chg__")
      i += 1
    }
    // the last allowed round may itself have COMPLETED convergence, so
    // changed > 0 at exhaustion is not yet proof of failure: run one
    // decoupled probe (would another hop-or-double lower any label?)
    // and only then throw. Cost: one extra job, only on exhaustion.
    val unconverged = changed > 0 && {
      val probeNbr = sym.join(
          changedSet.select(col("node_id").as("b"), col("component")),
          Seq("b"), "inner")
        .groupBy(col("a").as("node_id"))
        .agg(min(col("component")).as("__nbr_min__"))
      val hopProbe = labels.join(probeNbr, Seq("node_id"), "left")
        .select(col("node_id"), col("component"),
          least(col("component"), coalesce(col("__nbr_min__"), col("component")))
            .as("__h__"))
      hopProbe.join(
          hopProbe.select(col("node_id").as("__h__"), col("__h__").as("__hh__")),
          Seq("__h__"), "left")
        .filter(coalesce(col("__hh__"), col("__h__")) < col("component"))
        .limit(1).count() > 0
    }
    release(sym)
    if (prev != null) release(prev)
    if (!(labels eq labels0)) release(labels0)
    if (unconverged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter too deep for the doubling budget); raise " +
          "maxIter — non-minimal labels would silently split components")
    labels
  }

  /**
   * DAG ancestor paths from roots (reference GT:80-171
   * `get_forward_edges_only`, simplified to the path-count semantics):
   * per node, the number of distinct paths from any root and the set of
   * direct ancestors, via level-synchronous propagation.
   */
  def forwardPaths(edges: DataFrame, roots: DataFrame, maxIter: Int = 20,
                   reliable: Boolean = false): DataFrame = {
    // loop-invariant edge frame: previously re-SCANNED from source and
    // re-shuffled by the join every round; checkpointed once on a
    // declared hash(src) layout (r19) so rounds neither recompute nor
    // re-shuffle it. Released after the loop — the returned `paths` is
    // its own checkpoint leaf.
    val e0 = chk(edges.select(col("src"), col("target")), reliable)
    val nE = math.max(1, leafN(e0))
    val e =
      if (leafN(e0) <= 1) declared(e0, Seq("src"), 1)
      else {
        val d = declared(chk(e0.repartition(nE, col("src")), reliable),
          Seq("src"), nE)
        release(e0)
        d
      }
    val base = chk(roots.select(col("node_id")).distinct()
      .withColumn("n_paths", lit(1L)), reliable)
    // recompute counts from scratch each round: paths_i(v) = [v is root]
    // + sum over in-edges of paths_{i-1}(u). A frontier-with-anti-join
    // would freeze a node's count at its FIRST discovery depth and drop
    // contributions arriving via longer routes (root->a->b vs root->b).
    // After i rounds counts cover all paths of length <= i; fixpoint on
    // a DAG within maxIter.
    var paths = base
    var i = 0
    var done = false
    var prevTotal = -1L
    while (i < maxIter && !done) {
      val contrib = paths.join(e, paths("node_id") === e("src"), "inner")
        .groupBy(col("target").as("node_id"))
        .agg(sum("n_paths").as("n_paths"))
      // fixpoint probe (total path count) rides the checkpoint job as an
      // observed metric; chkWithMetric reads a NULL sum (empty roots
      // input) as 0
      val (next, total) = chkWithMetric(
        base.select(col("node_id"), col("n_paths"))
          .unionByName(contrib.select(col("node_id"), col("n_paths")))
          .groupBy("node_id").agg(sum("n_paths").as("n_paths")),
        sum("n_paths"), reliable)
      if (total == prevTotal) done = true
      prevTotal = total
      if (!(paths eq base)) release(paths) // superseded round's blocks
      paths = next
      i += 1
    }
    if (!done)
      graft.core.Log.warn(s"forwardPaths stopped at maxIter=$maxIter before " +
        "fixpoint; counts for nodes deeper than that are incomplete")
    release(e)
    paths
  }

  /**
   * Transitive ancestor closure as (node_id, anc) pairs: `anc` reaches
   * `node_id` along directed edges. Pointer-DOUBLED iteration, so after
   * i rounds every path of length ≤ 2^i is covered and convergence is
   * O(log diameter) rounds, not O(diameter) (a one-hop-per-round loop
   * silently truncated graphs deeper than maxIter). Non-convergence at
   * `maxIter` THROWS — a truncated closure is a wrong answer, never a
   * return value. Pairs-not-arrays is the 100 TB shape: the closure
   * shuffles on node_id/anc keys and never builds a per-node array
   * until the caller aggregates.
   *
   * Composition is shortest-path doubling, NOT closure ⋈ closure: each
   * pair tracks its min distance, and a round joins only the pairs at
   * distance EXACTLY 2^i (the frontier) against the closure. Any pair
   * at distance d ∈ (2^i, 2^(i+1)] decomposes as an exact-2^i prefix
   * (a shortest path's 2^i-th node) plus a ≤ 2^i remainder, so
   * completeness per round is unchanged — but each new pair is now
   * produced once per shortest-path midpoint instead of once per ANY
   * midpoint. Full self-composition re-derives every known pair through
   * every intermediate node each round — O(pairs × 2^i) join output in
   * late rounds, measured as a stall on a 4k-node chain — where the
   * frontier form's total join output across all rounds is O(closure).
   */
  def ancestorClosure(edges: DataFrame, maxIter: Int = 20,
                      reliable: Boolean = false): DataFrame = {
    val e = edges.select(col("src"), col("target"))
    // round 19 (verdict item 3): every pair frame lives on an explicit
    // hash(node_id, N) layout, declared on its checkpoint leaf (see
    // `declared`), so the doubling join's frontier side plans ZERO
    // exchanges round over round; N starts at the session's shuffle
    // sizing and adapts to the observed closure size (loopN). The seed's
    // dedup aggregate rides the layout exchange (subset clustering), and
    // the emptiness probe rides the seeding checkpoint job.
    val nSeed = seedN(e)
    val (pairs0raw, seedVals) = chkWithMetrics(
      e.select(col("target").as("node_id"), col("src").as("anc"))
        .repartition(nSeed, col("node_id"))
        .dropDuplicates("node_id", "anc")
        .withColumn("__dist__", lit(1L)),
      Seq(count(lit(1))), reliable)
    var pairs = declared(pairs0raw, Seq("node_id"), nSeed)
    var rowsTotal = seedVals.head
    var i = 0
    var pow = 1L // frontier distance composed this round
    var converged = rowsTotal == 0L
    while (i < maxIter && !converged) {
      // frontier (m reached-by a at exactly 2^i) ∧ (n reached-by m)
      //   =>  (n reached-by a at 2^i + dist(m, n))
      // q side filters the hash(node_id)-partitioned leaf — its join key
      // IS the layout, no exchange; only the p side moves (by anc).
      val doubled = pairs.filter(col("__dist__") === pow).as("q")
        .join(pairs.as("p"), col("q.node_id") === col("p.anc"))
        .select(col("p.node_id").as("node_id"), col("q.anc").as("anc"),
          (col("p.__dist__") + lit(pow)).as("__dist__"))
      // fused round (r18 fused the probe into the checkpoint; r19 fuses
      // the freshness anti-join into the round aggregate): ONE exchange
      // lands old pairs ∪ raw candidates on the loop layout, ONE
      // aggregate takes min(dist) and whether the pair existed before
      // (max over the __old__ tag), and the fixpoint probe rides the
      // same checkpoint job. min(dist) == the old dist for existing
      // pairs — stored distances are exact shortest distances by the
      // doubling induction, and any composed candidate is the length of
      // SOME path, never shorter — so the frame is row-identical to the
      // previous union ∪ anti-join formulation at every round.
      val nNext = loopN(pairs, rowsTotal)
      val (grown, vs) = chkWithMetrics(
        pairs.withColumn("__old__", lit(true))
          .unionByName(doubled.withColumn("__old__", lit(false)))
          .repartition(nNext, col("node_id"))
          .groupBy(col("node_id"), col("anc"))
          .agg(min(col("__dist__")).as("__dist__"),
            max(col("__old__")).as("__seen__")),
        Seq(sum(when(!col("__seen__"), 1L).otherwise(0L)), count(lit(1))),
        reliable)
      release(pairs)
      pairs = declared(grown, Seq("node_id"), nNext)
        .select(col("node_id"), col("anc"), col("__dist__"))
      converged = vs(0) == 0L
      rowsTotal = vs(1)
      pow *= 2L
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ancestorClosure did not converge in $maxIter doubling rounds " +
          s"(graph diameter > 2^$maxIter or a growing cycle closure); " +
          "raise maxIter — a truncated closure would be silently wrong")
    pairs.select(col("node_id"), col("anc"))
  }

  /**
   * Full `get_forward_edges_only` output contract (reference GT:80-171):
   * the input edges gain three columns keyed on `target` —
   * `<prefix>:src_paths` (sorted, `sep`-joined ancestors reachable along
   * FORWARD edges only), `<prefix>:all_paths` (ancestors along all
   * edges), and `<prefix>:ancestors` ('|'-joined enumeration of every
   * distinct target-to-root path, each path `sep`-joined starting at the
   * target). A "forward" edge is one that does not point back into its
   * own ancestry (src->dest where dest is already an ancestor of src) —
   * the declarative restatement of the reference crawl's cycle guard
   * (`dest not in paths[src]`); on a DAG every edge is forward. The
   * reference's single-pass BFS under-fills nodes whose ancestry grows
   * after their dequeue (order-dependent, flagged WIP there); this
   * computes the fixpoint.
   *
   * Path ENUMERATION is exponential in diamond count by definition —
   * bounded by `maxIter` hops and meant for the small annotated
   * subgraphs the reference applies it to, while the closure columns
   * stay linear-ish and scale.
   */
  def forwardEdgesOnly(edges: DataFrame, prefix: String, sep: String = ",",
                       maxIter: Int = 20, reliable: Boolean = false): DataFrame = {
    val e = edges.select(col("src"), col("target"))
    val allClosure = ancestorClosure(e, maxIter, reliable)
    // forward edge: target is NOT an ancestor of src (and not a self-loop)
    val backEdges = allClosure.select(col("node_id").as("src"), col("anc").as("target"))
    // fwd is loop-invariant and joined on `target` by every enumeration
    // hop below — checkpoint it twice (round 19): once to learn its
    // data-adaptive size, once repartitioned by target with the layout
    // DECLARED on the leaf, so the per-hop joins stop re-shuffling it
    val fwd0 = chk(e.filter(col("src") =!= col("target"))
      .join(backEdges, Seq("src", "target"), "left_anti"), reliable)
    // N == 1 fast path: a 1-partition leaf satisfies any hash layout
    // as-is — skip the second materialization on small graphs
    val nF = math.max(1, leafN(fwd0))
    val fwd =
      if (leafN(fwd0) <= 1) declared(fwd0, Seq("target"), 1)
      else {
        val f = declared(chk(fwd0.repartition(nF, col("target")), reliable),
          Seq("target"), nF)
        release(fwd0)
        f
      }
    val fwdClosure = ancestorClosure(fwd, maxIter, reliable)

    val srcPaths = fwdClosure.groupBy(col("node_id").as("target"))
      .agg(concat_ws(sep, sort_array(collect_set(col("anc")))).as(s"$prefix:src_paths"))
    val allPaths = allClosure.groupBy(col("node_id").as("target"))
      .agg(concat_ws(sep, sort_array(collect_set(col("anc")))).as(s"$prefix:all_paths"))

    // ---- path enumeration over forward edges ----
    // active partial paths: (dest, head, path); a path completes when its
    // head has no parents AT ALL (reference: nodes with parents but none
    // forward produce nothing — the cycle-guard recursion dead-ends).
    // Each hop is ONE checkpointed frame carrying both the parent
    // extension and the has-any-parents flag; `ended` and the next
    // frontier are lazy filters over that materialized leaf, and the
    // open-frontier probe is a cheap count on it — versus the previous
    // two-checkpoints-plus-isEmpty per hop (3 eager jobs of scheduler
    // cadence). Step frames accumulate until the output aggregates are
    // materialized, because the completed-path union references them (a
    // released localCheckpoint cannot recompute — the release-early
    // version crashed with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    // loop-invariant, joined on `head` every hop: checkpointed ONCE on
    // fwd's layout (r18 re-derived it — a distinct shuffle — per hop),
    // so the per-hop parent-flag join plans zero exchanges
    val hasParents = declared(chk(
      e.select(col("target").as("head")).repartition(nF, col("head"))
        .dropDuplicates("head").withColumn("__hp__", lit(true)), reliable),
      Seq("head"), nF)
    var completed = List.empty[DataFrame]
    var frames = List.empty[DataFrame]
    frames ::= hasParents
    // both loop probes (initial frontier size, per-hop open count) ride
    // their frame's checkpoint job as observed metrics — no separate
    // count plan+job per hop. The seed frontier aliases `target` three
    // ways from a frame laid out hash(target, nF); rows never move, so
    // the leaf provably carries hash(head, nF) — declared so hop 1's
    // three-way join on head is exchange-free on every side.
    val (active0raw, nActive0) = chkWithMetric(
      edges.select(col("target")).repartition(nF, col("target")).distinct()
        .select(col("target").as("dest"), col("target").as("head"),
          col("target").cast(StringType).as("path")),
      count(lit(1)), reliable)
    var active = declared(active0raw, Seq("head"), nF)
    frames ::= active
    var nActive = nActive0
    var i = 0
    while (i < maxIter && nActive > 0L) {
      val (step, nOpen) = chkWithMetric(active.join(
          fwd.select(col("target").as("head"), col("src").as("__par__")),
          Seq("head"), "left")
        .join(hasParents, Seq("head"), "left")
        .select(col("dest"), col("path"), col("__par__"), col("__hp__")),
        sum(when(col("__par__").isNotNull, 1L).otherwise(0L)), reliable)
      frames ::= step
      completed ::= step.filter(col("__par__").isNull && col("__hp__").isNull)
        .select(col("dest"), col("path"))
      active = step.filter(col("__par__").isNotNull)
        .select(col("dest"), col("__par__").as("head"),
          concat(col("path"), lit(sep), col("__par__")).as("path"))
      nActive = nOpen
      i += 1
    }
    // fwd is cycle-free by construction (every cycle edge is a back edge),
    // so a non-empty frontier here means a forward path longer than
    // maxIter — enumeration would silently drop those paths; refuse.
    if (nActive > 0L)
      throw new IllegalStateException(
        s"forwardEdgesOnly path enumeration exceeded maxIter=$maxIter hops " +
          "with paths still open; raise maxIter or use the closure columns")
    val complete = completed.reduceOption(_ unionByName _).getOrElse {
      val s = edges.sparkSession
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("dest", StringType), StructField("path", StringType))))
    }
    // materialize all three output aggregates in ONE checkpointed job (a
    // tagged union — they share the (target, string) shape), then free
    // every iteration frame: the returned lazy plan must only reference
    // blocks that stay alive.
    val aggs = chk(
      srcPaths.select(col("target"), lit("sp").as("__k__"),
          col(s"$prefix:src_paths").as("__v__"))
        .unionByName(allPaths.select(col("target"), lit("ap").as("__k__"),
          col(s"$prefix:all_paths").as("__v__")))
        .unionByName(complete.groupBy(col("dest").as("target"))
          .agg(concat_ws("|", sort_array(collect_set(col("path")))).as("__v__"))
          .select(col("target"), lit("an").as("__k__"), col("__v__"))),
      reliable)
    frames.foreach(release)
    release(fwdClosure); release(allClosure); release(fwd)
    def part(k: String, name: String): DataFrame =
      aggs.filter(col("__k__") === k).select(col("target"), col("__v__").as(name))

    edges.join(part("sp", s"$prefix:src_paths"), Seq("target"), "left")
      .join(part("ap", s"$prefix:all_paths"), Seq("target"), "left")
      .join(part("an", s"$prefix:ancestors"), Seq("target"), "left")
      .na.fill("", Seq(s"$prefix:src_paths", s"$prefix:all_paths", s"$prefix:ancestors"))
  }

  /**
   * Time-respecting ancestor closure (reference GT:173-212
   * `get_time_based_forward_edges_only` — a sequential fold over
   * ts-sorted edges, warned there as "hard to understand"): the
   * declarative semantics it approximates is TEMPORAL reachability —
   * `<prefix>:src_paths` lists ancestors u with a path u->...->target
   * whose edge timestamps are non-decreasing along the path;
   * `<prefix>:all_paths` lists plain (time-ignoring) reachability, which
   * is what the reference's repeated re-passes converge toward.
   * Self-loops are dropped, as in the reference. State is (node, anc,
   * first-ts, last-ts) path segments, Pareto-pruned and pointer-doubled
   * (see inline comments) — fixpoint in O(log path-length) rounds, and
   * non-convergence at maxIter throws rather than truncating.
   */
  def timeBasedForwardEdgesOnly(edges: DataFrame, tsCol: String, prefix: String,
                                sep: String = ",", maxIter: Int = 20,
                                reliable: Boolean = false): DataFrame = {
    val e = edges.filter(col("src") =!= col("target"))
      .select(col("src"), col("target"), col(tsCol).cast(LongType).as("__ts__"))
    // State: (node_id, anc, __f__, __l__) — a time-respecting path
    // anc -> ... -> node_id whose FIRST edge ts is __f__ and LAST is
    // __l__. Tracking both endpoints makes segments COMPOSABLE, so the
    // closure pointer-doubles (O(log path-length) rounds); the previous
    // last-ts-only state could only extend one edge per round and
    // silently truncated at maxIter, and its count-based fixpoint probe
    // missed rounds that only lowered a pair's min last-ts.
    // Pareto prune: (f', l') dominates (f, l) when f' >= f && l' <= l —
    // the dominating segment composes everywhere the dominated one does
    // and yields a dominating result, so dropping dominated rows keeps
    // the closure exact while bounding state per (node, anc).
    def prune(df: DataFrame): DataFrame = {
      val byF = df.groupBy("node_id", "anc", "__f__")
        .agg(min("__l__").as("__l__"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("node_id", "anc").orderBy(col("__f__").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      byF.withColumn("__dom__", min("__l__").over(w))
        .filter(col("__dom__").isNull || col("__l__") < col("__dom__"))
        .drop("__dom__")
    }
    // round 19 (verdict item 3): pair frames live on an explicit
    // hash(node_id, N) layout declared on their checkpoint leaves, so the
    // composition join's p side (keyed node_id) never re-shuffles; prune's
    // (node_id, anc, __f__) aggregate and (node_id, anc) window both ride
    // the layout exchange (subset clustering). The initial emptiness
    // probe rides the seeding checkpoint job.
    val nSeed = seedN(e)
    val (pairs0raw, seedVals) = chkWithMetrics(
      prune(e.select(col("target").as("node_id"),
        col("src").as("anc"), col("__ts__").as("__f__"),
        col("__ts__").as("__l__")).repartition(nSeed, col("node_id"))),
      Seq(count(lit(1))), reliable)
    var pairs = declared(pairs0raw, Seq("node_id"), nSeed)
    var rowsTotal = seedVals.head
    var i = 0
    var converged = rowsTotal == 0L
    while (i < maxIter && !converged) {
      // compose: p = anc -> v (f1, l1), q = v -> w (f2 >= l1, l2)
      //          =>  anc -> w (f1, l2)
      val composed = pairs.as("p").join(pairs.as("q"),
          col("p.node_id") === col("q.anc") && col("q.__f__") >= col("p.__l__"))
        .select(col("q.node_id").as("node_id"), col("p.anc").as("anc"),
          col("p.__f__").as("__f__"), col("q.__l__").as("__l__"))
      // content-based fixpoint: both sides are Pareto sets, so any change
      // surfaces as a surviving row that pairs lacks (a pure removal can
      // only be caused by a new dominating row). r18 fused the probe into
      // the checkpoint; r19 fuses the freshness left-join into prune's own
      // (node_id, anc, __f__) aggregate: __oldl__ = the OLD row's __l__
      // for this (node_id, anc, __f__) group (pairs is unique on that key,
      // so min-over-old reads exactly that row, null when absent), and a
      // surviving row is fresh iff __oldl__ <=> __l__ fails — identical to
      // "not found by the old four-key left join" because min(__l__) over
      // old ∪ candidates equals the old value exactly when the old row
      // attains the minimum, i.e. when the row survives unchanged.
      val nNext = loopN(pairs, rowsTotal)
      val unioned = pairs.withColumn("__old__", lit(true))
        .unionByName(composed.withColumn("__old__", lit(false)))
        .repartition(nNext, col("node_id"))
      val byF = unioned.groupBy("node_id", "anc", "__f__")
        .agg(min("__l__").as("__l__"),
          min(when(col("__old__"), col("__l__"))).as("__oldl__"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("node_id", "anc").orderBy(col("__f__").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val prunedTagged = byF.withColumn("__dom__", min("__l__").over(w))
        .filter(col("__dom__").isNull || col("__l__") < col("__dom__"))
        .select(col("node_id"), col("anc"), col("__f__"), col("__l__"),
          (!(col("__oldl__") <=> col("__l__"))).as("__fresh__"))
      val (next, vs) = chkWithMetrics(prunedTagged,
        Seq(sum(when(col("__fresh__"), 1L).otherwise(0L)), count(lit(1))),
        reliable)
      release(pairs)
      pairs = declared(next, Seq("node_id"), nNext)
        .select(col("node_id"), col("anc"), col("__f__"), col("__l__"))
      converged = vs(0) == 0L
      rowsTotal = vs(1)
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"timeBasedForwardEdgesOnly did not converge in $maxIter doubling " +
          "rounds; raise maxIter — a truncated temporal closure would be " +
          "silently wrong")
    val timePaths = pairs.groupBy(col("node_id").as("target"))
      .agg(concat_ws(sep, sort_array(collect_set(col("anc")))).as(s"$prefix:src_paths"))
    val allPaths = ancestorClosure(e, maxIter, reliable)
      .groupBy(col("node_id").as("target"))
      .agg(concat_ws(sep, sort_array(collect_set(col("anc")))).as(s"$prefix:all_paths"))
    edges.join(timePaths, Seq("target"), "left")
      .join(allPaths, Seq("target"), "left")
      .na.fill("", Seq(s"$prefix:src_paths", s"$prefix:all_paths"))
  }

  /**
   * Per-edge retention filter around annotated "detection" vertices
   * (reference GT:447-485 `split_graph_filter_func`, lifted from a
   * per-row callback to one broadcast-joined predicate). `retained` is
   * (node_id, ts_min, ts_max). An edge survives when: either endpoint
   * passes `specialNodeFilter`; neither endpoint is retained; both are
   * retained; or the edge's ts respects the retained endpoint's window —
   * for a retained TARGET the edge must not be after its ts_max (edges
   * INTO a detection happen before it ends), for a retained SRC not
   * before its ts_min (edges OUT of a detection happen after it starts).
   */
  def splitGraphFilter(edges: DataFrame, tsCol: String, retained: DataFrame,
                       specialNodeFilter: Column => Column): DataFrame = {
    val rSrc = broadcast(retained.select(col("node_id").as("src"),
      col("ts_min").as("__src_min__"), lit(true).as("__src_ret__")))
    val rTgt = broadcast(retained.select(col("node_id").as("target"),
      col("ts_max").as("__tgt_max__"), lit(true).as("__tgt_ret__")))
    val ts = col(tsCol).cast(LongType)
    edges.join(rSrc, Seq("src"), "left").join(rTgt, Seq("target"), "left")
      .filter(
        specialNodeFilter(col("src")) || specialNodeFilter(col("target")) ||
        (col("__src_ret__").isNull && col("__tgt_ret__").isNull) ||
        (col("__src_ret__").isNotNull && col("__tgt_ret__").isNotNull) ||
        (col("__tgt_ret__").isNotNull &&
          (col("__tgt_max__").isNull || ts <= col("__tgt_max__").cast(LongType))) ||
        (col("__src_ret__").isNotNull &&
          (col("__src_min__").isNull || ts >= col("__src_min__").cast(LongType))))
      .drop("__src_min__", "__src_ret__", "__tgt_max__", "__tgt_ret__")
  }

  /**
   * Time-order pruning of adjacent edge pairs (reference GT:486-547
   * `apply_time_order_based_filter` — unrunnable as written there:
   * references undefined symbols; treated as spec). For every adjacent
   * pair left:(a->b) / right:(b->c), a pairing is CONSISTENT when
   * left.ts_min <= right.ts_max. An edge all of whose pairings are
   * inconsistent is a candidate; the side to drop follows the
   * reference's decision table — strict ordering always drops the right
   * edge; otherwise edges touching a retained ("detection") vertex win
   * over those that don't, then the side whose pairings are all
   * inconsistent drops. Everything is equi-joins + groupBy on edge keys.
   */
  def applyTimeOrderBasedFilter(edges: DataFrame, tsCol: String,
                                retainedIds: Seq[String],
                                strictOrdering: Boolean = false): DataFrame = {
    // minMax feeds both sides of the adjacency self-join; pairs feeds
    // three consumers (left flags, right flags, the judged filter) —
    // persist both so the per-edge aggregate runs once and the adjacency
    // join once, instead of 2x and 3x. Pure caches, released by the
    // caller's Caches scope.
    val minMax = graft.core.Caches.track(
      edges.groupBy(col("src"), col("target"))
        .agg(min(col(tsCol).cast(LongType)).as("ts_min"),
          max(col(tsCol).cast(LongType)).as("ts_max"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val left = minMax.select(col("src").as("l_src"), col("target").as("l_tgt"),
      col("ts_min").as("l_min"), col("ts_max").as("l_max"))
    val right = minMax.select(col("src").as("r_src"), col("target").as("r_tgt"),
      col("ts_min").as("r_min"), col("ts_max").as("r_max"))
    val pairs = graft.core.Caches.track(
      left.join(right, col("l_tgt") === col("r_src"))
        .withColumn("__ok__", (col("l_min") <= col("r_max")).cast(IntegerType))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val leftFlag = pairs.groupBy(col("l_src"), col("l_tgt"))
      .agg(max("__ok__").as("__l_any_ok__"))
    val rightFlag = pairs.groupBy(col("r_src"), col("r_tgt"))
      .agg(max("__ok__").as("__r_any_ok__"))
    val isDetect = (a: Column, b: Column) =>
      a.isin(retainedIds: _*) || b.isin(retainedIds: _*)
    val judged = pairs.filter(col("__ok__") === 0)
      .join(leftFlag, Seq("l_src", "l_tgt"))
      .join(rightFlag, Seq("r_src", "r_tgt"))
      .filter(col("__l_any_ok__") === 0 || col("__r_any_ok__") === 0)
      .withColumn("__l_det__", isDetect(col("l_src"), col("l_tgt")))
      .withColumn("__r_det__", isDetect(col("r_src"), col("r_tgt")))
      .withColumn("__side__",
        when(lit(strictOrdering), "right")
          .when(col("__l_det__") && col("__r_det__"), "")
          .when(col("__l_det__"), "right")
          .when(col("__r_det__"), "left")
          .when(col("__l_any_ok__") === 0, "left")
          .otherwise("right"))
      .filter(col("__side__") =!= "")
    val excluded = judged.select(
        when(col("__side__") === "left", col("l_src")).otherwise(col("r_src")).as("src"),
        when(col("__side__") === "left", col("l_tgt")).otherwise(col("r_tgt")).as("target"))
      .distinct()
    edges.join(excluded, Seq("src", "target"), "left_anti")
  }
}
