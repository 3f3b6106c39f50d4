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
   * BFS level assignment from root nodes (reference GT:7-78
   * `get_bfs_levels`): returns (node_id, level) with level 0 at roots;
   * unreachable nodes are absent. Cycle-tolerant — a node keeps its
   * first (minimal) level.
   */
  def bfsLevels(edges: DataFrame, roots: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("target"))
    var levels = roots.select(col("node_id")).distinct()
      .withColumn("level", lit(0))
    var frontier = levels
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      // localCheckpoint: materializes the frontier AND truncates lineage,
      // so iteration depth never grows the plan (a cache alone leaves a
      // recursive DAG that re-plans ever larger each round)
      val next = frontier.join(e, frontier("node_id") === e("src"), "inner")
        .select(col("target").as("node_id"), (col("level") + 1).as("level"))
        .join(levels.select(col("node_id").as("seen")),
          col("node_id") === col("seen"), "left_anti")
        .groupBy("node_id").agg(min("level").as("level"))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        levels = levels.union(next)
        frontier = next
      }
      i += 1
    }
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
    var e = edges
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
    val tagged = edges.join(srcs, edges("target") === col("__s__"), "left")
      .withColumn("__is_leaf__", col("__s__").isNull).drop("__s__")
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
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src").as("a"), col("target").as("b"))
      .union(edges.select(col("target").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("node_id")).distinct()
      .withColumn("component", col("node_id"))
      .localCheckpoint()
    var i = 0
    var changed = 1L
    while (i < maxIter && changed > 0) {
      val nbrMin = sym.join(labels.select(col("node_id").as("b"), col("component")),
          Seq("b"), "inner")
        .groupBy(col("a").as("node_id"))
        .agg(min(col("component")).as("__nbr_min__"))
      val hopped = labels.join(nbrMin, Seq("node_id"), "left")
        .select(col("node_id"), col("component").as("__old__"),
          least(col("component"), coalesce(col("__nbr_min__"), col("component")))
            .as("component"))
        .localCheckpoint() // referenced twice below (self-join)
      // pointer doubling: component <- component's component. Labels are
      // node ids, so the lookup is a self-join on the hopped labels.
      val next = hopped.join(
          hopped.select(col("node_id").as("component"),
            col("component").as("__cc__")),
          Seq("component"), "left")
        .select(col("node_id"),
          coalesce(col("__cc__"), col("component")).as("component"),
          (coalesce(col("__cc__"), col("component")) < col("__old__")).as("__chg__"))
        .localCheckpoint()
      // the final allowed iteration skips the fixpoint probe (its result
      // could not trigger another round anyway)
      changed = if (i + 1 < maxIter) next.filter(col("__chg__")).count() else 0L
      labels = next.drop("__chg__")
      i += 1
    }
    labels
  }

  /**
   * DAG ancestor paths from roots (reference GT:80-171
   * `get_forward_edges_only`, simplified to the path-count semantics):
   * per node, the number of distinct paths from any root and the set of
   * direct ancestors, via level-synchronous propagation.
   */
  def forwardPaths(edges: DataFrame, roots: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("target"))
    val base = roots.select(col("node_id")).distinct()
      .withColumn("n_paths", lit(1L)).localCheckpoint()
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
      val next = base.select(col("node_id"), col("n_paths"))
        .unionByName(contrib.select(col("node_id"), col("n_paths")))
        .groupBy("node_id").agg(sum("n_paths").as("n_paths"))
        .localCheckpoint()
      // sum over an empty frame is NULL, not 0 (empty roots input)
      val total = Option(next.agg(sum("n_paths")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      if (total == prevTotal) done = true
      prevTotal = total
      paths = next
      i += 1
    }
    paths
  }
}
