package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count summaries (beyond-parity; the reference's only
 * distinct counter is exact `uniq_count` — funclib.py:60-66). Wraps
 * Spark's Apache DataSketches HLL functions so pipelines can materialize
 * a SKETCH COLUMN at a fine grain (e.g. per source per day) and
 * re-aggregate it later without touching raw data — the 100 TB pattern
 * for "distinct users per <anything>" dashboards: the daily sketch table
 * is millions of times smaller than the event log, and rollups to any
 * coarser grain are a `hllMerge` + `hllEstimate`, not a rescan.
 *
 * Error contract: a DataSketches HLL sketch is EXACT while it is still
 * in coupon (list/set) mode — up to 3/4 * 2^(lgK-3) distinct values,
 * i.e. 384 at the default lgK = 12 (measured: 256 distinct exact at
 * every lgK, 400 already off by 1-3 at lgK 12) — and ~1.04/sqrt(2^lgK)
 * relative standard error beyond. The oracle gate (q_hll_distinct_union)
 * pins the exact regime; the law specs cover merge associativity.
 */
object Sketches {

  /** Aggregate: build an HLL sketch (binary, mergeable) over a column. */
  def hllSketch(e: Column, lgK: Int = 12): Column = hll_sketch_agg(e, lgK)

  /** Aggregate: merge sketch partials produced by [[hllSketch]]. */
  def hllMerge(sketch: Column): Column = hll_union_agg(sketch, lit(false))

  /** Scalar: distinct-count estimate from a sketch column. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** One-shot distinct-count estimate (sketch + estimate fused). */
  def hllDistinct(e: Column, lgK: Int = 12): Column =
    hll_sketch_estimate(hll_sketch_agg(e, lgK))

  // ===== Theta sketches: the mergeable DISTINCT algebra =====
  // HLL only unions; Theta also intersects and subtracts, so audience
  // overlap ("distinct users who did A and B / A but not B") over the
  // pre-aggregated sketch table is scalar arithmetic, never a rescan or
  // a count(DISTINCT) self-join. Exact while distinct <= nomEntries;
  // ~1/sqrt(nomEntries) RSE beyond. plans/ThetaSketchAgg.scala.

  import org.apache.spark.sql.graft.bridge
  import graft.plans.{ThetaSketchAgg, ThetaUnionAgg, ThetaSketchOps,
    KllSketchAgg, KllMergeAgg, KllQuantileExpr, KllCountExpr}

  /** Aggregate: build a Theta sketch (binary, mergeable) over a column. */
  def thetaSketch(e: Column, nomEntries: Int = 4096): Column =
    bridge.toColumn(ThetaSketchAgg(bridge.toExpression(e), nomEntries)
      .toAggregateExpression())

  /** Aggregate: union sketch partials produced by [[thetaSketch]]. */
  def thetaUnion(sketch: Column, nomEntries: Int = 4096): Column =
    bridge.toColumn(ThetaUnionAgg(bridge.toExpression(sketch), nomEntries)
      .toAggregateExpression())

  /** Scalar: union of two sketch columns. */
  def thetaUnionPair(a: Column, b: Column, nomEntries: Int = 4096): Column =
    bridge.toColumn(ThetaSketchOps.ThetaUnionPair(
      bridge.toExpression(a), bridge.toExpression(b), nomEntries))

  /** Scalar: intersection of two sketch columns. */
  def thetaIntersect(a: Column, b: Column): Column =
    bridge.toColumn(ThetaSketchOps.ThetaIntersect(
      bridge.toExpression(a), bridge.toExpression(b)))

  /** Scalar: set difference `a \ b` of two sketch columns. */
  def thetaANotB(a: Column, b: Column): Column =
    bridge.toColumn(ThetaSketchOps.ThetaANotB(
      bridge.toExpression(a), bridge.toExpression(b)))

  /** Scalar: distinct-count estimate (long; exact-regime exact). */
  def thetaEstimate(sketch: Column): Column =
    bridge.toColumn(ThetaSketchOps.ThetaEstimate(bridge.toExpression(sketch)))

  // ===== KLL sketches: mergeable quantiles =====
  // percentile_approx answers one question per scan; a KLL sketch column
  // materialized per fine grain answers ANY quantile at ANY rollup from
  // kilobyte summaries. Exact while total n <= k; deterministic
  // ~1.65/sqrt(k) rank error beyond. plans/KllQuantileAgg.scala.

  /** Aggregate: build a KLL doubles sketch (binary, mergeable). */
  def kllSketch(e: Column, k: Int = 200): Column =
    bridge.toColumn(KllSketchAgg(bridge.toExpression(e), k)
      .toAggregateExpression())

  /** Aggregate: merge KLL partials produced by [[kllSketch]]. */
  def kllMerge(sketch: Column, k: Int = 200): Column =
    bridge.toColumn(KllMergeAgg(bridge.toExpression(sketch), k)
      .toAggregateExpression())

  /** Scalar: quantile probe (INCLUSIVE rank: the sorted item at 1-based
    * index ceil(q*n) in the exact regime). NULL on an empty sketch. */
  def kllQuantile(sketch: Column, q: Double): Column =
    bridge.toColumn(KllQuantileExpr(bridge.toExpression(sketch), q))

  /** Scalar: number of values folded into a KLL sketch. */
  def kllN(sketch: Column): Column =
    bridge.toColumn(KllCountExpr(bridge.toExpression(sketch)))
}
