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
}
