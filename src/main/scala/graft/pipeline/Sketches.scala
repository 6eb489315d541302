package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch-based approximate statistics — the 100 TB profiling path.
 * Exact per-key distincts/quantiles over a petabyte corpus shuffle the
 * full key universe; these run in fixed memory per group and merge
 * associatively, so partial aggregation (map-side combine) does almost
 * all the work and only kilobyte-sized sketch states shuffle.
 *
 * All built on Spark's native sketch aggregates (HyperLogLog++,
 * KLL-style percentile_approx, the Apache DataSketches HLL surface) —
 * codegen'd built-ins, no UDAFs. Approximate results can't be
 * hash-compared against a DuckDB oracle (different sketch
 * implementations); correctness is gated in SketchesSpec by error
 * bounds against the exact answers at test scale, and the driver
 * records the rows-only check.
 */
object Sketches {

  /** Per-group approximate distinct count (HyperLogLog++) next to the
    * group's row count. `rsd` = target relative standard deviation. */
  def approxDistinctByGroup(df: DataFrame, group: Column, value: Column,
                            rsd: Double = 0.05): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(approx_count_distinct(value, rsd).as("approx_distinct"),
        count(value).as("n"))

  /** Approximate quantiles of `value` per group (percentile_approx with
    * accuracy `acc`; higher = tighter, memory O(acc)). */
  def approxQuantilesByGroup(df: DataFrame, group: Column, value: Column,
                             probs: Seq[Double],
                             acc: Int = 10000): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(percentile_approx(value, typedLit(probs), lit(acc)).as("quantiles"))

  /**
   * The MERGEABLE distinct-count shape: one persistable HLL sketch per
   * group (DataSketches binary), union-merged to any coarser grouping
   * later WITHOUT rescanning the data. At scale this is the difference
   * between profiling a corpus once and re-aggregating per report: the
   * per-partition/per-day sketches are tiny, live next to the data like
   * the spatial sidecar bounds, and roll up associatively.
   */
  def hllSketchByGroup(df: DataFrame, group: Column, value: Column,
                       lgK: Int = 12): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"))

  /** Union the per-group sketches of [[hllSketchByGroup]] to a single
    * estimate — the "roll-up without rescan" step. */
  def hllUnionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("global_distinct"))
}
