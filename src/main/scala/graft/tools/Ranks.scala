package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed global ordering utilities.
 *
 * A `Window.orderBy(...)` with no partition collapses to ONE task — Spark
 * even warns about it. These helpers produce the same results with every
 * heavy step fully parallel, so a global rank works at 100 TB:
 * range-repartition on the sort keys (sampling-based boundaries, the same
 * machinery as the hilbert packing path), order within partitions, and
 * stitch partitions together with a numPartitions-row broadcast — the
 * same two-pass shape as GeoFrame.padNaPartitioned.
 */
object Ranks {

  /**
   * Global `row_number() over (order by keys)` without a single-task
   * window. Requires `keys` to be a TOTAL order (include a unique
   * tiebreak column) so the range partitioning and the ranks are
   * deterministic.
   *
   * Pass 1: `repartitionByRange(keys)` + `sortWithinPartitions(keys)`;
   * the within-partition position comes from `monotonically_increasing_id`
   * (partitionId·2^33 + rowIndex — a narrow, shuffle-free projection over
   * the sorted partition). Pass 2: per-partition row counts (a
   * numPartitions-row aggregate) become cumulative offsets, broadcast
   * back. The frame is persisted across the two passes so both observe
   * identical partition ids; the cache stays pinned until the caller
   * drops it (spark.catalog.clearCache() or unpersist).
   */
  def globalRowNumber(df: DataFrame, outCol: String, numPartitions: Int,
                      keys: Column*): DataFrame = {
    require(keys.nonEmpty, "globalRowNumber requires at least one sort key")
    val bucketed = df.repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist()
    val counts = bucketed.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    // cumulative offset of each partition — numPartitions rows, so the
    // single-task window here is over a tiny frame
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    bucketed.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol,
        col("__mid") - col("__pid").cast("long") * lit(1L << 33) + col("__off") + 1)
      .drop("__pid", "__mid", "__off")
  }
}
