package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed global ordering utilities.
 *
 * A `Window.orderBy(...)` with no partition collapses to ONE task — Spark
 * even warns about it. These helpers produce the same results with every
 * heavy step fully parallel, so a global rank works at 100 TB:
 * range-repartition on the sort keys (sampling-based boundaries, the same
 * machinery as the hilbert packing path), order within partitions, and
 * stitch partitions together with a numPartitions-entry literal lookup —
 * the same two-pass shape as GeoFrame.padNaPartitioned.
 */
object Ranks {

  /**
   * Global `row_number() over (order by keys)` without a single-task
   * window. Requires `keys` to be a TOTAL order (include a unique
   * tiebreak column) so the range partitioning and the ranks are
   * deterministic.
   *
   * Pass 1: `repartitionByRange(keys)` + `sortWithinPartitions(keys)`;
   * the within-partition position is `monotonically_increasing_id`
   * relative to the partition's MINIMUM id (ids are consecutive within a
   * partition per the function's contract, so `mid - min(mid)` is the
   * 0-based row index — no dependence on the id's bit layout). Pass 2:
   * one tiny per-partition aggregate `(count, min(mid))` is collected
   * eagerly — which also materializes the cache, pinning the partition
   * ids the offsets were computed from — and folded into a literal
   * pid-indexed adjustment array applied as a narrow O(1)-per-row
   * projection (no join, no window at all).
   *
   * The input is persisted across the two passes so both observe
   * identical partition ids; the returned release handle unpersists it.
   */
  def globalRowNumberWithRelease(df: DataFrame, outCol: String,
                                 numPartitions: Int,
                                 keys: Column*): (DataFrame, () => Unit) = {
    val (res, _, release) =
      globalRowNumberWithCount(df, outCol, numPartitions, keys: _*)
    (res, release)
  }

  /** [[globalRowNumberWithRelease]] plus the TOTAL row count, read off
    * the same per-partition stats collect that builds the rank offsets
    * — a caller that also needs n (every exact-quantile shape does)
    * saves one whole count() action over the ranked frame (r18,
    * guide §1.2: fewer sequential actions). */
  def globalRowNumberWithCount(df: DataFrame, outCol: String,
                               numPartitions: Int,
                               keys: Column*): (DataFrame, Long, () => Unit) = {
    require(keys.nonEmpty, "globalRowNumber requires at least one sort key")
    val bucketed = df.repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist()
    val stats = bucketed.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__base"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // rank = (mid - base) + cumulativeOffset + 1; fold everything except
    // mid into one per-partition constant, indexed by the (dense)
    // partition id in a literal array — an O(1) lookup per row
    val adjust = new Array[Long](stats.lastOption.map(_._1 + 1).getOrElse(0))
    var cum = 0L
    stats.foreach { case (pid, cnt, base) =>
      adjust(pid) = cum + 1L - base
      cum += cnt
    }
    val result =
      if (adjust.isEmpty) // empty input: keep the schema, zero rows
        bucketed.withColumn(outCol, lit(0L)).drop("__pid", "__mid")
      else
        bucketed
          .withColumn(outCol, col("__mid") +
            element_at(typedLit(adjust.toSeq), col("__pid") + 1))
          .drop("__pid", "__mid")
    (result, cum, () => { bucketed.unpersist(false); () })
  }

  /** [[globalRowNumberWithRelease]] without the unpersist handle — the
    * cache stays pinned until `spark.catalog.clearCache()`. Prefer the
    * handle variant when the caller controls result consumption. */
  def globalRowNumber(df: DataFrame, outCol: String, numPartitions: Int,
                      keys: Column*): DataFrame =
    globalRowNumberWithRelease(df, outCol, numPartitions, keys: _*)._1

  /**
   * Distributed INCLUSIVE prefix sum of `value` (cast to long, nulls
   * count 0) under the global order of `keys` — `sum(value) OVER
   * (ORDER BY keys ROWS UNBOUNDED PRECEDING)` without the single-task
   * window. Same two-pass shape as [[globalRowNumberWithRelease]]:
   * range-repartition + sort, a collected per-partition totals array
   * (cumulative offsets as an O(1) literal lookup), and the
   * within-partition running sum computed by a sorted-order partition
   * scan (mapPartitions — genuinely sequential per partition, fully
   * parallel across partitions). `keys` must be a total order.
   */
  def globalPrefixSumWithRelease(df: DataFrame, value: Column, outCol: String,
                                 numPartitions: Int,
                                 keys: Column*): (DataFrame, () => Unit) = {
    val (res, _, release) =
      globalPrefixSumWithTotal(df, value, outCol, numPartitions, keys: _*)
    (res, release)
  }

  /** [[globalPrefixSumWithRelease]] plus the GLOBAL total of `value`,
    * read off the per-partition totals collect that builds the offsets
    * — saves the caller a separate sum/max action over the result
    * (r18, guide §1.2: fewer sequential actions). */
  def globalPrefixSumWithTotal(df: DataFrame, value: Column, outCol: String,
                               numPartitions: Int,
                               keys: Column*): (DataFrame, Long, () => Unit) = {
    require(keys.nonEmpty, "globalPrefixSum requires at least one sort key")
    val bucketed = df
      .withColumn("__pval", coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val stats = bucketed.groupBy(col("__pid"))
      .agg(sum(col("__pval")).as("__t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = new Array[Long](stats.lastOption.map(_._1 + 1).getOrElse(0))
    var cum = 0L
    stats.foreach { case (pid, t) => offsets(pid) = cum; cum += t }

    val pvalIdx = bucketed.schema.fieldIndex("__pval")
    val outSchema = bucketed.schema
      .add(org.apache.spark.sql.types.StructField("__run",
        org.apache.spark.sql.types.LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val scanned = bucketed.mapPartitions { it =>
      var run = 0L
      it.map { row =>
        run += row.getLong(pvalIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ run)
      }
    }(enc)
    val result =
      if (offsets.isEmpty)
        scanned.withColumn(outCol, col("__run")).drop("__pval", "__pid", "__run")
      else
        scanned
          .withColumn(outCol, col("__run") +
            element_at(typedLit(offsets.toSeq), col("__pid") + 1))
          .drop("__pval", "__pid", "__run")
    (result, cum, () => { bucketed.unpersist(false); () })
  }

  /** [[globalPrefixSumWithRelease]] without the unpersist handle. */
  def globalPrefixSum(df: DataFrame, value: Column, outCol: String,
                      numPartitions: Int, keys: Column*): DataFrame =
    globalPrefixSumWithRelease(df, value, outCol, numPartitions, keys: _*)._1

  /**
   * Distributed `rank() / percent_rank() / cume_dist() OVER (ORDER BY
   * value)` — the remaining GLOBAL window shapes users reach for
   * constantly, without the single-task window they collapse to in
   * vanilla Spark. Null values are excluded (the ANSI functions order
   * them to one end; filter or coalesce first if they matter).
   *
   * Shape: ONE keyed aggregate collapses the input to per-VALUE counts
   * (map-side combine absorbs ties — the whole point of rank ties is
   * that this table is no bigger than the distinct-value count), the
   * distributed prefix-sum machinery ranks the counts table under the
   * value order (no driver-side data beyond the per-partition totals
   * array), and one equi-join on the value carries (rank, percent_rank,
   * cume_dist) back to the rows. No window operator appears in the plan
   * at all; every step is a keyed shuffle that scales horizontally.
   *
   * Exact ANSI semantics: rank = 1 + |{v' < v}| (ties share),
   * percent_rank = (rank-1)/(n-1) (0 when n = 1), cume_dist =
   * |{v' <= v}| / n — both ratios are IEEE divisions of exact integers,
   * so they hash-match any engine computing the same definition.
   */
  def globalRankStats(df: DataFrame, value: Column,
                      numPartitions: Int = 32,
                      rankCol: String = "rank",
                      denseCol: String = "dense_rank",
                      pctCol: String = "percent_rank",
                      cumeCol: String = "cume_dist"): DataFrame = {
    val reserved = Seq("__v", "__c", "__cum", rankCol, denseCol, pctCol, cumeCol)
    require(!df.columns.exists(reserved.contains),
      s"input columns collide with reserved names $reserved")
    val base = df.withColumn("__v", value).where(col("__v").isNotNull)
    val counts = base.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    // n = Σ counts rides out of the prefix-sum machinery's own offsets
    // collect (r18, guide §1.2) — the old max(__cum) aggregate was one
    // more sequential action over the checkpointed counts table
    val (pref, n, release) = globalPrefixSumWithTotal(
      counts, col("__c"), "__cum", numPartitions, col("__v"))
    // dense_rank = ordinal of the VALUE = row number of its counts row
    // (one row per distinct value) — a second two-pass over the
    // already-collapsed counts table, not the input
    val (denseRanked, release2) = globalRowNumberWithRelease(
      pref, denseCol, numPartitions, col("__v"))
    // the counts table is tiny relative to the input; pin it so the
    // final join reads one materialization
    val prefC = denseRanked.localCheckpoint(true)
    release2(); release()
    val stats = prefC.select(col("__v"),
      (col("__cum") - col("__c") + 1L).as(rankCol),
      col(denseCol),
      (when(lit(n) > 1L, (col("__cum") - col("__c")).cast("double") / (n - 1L))
        .otherwise(0.0)).as(pctCol),
      (col("__cum").cast("double") / n).as(cumeCol))
    base.join(stats, Seq("__v")).drop("__v")
  }

  /**
   * Distributed SWEEP-LINE concurrency gauge: for a table of half-open
   * intervals [start, end), the number of intervals open at each event
   * point — "how many sessions/queries/locks are active right now",
   * the classic overlap-counting analytic that a self-join would turn
   * into an O(n·k) range join and a vanilla window into a single-task
   * sort.
   *
   * Shape: each interval becomes a +1 row at start and a −1 row at end
   * (2n narrow rows), and the gauge is the running sum under the
   * (t, delta) total order — the distributed two-pass prefix sum, so
   * the only data-sized operation is one range shuffle. Ordering
   * deltas ascending applies ends BEFORE starts at an equal timestamp:
   * half-open semantics (an interval ending exactly when another
   * starts never overlaps it).
   *
   * Ties: equal (t, delta) rows are interchangeable — the MULTISET of
   * running values after any permutation is identical (each of k equal
   * +1s lands on base+1..base+k) — so any aggregate of the gauge
   * (max/min per bucket, global peak) is deterministic and
   * cross-engine gateable even though per-ROW attribution among ties
   * is not.
   *
   * Returns (t, delta, gauge) — gauge = open-interval count AFTER
   * applying the row's delta. Aggregate per time bucket for the
   * monitoring rollup.
   *
   * Intervals with a NULL start or end are EXCLUDED (standard SQL
   * comparison semantics — an unbounded interval has no place on the
   * sweep; a null-keyed delta would sort to the front and offset every
   * gauge value). Close an ongoing interval at a horizon timestamp
   * first if it should count.
   */
  def sweepConcurrency(intervals: DataFrame, startCol: String,
                       endCol: String,
                       numPartitions: Int = 32): DataFrame = {
    // ONE source scan: each interval explodes to its two delta rows
    val deltas = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(explode(array(
        struct(col(startCol).cast("long").as("t"), lit(1L).as("delta")),
        struct(col(endCol).cast("long").as("t"), lit(-1L).as("delta"))))
        .as("__e"))
      .select(col("__e.t").as("t"), col("__e.delta").as("delta"))
    globalPrefixSum(deltas, col("delta"), "gauge", numPartitions,
      col("t"), col("delta"))
  }
}
