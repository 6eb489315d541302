package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.Bridge
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

  /** Column-level data-quality profile: one long-form row per column
    * with total count, null count, and EXACT distinct cardinality —
    * the dataset-card / schema-drift report every curation run emits.
    *
    * One aggregation pass: Catalyst plans the multiple exact distincts
    * via Expand (input replicated ×|cols| before the shuffle) — the
    * standard exact-multi-distinct trade; swap count_distinct for
    * approx_count_distinct when profiling very wide tables at scale. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__nd_$c")))
    val stackArgs = cols.map(c =>
      s"'$c', __n, __n - `__nn_$c`, `__nd_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) " +
        "as (col_name, n, n_null, n_distinct)"))
  }

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

  /** [[approxQuantilesByGroup]] in LONG form — one (grp, prob, quantile)
    * row per requested probability instead of an array cell. Scalar
    * columns survive any downstream tooling (sorts, hashes, harness
    * frames) that can't order array cells; same single aggregation. */
  def approxQuantilesByGroupLong(df: DataFrame, group: Column, value: Column,
                                 probs: Seq[Double],
                                 acc: Int = 10000): DataFrame =
    approxQuantilesByGroup(df, group, value, probs, acc)
      .select(col("grp"), posexplode(col("quantiles")))
      .select(col("grp"),
        element_at(typedLit(probs), col("pos") + 1).as("prob"),
        col("col").as("quantile"))

  /**
   * EXACT discrete quantiles of `value` — the path when an exact answer
   * is required at any scale (the sketch is approximate; its
   * exact-degenerate config only holds while groups fit the accuracy
   * budget). quantile_p = the smallest value with global rank >=
   * ceil(p*n), DuckDB's quantile_disc convention.
   *
   * No single-task window anywhere: the global rank is
   * [[graft.tools.Ranks.globalRowNumberWithRelease]]'s two-pass
   * range-partition shape, n is a count of the already-cached ranked
   * frame, and the |probs| target ranks join in as a broadcast literal.
   * Ties need no tiebreak: equal values make rank assignment among them
   * arbitrary but the VALUE at any rank deterministic. Returns
   * (prob, quantile), localCheckpoint-pinned (|probs| rows) so the rank
   * cache can be released eagerly.
   */
  def exactQuantiles(df: DataFrame, value: Column, probs: Seq[Double],
                     numPartitions: Int = 32): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      "probs must lie in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.as("__v")).where(col("__v").isNotNull)
    // n rides out of the rank machinery's own offsets collect (r18,
    // guide §1.2) — the old ranked.count() was one more sequential
    // action over the cached frame
    val (ranked, n, release) = graft.tools.Ranks.globalRowNumberWithCount(
      vals, "__rank", numPartitions, col("__v"))
    // ceil over a RELATIVELY nudged product: the double p*n can land
    // one ulp above the true integer (0.57*100 -> 57.000000000000006
    // -> ceil 58, but quantile_disc says 57). A relative factor keeps
    // absorbing one-ulp rounding at ANY magnitude (an absolute epsilon
    // stops working once ulp(p*n) exceeds it, ~4.5e9 rows for 1e-6);
    // it can only misrank when the true p*n sits within p*n*1e-9 above
    // an integer. Empirically matches DuckDB across an (n, p) sweep.
    val targets = probs
      .map(p => (p, math.max(1L, math.ceil(p * n * (1 - 1e-9)).toLong)))
      .toDF("prob", "__target")
    val out = ranked
      .join(broadcast(targets), col("__rank") === col("__target"))
      .select(col("prob"), col("__v").as("quantile"))
      .localCheckpoint(true)
    release()
    out
  }

  /**
   * [[exactQuantiles]] for SEVERAL columns in ONE pass: the input is
   * melted to (metric, value) long form — one scan of `df` regardless
   * of metric count — and ranked ONCE under the (metric, value)
   * composite order, so each metric occupies a contiguous rank range
   * and its quantile_disc targets resolve against a per-metric offset.
   * The offsets are a |metrics|-row collected aggregate (bounded driver
   * state); the same two-pass distributed rank as [[exactQuantiles]],
   * no single-task window. Values are cast to long (the integer-staged
   * convention). Returns (metric, prob, quantile), checkpoint-pinned
   * (|metrics|·|probs| rows) so the rank cache releases eagerly.
   */
  def exactQuantilesMulti(df: DataFrame, metrics: Seq[(String, Column)],
                          probs: Seq[Double],
                          numPartitions: Int = 32): DataFrame = {
    require(metrics.nonEmpty, "metrics must be non-empty")
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      "probs must lie in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val melted = df
      .select(explode(array(metrics.map { case (m, c) =>
        struct(lit(m).as("m"), c.cast("long").as("v")) }: _*)).as("__mv"))
      .select(col("__mv.m").as("__m"), col("__mv.v").as("__v"))
      .where(col("__v").isNotNull)
    val (ranked, release) = graft.tools.Ranks.globalRowNumberWithRelease(
      melted, "__rank", numPartitions, col("__m"), col("__v"))
    val spans = ranked.groupBy(col("__m"))
      .agg(count(lit(1)).as("n"), min(col("__rank")).as("r0"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // an all-null metric melts away before ranking and would otherwise
    // vanish from the output silently — map-lookup callers (e.g.
    // rfm_segments' cut) then die with a bare NoSuchElementException.
    // Fail fast NAMING the offending column instead.
    val missing = metrics.map(_._1).toSet -- spans.map(_._1).toSet
    require(missing.isEmpty,
      s"exactQuantilesMulti: metric(s) ${missing.mkString(", ")} have no " +
        "non-null values — quantiles are undefined for an all-null column")
    // same relative nudge as exactQuantiles (see the comment there)
    val targets = spans.flatMap { case (m, n, r0) =>
      probs.map(p => (m, p,
        r0 - 1L + math.max(1L, math.ceil(p * n * (1 - 1e-9)).toLong)))
    }.toSeq.toDF("metric", "prob", "__target")
    val out = ranked
      .join(broadcast(targets), col("__rank") === col("__target") &&
        col("__m") === col("metric"))
      .select(col("metric"), col("prob"), col("__v").as("quantile"))
      .localCheckpoint(true)
    release()
    out
  }

  /**
   * Exact equi-depth histogram: `buckets` buckets bounded by the exact
   * interior quantiles (quantile_disc convention), per-bucket count /
   * min / max. The equal-POPULATION complement to the equal-WIDTH
   * doc_length_histogram — the shape that stays readable under
   * heavy-tailed values, and the boundary table range-partitioners and
   * BI layers consume. Heavy ties can legitimately leave interior
   * buckets empty (boundaries repeat); emitted buckets are exactly the
   * non-empty ones.
   *
   * Scale shape: boundaries come from the distributed exact-quantile
   * machinery (two-pass rank, no single-task window) and are
   * buckets−1 collected values (bounded small state) folded back in as
   * a literal; bucket assignment is then a narrow per-row fold and the
   * final rollup one small aggregate.
   */
  def equiDepthHistogram(df: DataFrame, value: Column, buckets: Int,
                         numPartitions: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val v = value.cast("long")
    if (buckets == 1)
      // no boundaries to find: a single pass rolls everything into
      // bucket 1, exactly like the interior-empty branch always did
      return df.select(v.as("__v"), lit(1L).as("bucket"))
        .where(col("__v").isNotNull)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("__v")).as("min_v"),
          max(col("__v")).as("max_v"))
    // Inline the exact-quantile rank machinery instead of calling
    // exactQuantiles (r18, guide §1.2/§5): the ranked frame is already
    // cached and carries __v, so the per-bucket rollup can aggregate IT
    // — the old shape re-scanned and re-null-filtered the whole source
    // a second time for the rollup, and paid a separate count() plus an
    // intermediate checkpoint inside exactQuantiles. Same boundaries,
    // same value-based bucket assignment, identical rows out.
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val vals = df.select(v.as("__v")).where(col("__v").isNotNull)
    val (ranked, n, release) = graft.tools.Ranks.globalRowNumberWithCount(
      vals, "__rank", numPartitions, col("__v"))
    // same relative nudge as exactQuantiles (see the comment there)
    val targets = probs
      .map(p => (p, math.max(1L, math.ceil(p * n * (1 - 1e-9)).toLong)))
      .toDF("prob", "__target")
    val interior = ranked
      .join(broadcast(targets), col("__rank") === col("__target"))
      .select(col("prob"), col("__v"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(_._1).map(_._2).toSeq
    val bucket = aggregate(typedLit(interior), lit(1L),
      (acc, b) => acc + when(col("__v") > b, 1L).otherwise(0L))
    // pin the (≤ buckets rows) rollup before dropping the rank cache it
    // reads — the caller's action then replays the checkpoint only
    val out = ranked
      .select(col("__v"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"))
      .localCheckpoint(true)
    release()
    out
  }

  /**
   * Exact moment statistics for the covariance matrix of a vector
   * column (PCA / whitening / feature-drift prep): long-form
   * (i, j, sum_xy, sum_xi, sum_xj, n) for the upper triangle, from
   * which cov(i,j) = sum_xy/n − sum_xi·sum_xj/n². Values quantize to
   * round(x·scale) integers first, so every sum is an exact
   * order-independent integer (the embedding_centroids convention) —
   * hash-stable cross-engine. Exactness contract: n·scale²·|x|² must
   * stay below 2⁵³ (lower `scale` for larger corpora).
   *
   * Scale shape: ONE narrow projection computes the dim(dim+1)/2
   * per-row products inside codegen, ONE aggregate (map-side partials
   * via the element-wise vector_sum) collapses them; the only
   * post-aggregate work is exploding a single row. Nothing about the
   * corpus ever shuffles.
   */
  def vectorCovarianceStats(df: DataFrame, vecCol: String, dim: Int,
                            scale: Double = 1000.0): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    // upper-triangle product sums via the imperative partial aggregate
    // (VectorOuterSumAgg): the Catalyst flatten(transform(sequence...))
    // formulation evaluated interpreted lambdas and materialized a
    // dim(dim+1)/2 array PER ROW — ~250µs/row at dim=64 vs ~5µs now,
    // identical output (the aggregate replicates round()'s HALF_UP
    // quantization bit-for-bit; VectorOuterSumSpec pins equality)
    val q = transform(col(vecCol), x => round(x.cast("double") * scale))
    val iIdx = (0 until dim).flatMap(i => (i until dim).map(_ => i.toLong))
    val jIdx = (0 until dim).flatMap(i => (i until dim).map(_.toLong))
    df.select(col(vecCol).as("__v"), q.as("__q"))
      .agg(graft.pipeline.Tx.vector_outer_sum(col("__v"), scale, dim).as("__sp"),
        graft.pipeline.Tx.vector_sum(col("__q")).as("__sx"),
        count(lit(1)).as("n"))
      .select(posexplode(col("__sp")), col("__sx"), col("n"))
      .select(element_at(typedLit(iIdx), col("pos") + 1).as("i"),
        element_at(typedLit(jIdx), col("pos") + 1).as("j"),
        col("col").cast("long").as("sum_xy"), col("__sx"), col("n"))
      .select(col("i"), col("j"), col("sum_xy"),
        element_at(col("__sx"), col("i").cast("int") + 1).cast("long")
          .as("sum_xi"),
        element_at(col("__sx"), col("j").cast("int") + 1).cast("long")
          .as("sum_xj"),
        col("n"))
  }

  /**
   * Key-skew profile: the distribution of per-key row counts as
   * long-form (metric, value) rows — n_rows, n_keys, max_n, the
   * hottest key's ppm share, and exact count quantiles. THE diagnostic
   * before any keyed shuffle at scale: it answers "does this key need
   * salting / AQE skew handling" with numbers instead of a failed
   * stage. All-integer output (shares staged as ppm via integer
   * division) so the profile is hash-exact cross-engine.
   *
   * Scale shape: one keyed aggregate builds the counts table (map-side
   * partials absorb the skew being measured — a hot key arrives
   * pre-combined), then one tiny aggregate + the distributed exact
   * quantile machinery over |keys| rows. Nothing driver-side beyond
   * the |probs|+4 result rows.
   */
  def keySkewProfile(df: DataFrame, key: Column,
                     probs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                     numPartitions: Int = 32): DataFrame = {
    val counts = df.groupBy(key.as("__k")).agg(count(lit(1)).as("n")).persist()
    val qs = exactQuantiles(counts, col("n"), probs, numPartitions)
      .select(concat(lit("p"), (col("prob") * 100).cast("int").cast("string"),
          lit("_n")).as("metric"),
        col("quantile").cast("long").as("value"))
    val stats = counts
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"))
      .select(explode(map(
        lit("n_keys"), col("n_keys"),
        lit("n_rows"), col("n_rows"),
        lit("max_n"), col("max_n"),
        lit("top1_share_ppm"), expr("(1000000 * max_n) div n_rows"))))
      .select(col("key").as("metric"), col("value"))
    // both branches are already materialized or tiny; pin before
    // dropping the counts cache they both read
    val out = stats.unionAll(qs).localCheckpoint(true)
    counts.unpersist(false)
    out
  }

  /**
   * EXACT discrete per-group quantiles: rank within each group by a
   * group-partitioned window (distributed across groups; skew bound =
   * largest single group), |probs| broadcast rows per input row,
   * rank-selection filter. Returns (grp, prob, quantile).
   */
  def exactQuantilesByGroup(df: DataFrame, group: Column, value: Column,
                            probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      "probs must lie in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("__v"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    df.select(group.as("grp"), value.as("__v"))
      .where(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .crossJoin(broadcast(probs.toDF("prob")))
      // same relative nudge as exactQuantiles: absorb p*cnt rounding
      .where(col("__rn") === greatest(lit(1L),
        ceil(col("prob") * col("__cnt") * lit(1 - 1e-9)).cast("long")))
      .select(col("grp"), col("prob"), col("__v").as("quantile"))
  }

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

  /**
   * EXACT global top-k heavy hitters WITHOUT shuffling the full key
   * universe — the scale path for "most frequent tokens/domains/keys in
   * a 100 TB corpus", where a plain groupBy+orderBy+limit shuffles
   * every distinct key:
   *
   *  1. One narrow pass computes a Misra-Gries summary (capacity
   *     `capacity`) per partition; summaries (≤ capacity entries each)
   *     are merged on the driver by counter addition and the standard
   *     rank-(capacity+1) offset subtraction, which keeps the merged
   *     error ≤ N/capacity (Agarwal et al., "Mergeable Summaries").
   *     By pigeonhole any key with global count > N/capacity has
   *     partition count > n_p/capacity somewhere, so it SURVIVES into
   *     the merged candidate set.
   *  2. A second pass recounts ONLY the ≤ `capacity` candidate keys
   *     (broadcast semi-join); the groupBy shuffles candidate keys
   *     only, with map-side partial aggregation.
   *
   * The result is CERTIFIED exact: the k-th count must exceed
   * N/capacity (every non-candidate is ≤ N/capacity, so none can reach
   * rank k) or this throws IllegalStateException — raise `capacity`.
   * Ties beyond rank k break lexicographically on the key, so the
   * result is deterministic. Returns k local rows (v, n), count-desc.
   *
   * Driver memory: one merged summary plus `numPartitions × capacity`
   * collected entries — e.g. 10k partitions × 8k keys ≈ low GBs of
   * short strings; size capacity accordingly.
   */
  def exactTopK(df: DataFrame, value: Column, k: Int, capacity: Int): DataFrame = {
    require(k >= 1 && capacity > k, "need capacity > k >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(value.cast("string").as("v")).where(col("v").isNotNull)

    // pass 1: per-partition Misra-Gries; emit an explicitly-flagged
    // (marker, n_p) row-count entry per partition so N needs no second
    // scan of the data
    val summaries: Array[(String, Long, Boolean)] = vals.as[String].mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long]()
      var np = 0L
      while (it.hasNext) {
        val v = it.next()
        np += 1
        val c = counts.getOrDefault(v, 0L)
        if (c != 0L) counts.put(v, c + 1)
        else if (counts.size < capacity) counts.put(v, 1L)
        else {
          // decrement-all; drop zeros (amortized O(1) per input row)
          val e = counts.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
      out += (("", np, true))
      counts.forEach((key, cnt) => out += ((key, cnt, false)))
      out.iterator
    }.collect()

    val n = summaries.iterator.filter(_._3).map(_._2).sum
    // driver merge: add counters, then subtract the (capacity+1)-largest
    // merged counter from all (the mergeable-summaries offset step)
    val merged = new scala.collection.mutable.HashMap[String, Long]()
    summaries.iterator.filterNot(_._3).foreach { case (key, cnt, _) =>
      merged.update(key, merged.getOrElse(key, 0L) + cnt)
    }
    val candidates: Seq[String] =
      if (merged.size <= capacity) merged.keys.toSeq
      else {
        val cut = merged.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        merged.iterator.collect { case (key, c) if c > cut => key }.toSeq
      }

    // pass 2: exact recount of candidates only (broadcast semi-join)
    val candDf = candidates.toDF("v")
    val counted = vals.join(broadcast(candDf), Seq("v"), "left_semi")
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (v, c) => (-c, v) }

    if (counted.length < k)
      throw new IllegalStateException(
        s"top-$k not certifiable: only ${counted.length} candidates; " +
          "raise capacity")
    val kth = counted(k - 1)._2
    if (kth.toDouble <= n.toDouble / capacity)
      throw new IllegalStateException(
        s"top-$k not certifiable: kth count $kth <= N/capacity = " +
          s"${n.toDouble / capacity}; raise capacity")
    counted.take(k).toSeq.toDF("v", "n")
  }

  // -- count–min sketch ----------------------------------------------------
  // Unlike the HLL/KLL aggregates above, this sketch is DETERMINISTIC
  // given its row constants: every cell count and every estimate is
  // exactly replayable by an independent engine, so the driver's DuckDB
  // oracle can hash-gate it (rare for a sketch).

  /** Per-row multipliers: the 32-bit xxhash primes (public constants).
    * Depth is capped at 4 — the standard ε·δ trade lives in width. */
  private val cmsRowConsts = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)

  /** Bucket of `key` (a 64-bit avalanche-mixed hash) in CMS row `row`
    * with 2^logWidth buckets: multiplicative hashing — multiply by an
    * odd constant mod 2^64 (Java long wrap) and keep the TOP logWidth
    * bits (the low bits of an odd-multiply depend only on the low input
    * bits; the top bits mix all of them). Wrap semantics need a custom
    * expression under ANSI mode ([[graft.functions.WrapMulShift]]). */
  def cmsBucket(key: Column, row: Int, logWidth: Int): Column =
    Bridge.column(graft.functions.WrapMulShift(
      Bridge.expression(key), cmsRowConsts(row), 64 - logWidth))

  /** Count–min sketch cells from one key occurrence per input row:
    * (row, bucket, cnt), at most depth·2^logWidth rows. ONE aggregation
    * over a ×depth fan-out; map-side partial aggregation collapses each
    * partition to ≤ depth·2^logWidth cells before the shuffle, so the
    * exchange carries kilobytes regardless of corpus size — the whole
    * point of sketching a 100 TB token stream. */
  def cmsCells(keys: DataFrame, key: Column, depth: Int = 4,
               logWidth: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= cmsRowConsts.size,
      s"depth must be in [1, ${cmsRowConsts.size}]")
    require(logWidth >= 1 && logWidth <= 30, "logWidth must be in [1, 30]")
    keys
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("row"),
          cmsBucket(key, d, logWidth).as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` (each row carries a `key` hash):
    * min over the depth cells the key maps to — ≥ the true count,
    * with the classic (ε = e/width, δ = e^−depth) overcount bound.
    * The cell table is tiny by construction → broadcast join; the
    * probe side never shuffles. The join is LEFT OUTER with empty
    * buckets counting as 0: a probe key never inserted (the sketch's
    * primary use case) maps to depth empty cells and must return
    * est_n = 0, and a key whose cells are only partially populated
    * must take its min over ALL depth cells, not just the non-empty
    * ones — an inner join would silently violate both. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, key: Column,
                  depth: Int = 4, logWidth: Int = 10): DataFrame = {
    val probeCols = probes.columns.map(col).toSeq
    probes
      .select(probeCols :+ explode(array((0 until depth).map(d =>
        struct(lit(d).as("row"),
          cmsBucket(key, d, logWidth).as("bucket"))): _*)).as("__rb"): _*)
      .join(broadcast(cells),
        col("__rb.row") === cells("row") && col("__rb.bucket") === cells("bucket"),
        "left")
      .groupBy(probeCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  // -- distribution diagnostics (exact, integer-staged) --------------------

  /** Gini concentration of per-key mass: one row
    * (n_keys, total, gini_ppm) with
    * gini = (2·Σ i·xᵢ)/(n·Σ xᵢ) − (n+1)/n over counts xᵢ sorted
    * ascending (ties broken by key for determinism), staged in parts
    * per million via BIGINT division — exact cross-engine. 0 = uniform,
    * →1 = all mass on one key. The corpus-curation "is one domain
    * dominating the crawl?" diagnostic.
    *
    * Scale shape: the corpus collapses to per-key counts in ONE grouped
    * aggregate; the rank window and the final fold then run over |keys|
    * rows, not corpus rows. */
  def giniConcentrationPpm(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
    val ranked = counts.withColumn("i",
      row_number().over(Window.orderBy(col("n"), col("k"))))
    ranked
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total"),
        sum(col("i") * col("n")).as("__s1"))
      .select(col("n_keys"), col("total"),
        expr("""CAST((1000000L * (2L * __s1 - (n_keys + 1L) * total))
                DIV (n_keys * total) AS BIGINT)""").as("gini_ppm"))
  }

  /** Exact quantized moment sums per group: n, Σq, Σq², Σq³ over
    * q = round(value·scale) — the raw material for mean/variance/
    * skewness at any scale, in ONE map-side-combining aggregate, with
    * every sum an exact BIGINT (a double Σv³ would be
    * order-dependent). Downstream standardization (divides) happens on
    * the tiny per-group frame, not here. Choose `scale` so
    * max|q|³ · group-count fits int64; the defaults suit
    * [0, ~1e4)-ranged metrics. */
  def quantizedMomentsByGroup(df: DataFrame, group: Column, value: Column,
                              scale: Double = 10.0): DataFrame = {
    val q = round(value * scale).cast("long")
    df.select(group.as("grp"), q.as("__q"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("__q")).as("s1"),
        sum(col("__q") * col("__q")).as("s2"),
        sum(col("__q") * col("__q") * col("__q")).as("s3"))
  }

  /** Key-distribution drift between two corpus slices (A = rows where
    * `inA`, B = the rest): one row (n_keys, sum_abs_ppm) where
    * sum_abs_ppm = Σ_k |p_k − q_k| over per-mille... ppm-floored key
    * frequencies p (in A) and q (in B). Total-variation distance ×2,
    * in parts per million, in exact BIGINT arithmetic — the train/val
    * token-distribution-shift gate of a data pipeline.
    *
    * One grouped aggregate over the corpus (conditional sums — no
    * second pass, no join between the slices), then a broadcast of the
    * single-row totals. Contract: both slices must be non-empty (an
    * empty side has no distribution to compare; the ppm division
    * null-propagates rather than inventing a drift). */
  // ---- deterministic mergeable ε-quantile summary -------------------
  //
  // The missing piece of the sketch family: exact quantiles
  // (exactQuantiles / Ranks.globalRankStats) need a full rank shuffle
  // of the DATA; percentile_approx is a black-box aggregate whose
  // error can only be gated statistically. This is the classic
  // Munro-Paterson / MRL per-partition order-statistics summary —
  // DETERMINISTIC (replays bit-identically), MERGEABLE (summaries
  // union; weights and error bounds add), with an EXACT self-described
  // rank-error bound the catalog gate asserts row by row.
  //
  // Build (quantileSummary): each input partition is sorted LOCALLY
  // (narrow, no shuffle) and contributes every ceil(n_p/k)-th order
  // statistic, weight = its block size, plus the partition's last row
  // carrying the remainder block. The ONLY shuffles are a P-row count
  // aggregate and a P-row broadcast back — the data itself never
  // moves. Summary size ≤ (k+1) rows per partition; two narrow scans
  // of the source (the per-partition sizes must be known before the
  // blocks can be cut — both passes see the same deterministic splits).
  //
  // Bound (summaryBound): for any threshold x, at most ONE block per
  // sorted run straddles x (rows sorted ⇒ later blocks are entirely
  // ≥ the straddler's max), so
  //   est(x) ≤ n_le(x) ≤ est(x) + Σ_runs (max block weight − 1).
  // That Σ is computable FROM the summary itself — Σ_part (max w − 1).
  //
  // Merge: unionByName of summaries built with distinct tags. Tree
  // merging at cluster scale re-compresses between levels
  // (compressSummary): bucket the cum-weight order into ≤ k blocks —
  // ONE new sorted run, so its own Σ(max w − 1) term composes by
  // addition with the bound carried by the input summary.
  //
  // Query (quantilesFromSummary): target rank T = max(1, ceil(p·N));
  // qv = min sample v with cumweight ≥ T. The gate's invariants are
  // then EXACT integers, no statistical slack:
  //   n_le(qv) ≥ T                       (est ≤ n_le and est(qv) ≥ T)
  //   n_lt(qv) ≤ T − 1 + bound           (est(<qv) < T + straddlers)

  /** Per-partition order-statistics summary of `value` (nulls
    * dropped, cast to double): ≤ k+1 rows per input partition, columns
    * (__part, v, w). `tag` namespaces the partition ids so summaries
    * of DIFFERENT datasets can union without key collisions.
    * Empty input ⇒ empty summary (quantilesFromSummary then returns
    * no rows — there is no quantile of nothing). */
  def quantileSummary(df: DataFrame, value: Column, k: Int,
                      tag: String): DataFrame = {
    // k ≤ 2^20 keeps ceil(np / k) exact in double (np < 2^33 from the
    // 33-bit partition-local ordinal; quotient error 2^-20 is then
    // smaller than the 1/k gap to the nearest integer)
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    require(tag.nonEmpty && !tag.contains(":"), s"bad tag '$tag'")
    def vals = df.select(value.cast("double").as("v")).na.drop()
    // pass 1: per-partition row counts — P rows, map-side partial
    val counts = vals.select(spark_partition_id().cast("long").as("__pid"))
      .groupBy(col("__pid")).agg(count(lit(1)).as("__np"))
    // pass 2: local sort (narrow — NO shuffle), partition-local rank
    // from monotonically_increasing_id's (pid << 33 | ordinal) layout,
    // keep block-boundary rows. Both passes scan the same
    // deterministic source splits, so the pids line up.
    val ranked = vals.sortWithinPartitions("v")
      .select(col("v"), monotonically_increasing_id().as("__mid"))
      .select(col("v"), shiftright(col("__mid"), 33).as("__pid"),
        col("__mid").bitwiseAND(lit((1L << 33) - 1)).as("__r"))
    ranked.join(broadcast(counts), "__pid")
      .withColumn("__step",
        greatest(lit(1L), ceil(col("__np") / k).cast("long")))
      .where(((col("__r") + 1) % col("__step") === 0) ||
        (col("__r") === col("__np") - 1))
      .select(concat(lit(tag), lit(":"), col("__pid")).as("__part"),
        col("v"),
        // a last row that is not itself a block boundary carries the
        // remainder block (np % step rows); block weights sum to np
        when((col("__r") + 1) % col("__step") === 0, col("__step"))
          .otherwise(col("__np") % col("__step")).as("w"))
  }

  /** The summary's self-described worst-case rank error: one row
    * (bound BIGINT) = Σ over sorted runs of (max block weight − 1).
    * Valid for a single build, a union of builds, and each
    * compressSummary output (one run per tag) — bounds ADD across the
    * unions a caller composes. */
  def summaryBound(summary: DataFrame): DataFrame =
    summary.groupBy(col("__part")).agg((max(col("w")) - 1).as("__b"))
      .agg(coalesce(sum(col("__b")), lit(0L)).as("bound"))

  /** Re-compress a (possibly merged) summary down to ≤ k rows — the
    * between-levels step of a tree merge: bucket the cum-weight order
    * into k blocks, each represented by its max v. The output is ONE
    * sorted run under `tag`; its own summaryBound composes with the
    * bound of the INPUT summary by addition (the caller tracks
    * `summaryBound(input) + summaryBound(compressed)`). */
  def compressSummary(summary: DataFrame, k: Int, tag: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(tag.nonEmpty && !tag.contains(":"), s"bad tag '$tag'")
    // the summary is sketch-sized (kilobytes per input partition), so
    // the single-task window is bounded regardless of data volume
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("__part"))
    val cum = summary.withColumn("__cum", sum(col("w")).over(win))
    val tot = cum.agg(max(col("__cum")).as("__n"))
    cum.crossJoin(broadcast(tot))
      .withColumn("__bs", greatest(lit(1L),
        ceil(col("__n") / k).cast("long")))
      .groupBy(expr("(__cum - 1) div __bs").as("__bkt"))
      .agg(max(col("v")).as("v"), sum(col("w")).as("w"))
      .select(lit(tag + ":0").as("__part"), col("v"), col("w"))
  }

  /** Quantiles from a summary: for each prob p, the smallest sample v
    * whose cumulative weight reaches max(1, ceil(p·N)). Returns
    * (prob, qv, target, n, bound) — target/n/bound are the EXACT
    * integers the caller's gate checks the data against:
    * count(≤ qv) ≥ target and count(< qv) ≤ target − 1 + bound.
    * `bound` is the caller-composed error budget (summaryBound of the
    * union, plus the input summary's own bound after a compress). */
  def quantilesFromSummary(summary: DataFrame, probs: Seq[Double],
                           bound: DataFrame): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      "probs must be in (0, 1]")
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("__part"))
    val cum = summary.withColumn("__cum", sum(col("w")).over(win))
    val targets = summary.agg(sum(col("w")).as("n")).crossJoin(bound)
      .select(explode(array(probs.map(lit): _*)).as("prob"),
        col("n"), col("bound"))
      .withColumn("target",
        greatest(lit(1L), ceil(col("prob") * col("n")).cast("long")))
    // |probs| rows against a sketch-sized cum table — broadcast range
    // probe, never a data-sized join
    cum.join(broadcast(targets), col("__cum") >= col("target"))
      .groupBy(col("prob"), col("n"), col("bound"), col("target"))
      .agg(min(col("v")).as("qv"))
      .select(col("prob"), col("qv"), col("target"), col("n"), col("bound"))
  }

  /** Fail-fast for the grouped summary's content-determinism contract:
    * the two passes (counts, ranked) re-evaluate the source with
    * different pruned schemas, so any ROUND-ROBIN redistribution in the
    * source plan re-deals rows between them (sortBeforeRepartition
    * orders by the binary row layout) and the per-(partition, group)
    * counts silently stop describing the ranked pass. Parquet/file
    * splits, hash/range repartitioning, and local coalesce are all
    * content-deterministic; `df.repartition(n)` and keyless REBALANCE
    * hints are not — reject them here so misuse is an error instead of
    * plausible-but-wrong quantiles (the failure the builder's own spec
    * observed as 3850/4000 group weights before the contract existed).
    *
    * The traversal stops at nodes that RESET the contract — once rows
    * pass a hash repartition-by-expression or an aggregate, their
    * downstream partition assignment is a pure function of content,
    * so any round-robin BELOW such a node is harmless and accepted
    * (the r11 rule rejected it — a false positive on a safe plan). A
    * RANGE repartition deliberately does NOT reset: its bound sampling
    * is order-sensitive (per-partition reservoir), and an upstream
    * round-robin can reorder rows between the two passes, moving the
    * sampled bounds themselves. */
  private[graft] def requireContentDeterministicSource(
      df: DataFrame, op: String): Unit = {
    import org.apache.spark.sql.catalyst.expressions.SortOrder
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, LogicalPlan, Repartition, RepartitionByExpression,
      RebalancePartitions}
    def offenders(p: LogicalPlan): Seq[String] = p match {
      // hash repartition: downstream assignment = hash(keys) % n,
      // pure content — whatever happens below cannot leak through.
      // Only when every key is DETERMINISTIC, though: repartition(n,
      // rand()) is itself content-nondeterministic, and treating it as
      // a reset would also shield a round-robin below it — reject it
      // outright instead of traversing (it can never become safe).
      // The analyzer's PullOutNondeterministic rule hides the rand
      // behind a Project alias (the keys become plain attributes), so
      // the keys' REFERENCES are traced to nondeterministic aliases
      // anywhere below — TRANSITIVELY: a rand column re-aliased through
      // further Projects (or surfaced by an Aggregate/Window alias)
      // carries the taint, or select(rand.as("r")).select($"r".as("r2"))
      // .repartition(n, $"r2") would slip through as "deterministic".
      case r: RepartitionByExpression
          if r.partitionExpressions.nonEmpty &&
            !r.partitionExpressions.exists(_.isInstanceOf[SortOrder]) =>
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.{
          Project, Union, Window}
        def taintedIds(p2: LogicalPlan): Set[Long] = {
          val childTaints = p2.children.map(taintedIds)
          val below = childTaints.flatten.toSet
          val named = p2 match {
            case pr: Project => pr.projectList
            case ag: Aggregate => ag.aggregateExpressions
            case w: Window => w.windowExpressions
            case _ => Nil
          }
          // Union reuses the FIRST child's exprIds for its output, so a
          // tainted column contributed by any OTHER child must taint
          // the output attribute positionally or it escapes the walk
          val unionTaint = p2 match {
            case u: Union =>
              val out = u.output
              out.indices.collect {
                case i if u.children.zip(childTaints).exists {
                  case (c, t) => i < c.output.length &&
                    t(c.output(i).exprId.id) } => out(i).exprId.id
              }.toSet
            case _ => Set.empty[Long]
          }
          below ++ unionTaint ++ named.collect {
            case a: Alias if !a.child.deterministic ||
              a.child.references.exists(att => below(att.exprId.id)) =>
              a.exprId.id
          }
        }
        val ndIds = taintedIds(r.child)
        val keysNd = r.partitionExpressions.exists(!_.deterministic) ||
          r.partitionExpressions.flatMap(_.references)
            .exists(att => ndIds(att.exprId.id))
        if (!keysNd) Nil
        else Seq("nondeterministic repartition-by-expression " +
          "(e.g. repartition(n, rand()))")
      // aggregates exchange on the grouping keys and emit one row per
      // group: content-deterministic output and placement
      case _: Aggregate => Nil
      // Repartition(shuffle = true) is df.repartition(n): round-robin.
      // shuffle = false is coalesce — a narrow, deterministic merge of
      // the source's own splits, which the contract allows.
      case r: Repartition if r.shuffle =>
        Seq(s"round-robin repartition(${r.numPartitions})")
      // keyless REBALANCE is round-robin-ish (AQE splits by size);
      // keyed rebalance still appends random salt to split skewed
      // groups, so reject both shapes.
      case r: RebalancePartitions =>
        Seq(s"rebalance hint (${r.partitionExpressions.size} keys)")
      case other => other.children.flatMap(offenders)
    }
    val bad = offenders(df.queryExecution.analyzed)
    require(bad.isEmpty,
      s"$op requires a content-deterministic source (parquet/file splits " +
        s"or hash/range repartitioning): the source plan contains " +
        s"${bad.mkString(", ")}, whose row-to-partition assignment " +
        "changes between the operator's two passes and would produce " +
        "silently wrong per-group weights. Remove it, replace with " +
        "repartition(n, col(...)), or put it below a hash repartition " +
        "or aggregation (which reset the contract).")
  }

  /** Per-GROUP twin of [[quantileSummary]] — the per-language /
    * per-source distribution profile a corpus card needs, still with
    * ZERO data shuffles: partitions local-sort by (group, value), each
    * (partition, group) run contributes its evenly-spaced order
    * statistics, and the run's START ordinal derives from the counts
    * table alone (the running sum of earlier groups' counts within the
    * partition — a window over the P×|groups| counts table, never the
    * data). Rows with a NULL group or value are dropped. Output
    * (__part, g, v, w); merge = unionByName with distinct tags, bounds
    * per group via [[summaryBoundByGroup]].
    *
    * CONTRACT (stricter than the global form): the source's
    * row→partition assignment must be CONTENT-deterministic across
    * re-evaluation — parquet/file splits and hash repartitioning are;
    * a round-robin `repartition(n)` is NOT (its distribution order
    * follows the binary row layout, which changes with column
    * pruning, and the two passes prune differently). The global
    * [[quantileSummary]] only needs partition SIZES, which round-robin
    * fixes arithmetically; the per-(partition, group) counts here need
    * the assignment itself. ENFORCED: a source plan containing a
    * round-robin repartition or rebalance hint is rejected up front
    * (see [[requireContentDeterministicSource]]). */
  def quantileSummaryByGroup(df: DataFrame, groupCol: String, value: Column,
                             k: Int, tag: String): DataFrame = {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")
    require(tag.nonEmpty && !tag.contains(":"), s"bad tag '$tag'")
    requireContentDeterministicSource(df, "quantileSummaryByGroup")
    def vals = df.select(col(groupCol).cast("string").as("g"),
      value.cast("double").as("v")).na.drop()
    val counts = vals.select(spark_partition_id().cast("long").as("__pid"),
        col("g"))
      .groupBy(col("__pid"), col("g")).agg(count(lit(1)).as("__np"))
    // run start = Σ earlier groups' counts in this partition; the
    // window order MUST match sortWithinPartitions' string order (it
    // does: same engine, same binary collation)
    val wStart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("g"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withStart = counts.withColumn("__r0",
      coalesce(sum(col("__np")).over(wStart), lit(0L)))
    val ranked = vals.sortWithinPartitions("g", "v")
      .select(col("g"), col("v"), monotonically_increasing_id().as("__mid"))
      .select(col("g"), col("v"), shiftright(col("__mid"), 33).as("__pid"),
        col("__mid").bitwiseAND(lit((1L << 33) - 1)).as("__r"))
    ranked.join(broadcast(withStart), Seq("__pid", "g"))
      .withColumn("__lr", col("__r") - col("__r0"))
      .withColumn("__step",
        greatest(lit(1L), ceil(col("__np") / k).cast("long")))
      .where(((col("__lr") + 1) % col("__step") === 0) ||
        (col("__lr") === col("__np") - 1))
      .select(concat(lit(tag), lit(":"), col("__pid"), lit(":"), col("g"))
          .as("__part"),
        col("g"), col("v"),
        when((col("__lr") + 1) % col("__step") === 0, col("__step"))
          .otherwise(col("__np") % col("__step")).as("w"))
  }

  /** Per-group worst-case rank error: (g, bound) — Σ over the group's
    * sorted runs of (max block weight − 1), the grouped twin of
    * [[summaryBound]]. */
  def summaryBoundByGroup(summary: DataFrame): DataFrame =
    summary.groupBy(col("__part"), col("g"))
      .agg((max(col("w")) - 1).as("__b"))
      .groupBy(col("g")).agg(coalesce(sum(col("__b")), lit(0L)).as("bound"))

  /** Per-group quantiles from a grouped summary: for each (group,
    * prob), the smallest sample v whose within-group cumulative weight
    * reaches max(1, ceil(p·n_g)). Returns (g, prob, qv, target, n,
    * bound) with the same exact-integer gate contract as the global
    * form — checked per group. `bounds` = (g, bound), normally
    * [[summaryBoundByGroup]] of the same (pinned) summary. */
  def quantilesFromSummaryByGroup(summary: DataFrame, probs: Seq[Double],
                                  bounds: DataFrame): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      "probs must be in (0, 1]")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("__part"))
    val cum = summary.withColumn("__cum", sum(col("w")).over(win))
    val targets = summary.groupBy(col("g")).agg(sum(col("w")).as("n"))
      .join(bounds, "g")
      .select(col("g").as("__tg"), col("n"), col("bound"),
        explode(array(probs.map(lit): _*)).as("prob"))
      .withColumn("target",
        greatest(lit(1L), ceil(col("prob") * col("n")).cast("long")))
    cum.join(broadcast(targets),
        col("g") === col("__tg") && col("__cum") >= col("target"))
      .groupBy(col("g"), col("prob"), col("n"), col("bound"), col("target"))
      .agg(min(col("v")).as("qv"))
      .select(col("g"), col("prob"), col("qv"), col("target"),
        col("n"), col("bound"))
  }

  def tvDriftPpm(df: DataFrame, inA: Column, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("k"))
      .agg(sum(when(inA, 1L).otherwise(0L)).as("na"),
        sum(when(inA, 0L).otherwise(1L)).as("nb"))
    val tot = counts.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    counts.crossJoin(broadcast(tot))
      .select(abs(expr("na * 1000000L DIV ta") -
        expr("nb * 1000000L DIV tb")).as("__d"))
      .agg(count(lit(1)).as("n_keys"), sum(col("__d")).as("sum_abs_ppm"))
  }
}
