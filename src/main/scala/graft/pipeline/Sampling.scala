package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines.
 *
 * Every operator here keys off `md5(salt || "|" || key)` — a pure,
 * codegen'd projection — so a sample is (a) reproducible across runs,
 * engines, and cluster layouts, (b) stable under repartitioning (unlike
 * `df.sample`, whose output depends on partition iteration order), and
 * (c) cheap at 100 TB: selection is a narrow filter with NO shuffle;
 * only the explicitly-ordering operators (stratified top-k, global
 * shuffle) move data, and then exactly once on the hash key.
 *
 * The uniform variate is the first 8 hex digits of the md5, compared
 * LEXICOGRAPHICALLY against a precomputed threshold string: fixed-width
 * lowercase hex compares identically to the integer it encodes, in any
 * engine, with no 64-bit parsing portability traps.
 */
object Sampling {

  /** Deterministic per-row hash in hex — the sampling/shuffle key. */
  def hashHex(key: Column, salt: String): Column =
    md5(concat_ws("|", lit(salt), key.cast("string")))

  /** First-8-hex-digits threshold encoding `fraction` of the 2^32 hash
    * space (clamped to [0, 1]); rows survive when `hash8 < threshold`
    * (strict, so fraction 0 keeps nothing). Fraction 1.0 yields "g",
    * which sorts after every hex string — keep-everything groups really
    * keep everything (same comparison semantics in any SQL engine). */
  def thresholdHex(fraction: Double): String = {
    val v = math.round(math.max(0.0, fraction) * 4294967296.0)
    if (v >= 4294967296L) "g" else "%08x".format(v)
  }

  /** Keep a deterministic `fraction` of rows, decided per-row by hash of
    * `key` — same rows survive on every run and any partitioning. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          salt: String): DataFrame =
    if (fraction >= 1.0) df
    else df.where(
      substring(hashHex(key, salt), 1, 8) < lit(thresholdHex(fraction)))

  /** Per-group sampling rates — the dataset-MIXTURE operator: one pass,
    * no shuffle, each row kept with its group's fraction (e.g. upsample
    * high-quality sources, downsample boilerplate ones). Groups absent
    * from `fractions` use `default`; a 1.0 rate keeps its group in full
    * (threshold "g" sorts after every hex hash). */
  def deterministicSampleByGroup(df: DataFrame, key: Column, group: Column,
                                 fractions: Map[String, Double],
                                 default: Double, salt: String): DataFrame = {
    val thresh = fractions.foldLeft(lit(thresholdHex(default))) {
      case (acc, (g, f)) => when(group === g, lit(thresholdHex(f))).otherwise(acc)
    }
    df.where(substring(hashHex(key, salt), 1, 8) < thresh)
  }

  /** Temperature-weighted mixture (τ = 1/2): each group's keep rate is
    * min(1, coeff / sqrt(|group|)) — the standard square-root
    * temperature resampling that flattens a skewed source/language
    * distribution (kept counts grow as sqrt of group size once capped).
    *
    * The rates are DATA-DEPENDENT, so unlike
    * [[deterministicSampleByGroup]] the thresholds are computed
    * in-plan: one tiny groupBy counts the groups (broadcast back), and
    * the per-row decision is the same hash-threshold compare. The
    * threshold hex is derived with IEEE-exact steps only (sqrt, divide,
    * multiply, floor — all correctly rounded), so a SQL oracle running
    * the identical expression reproduces it bit-for-bit.
    *
    * Rows with a null group are dropped (the rate join is inner — null
    * never matches, the same null contract as [[Dedup.exact]]). */
  /**
   * Keep the top `frac` of each group's rows under `order` (e.g. the
   * top 30% of each language by quality score) — per-group
   * quantile-threshold filtering without computing the threshold in a
   * separate pass: `cume_dist() <= frac` over a per-group window. ONE
   * shuffle on the group key; cume_dist (= rank/n) avoids
   * percent_rank's single-row 0/0 corner and computes identically in
   * any engine. Make `order` total (append a unique id) for a
   * deterministic cut.
   */
  def topFractionByGroup(df: DataFrame, group: Column, frac: Double,
                         order: Seq[Column]): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0, 1]")
    require(order.nonEmpty, "order must not be empty")
    require(!df.columns.contains("__cd"),
      "input columns collide with reserved name __cd")
    val w = Window.partitionBy(group).orderBy(order: _*)
    df.withColumn("__cd", cume_dist().over(w))
      .where(col("__cd") <= lit(frac))
      .drop("__cd")
  }

  /**
   * Cross-source score calibration: map a raw per-row score to its
   * WITHIN-GROUP quantile bucket (1..buckets), so scores from sources
   * with different scales become comparable before mixing/filtering —
   * "keep every source's top quartile" instead of one global threshold
   * a well-scored source would monopolize. bucket =
   * ceil(buckets·cume_dist), staged as pure integers
   * ((buckets·cnt_le + n − 1) div n, ties high) so the mapping is
   * hash-exact cross-engine.
   *
   * ONE shuffle on the group key; both window counts ride the same
   * partitioning. Skew bound = largest single group (the usual
   * group-window contract).
   */
  def quantileNormalizeByGroup(df: DataFrame, group: Column, score: Column,
                               buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    require(!Seq("__cle", "__n").exists(df.columns.contains),
      "input columns collide with reserved names __cle/__n")
    val wOrd = Window.partitionBy(group).orderBy(score)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(group)
    df.withColumn("__cle", count(lit(1)).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("bucket",
        expr(s"($buckets * __cle + __n - 1) div __n"))
      .drop("__cle", "__n")
  }

  def temperatureMixture(df: DataFrame, group: Column, key: Column,
                         coeff: Double, salt: String): DataFrame = {
    require(!Seq("__tgrp", "__tthresh").exists(df.columns.contains),
      "input columns collide with reserved names __tgrp/__tthresh")
    val counts = df.groupBy(group.as("__tgrp"))
      .agg(count(lit(1)).as("__tn"))
    val rate = least(lit(1.0), lit(coeff) / sqrt(col("__tn").cast("double")))
    val thresh = when(rate >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex(floor(rate * 4294967296.0))), 8, "0"))
    df.join(broadcast(counts.select(col("__tgrp"), thresh.as("__tthresh"))),
        group === col("__tgrp"))
      .where(substring(hashHex(key, salt), 1, 8) < col("__tthresh"))
      .drop("__tgrp", "__tthresh")
  }

  /**
   * Probability-proportional-to-size (Poisson) deterministic sample —
   * the weighted-resampling step (e.g. sample ∝ DSIR importance or
   * token count): each row survives with probability
   * min(1, expectedFraction · n · w / Σw), so the expected kept count
   * is ~expectedFraction · n with heavy rows favored proportionally.
   *
   * `weight` must be a POSITIVE INTEGER-VALUED column (cast to long):
   * the total Σw is then an exact integer — an order-independent sum —
   * and the per-row rate is a fixed left-associated chain of correctly
   * rounded IEEE ops (f·n, ·w, /Σw) that any SQL engine reproduces
   * bit-for-bit. Rows with null/non-positive weight are dropped.
   *
   * Scale shape: one count/sum aggregate (2 longs to the driver side of
   * a broadcast), then the same narrow hash-threshold filter as
   * [[deterministicSample]] — the corpus never shuffles.
   */
  def weightedDeterministicSample(df: DataFrame, key: Column, weight: Column,
                                  expectedFraction: Double,
                                  salt: String): DataFrame = {
    require(expectedFraction > 0.0 && expectedFraction <= 1.0,
      "expectedFraction must be in (0, 1]")
    require(!Seq("__wn", "__ws", "__ww").exists(df.columns.contains),
      "input columns collide with reserved names __wn/__ws/__ww")
    val weighted = df.withColumn("__ww", weight.cast("long"))
      .where(col("__ww").isNotNull && col("__ww") > 0)
    val tot = weighted.agg(count(lit(1)).as("__wn"), sum(col("__ww")).as("__ws"))
    val rate = least(lit(1.0),
      lit(expectedFraction) * col("__wn") * col("__ww") / col("__ws"))
    val thresh = when(rate >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex(floor(rate * 4294967296.0))), 8, "0"))
    weighted.crossJoin(broadcast(tot))
      .where(substring(hashHex(key, salt), 1, 8) < thresh)
      .drop("__wn", "__ws", "__ww")
  }

  /**
   * Deterministic train/validation/test split: each row is labeled by
   * the hash band its key falls into — `fractions` are (label, frac)
   * pairs carving consecutive bands out of the hash space in order.
   * Reproducible across runs/engines/partitionings, and a row's label
   * NEVER changes when later bands are re-proportioned (band k's lower
   * edge depends only on fractions 1..k-1) — the property that keeps a
   * frozen test set frozen. Rows past the last band (Σ fracs < 1) get a
   * NULL label; Σ fracs = 1 labels everything (final threshold "g").
   * Pure narrow projection, zero shuffles.
   */
  def splitByHash(df: DataFrame, key: Column,
                  fractions: Seq[(String, Double)], salt: String,
                  outCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0.0),
      "fractions must be non-empty and positive")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9,
      "fractions must sum to at most 1")
    val h = substring(hashHex(key, salt), 1, 8)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val labeled = fractions.zip(cum).foldRight(lit(null).cast("string")) {
      case (((label, _), c), rest) =>
        when(h < lit(thresholdHex(c)), lit(label)).otherwise(rest)
    }
    df.withColumn(outCol, labeled)
  }

  /** Deterministic stratified sample: the `k` rows with the smallest
    * hash per stratum (`key` as tiebreak). One shuffle on the stratum
    * key; parallel across strata. A pathologically hot stratum bounds a
    * single task by that stratum's row count — pre-filter with
    * [[deterministicSample]] at ~10·k/|stratum| first if that matters. */
  /** Epoch-style mixture materialization: repeat each row `epochs`
    * times with a 1-based epoch index — the "high-quality sources see
    * multiple epochs" pretraining mixture, made explicit as rows.
    * `epochs` < 1 drops the row (0 epochs = excluded from the mix).
    * Narrow generator (explode of a per-row sequence): no shuffle, and
    * the blow-up factor is exactly the mixture's epoch budget. NOTE:
    * guard against sequence(1, 0) — Spark infers a DESCENDING step and
    * would emit [1, 0] instead of nothing. */
  def epochMixture(df: DataFrame, epochs: Column,
                   outCol: String = "epoch"): DataFrame =
    df.withColumn(outCol, explode(
      when(epochs >= 1, sequence(lit(1), epochs.cast("int")))
        .otherwise(array())))

  def stratifiedTopK(df: DataFrame, stratum: Column, key: Column, k: Int,
                     salt: String): DataFrame = {
    require(k >= 1, "stratifiedTopK requires k >= 1")
    val w = Window.partitionBy(stratum).orderBy(hashHex(key, salt), key)
    df.withColumn("__srn", row_number().over(w))
      .where(col("__srn") <= k)
      .drop("__srn")
  }

  /** Deterministic global shuffle for training-example ordering: every
    * row gets its global position under the hash order (hash, key as
    * total-order tiebreak). Distributed two-pass rank — no single-task
    * window (see [[graft.tools.Ranks.globalRowNumber]]). */
  def shuffleRank(df: DataFrame, key: Column, outCol: String,
                  numPartitions: Int, salt: String): DataFrame =
    graft.tools.Ranks.globalRowNumber(
      df.withColumn("__shash", hashHex(key, salt)),
      outCol, numPartitions, col("__shash"), key)
      .drop("__shash")

  /** Deterministic contrastive negative sampling: `k` pseudo-random
    * negatives per anchor, reproducible across runs AND engines (the
    * DuckDB oracle replays every draw), self-excluding, uniform over the
    * candidate set up to the negligible 2^60-mod bias.
    *
    * Construction: candidates get the hash-shuffled global rank 0..C−1
    * ([[shuffleRank]] — distributed two-pass, no single-task window);
    * each (anchor, j) probe derives a target rank
    * `t = hex60(md5(salt|anchor|j)) mod C` and equi-joins it; if the
    * target row IS the anchor, the probe falls back to rank (t+1) mod C
    * (explode both, keep the first non-self by preference). Every join
    * is an integer equi-join — no inequality join, no window over the
    * corpus, probe side carries ids only. At 100 TB: one ranked
    * candidate pass + two keyed shuffles, fan-out exactly 2 rows per
    * probe before the per-probe aggregate.
    *
    * Returns (anchor_id, j, neg_id) with j in [0, k). */
  def hashNegatives(anchors: DataFrame, anchorId: String,
                    candidates: DataFrame, candId: String,
                    k: Int, numPartitions: Int,
                    salt: String = "neg"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ranked = shuffleRank(candidates.select(col(candId).as("__cid")),
        col("__cid"), "__rnk1", numPartitions, salt + "c")
      .select((col("__rnk1") - 1).as("__rnk0"), col("__cid"))
    val cnt = broadcast(candidates.agg(count(lit(1)).as("__cnt")))
    val probes = anchors.select(col(anchorId).as("anchor_id"))
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .crossJoin(cnt)
      .withColumn("__t",
        conv(substring(md5(concat_ws("|", lit(salt + "p"),
          col("anchor_id").cast("string"), col("j").cast("string"))), 1, 15),
          16, 10).cast("long") % col("__cnt"))
      .select(col("anchor_id"), col("j"),
        explode(array(
          struct(lit(0).as("pref"), col("__t").as("__rnk0")),
          struct(lit(1).as("pref"),
            ((col("__t") + 1) % col("__cnt")).as("__rnk0")))).as("pr"))
      .select(col("anchor_id"), col("j"),
        col("pr.pref").as("pref"), col("pr.__rnk0").as("__rnk0"))
    probes.join(ranked, "__rnk0")
      .where(col("__cid") =!= col("anchor_id"))
      .groupBy(col("anchor_id"), col("j"))
      .agg(min(struct(col("pref"), col("__cid").as("neg_id"))).as("__s"))
      .select(col("anchor_id"), col("j"), col("__s.neg_id").as("neg_id"))
  }

  /** Sequence packing for training shards: documents are laid out in the
    * deterministic hash-shuffled order and cut into shards of at most
    * `budget` tokens — shard = exclusive-prefix-sum(tokens) / budget
    * (a document larger than the budget gets a shard of its own and
    * spills the next shard's start; standard greedy-in-fixed-order
    * packing). The prefix sum is the DISTRIBUTED scan of
    * [[graft.tools.Ranks.globalPrefixSum]] — equivalent to
    * `sum(tokens) OVER (ORDER BY hash, key)` with no single-task window
    * anywhere. Adds `outCol` (shard id, 0-based). */
  def packByTokenBudget(df: DataFrame, key: Column, tokens: Column,
                        budget: Long, outCol: String,
                        numPartitions: Int, salt: String): DataFrame = {
    require(budget >= 1, "budget must be >= 1 token")
    graft.tools.Ranks.globalPrefixSum(
      df.withColumn("__phash", hashHex(key, salt))
        .withColumn("__ptok", coalesce(tokens.cast("long"), lit(0L))),
      col("__ptok"), "__pfx", numPartitions, col("__phash"), key)
      .withColumn(outCol, floor((col("__pfx") - col("__ptok")) / budget).cast("long"))
      .drop("__phash", "__ptok", "__pfx")
  }

  /** Length-bucketed dynamic batching (the inference/serving-side
    * packer): rows group into `bucketWidth`-token length buckets, and
    * within a bucket consecutive runs of `batchSize` rows (ordered by
    * `idCol`) share a batch id — batches then hold near-equal-length
    * sequences, the padding-waste killer for batched inference.
    *
    * Scale shape: the window partitions on (bucket, idCol mod shards),
    * never the bare bucket — a hot bucket (most corpora pile into a few
    * length bands) would otherwise sort on ONE task. Size `shards` so
    * rows/(buckets·shards) fits a task's sort budget; batch ids are
    * (bucket, shard, idx) triples, globally unique and deterministic.
    * Output adds (bucket, shard, batch_idx). */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokensCol: String,
                          bucketWidth: Int = 32, batchSize: Int = 8,
                          shards: Int = 16): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1 && shards >= 1,
      "bucketWidth, batchSize and shards must be >= 1")
    df.withColumn("bucket", expr(s"$tokensCol div $bucketWidth"))
      .withColumn("shard", expr(s"$idCol % $shards"))
      .withColumn("batch_idx", expr(
        s"(row_number() OVER (PARTITION BY bucket, shard ORDER BY $idCol) - 1) div $batchSize"))
  }
}
