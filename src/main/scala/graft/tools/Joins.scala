package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed temporal/range join operators Spark has no built-in for.
 * Both are expressed as single-shuffle DataFrame programs (no nested
 * loops, no driver-side state), so they run unchanged on any corpus
 * size.
 */
object Joins {

  /**
   * Backward as-of join: every left row picks the LATEST right row of
   * the same key with `rightTs <= leftTs` (exact-timestamp matches
   * allowed), or nulls if none precedes it — the standard
   * trade-vs-quote / event-vs-state alignment.
   *
   * Plan shape: both sides tagged and UNIONED, ONE shuffle on the key,
   * and a per-key ordered window carries the last seen right values
   * forward (`last(..., ignoreNulls)` over rows unbounded preceding).
   * This is strictly cheaper than the equi-join-and-filter formulations
   * (no candidate blowup, no max-per-group re-aggregation) and is the
   * canonical distributed as-of shape: cost = one sort-shuffle of
   * events by key, exactly like any keyed window. A key whose history
   * is pathologically hot bounds one task by that key's row count —
   * the same contract as every keyed window here.
   *
   * Ordering within equal timestamps: right rows sort BEFORE left rows
   * (so an exact match is visible), and multiple right rows on the same
   * (key, ts) resolve by the LAST under `tieBreak` (pass e.g. the right
   * row id for determinism; defaults to the timestamp itself, which is
   * deterministic whenever (key, ts) is unique on the right).
   *
   * `rightCols` must not collide with left column names; they appear in
   * the output carrying the matched right row's values.
   */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightCols: Seq[String],
                   tieBreak: String = null,
                   tolerance: Long = -1L): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, rightCols, tieBreak,
      forward = false, tolerance)

  /** Forward as-of join: every left row picks the EARLIEST right row of
    * the same key with `rightTs >= leftTs` (exact matches allowed) —
    * [[asofBackward]] mirrored in time; identical plan shape (the window
    * just orders descending). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String],
                  tieBreak: String = null,
                  tolerance: Long = -1L): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, rightCols, tieBreak,
      forward = true, tolerance)

  /** `tolerance >= 0` (numeric-timestamp inputs only) drops a match
    * farther than that from the left timestamp — the merge_asof
    * tolerance contract: the NEAREST right row is still the one
    * considered; a too-far nearest yields nulls, never a farther
    * in-tolerance row. Implemented by carrying the matched row's
    * timestamp inside the struct and nulling the carry post-window —
    * plan shape unchanged. */
  /** Shared tagging/union scaffold for every as-of variant: both sides
    * stacked with __ats/__atag/__atie plus the matched right row riding
    * as ONE __amts+payload struct (__aval), so the ignore-nulls carry
    * is atomic — a genuine null INSIDE a matched right row is
    * preserved, never papered over by an older row's value — and the
    * tolerance check reads the matched row's own timestamp. Right rows
    * with a null timestamp are unmatchable in SQL semantics (no
    * inequality holds) and are dropped up front. Returns the unioned
    * frame and the left payload column list. */
  private def tagAsofSides(left: DataFrame, right: DataFrame,
                           keys: Seq[String], leftTs: String, rightTs: String,
                           rightCols: Seq[String], tieBreak: String,
                           extraReserved: Seq[String])
      : (DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(rightCols.nonEmpty, "as-of join requires rightCols to carry")
    val collide = rightCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"rightCols collide with left columns: $collide")
    val leftPayload = left.columns.toSeq
    val reserved = Seq("__ats", "__atag", "__atie", "__aval") ++ extraReserved
    require(!leftPayload.exists(reserved.contains),
      s"left columns collide with reserved names $reserved")
    require(!rightCols.contains("__amts"),
      "rightCols collide with reserved name __amts")
    val taggedRight = right.where(col(rightTs).isNotNull).select(
      (keys.map(col) :+ col(rightTs).as("__ats") :+ lit(0).as("__atag") :+
        (if (tieBreak == null) col(rightTs) else col(tieBreak)).as("__atie") :+
        struct(col(rightTs).as("__amts") +: rightCols.map(col): _*)
          .as("__aval")) ++
        leftPayload.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ats") :+ lit(1).as("__atag") :+
        lit(null).cast(taggedRight.schema("__atie").dataType).as("__atie") :+
        lit(null).cast(taggedRight.schema("__aval").dataType).as("__aval")) ++
        leftPayload.filterNot(keys.contains).map(col): _*)
    (taggedRight.unionByName(taggedLeft), leftPayload)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       rightCols: Seq[String],
                       tieBreak: String, forward: Boolean,
                       tolerance: Long = -1L): DataFrame = {
    val (unioned, leftPayload) = tagAsofSides(left, right, keys,
      leftTs, rightTs, rightCols, tieBreak, Nil)

    // right rows sort first at equal ts (tag 0 < 1), so `last(__aval,
    // ignoreNulls) over rows unbounded preceding` on a left row is
    // exactly "latest right with ts <= mine" (backward) — or, with the
    // timestamp order flipped, "earliest right with ts >= mine"
    // (forward). Null-ts LEFT rows sort FIRST either way (nulls_first),
    // where the frame is empty — they match nothing, as SQL comparison
    // semantics demand.
    val tsOrder = if (forward) col("__ats").desc_nulls_first
                  else col("__ats").asc_nulls_first
    val tieOrder = if (forward) col("__atie").desc_nulls_first
                   else col("__atie").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__atag").asc, tieOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = unioned
      .withColumn("__aval", last(col("__aval"), ignoreNulls = true).over(w))
    val carried =
      if (tolerance < 0) carried0
      else {
        val gap = if (forward) col("__aval").getField("__amts") - col("__ats")
                  else col("__ats") - col("__aval").getField("__amts")
        carried0.withColumn("__aval",
          when(gap <= lit(tolerance), col("__aval")))
      }
    carried.where(col("__atag") === 1)
      .select(leftPayload.map(col) ++
        rightCols.map(c => col("__aval").getField(c).as(c)): _*)
  }

  /**
   * Nearest as-of join: every left row picks whichever of its latest
   * at-or-before and earliest at-or-after right rows (same key) is
   * CLOSER in time; equal gaps resolve backward (the merge_asof
   * direction='nearest' contract). `tolerance >= 0` (numeric
   * timestamps) discards either candidate farther than that before the
   * choice.
   *
   * Plan shape: the same union as the directional joins, ONE shuffle on
   * the key, and TWO ordered windows over that one partitioning (asc
   * carry = backward candidate, desc carry = forward candidate — Spark
   * plans one Exchange and two in-partition sorts). Still no candidate
   * blowup, no re-aggregation.
   */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String],
                  tieBreak: String = null,
                  tolerance: Long = -1L): DataFrame = {
    val (unioned, leftPayload) = tagAsofSides(left, right, keys,
      leftTs, rightTs, rightCols, tieBreak, Seq("__ab", "__af"))

    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").asc_nulls_first, col("__atag").asc,
        col("__atie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").desc_nulls_first, col("__atag").asc,
        col("__atie").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__ab", last(col("__aval"), ignoreNulls = true).over(wB))
      .withColumn("__af", last(col("__aval"), ignoreNulls = true).over(wF))

    val gapB = col("__ats") - col("__ab").getField("__amts")
    val gapF = col("__af").getField("__amts") - col("__ats")
    def within(g: Column, c: Column): Column =
      if (tolerance < 0) c else when(g <= lit(tolerance), c)
    val b = within(gapB, col("__ab"))
    val f = within(gapF, col("__af"))
    // backward wins ties; a missing/too-far side concedes to the other
    val chosen = when(b.isNotNull && (f.isNull || gapB <= gapF), b)
      .otherwise(f)
    carried.where(col("__atag") === 1)
      .withColumn("__aval", chosen)
      .select(leftPayload.map(col) ++
        rightCols.map(c => col("__aval").getField(c).as(c)): _*)
  }

  /**
   * Point-in-interval range join: left rows (a point `valueCol`) matched
   * to right rows (intervals [`loCol`, `hiCol`], inclusive both ends).
   * The 1-D analog of the spatial grid join: intervals explode to the
   * grid bins they span (a bounded ~(hi-lo)/binSize blowup), points land
   * in EXACTLY one bin (so no duplicate pairs, no dedup pass), and the
   * match is a hash equi-join on the bin plus the exact BETWEEN
   * residual. Pick `binSize` near the typical interval width — the same
   * sizing rule as the spatial cell.
   */
  def rangeJoin(left: DataFrame, right: DataFrame,
                valueCol: String, loCol: String, hiCol: String,
                binSize: Double): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val all = left.columns.toSet ++ right.columns.toSet
    require(!all.contains("__rbin"), "columns collide with reserved name __rbin")
    val l = left.withColumn("__rbin",
      floor(col(valueCol) / binSize).cast("long"))
    val r = right.withColumn("__rbin",
      explode(sequence(floor(col(loCol) / binSize).cast("long"),
        floor(col(hiCol) / binSize).cast("long"))))
    l.join(r, Seq("__rbin"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__rbin")
  }

  /**
   * Interval × interval overlap join (inclusive ends): pairs whose
   * [lo, hi] ranges intersect. Both sides explode to the bins they
   * span; a pair sharing several bins is emitted ONLY in the first bin
   * of their overlap (bin == max of the two start bins — floor is
   * monotone, so that IS the overlap's first bin), the 1-D version of
   * the PBSM reference-cell dedup in the spatial grid join: no
   * distinct, no second shuffle. The exact overlap test is the
   * residual filter.
   */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftLo: String, leftHi: String,
                          rightLo: String, rightHi: String,
                          binSize: Double): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val all = left.columns.toSet ++ right.columns.toSet
    val reserved = Seq("__obin", "__olb", "__orb")
    require(!reserved.exists(all.contains),
      s"columns collide with reserved names $reserved")
    val l = left
      .withColumn("__olb", floor(col(leftLo) / binSize).cast("long"))
      .withColumn("__obin",
        explode(sequence(col("__olb"), floor(col(leftHi) / binSize).cast("long"))))
    val r = right
      .withColumn("__orb", floor(col(rightLo) / binSize).cast("long"))
      .withColumn("__obin",
        explode(sequence(col("__orb"), floor(col(rightHi) / binSize).cast("long"))))
    l.join(r, Seq("__obin"))
      .where(col("__obin") === greatest(col("__olb"), col("__orb")))
      .where(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .drop("__obin", "__olb", "__orb")
  }

  /**
   * Fuzzy self-join on edit distance: every pair (id_a < id_b) with
   * levenshtein(s_a, s_b) <= maxDist — record linkage / typo-dedup of
   * names, titles, and short keys, where token-level dedup sees
   * nothing (one typo changes every containing token n-gram).
   *
   * LOSSLESS blocking, never all-pairs:
   *  - length filter: an edit changes length by at most 1, so
   *    |len_a − len_b| <= maxDist is necessary (applied in both
   *    branches);
   *  - q-gram PREFIX filter: one edit rewrites at most q positional
   *    q-grams (the count-filter bound of approximate string joins,
   *    Gravano et al., VLDB'01), so at distance <= d at most d·q
   *    DISTINCT gram values of either string can disappear entirely:
   *    |V_a ∩ V_b| >= max(|V_a|, |V_b|) − d·q over the distinct gram
   *    VALUE sets. By the prefix lemma (one global hash order on gram
   *    values, as in the set-similarity joins), every qualifying pair
   *    must then collide within each side's first d·q + 1 sorted gram
   *    hashes — 3 rows per string at q=2, d=1, independent of string
   *    length. A naive full-gram inverted index is lossless too but
   *    collapses under stop-grams ("th", "an" sit in every English
   *    string — the hot bucket IS the corpus); the prefix behaves like
   *    a minhash band instead (a value buckets only rows where it
   *    hash-ranks in the first d·q+1). Pairs where one side has fewer
   *    than c = max − d·q distinct values are genuinely impossible at
   *    distance d, so dropping them loses nothing;
   *  - the residue — BOTH strings shorter than q·(d+1) chars (< 4 for
   *    q=2, d=1; exactly the rows whose distinct-gram count can be
   *    <= d·q) — pairs via a SALTED length-band join: each short row
   *    replicates to keys len..len+maxDist and meets partners at their
   *    exact length. A corpus of millions of same-length short keys
   *    would otherwise land one length bucket on one reducer task
   *    (the skew risk previously only documented): the probe side
   *    carries a deterministic id-hash salt in [0, shortSalt) and the
   *    build side replicates across all salts, splitting a hot bucket
   *    over shortSalt tasks with IDENTICAL output. The candidate
   *    PAIRS themselves are inherent to the semantics (every
   *    same-length short pair is a genuine candidate at distance 1) —
   *    salting fixes where they are enumerated, not how many there are.
   *
   * Refine: Spark's banded-DP `levenshtein(a, b, threshold)` (returns
   * −1 above the threshold, the exact distance otherwise) on distinct
   * candidate pairs only. Returns (id_a, id_b, dist), dist <= maxDist.
   */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int = 1, q: Int = 2,
                        rareFirst: Boolean = true,
                        shortSalt: Int = 8): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 1, "q must be >= 1")
    require(shortSalt >= 1, s"shortSalt must be >= 1, got $shortSalt")
    val minLong = q * (maxDist + 1)
    val base = df.select(col(idCol).as("__eid"), col(strCol).as("__es"))
      .withColumn("__el", length(col("__es")))
      .where(col("__es").isNotNull)
    // first d·q+1 gram hashes under ONE global total order (8-byte join
    // keys; one exchange feeds both self-join sides). `rareFirst`
    // orders by ascending corpus frequency (ties by hash) — the PPJoin
    // canonical order: a stop-gram ("th" in English titles, an O(df²)
    // bucket under any frequency-blind order) almost never hash-ranks
    // into a prefix. Costs one counts-only gram pass + a regroup;
    // rareFirst=false skips both and orders by the bare hash.
    val gramHashes = array_distinct(transform(
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.CharNgrams(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("__es")), q)),
      g => xxhash64(g)))
    val longs = base.where(col("__el") >= minLong)
    val grams = (if (rareFirst) {
      val exploded = longs.select(col("__eid"), col("__el"),
        explode(gramHashes).as("__gram"))
      // frequency ESTIMATE from a deterministic 1-in-8 id-hash sample
      // (r18 opt): the count only decides the prefix ORDER, and the
      // prefix lemma is lossless under ANY single global total order
      // on gram values — an estimated df reorders candidates, never
      // results (the levenshtein refine is the exact filter). Sampling
      // cuts the counts pass (which re-evaluates the whole upstream)
      // to 1/8 of the corpus; a stop-gram's estimate stays huge (it is
      // in every sampled row), which is all the order needs. Hash
      // sampling is deterministic across runs and task retries. Grams
      // outside the sample estimate 0 (= rarest, ties by hash) via the
      // LEFT join — an inner join would DROP their prefix rows.
      val freq = longs
        .where(pmod(xxhash64(col("__eid")), lit(8L)) === 0L)
        .select(explode(gramHashes).as("__gram"))
        .groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
      exploded.join(freq, Seq("__gram"), "left")
        .groupBy(col("__eid"))
        .agg(first(col("__el")).as("__el"),
          slice(transform(array_sort(
              collect_list(struct(coalesce(col("__df"), lit(0L)).as("__df"),
                col("__gram")))),
            x => x("__gram")), 1, maxDist * q + 1).as("__pref"))
        .select(col("__eid"), col("__el"), explode(col("__pref")).as("__gram"))
    } else {
      longs.select(col("__eid"), col("__el"),
        explode(slice(array_sort(gramHashes),
          lit(1), lit(maxDist * q + 1))).as("__gram"))
    })
      .repartition(col("__gram"))
    val gl = grams.select(col("__eid").as("id_a"), col("__el").as("__l_a"),
      col("__gram"))
    val gr = grams.select(col("__eid").as("id_b"), col("__el").as("__l_b"),
      col("__gram"))
    val gramCand = gl.join(gr, Seq("__gram"))
      .where(col("id_a") < col("id_b") &&
        abs(col("__l_a") - col("__l_b")) <= maxDist)
      .select(col("id_a"), col("id_b"))
    // short-string residue: every pair with a side shorter than
    // q·(d+1) chars. The length filter caps its partners at
    // len < q·(d+1) + d, so the band join's probe is the shorts and
    // its build side is every string of those few lengths — (short,
    // long) pairs are covered here because the gram branch excludes
    // shorts entirely
    val shorts = base.where(col("__el") < minLong)
    val nearShort = base.where(col("__el") < minLong + maxDist)
    // deterministic id-hash salt on the probe, full replication on the
    // (alphabet-bounded) build: a planted hot length bucket spreads
    // over shortSalt reducer tasks, output unchanged
    val shortCand = shorts
      .select(col("__eid").as("id_a"),
        explode(sequence(col("__el"), col("__el") + lit(maxDist))).as("__lkey"),
        pmod(xxhash64(col("__eid")), lit(shortSalt.toLong)).as("__salt"))
      .join(nearShort.select(col("__eid").as("id_b"), col("__el").as("__lkey"),
          explode(sequence(lit(0L), lit(shortSalt.toLong - 1))).as("__salt")),
        Seq("__lkey", "__salt"))
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val candidates = gramCand.unionAll(shortCand).distinct()
    candidates
      .join(base.select(col("__eid").as("id_a"), col("__es").as("__s_a")), "id_a")
      .join(base.select(col("__eid").as("id_b"), col("__es").as("__s_b")), "id_b")
      .withColumn("dist", levenshtein(col("__s_a"), col("__s_b"), maxDist))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
