package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate sketches can't be hash-compared to a foreign engine
  * (implementation-specific estimates); correctness here = error bounds
  * against the exact answers at test scale, plus the merge law the 100 TB
  * roll-up depends on. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  // 3 groups with known distinct counts 1000 / 200 / 7 (values overlap
  // across groups on purpose: 0..999, 500..699, 0..6)
  private lazy val df = (
    (0 until 4000).map(i => ("a", (i % 1000).toLong)) ++
    (0 until 600).map(i => ("b", (500 + i % 200).toLong)) ++
    (0 until 21).map(i => ("c", (i % 7).toLong))
  ).toDF("grp", "v")

  test("approxDistinctByGroup within rsd-implied error of exact") {
    val got = Sketches.approxDistinctByGroup(df, col("grp"), col("v"), rsd = 0.02)
      .as[(String, Long, Long)].collect()
      .map { case (g, ad, n) => g -> ((ad, n)) }.toMap
    val exact = Map("a" -> 1000L, "b" -> 200L, "c" -> 7L)
    exact.foreach { case (g, e) =>
      val (ad, _) = got(g)
      assert(math.abs(ad - e) <= math.max(1L, (e * 0.06).toLong),
        s"group $g: approx $ad vs exact $e")
    }
    assert(got("a")._2 == 4000L && got("b")._2 == 600L && got("c")._2 == 21L)
  }

  test("approxQuantilesByGroup brackets the exact quantiles") {
    val got = Sketches.approxQuantilesByGroup(df.where(col("grp") === "a"),
        col("grp"), col("v"), Seq(0.25, 0.5, 0.9))
      .select("quantiles").as[Seq[Long]].head()
    // group a holds a uniform 0..999 population
    assert(math.abs(got(0) - 250) <= 10 && math.abs(got(1) - 500) <= 10 &&
      math.abs(got(2) - 900) <= 10, s"quantiles $got")
  }

  test("hll sketches merge: union of per-group == estimate over the union") {
    val perGroup = Sketches.hllSketchByGroup(df, col("grp"), col("v"))
    assert(perGroup.count() == 3)
    val rolled = Sketches.hllUnionEstimate(perGroup)
      .as[Long].head()
    // global distinct = |0..999| = 1000; DataSketches HLL lgK=12 is ~1.6% rse
    assert(math.abs(rolled - 1000L) <= 50, s"rolled-up estimate $rolled")
    // and the roll-up equals sketching the whole table directly
    val direct = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("d"))
      .as[Long].head()
    assert(rolled == direct)
  }

  // Zipf-ish universe much larger than the Misra-Gries capacity, so
  // per-partition eviction genuinely happens and the candidate-set
  // guarantee (not just "capacity > vocab") is what's being tested.
  private lazy val zipf = {
    val rows = (0 until 2000).flatMap { u =>
      val reps = if (u < 20) 400 - u * 15 else 1 + (u % 3)
      Seq.fill(reps)(s"k$u")
    }
    new scala.util.Random(11).shuffle(rows).toDF("v").repartition(8)
  }

  test("equiDepthHistogram: buckets balance, ties collapse, model parity") {
    val rnd = new scala.util.Random(19)
    val vals = Seq.fill(200)(rnd.nextInt(50).toLong) // heavy ties
    val dfv = vals.toDF("v").repartition(4)
    val k = 4
    val got = Sketches.equiDepthHistogram(dfv, col("v"), buckets = k)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // model: quantile_disc boundaries + the same strict-greater fold
    val sorted = vals.sorted
    val bs = (1 until k).map(i =>
      sorted(math.max(1, math.ceil(i.toDouble / k * vals.size * (1 - 1e-9)).toLong).toInt - 1))
    val want = vals.groupBy(v => 1L + bs.count(v > _))
      .map { case (b, vs) => b -> ((vs.size.toLong, vs.min, vs.max)) }
    assert(got == want)
    // population balance: no bucket more than twice the ideal depth
    assert(got.values.map(_._1).max <= 2L * vals.size / k)
  }

  test("vectorCovarianceStats == naive moments on random vectors") {
    val rnd = new scala.util.Random(17)
    val dim = 5
    val vecs = (0 until 40).map(_ => Array.fill(dim)(rnd.nextInt(2001) / 1000.0 - 1.0))
    val df = vecs.map(v => Tuple1(v)).toDF("vec").repartition(3)
    val out = Sketches.vectorCovarianceStats(df, "vec", dim)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val q = vecs.map(_.map(x => math.round(x * 1000)))
    for (i <- 0 until dim; j <- i until dim) {
      val sxy = q.map(v => v(i) * v(j)).sum
      val si = q.map(_(i)).sum
      val sj = q.map(_(j)).sum
      assert(out((i.toLong, j.toLong)) == ((sxy, si, sj, 40L)),
        s"moments at ($i,$j)")
    }
    assert(out.size == dim * (dim + 1) / 2)
  }

  test("keySkewProfile: golden on a known-skew key distribution") {
    // per-key counts: k0 -> 8, k1..k4 -> 4 each, k5..k14 -> 1 each
    val rows = (0 until 8).map(_ => "k0") ++
      (1 to 4).flatMap(k => Seq.fill(4)(s"k$k")) ++
      (5 until 15).map(k => s"k$k")
    val out = Sketches.keySkewProfile(rows.toDF("k").repartition(4), col("k"))
      .as[(String, Long)].collect().toMap
    // 15 keys, 34 rows, max 8; sorted counts: 1x10, 4x4, 8 ->
    // p50 = 10th smallest = 1, p90 = ceil(.9*15)=14th = 4, p99 = 15th = 8
    assert(out == Map("n_keys" -> 15L, "n_rows" -> 34L, "max_n" -> 8L,
      "top1_share_ppm" -> (1000000L * 8 / 34),
      "p50_n" -> 1L, "p90_n" -> 4L, "p99_n" -> 8L))
  }

  test("exactTopK matches the exact groupBy answer under MG eviction") {
    val got = Sketches.exactTopK(zipf, col("v"), k = 15, capacity = 64)
      .as[(String, Long)].collect().toSeq
    val exact = zipf.groupBy(col("v")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("v").asc).limit(15)
      .as[(String, Long)].collect().toSeq
    assert(got == exact, s"got $got")
    // sanity: the universe (2000 keys) dwarfs capacity (64), so
    // eviction ran; and counts are the true ones, not MG estimates
    assert(got.head._2 == 400L)
  }

  test("exactTopK refuses an uncertifiable k instead of guessing") {
    // k=20 reaches count 115 < N/capacity (~142): completeness is not
    // provable -> must throw, not return a plausible-but-unproven list
    val e = intercept[IllegalStateException] {
      Sketches.exactTopK(zipf, col("v"), k = 20, capacity = 64)
    }
    assert(e.getMessage.contains("raise capacity"))
  }

  test("exactTopK keeps an empty-string key distinct from the marker") {
    val df2 = (Seq.fill(50)("") ++ Seq.fill(30)("x") ++ Seq.fill(20)("y"))
      .toDF("v").repartition(4)
    val got = Sketches.exactTopK(df2, col("v"), k = 2, capacity = 16)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("", 50L), ("x", 30L)))
  }
  test("columnProfile: total, null, and exact distinct per column") {
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 2L), (None, 2L), (Some("b"), 3L)
    ).toDF("s", "v")
    val r = Sketches.columnProfile(df, Seq("s", "v"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("s") == ((4L, 1L, 2L)))
    assert(r("v") == ((4L, 0L, 3L)))
  }

  test("cms estimate >= true count, exact when width dwarfs keys") {
    // 100 distinct keys with known counts; 2^10 buckets ⇒ collisions
    // unlikely but LEGAL — the estimate must never undercount
    val keys = (0 until 100).flatMap(k =>
      Seq.fill(k + 1)(graft.functions.TextHashing.mix64(k.toLong)))
      .toDF("k").repartition(4)
    val cells = Sketches.cmsCells(keys, col("k"), depth = 4, logWidth = 10)
    assert(cells.agg(sum("cnt")).as[Long].head ==
      4L * (1 to 100).sum) // every occurrence lands in every row
    val probes = (0 until 100)
      .map(k => (k.toLong, graft.functions.TextHashing.mix64(k.toLong)))
      .toDF("orig", "k")
    val est = Sketches.cmsEstimate(cells, probes, col("k"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    (0 until 100).foreach { k =>
      assert(est(k.toLong) >= k + 1, s"undercount for key $k")
    }
    // with 100 keys in 1024 buckets and 4 rows, min-of-rows is exact
    // for the vast majority; require >= 90 exact to catch bucket bugs
    val exact = (0 until 100).count(k => est(k.toLong) == k + 1)
    assert(exact >= 90, s"only $exact/100 estimates exact")
  }

  test("cmsBucket stays in range and matches the wrap-multiply formula") {
    val ks = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue,
      0x9e3779b97f4a7c15L).toDF("k")
    val b = ks.select(Sketches.cmsBucket(col("k"), 0, 10).as("b"))
      .as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 1024))
    assert(b(2) == 0L) // key 0 → product 0 → bucket 0
    assert(b(3) == (2654435761L >>> 54)) // key 1 → the constant itself
  }

  test("giniConcentrationPpm: 0 on uniform, ~1 on concentrated") {
    val uniform = (0 until 50).flatMap(k => Seq.fill(10)(s"k$k")).toDF("k")
    val g0 = Sketches.giniConcentrationPpm(uniform, col("k"))
      .as[(Long, Long, Long)].head
    assert(g0 == ((50L, 500L, 0L)))
    // one key holds 9901 of 10000 units: gini near 1
    val skewed = ((0 until 99).map(k => (s"k$k", 1)) :+ ("hot", 9901))
      .flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    val g1 = Sketches.giniConcentrationPpm(skewed, col("k"))
      .as[(Long, Long, Long)].head
    assert(g1._1 == 100L && g1._2 == 10000L)
    assert(g1._3 > 970000L && g1._3 < 1000000L, s"gini ${g1._3}")
  }

  test("quantizedMomentsByGroup: exact integer power sums") {
    val rows = Seq(("a", 1.04), ("a", 2.0), ("a", 3.0), ("b", 0.5))
      .toDF("grp", "v")
    val m = Sketches.quantizedMomentsByGroup(rows, col("grp"), col("v"),
      scale = 10.0)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // a: q = 10, 20, 30 → s1=60, s2=100+400+900=1400, s3=1000+8000+27000
    assert(m("a") == ((3L, 60L, 1400L, 36000L)))
    assert(m("b") == ((1L, 5L, 25L, 125L)))
  }

  test("labelIndex assigns dense frequency-ordered codes") {
    val docs = (Seq.fill(5)("en") ++ Seq.fill(5)("fr") ++ Seq.fill(2)("zh"))
      .toDF("lang")
    val idx = TextAnalysis.labelIndex(docs, col("lang"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // en/fr tie at 5 → label string breaks the tie; zh last
    assert(idx == Map("en" -> 0L, "fr" -> 1L, "zh" -> 2L))
  }

  test("tvDriftPpm: 0 for identical slices, 2e6 for disjoint") {
    val same = (0 until 100).flatMap(i => Seq((true, s"t${i % 10}"),
      (false, s"t${i % 10}"))).toDF("a", "k")
    val d0 = Sketches.tvDriftPpm(same, col("a"), col("k"))
      .as[(Long, Long)].head
    assert(d0 == ((10L, 0L)))
    val disjoint = ((0 until 40).map(i => (true, s"a${i % 4}")) ++
      (0 until 60).map(i => (false, s"b${i % 6}"))).toDF("a", "k")
    val d1 = Sketches.tvDriftPpm(disjoint, col("a"), col("k"))
      .as[(Long, Long)].head
    // 4 a-keys at 250000 ppm + 6 b-keys at floor(1e6/6)=166666 ppm:
    // 1e6 + 999996 — the ppm floor loses 4 millionths of the exact 2.0
    assert(d1 == ((10L, 1999996L)))
  }

  test("exactQuantilesMulti == per-column exactQuantiles (one fused pass)") {
    val rnd = new scala.util.Random(101)
    // different distributions per metric, negatives, ties, and nulls —
    // the melted composite rank must reproduce each column's own cuts
    val rows = (0 until 500).map { i =>
      (i.toLong,
        if (i % 41 == 0) None else Some(rnd.nextInt(100).toLong - 50),
        Some(rnd.nextInt(10).toLong),
        Some((rnd.nextGaussian() * 1000).toLong))
    }
    val df = rows.toDF("id", "a", "b", "c")
    val probs = Seq(0.1, 0.25, 0.5, 0.9, 1.0)
    val multi = Sketches.exactQuantilesMulti(df,
        Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")), probs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(multi.size == 15)
    for (m <- Seq("a", "b", "c")) {
      val single = Sketches.exactQuantiles(df, col(m).cast("long"), probs)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      for (p <- probs)
        assert(multi((m, p)) == single(p), s"metric=$m p=$p")
    }
  }

  test("exactQuantilesMulti fails fast NAMING an all-null metric") {
    // an all-null column melts away before ranking; without the guard
    // it would silently vanish and map-lookup callers would die with a
    // bare NoSuchElementException far from the cause
    val df = Seq((1L, Some(5L), Option.empty[Long]),
                 (2L, Some(7L), Option.empty[Long]))
      .toDF("id", "ok", "allnull")
    val e = intercept[IllegalArgumentException] {
      Sketches.exactQuantilesMulti(df,
        Seq("ok" -> col("ok"), "allnull" -> col("allnull")), Seq(0.5))
    }
    assert(e.getMessage.contains("allnull"))
  }

  // ---- deterministic mergeable quantile summary ----------------------

  /** Exact invariant check: count(<= qv) >= target and
    * count(< qv) <= target - 1 + bound, per prob, against local truth. */
  private def checkQuantiles(data: Seq[Double],
                             qs: Array[(Double, Double, Long, Long, Long)])
  : Unit = {
    val sorted = data.sorted
    for ((prob, qv, target, n, bound) <- qs) {
      assert(n == data.size.toLong, s"p=$prob n")
      val le = sorted.count(_ <= qv).toLong
      val lt = sorted.count(_ < qv).toLong
      assert(le >= target, s"p=$prob: count(<=qv)=$le < target=$target")
      assert(lt <= target - 1 + bound,
        s"p=$prob: count(<qv)=$lt > ${target - 1} + bound=$bound")
    }
  }

  private def collectQ(qdf: org.apache.spark.sql.DataFrame) =
    qdf.collect().map(r => (r.getDouble(0), r.getDouble(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))

  test("quantileSummary: exact self-described rank bound, ties and skew included") {
    val rnd = new scala.util.Random(17)
    // heavy ties (values quantized to 40 levels) + a skewed tail
    val data = (1 to 5000).map(_ => (rnd.nextInt(40) * 0.5)) ++
      (1 to 500).map(_ => math.pow(10, rnd.nextDouble() * 3))
    val df = data.toDF("x").repartition(7) // uneven hash split
    val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val sk = Sketches.quantileSummary(df, col("x"), k = 32, tag = "s")
    // summary is bounded: <= (k+1) rows per partition, weights sum to N
    val rows = sk.collect()
    assert(rows.length <= 7 * 33)
    assert(rows.map(_.getLong(2)).sum == data.size.toLong)
    // the DOWNSTREAM AGGREGATE in quantilesFromSummary must not let
    // EliminateSorts strip the partition-local sort the ordinals
    // depend on — this end-to-end shape is exactly the catalog's
    val qs = Sketches.quantilesFromSummary(sk, probs,
      Sketches.summaryBound(sk))
    checkQuantiles(data, collectQ(qs))
    // deterministic: an identical rebuild hashes identically
    val again = Sketches.quantileSummary(df, col("x"), k = 32, tag = "s")
    assert(again.collect().map(_.toSeq).sortBy(_.toString()).toSeq ==
      rows.map(_.toSeq).sortBy(_.toString()).toSeq)
    // scale contract: the DATA is never shuffled — the only exchanges
    // are the P-row counts aggregate (+ its broadcast back); the
    // partition-local Sort feeding the ordinals must survive planning
    // (AQE prints the initial plan too — inspect only the final one)
    val plan = sk.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
    val dataShuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(dataShuffles <= 1, s"unexpected data shuffle:\n$plan")
  }

  test("quantile summaries MERGE by union and COMPRESS with additive bounds") {
    val rnd = new scala.util.Random(23)
    val a = (1 to 3000).map(_ => rnd.nextGaussian() * 100)
    val b = (1 to 2000).map(_ => rnd.nextGaussian() * 5 + 400) // disjointish
    val probs = Seq(0.1, 0.5, 0.9)
    val ska = Sketches.quantileSummary(a.toDF("x").repartition(5),
      col("x"), k = 24, tag = "a")
    val skb = Sketches.quantileSummary(b.toDF("x").repartition(3),
      col("x"), k = 24, tag = "b")
    val merged = ska.unionByName(skb)
    // union-merge: the bound self-describes (tags keep runs distinct)
    checkQuantiles(a ++ b, collectQ(Sketches.quantilesFromSummary(
      merged, probs, Sketches.summaryBound(merged))))
    // tree-merge compression: <= k rows, ONE run, bounds compose by +
    val comp = Sketches.compressSummary(merged, k = 16, tag = "c")
    val compRows = comp.collect()
    assert(compRows.length <= 16)
    assert(compRows.map(_.getLong(2)).sum == (a.size + b.size).toLong)
    val totalBound = Sketches.summaryBound(merged)
      .crossJoin(Sketches.summaryBound(comp).withColumnRenamed(
        "bound", "b2"))
      .select((col("bound") + col("b2")).as("bound"))
    checkQuantiles(a ++ b,
      collectQ(Sketches.quantilesFromSummary(comp, probs, totalBound)))
  }

  test("quantileSummaryByGroup: per-group bounds hold, run starts from the counts table") {
    val rnd = new scala.util.Random(41)
    // three groups with very different sizes and distributions, ties
    // included; 5 partitions so every partition holds several groups
    // (the run-start arithmetic is what is under test). HASH
    // repartition on the value: the two passes must see the same
    // row->partition assignment (the documented contract — round-robin
    // repartition re-deals rows when the pruned schema differs)
    val data = (1 to 4000).map(_ => ("a", rnd.nextInt(30) * 1.0)) ++
      (1 to 700).map(_ => ("b", rnd.nextGaussian() * 50)) ++
      (1 to 23).map(_ => ("c", rnd.nextDouble()))
    val df = rnd.shuffle(data).toDF("g", "x").repartition(5, col("x"))
    val sk = Sketches.quantileSummaryByGroup(df, "g", col("x"),
      k = 16, tag = "s").localCheckpoint(true)
    // weights reconstruct each group's exact count
    val wsums = sk.groupBy("g").agg(sum("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wsums == Map("a" -> 4000L, "b" -> 700L, "c" -> 23L))
    val qs = Sketches.quantilesFromSummaryByGroup(sk,
        Seq(0.1, 0.5, 0.9, 1.0), Sketches.summaryBoundByGroup(sk))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(qs.length == 12)
    for ((g, prob, qv, target, n, bound) <- qs) {
      val vals = data.filter(_._1 == g).map(_._2).sorted
      assert(n == vals.size.toLong, s"g=$g n")
      val le = vals.count(_ <= qv).toLong
      val lt = vals.count(_ < qv).toLong
      assert(le >= target, s"g=$g p=$prob: le=$le < target=$target")
      assert(lt <= target - 1 + bound,
        s"g=$g p=$prob: lt=$lt > ${target - 1} + bound=$bound")
    }
    // grouped summaries MERGE like the global ones (distinct tags)
    val half1 = rnd.shuffle(data).take(2000)
    val half2 = data.diff(half1)
    val m = Sketches.quantileSummaryByGroup(half1.toDF("g", "x")
        .repartition(3, col("x")), "g", col("x"), 16, "p")
      .unionByName(Sketches.quantileSummaryByGroup(half2.toDF("g", "x")
        .repartition(4, col("x")), "g", col("x"), 16, "q"))
      .localCheckpoint(true)
    val mq = Sketches.quantilesFromSummaryByGroup(m, Seq(0.5),
        Sketches.summaryBoundByGroup(m))
      .collect().map(r => (r.getString(0), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    for ((g, qv, target, n, bound) <- mq) {
      val vals = data.filter(_._1 == g).map(_._2).sorted
      assert(n == vals.size.toLong)
      assert(vals.count(_ <= qv) >= target)
      assert(vals.count(_ < qv) <= target - 1 + bound, s"g=$g merged")
    }
  }

  test("quantile summary guards: bad k/tag/probs fail fast, empty input is empty") {
    val df = Seq(1.0, 2.0).toDF("x")
    intercept[IllegalArgumentException] {
      Sketches.quantileSummary(df, col("x"), k = 1, tag = "s")
    }
    intercept[IllegalArgumentException] {
      Sketches.quantileSummary(df, col("x"), k = 8, tag = "a:b")
    }
    intercept[IllegalArgumentException] {
      Sketches.quantilesFromSummary(
        Sketches.quantileSummary(df, col("x"), 8, "s"), Seq(0.0),
        Sketches.summaryBound(df.limit(0)
          .select(lit("p").as("__part"), col("x").as("v"), lit(1L).as("w"))))
    }
    val empty = Sketches.quantileSummary(
      df.where(col("x") > 99), col("x"), 8, "s")
    assert(empty.count() == 0)
    assert(Sketches.quantilesFromSummary(empty, Seq(0.5),
      Sketches.summaryBound(empty)).count() == 0)
  }

  test("quantileSummaryByGroup rejects round-robin sources, accepts deterministic ones") {
    val data = (1 to 200).map(i => (if (i % 3 == 0) "a" else "b", i * 1.0))
    // df.repartition(n) is round-robin: the documented silent-wrong-
    // weights footgun must now be an ERROR, not a plausible answer
    val rr = intercept[IllegalArgumentException] {
      Sketches.quantileSummaryByGroup(
        data.toDF("g", "x").repartition(7), "g", col("x"), 8, "s")
    }
    assert(rr.getMessage.contains("round-robin"))
    // a keyless REBALANCE hint is equally non-deterministic
    val rb = intercept[IllegalArgumentException] {
      Sketches.quantileSummaryByGroup(
        data.toDF("g", "x").hint("rebalance"), "g", col("x"), 8, "s")
    }
    assert(rb.getMessage.contains("rebalance"))
    // hash repartition and coalesce remain accepted (content-
    // deterministic), and the result is still exact on weights
    for (src <- Seq(data.toDF("g", "x").repartition(5, col("x")),
      data.toDF("g", "x").repartition(6, col("x")).coalesce(3))) {
      val sk = Sketches.quantileSummaryByGroup(src, "g", col("x"), 8, "s")
      val wsums = sk.groupBy("g").agg(sum("w")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(wsums == Map("a" -> data.count(_._1 == "a").toLong,
        "b" -> data.count(_._1 == "b").toLong))
    }
    // a round-robin BELOW a hash repartition or an aggregate is
    // harmless — those nodes reset the contract (assignment becomes a
    // pure function of content) — and used to be a false-positive
    // rejection; weights must come out exact
    for (src <- Seq(
      data.toDF("g", "x").repartition(7).repartition(5, col("g")),
      data.toDF("g", "x").repartition(7)
        .groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
        .select(col("g"), col("x")))) {
      val sk = Sketches.quantileSummaryByGroup(src, "g", col("x"), 8, "s")
      assert(sk.agg(sum("w")).head.getLong(0) > 0)
    }
    // a range repartition does NOT cleanse an upstream round-robin
    // (its bound sampling is order-sensitive): still rejected
    val rrange = intercept[IllegalArgumentException] {
      Sketches.quantileSummaryByGroup(
        data.toDF("g", "x").repartition(7).repartitionByRange(4, col("x")),
        "g", col("x"), 8, "s")
    }
    assert(rrange.getMessage.contains("round-robin"))
    // repartition(n, rand()) is itself content-nondeterministic: it
    // must be rejected, not treated as a contract reset (which would
    // also shield a round-robin below it from detection)
    for (src <- Seq(
      data.toDF("g", "x").repartition(5, rand(42)),
      data.toDF("g", "x").repartition(7).repartition(5, rand(42)))) {
      val nd = intercept[IllegalArgumentException] {
        Sketches.quantileSummaryByGroup(src, "g", col("x"), 8, "s")
      }
      assert(nd.getMessage.contains("nondeterministic"))
    }
    // the taint is TRANSITIVE: a rand column RE-ALIASED through further
    // Projects (or surfaced through an aggregate alias) is the same
    // nondeterministic key wearing a deterministic-looking alias chain
    for (src <- Seq(
      data.toDF("g", "x").withColumn("r", rand(1))
        .select(col("g"), col("x"), col("r").as("r2"))
        .repartition(5, col("r2")),
      data.toDF("g", "x").withColumn("r", rand(1))
        .select(col("g"), col("x"), col("r").as("r2"))
        .select(col("g"), col("x"), col("r2").as("r3"))
        .repartition(5, col("r3")),
      data.toDF("g", "x").withColumn("r", rand(2)).groupBy("g")
        .agg(first(col("r")).as("fr"), sum(col("x")).as("x"))
        .repartition(5, col("fr")),
      // Union reuses the FIRST child's exprIds: the deterministic left
      // leg must not launder the right leg's rand column
      data.toDF("g", "x").withColumn("k", lit(0.0))
        .union(data.toDF("g", "x").withColumn("k", rand(3)))
        .repartition(5, col("k")))) {
      val nd = intercept[IllegalArgumentException] {
        Sketches.quantileSummaryByGroup(src, "g", col("x"), 8, "s")
      }
      assert(nd.getMessage.contains("nondeterministic"))
    }
    // ...while a DETERMINISTIC alias chain over the same shape stays a
    // legitimate contract reset (no false positive from the taint walk)
    val okAliased = data.toDF("g", "x").withColumn("r", col("x") * 2)
      .select(col("g"), col("x"), col("r").as("r2"))
      .repartition(7).repartition(5, col("r2"))
    Sketches.quantileSummaryByGroup(okAliased, "g", col("x"), 8, "s")
  }
}
