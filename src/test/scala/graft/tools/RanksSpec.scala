package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RanksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("distributed globalRowNumber equals the single-window row_number") {
    val rnd = new scala.util.Random(7)
    // heavy ties on the primary key force the tiebreak + range-boundary
    // paths; id is the unique total-order tail
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextInt(20)))
      .toDF("id", "k")
    val distributed = Ranks.globalRowNumber(df, "rnk", 8, col("k"), col("id"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    val single = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    assert(distributed == single)
  }

  test("globalRowNumberWithRelease: correct ranks and the handle unpersists") {
    val df = (0 until 1000).map(i => ((i * 37) % 1000, i.toLong)).toDF("k", "id")
    val (ranked, release) =
      Ranks.globalRowNumberWithRelease(df, "rnk", 6, col("k"), col("id"))
    val got = ranked.select("k", "rnk").as[(Int, Long)].collect().toMap
    assert(got.size == 1000 && (0 until 1000).forall(k => got(k) == k + 1L))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(cachedBefore > 0, "the two-pass frame should be cached while live")
    release()
    assert(spark.sparkContext.getPersistentRDDs.size < cachedBefore)
  }

  test("globalPrefixSum equals the single-window running sum") {
    val rnd = new scala.util.Random(19)
    val df = (0 until 3000).map(i => (i.toLong, rnd.nextInt(20), rnd.nextInt(100)))
      .toDF("id", "k", "v")
    val (dist, release) = Ranks.globalPrefixSumWithRelease(
      df, col("v"), "pfx", 8, col("k"), col("id"))
    val got = dist.select("id", "pfx").as[(Long, Long)].collect().toMap
    val single = df.withColumn("pfx",
        sum(col("v")).over(Window.orderBy(col("k"), col("id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "pfx").as[(Long, Long)].collect().toMap
    assert(got == single)
    release()
  }

  test("globalRankStats equals the single-window rank/percent_rank/cume_dist; no window in plan") {
    val rnd = new scala.util.Random(23)
    // heavy ties: the per-value counts table is the whole design point
    val df = (0 until 4000).map(i => (i.toLong, rnd.nextInt(37)))
      .toDF("id", "v")
    val got = Ranks.globalRankStats(df, col("v"), numPartitions = 8)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
    val gotMap = got.select("id", "rank", "dense_rank", "percent_rank", "cume_dist")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val w = Window.orderBy(col("v"))
    val single = df
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("dense_rank", dense_rank().over(w).cast("long"))
      .withColumn("percent_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .select("id", "rank", "dense_rank", "percent_rank", "cume_dist")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(gotMap == single)
    // single-row edge: percent_rank is defined 0, cume_dist 1
    val one = Ranks.globalRankStats(Seq((1L, 5)).toDF("id", "v"), col("v"))
      .select("rank", "dense_rank", "percent_rank", "cume_dist")
      .as[(Long, Long, Double, Double)].head()
    assert(one == ((1L, 1L, 0.0, 1.0)))
  }

  test("globalRowNumber ranks array sort keys (lexicographic)") {
    val df = Seq(
      (1L, Seq(2.0, 1.0)), (2L, Seq(1.0, 5.0)), (3L, Seq(1.0)),
      (4L, Seq(1.0, 5.0)), (5L, Seq.empty[Double])
    ).toDF("id", "seg")
    val got = Ranks.globalRowNumber(df, "rnk", 3, col("seg"), col("id"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    // empty < [1.0] < [1.0,5.0](id 2) < [1.0,5.0](id 4) < [2.0,1.0]
    assert(got == Map(5L -> 1L, 3L -> 2L, 2L -> 3L, 4L -> 4L, 1L -> 5L))
  }

  test("sweepConcurrency: gauge peaks, half-open boundary, ties; no window in plan") {
    // intervals: [0,10) [5,15) [10,20) — [0,10) and [10,20) NEVER
    // overlap (half-open), peak 2 at t=5; plus three identical [30,40)
    // (tie multiplicity → peak 3)
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L),
      (30L, 40L), (30L, 40L), (30L, 40L)).toDF("st", "en")
    val sweep = Ranks.sweepConcurrency(iv, "st", "en", numPartitions = 3)
    val plan = sweep.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
    val rows = sweep.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // global gauge multiset: reference single-threaded sweep
    val ref = Seq((0L, 1L), (5L, 1L), (10L, -1L), (10L, 1L), (15L, -1L),
        (20L, -1L), (30L, 1L), (30L, 1L), (30L, 1L), (40L, -1L),
        (40L, -1L), (40L, -1L))
      .sortBy(x => (x._1, x._2))
      .scanLeft((0L, 0L, 0L)) { case ((_, _, run), (t, d)) => (t, d, run + d) }
      .drop(1)
    assert(rows.sortBy(x => (x._1, x._2, x._3)).toSeq ==
      ref.sortBy(x => (x._1, x._2, x._3)))
    // the peak within any bucket is tie-order-invariant
    assert(rows.map(_._3).max == 3)
    // boundary: at t=10 the close of [0,10) applies BEFORE the open of
    // [10,20), so the gauge reads {1, 2} there — never 3, which would
    // mean the two half-open intervals were counted as overlapping
    assert(rows.filter(_._1 == 10L).map(_._3).sorted.toSeq == Seq(1L, 2L))
    // a NULL-bounded interval is EXCLUDED, not sorted to the front
    // where its unmatched delta would offset every gauge value
    val withNull = Seq((Some(0L), Some(10L)), (Some(5L), Option.empty[Long]))
      .toDF("st", "en")
    val g = Ranks.sweepConcurrency(withNull, "st", "en", 2).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(g.sorted.toSeq == Seq((0L, 1L), (10L, 0L)))
  }
}
