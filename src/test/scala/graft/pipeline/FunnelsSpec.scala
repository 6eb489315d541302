package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("funnelCounts enforces strict event order per user") {
    // u1 completes all 3 in order; u2 purchases BEFORE signup (must not
    // count past stage 1); u3 stops after click; u4 never signs up
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "purchase"), (2L, 20L, "signup"), (2L, 30L, "click"),
      (3L, 10L, "signup"), (3L, 15L, "click"),
      (4L, 10L, "click"), (4L, 20L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnels.funnelCounts(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "signup", 3L), (2, "click", 3L), (3, "purchase", 1L)))
    // equal timestamps are NOT strictly after: same-ts click doesn't count
    val tie = Seq((1L, 10L, "signup"), (1L, 10L, "click")).toDF("user_id", "ts", "event_type")
    val got2 = Funnels.funnelCounts(tie, "user_id", "ts", "event_type",
        Seq("signup", "click")).as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1, "signup", 1L), (2, "click", 0L)))
  }

  test("funnelCountsWithin cuts conversions past the attribution window") {
    // u1 clicks 5 after signup (in window), u2 clicks 50 after (out),
    // u3 clicks in-window then purchases 5 after the click (in)
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 15L, "click"),
      (2L, 10L, "signup"), (2L, 60L, "click"),
      (3L, 10L, "signup"), (3L, 20L, "click"), (3L, 25L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnels.funnelCountsWithin(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"), maxGap = lit(10L))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "signup", 3L), (2, "click", 2L), (3, "purchase", 1L)))
    // boundary: exactly maxGap after is IN (<=)
    val edge = Seq((1L, 10L, "signup"), (1L, 20L, "click"))
      .toDF("user_id", "ts", "event_type")
    val got2 = Funnels.funnelCountsWithin(edge, "user_id", "ts", "event_type",
        Seq("signup", "click"), maxGap = lit(10L))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1, "signup", 1L), (2, "click", 1L)))
  }

  test("retentionCohorts buckets users by first day and offsets") {
    // days directly (dayCol passthrough): u1 active d0,d1,d3; u2 d1,d1(dup),d2
    val ev = Seq((1L, 100L), (1L, 101L), (1L, 103L),
      (2L, 101L), (2L, 101L), (2L, 102L)).toDF("user_id", "day")
    val got = Funnels.retentionCohorts(ev, "user_id", col("day"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 0L, 1L), (100L, 1L, 1L), (100L, 3L, 1L),
      (101L, 0L, 1L), (101L, 1L, 1L)))
  }

  test("epochDayFromNanos is exact integer division past 2^53") {
    val ts = 1704067198778549000L // ~2024-01-01, beyond double precision
    val got = Seq(ts, 86400000000000L - 1, 86400000000000L)
      .toDF("ts").select(Funnels.epochDayFromNanos(col("ts")))
      .as[Long].collect().toSeq
    assert(got == Seq(ts / 86400000000000L, 0L, 1L))
  }
}
