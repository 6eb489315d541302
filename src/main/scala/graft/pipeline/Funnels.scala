package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over (user, timestamp, type) streams: the
 * funnel and cohort-retention shapes every product/quality dashboard
 * reads, and a training-pipeline uses to weight interaction data.
 */
object Funnels {

  /**
   * Ordered funnel: how many users reach each stage, where stage i+1
   * counts only events of its type STRICTLY AFTER the user's earliest
   * qualifying stage-i event (the classic "signup → click → purchase in
   * that order" conversion count — an unordered type-set intersection
   * would overcount users who purchased before signing up).
   *
   * Per stage: one filter on the event type, one user-keyed join
   * against the previous stage's reach times, one min aggregate — all
   * hash-partitioned on the user key, no windows, no per-user event
   * collection (a user with 10⁶ events costs one aggregate row per
   * stage). Stage count is static and small, so the composed plan is
   * k filtered scans of the (pruned) events frame.
   *
   * Returns (stage_idx 1-based, stage, n_users), one row per stage.
   * `tsCol` must be totally ordered (int64 nanos or timestamp both
   * work).
   */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame =
    funnelImpl(events, userCol, tsCol, typeCol, stages, maxGap = None)

  /**
   * [[funnelCounts]] with a conversion WINDOW: stage i+1 counts only
   * events within `maxGap` (same units as `tsCol`) after the user's
   * earliest qualifying stage-i event — "purchased within an hour of
   * clicking", the attribution-window form every funnel dashboard
   * actually runs. Same per-stage plan (filter + user-keyed join + min
   * aggregate, no windows).
   */
  def funnelCountsWithin(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, stages: Seq[String],
                         maxGap: Column): DataFrame =
    funnelImpl(events, userCol, tsCol, typeCol, stages, Some(maxGap))

  private def funnelImpl(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, stages: Seq[String],
                         maxGap: Option[Column]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val u = col(userCol)
    var reach = events.where(col(typeCol) === stages.head)
      .groupBy(u.as("__u")).agg(min(col(tsCol)).as("__reach"))
    var out = reach.agg(lit(1).as("stage_idx"),
      lit(stages.head).as("stage"), count(lit(1)).as("n_users"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val gate = maxGap match {
        case Some(g) => col("__ts") > col("__reach") &&
          col("__ts") <= col("__reach") + g
        case None => col("__ts") > col("__reach")
      }
      reach = events.where(col(typeCol) === st)
        .select(u.as("__u"), col(tsCol).as("__ts"))
        .join(reach, "__u")
        .where(gate)
        .groupBy(col("__u")).agg(min(col("__ts")).as("__reach"))
      out = out.unionAll(reach.agg(lit(i + 1).as("stage_idx"),
        lit(st).as("stage"), count(lit(1)).as("n_users")))
    }
    out
  }

  /**
   * Cohort retention: users are grouped by their first-activity day
   * (the cohort); each later active day counts toward that cohort at
   * its day offset. Day arithmetic is integer floor-division of the
   * epoch time — exact, engine-independent.
   *
   * Shape: distinct (user, day) — one exchange; min-day per user — a
   * reuse of the same user-partitioned data; one join back; one final
   * (cohort, offset) aggregate. (user, day) is already distinct so the
   * final count needs no count_distinct.
   *
   * Returns (cohort_day, day_offset, n_users). `dayCol` must already
   * be an integer day number (pass e.g. `col("ts") / 86400e9` floored
   * — see [[epochDayFromNanos]]).
   */
  def retentionCohorts(events: DataFrame, userCol: String, dayCol: Column)
      : DataFrame = {
    val days = events.select(col(userCol).as("__u"), dayCol.as("__day"))
      .distinct()
    val cohort = days.groupBy(col("__u")).agg(min(col("__day")).as("__cohort"))
    days.join(cohort, "__u")
      .groupBy(col("__cohort").as("cohort_day"),
        (col("__day") - col("__cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Integer epoch-day from an int64-nanos timestamp column (the
    * nanosAsLong reading of parquet TIMESTAMP(NANOS)). Catalyst
    * IntegralDivide, NOT `/`: Column `/` is double division, and nanos
    * (~1.7e18) are far beyond a double's 2^53 exact-integer range. */
  def epochDayFromNanos(tsNanos: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression(tsNanos.cast("long")),
      Bridge.expression(lit(86400000000000L))))
  }
}
