package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document observation on the stream: id, content fingerprint
  * (e.g. [[graft.pipeline.Tx.doc_fingerprint]]), event time. */
case class DocEvent(docId: Long, fp: Long, ts: java.sql.Timestamp)

/** One keyed state observation for the streaming SCD2 builder. */
case class StateEvent(userId: Long, ts: java.sql.Timestamp, eventId: Long,
                      eventType: String)

/** One SCD Type-2 validity slice: [validFrom, validTo), validTo None
  * while the state is still current. */
case class ScdSlice(userId: Long, state: String,
                    validFrom: java.sql.Timestamp,
                    validTo: Option[java.sql.Timestamp])

/** Per-user [[Streams.scd2Intervals]] state: the folded chain's open
  * edge (None until the first below-watermark event folds), the
  * lateness buffer of events the watermark hasn't passed, and the
  * latest event time seen (ms) anchoring the idle-horizon timeout. */
case class Scd2State(state: Option[String],
                     validFrom: Option[java.sql.Timestamp],
                     pending: Seq[StateEvent], lastMs: Long)

/** One kept event emitted by [[Streams.rateLimit]]. */
case class RateKept(userId: Long, eventId: Long)

/** Per-key [[Streams.rateLimit]] state: the lateness buffer plus the
  * admitted-count per still-open event-time window (windows whose end
  * has passed the watermark are pruned — they can never admit again). */
case class RateState(pending: Seq[StateEvent], wins: Map[Long, Long])

/** One as-of enrichment observation: kind = "p" (a purchase whose
  * `value` is the payload later clicks pick up) or "c" (a click that
  * emits one enriched output row). */
case class AsofEvent(userId: Long, ts: java.sql.Timestamp, eventId: Long,
                     kind: String, value: Double)

/** One enriched click from [[Streams.asofEnrich]]: the latest
  * at-or-before purchase's value within tolerance, else None. */
case class AsofOut(userId: Long, eventId: Long, priorValue: Option[Double])

/** Per-user [[Streams.asofEnrich]] state: the latest FOLDED purchase
  * (event-time micros + value) and the lateness buffer. */
case class AsofState(lastPurchUs: Option[Long],
                     lastPurchValue: Option[Double],
                     pending: Seq[AsofEvent])

/** Per-user [[Streams.asofEnrichForward]] state: clicks still WAITING
  * for their next purchase (event-time micros + id) and the lateness
  * buffer. */
case class AsofFwdState(waiting: Seq[(Long, Long)],
                        pending: Seq[AsofEvent])

/** One keyed observation for [[Streams.resampleFfill]]; `value` is an
  * Option so NULL source values ride through unchanged (the grid
  * forward-fills whatever the last event carried). */
case class ResEvent(userId: Long, ts: java.sql.Timestamp, eventId: Long,
                    value: Option[Double])

/** One emitted grid row: the user's last at-or-before value as of the
  * absolute hour mark `hourUs` (event-time micros), None before the
  * user's first event. */
case class ResOut(userId: Long, hourUs: Long, value: Option[Double])

/** Packed per-invocation grid emission for [[Streams.resampleFfill]]:
  * the CONSECUTIVE finalized hours starting at `firstHourUs` with their
  * fill values — one row per user per micro-batch through the stateful
  * operator, exploded back to [[ResOut]] rows downstream (r18 opt:
  * the state operator's output drops from |users|×|hours| rows to
  * |users|; the explode is stateless codegen). */
case class ResPacked(userId: Long, firstHourUs: Long,
                     values: Seq[Option[Double]])

/** Per-user [[Streams.resampleFfill]] state: the running forward-fill
  * value, the next grid hour still to emit, and the lateness buffer. */
case class ResState(lastValue: Option[Double], nextHourUs: Long,
                    pending: Seq[ResEvent])

/** One keyed observation for the custom-state sessionizer. */
case class SessEvent(key: String, ts: java.sql.Timestamp)

/** One closed (or flushed-open) session: start = min event time, n =
  * event count — the gaps-and-islands rollup row. */
case class SessionOut(key: String, sessionStart: java.sql.Timestamp, n: Long)

/** Per-key [[Streams.sessionizeWithState]] state: the open session's
  * (start, last, n), the lateness buffer, and the latest event time
  * seen (ms) anchoring the gap timeout — the session twin of
  * [[Scd2State]]. */
case class SessionState(start: Option[java.sql.Timestamp],
                        last: Option[java.sql.Timestamp], n: Long,
                        pending: Seq[java.sql.Timestamp], lastMs: Long)

/**
 * Structured Streaming operators (SURVEY §2.7: the reference has no
 * streaming surface — these are the engine's scale extensions; every
 * stateless st_ and pipeline expression composes with them unchanged).
 *
 * All operators are plan fragments over readStream DataFrames: watermark
 * + windowed aggregation for time rollups, session_window for gap
 * sessions, and a keyed flatMapGroupsWithState for streaming first-seen
 * dedup (state bounded by an event-time TTL so it scales indefinitely).
 */
object Streams extends Serializable {
  // ^ the custom-state fns below reference the shared helpers, so the
  // closures capture this (stateless) object — it must serialize

  /** Timestamp → micros since epoch at FULL precision (getTime alone
    * truncates to millis) — shared by every custom-state machine so a
    * precision fix lands once, not per operator. */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  /** The (ts, eventId) total order every custom-state fold runs in
    * (Timestamp.compareTo keeps full micros precision). */
  private def sortByTsId(evs: Seq[StateEvent]): Seq[StateEvent] =
    evs.sortWith((a, b) => {
      val c = a.ts.compareTo(b.ts)
      c < 0 || (c == 0 && a.eventId < b.eventId)
    })

  /** Plain event-time order for key-free buffers. */
  private def sortByTs(tss: Seq[java.sql.Timestamp]): Seq[java.sql.Timestamp] =
    tss.sortWith(_.compareTo(_) < 0)

  /** Streaming twin of the batch `events_hourly` query: tumbling 1-hour
    * counts per event type, late data bounded by `watermark`. Extra
    * aggregates (e.g. `min($"value").as("vmin")`) are caller-supplied so
    * the helper stays schema-generic — the default is count-only and
    * analyzes against any stream with just `tsCol`/`typeCol`. */
  def hourlyCounts(events: DataFrame, tsCol: String = "ts",
                   typeCol: String = "event_type",
                   watermark: String = "1 hour",
                   extraAggs: Seq[org.apache.spark.sql.Column] = Nil,
                   slide: Option[String] = None): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour", slide.getOrElse("1 hour")),
        col(typeCol))
      .agg(count(lit(1)).as("n"), extraAggs: _*)

  /** Streaming geo-parquet sink: appends each micro-batch to `path` and
    * maintains the `_spatial_metadata.json` sidecar INCREMENTALLY
    * (bounds computed only over each batch's new files), so a streaming
    * ingest gets the same file pruning as batch writes — queries against
    * the landing dataset prune on bounds while the stream keeps running.
    * Delivery is AT-LEAST-ONCE (foreachBatch semantics): a batch
    * replayed after a crash between the append and the checkpoint
    * commit appends again — dedupe upstream (dedupFirstSeen) or on read
    * where duplicates matter. */
  def geoParquetSink(stream: DataFrame, path: String, geomCols: Seq[String],
                     checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.io.GeoParquet.appendWithSidecar(batch, path, geomCols)
      }

  /** Per-micro-batch training-data ingest filter (use inside
    * foreachBatch, like [[geoParquetSink]]): deterministic hash
    * sampling, then n-gram decontamination against a static eval
    * corpus. Hash sampling is replay-stable — a batch redelivered
    * after a crash keeps exactly the same rows, so at-least-once
    * delivery never changes WHICH documents survive. Runs with full
    * batch join machinery inside the callback and carries no streaming
    * state at all, so throughput scales like the batch operators. */
  def ingestFilter(batch: DataFrame, idCol: String, textCol: String,
                   evalDocs: DataFrame, fraction: Double,
                   n: Int = 8, salt: String = "ingest"): DataFrame =
    graft.pipeline.Decontaminate.byNgramOverlap(
      graft.pipeline.Sampling.deterministicSample(
        batch, col(idCol), fraction, salt),
      evalDocs, idCol, textCol, n)

  /** Gap-based sessionization per key (built-in session_window — state
    * merge + watermark eviction handled by Spark). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String = "ts",
                 gap: String = "10 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /**
   * CUSTOM-STATE sessionizer — the flatMapGroupsWithState twin of the
   * built-in [[sessionize]], result-identical to the gaps-and-islands
   * rollup (a session breaks when the gap to the previous event is
   * >= `gap`, micros precision; output row = key, min ts, count). The
   * built-in covers count-rollups; this is the extension point for
   * session state the session_window aggregate can't express (per-event
   * payload folds, early emission policies) — and it demonstrates the
   * same buffering discipline as [[scd2Intervals]]:
   *
   *  - events BUFFER until the watermark passes them (an out-of-order
   *    arrival may still precede a buffered event — folding early
   *    could split or merge a session wrongly, and append mode cannot
   *    retract); once strictly below the watermark they fold in ts
   *    order, emitting each CLOSED session as its break is observed
   *    (both sides of a break are below the watermark, so no on-time
   *    arrival can land between them);
   *  - the OPEN session flushes via event-time timeout only once the
   *    watermark is STRICTLY past lastTs + gap AND nothing is still
   *    buffered — any later on-time event then necessarily starts a
   *    new session (same boundary discipline as [[scd2Intervals]]).
   *
   * State per key = one open-session edge + the lateness buffer
   * (bounded by the watermark delay); skew bound = busiest key per
   * gap window, identical to the built-in operator's shape. On a
   * bounded replay, drive the final watermark past every deadline
   * (far-future sentinel key) and the output equals the batch
   * gaps-and-islands rollup — the unification the DuckDB gate checks.
   */
  def sessionizeWithState(events: Dataset[SessEvent],
                          gap: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, s"gap must not use months: $gap")
    val gapMicros = iv.days * 86400000000L + iv.microseconds
    require(gapMicros > 0, s"gap must be positive: $gap")
    // the session FOLD compares in exact micros; the flush deadline is
    // millisecond-granular (watermark API), so it rounds the gap UP —
    // a still-in-gap event has ts_us < last_us + gap_us, hence
    // ts_ms <= lastMs + ceil(gap_us/1000), and finalizing only once
    // wm is strictly past that bound keeps sub-millisecond gaps safe
    // (floor division would flush early and split an oracle session;
    // it would also make gaps under 1 ms flush immediately)
    val gapMs = (gapMicros + 999L) / 1000L

    // fold ready (sorted, below-watermark) events into the open edge,
    // emitting a closed session at every >= gap break
    def fold(key: String, edge0: (Option[java.sql.Timestamp], Option[java.sql.Timestamp], Long),
             ready: Seq[java.sql.Timestamp],
             out: scala.collection.mutable.ArrayBuffer[SessionOut])
        : (Option[java.sql.Timestamp], Option[java.sql.Timestamp], Long) = {
      var (start, last, n) = edge0
      ready.foreach { ts =>
        (start, last) match {
          case (Some(s0), Some(l0)) if tsMicros(ts) - tsMicros(l0) >= gapMicros =>
            out += SessionOut(key, s0, n)
            start = Some(ts); last = Some(ts); n = 1L
          case (Some(_), Some(_)) =>
            last = Some(ts); n += 1L
          case _ =>
            start = Some(ts); last = Some(ts); n = 1L
        }
      }
      (start, last, n)
    }

    def fn(key: String, it: Iterator[SessEvent],
           st: GroupState[SessionState]): Iterator[SessionOut] = {
      if (st.hasTimedOut) {
        val s = st.get
        val wm = st.getCurrentWatermarkMs
        val all = sortByTs(s.pending)
        val (ready, hold) = all.partition(_.getTime + 1 <= wm)
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        val (start, last, n) = fold(key, (s.start, s.last, s.n), ready, out)
        if (hold.isEmpty && s.lastMs + gapMs < wm) {
          st.remove()
          start.foreach(s0 => out += SessionOut(key, s0, n))
        } else {
          st.update(SessionState(start, last, n, hold, s.lastMs))
          st.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm) + 1)
        }
        out.iterator
      } else {
        val wm = st.getCurrentWatermarkMs
        val s0 = st.getOption.getOrElse(SessionState(None, None, 0L, Seq.empty, 0L))
        val all = sortByTs(s0.pending ++ it.map(_.ts))
        val (ready, hold) = all.partition(_.getTime + 1 <= wm)
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        val (start, last, n) = fold(key, (s0.start, s0.last, s0.n), ready, out)
        val lastMs = math.max(s0.lastMs,
          all.lastOption.map(_.getTime).getOrElse(0L))
        st.update(SessionState(start, last, n, hold, lastMs))
        st.setTimeoutTimestamp(math.max(lastMs + gapMs, wm + 1))
        out.iterator
      }
    }
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /**
   * Streaming first-seen dedup: emit only the first observation of every
   * fingerprint; later occurrences (same or later micro-batch) are
   * dropped. Custom keyed state via flatMapGroupsWithState.
   *
   * With `stateTtl` set (and a watermark on `ts`), a fingerprint's state
   * times out `stateTtl` after its event time passes the watermark, so
   * total state is bounded by the dedup horizon — the knob that makes
   * this run forever at 100 TB/day (an exact-forever dedup would need
   * unbounded state in ANY engine).
   */
  /** Built-in-operator twin of [[dedupFirstSeen]]: Spark's
    * `dropDuplicatesWithinWatermark` keyed on the fingerprint columns.
    * Same bounded-state contract (state expires once the watermark
    * passes a key's last event time + delay) with zero custom state
    * code — the right default when "first seen wins within the horizon"
    * is enough. Use [[dedupFirstSeen]] when re-admission timing must be
    * exact (its TTL anchors on FIRST-seen time, the built-in's horizon
    * renews per duplicate) or when the survivor among same-batch ties
    * must be deterministic (min ts, then min id) rather than arbitrary. */
  def dedupWithinWatermark(docs: DataFrame, keyCols: Seq[String],
                           tsCol: String = "ts",
                           delay: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming COUNT(DISTINCT key) per tumbling window (+ dims) in
    * BOUNDED state — the chained-stateful-operator idiom: a windowed
    * aggregation alone cannot express a distinct count without holding
    * every key forever, so stage 1 (`dropDuplicatesWithinWatermark` on
    * (key, dims, window-anchor)) passes exactly the FIRST event of each
    * (key, window) through, and stage 2 counts the survivors per
    * window. Both states evict once the watermark passes: stage 1 per
    * dedup key, stage 2 per closed window. Append output — a window's
    * count emits once the watermark passes its end (on a bounded
    * replay, drive the final watermark with a far-future sentinel; the
    * sentinel's own window never closes, so it self-filters). */
  def distinctPerWindow(events: DataFrame, keyCol: String,
                        tsCol: String = "ts",
                        dims: Seq[String] = Seq("event_type"),
                        windowDur: String = "1 hour",
                        watermark: String = "1 hour"): DataFrame = {
    // dropDuplicatesWithinWatermark only holds a key for `watermark`
    // past its FIRST event. A delay shorter than the window lets the
    // same key's state expire while its window is still open — a later
    // ON-TIME duplicate in the same window then re-counts (NOT a
    // distinct count anymore). delay >= windowDur closes the gap: by
    // the time a key's state can expire, every same-window arrival is
    // below the watermark and dropped as late.
    def micros(s: String): Long = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      require(iv.months == 0, s"calendar-month intervals unsupported: $s")
      iv.days * 86400000000L + iv.microseconds
    }
    require(micros(watermark) >= micros(windowDur),
      s"watermark delay ($watermark) must be >= window duration " +
        s"($windowDur), or a key whose dedup state expired mid-window " +
        "would be double-counted")
    require(!events.columns.contains("__wstart"),
      "input column collides with reserved name __wstart")
    events
      .withColumn("__wstart", window(col(tsCol), windowDur).getField("start"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol +: dims :+ "__wstart")
      .groupBy(window(col(tsCol), windowDur) +: dims.map(col): _*)
      .agg(count(lit(1)).as("distinct_keys"))
  }

  /**
   * Streaming SCD Type-2 builder — the streaming twin of the batch
   * `scd2_user_states` query: per user, fold the (ts, event_id)-ordered
   * event stream into state-change validity intervals. Events BUFFER
   * in state until the watermark passes them (an event still above the
   * watermark may yet be preceded by an out-of-order arrival in a
   * later micro-batch — folding early would emit inverted slices, and
   * append mode cannot retract); once below the watermark they fold in
   * order, appending CLOSED slices `[change, next_change)`. The OPEN
   * slice (validTo = None) appends once the user has been idle for
   * `horizon` of EVENT time (an event-time timeout at lastSeen +
   * horizon — the churn finalization, same TTL anchoring as
   * [[dedupFirstSeen]]). A post-horizon event starts a fresh interval
   * chain: the horizon IS the declaration that the state was final —
   * size it to the re-engagement window, exactly like a session gap.
   *
   * State per user is the open edge (state, validFrom) plus the
   * lateness buffer — events within the watermark delay, the same
   * bounded buffer every event-time operator keeps; each micro-batch
   * sorts only its own group (skew bound = busiest user per horizon,
   * same contract as the batch window).
   *
   * Requires a watermark on `ts` (EventTimeTimeout). On a BOUNDED
   * replay, drive the final watermark past every deadline (e.g. with a
   * far-future sentinel key) and the emitted table equals the batch
   * SCD2 build — the unification property the DuckDB gate checks.
   */
  def scd2Intervals(events: Dataset[StateEvent],
                    horizon: String = "0 seconds"): Dataset[ScdSlice] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(iv.months == 0, s"horizon must not use months: $horizon")
    // ceil division: the within-horizon test is conceptually in micros
    // but deadlines are millisecond-granular — rounding UP keeps a
    // sub-millisecond horizon component from finalizing one ms early
    // (same bound argument as sessionizeWithState's gapMs)
    val horizonMs = iv.days * 86400000L + (iv.microseconds + 999L) / 1000L

    // events fold into the chain ONLY once the watermark passes them —
    // an event still above the watermark may yet be preceded by an
    // out-of-order arrival in a later micro-batch, and folding it
    // early would emit inverted/overlapping validity slices (append
    // mode cannot retract). Pending is bounded by the watermark delay
    // per user in steady state — the same lateness buffer every
    // event-time operator keeps.
    def fold(user: Long, chain0: Option[(String, java.sql.Timestamp)],
             evs: Seq[StateEvent], out: scala.collection.mutable.ArrayBuffer[ScdSlice])
        : Option[(String, java.sql.Timestamp)] = {
      var cur = chain0
      evs.foreach { e =>
        cur match {
          case Some((state, from)) if state != e.eventType =>
            out += ScdSlice(user, state, from, Some(e.ts))
            cur = Some((e.eventType, e.ts))
          case None => cur = Some((e.eventType, e.ts))
          case _ => () // same state: the open slice continues
        }
      }
      cur
    }

    def fn(user: Long, it: Iterator[StateEvent],
           st: GroupState[Scd2State]): Iterator[ScdSlice] = {
      if (st.hasTimedOut) {
        // Finalize ONLY when the watermark is STRICTLY past both every
        // pending event and the horizon deadline. The watermark late
        // filter drops ts < wm but an ON-TIME event can still carry
        // ts == wm — with horizon = 0 the deadline millisecond itself
        // can receive arrivals that belong to this chain, and folding/
        // removing now would start a second chain and emit duplicate
        // open slices. Fold whatever is strictly below the watermark,
        // and if anything is held (or the horizon isn't strictly
        // passed) re-arm instead of finalizing; any future on-time
        // event then has ts >= wm > lastMs + horizon, i.e. is
        // post-horizon and starts a fresh chain BY DESIGN.
        val s = st.get
        val wm = st.getCurrentWatermarkMs
        val all = sortByTsId(s.pending)
        val (ready, hold) = all.partition(_.ts.getTime + 1 <= wm)
        val out = scala.collection.mutable.ArrayBuffer.empty[ScdSlice]
        val chain0 = s.state.map(st0 => (st0, s.validFrom.get))
        val chain = fold(user, chain0, ready, out)
        if (hold.isEmpty && s.lastMs + horizonMs < wm) {
          st.remove()
          chain.foreach { case (state, from) =>
            out += ScdSlice(user, state, from, None)
          }
        } else {
          st.update(Scd2State(chain.map(_._1), chain.map(_._2), hold, s.lastMs))
          st.setTimeoutTimestamp(math.max(s.lastMs + horizonMs, wm) + 1)
        }
        out.iterator
      } else {
        val wm = st.getCurrentWatermarkMs
        val s0 = st.getOption.getOrElse(Scd2State(None, None, Seq.empty, 0L))
        val all = sortByTsId(s0.pending ++ it)
        // fold only events STRICTLY below the watermark millisecond
        // (getTime truncates micros — the conservative side holds an
        // event whose ms equals the watermark's)
        val (ready, hold) = all.partition(_.ts.getTime + 1 <= wm)
        val out = scala.collection.mutable.ArrayBuffer.empty[ScdSlice]
        val chain0 = s0.state.map(st0 => (st0, s0.validFrom.get))
        val chain = fold(user, chain0, ready, out)
        val lastMs = math.max(s0.lastMs,
          all.lastOption.map(_.ts.getTime).getOrElse(0L))
        st.update(Scd2State(chain.map(_._1), chain.map(_._2), hold, lastMs))
        // deadline anchors on the LAST event seen; max(_, wm+1) both
        // satisfies the must-be-after-watermark contract and re-arms
        // the (per-invocation-cleared) timer on every data delivery
        st.setTimeoutTimestamp(math.max(lastMs + horizonMs, wm + 1))
        out.iterator
      }
    }
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /**
   * Per-key event-time RATE LIMITER: within each tumbling window of
   * `window` event time, admit the FIRST `limit` events per key in
   * strict (ts, eventId) order and drop the rest — quota shaping /
   * throttling for ingestion pipelines (crawler politeness, per-tenant
   * caps), deterministic in event time so the admitted set is
   * replay-stable and oracle-checkable (row_number per (key, window)
   * <= limit in any SQL engine).
   *
   * Same buffering discipline as [[scd2Intervals]]: events hold in
   * state until the watermark strictly passes them (admission depends
   * on ORDER — an out-of-order arrival may claim a slot ahead of a
   * buffered event; emitting early would admit the wrong events and
   * append mode cannot retract), then fold in order against the
   * per-window admitted counts. A window's counter is pruned once the
   * watermark passes the window END (every still-possible arrival in
   * it would be late), so state per key = lateness buffer + the
   * handful of open-window counters — bounded at any scale, any
   * runtime. Timeouts re-arm at wm+1: each watermark advance folds
   * whatever just became ready, and state removes itself once nothing
   * is pending and every window is closed.
   */
  def rateLimit(events: Dataset[StateEvent], limit: Long,
                window: String = "1 hour"): Dataset[RateKept] = {
    import events.sparkSession.implicits._
    require(limit >= 1, s"limit must be >= 1: $limit")
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(window))
    require(iv.months == 0, s"window must not use months: $window")
    val winMicros = iv.days * 86400000000L + iv.microseconds
    require(winMicros > 0, s"window must be positive: $window")

    // a window is CLOSED once even its last microsecond is late:
    // ms(windowEnd - 1us) < wm
    def closed(w: Long, wm: Long): Boolean =
      ((w + 1) * winMicros - 1) / 1000L < wm

    def fn(user: Long, it: Iterator[StateEvent],
           st: GroupState[RateState]): Iterator[RateKept] = {
      val wm = st.getCurrentWatermarkMs
      val s0 = st.getOption.getOrElse(RateState(Seq.empty, Map.empty))
      val incoming = if (st.hasTimedOut) Seq.empty else it.toSeq
      val all = sortByTsId(s0.pending ++ incoming)
      val (ready, hold) = all.partition(_.ts.getTime + 1 <= wm)
      var wins = s0.wins
      val out = scala.collection.mutable.ArrayBuffer.empty[RateKept]
      ready.foreach { e =>
        val w = Math.floorDiv(tsMicros(e.ts), winMicros)
        val c = wins.getOrElse(w, 0L)
        if (c < limit) {
          out += RateKept(user, e.eventId)
          wins = wins.updated(w, c + 1)
        } else if (c == limit) {
          // saturate instead of counting on: the counter only needs
          // to answer "full?", and a hot key's overflow stays O(1)
          wins = wins.updated(w, limit + 1)
        }
      }
      wins = wins.filter { case (w, _) => !closed(w, wm) }
      if (hold.isEmpty && wins.isEmpty) {
        if (st.exists) st.remove()
      } else {
        st.update(RateState(hold, wins))
        st.setTimeoutTimestamp(wm + 1)
      }
      out.iterator
    }
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  def dedupFirstSeen(docs: Dataset[DocEvent],
                     stateTtl: Option[String] = None): Dataset[DocEvent] = {
    import docs.sparkSession.implicits._
    // same "10 minutes"-style parsing as withWatermark
    val ttlMs = stateTtl.map { s =>
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      require(iv.months == 0, s"stateTtl must not use months: $s")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    val timeout = if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout
                  else GroupStateTimeout.NoTimeout

    // state value = expiry timestamp (first-seen time + TTL). NOTE:
    // GroupState timeouts are CLEARED on every function invocation, so
    // the timeout must be re-armed each time the group receives data —
    // including on duplicates — or the state would never expire.
    def fn(fp: Long, events: Iterator[DocEvent],
           state: GroupState[Long]): Iterator[DocEvent] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val wm = if (ttlMs.isDefined) state.getCurrentWatermarkMs() else Long.MinValue
        val expired = state.exists && ttlMs.isDefined && state.get <= wm
        if (state.exists && !expired) {
          ttlMs.foreach(_ => state.setTimeoutTimestamp(state.get)) // re-arm
          Iterator.empty
        } else {
          if (expired) state.remove()
          val first = events.reduceOption((a, b) =>
            if (b.ts.before(a.ts) || (a.ts == b.ts && b.docId < a.docId)) b else a)
          val expiry = first.map(_.ts.getTime).getOrElse(0L) + ttlMs.getOrElse(0L)
          state.update(expiry)
          ttlMs.foreach(_ => state.setTimeoutTimestamp(math.max(expiry, wm + 1)))
          first.iterator
        }
      }
    }

    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /**
   * Streaming POINT-IN-TIME (as-of) enrichment: each click picks up the
   * value of the user's latest at-or-before purchase, nulled out when
   * that purchase is older than `tolerance` — the feature-store /
   * merge_asof pattern ([[graft.tools.Joins.asofBackward]]) as an
   * incremental state machine instead of a per-batch join. A
   * stream-stream interval join can't express this: "the LATEST match"
   * is an argmax over the match window, and the join emits EVERY
   * in-window pair.
   *
   * Buffering discipline shared with [[scd2Intervals]]: events hold in
   * state until the watermark STRICTLY passes them (the enrichment
   * depends on fold ORDER — an out-of-order purchase arriving in a
   * later micro-batch must still beat an earlier-batch purchase with an
   * older event time; emitting a click early would bind the wrong value
   * and append mode cannot retract), then fold in (ts, kind, eventId)
   * order with purchases applied BEFORE clicks at an equal timestamp —
   * the batch join's `p.ts <= c.ts` inclusive edge.
   *
   * State per user = the lateness buffer + ONE folded purchase
   * (micros + value), and the purchase expires once the watermark is
   * past its tolerance window (no future on-time click can reach it) —
   * so state TTL = watermark delay + tolerance, bounded at any scale.
   * Timeouts re-arm at wm+1: each watermark advance folds whatever just
   * became ready, and the state removes itself once nothing is pending
   * and the stored purchase is stale. On a BOUNDED replay, drive the
   * final watermark past every event (far-future sentinel key) and the
   * emitted table equals the batch as-of join with tolerance — the
   * unification property the DuckDB gate checks.
   */
  def asofEnrich(events: Dataset[AsofEvent],
                 tolerance: String): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(tolerance))
    require(iv.months == 0, s"tolerance must not use months: $tolerance")
    val tolUs = iv.days * 86400000000L + iv.microseconds
    require(tolUs >= 0, s"tolerance must be >= 0: $tolerance")

    // purchases before clicks at an equal ts (inclusive as-of edge),
    // ids break the remaining ties for a deterministic fold
    def kindRank(e: AsofEvent): Int = if (e.kind == "p") 0 else 1
    def sortAsof(evs: Seq[AsofEvent]): Seq[AsofEvent] =
      evs.sortWith { (a, b) =>
        val c = a.ts.compareTo(b.ts)
        c < 0 || (c == 0 && (kindRank(a) < kindRank(b) ||
          (kindRank(a) == kindRank(b) && a.eventId < b.eventId)))
      }

    def fn(user: Long, it: Iterator[AsofEvent],
           st: GroupState[AsofState]): Iterator[AsofOut] = {
      val wm = st.getCurrentWatermarkMs
      val s0 = st.getOption.getOrElse(AsofState(None, None, Seq.empty))
      val fresh = if (st.hasTimedOut) Seq.empty else it.toSeq
      val all = sortAsof(s0.pending ++ fresh)
      // fold only events STRICTLY below the watermark millisecond (an
      // on-time arrival can still carry ts == wm — the shared boundary
      // discipline)
      val (ready, hold) = all.partition(_.ts.getTime + 1 <= wm)
      var lastUs = s0.lastPurchUs
      var lastV = s0.lastPurchValue
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
      ready.foreach { e =>
        if (e.kind == "p") { lastUs = Some(tsMicros(e.ts)); lastV = Some(e.value) }
        else out += AsofOut(user, e.eventId,
          if (lastUs.exists(pu => tsMicros(e.ts) - pu <= tolUs)) lastV else None)
      }
      // the stored purchase can still serve a future on-time click
      // (ts >= wm) only while wm <= purchase + tolerance — ms-floor on
      // the conservative (keep-longer) side
      val purchaseLive = lastUs.exists(pu => (pu + tolUs) / 1000L + 1 >= wm)
      if (hold.isEmpty && !purchaseLive) st.remove()
      else {
        st.update(AsofState(lastUs, lastV, hold))
        st.setTimeoutTimestamp(wm + 1) // re-arm on every invocation
      }
      out.iterator
    }
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /**
   * FORWARD streaming as-of: each click binds the value of the user's
   * NEXT at-or-after purchase, nulled when that purchase is more than
   * `tolerance` later — conversion attribution ("did this click convert
   * within N hours?"), [[graft.tools.Joins.asofForward]] as an
   * incremental state machine and [[asofEnrich]]'s mirror.
   *
   * The mirror inverts the state: backward keeps ONE folded purchase
   * and clicks resolve instantly; forward keeps the WAITING CLICKS and
   * each folding purchase resolves every click at-or-before it (the
   * first purchase a waiting click sees IS its nearest next, since
   * events fold in event-time order). Clicks fold BEFORE purchases at
   * an equal timestamp — the inclusive `p.ts >= c.ts` edge. A waiting
   * click expires (emits null) once the watermark proves any future
   * on-time purchase would be beyond tolerance; expiring early is
   * output-identical to meeting that too-late purchase, so no
   * out-of-tolerance "nearest next" needs tracking. State per user =
   * lateness buffer + the clicks of one tolerance window — bounded at
   * any scale. Same buffering/boundary/timeout discipline as the other
   * four machines; on a bounded replay, drive the final watermark past
   * every click's tolerance window (far-future sentinel key) and the
   * emitted table equals the batch forward as-of with tolerance.
   */
  def asofEnrichForward(events: Dataset[AsofEvent],
                        tolerance: String): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(tolerance))
    require(iv.months == 0, s"tolerance must not use months: $tolerance")
    val tolUs = iv.days * 86400000000L + iv.microseconds
    require(tolUs >= 0, s"tolerance must be >= 0: $tolerance")

    // clicks before purchases at an equal ts (inclusive forward edge),
    // ids break the remaining ties for a deterministic fold
    def kindRank(e: AsofEvent): Int = if (e.kind == "c") 0 else 1
    def sortFwd(evs: Seq[AsofEvent]): Seq[AsofEvent] =
      evs.sortWith { (a, b) =>
        val c = a.ts.compareTo(b.ts)
        c < 0 || (c == 0 && (kindRank(a) < kindRank(b) ||
          (kindRank(a) == kindRank(b) && a.eventId < b.eventId)))
      }

    def fn(user: Long, it: Iterator[AsofEvent],
           st: GroupState[AsofFwdState]): Iterator[AsofOut] = {
      val wm = st.getCurrentWatermarkMs
      val s0 = st.getOption.getOrElse(AsofFwdState(Seq.empty, Seq.empty))
      val fresh = if (st.hasTimedOut) Seq.empty else it.toSeq
      val all = sortFwd(s0.pending ++ fresh)
      val (ready, hold) = all.partition(_.ts.getTime + 1 <= wm)
      var waiting = s0.waiting
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
      ready.foreach { e =>
        if (e.kind == "c") waiting :+= ((tsMicros(e.ts), e.eventId))
        else {
          val pUs = tsMicros(e.ts)
          // every waiting click is at-or-before this purchase (fold
          // order), so this purchase is each one's nearest next
          waiting.foreach { case (cUs, cId) =>
            out += AsofOut(user, cId,
              if (pUs - cUs <= tolUs) Some(e.value) else None)
          }
          waiting = Seq.empty
        }
      }
      // expire clicks whose tolerance window the watermark has passed:
      // any future on-time purchase (ts >= wm) would be beyond
      // tolerance, so null now == null then (ms-floor keeps the
      // conservative side)
      val (expired, live) = waiting.partition { case (cUs, _) =>
        (cUs + tolUs) / 1000L + 1 <= wm
      }
      expired.foreach { case (_, cId) => out += AsofOut(user, cId, None) }
      waiting = live
      if (hold.isEmpty && waiting.isEmpty) st.remove()
      else {
        st.update(AsofFwdState(waiting, hold))
        st.setTimeoutTimestamp(wm + 1) // re-arm on every invocation
      }
      out.iterator
    }
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /**
   * Streaming TIME-SERIES RESAMPLE + FORWARD FILL — the incremental
   * twin of the batch per-user-hourly-grid as-of join
   * (`resample_ffill`): every user emits one row per absolute hour
   * mark of `[startHourUs, endHourUs]` carrying their last
   * at-or-before event value (None before the first event), and each
   * grid row emits EXACTLY ONCE, as soon as the watermark proves it
   * final — the monitoring/feature-freshness shape, where the batch
   * query would recompute the whole |users|×|hours| table per run.
   *
   * The grid is a CONFIGURED parameter (hour marks must be multiples
   * of `stepUs`): a stream cannot know the table's global min/max, and
   * a production resample runs over a declared window.
   *
   * Discipline shared with the as-of machines: events hold in the
   * lateness buffer until the watermark STRICTLY passes them, then
   * fold in (ts, eventId) order — at an equal micros timestamp the
   * highest event_id folds last and wins, the batch twin's
   * tie-collapse. A grid hour h emits once the watermark is strictly
   * past it (any still-to-come on-time event has ts >= wm > h, so it
   * cannot change h's fill value). State per user = running fill value
   * + next grid hour + lateness buffer — bounded at any scale AND
   * reclaimed: a completed key's state is removed, which is
   * exactly-once-safe because events past the grid end are ignored
   * without creating state (they cannot affect any grid row) and
   * events inside a completed grid are watermark-late. Consequently a
   * user FIRST seen after the grid end emits nothing. A user first
   * seen late but inside the grid backfills the null rows of every
   * already-final hour in one invocation. On a bounded replay, drive
   * the final watermark past `endHourUs` (far-future sentinel key) and
   * the emitted table equals the batch resample.
   */
  def resampleFfill(events: Dataset[ResEvent], startHourUs: Long,
                    endHourUs: Long,
                    stepUs: Long = 3600000000L): Dataset[ResOut] = {
    import events.sparkSession.implicits._
    require(stepUs > 0 && stepUs % 1000 == 0,
      s"stepUs must be positive whole milliseconds: $stepUs")
    require(startHourUs % stepUs == 0 && endHourUs % stepUs == 0 &&
      endHourUs >= startHourUs,
      s"grid [$startHourUs, $endHourUs] must be step-aligned, start <= end")

    // The state machine emits ONE packed row per user per invocation
    // (the consecutive finalized hours and their fill values) instead
    // of one row per grid hour; a stateless posexplode below unpacks
    // them. At the bench's grid that cuts the rows crossing the
    // stateful operator (each paying typed ser/de and the state-store
    // commit path) from |users|×|hours| ≈ 1.08M to |users| ≈ 1.5k; the
    // unpacking runs in whole-stage codegen downstream (guide §2.3/§4).
    // Emitted (userId, hourUs, value) rows are byte-identical.
    def fn(user: Long, it: Iterator[ResEvent],
           st: GroupState[ResState]): Iterator[ResPacked] = {
      val wm = st.getCurrentWatermarkMs
      // events PAST the grid end cannot affect any grid row (a
      // backward fill at hour h only sees events with ts <= h <=
      // endHourUs) — ignoring them here is what makes state removal
      // at grid completion PROVABLY exactly-once: once the watermark
      // is past endHourUs, an event at ts <= endHourUs is late
      // (dropped before reaching this function) and an event past it
      // is ignored without creating state, so a completed key can
      // never be re-created and re-emit. Side effect, documented: a
      // user FIRST seen after the grid end emits no rows at all.
      val fresh =
        if (st.hasTimedOut) Seq.empty
        else it.filter(e => tsMicros(e.ts) <= endHourUs).toSeq
      if (!st.exists && fresh.isEmpty) return Iterator.empty
      val s0 = st.getOption.getOrElse(ResState(None, startHourUs, Seq.empty))
      val all = (s0.pending ++ fresh)
        .sortBy(e => (tsMicros(e.ts), e.eventId))
      // shared boundary: ts == wm is still ON TIME — fold only strictly
      // below the watermark millisecond
      val (ready, hold) = all.partition(_.ts.getTime + 1 <= wm)
      var lastV = s0.lastValue
      var h = s0.nextHourUs
      val firstH = h
      var ei = 0
      val vals = scala.collection.mutable.ArrayBuffer.empty[Option[Double]]
      // a grid hour is final once wm is strictly past it (hours are
      // whole ms by the require above); the emitted hours are
      // CONSECUTIVE from firstH by construction (h steps by stepUs), so
      // (firstH, index) reconstructs each hour exactly downstream
      while (h <= endHourUs && h / 1000L + 1 <= wm) {
        while (ei < ready.size && tsMicros(ready(ei).ts) <= h) {
          lastV = ready(ei).value; ei += 1
        }
        vals += lastV
        h += stepUs
      }
      // fold the final events beyond the last emitted hour too — they
      // are this user's fill value for hours still to come (every
      // future ready event has a later ts, so fold order is preserved)
      while (ei < ready.size) { lastV = ready(ei).value; ei += 1 }
      // grid complete: removal is safe — no event can ever reach this
      // key again (late ones are dropped by the watermark, post-grid
      // ones are ignored above without creating state), so state is
      // RECLAIMED per completed key, not tombstoned
      if (hold.isEmpty && h > endHourUs) st.remove()
      else {
        st.update(ResState(lastV, h, hold))
        st.setTimeoutTimestamp(wm + 1) // re-arm on every invocation
      }
      if (vals.isEmpty) Iterator.empty
      else Iterator.single(ResPacked(user, firstH, vals.toSeq))
    }
    val packed = events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
    // stateless unpack OUTSIDE the stateful operator: posexplode keeps
    // null fill values (it skips only null/empty ARRAYS, and a row with
    // an empty grid slice is never emitted above)
    packed.toDF()
      .select(col("userId"), col("firstHourUs"),
        posexplode(col("values")).as(Seq("__pos", "value")))
      .select(col("userId"),
        (col("firstHourUs") + col("__pos").cast("long") * lit(stepUs))
          .as("hourUs"),
        col("value"))
      .as[ResOut]
  }
}
