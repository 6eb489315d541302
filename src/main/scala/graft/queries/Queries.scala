package graft.queries

import graft.Geo._
import graft.tools.SpatialJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The driver-facing query catalog: each query has a Spark implementation
 * here and (where ANSI-SQL-expressible) a DuckDB oracle in `oracles`.
 *
 * The testdata has no geometry columns (TESTDATA.md), so geometry is
 * derived DETERMINISTICALLY from integer keys; coordinates are integer-
 * valued doubles so every kernel result (shoelace areas, min/max bounds,
 * winding numbers) is exact and hash-comparable against the oracle.
 *
 * Derivations (documented next to each query's oracle SQL):
 *   customer points: px = (c_custkey*7919) % 1000, py = (c_custkey*104729) % 1000
 *   part polygons:   square shell (CCW) + square hole (CW), half-sizes
 *                    h = p_partkey%5 + 1, hh = h - 1
 *   supplier diamonds: rotated squares of odd "radius" over even-coordinate
 *                    centers so no point ever lies exactly on a boundary.
 */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scratch dir for queries that WRITE a dataset: keyed by the sf dir
    * AND the Spark application id, so two harness processes running
    * against the same sf dir can never interleave commits into one
    * directory (the generation-manifest corruption ADVICE flagged).
    * Pair with [[collectAndClean]], which removes the dir once the
    * result is materialized — an app-unique dir is otherwise never
    * reclaimed by later runs. */
  private[queries] def processTmpDir(s: SparkSession, tag: String, dir: String): String = {
    val base = System.getProperty("java.io.tmpdir")
    val stem = s"graft_${tag}_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_"
    val out = base + "/" + stem +
      s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    // stale-sibling sweep: app-unique dirs from EARLIER processes (same
    // stem, other appId) are never revisited by their owner and would
    // accumulate forever. Staleness is the newest mtime in the WHOLE
    // tree (streaming checkpoints churn in grandchildren like
    // ckpt/offsets/N and data/_spark_metadata/N — a depth-1 check
    // misses them); only siblings whole-tree-idle for 2h+ are swept,
    // so a live foreign harness can never be yanked mid-query.
    // Residual: a foreign query idle >2h between its last write and
    // its read loses the scratch; its run fails loudly
    // (FileNotFound), never silently. Scratch trees are small
    // (hundreds of entries), so the walk is cheap.
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    // short-circuits at the first fresh entry (a live sibling answers
    // at its root); never follows directory symlinks, so a cyclic or
    // external link can neither loop the walk nor pin the sibling
    def anyFresh(f: java.io.File): Boolean =
      f.lastModified >= cutoff ||
        (!java.nio.file.Files.isSymbolicLink(f.toPath) &&
          Option(f.listFiles()).getOrElse(Array.empty).exists(anyFresh))
    Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        val n = f.getName
        if (n.startsWith(".graft_sweep_" + stem)) {
          // a crashed sweep's rename-aside leftover: adjudicated stale
          // when it was renamed; finish the delete
          org.apache.commons.io.FileUtils.deleteQuietly(f)
        } else if (n.startsWith(stem) && !anyFresh(f)) {
          // rename ASIDE before deleting, so the victim-visible
          // transition is atomic — whole tree present, or root
          // FileNotFound; never a half-deleted tree (the rename, not a
          // re-stat, is what closes the scan→delete TOCTOU: a foreign
          // harness resuming mid-sweep sees a vanished root, not a
          // torn one). A failed rename skips the sweep (owner
          // plausibly live). The sweep is LOGGED so a victim run's
          // FileNotFound is diagnosable.
          val aside = new java.io.File(base, ".graft_sweep_" + n)
          if (f.renameTo(aside)) {
            org.slf4j.LoggerFactory.getLogger(getClass).info(
              s"swept stale scratch $n (whole-tree idle 2h+)")
            org.apache.commons.io.FileUtils.deleteQuietly(aside)
          }
        }
      }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    out
  }

  /** Bounded-width per-row digest of a (doc_id[, lang], text) frame:
    * the serde round-trip queries compare EVERY row byte-for-byte via
    * md5 + length instead of returning the raw text, so the
    * [[collectAndClean]] driver materialization is O(rows x ~50 B)
    * regardless of corpus byte size. The oracle computes the same
    * md5/length over the ORIGINAL parquet — any serde loss still
    * hash-mismatches, per row. */
  private def textDigest(df: DataFrame, withLang: Boolean): DataFrame = {
    val base = Seq(col("doc_id")) ++
      (if (withLang) Seq(col("lang")) else Nil)
    df.select(base ++ Seq(
      length(col("text")).cast("long").as("text_len"),
      md5(col("text").cast("binary")).as("text_md5")): _*)
  }

  /** Materialize a (small, aggregate-sized) result eagerly and delete
    * the scratch dataset it still lazily references — the returned
    * frame is a local collection, safe to evaluate any time after the
    * directory is gone. */
  private[queries] def collectAndClean(s: SparkSession, scratchDir: String,
                              df: DataFrame): DataFrame = {
    val rows = df.collect().toSeq
    val out = s.createDataFrame(
      s.sparkContext.parallelize(rows, 1), df.schema)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratchDir))
    out
  }

  /** Scope `spark.sql.shuffle.partitions` to the streaming-state
    * default for the duration of a streaming run (the `.start()` ..
    * `awaitTermination()` region — the conf is read at query start).
    * Stateful streaming creates ONE state store per shuffle partition
    * per stateful operator, and every micro-batch pays a commit
    * (delta write + fsync + maintenance) per store — at the bench's
    * state sizes (a few MB total) 32 stores are pure commit overhead:
    * measured 2.6x on the interval join (r16), and profiled again on
    * the windowed-agg / flatMapGroupsWithState family (r17 opt:
    * flatMapGroupsWithState commitMs ~40-59s cumulative per batch at
    * 32 partitions, the zero-row flush batch alone costing 1-3.7s).
    * Production sizes state stores to the STATE, not the core count,
    * via `spark.graft.stream.shufflePartitions`; read/restore keeps
    * the session conf untouched for the batch catalog.
    *
    * COUPLING, documented (r18): the scoped setting also governs any
    * batch jobs submitted from inside a foreachBatch sink during the
    * run (CDC merge-rewrite, near-dedup-vs-corpus, summary merges).
    * Correct but sized to state-commit overhead, not batch width — a
    * deployment whose foreachBatch bodies shuffle real volume should
    * set the session value back inside the body (the conf is read per
    * query start/batch plan), or raise
    * `spark.graft.stream.shufflePartitions` for that pipeline. */
  private[queries] def streamScoped[T](s: SparkSession)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions",
        s.conf.getOption("spark.graft.stream.shufflePartitions")
          .getOrElse("8"))
      body
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Derived PARTSUPP: the testdata schema has no partsupp table, so
    * the (part, supplier) pairs observed in lineitem stand in, with
    * deterministic integer cost/availqty derived from the keys. The
    * point is the TPC-H PLAN SHAPES these feed (Q2 correlated min,
    * Q9 profit multi-join, Q11 double aggregation + scalar-subquery
    * threshold, Q16 anti-joined distinct count) — all replayable
    * exactly by the oracle from the same arithmetic. */
  private def partsupp(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_supplycost_i",
        (col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 10000 + 1)
      .withColumn("ps_availqty",
        (col("ps_partkey") * 7 + col("ps_suppkey") * 3) % 1000 + 1)

  /** The oracle-side twin of [[partsupp]]. */
  private val PartsuppCte: String =
    """partsupp AS (
         SELECT ps_partkey, ps_suppkey,
                (ps_partkey * 31 + ps_suppkey * 17) % 10000 + 1 AS ps_supplycost_i,
                (ps_partkey * 7 + ps_suppkey * 3) % 1000 + 1 AS ps_availqty
         FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                      l_suppkey AS ps_suppkey FROM lineitem))"""

  // ---- derived geometry helpers (Spark side) -------------------------

  /** Shared skeleton for the three stream-stream interval-join queries
    * (inner / left_outer / full_outer): clicks ⋈ purchases of the same
    * user within the preceding hour, BOTH sides watermarked streams
    * (the event-time range condition lets each side evict state past
    * the watermark). ALL the hard-won gotchas live here exactly once:
    *  - far-future sentinel rows on BOTH sides push the global (min)
    *    watermark past all real data, so the trailing no-data batch
    *    flushes outer-join state; they derive from the UNFILTERED
    *    event stream (event_id % 100 — any 100 consecutive ids
    *    contains one), never from a type- or user-filtered subset
    *    whose survival would depend on the data distribution;
    *  - sentinels are dropped by their EVENT TIME, not their id: an id
    *    predicate is pushed below the EventTimeWatermark node by
    *    PushPredicateThroughNonJoin, removing the sentinel BEFORE
    *    watermark tracking — the watermark then stops 1h short of the
    *    newest real row and its unmatched output never flushes;
    *  - the sentinel filter is NULL-TOLERANT per side: outer joins
    *    null the other side's columns, and a bare c_ts < X would drop
    *    every right-only row of a full outer join;
    *  - sentinel users are -1 (click side) vs -2 (purchase side), so
    *    sentinels can never join each other;
    *  - stateful-join state stores are created PER SHUFFLE PARTITION
    *    on both sides: size the conf to the state, not the CPU count
    *    (32 stores of a few hundred rows each are pure commit
    *    overhead — measured 2.6x on the inner query); the conf is
    *    read at query start and restored after. */
  private def streamClickPurchaseJoin(s: SparkSession, dir: String,
                                      joinType: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def src = EventTs.toTimestamp(s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    val farTs = to_timestamp(lit("2200-01-01 00:00:00"))
    val notSentinel = to_timestamp(lit("2100-01-01 00:00:00"))
    val clicks = src.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
      .unionAll(src.where(col("event_id") % 100 === 0)
        .select(lit(-1L).as("click_id"), lit(-1L).as("user_id"),
          farTs.as("c_ts")))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .unionAll(src.where(col("event_id") % 100 === 0)
        .select(lit(-2L).as("p_user"), farTs.as("p_ts"),
          lit(0.0).as("p_value")))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR") &&
        col("p_ts") <= col("c_ts"), joinType)
      .where((col("c_ts").isNull || col("c_ts") < notSentinel) &&
        (col("p_ts").isNull || col("p_ts") < notSentinel))
    val qName = s"graft_stream_stream_${joinType}_join"
    s.streams.active.filter(q => q.name == qName).foreach(_.stop())
    streamScoped(s) {
      val q = joined.writeStream.format("memory").queryName(qName)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qName).select(col("click_id"), col("p_ts"), col("p_value"))
  }

  /** Shared harness for the two streaming as-of queries (backward
    * enrichment / forward conversion attribution): clicks and
    * purchases ride ONE keyed AsofEvent stream; the far-future
    * sentinel derives from the UNFILTERED event stream on its own key
    * (ONE constant ts — it advances every group's event-time timer so
    * the bounded replay drains), and the sentinel's own output rows
    * are filtered ABOVE the stateful operator, far from any watermark
    * node. `forward` picks the machine and the output column name. */
  private def streamAsofRun(s: SparkSession, dir: String,
                            forward: Boolean): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def src = EventTs.toTimestamp(s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    // NULL guards mirror resampleEvents and run on BOTH engines: a
    // NULL user_id cannot ride a primitive-Long keyed state machine,
    // and a NULL-valued purchase must be excluded (not coalesced to
    // 0.0 — the oracle propagates the raw value). Click values never
    // surface, so the coalesce below only backstops the primitive
    // Double encoder field for clicks.
    val base = src.where(col("event_type").isin("click", "purchase"))
      .where(col("user_id").isNotNull &&
        (col("event_type") === "click" || col("value").isNotNull))
      .select(col("user_id").as("userId"), col("ts"),
        col("event_id").as("eventId"),
        when(col("event_type") === "click", lit("c"))
          .otherwise(lit("p")).as("kind"),
        coalesce(col("value"), lit(0.0)).as("value"))
    val sentinel = src.where(col("event_id") % 100 === 0)
      .select(lit(-1L).as("userId"),
        to_timestamp(lit("2200-01-01 00:00:00")).as("ts"),
        lit(-1L).as("eventId"), lit("c").as("kind"), lit(0.0).as("value"))
    val events = base.unionAll(sentinel)
      .withWatermark("ts", "1 hour")
      .as[graft.streaming.AsofEvent]
    val enriched =
      if (forward)
        graft.streaming.Streams.asofEnrichForward(events, tolerance = "6 hours")
      else graft.streaming.Streams.asofEnrich(events, tolerance = "6 hours")
    val qName =
      if (forward) "graft_stream_asof_forward" else "graft_stream_asof_enrich"
    s.streams.active.filter(q => q.name == qName).foreach(_.stop())
    streamScoped(s) {
      val q = enriched.toDF().writeStream.format("memory").queryName(qName)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(qName).where(col("eventId") =!= -1L)
      .select(col("eventId").as("event_id"),
        col("priorValue").as(if (forward) "next_value" else "prior_value"))
  }

  /** Events on the ns clock for the resample family: NULL user_ids are
    * dropped on BOTH engines (a window-partitioned as-of would group
    * NULL keys together while the oracle's equality join never matches
    * them — guard rather than depend on the data). */
  private def resampleEvents(s: SparkSession, dir: String): DataFrame =
    EventTs.toNanos(t(s, dir, "events"))
      .where(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))

  /** Collapse equal-(user, ts) events to ONE row — highest event_id
    * wins (max over the (event_id, value) struct; event_id is unique,
    * so the pick is total). ASOF's choice among exact-tie build rows
    * is engine-arbitrary on BOTH sides; the oracles replay this same
    * collapse with a row_number ORDER BY event_id DESC. */
  private def collapseTies(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), col("ts"))
      .agg(max(struct(col("event_id"), col("value"))).as("__m"))
      .select(col("user_id"), col("ts"), col("__m.value").as("value"))

  /** Per-user hourly grid on the ns clock: one row per (user,
    * hour-floor) spanning the whole table; the bounds row is a 1-row
    * broadcast. Hour-floor MUST be integer `div` — ns epochs ~1.7e18
    * exceed 2^53, a double division corrupts the grid anchor. */
  private def userHourGridNs(ev: DataFrame): DataFrame = {
    val H = 3600L * 1000000000L
    val bounds = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .select(expr(s"(mn div $H) * $H").as("h0"),
        expr(s"(mx div $H) * $H").as("h1"))
    ev.select(col("user_id")).distinct()
      .crossJoin(bounds) // 1-row: Catalyst broadcasts
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), lit(H))).as("t"))
  }

  private def custPoints(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .withColumn("px", ((col("c_custkey") * 7919) % 1000).cast("double"))
      .withColumn("py", ((col("c_custkey") * 104729) % 1000).cast("double"))
      .withColumn("pt", st_point(col("px"), col("py")))

  /** part squares-with-holes; shell CCW, hole CW (SURVEY §1.2 orientation). */
  private def partPolygons(spark: SparkSession, dir: String): DataFrame = {
    val cx = ((col("p_partkey") * 7919) % 1000).cast("double")
    val cy = ((col("p_partkey") * 104729) % 1000).cast("double")
    val h = ((col("p_partkey") % 5) + 1).cast("double")
    val hh = h - lit(1.0)
    val shell = array(
      cx - h, cy - h, cx + h, cy - h, cx + h, cy + h, cx - h, cy + h, cx - h, cy - h)
    val hole = array(
      cx - hh, cy - hh, cx - hh, cy + hh, cx + hh, cy + hh, cx + hh, cy - hh, cx - hh, cy - hh)
    t(spark, dir, "part").withColumn("poly", array(shell, hole))
  }

  /** even-coordinate customer probe points for the diamond joins —
    * nothing ever lands exactly on a diamond boundary (odd radius), so
    * the winding-number result is unambiguous. */
  private def diamondProbePoints(spark: SparkSession, dir: String): DataFrame = {
    val (px, py) = sjoinCenterXY(col("c_custkey"))
    t(spark, dir, "customer")
      .withColumn("pt", st_point(px, py))
      .select(col("c_custkey"), col("pt"))
  }

  /** The PATHOLOGICALLY SKEWED probe points shared by the two skewed
    * sjoin queries: ~90% of customers collapse into one 128-unit grid
    * cell ([0,100)^2), the rest spread over the full extent. */
  private def skewedSjoinPoints(spark: SparkSession, dir: String): DataFrame = {
    val hot = col("c_custkey") % 10 =!= 0
    val (cx, cy) = sjoinCenterXY(col("c_custkey"))
    val px = when(hot, ((col("c_custkey") * 13) % 50) * 2).otherwise(cx)
      .cast("double")
    val py = when(hot, ((col("c_custkey") * 17) % 50) * 2).otherwise(cy)
      .cast("double")
    t(spark, dir, "customer").withColumn("pt", st_point(px, py))
  }

  /** The sjoin family's shared coordinate recipe (even centers from a
    * key, odd radii — no boundary ties), exposed for the extent-scale
    * drill (SpatialScaleBench) so it measures the SAME workload shape
    * as the catalog family instead of a hand-copied one. */
  private[graft] def sjoinCenterXY(key: Column): (Column, Column) =
    ((((key * 7919) % 500) * 2).cast("double"),
      (((key * 104729) % 500) * 2).cast("double"))
  private[graft] def diamondRadius(key: Column): Column =
    ((key % 25) * 2 + 21).cast("double")
  private[graft] def diamondRing(cx: Column, cy: Column, r: Column): Column =
    array(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)

  /** supplier diamonds: CCW rotated squares, radius odd, centers even. */
  private def supplierDiamonds(spark: SparkSession, dir: String): DataFrame = {
    val (sx, sy) = sjoinCenterXY(col("s_suppkey"))
    val r = diamondRadius(col("s_suppkey"))
    val ring = diamondRing(sx, sy, r)
    t(spark, dir, "supplier").withColumn("diamond", array(ring))
      .withColumn("sx", sx).withColumn("sy", sy).withColumn("r", r)
  }

  // ---- query catalog --------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = spatialQueries ++
    PipelineQueries.queries

  val oracles: Map[String, String] = spatialOracles ++ PipelineQueries.oracles

  private lazy val spatialQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SURVEY §3.1 flagship: bbox selection over a point column (cx).
    // Point path composes built-in comparisons (whole-stage codegen +
    // parquet pushdown) — the custom-expression kinds are exercised by
    // the *_bbox queries below.
    "cx_bbox_points" -> ((s, dir) => {
      graft.api.GeoFrame(custPoints(s, dir), "pt", "point")
        .cx(100, 100, 600, 600)
        .df.select(col("c_custkey"), col("px"), col("py"))
    }),

    // SURVEY §2.2 positional take/slice (iloc) — Spark-first: position
    // is DEFINED over an explicit total order (here the geometry's
    // (x, y) with the key as tiebreak), ranked by the two-pass
    // distributed row number (no single-task window), then filtered.
    // Both the slice [10, 400) step 7 and a take of fixed positions,
    // unioned; DuckDB replays the identical row_number arithmetic.
    "iloc_slice_points" -> ((s, dir) => {
      val gf = graft.api.GeoFrame(custPoints(s, dir), "pt", "point")
      val ord = Seq(col("px"), col("py"), col("c_custkey"))
      val sliced = gf.slicePositional(10, 400, 7, 16, ord: _*)
        .df.select(col("c_custkey"), col("px"), col("py"))
        .withColumn("which", lit("slice"))
      val taken = gf.takePositional(Seq(0L, 1L, 5L, 99L), 16, ord: _*)
        .df.select(col("c_custkey"), col("px"), col("py"))
        .withColumn("which", lit("take"))
      sliced.unionByName(taken)
    }),

    // SURVEY §2.8 multipoint-vs-rect kernel over per-order multipoints,
    // built with the st_collect_points aggregate (primitive buffer — no
    // per-row array allocation, unlike collect_list + flatten).
    "multipoint_bbox" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x", (col("l_partkey") % 1000).cast("double"))
        .withColumn("y", (col("l_suppkey") % 1000).cast("double"))
      li.groupBy(col("l_orderkey"))
        .agg(st_collect_points(col("x"), col("y")).as("mp"))
        .where(st_multipoint_intersects_bounds(col("mp"),
          lit(200), lit(200), lit(800), lit(800)))
        .select(col("l_orderkey"))
    }),

    // SURVEY §2.8 polygon-vs-rect kernel (diamonds; oracle = L1 distance
    // from center to rect, exact for integer coords with odd radius).
    "polygon_bbox" -> ((s, dir) => {
      supplierDiamonds(s, dir)
        .where(st_polygon_intersects_bounds(col("diamond"),
          lit(350), lit(350), lit(650), lit(650)))
        .select(col("s_suppkey"))
    }),

    // SURVEY §2.8 line(segment)-vs-rect kernel; oracle = bbox overlap +
    // separating-axis corner-side test, exact in integer arithmetic.
    "line_bbox" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_linenumber") === 1)
      val x0 = (col("l_orderkey") % 1000).cast("double")
      val y0 = (col("l_partkey") % 1000).cast("double")
      val x1 = ((col("l_suppkey") * 13) % 1000).cast("double")
      val y1 = ((col("l_orderkey") * 17) % 1000).cast("double")
      li.select(col("l_orderkey"), array(x0, y0, x1, y1).as("seg"))
        .where(st_line_intersects_bounds(col("seg"),
          lit(300), lit(300), lit(700), lit(700)))
        .select(col("l_orderkey"))
    }),

    // SURVEY §2.6 st_area: signed shoelace with CW holes subtracting.
    // spatial measure × relational dimension COMPOSE: supplier diamond
    // areas rolled up per nation through a broadcast dim join — the
    // shoelace aggregate and the snowflake join in one plan (diamond
    // with half-diagonal r has area exactly 2r², integer-valued)
    "geo_area_by_nation" -> ((s, dir) => {
      supplierDiamonds(s, dir)
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(st_area(col("diamond"))).cast("long").as("area_sum"),
          count(lit(1)).as("n"))
    }),

    "area_polygons" -> ((s, dir) => {
      partPolygons(s, dir)
        .groupBy(col("p_brand"))
        .agg(sum(st_area(col("poly"))).as("total_area"), count(lit(1)).as("n"))
    }),

    // WKB roundtrip for NESTED geometry under the driver gate: the
    // square-with-hole polygons ride encode -> decode and their areas
    // must still hit the exact shoelace arithmetic — pinned to the SAME
    // oracle as area_polygons (the roundtrip must be invisible).
    "wkb_polygon_area" -> ((s, dir) => {
      val rt = graft.Geo.st_geomfromwkb(
        graft.Geo.st_aswkb(col("poly"), "polygon"), "polygon")
      partPolygons(s, dir)
        .groupBy(col("p_brand"))
        .agg(sum(st_area(rt)).as("total_area"), count(lit(1)).as("n"))
    }),

    // SURVEY §2.6 st_length over a 3-vertex polyline.
    "length_lines" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_linenumber") === 1)
      val x0 = (col("l_orderkey") % 1000).cast("double")
      val y0 = (col("l_partkey") % 1000).cast("double")
      val x1 = (col("l_suppkey") % 1000).cast("double")
      val y1 = ((col("l_orderkey") * 7) % 1000).cast("double")
      val x2 = ((col("l_partkey") * 3) % 1000).cast("double")
      val y2 = ((col("l_suppkey") * 11) % 1000).cast("double")
      li.select(col("l_orderkey"),
        st_length(array(x0, y0, x1, y1, x2, y2)).as("len"))
    }),

    // SURVEY §2.6 st_bounds over per-order multipoints.
    "bounds_multipoint" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x", (col("l_partkey") % 1000).cast("double"))
        .withColumn("y", (col("l_suppkey") % 1000).cast("double"))
      val mp = li.groupBy(col("l_orderkey"))
        .agg(st_collect_points(col("x"), col("y")).as("mp"))
      val b = st_bounds(col("mp"))
      mp.select(col("l_orderkey"), b.getField("x0").as("x0"), b.getField("y0").as("y0"),
        b.getField("x1").as("x1"), b.getField("y1").as("y1"))
    }),

    // SURVEY §2.4 total_bounds via the custom DeclarativeAggregate
    // (st_total_bounds_agg — one aggregate, native partial aggregation);
    // the min/max-compose twin is covered by GeoFrame.totalBounds tests.
    "total_bounds_points" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .withColumn("pt", st_point(((col("s_suppkey") * 7919) % 1000).cast("double"),
          ((col("s_suppkey") * 104729) % 1000).cast("double")))
      val tb = st_total_bounds_agg(col("pt"))
      sup.agg(tb.as("tb"))
        .select(col("tb.x0").as("x0"), col("tb.y0").as("y0"),
          col("tb.x1").as("x1"), col("tb.y1").as("y1"))
    }),

    // SURVEY §3.2 sjoin: point-in-polygon via grid-cell equi-join +
    // exact winding-number refine (non-axis-aligned polygons).
    "sjoin_points_in_diamonds" -> ((s, dir) => {
      // even-coordinate points so nothing ever lands exactly on a diamond
      // boundary (odd radius) — winding-number result is unambiguous
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir)
      SpatialJoin.pointInGeom(pts, dia.select(col("s_suppkey"), col("diamond")),
          "pt", "diamond", "polygon", cellSize = 128.0)
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // SURVEY §2.3 sjoin under PATHOLOGICAL SPATIAL SKEW: ~90% of the
    // points collapse into ONE 128-unit grid cell (the dask reference
    // inherits the same exposure — its partition pruning, sjoin.py:105-122,
    // cannot split a dense partition). salt=8 splits the hot cell into 8
    // shuffle keys: each point hashes into one sub-key, diamonds replicate
    // to all 8, so the largest reducer holds ~1/8th of the hot cell
    // instead of all of it. Same exactness contract as every sjoin (even
    // coords, odd radii — no boundary ties); the oracle is the plain
    // cross-join predicate.
    "sjoin_skewed" -> ((s, dir) => {
      val pts = skewedSjoinPoints(s, dir)
      val dia = supplierDiamonds(s, dir)
      SpatialJoin.pointInGeom(pts, dia.select(col("s_suppkey"), col("diamond")),
          "pt", "diamond", "polygon", cellSize = 128.0, salt = 8)
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // Same pathological skew, ADAPTIVE salting: one cheap per-cell count
    // finds the dense cell(s) and only those get the 8-way split —
    // geometries in cold cells are no longer replicated 8x (blanket
    // salting's global cost for a local hot spot). Identical result set
    // to sjoin_skewed by construction; same cross-join-predicate oracle.
    "sjoin_skewed_adaptive" -> ((s, dir) => {
      val pts = skewedSjoinPoints(s, dir)
      val dia = supplierDiamonds(s, dir)
      // this query EXERCISES the adaptive path: the explicit override
      // forces the detection pass past the small-input gate WITHOUT
      // touching session-global conf (construction must never mutate
      // shared session state — Verify asserts it)
      SpatialJoin.pointInGeom(pts,
          dia.select(col("s_suppkey"), col("diamond")),
          "pt", "diamond", "polygon", cellSize = 128.0, salt = 8,
          adaptiveSalt = true, adaptiveMinBytesOverride = 0)
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // SURVEY §2.6 st_oriented: polygons constructed with the WRONG
    // orientation (shell CW, hole CCW) are normalized before the signed
    // area — the result is the canonical shell-minus-hole value; without
    // orient() the sign would flip.
    "oriented_area" -> ((s, dir) => {
      val cx = ((col("p_partkey") * 7919) % 1000).cast("double")
      val cy = ((col("p_partkey") * 104729) % 1000).cast("double")
      val h = ((col("p_partkey") % 5) + 1).cast("double")
      val hh = h - lit(1.0)
      val shellCw = array(
        cx - h, cy - h, cx - h, cy + h, cx + h, cy + h, cx + h, cy - h, cx - h, cy - h)
      val holeCcw = array(
        cx - hh, cy - hh, cx + hh, cy - hh, cx + hh, cy + hh, cx - hh, cy + hh, cx - hh, cy - hh)
      t(s, dir, "part")
        .select(col("p_partkey"),
          st_area(st_oriented(array(shellCw, holeCcw))).as("area"))
    }),

    // SURVEY §2.6 st_boundary: polygon -> multiline; its st_length is the
    // full perimeter (shell + hole), exact in integer coordinates.
    "boundary_length" -> ((s, dir) => {
      partPolygons(s, dir)
        .select(col("p_partkey"), st_length(st_boundary(col("poly"))).as("blen"))
    }),

    // SURVEY §2.2 fillna(method=pad) — the DISTRIBUTED two-pass variant
    // (partition-boundary carry), checked against SQL last_value IGNORE
    // NULLS over the same total order.
    "padna_points" -> ((s, dir) => {
      val pts = custPoints(s, dir)
        .withColumn("pt", when(col("c_custkey") % 7 =!= 0, col("pt")))
      graft.api.GeoFrame(pts, "pt", "point")
        .padNaPartitioned(col("c_custkey"), numPartitions = 8)
        .df.select(col("c_custkey"), st_x(col("pt")).as("fx"), st_y(col("pt")).as("fy"))
    }),

    // SURVEY §2.2 fillna(method=backfill) — the DISTRIBUTED variant
    // (descending partition-boundary carry), checked against SQL
    // first_value IGNORE NULLS over the following frame.
    "backfillna_points" -> ((s, dir) => {
      val pts = custPoints(s, dir)
        .withColumn("pt", when(col("c_custkey") % 7 =!= 0, col("pt")))
      graft.api.GeoFrame(pts, "pt", "point")
        .backfillNaPartitioned(col("c_custkey"), numPartitions = 8)
        .df.select(col("c_custkey"), st_x(col("pt")).as("fx"), st_y(col("pt")).as("fy"))
    }),

    // SURVEY §3.2 via the PLANNER: a plain DataFrame join with the
    // st_intersects predicate — no SpatialJoin call. The
    // SpatialJoinRewrite rule (enabled through spark.sql.extensions in
    // Verify/Bench) must turn this into the grid hash join; same oracle
    // as sjoin_points_in_diamonds.
    "sjoin_auto" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      pts.join(dia, st_intersects(pts("pt"), dia("diamond"), "polygon"))
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // sjoin how=left via the PLANNER (r17): a plain DataFrame LEFT
    // join with the st_intersects predicate — SpatialJoinRewrite plans
    // it as the keyless single-cell left-outer grid join (a point keys
    // exactly one cell, so outer multiplicity needs no key column);
    // without the rule this is a BroadcastNestedLoopJoin. Oracle is
    // the plain SQL LEFT JOIN.
    "sjoin_sql_left" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      pts.join(dia, st_intersects(pts("pt"), dia("diamond"), "polygon"), "left")
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // sjoin how=right via the PLANNER (r17), point side on the RIGHT
    // (the preserved side): planned as the reordered left-outer grid
    // join. Oracle is the plain SQL RIGHT JOIN.
    "sjoin_sql_right" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      dia.join(pts, st_intersects(pts("pt"), dia("diamond"), "polygon"), "right")
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // spatial SEMI join via the PLANNER (r17): customers inside at
    // least one diamond, each once — the grid shape decides membership
    // with the exact predicate inside the join condition. The
    // spatial-filter primitive of decontamination-style pipelines
    // ("rows covered by any region") at full distribution.
    "sjoin_semi" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      pts.join(dia, st_intersects(pts("pt"), dia("diamond"), "polygon"),
          "left_semi")
        .select(col("c_custkey"))
    }),

    // spatial ANTI join via the PLANNER (r17): customers covered by NO
    // diamond — the complement filter ("rows outside every region").
    "sjoin_anti" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      pts.join(dia, st_intersects(pts("pt"), dia("diamond"), "polygon"),
          "left_anti")
        .select(col("c_custkey"))
    }),

    // SURVEY §2.3 sjoin how=left: every point row kept, diamond key null
    // where no diamond contains the point (tools/sjoin.py:26-94 left
    // semantics via key-preserving outer join on the inner grid join).
    "sjoin_left" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      SpatialJoin.pointInGeom(pts, dia, "pt", "diamond", "polygon",
          cellSize = 128.0, how = "left", leftKey = "c_custkey")
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // SURVEY §2.3 sjoin how=right: every diamond row kept (right keeps
    // the right geometry side — sjoin.py:249-270).
    "sjoin_right" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      SpatialJoin.pointInGeom(pts, dia, "pt", "diamond", "polygon",
          cellSize = 128.0, how = "right", rightKey = "s_suppkey")
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // SURVEY §2.3 sjoin via the broadcast R-tree path (the reference's
    // index-nested-loop join): driver-built HilbertRtree over diamond
    // bboxes, zero shuffle of the point side. Same oracle as the grid
    // join — the two physical strategies must agree exactly.
    "sjoin_broadcast" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      SpatialJoin.broadcastPointInGeom(pts, dia, "pt", "diamond", "polygon",
          rightKey = "s_suppkey")
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // SURVEY §2.3 the CO-LOCATED recurring-join path: geometry corpus
    // persisted as a cell-exploded bucketed table (only the point side
    // shuffles at PROBE time); must produce exactly the grid join's
    // pairs (same oracle as sjoin_points_in_diamonds). NOTE: the timed
    // body includes the one-time table build — like pack_roundtrip this
    // measures the whole setup+probe lifecycle, not the recurring-probe
    // cost alone (the probe-only plan shape is gated in SpatialJoinSpec).
    "sjoin_bucketed" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      val dia = supplierDiamonds(s, dir).select(col("s_suppkey"), col("diamond"))
      val table = "graft_bucketed_diamonds"
      SpatialJoin.saveGeomsBucketedByCell(dia, "diamond", table,
        cellSize = 128.0, numBuckets = 8, geomKind = "polygon")
      SpatialJoin.pointInGeomBucketed(pts, table, "pt", "diamond", "polygon")
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // SURVEY §2.2/§2.3 point-in-MULTIPOLYGON join: two diamonds per
    // supplier (second center shifted +100,+100 — parity preserved, so
    // still no boundary ties) — the 3-level-nested kind through the
    // whole grid-join path; oracle = point within L1 radius of EITHER
    // center.
    "sjoin_multipolygon" -> ((s, dir) => {
      val pts = diamondProbePoints(s, dir)
      // reuse supplierDiamonds' geometry: polygon 1 is its diamond ring,
      // polygon 2 the same ring shifted via its sx/sy/r columns
      val sd = supplierDiamonds(s, dir)
      val (cx2, cy2, r2) = (col("sx") + 100, col("sy") + 100, col("r"))
      val ring2 = array(cx2 + r2, cy2, cx2, cy2 + r2, cx2 - r2, cy2,
        cx2, cy2 - r2, cx2 + r2, cy2)
      // diamond is already one polygon (array of rings), so the
      // multipolygon is [diamond, [ring2]]
      val dia = sd.select(col("s_suppkey"),
        array(col("diamond"), array(ring2)).as("mpoly"))
      SpatialJoin.pointInGeom(pts, dia, "pt", "mpoly", "multipolygon",
          cellSize = 128.0)
        .select(col("c_custkey"), col("s_suppkey"))
    }),

    // Geometry x geometry spatial join (line segments vs line segments)
    // through SpatialJoin.geomGridInner: BOTH sides cell-explode, pairs
    // dedup by the canonical reference cell (no distinct), exact refine
    // via the full-matrix st_geom_intersects kernel. The oracle is an
    // independent CLRS-style segment-intersection formulation in pure
    // integer SQL arithmetic — a genuine cross-engine differential for
    // the segment kernel itself, at join scale.
    "sjoin_lines" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ax0 = (col("l_orderkey") % 50).cast("double")
      val ay0 = (col("l_partkey") % 50).cast("double")
      val dx = (col("l_suppkey") % 7).cast("double") - 3
      val dy = ((col("l_orderkey") * 3) % 7).cast("double") - 3
      val segs = li
        .where(!(col("l_suppkey") % 7 === 3 && (col("l_orderkey") * 3) % 7 === 3))
        .select(col("l_orderkey"), col("l_linenumber"),
          array(ax0, ay0, ax0 + dx, ay0 + dy).as("seg"))
      val nat = t(s, dir, "nation")
      val bx0 = (col("n_nationkey") * 2).cast("double")
      val by0 = ((col("n_nationkey") * 7) % 50).cast("double")
      val bdy = ((col("n_nationkey") % 5) * 3).cast("double") - 6
      val nsegs = nat.select(col("n_nationkey"),
        array(bx0, by0, bx0 + 6, by0 + bdy).as("nseg"))
      SpatialJoin.geomGridInner(segs, nsegs, col("seg"), "line",
          col("nseg"), "line", cellSize = 8.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("n_nationkey"))
    }),

    // the broadcast-index path of the geometry x geometry join must
    // produce EXACTLY the grid join's pairs (same CLRS oracle as
    // sjoin_lines): driver R-tree over nation-segment bboxes, left side
    // never shuffles
    "sjoin_lines_bcast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ax0 = (col("l_orderkey") % 50).cast("double")
      val ay0 = (col("l_partkey") % 50).cast("double")
      val dx = (col("l_suppkey") % 7).cast("double") - 3
      val dy = ((col("l_orderkey") * 3) % 7).cast("double") - 3
      val segs = li
        .where(!(col("l_suppkey") % 7 === 3 && (col("l_orderkey") * 3) % 7 === 3))
        .select(col("l_orderkey"), col("l_linenumber"),
          array(ax0, ay0, ax0 + dx, ay0 + dy).as("seg"))
      val nat = t(s, dir, "nation")
      val bx0 = (col("n_nationkey") * 2).cast("double")
      val by0 = ((col("n_nationkey") * 7) % 50).cast("double")
      val bdy = ((col("n_nationkey") % 5) * 3).cast("double") - 6
      val nsegs = nat.select(col("n_nationkey"),
        array(bx0, by0, bx0 + 6, by0 + bdy).as("nseg"))
      SpatialJoin.broadcastGeomJoin(segs, nsegs, "seg", "line",
          "nseg", "line", rightKey = "n_nationkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("n_nationkey"))
    }),

    // the left-join variant of the geometry x geometry join (reference
    // sjoin how="left" semantics extended to the full kind matrix):
    // every segment kept, nation attributes null where no intersection.
    // Built on orders — o_orderkey is UNIQUE (geomJoin's leftKey
    // contract; lineitem's (orderkey, linenumber) is not a key in the
    // synthetic data).
    "sjoin_lines_left" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val ax0 = (col("o_orderkey") % 50).cast("double")
      val ay0 = (col("o_custkey") % 50).cast("double")
      val dx = (col("o_orderkey") % 7).cast("double") - 3
      val dy = ((col("o_custkey") * 3) % 7).cast("double") - 3
      val segs = ord
        .where(!(col("o_orderkey") % 7 === 3 && (col("o_custkey") * 3) % 7 === 3))
        .select(col("o_orderkey"),
          array(ax0, ay0, ax0 + dx, ay0 + dy).as("seg"))
      val nat = t(s, dir, "nation")
      val bx0 = (col("n_nationkey") * 2).cast("double")
      val by0 = ((col("n_nationkey") * 7) % 50).cast("double")
      val bdy = ((col("n_nationkey") % 5) * 3).cast("double") - 6
      val nsegs = nat.select(col("n_nationkey"),
        array(bx0, by0, bx0 + 6, by0 + bdy).as("nseg"))
      SpatialJoin.geomJoin(segs, nsegs, "seg", "line", "nseg", "line",
          cellSize = 8.0, how = "left", leftKey = "o_orderkey")
        .select(col("o_orderkey"), col("n_nationkey"))
    }),

    // r17: the geometry x geometry grid join under PATHOLOGICAL SKEW —
    // ~90% of the lineitem segments collapse into ONE 8-unit grid cell
    // ([0,8)^2). adaptiveSalt detects the dense EXPLODED-cell keys on
    // the probe side and splits only those (8-way), leaving cold cells
    // unreplicated — the dual-grid twin of sjoin_skewed_adaptive,
    // closing the skew gap the r16 verdict flagged (geomGridInner had
    // no salting mode at all). The explicit override forces detection
    // past the small-input gate without touching session conf. Same
    // independent CLRS integer-arithmetic oracle as sjoin_lines.
    "sjoin_lines_skewed" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val hot = col("l_orderkey") % 10 =!= 0
      val ax0 = when(hot, (col("l_orderkey") * 13) % 8)
        .otherwise(col("l_orderkey") % 50).cast("double")
      val ay0 = when(hot, (col("l_partkey") * 17) % 8)
        .otherwise(col("l_partkey") % 50).cast("double")
      val dx = (col("l_suppkey") % 7).cast("double") - 3
      val dy = ((col("l_orderkey") * 3) % 7).cast("double") - 3
      val segs = li
        .where(!(col("l_suppkey") % 7 === 3 && (col("l_orderkey") * 3) % 7 === 3))
        .select(col("l_orderkey"), col("l_linenumber"),
          array(ax0, ay0, ax0 + dx, ay0 + dy).as("seg"))
      val nat = t(s, dir, "nation")
      val bx0 = (col("n_nationkey") * 2).cast("double")
      val by0 = ((col("n_nationkey") * 7) % 50).cast("double")
      val bdy = ((col("n_nationkey") % 5) * 3).cast("double") - 6
      val nsegs = nat.select(col("n_nationkey"),
        array(bx0, by0, bx0 + 6, by0 + bdy).as("nseg"))
      SpatialJoin.geomJoin(segs, nsegs, "seg", "line", "nseg", "line",
          cellSize = 8.0, salt = 8, adaptiveSalt = true,
          adaptiveMinBytesOverride = 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("n_nationkey"))
    }),

    // SURVEY §2.4 GROUPED total_bounds through the custom
    // DeclarativeAggregate — per-nation bounding boxes in one pass
    // (partial aggregation native; the reference only has whole-array
    // total_bounds, this is its groupBy generalization).
    "group_total_bounds" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .withColumn("pt", st_point(((col("s_suppkey") * 7919) % 1000).cast("double"),
          ((col("s_suppkey") * 104729) % 1000).cast("double")))
      sup.groupBy(col("s_nationkey"))
        .agg(st_total_bounds_agg(col("pt")).as("tb"))
        .select(col("s_nationkey"), col("tb.x0").as("x0"), col("tb.y0").as("y0"),
          col("tb.x1").as("x1"), col("tb.y1").as("y1"))
    }),

    // SURVEY §3.1 cx with OPEN slice ends: open ends resolve against the
    // frame's total bounds (reference base.py:661-689) — here x0=300 is
    // given, the other three ends default to total_bounds, so exactly
    // the px >= 300 half-plane survives.
    "cx_open_slice" -> ((s, dir) => {
      graft.api.GeoFrame(custPoints(s, dir), "pt", "point")
        .cxOpen(x0 = Some(300.0))
        .df.select(col("c_custkey"))
    }),

    // SURVEY §2.2 exact point-vs-multipoint intersects (equality against
    // any member point — point.py:87-149 support matrix beyond the line
    // and polygon cases proven elsewhere).
    "intersects_point_multipoint" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pt = st_point((col("l_partkey") % 10).cast("double"),
        (col("l_suppkey") % 10).cast("double"))
      val mp = array(
        (col("l_orderkey") % 10).cast("double"), (col("l_partkey") % 10).cast("double"),
        (col("l_suppkey") % 10).cast("double"), (col("l_orderkey") % 10).cast("double"))
      li.where(st_intersects(pt, mp, "multipoint"))
        .select(col("l_orderkey"), col("l_linenumber"))
    }),

    // SURVEY §1.3 NaN pen-up separators in st_length: a non-finite pair
    // splits the polyline, so only the two finite segments count
    // (reference measures.py:21-23, test_geometry.py:67-77) — proven
    // against an oracle computing exactly those two segment lengths.
    "length_penup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_linenumber") === 1)
      val x0 = (col("l_orderkey") % 1000).cast("double")
      val y0 = (col("l_partkey") % 1000).cast("double")
      val x1 = (col("l_suppkey") % 1000).cast("double")
      val y1 = ((col("l_orderkey") * 7) % 1000).cast("double")
      val x2 = ((col("l_partkey") * 3) % 1000).cast("double")
      val y2 = ((col("l_suppkey") * 11) % 1000).cast("double")
      val x3 = ((col("l_orderkey") * 13) % 1000).cast("double")
      val y3 = ((col("l_partkey") * 17) % 1000).cast("double")
      val nan = lit(Double.NaN)
      li.select(col("l_orderkey"),
        st_length(array(x0, y0, x1, y1, nan, nan, x2, y2, x3, y3)).as("len"))
    }),

    // SURVEY §2.2 fillna(value): null geometries replaced by a constant
    // point (reference base.py:510-560 value-fill path).
    "fillna_points" -> ((s, dir) => {
      val pts = custPoints(s, dir)
        .withColumn("pt", when(col("c_custkey") % 7 =!= 0, col("pt")))
      graft.api.GeoFrame(pts, "pt", "point")
        .fillNa(st_point(lit(-1.0), lit(-1.0)))
        .df.select(col("c_custkey"), st_x(col("pt")).as("fx"), st_y(col("pt")).as("fy"))
    }),

    // SURVEY §2.5 lexicographic geometry ordering (baselist.py:249-290):
    // rank segments by their coordinate arrays — Spark's array ordering
    // and the oracle's list ordering are both lexicographic with
    // shorter-first, so the ranks must agree exactly. The rank itself is
    // the DISTRIBUTED two-pass global row number (Ranks.globalRowNumber),
    // not a single-task global window.
    "geom_sort_rank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_linenumber") === 1)
      val x0 = (col("l_orderkey") % 7).cast("double")
      val y0 = (col("l_partkey") % 7).cast("double")
      val x1 = (col("l_suppkey") % 7).cast("double")
      val y1 = ((col("l_orderkey") * 3) % 7).cast("double")
      val segs = li.select(col("l_orderkey"), array(x0, y0, x1, y1).as("seg"))
      graft.tools.Ranks.globalRowNumber(segs, "rnk", 16,
          col("seg"), col("l_orderkey"))
        .select(col("l_orderkey"), col("rnk"))
    }),

    // SURVEY §2.6 multipolygon boundary: two disjoint squares -> one
    // multiline whose length is the sum of both perimeters (exact).
    "mpoly_boundary_len" -> ((s, dir) => {
      val cx = ((col("p_partkey") * 7919) % 1000).cast("double")
      val cy = ((col("p_partkey") * 104729) % 1000).cast("double")
      val h = ((col("p_partkey") % 5) + 1).cast("double")
      val sq1 = array(cx - h, cy - h, cx + h, cy - h, cx + h, cy + h, cx - h, cy + h, cx - h, cy - h)
      val off = cy + lit(3000.0)
      val sq2 = array(cx - h, off - h, cx + h, off - h, cx + h, off + h, cx - h, off + h, cx - h, off - h)
      t(s, dir, "part").select(col("p_partkey"),
        st_length(st_boundary(array(array(sq1), array(sq2)))).as("blen"))
    }),

    // SURVEY §2.2 exact point-on-line intersects (cross-product == 0).
    "intersects_point_line" -> ((s, dir) => {
      val line = array(lit(0.0), lit(0.0), lit(1000.0), lit(1000.0))
      custPoints(s, dir)
        .where(st_intersects(col("pt"), line, "line"))
        .select(col("c_custkey"))
    }),

    // SURVEY §2.5/§3.3 hilbert packing under the FULL oracle gate.
    // repartitionByRange draws sampling-dependent boundaries, so its
    // per-partition counts are not reproducible; here the boundaries
    // are the EXACT ntile split of the distributed hilbert rank
    // (Ranks.globalRowNumber — two-pass, no single-task window), which
    // makes every output cell deterministic:
    //   n_rows  per partition is pure arithmetic on count(*) — DuckDB
    //           recomputes it without knowing hilbert at all;
    //   ok      asserts the packing invariant the reference tests
    //           (test_parquet.py:136-167): partition hilbert ranges are
    //           non-overlapping and in partition order (8-row window).
    // The hilbert values themselves are pinned by HilbertSpec
    // (exhaustive p<=6 + roundtrip p=15); the sampling-based
    // repartitionByRange writer stays the at-scale path (pack_roundtrip).
    // Z-order (morton) codes are replayable in plain integer SQL — bit
    // interleave is just Σ_b bit_b(x)·4^b + bit_b(y)·2·4^b — so unlike
    // hilbert (whose oracle can only check packing invariants) every
    // VALUE is DuckDB-gated bit-for-bit. Bounds (0,0,1024,1024) at p=10
    // give quantization scale 2^10/1024 = 1: the quantized cell IS the
    // integer coordinate in both engines, no FP boundary anywhere.
    "morton_codes" -> ((s, dir) => {
      custPoints(s, dir).select(col("c_custkey"),
        st_morton_distance(col("pt"), lit(0.0), lit(0.0),
          lit(1024.0), lit(1024.0), 10).as("m"))
    }),

    "hilbert_pack_stats" -> ((s, dir) => {
      val nParts = 8
      val pts = custPoints(s, dir)
        .withColumn("h", st_hilbert_distance(col("pt"),
          lit(0.0), lit(0.0), lit(1000.0), lit(1000.0), 15))
        .select(col("c_custkey"), col("h"))
      val ranked = graft.tools.Ranks.globalRowNumber(
        pts, "rank", nParts, col("h"), col("c_custkey"))
      val stats = ranked
        .crossJoin(broadcast(ranked.select(count(lit(1)).as("__n"))))
        .withColumn("part",
          floor((col("rank") - 1) * nParts / col("__n")).cast("long"))
        .groupBy(col("part"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("h")).as("hmin"), max(col("h")).as("hmax"))
      val w = Window.orderBy(col("part")) // nParts rows — trivially small
      stats.select(col("part"), col("n_rows"),
        coalesce(col("hmin") >= lag(col("hmax"), 1).over(w), lit(true))
          .cast("int").as("ok"))
    }),

    // SURVEY §3.3 END-TO-END lifecycle: hilbert-pack to parquet (range
    // shuffle + sort + sidecar), re-read with bounds (file pruning
    // against the sidecar), exact cx residual — the reference's
    // pack_partitions_to_parquet + read_parquet_dask(bounds=...) cycle
    // under the driver's oracle gate. The box filter is exact, so the
    // result is independent of which files survive pruning.
    "pack_roundtrip" -> ((s, dir) => {
      val out = processTmpDir(s, "pack", dir)
      val gf = graft.api.GeoFrame(
        custPoints(s, dir).select(col("c_custkey"), col("pt")), "pt", "point")
      graft.io.GeoParquet.packPartitionsToParquet(gf, out, numPartitions = 8,
        mode = "overwrite")
      collectAndClean(s, out, graft.io.GeoParquet.read(s, out, "pt", "point",
          bounds = Some((200.0, 200.0, 700.0, 700.0)))
        .cx(200, 200, 700, 700)
        .df.select(col("c_custkey")))
    }),

    // SURVEY §2.2 dask `cx_partitions` under the DuckDB oracle (r17 —
    // previously ScalaTest-only): file-granularity bbox read — WHOLE
    // candidate partitions survive, no row-level residual
    // (dask.py:641-654). The lake is built in-query with one file per
    // deterministic px-band, so the oracle can recompute each file's
    // bounds (min/max per band) and the survivor row-set in pure SQL.
    "cx_partitions" -> ((s, dir) => {
      val out = processTmpDir(s, "cxpart", dir)
      val pts = custPoints(s, dir)
      (0 until 4).foreach { b =>
        val part = pts.where(floor(col("px") / 250).cast("int") === b)
          .select(col("c_custkey"), col("pt")).coalesce(1)
        graft.io.GeoParquet.appendWithSidecar(part, out, Seq("pt"))
      }
      collectAndClean(s, out,
        graft.io.GeoParquet.read(s, out, "pt", "point",
            bounds = Some((300.0, 0.0, 600.0, 1000.0)))
          .df.select(col("c_custkey")))
    }),

    // SURVEY §2.2 `.sindex` under the DuckDB oracle (r17 — previously
    // ScalaTest-only): the driver-side packed Hilbert R-tree probe
    // (geometry/sindex.py) — keys of rows whose bounds intersect the
    // query box; for points that is exactly the closed bbox filter the
    // oracle states in SQL.
    "sindex_probe" -> ((s, dir) => {
      import s.implicits._
      val gf = graft.api.GeoFrame(
        custPoints(s, dir).select(col("c_custkey"), col("pt")), "pt", "point")
      gf.sindex("c_custkey").intersects(200.0, 300.0, 700.0, 800.0)
        .toSeq.toDF("c_custkey")
    }),

    // SURVEY §2.1 serde: WKT export of derived points (round-trip parsing
    // is covered in ExpressionsSpec; integer coords make the text exact).
    "wkt_points" -> ((s, dir) => {
      custPoints(s, dir)
        .select(col("c_custkey"), st_astext(col("pt"), "point").as("wkt"))
        .where(col("c_custkey") % 10 === 0)
    }),

    // SURVEY §2.1 serde: WKB — the ecosystem's binary interchange
    // (geopandas GeoParquet stores WKB). Points ride through encode +
    // decode and come out as exact coordinates + the canonical 21-byte
    // little-endian payload (hex-compared: DuckDB rebuilds the blob from
    // pure arithmetic). Byte-exact external parity vs an independent
    // python writer is pinned in WkbSpec.
    "wkb_roundtrip" -> ((s, dir) => {
      val withWkb = custPoints(s, dir)
        .where(col("c_custkey") % 10 === 0)
        .withColumn("wkb", graft.Geo.st_aswkb(col("pt"), "point"))
      val back = graft.Geo.st_geomfromwkb(col("wkb"), "point")
      withWkb.select(col("c_custkey"),
        st_x(back).as("px2"), st_y(back).as("py2"),
        lower(hex(col("wkb"))).as("wkb_hex"))
    }),

    // JSONL ingest/export round-trip — the LLM-corpus interchange
    // format (most document corpora ship as jsonl). Docs write to
    // line-delimited JSON and read back schema-inferred; every id and
    // the full text must survive escaping byte-for-byte (the oracle
    // reads the ORIGINAL parquet — any serde loss hash-mismatches).
    // The RESULT is a per-row digest (length + md5), not the text
    // itself: byte-exactness is checked just as strictly, but the
    // driver-side collect stays O(rows x ~50B) instead of scaling
    // with corpus bytes.
    "jsonl_roundtrip" -> ((s, dir) => {
      val out = processTmpDir(s, "jsonl", dir)
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .write.json(out)
      collectAndClean(s, out,
        textDigest(s.read.json(out), withLang = false))
    }),

    // CSV ingest/export round-trip — the other interchange format a
    // corpus pipeline must speak. RFC-4180 quoting (escape = doubled
    // quote), header, multiline fields; the oracle reads the ORIGINAL
    // parquet, so any quoting/inference loss hash-mismatches.
    "csv_roundtrip" -> ((s, dir) => {
      val out = processTmpDir(s, "csv", dir)
      t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        .write.option("header", "true").option("escape", "\"").csv(out)
      collectAndClean(s, out,
        textDigest(s.read.option("header", "true").option("multiLine", "true")
          .option("escape", "\"")
          .schema("doc_id LONG, lang STRING, text STRING").csv(out),
          withLang = true))
    }),

    // gzip-compressed JSONL round-trip — the shape public web corpora
    // actually ship in (CC dumps are .jsonl.gz); Spark must write and
    // transparently re-read the compressed shards losslessly.
    "jsonl_gzip_roundtrip" -> ((s, dir) => {
      val out = processTmpDir(s, "jsonlgz", dir)
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .write.option("compression", "gzip").json(out)
      collectAndClean(s, out,
        textDigest(s.read.json(out), withLang = false))
    }),

    // ORC round-trip — Spark's other built-in columnar format (ZLIB by
    // default); the full documents table must survive the column-typed
    // write+read bit-for-bit vs the parquet oracle.
    "orc_roundtrip" -> ((s, dir) => {
      val out = processTmpDir(s, "orc", dir)
      t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        .write.orc(out)
      collectAndClean(s, out, textDigest(s.read.orc(out), withLang = true))
    }),

    // XML round-trip — Spark 4's built-in XML source (the format
    // feed/dump corpora still arrive in). Full documents rows must
    // survive element escaping + schema'd re-read bit-for-bit vs the
    // parquet oracle.
    "xml_roundtrip" -> ((s, dir) => {
      val out = processTmpDir(s, "xml", dir)
      t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        .write.option("rowTag", "doc").format("xml").save(out)
      collectAndClean(s, out, textDigest(s.read.option("rowTag", "doc")
        .schema("doc_id LONG, lang STRING, text STRING").format("xml")
        .load(out), withLang = true))
    }),

    // SURVEY §2.1 serde: GeoJSON export (the WKT twin; integer coords so
    // the JSON text is exact).
    "geojson_points" -> ((s, dir) => {
      custPoints(s, dir)
        .select(col("c_custkey"), st_asgeojson(col("pt"), "point").as("gj"))
        .where(col("c_custkey") % 10 === 0)
    }),

    // The SQL surface end-to-end: geometry constructed and measured in
    // pure spark.sql text through the extension-registered st_*
    // functions (area, boundary length, bbox predicate) — proving the
    // FunctionRegistry path under the driver gate, not just the
    // DataFrame API.
    "sql_surface" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("graft_parts")
      s.sql("""
        SELECT p_partkey,
               st_area(poly) AS area,
               st_length(st_boundary(poly)) AS perim,
               st_polygon_intersects_bounds(poly, 300, 300, 700, 700) AS hits
        FROM (
          SELECT p_partkey,
                 array(array(cx-h, cy-h, cx+h, cy-h, cx+h, cy+h, cx-h, cy+h, cx-h, cy-h)) AS poly
          FROM (
            SELECT p_partkey,
                   CAST((p_partkey*7919)%1000 AS DOUBLE) AS cx,
                   CAST((p_partkey*104729)%1000 AS DOUBLE) AS cy,
                   CAST((p_partkey%5)+1 AS DOUBLE) AS h
            FROM graft_parts))""")
    }),

    // Relational sanity: TPC-H Q1-style aggregate (integer-valued sums).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    // TPC-H Q3 shape (shipping priority): selective dimension filter →
    // 3-way join → grouped revenue → top-10. Revenue is INTEGER-staged
    // (cents × discount-hundredths: Σ of exact int64 products is
    // order-independent, unlike the classic double Σ p·(1−d)) so the
    // top-10 selection is deterministic cross-engine. Catalyst
    // broadcasts the filtered customer/orders dims; the lineitem fact
    // never shuffles before its group-by.
    "q3_shipping" -> ((s, dir) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      val c = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = t(s, dir, "orders").where(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val l = t(s, dir, "lineitem").where(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev")).as("revenue_i"))
        .orderBy(col("revenue_i").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape (local-supplier volume): 6-way snowflake join with
    // a region filter and a one-year date band. Plan shape that must
    // hold at 100 TB: region⋈nation⋈supplier and nation⋈customer are
    // broadcast dims; lineitem joins orders on its own key; revenue is
    // integer-staged (cents × discount-hundredths) so the Σ per nation
    // is order-independent and cross-engine exact.
    "q5_local_supplier" -> ((s, dir) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val nat = t(s, dir, "nation").join(
        t(s, dir, "region").where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev"))
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).as("revenue_i"))
    }),

    // TPC-H Q18 shape (large-volume customers): reduce-before-join —
    // the lineitem fact collapses to per-order quantity sums FIRST
    // (shuffle ∝ distinct orders, and the HAVING filter then drops
    // ~97% of them before any join), then joins orders + customer.
    // Quantities are integer-valued doubles → cast to long for exact
    // cross-engine sums.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .where(col("total_qty") > 150)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("total_qty"))
    }),

    // TPC-H Q7 shape (volume shipping): revenue flowing between two
    // named nations, by supplier-nation × customer-nation × ship year.
    // Scale shape: nation is broadcast into BOTH supplier and customer
    // (tiny dims); the lineitem fact is date-band filtered at the scan
    // (pushed filter), joins suppliers broadcast, then orders/customer
    // on their own keys. The two-direction predicate is applied after
    // the joins on already-tiny dimension attributes. Revenue is
    // integer-staged (cents × discount-hundredths) for cross-engine
    // exactness.
    "q7_volume_shipping" -> ((s, dir) => {
      val (n1, n2) = ("NATION_1", "NATION_2")
      val nat = t(s, dir, "nation")
        .where(col("n_name").isin(n1, n2))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev"))
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .where((col("supp_nation") === n1 && col("cust_nation") === n2) ||
          (col("supp_nation") === n2 && col("cust_nation") === n1))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev")).as("revenue_i"))
    }),

    // TPC-H Q8 shape (national market share): of all ECONOMY-part
    // revenue sold to customers in region AMERICA, what fraction came
    // from NATION_6 suppliers, per order year. Scale shape: part
    // filter and nation dims broadcast; the fact joins orders/customer
    // on their keys; numerator is a conditional sum inside ONE grouped
    // aggregate (no second pass over the fact). The share is
    // integer-permille via BIGINT `div` — exact cross-engine. (At true
    // 100 TB revenue magnitudes the ×1000 staging would move to
    // DECIMAL(38,0); sums here are ≤ ~5e16.)
    "q8_market_share" -> ((s, dir) => {
      val target = "NATION_6"
      val amNat = t(s, dir, "nation").join(
        t(s, dir, "region").where(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = t(s, dir, "customer")
        .join(broadcast(amNat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val par = t(s, dir, "part").where(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev"))
      li.join(broadcast(par), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === target, col("rev")).otherwise(0L))
            .as("nation_rev_i"),
          sum(col("rev")).as("total_rev_i"))
        .withColumn("share_permille",
          expr("CAST(nation_rev_i * 1000L DIV total_rev_i AS BIGINT)"))
    }),

    // TPC-H Q4 shape (order priority checking): EXISTS rewritten as a
    // LEFT SEMI join — each order emits at most once no matter how many
    // late lines it has, and Spark's semi-join short-circuits per key.
    // "Late" = any line shipped > 90 days after the order date.
    "q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q12 shape (shipping-band priority analysis): one
    // fact-dim equi-join, rows banded by a derived categorical (ship
    // delay ≥ 60 days standing in for the reduced schema's missing
    // l_shipmode), and BOTH priority classes counted in ONE pass via
    // conditional sums — never two scans. The year filter reaches the
    // lineitem parquet scan (PushedFilters).
    "q12_ship_priority" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_shipdate"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("ship_band",
          when(datediff(col("l_shipdate"), col("o_orderdate")) >= 60,
            "slow").otherwise("fast"))
        .groupBy(col("ship_band"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
    }),

    // TPC-H Q20 shape (potential part promotion): the nested SEMI-JOIN
    // REDUCTION — a name-filtered part set (broadcast) semi-restricts
    // the fact scan, a keyed aggregate finds (supplier, part) pairs
    // that moved > 50 units in the year (standing in for the reduced
    // schema's missing partsupp.availqty threshold), and suppliers are
    // kept by a LEFT SEMI join on the surviving keys — each stage
    // strictly shrinks what flows to the next, nothing is recomputed.
    "q20_promotion_suppliers" -> ((s, dir) => {
      val smallParts = t(s, dir, "part")
        .where(col("p_name").startsWith("small "))
        .select(col("p_partkey"))
      val shipped = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(smallParts),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("__qty"))
        .where(col("__qty") > 50)
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
    }),

    // TPC-H Q6 shape (forecast revenue change): pure filter+aggregate,
    // every predicate pushed to the scan, revenue integer-staged as
    // Σ cents·pct (exact cross-engine, no double summation order)
    "q6_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          round(col("l_discount") * 100).cast("long").between(5, 7) &&
          col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_discount") * 100).cast("long")).as("revenue_i"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // two-correlated-subqueries query — EXISTS another supplier's line
    // in the same order (LEFT SEMI) and NOT EXISTS another supplier
    // who was ALSO late (LEFT ANTI), both planned as hash joins on the
    // order key with the supplier-inequality as a join residual.
    // "Late" = shipped > 60 days after the order date (the reduced
    // schema's stand-in for receiptdate > commitdate).
    "q21_waiting_supplier" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = l.select(col("l_orderkey").as("__o2_key"),
        col("l_suppkey").as("__o2_supp"))
      val lateOthers = late.select(col("l_orderkey").as("__o3_key"),
        col("l_suppkey").as("__o3_supp"))
      late
        .join(others, col("l_orderkey") === col("__o2_key") &&
          col("l_suppkey") =!= col("__o2_supp"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("__o3_key") &&
          col("l_suppkey") =!= col("__o3_supp"), "left_anti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
    }),

    // TPC-H Q13 shape (customer order distribution): LEFT OUTER join so
    // zero-order customers keep a row, then two stacked aggregates —
    // count per customer, histogram over the counts. The second
    // aggregate's input is one row per customer (already tiny relative
    // to orders), the classic reduce-then-reduce shape.
    "q13_custdist" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q22 shape (idle wealthy suppliers): suppliers with an
    // above-average positive balance and no RECENT shipments. The average
    // threshold is an integer CROSS-MULTIPLICATION (cents·n > total) —
    // no double division anywhere, exact cross-engine; the "no sales"
    // test is a LEFT ANTI join on the fact's supplier key. One-row
    // aggregate broadcast; the anti join shuffles only supplier keys.
    "q22_idle_suppliers" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").select(col("s_suppkey"),
        col("s_nationkey"),
        round(col("s_acctbal") * 100).cast("long").as("cents"))
      val tot = sup.where(col("cents") > 0)
        .agg(sum(col("cents")).as("tc"), count(lit(1)).as("nc"))
      sup.crossJoin(broadcast(tot))
        .where(col("cents") * col("nc") > col("tc"))
        .join(t(s, dir, "lineitem")
            .where(col("l_shipdate") >= lit("2001-11-01").cast("timestamp"))
            .select(col("l_suppkey")),
          col("s_suppkey") === col("l_suppkey"), "left_anti")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"), sum(col("cents")).as("totacctbal_i"))
    }),

    // TPC-H Q2 shape (minimum-cost supplier): the correlated "cost =
    // per-part MIN over the region's suppliers" subquery, planned as
    // one keyed aggregate + an equi-join back on (part, cost) — no
    // correlated re-execution. Region/nation are broadcast dims; the
    // partsupp side shuffles once on the part key.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val eurNat = t(s, dir, "nation").join(
          broadcast(t(s, dir, "region").where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val eurSup = t(s, dir, "supplier")
        .join(broadcast(eurNat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val ps = partsupp(s, dir)
        .join(eurSup, col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"), col("ps_suppkey"), col("n_name"),
          col("ps_supplycost_i"))
      val minCost = ps.groupBy(col("ps_partkey"))
        .agg(min(col("ps_supplycost_i")).as("min_cost_i"))
      ps.join(minCost, Seq("ps_partkey"))
        .where(col("ps_supplycost_i") === col("min_cost_i"))
        .join(broadcast(t(s, dir, "part").where(col("p_size") <= 15)
          .select(col("p_partkey"), col("p_brand"))),
          col("ps_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_brand"), col("ps_suppkey"),
          col("n_name"), col("min_cost_i"))
    }),

    // TPC-H Q9 shape (product-type profit): the widest join in the
    // suite — lineitem x part x partsupp x orders x supplier x nation —
    // with profit in exact integer 10^-4 dollars. Dims broadcast; the
    // only shuffles are partsupp's build and the final (nation, year)
    // aggregate (partial map-side).
    "q9_product_profit" -> ((s, dir) => {
      val par = t(s, dir, "part").where(col("p_name").contains("cold"))
        .select(col("p_partkey"))
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty_l"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_i"))
      li.join(broadcast(par), col("l_partkey") === col("p_partkey"))
        .join(partsupp(s, dir),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum(col("rev_i") -
          col("ps_supplycost_i") * col("qty_l") * 100L).as("profit_i"))
    }),

    // TPC-H Q11 shape (important stock): the DOUBLE aggregation over
    // partsupp — per-part value rollup, then a broadcast scalar
    // threshold (here value > 2x the average part's value, a
    // scale-free fraction) filtering the same rollup. Two keyed
    // aggregates total; the threshold is a one-row broadcast, and the
    // comparison is exact integer cross-multiplication.
    "q11_important_stock" -> ((s, dir) => {
      val evenSup = t(s, dir, "supplier")
        .where(col("s_nationkey") % 2 === 0).select(col("s_suppkey"))
      val perPart = partsupp(s, dir)
        .join(broadcast(evenSup), col("ps_suppkey") === col("s_suppkey"))
        .groupBy(col("ps_partkey"))
        .agg(sum(col("ps_supplycost_i") * col("ps_availqty")).as("value_i"))
      val tot = perPart.agg(sum(col("value_i")).as("total_i"),
        count(lit(1)).as("np"))
      perPart.crossJoin(broadcast(tot))
        .where(col("value_i") * col("np") > col("total_i") * 2)
        .select(col("ps_partkey"), col("value_i"))
    }),

    // TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    // count per (brand, type, size) bucket, with the complaint-supplier
    // NOT IN planned as a LEFT ANTI hash join and the part attribute
    // filter as a broadcast. count_distinct partial-aggregates its
    // dedup map-side.
    "q16_parts_supplier_cnt" -> ((s, dir) => {
      val par = t(s, dir, "part")
        .where(col("p_brand") =!= "Brand#13" && col("p_size") % 2 === 0)
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val complaints = t(s, dir, "supplier")
        .where(col("s_suppkey") % 10 === 7).select(col("s_suppkey"))
      partsupp(s, dir)
        .join(complaints, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(par), col("ps_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count_distinct(col("ps_suppkey")).as("supplier_cnt"))
    }),

    // NUMERIC Z-order data-skipping (GeoParquet.packNumericToParquet):
    // documents packed by (n_chars, doc_id) through the hilbert
    // machinery + per-file min/max sidecar, read back with a 2-D range
    // that prunes FILES from the listing before any footer opens — the
    // multi-column lakehouse skip a single sorted column can't give
    // (file-count pruning asserted in GeoPruneSpec; here the gate is
    // the inclusive-box semantics vs a plain BETWEEN oracle).
    "zorder_numeric_prune" -> ((s, dir) => {
      val out = processTmpDir(s, "zorder", dir)
      graft.io.GeoParquet.packNumericToParquet(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "n_chars", "doc_id", out, numPartitions = 8)
      collectAndClean(s, out,
        graft.io.GeoParquet.readNumericRange(s, out, 100, 50, 2000, 250)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars")))
    }),

    // K-COLUMN Z-order data-skipping (GeoParquet.packZOrderToParquet):
    // lineitem packed by THREE independent columns via bit-interleaved
    // morton ranks (the Delta/Iceberg OPTIMIZE ZORDER shape, as one
    // codegen'd fold expression), per-file per-column min/max sidecar,
    // read back with a 3-D box that prunes FILES from the listing
    // before any footer opens — on a 100 TB table the skip works for
    // whichever SUBSET of the packed columns a query constrains, where
    // a single sorted column skips on one dimension and nothing else
    // (file-count pruning + subset/edge cases asserted in GeoPruneSpec;
    // here the gate is inclusive-interval semantics vs plain BETWEENs).
    "zorder_multi_prune" -> ((s, dir) => {
      val out = processTmpDir(s, "zorder3", dir)
      graft.io.GeoParquet.packZOrderToParquet(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity"), col("l_discount"), col("l_extendedprice")),
        Seq("l_quantity", "l_discount", "l_extendedprice"), out,
        numPartitions = 8)
      collectAndClean(s, out, graft.io.GeoParquet.readZOrderRange(s, out, Seq(
          ("l_quantity", 10.0, 30.0),
          ("l_discount", 0.02, 0.06),
          ("l_extendedprice", 10000.0, 40000.0)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("qty"),
          min(col("l_extendedprice")).as("price_min"),
          max(col("l_extendedprice")).as("price_max")))
    }),

    // INCREMENTAL ingest into a Z-ordered lake
    // (GeoParquet.appendNumericWithSidecar): a packed base generation
    // plus two appended batches, each updating the per-column sidecar
    // over ONLY its own new files — the continuously-ingested table
    // stays file-skippable without ever recomputing global stats (the
    // foreachBatch streaming-sink write path; re-pack = compaction).
    // The gate reads a 3-D box spanning all three generations and must
    // equal plain BETWEENs over the full table.
    "zorder_append_prune" -> ((s, dir) => {
      val out = processTmpDir(s, "zappend", dir)
      val zcols = Seq("l_quantity", "l_discount", "l_extendedprice")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_discount"),
        col("l_extendedprice"))
      graft.io.GeoParquet.packZOrderToParquet(
        li.where(col("l_orderkey") % 3 === 0), zcols, out, numPartitions = 4)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 3 === 1), out, zcols)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 3 === 2), out, zcols)
      collectAndClean(s, out, graft.io.GeoParquet.readZOrderRange(s, out, Seq(
          ("l_quantity", 20.0, 40.0),
          ("l_discount", 0.01, 0.05),
          ("l_extendedprice", 20000.0, 60000.0)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("qty"),
          min(col("l_extendedprice")).as("price_min"),
          max(col("l_extendedprice")).as("price_max")))
    }),

    // TIME TRAVEL over the z-ordered lake: the pack/append API records
    // a generation manifest (file -> commit ordinal; appends never
    // delete, so generation g = files with gen <= g). Reading the
    // SAME table at each of its three generations must reproduce the
    // exact historical snapshots — with sidecar file pruning still
    // applying inside a snapshot (per-file stats are valid for any
    // file subset). The oracle replays each snapshot from the batch
    // residues the demo committed.
    "zorder_time_travel" -> ((s, dir) => {
      // per-PROCESS tmp dir (two harnesses against the same sf dir must
      // not interleave generation commits), deleted once the result is
      // materialized — see collectAndClean
      val out = processTmpDir(s, "ztt", dir)
      val zcols = Seq("l_quantity", "l_extendedprice")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      graft.io.GeoParquet.packZOrderToParquet(
        li.where(col("l_orderkey") % 3 === 0), zcols, out, numPartitions = 4)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 3 === 1), out, zcols)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 3 === 2), out, zcols)
      require(graft.io.GeoParquet.currentGeneration(s, out) == 2,
        "expected three recorded generations")
      collectAndClean(s, out, (0 to 2).map { g =>
        graft.io.GeoParquet.readZOrderAtGeneration(s, out, g,
            Seq(("l_quantity", 10.0, 35.0)))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).cast("long").as("qty"),
            min(col("l_extendedprice")).as("price_min"),
            max(col("l_extendedprice")).as("price_max"))
          .select(lit(g).as("gen"), col("n"), col("qty"),
            col("price_min"), col("price_max"))
      }.reduce(_ unionAll _))
    }),

    // COMPACTION WITH TIME TRAVEL (the Delta/Iceberg OPTIMIZE shape):
    // after three commits, compactZOrderGeneration rewrites the head
    // snapshot as generation 3 — FEWER files, same rows — while every
    // prior generation stays readable; a retention vacuum then fences
    // off generation 0 (minGen advances) WITHOUT touching the files
    // generations 1-3 still need. The gate proves read-at-generation
    // equality before AND after the compaction: gen 3 must reproduce
    // gen 2's content exactly, from different (compacted) files.
    "zorder_compact_travel" -> ((s, dir) => {
      val out = processTmpDir(s, "zct", dir)
      val zcols = Seq("l_quantity", "l_extendedprice")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      graft.io.GeoParquet.packZOrderToParquet(
        li.where(col("l_orderkey") % 3 === 0), zcols, out, numPartitions = 4)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 3 === 1), out, zcols)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 3 === 2), out, zcols)
      val preFiles = graft.io.GeoParquet
        .readZOrderAtGeneration(s, out, 2).inputFiles.length
      require(graft.io.GeoParquet.compactZOrderGeneration(
        s, out, zcols, numPartitions = 2) == 3, "compaction must commit gen 3")
      val head = graft.io.GeoParquet.readZOrderAtGeneration(s, out, 3)
      require(head.inputFiles.length < preFiles,
        s"compaction did not shrink the file count " +
          s"(${head.inputFiles.length} of $preFiles)")
      // retention: keep 2 generations behind the head -> gen 0 fenced
      // off; nothing deletes (gens 1-2 still reference every old file)
      require(graft.io.GeoParquet.vacuumGenerations(s, out, retain = 2).isEmpty,
        "vacuum(2) must not delete files generations 1-2 still need")
      require(graft.io.GeoParquet.minReadableGeneration(s, out) == 1,
        "vacuum(2) must fence generation 0")
      require(
        try { graft.io.GeoParquet.readZOrderAtGeneration(s, out, 0); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("vacuum") },
        "reading a vacuumed generation must fail fast")
      collectAndClean(s, out, (1 to 3).map { g =>
        graft.io.GeoParquet.readZOrderAtGeneration(s, out, g,
            Seq(("l_quantity", 10.0, 35.0)))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).cast("long").as("qty"),
            min(col("l_extendedprice")).as("price_min"),
            max(col("l_extendedprice")).as("price_max"))
          .select(lit(g).as("gen"), col("n"), col("qty"),
            col("price_min"), col("price_max"))
      }.reduce(_ unionAll _))
    }),

    // Hive-partitioned layout round-trip: write documents partitioned
    // by lang (the layout a multilingual corpus lands in), read back
    // with a partition-column filter. At scale the filter prunes whole
    // directories BEFORE any file is opened (PartitionFilters, gated in
    // PlanSpec) — the non-pruned languages cost zero IO.
    "hive_partition_prune" -> ((s, dir) => {
      val out = processTmpDir(s, "hivepart", dir)
      t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        .write.partitionBy("lang").parquet(out)
      collectAndClean(s, out,
        s.read.parquet(out).where(col("lang").isin("en", "fr"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars")))
    }),

    // Schema-evolution read: two parquet batches written with DIFFERENT
    // schemas (a later ingest added n_chars), merged by a
    // mergeSchema=true read — rows from the old batch surface the new
    // column as NULL. The data-lake reality of a corpus ingested over
    // months; count/sum prove both the union and the null-fill.
    "merge_schema_read" -> ((s, dir) => {
      val out = processTmpDir(s, "mergeschema", dir)
      val docs = t(s, dir, "documents")
      docs.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.parquet(s"$out/b=1")
      docs.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.parquet(s"$out/b=2")
      collectAndClean(s, out, s.read.option("mergeSchema", "true")
        .parquet(s"$out/b=1", s"$out/b=2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), count(col("n_chars")).as("n_with_chars"),
          sum(col("n_chars")).as("chars")))
    }),

    // Small-file compaction: land the corpus as many tiny shards (the
    // streaming-ingest reality), compact with a round-robin
    // repartition to a bounded shard count, and prove the compacted
    // copy is byte-complete. At 100 TB the same two-liner turns a
    // million 100 KB files (a namenode + open()-per-task disaster)
    // into block-sized shards; the file-count bound is gated in
    // LakeSpec, the content here.
    "compact_small_files" -> ((s, dir) => {
      val out = processTmpDir(s, "compact", dir)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      docs.repartition(64).write.parquet(s"$out/small")
      s.read.parquet(s"$out/small").repartition(4)
        .write.parquet(s"$out/compact")
      collectAndClean(s, out, s.read.parquet(s"$out/compact")
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).as("id_sum"),
          sum(length(col("text")).cast("long")).as("chars")))
    }),

    // TPC-H Q10 shape (returned-item customers): quarter of orders ×
    // returned lines → revenue per customer → top 20. The fact
    // collapses against the filtered orders FIRST; customer/nation
    // attributes join the 20-row... no — join before the top-k is the
    // classic shape, but the GROUP key is the customer, so the shuffle
    // after the joins is ∝ customers, and the top-20 is a
    // WindowGroupLimit-style bounded sort.
    "q10_returned_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("rev")).as("revenue_i"))
        .orderBy(col("revenue_i").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q14 shape (promotion effect): share of one month's revenue
    // from PROMO parts — numerator and denominator from ONE conditional
    // grouped pass, share as integer permille
    "q14_promo_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev"))
      li.join(broadcast(t(s, dir, "part").select(col("p_partkey"),
          col("p_type"))), col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
          .as("promo_rev_i"), sum(col("rev")).as("total_rev_i"))
        .withColumn("promo_permille",
          expr("CAST(promo_rev_i * 1000L DIV total_rev_i AS BIGINT)"))
    }),

    // TPC-H Q19 shape (disjunctive brand/size/quantity bands): an
    // OR-of-ANDs predicate across both join sides — the planner must
    // still push the per-table conjuncts (partkey ranges, quantity
    // bands) below the join and hash-join on partkey, evaluating the
    // residual disjunction on joined rows
    "q19_disjunctive" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_partkey"),
        col("l_quantity"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev"))
      val par = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
        col("p_size"))
      li.join(broadcast(par), col("l_partkey") === col("p_partkey"))
        .where((col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 30) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 45) &&
            col("l_quantity").between(20, 30)))
        .agg(count(lit(1)).as("n"), sum(col("rev")).as("revenue_i"))
    }),

    // TPC-H Q15 shape (top supplier): per-supplier quarterly revenue,
    // keep the max achiever(s) — the aggregate feeds a 1-row max that
    // broadcasts back as the filter (no self-join of the full
    // aggregate, no window over all suppliers)
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("total_rev_i"))
      val mx = rev.agg(max(col("total_rev_i")).as("__mx"))
      rev.crossJoin(broadcast(mx))
        .where(col("total_rev_i") === col("__mx"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_i"))
    }),

    // TPC-H Q17 shape (small-quantity revenue): lines of Brand#1 parts
    // whose quantity is below 20% of that part's average — the
    // correlated scalar subquery becomes reduce-per-part + join-back,
    // and the 0.2·avg comparison is the integer cross-multiplication
    // qty·5·count < sum (no division anywhere)
    "q17_small_quantity" -> ((s, dir) => {
      val par = t(s, dir, "part").where(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val li = t(s, dir, "lineitem")
        .join(broadcast(par), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val per = li.groupBy(col("l_partkey").as("__pk"))
        .agg(sum(col("qty")).as("__sq"), count(lit(1)).as("__cq"))
      li.join(per, col("l_partkey") === col("__pk"))
        .where(col("qty") * lit(5L) * col("__cq") < col("__sq"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev_cents_i"))
    }),

    // ROLLUP (hierarchical subtotals — flag, flag+status, grand total):
    // the other grouping-sets shape next to CUBE, same Expand plan
    "rollup_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    }),

    // GROUPING SETS with grouping_id — the third grouping-sets shape
    // next to CUBE/ROLLUP: per-lang, per-source, and grand total in ONE
    // Expand pass (never three scans), disambiguated by grouping_id
    "grouping_sets_agg" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("graft_docs_gs")
      s.sql("""
        SELECT lang, source, grouping_id() AS gid, count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM graft_docs_gs
        GROUP BY GROUPING SETS ((lang), (source), ())""")
    }),

    // ntile batching: equal-count quartiles over the (n_chars, doc_id)
    // total order — the "split the corpus into K balanced shards by
    // size rank" primitive. NO single-task global window: the rank
    // comes from the distributed two-pass machinery and the tile from
    // the SQL-standard ntile closed form (first n mod k buckets get
    // one extra row), which the oracle's native ntile must reproduce.
    "ntile_length_quartiles" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val (ranked, release) = graft.tools.Ranks.globalRowNumberWithRelease(
        docs, "__r", 32, col("n_chars"), col("doc_id"))
      val n = ranked.count()
      val k = 4L
      val big = n / k + 1
      val nbig = n % k
      // when n < k the ELSE branch is unreachable (every __r falls in
      // the first nbig·big rows), but its interpolated divisor n/k
      // would be 0 — max(_, 1) keeps the literal well-formed so ANSI
      // mode cannot raise DIV-by-zero on the dead branch
      val smallDiv = math.max(n / k, 1L)
      val out = ranked.withColumn("tile",
          expr(s"""CAST(CASE WHEN __r <= ${nbig * big}
                             THEN (__r - 1) DIV $big
                             ELSE $nbig + (__r - ${nbig * big} - 1)
                                  DIV $smallDiv
                        END + 1 AS BIGINT)"""))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"), min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .localCheckpoint(true)
      release()
      out
    }),

    // Global percent_rank/cume_dist WITHOUT a single-task window
    // (Ranks.globalRankStats): per-value counts (one keyed aggregate —
    // ties collapse map-side), the distributed prefix-sum over the
    // value order, and one value-keyed join back. Exact ANSI
    // definitions, so the native window functions in DuckDB must
    // reproduce every double bit-for-bit (IEEE division of the same
    // exact integers).
    "global_rank_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      graft.tools.Ranks.globalRankStats(docs, col("n_chars"))
        .select(col("doc_id"), col("rank"), col("dense_rank"),
          col("percent_rank"), col("cume_dist"))
    }),

    // metrics WITHOUT a second pass: Observation counters piggyback the
    // main action (here a noop-sink write — at 100 TB the counters ride
    // the production write job for free instead of re-scanning), then
    // surface as a one-row frame
    "observed_quality_counters" -> ((s, dir) => {
      val obs = new org.apache.spark.sql.Observation()
      t(s, dir, "documents")
        .observe(obs, count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("chars"),
          count(when(col("lang") === "en", 1)).as("n_en"))
        .write.mode("overwrite").format("noop").save()
      val row = obs.get
      import s.implicits._
      Seq((row("n_docs").asInstanceOf[Long],
        row("chars").asInstanceOf[Long],
        row("n_en").asInstanceOf[Long])).toDF("n_docs", "chars", "n_en")
    }),

    // SURVEY §2.4 inherited aggregates: CUBE over two dims (subtotals +
    // grand total in one pass — Expand + partial aggregation).
    "cube_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    }),

    // Relational sanity: 4-way join + aggregate. The fact table is
    // pre-aggregated on its join key BEFORE the joins (reduce-before-
    // join): every downstream shuffle is then proportional to DISTINCT
    // orders, not lineitem rows — the shape that holds at 100 TB, where
    // the fact-side row count dwarfs the key count. Catalyst doesn't
    // push aggregates below joins itself; the final rollup re-aggregates
    // the partial (count, sum) pairs, which is exact here (counts are
    // longs, quantities integer-valued).
    "join_agg_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("__n"), sum(col("l_quantity")).as("__qty"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val nat = t(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("__n")).as("n"), sum(col("__qty")).as("qty"))
    }),

    // The automatic Bloom-join prefilter (plans/BloomJoinRewrite,
    // opt-in conf): a filter-sized customer subset joined to orders
    // gets bloom_might_contain(o_custkey) injected UNDER the join, so
    // only probable matches enter the probe-side shuffle — results
    // identical by the no-false-negatives property, which is exactly
    // what the DuckDB gate checks. Materialized eagerly inside the
    // conf window so the rewrite provably planned this run.
    "bloom_join_orders" -> ((s, dir) => {
      // this query deliberately SCOPES the opt-in conf to construction:
      // the rewrite fires during the eager localCheckpoint below, and
      // the finally restores the EXACT prior state (value-faithful —
      // Verify asserts construction leaks no spark.graft.* mutation).
      // Unlike the sjoin queries (whose adaptiveMinBytesOverride param
      // replaced their conf window), an OPTIMIZER RULE's opt-in has no
      // per-call seam — the rule reads session conf at plan time — so
      // a scoped set/try/finally around the eager materialization is
      // the narrowest possible window; concurrent planning in the same
      // session during it would see the opt-in (harness is sequential)
      val keys = Seq("spark.graft.bloomJoin.enabled",
        "spark.graft.bloomJoin.minBuildBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      s.conf.set("spark.graft.bloomJoin.enabled", "true")
      // the sf-test build side is broadcast-sized; lift the broadcast
      // floor so the gated run provably exercises the rewrite
      s.conf.set("spark.graft.bloomJoin.minBuildBytes", "-1")
      try {
        val cust = t(s, dir, "customer")
          .where(col("c_custkey") % 13 === 0).select(col("c_custkey"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        ord.join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n_orders"), max(col("o_orderkey")).as("max_ok"))
          .localCheckpoint(true)
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),

    // SURVEY §2.5 set ops (built-in): customers that placed orders vs
    // not, via INTERSECT / EXCEPT on key sets.
    "set_ops_counts" -> ((s, dir) => {
      val custKeys = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val orderCust = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val active = custKeys.intersect(orderCust)
      val inactive = custKeys.except(orderCust)
      active.agg(count(lit(1)).as("n")).withColumn("which", lit("active"))
        .unionAll(inactive.agg(count(lit(1)).as("n")).withColumn("which", lit("inactive")))
    }),

    // Relational sanity: window top-3 orders per customer.
    "window_top_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // Events: hourly tumbling aggregate (streaming-compatible shape).
    // events.ts is TIMESTAMP(NANOS) parquet — read as long ns
    // (spark.sql.legacy.parquet.nanosAsLong=true) and truncate to micros.
    "events_hourly" -> ((s, dir) => {
      EventTs.toTimestamp(t(s, dir, "events"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    }),

    // SLIDING event-time windows (1h window every 30min — each event in
    // exactly 2 windows): Spark's window() slide parameter under the
    // DuckDB gate, which replays the epoch-aligned window starts with
    // integer micros arithmetic.
    "events_sliding" -> ((s, dir) => {
      EventTs.toTimestamp(t(s, dir, "events"))
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("vmin"),
          max(col("value")).as("vmax"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("vmin"), col("vmax"))
    }),

    // Inter-arrival-time histogram (burstiness / bot-rate diagnostic):
    // per-user consecutive event gaps, log2-bucketed via the binary-
    // string-length trick (no ln() ulps) — ONE user-keyed window
    "interarrival_histogram" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      EventTs.toNanos(t(s, dir, "events"))
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .where(col("next_ts").isNotNull)
        .select((length(bin(greatest(col("next_ts") - col("ts"), lit(1L))))
          - 1).cast("long").as("log2_gap_ns"))
        .groupBy(col("log2_gap_ns")).agg(count(lit(1)).as("n"))
    }),

    // Per-user event-type transition counts (the Markov-chain /
    // next-event-prediction training table): ONE user-keyed shuffle,
    // lead() within each user's (ts, event_id) total order, then a
    // (from, to) aggregate. The window never spans users, so state is
    // bounded by the busiest user, not the stream.
    // SCD Type-2 build (the warehouse history table): collapse each
    // user's event stream to its STATE CHANGES and emit validity
    // intervals [valid_from, valid_to) — open (null) for the current
    // state. Two windows over ONE user-keyed exchange: lag to detect
    // changes, lead over the change rows to close intervals.
    "scd2_user_states" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // NULL users excluded on both engines — the streaming twin's
      // keyed primitive-Long state cannot hold them (shared oracle)
      val changes = EventTs.toTimestamp(t(s, dir, "events"))
        .where(col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .where(col("__prev").isNull || col("__prev") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(w2))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"))
    }),

    // RFM segmentation (the classic behavioral cube): per-user recency
    // (last-purchase micros) / frequency / monetary-cents, each cut at
    // its exact distributed 25/75% quantiles into low/mid/high, then
    // segment counts. Thresholds are 6 collected longs (bounded driver
    // state, like k-means centroids); the buckets compare against
    // VALUES so ties are deterministic. All-integer both engines.
    // Plan shape: the fact table is scanned ONCE — the per-user
    // aggregate is localCheckpoint-pinned, and all six quantile cuts
    // run in ONE fused pass of the exact-quantile machinery
    // (exactQuantilesMulti: melted long form, one distributed rank)
    // instead of the six separate rank passes + final re-aggregation
    // that previously re-scanned events seven times.
    "rfm_segments" -> ((s, dir) => {
      val per = EventTs.toTimestamp(t(s, dir, "events"))
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(unix_micros(max(col("ts"))).as("rec"),
          count(lit(1)).as("freq"),
          sum(round(col("value") * 100).cast("long")).as("mon"))
        .localCheckpoint(true)
      val cut = graft.pipeline.Sketches.exactQuantilesMulti(per,
          Seq("rec" -> col("rec"), "freq" -> col("freq"),
            "mon" -> col("mon")),
          Seq(0.25, 0.75))
        .collect()
        .map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2))).toMap
      def bucket(c: org.apache.spark.sql.Column, m: String) =
        lit(1L) + when(c > cut((m, 0.25)), 1L).otherwise(0L) +
          when(c > cut((m, 0.75)), 1L).otherwise(0L)
      per.select(bucket(col("rec"), "rec").as("r_bucket"),
          bucket(col("freq"), "freq").as("f_bucket"),
          bucket(col("mon"), "mon").as("m_bucket"))
        .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    "event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      EventTs.toTimestamp(t(s, dir, "events"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // The STREAMING execution path under the DuckDB gate: the same
    // hourly rollup as events_hourly, but run as a genuine Structured
    // Streaming query — file stream source over the events parquet,
    // watermarked tumbling-window aggregation (Streams.hourlyCounts),
    // AvailableNow trigger, memory sink — whose final table must
    // hash-match the BATCH oracle. Batch/streaming unification is the
    // engine claim; this makes it a checked property, not prose.
    // APPEND mode (the production shape: each window emits once and
    // its state evicts when the watermark closes it); far-future
    // sentinels flush the bounded replay's trailing windows, and their
    // own far-future window rows are dropped on the RESULT table by a
    // predicate on the window time (never in-plan by id — the pushdown
    // gotcha).
    "events_hourly_stream" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the file stream source wants a DIRECTORY; select just the
      // events file out of the sf dir with a glob filter
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 36500 DAYS"))
      val agg = graft.streaming.Streams.hourlyCounts(src.unionAll(sentinel),
        tsCol = "ts", typeCol = "event_type",
        extraAggs = Seq(min(col("value")).as("vmin"), max(col("value")).as("vmax")))
      val qName = "graft_events_hourly_stream"
      // (sliding twin below reuses this pattern with a 30min slide)
      // a prior run in this JVM (bench reps) may still own the name
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = agg.writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).select(col("window.start").as("hour"), col("event_type"),
          col("n"), col("vmin"), col("vmax"))
        .where(col("hour") < to_timestamp(lit("2100-01-01 00:00:00")))
    }),

    // Streaming COUNT(DISTINCT) per hour under the DuckDB gate — the
    // CHAINED stateful-operator idiom (dropDuplicatesWithinWatermark →
    // windowed count): a plain streaming aggregation cannot express a
    // distinct count in bounded state; the dedup stage passes exactly
    // the first event per (user, type, hour) and both stages evict
    // state past the watermark. Append mode — far-future sentinel rows
    // drive the final watermark past every real window (their own
    // window never closes, so the sentinel self-filters).
    "stream_distinct_users" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      // % 100: any window of 100 consecutive event_ids contains a
      // sentinel — the flush cannot silently depend on the id range.
      // ONE constant far-future ts (not ts + offset: that would spread
      // sentinels over many hours, and every sentinel window except
      // the last CLOSES and emits) + a tag the output filters.
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("user_id", lit(-1L))
        .withColumn("event_type", lit("__sentinel"))
        .withColumn("ts", to_timestamp(lit("2200-01-01 00:00:00")))
      val agg = graft.streaming.Streams.distinctPerWindow(
        src.unionAll(sentinel), "user_id")
        .where(col("event_type") =!= "__sentinel")
      val qName = "graft_stream_distinct_users"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = agg.writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).select(col("window.start").as("hour"),
        col("event_type"), col("distinct_keys").as("distinct_users"))
    }),

    // STREAM-STREAM interval join under the DuckDB gate: clicks join
    // purchases of the same user within the preceding hour, BOTH sides
    // watermarked streams (the state-bounded shape — the event-time
    // range condition lets each side evict state past the watermark).
    // The remaining streaming join shape after windowed agg, session
    // windows, custom state, and stream-static joins.
    "stream_stream_join" -> ((s, dir) =>
      streamClickPurchaseJoin(s, dir, "inner")),

    // stream-stream LEFT OUTER interval join: same clicks ⋈ purchases
    // shape, but a click with NO purchase in its preceding hour must
    // emit a null-padded row — and an outer result can only materialize
    // once the watermark PROVES no match can still arrive (match-window
    // upper bound below both watermarks). Far-future sentinel rows on
    // BOTH sides (each side's watermark is tracked separately; the
    // operator uses the min) push the global watermark past all real
    // data so the trailing no-data batch flushes every unmatched click;
    // sentinels carry user_id -1/-2 so they can never join each other,
    // and the output filters them. The distinct semantics under gate
    // here vs the inner twin: delayed NULL-side emission from evicted
    // join state.
    "stream_stream_left_join" -> ((s, dir) =>
      streamClickPurchaseJoin(s, dir, "left_outer")),

    // stream-stream FULL OUTER interval join: the remaining eviction
    // path — unmatched PURCHASES also emit, null-padded on the click
    // side, once the watermark proves no click window can still claim
    // them. Same sentinel discipline as the left twin, but the sentinel
    // filter must be NULL-TOLERANT per side (c_ts is null on
    // right-only rows, p_ts on left-only rows — a bare c_ts < X would
    // silently drop every unmatched purchase); the disjunctive form
    // also keeps the optimizer from pushing it anywhere near the
    // watermark nodes.
    "stream_stream_full_join" -> ((s, dir) =>
      streamClickPurchaseJoin(s, dir, "full_outer")),

    // Streaming POINT-IN-TIME enrichment (Streams.asofEnrich): each
    // click binds the user's latest at-or-before purchase value, nulled
    // past the 6h tolerance — the merge_asof / feature-store pattern as
    // a FIFTH custom-state machine (a stream-stream join cannot express
    // "the latest match": it emits every in-window pair). Clicks and
    // purchases ride ONE keyed stream; events buffer until the
    // watermark strictly passes them, purchases fold before clicks at
    // an equal timestamp, and a far-future sentinel key drains the
    // bounded replay. The oracle is DuckDB's NATIVE ASOF JOIN over the
    // same micros-truncated event times — batch/streaming unification
    // for the as-of shape (asof_join_tol's streaming twin).
    "stream_asof_enrich" -> ((s, dir) => streamAsofRun(s, dir, forward = false)),

    // STREAMING RESAMPLE + FORWARD FILL (Streams.resampleFfill) — the
    // incremental twin of resample_ffill and the SEVENTH custom-state
    // machine (22nd streaming run): every user emits one row per
    // absolute hour of the configured grid carrying their last
    // at-or-before value, each row exactly once as the watermark
    // proves it final — the feature-freshness shape, where the batch
    // recomputes the whole |users|×|hours| table per run. The grid
    // bounds are two scalars from a bounds-only batch scan (a
    // production job declares its window; deriving it from the data
    // lets the streamed table equal the batch resample). Gated on the
    // micros-clock replay of the batch oracle: per-user hourly
    // generate_series into DuckDB's native ASOF, equal-(user, us) ties
    // pre-collapsed to the highest event_id (the fold order's
    // deterministic winner), NULL users excluded on both engines, and
    // the grid covering the users OBSERVED WITHIN it (the machine's
    // documented contract: a user first seen after the grid end emits
    // nothing — state-reclamation safety; the oracle's u CTE applies
    // the same ts <= h1 restriction).
    "stream_resample_ffill" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val H = 3600000000L
      val b = EventTs.toTimestamp(t(s, dir, "events"))
        .where(col("user_id").isNotNull)
        .agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx")).head()
      val (h0, h1) = (b.getLong(0) / H * H, b.getLong(1) / H * H)
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val sentinel = src.where(col("event_id") % 100 === 0)
        .select(lit(-1L).as("userId"),
          to_timestamp(lit("2200-01-01 00:00:00")).as("ts"),
          lit(-1L).as("eventId"), lit(null).cast("double").as("value"))
      val events = src.where(col("user_id").isNotNull)
        .select(col("user_id").as("userId"), col("ts"),
          col("event_id").as("eventId"), col("value"))
        .unionAll(sentinel)
        .withWatermark("ts", "1 hour")
        .as[graft.streaming.ResEvent]
      val grid = graft.streaming.Streams.resampleFfill(events, h0, h1)
      val qName = "graft_stream_resample_ffill"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = grid.toDF().writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).where(col("userId") =!= -1L)
        .select(col("userId").as("user_id"),
          timestamp_micros(col("hourUs")).as("hour"),
          col("value").as("last_value"))
    }),

    // FORWARD streaming as-of (Streams.asofEnrichForward): each click
    // binds the user's NEXT at-or-after purchase value within 6h —
    // conversion attribution as the SIXTH custom-state machine and the
    // mirror of stream_asof_enrich: clicks WAIT in state and each
    // folding purchase resolves every click at-or-before it; a waiting
    // click expires to null once the watermark proves any future
    // purchase would be beyond tolerance. asof_join_fwd's streaming
    // twin under the same native-ASOF oracle family.
    "stream_asof_forward" -> ((s, dir) => streamAsofRun(s, dir, forward = true)),

    // the SLIDING-window streaming twin: window(1h, slide 30min) as a
    // real watermarked streaming query, pinned to the same
    // epoch-micros-arithmetic oracle as the batch events_sliding.
    // Append mode + sentinel flush, like the tumbling twin.
    "events_sliding_stream" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 36500 DAYS"))
      val agg = graft.streaming.Streams.hourlyCounts(src.unionAll(sentinel),
        tsCol = "ts", typeCol = "event_type",
        extraAggs = Seq(min(col("value")).as("vmin"), max(col("value")).as("vmax")),
        slide = Some("30 minutes"))
      val qName = "graft_events_sliding_stream"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = agg.writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).select(col("window.start").as("win_start"),
          col("event_type"), col("n"), col("vmin"), col("vmax"))
        .where(col("win_start") < to_timestamp(lit("2100-01-01 00:00:00")))
    }),

    // Streaming FIRST-SEEN DEDUP under the DuckDB gate: documents (plus
    // planted later-timestamp copies) flow through the flatMapGroups-
    // WithState first-seen state machine (Streams.dedupFirstSeen) as a
    // real streaming query; survivors must be exactly the original doc
    // ids (copies share the fingerprint, arrive with later event time,
    // and all 500 corpus texts are distinct). The custom-state streaming
    // path — not just windowed aggregation — is hash-gated.
    "stream_dedup_first_seen" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(col("doc_id"), col("text"))
      val planted = src.unionAll(
        src.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val events = planted.select(
          col("doc_id").as("docId"),
          graft.pipeline.Tx.doc_fingerprint(col("text")).as("fp"),
          timestamp_micros(col("doc_id") * 1000000L).as("ts"))
        .as[graft.streaming.DocEvent]
      val deduped = graft.streaming.Streams.dedupFirstSeen(events)
      val qName = "graft_stream_dedup_first_seen"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = deduped.toDF().writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).select(col("docId").as("doc_id"))
    }),

    // Streaming SCD2 under the DuckDB gate — the last batch/streaming
    // unification gap: the events stream flows through the
    // flatMapGroupsWithState interval builder (Streams.scd2Intervals),
    // closed validity slices appending on each state change and the
    // open slices on the end-of-stream watermark timeout; the final
    // table must hash-match the BATCH scd2_user_states oracle.
    "stream_scd2" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      // far-future SENTINEL rows (user -1, ts + ~100 years): on a
      // bounded replay they drive the final watermark past every real
      // user's idle deadline so all open slices flush — the streaming
      // stand-in for "the stream ended"; sentinel output is filtered.
      // % 100 (not a sparser modulus): any window of 100 consecutive
      // event_ids contains a sentinel, so the flush cannot silently
      // depend on the id range starting at 0
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", col("ts") + expr("INTERVAL 36500 DAYS"))
      // NULL users excluded on both engines (shared oracle): keyed
      // primitive-Long state cannot hold them; sentinels are exempt
      // (their user_id is the constant -1)
      val events = src.where(col("user_id").isNotNull).unionAll(sentinel)
        .select(col("user_id").as("userId"), col("ts"),
          col("event_id").as("eventId"), col("event_type").as("eventType"))
        .withWatermark("ts", "1 minute")
        .as[graft.streaming.StateEvent]
      // horizon spans the whole table's event time: no user may churn
      // into separate chains even if the source delivers multiple
      // micro-batches — the batch oracle models ONE chain per user;
      // the +100y sentinel still clears every lastTs + horizon deadline
      val slices = graft.streaming.Streams.scd2Intervals(events,
        horizon = "3650 days")
      val qName = "graft_stream_scd2"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = slices.toDF().writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // drop sentinels by their EXACT id — no sign assumption on real ids
      s.table(qName).where(col("userId") =!= -1L)
        .select(col("userId").as("user_id"), col("state"),
          col("validFrom").as("valid_from"), col("validTo").as("valid_to"))
    }),

    // Streaming BUILT-IN dedup state under the DuckDB gate:
    // dropDuplicatesWithinWatermark keyed on the text itself (the
    // zero-custom-code bounded-state twin of dedupFirstSeen). The
    // surviving doc_id among same-batch duplicates is arbitrary, so the
    // gated output is the deterministic survivor KEY SET: the distinct
    // texts of the planted corpus.
    "stream_dedup_watermark" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(col("doc_id"), col("text"))
      val planted = src.unionAll(
        src.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      val deduped = graft.streaming.Streams.dedupWithinWatermark(
        planted, Seq("text"), "ts", "10 minutes")
      val qName = "graft_stream_dedup_watermark"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = deduped.writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).select(col("text"))
    }),

    // Streaming GEOPARQUET SINK under the DuckDB gate: customer points
    // stream through Streams.geoParquetSink (foreachBatch append that
    // maintains the spatial sidecar INCREMENTALLY), then the landing
    // dataset is read back through the bounds-pruned GeoParquet reader
    // and box-filtered — the whole streaming-ingest → prunable-dataset
    // → cx query cycle must land on the plain relational box filter
    "stream_geoparquet_sink" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/customer.parquet").schema
      val pts = s.readStream.schema(schema)
        .option("pathGlobFilter", "customer.parquet").parquet(dir)
        .withColumn("px", ((col("c_custkey") * 7919) % 1000).cast("double"))
        .withColumn("py", ((col("c_custkey") * 104729) % 1000).cast("double"))
        .withColumn("pt", st_point(col("px"), col("py")))
        .select(col("c_custkey"), col("px"), col("py"), col("pt"))
      val base = processTmpDir(s, "stream_geosink", dir)
      val qName = "graft_stream_geoparquet_sink"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = graft.streaming.Streams.geoParquetSink(pts, s"$base/data",
            Seq("pt"), s"$base/ckpt")
          .queryName(qName)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      collectAndClean(s, base,
        graft.io.GeoParquet.read(s, s"$base/data", "pt", "point",
            bounds = Some((100.0, 100.0, 600.0, 600.0)))
          .cx(100, 100, 600, 600)
          .df.select(col("c_custkey"), col("px"), col("py")))
    }),

    // STREAMING TIME-TRAVEL INGEST: the incremental sidecar append
    // sink composed with the generation manifest — every micro-batch
    // lands as ONE generation commit (zero new machinery: foreachBatch
    // + the exact appendNumericWithSidecar the batch lake uses), so
    // readZOrderAtGeneration replays any PREFIX of the stream after
    // the fact. The input is staged as three files with strictly
    // increasing mtimes; the file source (oldest-first) +
    // maxFilesPerTrigger=1 then yields a deterministic batch
    // sequence, which is exactly what the prefix oracle demands —
    // the gate is the zorder_time_travel family (generation g ==
    // batches 0..g), hash-matched against DuckDB.
    "stream_zorder_travel" -> ((s, dir) => {
      val base = processTmpDir(s, "szt", dir)
      val zcols = Seq("l_quantity", "l_extendedprice")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      (0 to 2).foreach { g =>
        li.where(col("l_orderkey") % 3 === g).coalesce(1)
          .write.parquet(s"$base/stage/b$g")
        val part = new java.io.File(s"$base/stage/b$g").listFiles()
          .filter(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith(".") && !f.getName.startsWith("_")).head
        val tgt = new java.io.File(s"$base/src/batch$g.parquet")
        tgt.getParentFile.mkdirs()
        org.apache.commons.io.FileUtils.moveFile(part, tgt)
        require(tgt.setLastModified(1000000L * (g + 1)),
          s"cannot stamp mtime on $tgt")
      }
      val schema = s.read.parquet(s"$base/src").schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      val qName = "graft_stream_zorder_travel"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = src.writeStream.queryName(qName)
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            graft.io.GeoParquet.appendNumericWithSidecar(
              batch, s"$base/lake", zcols)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      require(graft.io.GeoParquet.currentGeneration(s, s"$base/lake") == 2,
        "expected one generation per micro-batch (3 batches)")
      require(graft.io.GeoParquet.unrecordedFiles(s, s"$base/lake").isEmpty,
        "every streamed file must be manifest-recorded")
      collectAndClean(s, base, (0 to 2).map { g =>
        graft.io.GeoParquet.readZOrderAtGeneration(s, s"$base/lake", g,
            Seq(("l_quantity", 10.0, 35.0)))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).cast("long").as("qty"),
            min(col("l_extendedprice")).as("price_min"),
            max(col("l_extendedprice")).as("price_max"))
          .select(lit(g).as("gen"), col("n"), col("qty"),
            col("price_min"), col("price_max"))
      }.reduce(_ unionAll _))
    }),

    // INCREMENTAL CHANGE READS over the generation lake (the Delta-CDF
    // consumption shape): a consumer polling (lastSeen, current] reads
    // ONLY the files those commits added — and a compaction generation
    // is a rewrite, not an arrival, so maintenance never makes the
    // consumer re-read the corpus. Three windows gated: the two
    // appends, the compaction-only window (must be EMPTY — count 0,
    // null aggregates, matched by the oracle's WHERE FALSE branch),
    // and the post-compaction append.
    "zorder_changes_read" -> ((s, dir) => {
      val out = processTmpDir(s, "zchg", dir)
      val zcols = Seq("l_quantity", "l_extendedprice")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      graft.io.GeoParquet.packZOrderToParquet(
        li.where(col("l_orderkey") % 4 === 0), zcols, out, numPartitions = 3)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 4 === 1), out, zcols)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 4 === 2), out, zcols)
      require(graft.io.GeoParquet.compactZOrderGeneration(
        s, out, zcols, numPartitions = 2) == 3, "compaction must commit gen 3")
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 4 === 3), out, zcols)
      def win(w: Int, a: Int, b: Int) =
        graft.io.GeoParquet.readZOrderChanges(s, out, a, b,
            Seq(("l_quantity", 10.0, 35.0)))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).cast("long").as("qty"),
            min(col("l_extendedprice")).as("price_min"),
            max(col("l_extendedprice")).as("price_max"))
          .select(lit(w).as("win"), col("n"), col("qty"),
            col("price_min"), col("price_max"))
      collectAndClean(s, out,
        win(1, 0, 2) unionAll win(2, 2, 3) unionAll win(3, 3, 4))
    }),

    // METADATA-ONLY STATS + HISTORY over the generation lake: per-file
    // row counts ride the sidecar (reserved __rowcount block), so
    // COUNT/MIN/MAX at ANY generation — and the per-generation
    // DESCRIBE-HISTORY row counts — answer from kilobytes of driver
    // metadata with ZERO data IO (at 100 TB: a dashboard refresh
    // instead of a full scan). The gate recomputes every number from
    // the DATA in DuckDB: five generations (pack, two appends, a
    // compaction rewrite, an append), each row carrying the
    // generation's arrival count AND the snapshot's metadata-derived
    // count/min/max.
    "zorder_stats_history" -> ((s, dir) => {
      val out = processTmpDir(s, "zsh", dir)
      val zcols = Seq("l_quantity", "l_extendedprice")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      graft.io.GeoParquet.packZOrderToParquet(
        li.where(col("l_orderkey") % 4 === 0), zcols, out, numPartitions = 3)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 4 === 1), out, zcols)
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 4 === 2), out, zcols)
      require(graft.io.GeoParquet.compactZOrderGeneration(
        s, out, zcols, numPartitions = 2) == 3, "compaction must commit gen 3")
      graft.io.GeoParquet.appendNumericWithSidecar(
        li.where(col("l_orderkey") % 4 === 3), out, zcols)
      val hist = graft.io.GeoParquet.generationHistory(s, out)
      require(hist.map(_._1) == Seq(0, 1, 2, 3, 4),
        s"expected generations 0..4, got ${hist.map(_._1)}")
      require(hist.forall(_._4 >= 0),
        "every generation must carry sidecar row counts")
      val rows = hist.map { case (g, rw, _, added) =>
        val (n, stats) = graft.io.GeoParquet.statsAtGeneration(
          s, out, g, Seq("l_extendedprice"))
        val (mn, mx) = stats("l_extendedprice")
        (g, if (rw) 1 else 0, added, n, mn, mx)
      }
      val df = s.createDataFrame(rows).toDF(
        "gen", "is_rewrite", "rows_added", "n", "emin", "emax")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      df
    }),

    // Streaming INGEST FILTER under the DuckDB gate: the full
    // sample-then-decontaminate ingest pipeline (Streams.ingestFilter)
    // per micro-batch via foreachBatch — both stages are per-row /
    // eval-set-local, so survivors are identical under ANY batch split
    // (the replay-stability property StreamingSpec checks); the oracle
    // replays the md5 threshold AND the 8-gram eval overlap
    "stream_ingest_filter" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val eval = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(col("doc_id"), col("text"))
      val outPath = processTmpDir(s, "stream_ingest_filter", dir)
      val qName = "graft_stream_ingest_filter"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = src.writeStream.queryName(qName)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            graft.streaming.Streams.ingestFilter(batch, "doc_id", "text",
                eval, fraction = 0.5, n = 8, salt = "ingest")
              .select(col("doc_id"))
              .write.mode("append").parquet(outPath)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      collectAndClean(s, outPath, s.read.parquet(outPath))
    }),

    // Streaming INCREMENTAL DEDUP under the DuckDB gate: the unchanged
    // batch operator (Dedup.againstCorpus — hash + left_anti) applied
    // to a STREAMING new-batch against a STATIC corpus snapshot: the
    // stream-static join shape (static side planned per microbatch,
    // broadcast when small; the stream buffers no state). Must produce
    // the same survivors as the batch twin incremental_dedup.
    "stream_incremental_dedup" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 3 === 0).select(col("doc_id"), col("text"))
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(col("doc_id"), col("text"))
      val fresh = src.where(col("doc_id") % 3 =!= 0)
        .unionAll(src.where(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      val deduped = graft.pipeline.Dedup.againstCorpus(fresh, corpus, "text")
      val qName = "graft_stream_incremental_dedup"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = deduped.writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).select(col("doc_id"))
    }),

    // Streaming NEAR-dedup under the DuckDB gate: the unchanged batch
    // operator (prefix-filtered cross-corpus Jaccard + anti-join) run
    // per micro-batch via foreachBatch — the canonical pattern for
    // batch ops whose internals (distinct, self-aggregates) streaming
    // can't express natively. Per-batch application IS the incremental
    // semantics (each new doc compares only to the static snapshot),
    // so any batch split yields the same survivors as the batch twin
    // near_dedup_incremental — and the SAME oracle gates both.
    "stream_near_dedup" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 3 === 0).select(col("doc_id"), col("text"))
      def src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(col("doc_id"), col("text"))
      val fresh = src.where(col("doc_id") % 3 =!= 0)
        .unionAll(src.where(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" xnear")).as("text")))
      val outPath = processTmpDir(s, "stream_near_dedup", dir)
      val qName = "graft_stream_near_dedup"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = fresh.writeStream.queryName(qName)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            graft.pipeline.Dedup.dedupNearAgainstCorpus(batch, corpus,
                "doc_id", "text", shingle = 5, threshold = 0.8)
              .select(col("doc_id"))
              .write.mode("append").parquet(outPath)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      collectAndClean(s, outPath, s.read.parquet(outPath))
    }),

    // Streaming SESSIONIZATION under the DuckDB gate: the session_window
    // aggregation as a real streaming query, pinned to the same
    // gaps-and-islands oracle as the batch event_sessions. Append mode
    // (closed sessions emit once and evict at the watermark); a
    // far-future sentinel KEY flushes the bounded replay's open
    // sessions and is dropped on the result table, exactly like the
    // custom-state twin below.
    "event_sessions_stream" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("event_type", lit("__sentinel"))
        .withColumn("ts", col("ts") + expr("INTERVAL 36500 DAYS"))
      val agg = graft.streaming.Streams.sessionize(src.unionAll(sentinel),
        "event_type", "ts", gap = "30 minutes")
      val qName = "graft_event_sessions_stream"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = agg.writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).where(col("event_type") =!= "__sentinel")
        .select(col("event_type"),
          col("session_window.start").as("session_start"),
          col("n_events").as("n"))
    }),

    // the DYNAMIC-GAP streaming twin: session_window with the per-event
    // gap expression as a real streaming query, pinned to the same
    // cumulative-max gaps-and-islands oracle as the batch
    // event_sessions_dynamic — the dynamic merge semantics surviving
    // the streaming session-state path. APPEND mode, the production
    // shape: a closed session emits ONCE when the watermark passes its
    // end and its state is evicted — output and state no longer scale
    // with the whole result table per trigger (the previous
    // complete-mode rewrite did). Far-future sentinels (user -1, one
    // per 100 event_ids of the UNFILTERED stream) drive the bounded
    // replay's final watermark past every real session's end; sentinel
    // output is filtered on the RESULT table, never inside the
    // streaming plan (an in-plan id predicate is pushed below the
    // EventTimeWatermark node and would starve watermark tracking).
    "event_sessions_dynamic_stream" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", col("ts") + expr("INTERVAL 36500 DAYS"))
      val agg = src.unionAll(sentinel)
        .withWatermark("ts", "1 minute")
        .groupBy(col("user_id"),
          session_window(col("ts"),
            when(col("event_type") === "click", "30 minutes")
              .otherwise("60 minutes")))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("session_start"))
      val qName = "graft_event_sessions_dynamic_stream"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = agg.writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // null-tolerant sentinel drop: NULL =!= -1 is NULL, and the
      // oracle keeps NULL-user sessions (groupBy groups them)
      s.table(qName)
        .where(col("user_id").isNull || col("user_id") =!= -1L)
        .select(col("user_id"), col("session_start"), col("n"))
    }),

    // CUSTOM-STATE streaming sessionization under the SAME oracle: the
    // flatMapGroupsWithState sessionizer (watermark-gated buffering +
    // event-time-timeout flush, the scd2Intervals discipline) must
    // reproduce the identical gaps-and-islands rollup the built-in
    // session_window twin above is gated on. Far-future sentinel rows
    // on a dedicated key drive the final watermark past every open
    // session's gap deadline so the bounded replay flushes everything;
    // sentinel output is filtered.
    "event_sessions_stream_state" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      // any window of 100 consecutive event_ids contains a sentinel —
      // the flush cannot silently depend on the id range starting at 0
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("event_type", lit("__sentinel"))
        .withColumn("ts", col("ts") + expr("INTERVAL 36500 DAYS"))
      val events = src.unionAll(sentinel)
        .select(col("event_type").as("key"), col("ts"))
        .withWatermark("ts", "1 minute")
        .as[graft.streaming.SessEvent]
      val sessions = graft.streaming.Streams.sessionizeWithState(
        events, gap = "30 minutes")
      val qName = "graft_event_sessions_stream_state"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = sessions.toDF().writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(qName).where(col("key") =!= "__sentinel")
        .select(col("key").as("event_type"),
          col("sessionStart").as("session_start"), col("n"))
    }),

    // Per-key event-time RATE LIMITER, batch shape: first 3 events per
    // (user, hour window) in strict (ts, event_id) order — quota
    // shaping for ingestion. The window is integer micros arithmetic
    // (epoch_us div 3.6e9), replayed identically by the oracle.
    "rate_limit_hourly" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("win"))
        .orderBy(col("ts").asc, col("event_id").asc)
      // NULL users excluded on both engines (shared oracle): the
      // streaming twin keys primitive-Long state and cannot hold them,
      // and a window partition would group NULL keys into one quota
      EventTs.toTimestamp(t(s, dir, "events"))
        .where(col("user_id").isNotNull)
        .withColumn("win", expr("unix_micros(ts) div 3600000000"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("user_id"), col("event_id"))
    }),

    // The CUSTOM-STATE streaming twin (Streams.rateLimit): per-key
    // admitted-count state per open window, events buffered until the
    // watermark passes them (admission depends on ORDER — an
    // out-of-order arrival may claim a slot), window counters pruned
    // once the watermark closes the window. Same oracle as the batch
    // shape: the admitted SET is replay-stable by construction.
    "stream_rate_limit" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src = EventTs.toTimestamp(s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val sentinel = src.where(col("event_id") % 100 === 0)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", col("ts") + expr("INTERVAL 36500 DAYS"))
      // same NULL-user guard as the batch twin (sentinels are exempt:
      // their user_id is the constant -1)
      val events = src.where(col("user_id").isNotNull).unionAll(sentinel)
        .select(col("user_id").as("userId"), col("ts"),
          col("event_id").as("eventId"), col("event_type").as("eventType"))
        .withWatermark("ts", "1 minute")
        .as[graft.streaming.StateEvent]
      val kept = graft.streaming.Streams.rateLimit(events, limit = 3,
        window = "1 hour")
      val qName = "graft_stream_rate_limit"
      s.streams.active.filter(q => q.name == qName).foreach(_.stop())
      streamScoped(s) {
        val q = kept.toDF().writeStream.format("memory").queryName(qName)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // drop sentinels by their EXACT id — real ids carry no sign
      // assumption here (the oracle and batch twin admit any non-null)
      s.table(qName).where(col("userId") =!= -1L)
        .select(col("userId").as("user_id"), col("eventId").as("event_id"))
    }),

    // SURVEY §2.7 sessionization — session_window (the Structured
    // Streaming session operator, here in batch) checked against a
    // gaps-and-islands SQL oracle: a session breaks when the gap to the
    // previous event is >= 30 minutes (Spark session end is exclusive).
    "event_sessions" -> ((s, dir) => {
      EventTs.toTimestamp(t(s, dir, "events"))
        .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("session_start"))
        .select(col("event_type"), col("session_start"), col("n"))
    }),

    // DYNAMIC-GAP sessionization: session_window with a PER-EVENT gap
    // expression (clicks hold a session open 30 minutes, everything
    // else 60) — each event spans [ts, ts + gap(event)) and overlapping
    // spans merge, so the session end is the running MAX of per-event
    // ends, not last-event + constant. The oracle replays exactly that:
    // a new island starts when an event's time reaches the cumulative
    // max end of all its predecessors (prior sessions' ends can never
    // reach past the break that closed them, so the per-user cummax
    // equals the in-session cummax at every break test).
    "event_sessions_dynamic" -> ((s, dir) => {
      EventTs.toTimestamp(t(s, dir, "events"))
        .groupBy(col("user_id"),
          session_window(col("ts"),
            when(col("event_type") === "click", "30 minutes")
              .otherwise("60 minutes")))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("session_start"))
        .select(col("user_id"), col("session_start"), col("n"))
    }),

    // TIME-SERIES RESAMPLE + FORWARD FILL (pandas resample('1h').ffill
    // distributed): every user gets a row for EVERY hour of the
    // table's span carrying their last at-or-before event value (null
    // before the first event) — the gap-filling regularization every
    // feature-store / monitoring pipeline needs. Composes existing
    // operators: the shared ns-clock per-user hour grid into the
    // distributed backward as-of join — one keyed shuffle, output
    // size = |users|·|hours| by definition. Equal-(user, ts) ties are
    // PRE-COLLAPSED (highest event_id wins) — ASOF's pick among exact
    // ties is engine-arbitrary on both sides, the documented
    // discipline. The oracle replays it with generate_series + native
    // ASOF on the same ns clock.
    "resample_ffill" -> ((s, dir) => {
      val ev = resampleEvents(s, dir)
      graft.tools.Joins.asofBackward(userHourGridNs(ev),
          collapseTies(ev).select(col("user_id"), col("ts"),
            col("value").as("last_value")),
          Seq("user_id"), "t", "ts", Seq("last_value"))
        .select(col("user_id"),
          timestamp_micros(expr("t div 1000")).as("hour"),
          col("last_value"))
    }),

    // LINEAR-INTERPOLATION resample (pandas resample('1h').interpolate
    // distributed): each grid hour takes
    //   v0 + (v1 - v0) · ((t - t0) / (t1 - t0))
    // between the surrounding events, null outside the observed range —
    // the ffill twin's smooth variant, composing BOTH as-of directions
    // (two keyed shuffles) over the same grid helper and tie collapse.
    // Hash-exact across engines because every operand is exact in
    // double (nanos diffs < 2^53) and both engines evaluate the
    // IDENTICAL IEEE operation sequence — the global_rank_stats
    // precedent (exact ints → one division) extended to a four-op
    // float formula.
    "resample_interp" -> ((s, dir) => {
      val ev = resampleEvents(s, dir)
      val evC = collapseTies(ev)
      val back = graft.tools.Joins.asofBackward(userHourGridNs(ev),
        evC.select(col("user_id"), col("ts"),
          col("ts").as("t0"), col("value").as("v0")),
        Seq("user_id"), "t", "ts", Seq("t0", "v0"))
      val joined = graft.tools.Joins.asofForward(back,
        evC.select(col("user_id"), col("ts"),
          col("ts").as("t1"), col("value").as("v1")),
        Seq("user_id"), "t", "ts", Seq("t1", "v1"))
      joined.select(col("user_id"), col("t"),
        when(col("t0").isNull || col("t1").isNull, lit(null))
          .when(col("t1") === col("t0"), col("v0"))
          .otherwise(col("v0") + (col("v1") - col("v0")) *
            ((col("t") - col("t0")).cast("double") /
              (col("t1") - col("t0")).cast("double")))
          .as("v_interp"))
    }),

    // SWEEP-LINE CONCURRENCY (Ranks.sweepConcurrency): each event
    // opens a half-open 30-minute activity interval; the gauge = how
    // many are open at each event point, hourly peaks = the
    // "concurrent sessions right now" monitoring rollup. A self-join
    // would be an O(n·k) range join and a vanilla window a single-task
    // global sort; the sweep is ±1 deltas + the distributed two-pass
    // prefix sum (one range shuffle). Per-bucket MAX is
    // tie-order-invariant (the multiset of running values across equal
    // (t, delta) rows is fixed), so the gauge gates exactly: the
    // oracle replays the same ordered running sum.
    "interval_concurrency" -> ((s, dir) => {
      val iv = EventTs.toTimestamp(t(s, dir, "events"))
        .select(unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) + 1800000000L).as("en"))
      graft.tools.Ranks.sweepConcurrency(iv, "st", "en")
        .groupBy(expr("t div 3600000000").as("hour_bucket"))
        .agg(max(col("gauge")).as("peak"), count(lit(1)).as("n_points"))
    }),

    // Rolling event-time window per user (feature engineering): for
    // every event, how many events the same user produced in the
    // preceding hour (inclusive). A RANGE window over int64 nanos —
    // ONE shuffle keyed on the user, exact integer counts either
    // engine; duplicate timestamps are order-insensitive under RANGE.
    "rolling_user_counts" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(-3600L * 1000000000L, 0L) // 1h in nanos
      EventTs.toNanos(t(s, dir, "events"))
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("n_prev_hour", count(lit(1)).over(w))
        .select(col("event_id"), col("n_prev_hour"))
    }),

    // Backward as-of join (tools/Joins.asofBackward): every click picks
    // the user's latest at-or-before purchase value; one keyed shuffle,
    // no candidate blowup. Oracled against DuckDB's NATIVE ASOF JOIN —
    // an independent implementation of the same semantics. Timestamps
    // stay int64 nanos on the Spark side (nanosAsLong); ordering is
    // identical either way.
    "asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("prior_value"))
      graft.tools.Joins.asofBackward(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("prior_value"))
        .select(col("event_id"), col("prior_value"))
    }),

    // Forward as-of: the user's NEXT purchase at-or-after each click
    "asof_join_fwd" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("next_value"))
      graft.tools.Joins.asofForward(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("next_value"))
        .select(col("event_id"), col("next_value"))
    }),

    // Interval overlap join with the 1-D PBSM reference-bin dedup:
    // lineitem quantity bands vs nation bands, pair emitted exactly once
    "interval_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_quantity").as("qlo"),
        (col("l_quantity") + col("l_linenumber")).as("qhi"))
      val bands = t(s, dir, "nation").select(col("n_nationkey"),
        (col("n_nationkey") * lit(2.0)).as("lo"),
        (col("n_nationkey") * lit(2.0) + lit(5.0)).as("hi"))
      graft.tools.Joins.intervalOverlapJoin(li, bands, "qlo", "qhi", "lo", "hi",
          binSize = 6.0)
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("min_ok"))
    }),

    // Point-in-interval range join (tools/Joins.rangeJoin): lineitem
    // quantities matched to overlapping nation-derived bands via the
    // 1-D bin equi-join + exact BETWEEN residual (no nested loop).
    "range_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val bands = t(s, dir, "nation").select(col("n_nationkey"),
        (col("n_nationkey") * lit(2.0)).as("lo"),
        (col("n_nationkey") * lit(2.0) + lit(5.0)).as("hi"))
      graft.tools.Joins.rangeJoin(li, bands, "l_quantity", "lo", "hi", binSize = 4.0)
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("min_ok"))
    }),

    // As-of with tolerance: the nearest prior purchase still matches,
    // but only within 6 hours — farther matches null out (merge_asof
    // tolerance semantics; ts stays int64 nanos, 6h = 21_600e9 ns).
    "asof_join_tol" -> ((s, dir) => {
      val ev = EventTs.toNanos(t(s, dir, "events"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("prior_value"))
      graft.tools.Joins.asofBackward(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("prior_value"), tolerance = 21600L * 1000000000L)
        .select(col("event_id"), col("prior_value"))
    }),

    // Nearest as-of (merge_asof direction='nearest'): closer of the
    // prior and next purchase, backward winning ties — one keyed
    // shuffle, two ordered windows over the same partitioning.
    "asof_join_near" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("near_value"))
      graft.tools.Joins.asofNearest(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("near_value"))
        .select(col("event_id"), col("near_value"))
    }),

    // Fixed-radius near-neighbor self-join (SpatialJoin.distanceJoin):
    // grid cell edge == radius, right side replicated to its 3x3 cell
    // neighborhood, left side keys one cell — every pair meets exactly
    // once, hash join + exact squared-distance residual. Squared
    // distances are integer-valued (integer-lattice points), so the
    // oracle compare is exact.
    "distance_join_pairs" -> ((s, dir) => {
      val a = custPoints(s, dir).select(col("c_custkey").as("id_a"), col("pt").as("pa"))
      val b = custPoints(s, dir).select(col("c_custkey").as("id_b"), col("pt").as("pb"))
      SpatialJoin.distanceJoin(a, b, "pa", "pb", radius = 50.0, distCol = "dist2")
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("dist2"))
    }),

    // Nearest-neighbor join (SpatialJoin.nearestJoin, k=1, how=left):
    // each customer point gets its nearest supplier point within r=100
    // via min(struct(d2, key)) over grid candidates — map-side partial
    // aggregation, no window sort; radius-isolated customers survive
    // with nulls (left semantics).
    "sjoin_nearest" -> ((s, dir) => {
      val cust = custPoints(s, dir).select(col("c_custkey").as("id"), col("pt"))
      val supp = t(s, dir, "supplier")
        .withColumn("spt", st_point(((col("s_suppkey") * 7919) % 1000).cast("double"),
          ((col("s_suppkey") * 104729) % 1000).cast("double")))
        .select(col("s_suppkey").as("nn_id"), col("spt"))
      SpatialJoin.nearestJoin(cust, supp, "pt", "spt", radius = 100.0,
          leftKey = "id", rightKey = "nn_id", k = 1, how = "left")
        .select(col("id"), col("nn_id"), col("nn_dist2"))
    }),

    // Broadcast-index nearest join: driver-built grid over the (small)
    // supplier side, per-partition 3x3 probe — zero shuffle of the
    // customer side. Pinned to the SAME oracle as sjoin_nearest: both
    // plans must produce the identical nearest assignment.
    "sjoin_nearest_bcast" -> ((s, dir) => {
      val cust = custPoints(s, dir).select(col("c_custkey").as("id"), col("pt"))
      val supp = t(s, dir, "supplier")
        .withColumn("spt", st_point(((col("s_suppkey") * 7919) % 1000).cast("double"),
          ((col("s_suppkey") * 104729) % 1000).cast("double")))
        .select(col("s_suppkey").as("nn_id"), col("spt"))
      SpatialJoin.broadcastNearestJoin(cust, supp, "pt", "spt", radius = 100.0,
          rightKey = "nn_id", k = 1, how = "left")
        .select(col("id"), col("nn_id"), col("nn_dist2"))
    }),

    // K-nearest (k=3) within r=150 — the window top-k path of
    // nearestJoin (row_number over grid candidates, WindowGroupLimit
    // keeps the per-key top-k partial map-side).
    "sjoin_knn" -> ((s, dir) => {
      val cust = custPoints(s, dir).select(col("c_custkey").as("id"), col("pt"))
      val supp = t(s, dir, "supplier")
        .withColumn("spt", st_point(((col("s_suppkey") * 7919) % 1000).cast("double"),
          ((col("s_suppkey") * 104729) % 1000).cast("double")))
        .select(col("s_suppkey").as("nn_id"), col("spt"))
      SpatialJoin.nearestJoin(cust, supp, "pt", "spt", radius = 150.0,
          leftKey = "id", rightKey = "nn_id", k = 3, how = "inner")
        .select(col("id"), col("nn_id"), col("nn_dist2"))
    }),

    // the DENSITY-ADAPTIVE kNN under the SAME oracle: phase 1 probes
    // at the data-derived r0 (~4k expected neighbors), certified lefts
    // (>= k candidates found — nothing unseen can be closer) skip the
    // full-radius pass entirely; only sparse neighborhoods rerun at
    // radius 150. At 10x density the fixed-radius candidate set grows
    // 10x per left while this stays ~constant — the fixed-extent
    // scale-up answer measured in BENCH_sf1.
    "sjoin_knn_adaptive" -> ((s, dir) => {
      val cust = custPoints(s, dir).select(col("c_custkey").as("id"), col("pt"))
      val supp = t(s, dir, "supplier")
        .withColumn("spt", st_point(((col("s_suppkey") * 7919) % 1000).cast("double"),
          ((col("s_suppkey") * 104729) % 1000).cast("double")))
        .select(col("s_suppkey").as("nn_id"), col("spt"))
      SpatialJoin.nearestJoinAdaptive(cust, supp, "pt", "spt", radius = 150.0,
          leftKey = "id", rightKey = "nn_id", k = 3, how = "inner")
        .select(col("id"), col("nn_id"), col("nn_dist2"))
    }),

    // Vocabulary stats via explode (Generate): exact distinct tokens.
    "vocab_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("tok"))
        .agg(count_distinct(col("tok")).as("vocab"), count(lit(1)).as("total_tokens"))
    }),

    // Pipeline: exact dedup on documents.
    "dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
        .select(col("keep_id"), col("dup_cnt"))
    }),

    // Pipeline: token/char counts.
    "token_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("tokens"),
        length(col("text")).as("chars"))
    })
  )

  /** DuckDB-equivalent SQL per query (same column names — the driver's
    * compare sorts columns by name before hashing). */
  /** The CLRS segment-intersection oracle body, parameterized by the
    * `a`-side CTE so the skewed variant shares one formulation (an
    * independent integer-arithmetic differential for the segment
    * kernel at join scale). */
  private def clrsLinesSql(aCte: String): String =
    s"""WITH a AS ($aCte),
       b AS (
         SELECT n_nationkey,
                n_nationkey*2 AS bx0, (n_nationkey*7) % 50 AS by0,
                n_nationkey*2 + 6 AS bx1,
                (n_nationkey*7) % 50 + ((n_nationkey % 5)*3 - 6) AS by1
         FROM nation
       )
       SELECT l_orderkey, l_linenumber, n_nationkey FROM (
         SELECT l_orderkey, l_linenumber, n_nationkey,
                ax0, ay0, ax1, ay1, bx0, by0, bx1, by1,
                (ax1-ax0)*(by0-ay0) - (ay1-ay0)*(bx0-ax0) AS d1,
                (ax1-ax0)*(by1-ay0) - (ay1-ay0)*(bx1-ax0) AS d2,
                (bx1-bx0)*(ay0-by0) - (by1-by0)*(ax0-bx0) AS d3,
                (bx1-bx0)*(ay1-by0) - (by1-by0)*(ax1-bx0) AS d4
         FROM a, b)
       WHERE (((d1>0 AND d2<0) OR (d1<0 AND d2>0))
              AND ((d3>0 AND d4<0) OR (d3<0 AND d4>0)))
          OR (d1=0 AND bx0 BETWEEN least(ax0,ax1) AND greatest(ax0,ax1)
                   AND by0 BETWEEN least(ay0,ay1) AND greatest(ay0,ay1))
          OR (d2=0 AND bx1 BETWEEN least(ax0,ax1) AND greatest(ax0,ax1)
                   AND by1 BETWEEN least(ay0,ay1) AND greatest(ay0,ay1))
          OR (d3=0 AND ax0 BETWEEN least(bx0,bx1) AND greatest(bx0,bx1)
                   AND ay0 BETWEEN least(by0,by1) AND greatest(by0,by1))
          OR (d4=0 AND ax1 BETWEEN least(bx0,bx1) AND greatest(bx0,bx1)
                   AND ay1 BETWEEN least(by0,by1) AND greatest(by0,by1))"""

  /** Shared by sjoin_lines (grid path) and sjoin_lines_bcast (broadcast
    * R-tree path): both plans MUST produce the identical pair set. */
  private lazy val sjoinLinesOracleSql: String = clrsLinesSql(
    """SELECT l_orderkey, l_linenumber,
              l_orderkey % 50 AS ax0, l_partkey % 50 AS ay0,
              l_orderkey % 50 + (l_suppkey % 7 - 3) AS ax1,
              l_partkey % 50 + ((l_orderkey*3) % 7 - 3) AS ay1
       FROM lineitem
       WHERE NOT (l_suppkey % 7 = 3 AND (l_orderkey*3) % 7 = 3)""")

  /** sjoin_lines_skewed: identical CLRS body over the 90%-one-cell
    * segment recipe. */
  private lazy val sjoinLinesSkewedOracleSql: String = clrsLinesSql(
    """SELECT l_orderkey, l_linenumber,
              CASE WHEN l_orderkey % 10 <> 0 THEN (l_orderkey*13) % 8
                   ELSE l_orderkey % 50 END AS ax0,
              CASE WHEN l_orderkey % 10 <> 0 THEN (l_partkey*17) % 8
                   ELSE l_partkey % 50 END AS ay0,
              CASE WHEN l_orderkey % 10 <> 0 THEN (l_orderkey*13) % 8
                   ELSE l_orderkey % 50 END + (l_suppkey % 7 - 3) AS ax1,
              CASE WHEN l_orderkey % 10 <> 0 THEN (l_partkey*17) % 8
                   ELSE l_partkey % 50 END + ((l_orderkey*3) % 7 - 3) AS ay1
       FROM lineitem
       WHERE NOT (l_suppkey % 7 = 3 AND (l_orderkey*3) % 7 = 3)""")

  /** Shared by sjoin_nearest (grid + min-struct path) and
    * sjoin_nearest_bcast (broadcast grid-index path): both plans MUST
    * produce the identical nearest assignment. */
  // shared by sjoin_knn AND sjoin_knn_adaptive (the adaptive two-phase
  // path must reproduce the brute-force kNN bit-for-bit)
  private lazy val sjoinKnnOracle: String =
    """WITH a AS (SELECT c_custkey AS id,
                         CAST((c_custkey*7919)%1000 AS DOUBLE) AS x,
                         CAST((c_custkey*104729)%1000 AS DOUBLE) AS y
                  FROM customer),
            b AS (SELECT s_suppkey AS nn_id,
                         CAST((s_suppkey*7919)%1000 AS DOUBLE) AS x,
                         CAST((s_suppkey*104729)%1000 AS DOUBLE) AS y
                  FROM supplier),
            best AS (SELECT id, nn_id, d2,
                            row_number() OVER (PARTITION BY id
                              ORDER BY d2, nn_id) AS rn
                     FROM (SELECT a.id, b.nn_id,
                                  (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) AS d2
                           FROM a, b
                           WHERE (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)
                                   <= 22500.0))
       SELECT id, nn_id, d2 AS nn_dist2 FROM best WHERE rn <= 3"""

  // shared by scd2_user_states AND stream_scd2 (batch/streaming
  // unification as a code fact, not a comment)
  private lazy val scd2Oracle: String =
    """SELECT user_id, event_type AS state, ts AS valid_from,
              lead(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS valid_to
       FROM (SELECT user_id, ts, event_id, event_type,
                    lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev
             FROM events WHERE user_id IS NOT NULL)
       WHERE prev IS NULL OR prev <> event_type"""

  private lazy val sjoinNearestOracleSql: String =
    """WITH a AS (SELECT c_custkey AS id,
                         CAST((c_custkey*7919)%1000 AS DOUBLE) AS x,
                         CAST((c_custkey*104729)%1000 AS DOUBLE) AS y
                  FROM customer),
            b AS (SELECT s_suppkey AS nn_id,
                         CAST((s_suppkey*7919)%1000 AS DOUBLE) AS x,
                         CAST((s_suppkey*104729)%1000 AS DOUBLE) AS y
                  FROM supplier),
            best AS (SELECT id, nn_id, d2,
                            row_number() OVER (PARTITION BY id
                              ORDER BY d2, nn_id) AS rn
                     FROM (SELECT a.id, b.nn_id,
                                  (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) AS d2
                           FROM a, b
                           WHERE (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)
                                   <= 10000.0))
       SELECT a.id, best.nn_id, best.d2 AS nn_dist2
       FROM a LEFT JOIN best ON a.id = best.id AND best.rn = 1"""

  // shared by area_polygons and its WKB-roundtrip twin
  private lazy val areaPolygonsOracle: String =
    """SELECT p_brand,
       sum(4.0*((p_partkey%5)+1)*((p_partkey%5)+1)
           - 4.0*(p_partkey%5)*(p_partkey%5)) AS total_area,
       count(*) AS n
       FROM part GROUP BY p_brand"""

  // ---- wkb_roundtrip oracle helpers ----------------------------------
  // DuckDB rebuilds the canonical little-endian WKB point blob from
  // PURE INTEGER ARITHMETIC: the IEEE-754 bits of an integer-valued
  // double v in [0, 1024) are (1023+e)<<52 | (v - 2^e)<<(52-e) with
  // e = floor(log2 v) — emitted as a CASE ladder so no float function
  // (and no float rounding) is ever involved; bytes are then hex'd and
  // reversed to little-endian. An independent re-derivation of the
  // wire format, not a shared encoder.
  private def wkbBitsSql(v: String): String = {
    val branches = (9 to 1 by -1).map { e =>
      val p = 1L << e
      val base = (1023L + e) * (1L << 52)
      val mul = 1L << (52 - e)
      s"WHEN ($v) >= $p THEN $base + (($v) - $p) * $mul"
    } :+ s"WHEN ($v) >= 1 THEN ${1023L * (1L << 52)} + (($v) - 1) * ${1L << 52}"
    branches.mkString("CASE ", " ", " ELSE 0 END")
  }
  private def leHexSql(h: String): String =
    (15 to 1 by -2).map(i => s"substr($h,$i,2)").mkString("||")

  // shared by the batch window-rank rate limiter and the custom-state
  // streaming twin: both must admit exactly the first 3 events per
  // (user, hour window) under the (ts, event_id) total order
  private lazy val rateLimitOracle: String =
    """SELECT user_id, event_id FROM (
         SELECT user_id, event_id,
                row_number() OVER (PARTITION BY user_id,
                                                epoch_us(ts) // 3600000000
                                   ORDER BY ts, event_id) AS rn
         FROM events WHERE user_id IS NOT NULL)
       WHERE rn <= 3"""

  // shared by batch event_sessions and the streaming session_window
  // twin: both must reproduce the gaps-and-islands session rollup
  // dynamic-gap gaps-and-islands: per-event end = us + gap(type); a
  // session breaks when an event reaches the cumulative max of all
  // prior ends (equivalent to the in-session max — prior sessions'
  // ends can never reach past the break that closed them); micros
  // arithmetic matches the engine's timestamp grain. ONE val shared by
  // the batch and streaming twins.
  private lazy val eventSessionsDynamicOracle: String =
    """WITH e AS (
         SELECT user_id, epoch_us(ts) AS us,
                CASE WHEN event_type = 'click' THEN 1800000000
                     ELSE 3600000000 END AS gap_us
         FROM events),
       w AS (
         SELECT user_id, us,
                max(us + gap_us) OVER (
                  PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prev_end
         FROM e),
       b AS (
         SELECT user_id, us,
                CASE WHEN prev_end IS NULL OR us >= prev_end
                     THEN 1 ELSE 0 END AS brk
         FROM w),
       s AS (
         SELECT user_id, us,
                sum(brk) OVER (PARTITION BY user_id ORDER BY us) AS sid
         FROM b)
     SELECT user_id, make_timestamp(min(us)) AS session_start,
            count(*) AS n
     FROM s GROUP BY user_id, sid"""

  private lazy val eventSessionsOracle: String =
    """WITH d AS (
         SELECT event_type, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY event_type ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY event_type ORDER BY ts)
                          >= INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS brk
         FROM events),
       s AS (
         SELECT event_type, ts,
                sum(brk) OVER (PARTITION BY event_type ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
         FROM d)
       SELECT event_type, min(ts) AS session_start, count(*) AS n
       FROM s GROUP BY event_type, sid"""

  private lazy val spatialOracles: Map[String, String] = Map(
    "sjoin_lines_bcast" -> sjoinLinesOracleSql,
    // exact-ntile hilbert packing: DuckDB can't compute hilbert
    // distances, but with the boundaries fixed at the exact rank split
    // the per-partition COUNTS are pure arithmetic on count(*)
    // (ceil((i+1)n/8) - ceil(in/8)), and the range-disjointness
    // invariant `ok` must hold for ANY correct packing — both are
    // engine-checkable without hilbert itself
    // the 20-term flat interleave: ((xi >> b) & 1) << 2b  |  ((yi >> b) & 1)
    // << (2b+1), written with // and % so it is pure integer arithmetic in
    // any SQL dialect (no bit-operator portability concerns)
    "morton_codes" -> {
      val terms = (0 until 10).flatMap { b =>
        Seq(s"((xi//${1L << b})%2)*${1L << (2 * b)}",
          s"((yi//${1L << b})%2)*${1L << (2 * b + 1)}")
      }.mkString(" + ")
      s"""WITH p AS (SELECT c_custkey,
                            (c_custkey*7919)%1000 AS xi,
                            (c_custkey*104729)%1000 AS yi FROM customer)
          SELECT c_custkey, CAST($terms AS BIGINT) AS m FROM p"""
    },
    "hilbert_pack_stats" ->
      """WITH n AS (SELECT count(*) AS c FROM customer)
         SELECT CAST(i AS BIGINT) AS part,
                CAST(((i+1)*c + 7)//8 - (i*c + 7)//8 AS BIGINT) AS n_rows,
                CAST(1 AS INT) AS ok
         FROM range(8) AS t(i), n""",
    "asof_join" ->
      """SELECT l.event_id, r.value AS prior_value
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN
              (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "range_join" ->
      """SELECT n_nationkey, count(*) AS n, min(l_orderkey) AS min_ok
         FROM lineitem JOIN nation
           ON l_quantity >= n_nationkey * 2.0
          AND l_quantity <= n_nationkey * 2.0 + 5.0
         GROUP BY n_nationkey""",
    "asof_join_fwd" ->
      """SELECT l.event_id, r.value AS next_value
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN
              (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts <= r.ts""",
    "interval_join" ->
      """SELECT n_nationkey, count(*) AS n, min(l_orderkey) AS min_ok
         FROM (SELECT l_orderkey, l_quantity AS qlo,
                      l_quantity + l_linenumber AS qhi
               FROM lineitem) li
         JOIN nation
           ON qlo <= n_nationkey * 2.0 + 5.0
          AND n_nationkey * 2.0 <= qhi
         GROUP BY n_nationkey""",
    "asof_join_tol" ->
      """SELECT l.event_id,
                CASE WHEN epoch_ns(l.ts) - epoch_ns(r.ts) <= 21600000000000
                     THEN r.value END AS prior_value
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN
              (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "distance_join_pairs" ->
      """WITH p AS (SELECT c_custkey AS id,
                           CAST((c_custkey*7919)%1000 AS DOUBLE) AS x,
                           CAST((c_custkey*104729)%1000 AS DOUBLE) AS y
                    FROM customer)
         SELECT a.id AS id_a, b.id AS id_b,
                (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) AS dist2
         FROM p a JOIN p b
           ON a.id < b.id
          AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= 2500.0""",
    "sjoin_nearest" -> sjoinNearestOracleSql,
    "sjoin_nearest_bcast" -> sjoinNearestOracleSql,
    "asof_join_near" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
              r AS (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'purchase'),
              b AS (SELECT l.event_id, l.ts AS lts, r.ts AS bts, r.value AS bval
                    FROM l ASOF LEFT JOIN r
                      ON l.user_id = r.user_id AND l.ts >= r.ts),
              f AS (SELECT l.event_id, r.ts AS fts, r.value AS fval
                    FROM l ASOF LEFT JOIN r
                      ON l.user_id = r.user_id AND l.ts <= r.ts)
         SELECT b.event_id,
                CASE WHEN bts IS NOT NULL
                          AND (fts IS NULL OR
                               epoch_ns(lts) - epoch_ns(bts)
                                 <= epoch_ns(fts) - epoch_ns(lts))
                     THEN bval ELSE fval END AS near_value
         FROM b JOIN f USING (event_id)""",
    "sjoin_knn" -> sjoinKnnOracle,
    // adaptive variant pinned to the IDENTICAL brute-force oracle (one
    // shared val, like bruteForceCosineOracle) — the two-phase
    // certification must change nothing about the result
    "sjoin_knn_adaptive" -> sjoinKnnOracle,
    "cx_bbox_points" ->
      """SELECT c_custkey,
         CAST((c_custkey*7919)%1000 AS DOUBLE) AS px,
         CAST((c_custkey*104729)%1000 AS DOUBLE) AS py
         FROM customer
         WHERE (c_custkey*7919)%1000 BETWEEN 100 AND 600
           AND (c_custkey*104729)%1000 BETWEEN 100 AND 600""",
    "multipoint_bbox" ->
      """SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         HAVING max(CASE WHEN l_partkey%1000 BETWEEN 200 AND 800
                          AND l_suppkey%1000 BETWEEN 200 AND 800
                    THEN 1 ELSE 0 END) = 1""",
    "polygon_bbox" ->
      """SELECT s_suppkey FROM supplier
         WHERE greatest(0, 350 - ((s_suppkey*7919)%500)*2, ((s_suppkey*7919)%500)*2 - 650)
             + greatest(0, 350 - ((s_suppkey*104729)%500)*2, ((s_suppkey*104729)%500)*2 - 650)
             <= (s_suppkey%25)*2 + 21""",
    "line_bbox" ->
      """SELECT l_orderkey FROM (
           SELECT l_orderkey,
                  l_orderkey%1000 AS x0, l_partkey%1000 AS y0,
                  (l_suppkey*13)%1000 AS x1, (l_orderkey*17)%1000 AS y1
           FROM lineitem WHERE l_linenumber = 1
         ) WHERE greatest(x0,x1) >= 300 AND least(x0,x1) <= 700
             AND greatest(y0,y1) >= 300 AND least(y0,y1) <= 700
             AND NOT (
                   (x1-x0)*(300-y0)-(y1-y0)*(300-x0) > 0 AND
                   (x1-x0)*(300-y0)-(y1-y0)*(700-x0) > 0 AND
                   (x1-x0)*(700-y0)-(y1-y0)*(700-x0) > 0 AND
                   (x1-x0)*(700-y0)-(y1-y0)*(300-x0) > 0 )
             AND NOT (
                   (x1-x0)*(300-y0)-(y1-y0)*(300-x0) < 0 AND
                   (x1-x0)*(300-y0)-(y1-y0)*(700-x0) < 0 AND
                   (x1-x0)*(700-y0)-(y1-y0)*(700-x0) < 0 AND
                   (x1-x0)*(700-y0)-(y1-y0)*(300-x0) < 0 )""",
    "area_polygons" -> areaPolygonsOracle,
    // the WKB encode->decode roundtrip must be invisible to the kernel
    "wkb_polygon_area" -> areaPolygonsOracle,
    "length_lines" ->
      """SELECT l_orderkey,
         sqrt( CAST((l_suppkey%1000)-(l_orderkey%1000) AS DOUBLE)*((l_suppkey%1000)-(l_orderkey%1000))
             + CAST(((l_orderkey*7)%1000)-(l_partkey%1000) AS DOUBLE)*(((l_orderkey*7)%1000)-(l_partkey%1000)) )
         + sqrt( CAST(((l_partkey*3)%1000)-(l_suppkey%1000) AS DOUBLE)*(((l_partkey*3)%1000)-(l_suppkey%1000))
             + CAST(((l_suppkey*11)%1000)-((l_orderkey*7)%1000) AS DOUBLE)*(((l_suppkey*11)%1000)-((l_orderkey*7)%1000)) )
         AS len
         FROM lineitem WHERE l_linenumber = 1""",
    "bounds_multipoint" ->
      """SELECT l_orderkey,
         CAST(min(l_partkey%1000) AS DOUBLE) AS x0, CAST(min(l_suppkey%1000) AS DOUBLE) AS y0,
         CAST(max(l_partkey%1000) AS DOUBLE) AS x1, CAST(max(l_suppkey%1000) AS DOUBLE) AS y1
         FROM lineitem GROUP BY l_orderkey""",
    "total_bounds_points" ->
      """SELECT CAST(min((s_suppkey*7919)%1000) AS DOUBLE) AS x0,
                CAST(min((s_suppkey*104729)%1000) AS DOUBLE) AS y0,
                CAST(max((s_suppkey*7919)%1000) AS DOUBLE) AS x1,
                CAST(max((s_suppkey*104729)%1000) AS DOUBLE) AS y1
         FROM supplier""",
    "sjoin_points_in_diamonds" ->
      """SELECT c_custkey, s_suppkey
         FROM customer, supplier
         WHERE abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
             + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
             <= (s_suppkey%25)*2 + 21""",
    "sjoin_skewed" ->
      """SELECT c_custkey, s_suppkey
         FROM customer, supplier
         WHERE abs((CASE WHEN c_custkey%10<>0 THEN (c_custkey*13%50)*2
                         ELSE (c_custkey*7919%500)*2 END)
                   - (s_suppkey*7919%500)*2)
             + abs((CASE WHEN c_custkey%10<>0 THEN (c_custkey*17%50)*2
                         ELSE (c_custkey*104729%500)*2 END)
                   - (s_suppkey*104729%500)*2)
             <= (s_suppkey%25)*2 + 21""",
    "sjoin_skewed_adaptive" ->
      """SELECT c_custkey, s_suppkey
         FROM customer, supplier
         WHERE abs((CASE WHEN c_custkey%10<>0 THEN (c_custkey*13%50)*2
                         ELSE (c_custkey*7919%500)*2 END)
                   - (s_suppkey*7919%500)*2)
             + abs((CASE WHEN c_custkey%10<>0 THEN (c_custkey*17%50)*2
                         ELSE (c_custkey*104729%500)*2 END)
                   - (s_suppkey*104729%500)*2)
             <= (s_suppkey%25)*2 + 21""",
    "sjoin_auto" ->
      """SELECT c_custkey, s_suppkey
         FROM customer, supplier
         WHERE abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
             + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
             <= (s_suppkey%25)*2 + 21""",
    "sjoin_left" ->
      """SELECT c_custkey, s_suppkey
         FROM customer LEFT JOIN supplier
           ON abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
            + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
            <= (s_suppkey%25)*2 + 21""",
    "sjoin_sql_left" ->
      """SELECT c_custkey, s_suppkey
         FROM customer LEFT JOIN supplier
           ON abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
            + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
            <= (s_suppkey%25)*2 + 21""",
    "sjoin_sql_right" ->
      """SELECT c_custkey, s_suppkey
         FROM supplier RIGHT JOIN customer
           ON abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
            + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
            <= (s_suppkey%25)*2 + 21""",
    "sjoin_semi" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (
           SELECT 1 FROM supplier
           WHERE abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
               + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
               <= (s_suppkey%25)*2 + 21)""",
    "sjoin_anti" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (
           SELECT 1 FROM supplier
           WHERE abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
               + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
               <= (s_suppkey%25)*2 + 21)""",
    "sjoin_right" ->
      """SELECT c_custkey, s_suppkey
         FROM supplier LEFT JOIN customer
           ON abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
            + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
            <= (s_suppkey%25)*2 + 21""",
    "sjoin_broadcast" ->
      """SELECT c_custkey, s_suppkey
         FROM customer, supplier
         WHERE abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
             + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
             <= (s_suppkey%25)*2 + 21""",
    "sjoin_bucketed" ->
      """SELECT c_custkey, s_suppkey
         FROM customer, supplier
         WHERE abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
             + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
             <= (s_suppkey%25)*2 + 21""",
    "sjoin_multipolygon" ->
      """SELECT c_custkey, s_suppkey
         FROM customer, supplier
         WHERE abs(((c_custkey*7919)%500)*2 - ((s_suppkey*7919)%500)*2)
             + abs(((c_custkey*104729)%500)*2 - ((s_suppkey*104729)%500)*2)
             <= (s_suppkey%25)*2 + 21
            OR abs(((c_custkey*7919)%500)*2 - (((s_suppkey*7919)%500)*2 + 100))
             + abs(((c_custkey*104729)%500)*2 - (((s_suppkey*104729)%500)*2 + 100))
             <= (s_suppkey%25)*2 + 21""",
    "group_total_bounds" ->
      """SELECT s_nationkey,
                CAST(min((s_suppkey*7919)%1000) AS DOUBLE) AS x0,
                CAST(min((s_suppkey*104729)%1000) AS DOUBLE) AS y0,
                CAST(max((s_suppkey*7919)%1000) AS DOUBLE) AS x1,
                CAST(max((s_suppkey*104729)%1000) AS DOUBLE) AS y1
         FROM supplier GROUP BY s_nationkey""",
    "cx_open_slice" ->
      """SELECT c_custkey FROM customer WHERE (c_custkey*7919)%1000 >= 300""",
    "pack_roundtrip" ->
      """SELECT c_custkey FROM customer
         WHERE (c_custkey*7919)%1000 BETWEEN 200 AND 700
           AND (c_custkey*104729)%1000 BETWEEN 200 AND 700""",
    "cx_partitions" ->
      // file-granularity semantics: every row of every px-band whose
      // recomputed file bounds intersect the query box (closed, the
      // reader's !(x1<qx0 || x0>qx1 || ...) predicate)
      """SELECT c_custkey FROM customer
         WHERE floor(((c_custkey*7919)%1000) / 250) IN (
           SELECT band FROM (
             SELECT floor(((c_custkey*7919)%1000) / 250) AS band,
                    min((c_custkey*7919)%1000) AS mnx,
                    max((c_custkey*7919)%1000) AS mxx,
                    min((c_custkey*104729)%1000) AS mny,
                    max((c_custkey*104729)%1000) AS mxy
             FROM customer GROUP BY 1)
           WHERE mnx <= 600 AND mxx >= 300 AND mny <= 1000 AND mxy >= 0)""",
    "sindex_probe" ->
      """SELECT c_custkey FROM customer
         WHERE (c_custkey*7919)%1000 BETWEEN 200 AND 700
           AND (c_custkey*104729)%1000 BETWEEN 300 AND 800""",
    "sjoin_lines_left" -> {
      // the same CLRS formulation, inlined into a LEFT JOIN's ON clause
      val d1 = "(a.ax1-a.ax0)*(b.by0-a.ay0) - (a.ay1-a.ay0)*(b.bx0-a.ax0)"
      val d2 = "(a.ax1-a.ax0)*(b.by1-a.ay0) - (a.ay1-a.ay0)*(b.bx1-a.ax0)"
      val d3 = "(b.bx1-b.bx0)*(a.ay0-b.by0) - (b.by1-b.by0)*(a.ax0-b.bx0)"
      val d4 = "(b.bx1-b.bx0)*(a.ay1-b.by0) - (b.by1-b.by0)*(a.ax1-b.bx0)"
      s"""WITH a AS (
           SELECT o_orderkey,
                  o_orderkey % 50 AS ax0, o_custkey % 50 AS ay0,
                  o_orderkey % 50 + (o_orderkey % 7 - 3) AS ax1,
                  o_custkey % 50 + ((o_custkey*3) % 7 - 3) AS ay1
           FROM orders
           WHERE NOT (o_orderkey % 7 = 3 AND (o_custkey*3) % 7 = 3)
         ),
         b AS (
           SELECT n_nationkey,
                  n_nationkey*2 AS bx0, (n_nationkey*7) % 50 AS by0,
                  n_nationkey*2 + 6 AS bx1,
                  (n_nationkey*7) % 50 + ((n_nationkey % 5)*3 - 6) AS by1
           FROM nation
         )
         SELECT a.o_orderkey, b.n_nationkey
         FROM a LEFT JOIN b ON (
              ((($d1)>0 AND ($d2)<0) OR (($d1)<0 AND ($d2)>0))
              AND ((($d3)>0 AND ($d4)<0) OR (($d3)<0 AND ($d4)>0))
           OR (($d1)=0 AND b.bx0 BETWEEN least(a.ax0,a.ax1) AND greatest(a.ax0,a.ax1)
                        AND b.by0 BETWEEN least(a.ay0,a.ay1) AND greatest(a.ay0,a.ay1))
           OR (($d2)=0 AND b.bx1 BETWEEN least(a.ax0,a.ax1) AND greatest(a.ax0,a.ax1)
                        AND b.by1 BETWEEN least(a.ay0,a.ay1) AND greatest(a.ay0,a.ay1))
           OR (($d3)=0 AND a.ax0 BETWEEN least(b.bx0,b.bx1) AND greatest(b.bx0,b.bx1)
                        AND a.ay0 BETWEEN least(b.by0,b.by1) AND greatest(b.by0,b.by1))
           OR (($d4)=0 AND a.ax1 BETWEEN least(b.bx0,b.bx1) AND greatest(b.bx0,b.bx1)
                        AND a.ay1 BETWEEN least(b.by0,b.by1) AND greatest(b.by0,b.by1))
         )"""
    },
    "sjoin_lines" -> sjoinLinesOracleSql,
    "sjoin_lines_skewed" -> sjoinLinesSkewedOracleSql,
    "intersects_point_multipoint" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE (l_partkey%10 = l_orderkey%10 AND l_suppkey%10 = l_partkey%10)
            OR (l_partkey%10 = l_suppkey%10 AND l_suppkey%10 = l_orderkey%10)""",
    "length_penup" ->
      """SELECT l_orderkey,
         sqrt( CAST((l_suppkey%1000)-(l_orderkey%1000) AS DOUBLE)*((l_suppkey%1000)-(l_orderkey%1000))
             + CAST(((l_orderkey*7)%1000)-(l_partkey%1000) AS DOUBLE)*(((l_orderkey*7)%1000)-(l_partkey%1000)) )
         + sqrt( CAST(((l_orderkey*13)%1000)-((l_partkey*3)%1000) AS DOUBLE)*(((l_orderkey*13)%1000)-((l_partkey*3)%1000))
             + CAST(((l_partkey*17)%1000)-((l_suppkey*11)%1000) AS DOUBLE)*(((l_partkey*17)%1000)-((l_suppkey*11)%1000)) )
         AS len
         FROM lineitem WHERE l_linenumber = 1""",
    "fillna_points" ->
      """SELECT c_custkey,
         CASE WHEN c_custkey%7=0 THEN -1.0 ELSE CAST((c_custkey*7919)%1000 AS DOUBLE) END AS fx,
         CASE WHEN c_custkey%7=0 THEN -1.0 ELSE CAST((c_custkey*104729)%1000 AS DOUBLE) END AS fy
         FROM customer""",
    "iloc_slice_points" ->
      """WITH pts AS (
           SELECT c_custkey,
                  CAST((c_custkey * 7919) % 1000 AS DOUBLE) AS px,
                  CAST((c_custkey * 104729) % 1000 AS DOUBLE) AS py
           FROM customer),
         r AS (
           SELECT c_custkey, px, py,
                  row_number() OVER (ORDER BY px, py, c_custkey) - 1 AS pos
           FROM pts)
         SELECT c_custkey, px, py, 'slice' AS which FROM r
         WHERE pos >= 10 AND pos < 400 AND (pos - 10) % 7 = 0
         UNION ALL
         SELECT c_custkey, px, py, 'take' AS which FROM r
         WHERE pos IN (0, 1, 5, 99)""",
    "geom_sort_rank" ->
      """SELECT l_orderkey,
                row_number() OVER (ORDER BY
                  [CAST(l_orderkey%7 AS DOUBLE), CAST(l_partkey%7 AS DOUBLE),
                   CAST(l_suppkey%7 AS DOUBLE), CAST((l_orderkey*3)%7 AS DOUBLE)],
                  l_orderkey) AS rnk
         FROM lineitem WHERE l_linenumber = 1""",
    "mpoly_boundary_len" ->
      """SELECT p_partkey, 16.0*((p_partkey%5)+1) AS blen FROM part""",
    "oriented_area" ->
      """SELECT p_partkey,
         4.0*((p_partkey%5)+1)*((p_partkey%5)+1) - 4.0*(p_partkey%5)*(p_partkey%5) AS area
         FROM part""",
    "boundary_length" ->
      """SELECT p_partkey,
         8.0*((p_partkey%5)+1) + 8.0*(p_partkey%5) AS blen
         FROM part""",
    "padna_points" ->
      """SELECT c_custkey,
         last_value(CASE WHEN c_custkey%7=0 THEN NULL
                         ELSE CAST((c_custkey*7919)%1000 AS DOUBLE) END IGNORE NULLS)
           OVER (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fx,
         last_value(CASE WHEN c_custkey%7=0 THEN NULL
                         ELSE CAST((c_custkey*104729)%1000 AS DOUBLE) END IGNORE NULLS)
           OVER (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fy
         FROM customer""",
    "backfillna_points" ->
      """SELECT c_custkey,
         first_value(CASE WHEN c_custkey%7=0 THEN NULL
                          ELSE CAST((c_custkey*7919)%1000 AS DOUBLE) END IGNORE NULLS)
           OVER (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fx,
         first_value(CASE WHEN c_custkey%7=0 THEN NULL
                          ELSE CAST((c_custkey*104729)%1000 AS DOUBLE) END IGNORE NULLS)
           OVER (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fy
         FROM customer""",
    "intersects_point_line" ->
      """SELECT c_custkey FROM customer
         WHERE (c_custkey*7919)%1000 = (c_custkey*104729)%1000""",
    "wkt_points" ->
      """SELECT c_custkey,
                'POINT (' || ((c_custkey*7919)%1000) || ' ' || ((c_custkey*104729)%1000) || ')' AS wkt
         FROM customer WHERE c_custkey % 10 = 0""",
    "geojson_points" ->
      """SELECT c_custkey,
                '{"type":"Point","coordinates":[' || ((c_custkey*7919)%1000) || ','
                  || ((c_custkey*104729)%1000) || ']}' AS gj
         FROM customer WHERE c_custkey % 10 = 0""",
    "wkb_roundtrip" ->
      s"""WITH pts AS (
           SELECT c_custkey, (c_custkey*7919)%1000 AS px, (c_custkey*104729)%1000 AS py
           FROM customer WHERE c_custkey % 10 = 0),
         b AS (SELECT c_custkey, px, py,
                 lower(lpad(to_hex(${wkbBitsSql("px")}),16,'0')) AS hx,
                 lower(lpad(to_hex(${wkbBitsSql("py")}),16,'0')) AS hy
               FROM pts)
         SELECT c_custkey, CAST(px AS DOUBLE) AS px2, CAST(py AS DOUBLE) AS py2,
                '0101000000' || ${leHexSql("hx")} || ${leHexSql("hy")} AS wkb_hex
         FROM b""",
    // the round-trip must reproduce the source table exactly — any
    // JSON escaping/inference loss shows up as a hash mismatch
    "jsonl_roundtrip" ->
      "SELECT doc_id, length(text) AS text_len, md5(text) AS text_md5 FROM documents",
    "csv_roundtrip" ->
      "SELECT doc_id, lang, length(text) AS text_len, md5(text) AS text_md5 FROM documents",
    "orc_roundtrip" ->
      "SELECT doc_id, lang, length(text) AS text_len, md5(text) AS text_md5 FROM documents",
    "jsonl_gzip_roundtrip" ->
      "SELECT doc_id, length(text) AS text_len, md5(text) AS text_md5 FROM documents",
    "xml_roundtrip" ->
      "SELECT doc_id, lang, length(text) AS text_len, md5(text) AS text_md5 FROM documents",
    "sql_surface" ->
      """SELECT p_partkey,
                4.0*((p_partkey%5)+1)*((p_partkey%5)+1) AS area,
                8.0*((p_partkey%5)+1) AS perim,
                (p_partkey*7919)%1000 - ((p_partkey%5)+1) <= 700
                  AND (p_partkey*7919)%1000 + ((p_partkey%5)+1) >= 300
                  AND (p_partkey*104729)%1000 - ((p_partkey%5)+1) <= 700
                  AND (p_partkey*104729)%1000 + ((p_partkey%5)+1) >= 300 AS hits
         FROM part""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS qty, count(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "grouping_sets_agg" ->
      """SELECT lang, source, grouping(lang) * 2 + grouping(source) AS gid,
                count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
         FROM documents
         GROUP BY GROUPING SETS ((lang), (source), ())""",
    "ntile_length_quartiles" ->
      """SELECT tile, count(*) AS n, min(n_chars) AS min_chars,
                max(n_chars) AS max_chars
         FROM (SELECT doc_id, n_chars,
                      ntile(4) OVER (ORDER BY n_chars, doc_id) AS tile
               FROM documents)
         GROUP BY tile""",
    "global_rank_stats" ->
      """SELECT doc_id,
                CAST(rank() OVER (ORDER BY n_chars) AS BIGINT) AS rank,
                CAST(dense_rank() OVER (ORDER BY n_chars) AS BIGINT)
                  AS dense_rank,
                percent_rank() OVER (ORDER BY n_chars) AS percent_rank,
                cume_dist() OVER (ORDER BY n_chars) AS cume_dist
         FROM documents WHERE n_chars IS NOT NULL""",
    "observed_quality_counters" ->
      """SELECT count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars,
                count(CASE WHEN lang = 'en' THEN 1 END) AS n_en
         FROM documents""",
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                         (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_i
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING'
           AND c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1998-06-01'
           AND l_shipdate > TIMESTAMP '1998-06-01'
         GROUP BY 1, 2, 3
         ORDER BY revenue_i DESC, l_orderkey
         LIMIT 10""",
    "geo_area_by_nation" ->
      """SELECT n_name,
                CAST(sum(2 * r * r) AS BIGINT) AS area_sum,
                count(*) AS n
         FROM (SELECT s_nationkey, (s_suppkey % 25) * 2 + 21 AS r
               FROM supplier)
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",
    "q5_local_supplier" ->
      """SELECT n_name,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                         (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_i
         FROM lineitem, supplier, orders, customer, nation, region
         WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND s_nationkey = c_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
         FROM (SELECT l_orderkey,
                      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING sum(CAST(l_quantity AS BIGINT)) > 150) b
         JOIN orders ON b.l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey""",
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                         (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_i
         FROM lineitem, supplier, orders, customer, nation sn, nation cn
         WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey
           AND s_nationkey = sn.n_nationkey AND c_nationkey = cn.n_nationkey
           AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') OR
                (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3""",
    "q8_market_share" ->
      """SELECT o_year, nation_rev_i, total_rev_i,
                CAST(nation_rev_i * 1000 // total_rev_i AS BIGINT)
                  AS share_permille
         FROM (
           SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                  CAST(sum(CASE WHEN sn.n_name = 'NATION_6' THEN rev ELSE 0 END)
                       AS BIGINT) AS nation_rev_i,
                  CAST(sum(rev) AS BIGINT) AS total_rev_i
           FROM (SELECT l_orderkey, l_partkey, l_suppkey,
                        CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
                 FROM lineitem) l
           JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
           JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY 1)""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                           (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS BIGINT) AS total_rev_i
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_rev_i
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_rev_i = (SELECT max(total_rev_i) FROM rev)""",
    "q17_small_quantity" ->
      """WITH li AS (
           SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#1'),
         per AS (
           SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS sq,
                  count(*) AS cq
           FROM li GROUP BY 1)
         SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS rev_cents_i
         FROM li JOIN per ON l_partkey = pk
         WHERE qty * 5 * cq < sq""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                         (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_i
         FROM lineitem, orders, customer, nation
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n_nationkey
           AND l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
         GROUP BY 1, 2, 3
         ORDER BY revenue_i DESC, c_custkey
         LIMIT 20""",
    "q14_promo_share" ->
      """SELECT promo_rev_i, total_rev_i,
                CAST(promo_rev_i * 1000 // total_rev_i AS BIGINT)
                  AS promo_permille
         FROM (
           SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                       AS BIGINT) AS promo_rev_i,
                  CAST(sum(rev) AS BIGINT) AS total_rev_i
           FROM (SELECT l_partkey,
                        CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                   AND l_shipdate < TIMESTAMP '1997-04-01') l
           JOIN part ON l_partkey = p_partkey)""",
    "q19_disjunctive" ->
      """SELECT count(*) AS n,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                         (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_i
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45
                AND l_quantity BETWEEN 20 AND 30)""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-07-01'
           AND o_orderdate < TIMESTAMP '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority""",
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT JOIN orders ON c_custkey = o_custkey
               GROUP BY c_custkey)
         GROUP BY c_count""",
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                          CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                  AS revenue_i,
                count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
           AND l_quantity < 24""",
    "q21_waiting_supplier" ->
      """WITH late AS (
           SELECT l_orderkey, l_suppkey
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
         SELECT s_name, count(*) AS numwait
         FROM late l1
         JOIN supplier ON l1.l_suppkey = s_suppkey
         WHERE EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM late l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey)
         GROUP BY s_name""",
    "q12_ship_priority" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= 60
                     THEN 'slow' ELSE 'fast' END AS ship_band,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT)
                  AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1""",
    "q20_promotion_suppliers" ->
      """WITH qualified AS (
           SELECT DISTINCT l_suppkey
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           WHERE p_name LIKE 'small %'
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY l_suppkey, l_partkey
           HAVING sum(CAST(l_quantity AS BIGINT)) > 50)
         SELECT s_name, n_name
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         WHERE s_suppkey IN (SELECT l_suppkey FROM qualified)""",
    "q22_idle_suppliers" ->
      """WITH sup AS (
           SELECT s_suppkey, s_nationkey,
                  CAST(round(s_acctbal * 100) AS BIGINT) AS cents
           FROM supplier),
         tot AS (
           SELECT CAST(sum(cents) AS BIGINT) AS tc, count(*) AS nc
           FROM sup WHERE cents > 0)
         SELECT n_name, count(*) AS numcust,
                CAST(sum(cents) AS BIGINT) AS totacctbal_i
         FROM sup CROSS JOIN tot
         JOIN nation ON s_nationkey = n_nationkey
         WHERE cents * nc > tc
           AND NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_suppkey = s_suppkey
                             AND l_shipdate >= TIMESTAMP '2001-11-01')
         GROUP BY n_name""",
    "hive_partition_prune" ->
      """SELECT lang, count(*) AS n,
                CAST(sum(length(text)) AS BIGINT) AS chars
         FROM documents
         WHERE lang IN ('en', 'fr')
         GROUP BY lang""",
    "merge_schema_read" ->
      """SELECT lang, count(*) AS n,
                count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
                CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
                  AS chars
         FROM documents
         GROUP BY lang""",
    "compact_small_files" ->
      """SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
                CAST(sum(length(text)) AS BIGINT) AS chars
         FROM documents""",
    "interarrival_histogram" ->
      """SELECT CAST(length(bin(greatest(gap_ns, 1))) - 1 AS BIGINT)
                  AS log2_gap_ns,
                count(*) AS n
         FROM (SELECT (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id))
                       - epoch_us(ts)) * 1000 AS gap_ns
               FROM events)
         WHERE gap_ns IS NOT NULL
         GROUP BY 1""",
    "rfm_segments" ->
      """WITH pm AS (
           SELECT user_id, epoch_us(max(ts)) AS rec, count(*) AS freq,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS mon
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id),
         qs AS (
           SELECT quantile_disc(rec, 0.25) AS r25, quantile_disc(rec, 0.75) AS r75,
                  quantile_disc(freq, 0.25) AS f25, quantile_disc(freq, 0.75) AS f75,
                  quantile_disc(mon, 0.25) AS m25, quantile_disc(mon, 0.75) AS m75
           FROM pm)
         SELECT 1 + CAST(rec > r25 AS INT) + CAST(rec > r75 AS INT) AS r_bucket,
                1 + CAST(freq > f25 AS INT) + CAST(freq > f75 AS INT) AS f_bucket,
                1 + CAST(mon > m25 AS INT) + CAST(mon > m75 AS INT) AS m_bucket,
                count(*) AS n
         FROM pm CROSS JOIN qs
         GROUP BY 1, 2, 3""",
    // streaming twin pinned to the SAME batch oracle val — the
    // unification property as a checked hash gate
    "stream_scd2" -> scd2Oracle,
    "scd2_user_states" -> scd2Oracle,
    "event_transitions" ->
      """SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
         FROM (SELECT event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS next_type
               FROM events)
         WHERE next_type IS NOT NULL
         GROUP BY 1, 2""",
    "join_agg_nation" ->
      """SELECT n_name, count(*) AS n, sum(l_quantity) AS qty
         FROM lineitem, orders, customer, nation
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n_nationkey
         GROUP BY n_name""",
    "bloom_join_orders" ->
      """SELECT c_custkey, count(*) AS n_orders, max(o_orderkey) AS max_ok
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_custkey % 13 = 0
         GROUP BY c_custkey""",
    "q2_min_cost_supplier" ->
      s"""WITH $PartsuppCte,
         eur AS (
           SELECT s_suppkey, n_name
           FROM supplier, nation, region
           WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             AND r_name = 'EUROPE'),
         ps AS (
           SELECT ps_partkey, ps_suppkey, n_name, ps_supplycost_i
           FROM partsupp JOIN eur ON ps_suppkey = s_suppkey),
         mc AS (
           SELECT ps_partkey, min(ps_supplycost_i) AS min_cost_i
           FROM ps GROUP BY 1)
         SELECT p_partkey, p_brand, ps_suppkey, n_name,
                CAST(mc.min_cost_i AS BIGINT) AS min_cost_i
         FROM ps JOIN mc USING (ps_partkey)
              JOIN part ON ps_partkey = p_partkey
         WHERE ps_supplycost_i = mc.min_cost_i AND p_size <= 15""",
    "q9_product_profit" ->
      s"""WITH $PartsuppCte
         SELECT n_name AS nation,
                CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                         (100 - CAST(round(l_discount * 100) AS BIGINT)) -
                         ps_supplycost_i * CAST(l_quantity AS BIGINT) * 100)
                     AS BIGINT) AS profit_i
         FROM lineitem, part, partsupp, orders, supplier, nation
         WHERE p_partkey = l_partkey AND p_name LIKE '%cold%'
           AND ps_partkey = l_partkey AND ps_suppkey = l_suppkey
           AND o_orderkey = l_orderkey
           AND s_suppkey = l_suppkey AND n_nationkey = s_nationkey
         GROUP BY 1, 2""",
    "q11_important_stock" ->
      s"""WITH $PartsuppCte,
         pp AS (
           SELECT ps_partkey,
                  CAST(sum(ps_supplycost_i * ps_availqty) AS BIGINT) AS value_i
           FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
           WHERE s_nationkey % 2 = 0
           GROUP BY 1),
         tt AS (SELECT CAST(sum(value_i) AS BIGINT) AS total_i,
                       count(*) AS np FROM pp)
         SELECT ps_partkey, value_i FROM pp, tt
         WHERE value_i * np > total_i * 2""",
    "q16_parts_supplier_cnt" ->
      s"""WITH $PartsuppCte
         SELECT p_brand, p_type, p_size,
                count(DISTINCT ps_suppkey) AS supplier_cnt
         FROM partsupp JOIN part ON ps_partkey = p_partkey
         WHERE p_brand <> 'Brand#13' AND p_size % 2 = 0
           AND ps_suppkey NOT IN
               (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 7)
         GROUP BY 1, 2, 3""",
    "zorder_numeric_prune" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
         FROM documents
         WHERE n_chars BETWEEN 100 AND 2000 AND doc_id BETWEEN 50 AND 250
         GROUP BY lang""",
    "zorder_multi_prune" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM lineitem
         WHERE l_quantity BETWEEN 10 AND 30
           AND l_discount BETWEEN 0.02 AND 0.06
           AND l_extendedprice BETWEEN 10000 AND 40000
         GROUP BY l_returnflag""",
    "zorder_append_prune" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM lineitem
         WHERE l_quantity BETWEEN 20 AND 40
           AND l_discount BETWEEN 0.01 AND 0.05
           AND l_extendedprice BETWEEN 20000 AND 60000
         GROUP BY l_returnflag""",
    // each generation snapshot = the orderkey residues committed so far
    "zorder_time_travel" ->
      """SELECT g AS gen, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM (SELECT unnest([0, 1, 2]) AS g)
         CROSS JOIN lineitem
         WHERE l_orderkey % 3 <= g
           AND l_quantity BETWEEN 10 AND 35
         GROUP BY g""",
    // generation g == stream prefix 0..g — the zorder_time_travel
    // oracle verbatim (one micro-batch per generation)
    "stream_zorder_travel" ->
      """SELECT g AS gen, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM (SELECT unnest([0, 1, 2]) AS g)
         CROSS JOIN lineitem
         WHERE l_orderkey % 3 <= g
           AND l_quantity BETWEEN 10 AND 35
         GROUP BY g""",
    // five generations over %4 slices: gens 0-2 = prefix snapshots,
    // gen 3 = the compaction rewrite (rows_added counts what it
    // REWROTE, the snapshot equals gen 2's), gen 4 = the last append
    "zorder_stats_history" ->
      """SELECT 0 AS gen, 0 AS is_rewrite,
                (SELECT count(*) FROM lineitem WHERE l_orderkey % 4 = 0) AS rows_added,
                count(*) AS n, min(l_extendedprice) AS emin,
                max(l_extendedprice) AS emax
         FROM lineitem WHERE l_orderkey % 4 <= 0
         UNION ALL
         SELECT 1, 0,
                (SELECT count(*) FROM lineitem WHERE l_orderkey % 4 = 1),
                count(*), min(l_extendedprice), max(l_extendedprice)
         FROM lineitem WHERE l_orderkey % 4 <= 1
         UNION ALL
         SELECT 2, 0,
                (SELECT count(*) FROM lineitem WHERE l_orderkey % 4 = 2),
                count(*), min(l_extendedprice), max(l_extendedprice)
         FROM lineitem WHERE l_orderkey % 4 <= 2
         UNION ALL
         SELECT 3, 1,
                (SELECT count(*) FROM lineitem WHERE l_orderkey % 4 <= 2),
                count(*), min(l_extendedprice), max(l_extendedprice)
         FROM lineitem WHERE l_orderkey % 4 <= 2
         UNION ALL
         SELECT 4, 0,
                (SELECT count(*) FROM lineitem WHERE l_orderkey % 4 = 3),
                count(*), min(l_extendedprice), max(l_extendedprice)
         FROM lineitem""",
    // windows: (0,2] = the two appends; (2,3] = compaction only (a
    // rewrite — EMPTY for a change consumer); (3,4] = the last append
    "zorder_changes_read" ->
      """SELECT 1 AS win, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM lineitem
         WHERE l_orderkey % 4 IN (1, 2) AND l_quantity BETWEEN 10 AND 35
         UNION ALL
         SELECT 2 AS win, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM lineitem WHERE 1 = 0
         UNION ALL
         SELECT 3 AS win, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM lineitem
         WHERE l_orderkey % 4 = 3 AND l_quantity BETWEEN 10 AND 35""",
    // gen 3 is the COMPACTED head: same content as gen 2 from fewer
    // files, so its oracle slice is gen 2's (least(g, 2))
    "zorder_compact_travel" ->
      """SELECT g AS gen, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty,
                min(l_extendedprice) AS price_min,
                max(l_extendedprice) AS price_max
         FROM (SELECT unnest([1, 2, 3]) AS g)
         CROSS JOIN lineitem
         WHERE l_orderkey % 3 <= least(g, 2)
           AND l_quantity BETWEEN 10 AND 35
         GROUP BY g""",
    "set_ops_counts" ->
      """SELECT count(*) AS n, 'active' AS which
         FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
         UNION ALL
         SELECT count(*) AS n, 'inactive' AS which
         FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)""",
    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(*) AS n, min(value) AS vmin, max(value) AS vmax
         FROM events GROUP BY 1, 2""",
    "events_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
         w AS (SELECT unnest([us - (us % 1800000000),
                              us - (us % 1800000000) - 1800000000]) AS ws,
                      event_type, value
               FROM e)
         SELECT make_timestamp(ws) AS win_start, event_type,
                count(*) AS n, min(value) AS vmin, max(value) AS vmax
         FROM w GROUP BY 1, 2""",
    "stream_stream_join" ->
      """SELECT c.event_id AS click_id, p.ts AS p_ts, p.value AS p_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') c
         JOIN (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts - INTERVAL 1 HOUR
          AND p.ts <= c.ts""",
    // the LEFT JOIN twin: unmatched clicks carry NULL p_ts/p_value —
    // exactly the rows the streaming side may only emit after the
    // watermark passes their match window
    "stream_stream_left_join" ->
      """SELECT c.event_id AS click_id, p.ts AS p_ts, p.value AS p_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') c
         LEFT JOIN (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts - INTERVAL 1 HOUR
          AND p.ts <= c.ts""",
    // the streaming as-of twin replays asof_join_tol's semantics over
    // MICROS-truncated event times (the engine's watermark clock):
    // DuckDB's native ASOF JOIN picks the latest at-or-before purchase,
    // the CASE nulls it past 6h = 21_600e6 us. Purchases collapse to
    // one row per (user, us) FIRST — the engine's fold breaks an
    // equal-timestamp tie deterministically (highest event_id folds
    // last and wins), while ASOF JOIN's choice among ties is
    // engine-arbitrary; the rn = 1 pre-collapse replays the same
    // tie-break instead of trusting it
    "stream_asof_enrich" ->
      """WITH c AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                    FROM events WHERE event_type = 'click'
                      AND user_id IS NOT NULL),
            p AS (SELECT user_id AS p_user, us, value FROM (
                    SELECT user_id, epoch_ns(ts) // 1000 AS us, value,
                           row_number() OVER (
                             PARTITION BY user_id, epoch_ns(ts) // 1000
                             ORDER BY event_id DESC) AS rn
                    FROM events WHERE event_type = 'purchase'
                      AND user_id IS NOT NULL AND value IS NOT NULL)
                  WHERE rn = 1)
         SELECT c.event_id,
                CASE WHEN c.us - r.us <= 21600000000 THEN r.value END
                  AS prior_value
         FROM c ASOF LEFT JOIN p r
           ON c.user_id = r.p_user AND c.us >= r.us""",
    // the forward twin: earliest at-or-after purchase, ties at an equal
    // (user, us) collapse to the LOWEST event_id (the engine folds
    // purchases in id order and the first one resolves the waiting
    // clicks), CASE nulls past 6h
    "stream_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                    FROM events WHERE event_type = 'click'
                      AND user_id IS NOT NULL),
            p AS (SELECT user_id AS p_user, us, value FROM (
                    SELECT user_id, epoch_ns(ts) // 1000 AS us, value,
                           row_number() OVER (
                             PARTITION BY user_id, epoch_ns(ts) // 1000
                             ORDER BY event_id ASC) AS rn
                    FROM events WHERE event_type = 'purchase'
                      AND user_id IS NOT NULL AND value IS NOT NULL)
                  WHERE rn = 1)
         SELECT c.event_id,
                CASE WHEN r.us - c.us <= 21600000000 THEN r.value END
                  AS next_value
         FROM c ASOF LEFT JOIN p r
           ON c.user_id = r.p_user AND c.us <= r.us""",
    // the FULL JOIN twin: unmatched purchases appear with NULL click_id
    "stream_stream_full_join" ->
      """SELECT c.event_id AS click_id, p.ts AS p_ts, p.value AS p_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') c
         FULL JOIN (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts - INTERVAL 1 HOUR
          AND p.ts <= c.ts""",
    "events_sliding_stream" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
         w AS (SELECT unnest([us - (us % 1800000000),
                              us - (us % 1800000000) - 1800000000]) AS ws,
                      event_type, value
               FROM e)
         SELECT make_timestamp(ws) AS win_start, event_type,
                count(*) AS n, min(value) AS vmin, max(value) AS vmax
         FROM w GROUP BY 1, 2""",
    // the streaming twin replays the same grid-into-ASOF shape on the
    // MICROS clock (the engine's timestamp grain): hour floors and
    // tie collapse on epoch_ns // 1000, otherwise identical
    "stream_resample_ffill" ->
      """WITH b AS (SELECT (((min(epoch_ns(ts)) // 1000)) // 3600000000)
                             * 3600000000 AS h0,
                           (((max(epoch_ns(ts)) // 1000)) // 3600000000)
                             * 3600000000 AS h1
                    FROM events WHERE user_id IS NOT NULL),
            u AS (SELECT DISTINCT user_id FROM events, b
                  WHERE user_id IS NOT NULL
                    AND epoch_ns(ts) // 1000 <= b.h1),
            grid AS (SELECT u.user_id,
                            unnest(generate_series(b.h0, b.h1,
                                   3600000000)) AS t
                     FROM u, b),
            e AS (SELECT user_id, us, value FROM (
                    SELECT user_id, epoch_ns(ts) // 1000 AS us, value,
                           row_number() OVER (
                             PARTITION BY user_id, epoch_ns(ts) // 1000
                             ORDER BY event_id DESC) AS rn
                    FROM events WHERE user_id IS NOT NULL)
                  WHERE rn = 1)
         SELECT g.user_id, make_timestamp(g.t) AS hour,
                e.value AS last_value
         FROM grid g ASOF LEFT JOIN e
           ON g.user_id = e.user_id AND g.t >= e.us""",
    // resample replay: per-user hourly grid via generate_series on the
    // ns clock (integer hour floor), equal-(user, ns) ties collapsed
    // to the highest event_id BEFORE the ASOF (its pick among exact
    // ties is engine-arbitrary), NULL users excluded on both engines
    "resample_ffill" ->
      """WITH b AS (SELECT (min(epoch_ns(ts)) // 3600000000000)
                             * 3600000000000 AS h0,
                           (max(epoch_ns(ts)) // 3600000000000)
                             * 3600000000000 AS h1
                    FROM events WHERE user_id IS NOT NULL),
            u AS (SELECT DISTINCT user_id FROM events
                  WHERE user_id IS NOT NULL),
            grid AS (SELECT u.user_id,
                            unnest(generate_series(b.h0, b.h1,
                                   3600000000000)) AS t
                     FROM u, b),
            e AS (SELECT user_id, ns, value FROM (
                    SELECT user_id, epoch_ns(ts) AS ns, value,
                           row_number() OVER (
                             PARTITION BY user_id, epoch_ns(ts)
                             ORDER BY event_id DESC) AS rn
                    FROM events WHERE user_id IS NOT NULL)
                  WHERE rn = 1)
         SELECT g.user_id, make_timestamp(g.t // 1000) AS hour,
                e.value AS last_value
         FROM grid g ASOF LEFT JOIN e
           ON g.user_id = e.user_id AND g.t >= e.ns""",
    // interpolation replay: identical grid (integer hour floor) and the
    // IDENTICAL IEEE operation sequence v0 + (v1-v0)*((t-t0)/(t1-t0)) —
    // every operand exact in double (ns diffs < 2^53), so the floats
    // must agree bit for bit
    "resample_interp" ->
      """WITH b AS (SELECT (min(epoch_ns(ts)) // 3600000000000)
                             * 3600000000000 AS h0,
                           (max(epoch_ns(ts)) // 3600000000000)
                             * 3600000000000 AS h1
                    FROM events WHERE user_id IS NOT NULL),
            u AS (SELECT DISTINCT user_id FROM events
                  WHERE user_id IS NOT NULL),
            grid AS (SELECT u.user_id,
                            unnest(generate_series(b.h0, b.h1,
                                   3600000000000)) AS t
                     FROM u, b),
            e AS (SELECT user_id, ns, value FROM (
                    SELECT user_id, epoch_ns(ts) AS ns, value,
                           row_number() OVER (
                             PARTITION BY user_id, epoch_ns(ts)
                             ORDER BY event_id DESC) AS rn
                    FROM events WHERE user_id IS NOT NULL)
                  WHERE rn = 1),
            back AS (
              SELECT g.user_id, g.t, e.ns AS t0, e.value AS v0
              FROM grid g ASOF LEFT JOIN e
                ON g.user_id = e.user_id AND g.t >= e.ns),
            bb AS (
              SELECT bk.user_id, bk.t, bk.t0, bk.v0,
                     e.ns AS t1, e.value AS v1
              FROM back bk ASOF LEFT JOIN e
                ON bk.user_id = e.user_id AND bk.t <= e.ns)
         SELECT user_id, t,
                CASE WHEN t0 IS NULL OR t1 IS NULL THEN NULL
                     WHEN t1 = t0 THEN v0
                     ELSE v0 + (v1 - v0) *
                          (CAST(t - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
                END AS v_interp
         FROM bb""",
    "rolling_user_counts" ->
      """SELECT event_id,
                count(*) OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                        AND CURRENT ROW) AS n_prev_hour
         FROM events""",
    // the ordered running sum replayed as a window; per-bucket max is
    // tie-order-invariant, so the two engines' arbitrary orders among
    // equal (t, delta) rows cannot diverge
    "interval_concurrency" ->
      """WITH d AS (
           SELECT epoch_ns(ts) // 1000 AS t, 1 AS delta FROM events
           WHERE ts IS NOT NULL
           UNION ALL
           SELECT epoch_ns(ts) // 1000 + 1800000000 AS t, -1 AS delta
           FROM events WHERE ts IS NOT NULL),
         r AS (SELECT t,
                      CAST(sum(delta) OVER (ORDER BY t, delta
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS gauge
               FROM d)
         SELECT t // 3600000000 AS hour_bucket, max(gauge) AS peak,
                count(*) AS n_points
         FROM r GROUP BY 1""",
    // copies share the fingerprint with a later event time; all corpus
    // texts are distinct — so first-seen keeps exactly the originals
    "stream_dedup_first_seen" ->
      "SELECT doc_id FROM documents",
    // the streamed-in landing dataset must answer the box query exactly
    // like the batch table
    "stream_geoparquet_sink" ->
      """SELECT c_custkey,
         CAST((c_custkey*7919)%1000 AS DOUBLE) AS px,
         CAST((c_custkey*104729)%1000 AS DOUBLE) AS py
         FROM customer
         WHERE (c_custkey*7919)%1000 BETWEEN 100 AND 600
           AND (c_custkey*104729)%1000 BETWEEN 100 AND 600""",
    // md5-threshold sample ∩ not-8-gram-contaminated, replayed relationally
    "stream_ingest_filter" ->
      s"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
           FROM documents),
         grams AS (
           SELECT doc_id,
                  [array_to_string(w[i:i+7], ' ')
                   for i in range(1, len(w)-6)] AS g
           FROM toks),
         eg AS (SELECT DISTINCT unnest(g) AS gram FROM grams
                WHERE doc_id % 10 = 0),
         cont AS (SELECT DISTINCT doc_id
                  FROM (SELECT doc_id, unnest(g) AS gram FROM grams) t
                  JOIN eg USING (gram))
         SELECT doc_id FROM documents
         WHERE substr(md5(concat_ws('|','ingest',
                 CAST(doc_id AS VARCHAR))),1,8)
                 < '${graft.pipeline.Sampling.thresholdHex(0.5)}'
           AND doc_id NOT IN (SELECT doc_id FROM cont)""",
    // built-in watermark dedup: one survivor per distinct text (which
    // doc_id survives is engine-arbitrary; the key set is not)
    "stream_dedup_watermark" ->
      "SELECT DISTINCT text FROM documents",
    // the streaming twin must land on the identical rollup (tumbling
    // 1-hour windows are epoch-aligned == date_trunc)
    "events_hourly_stream" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(*) AS n, min(value) AS vmin, max(value) AS vmax
         FROM events GROUP BY 1, 2""",
    // the chained dedup->window streaming run must land on the exact
    // relational distinct count
    "stream_distinct_users" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(DISTINCT user_id) AS distinct_users
         FROM events GROUP BY 1, 2""",
    "event_sessions" -> eventSessionsOracle,
    "event_sessions_dynamic" -> eventSessionsDynamicOracle,
    // the streaming twin shares the SAME oracle val — batch/streaming
    // unification for the dynamic-gap session operator
    "event_sessions_dynamic_stream" -> eventSessionsDynamicOracle,
    "event_sessions_stream_state" -> eventSessionsOracle,
    "rate_limit_hourly" -> rateLimitOracle,
    "stream_rate_limit" -> rateLimitOracle,
    // the streaming session_window run must land on the same sessions
    "event_sessions_stream" -> eventSessionsOracle,
    // the stream-static anti-join must keep the same survivors as the
    // batch incremental_dedup twin (same oracle text)
    "stream_incremental_dedup" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         fresh AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
           UNION ALL
           SELECT doc_id + 200000, text FROM documents
           WHERE doc_id % 3 = 0 AND doc_id % 2 = 0)
         SELECT f.doc_id FROM fresh f
         WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = f.text)""",
    "vocab_stats" ->
      """SELECT count(DISTINCT tok) AS vocab, count(*) AS total_tokens
         FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents)""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt
         FROM documents GROUP BY text""",
    "token_stats" ->
      """SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS tokens,
                length(text) AS chars
         FROM documents"""
  )
}
