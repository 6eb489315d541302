package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("foreachBatch near-dedup matches the batch operator across micro-batch splits") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely different words about spark query engines formats")
    ).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today xnear"), // near-dup of 1
      (11L, "unrelated content mentioning hilbert curves rtrees parquet"),
      (12L, "completely different words about spark query engines formats xnear"), // near-dup of 2
      (13L, "another genuinely novel document with fresh vocabulary here")
    )
    val dir = java.nio.file.Files.createTempDirectory("neardedup").toFile
    try {
      // two source files + maxFilesPerTrigger=1 => two micro-batches;
      // per-batch application must still equal the one-shot batch run
      // (each doc compares only to the static corpus)
      for ((part, name) <- Seq(newDocs.take(2) -> "a", newDocs.drop(2) -> "b")) {
        part.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/raw_$name")
        val f = new java.io.File(s"$dir/raw_$name").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        org.apache.commons.io.FileUtils.copyFile(f,
          new java.io.File(s"$dir/in/$name.parquet"))
      }
      val schema = spark.read.parquet(s"$dir/in").schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val q = src.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.pipeline.Dedup.dedupNearAgainstCorpus(batch, corpus,
              "doc_id", "text", shingle = 3, threshold = 0.8)
            .select("doc_id")
            .write.mode("append").parquet(s"$dir/out")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = spark.read.parquet(s"$dir/out").as[Long].collect().toSet
      val batchRun = graft.pipeline.Dedup.dedupNearAgainstCorpus(
          newDocs.toDF("doc_id", "text"), corpus, "doc_id", "text",
          shingle = 3, threshold = 0.8)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batchRun && streamed == Set(11L, 13L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("streaming geo-parquet sink maintains the sidecar incrementally") {
    import graft.Geo._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("geosink").toFile
    try {
      val input = MemoryStream[(Long, Double, Double)]
      val pts = input.toDF().toDF("id", "x", "y")
        .withColumn("pt", st_point(col("x"), col("y")))
        .select("id", "pt")
      val q = Streams.geoParquetSink(pts, s"$dir/data", Seq("pt"),
        s"$dir/ckpt").start()
      try {
        // two spatially-separated micro-batches -> separate files
        input.addData((1L, 1.0, 1.0), (2L, 2.0, 2.0))
        q.processAllAvailable()
        input.addData((3L, 100.0, 100.0), (4L, 101.0, 101.0))
        q.processAllAvailable()
      } finally q.stop()
      // the sidecar must cover BOTH batches' files: a box over the first
      // batch returns only ids 1,2 after the exact residual...
      val low = graft.io.GeoParquet.read(spark, s"$dir/data", "pt", "point",
          bounds = Some((0.0, 0.0, 10.0, 10.0)))
        .cx(0, 0, 10, 10).df.select("id").as[Long].collect().toSet
      assert(low == Set(1L, 2L))
      // ...and the file-level prune alone (no residual) already drops
      // the second batch's files
      val prunedCount = graft.io.GeoParquet.read(spark, s"$dir/data", "pt", "point",
          bounds = Some((0.0, 0.0, 10.0, 10.0))).df.count()
      val total = spark.read.parquet(s"$dir/data").count()
      assert(total == 4 && prunedCount < total, s"no pruning: $prunedCount of $total")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("spatial-join rewrite fires on a stream-static st_intersects join") {
    import graft.Geo._
    // restore the shared session's optimizer state afterwards, so later
    // suites don't run under a leaked rule/cell-size configuration
    val prevRules = spark.experimental.extraOptimizations
    graft.plans.SpatialJoinRewrite.install(spark)
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.graft.sjoin.cellSize", "20.0")
    try {
    val input = MemoryStream[(Long, Double, Double)]
    val pts = input.toDF().toDF("event_id", "x", "y")
      .withColumn("pt", st_point(col("x"), col("y")))
      .select("event_id", "pt")
    val fences = Seq(
      (1L, Seq(Seq(0.0, 0, 20, 0, 20, 20, 0, 20, 0, 0))),
      (2L, Seq(Seq(40.0, 40, 60, 40, 60, 60, 40, 60, 40, 40)))).toDF("fence_id", "fence")
    // a PLAIN stream-static join with the spatial predicate — the
    // optimizer rule must turn it into the grid hash join in streaming
    val j = pts.join(fences, st_intersects(pts("pt"), fences("fence"), "polygon"))
    val q = j.select("event_id", "fence_id")
      .writeStream.format("memory").queryName("sjoin_stream_out")
      .outputMode("append").start()
    try {
      input.addData((100L, 10.0, 10.0), (101L, 50.0, 50.0), (102L, 90.0, 90.0))
      q.processAllAvailable()
      val hits = spark.table("sjoin_stream_out")
        .as[(Long, Long)].collect().toSet
      assert(hits == Set((100L, 1L), (101L, 2L)))
      val exec = spark.streams.active.find(_.id == q.id).get
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("NestedLoop") && !exec.contains("Cartesian"),
        s"nested loop in streaming plan:\n$exec")
      assert(exec.contains("HashJoin"), s"no hash join in streaming plan:\n$exec")
    } finally q.stop()
    } finally {
      spark.experimental.extraOptimizations = prevRules
      spark.conf.unset("spark.graft.sjoin.cellSize")
    }
  }

  test("spatial-join rewrite on a STREAMING point side under adaptiveSalt: no plan-time batch job, blanket salt, exact result") {
    import graft.Geo._
    // the r16-ADVICE streaming hazard: adaptiveSalt=true would run the
    // hot-cell detection count (a batch action) at plan time of a
    // streaming query — and streaming plans report huge sizeInBytes,
    // so the byte gate never saved it. The rule must skip detection
    // (and the honest gate's probe) for a streaming point side and
    // fall back to blanket salting.
    val prevRules = spark.experimental.extraOptimizations
    graft.plans.SpatialJoinRewrite.install(spark)
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.graft.sjoin.cellSize", "20.0")
    spark.conf.set("spark.graft.sjoin.salt", "4")
    spark.conf.set("spark.graft.sjoin.adaptiveSalt", "true")
    spark.conf.set("spark.graft.sjoin.adaptiveSalt.minBytes", "0")
    try {
      val input = MemoryStream[(Long, Double, Double)]
      val pts = input.toDF().toDF("event_id", "x", "y")
        .withColumn("pt", st_point(col("x"), col("y")))
        .select("event_id", "pt")
      val fences = Seq(
        (1L, Seq(Seq(0.0, 0, 20, 0, 20, 20, 0, 20, 0, 0))),
        (2L, Seq(Seq(40.0, 40, 60, 40, 60, 60, 40, 60, 40, 40)))).toDF("fence_id", "fence")
      val j = pts.join(fences, st_intersects(pts("pt"), fences("fence"), "polygon"))
      val runsBefore = graft.tools.SpatialJoin.detectionRuns.get()
      val probesBefore = graft.tools.SpatialJoin.probeRuns.get()
      val q = j.select("event_id", "fence_id")
        .writeStream.format("memory").queryName("sjoin_stream_adaptive")
        .outputMode("append").start()
      try {
        input.addData((100L, 10.0, 10.0), (101L, 50.0, 50.0), (102L, 90.0, 90.0))
        q.processAllAvailable()
        val hits = spark.table("sjoin_stream_adaptive")
          .as[(Long, Long)].collect().toSet
        assert(hits == Set((100L, 1L), (101L, 2L)))
      } finally q.stop()
      assert(graft.tools.SpatialJoin.detectionRuns.get() == runsBefore,
        "hot-cell detection ran at plan time of a STREAMING query")
      assert(graft.tools.SpatialJoin.probeRuns.get() == probesBefore,
        "the small-input probe ran at plan time of a STREAMING query")
    } finally {
      spark.experimental.extraOptimizations = prevRules
      Seq("spark.graft.sjoin.cellSize", "spark.graft.sjoin.salt",
        "spark.graft.sjoin.adaptiveSalt",
        "spark.graft.sjoin.adaptiveSalt.minBytes")
        .foreach(spark.conf.unset)
    }
  }

  test("ingestFilter: replay-stable sampling + decontamination per batch") {
    implicit val sc = spark.sqlContext
    val evalDocs = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    // enough-token docs; 10 and 11 contain an eval 8-gram
    val mk = (i: Long) =>
      (i, if (i % 10 == 0 || i % 10 == 1)
            s"x$i beta gamma delta epsilon zeta eta theta iota tail"
          else s"doc $i with its own completely distinct token payload $i")
    val input = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Seq[Long])]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val kept = Streams.ingestFilter(batch, "doc_id", "text",
            evalDocs, fraction = 0.5, salt = "t")
          .select("doc_id").as[Long].collect().toSeq.sorted
        seen.synchronized { seen += ((id, kept)) }; ()
      }.start()
    try {
      input.addData((0L until 40L).map(mk): _*)
      q.processAllAvailable()
      input.addData((0L until 40L).map(mk): _*) // replayed batch
      q.processAllAvailable()
    } finally q.stop()
    val batches = seen.sortBy(_._1).map(_._2)
    assert(batches.length == 2 && batches(0) == batches(1),
      "redelivered batch must keep exactly the same rows")
    assert(batches(0).nonEmpty && batches(0).size < 40)
    // contaminated ids never survive
    assert(!batches(0).exists(i => i % 10 == 0 || i % 10 == 1))
  }

  test("scrub ops are stateless streaming transforms (no foreachBatch)") {
    import graft.pipeline.Scrub
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counts = Scrub.piiCounts(col("text"))
    val out = input.toDF().toDF("id", "text")
      .select(col("id") +: counts.map { case (n, c) => c.as(n) } :+
        Scrub.redactPii(col("text")).as("red") :+
        Scrub.normalize(col("text")).as("norm"): _*)
    val q = out.writeStream.format("memory").queryName("scrub_stream").start()
    try {
      input.addData((1L, "Mail a@b.com NOW!!"), (2L, "clean row"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("scrub_stream")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(4), r.getString(5)))).toMap
    assert(rows(1L) == ((1, "Mail <EMAIL> NOW!!", "mail a b com now")))
    assert(rows(2L) == ((0, "clean row", "clean row")))
  }

  test("streaming dedupFirstSeen drops repeats across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = Streams.dedupFirstSeen(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: fp=10 twice (keep earliest), fp=20 once
      input.addData(DocEvent(1, 10, ts(0)), DocEvent(2, 10, ts(1)),
        DocEvent(3, 20, ts(2)))
      q.processAllAvailable()
      // batch 2: fp=10 again (drop — state persists), fp=30 new (keep)
      input.addData(DocEvent(4, 10, ts(3)), DocEvent(5, 30, ts(4)))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("docId").as[Long]
        .collect().toSet
      assert(kept == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("distinctPerWindow counts a cross-batch duplicate once and drops late data") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.distinctPerWindow(
        input.toDS().toDF("user_id", "ts", "event_type"), "user_id",
        windowDur = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("distinct_out")
      .outputMode("append").start()
    try {
      // batch 1: window [t0,t10) sees users 1 (twice, same type) and 2;
      // window [t10,t20) sees user 1 again — a NEW (user, window) pair.
      // Watermark after the batch: t11 - 10m = t1.
      input.addData((1L, ts(0), "click"), (1L, ts(5), "click"),
        (2L, ts(6), "click"), (1L, ts(11), "click"))
      q.processAllAvailable()
      // batch 2, ON TIME (>= t1): user 1 again in [t0,t10) — the
      // cross-batch duplicate the dedup state must drop — and user 3,
      // genuinely new in that window
      input.addData((1L, ts(2), "click"), (3L, ts(3), "click"))
      q.processAllAvailable()
      // batch 3: advance the watermark to t20 (closes [t0,t10))...
      input.addData((7L, ts(30), "click"))
      q.processAllAvailable()
      // ...then a LATE arrival for the closed window: must not re-emit
      // or change the count
      input.addData((4L, ts(5), "click"))
      q.processAllAvailable()
      // flush: far-future row closes every remaining real window
      input.addData((99L, ts(600), "flush"))
      q.processAllAvailable()
      val got = spark.table("distinct_out")
        .select(col("window.start"), col("event_type"), col("distinct_keys"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got.contains((ts(0), "click", 3L)), s"[t0,t10): $got") // users 1,2,3
      assert(got.contains((ts(10), "click", 1L)), s"[t10,t20): $got") // user 1 once
      assert(!got.exists(g => g._1 == ts(0) && g._3 != 3L), s"late rewrite: $got")
    } finally q.stop()
  }

  test("stream-stream left-outer join: matches emit promptly, null rows only after the watermark passes the match window") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDS().toDF("click_id", "user_id", "c_ts")
      .withWatermark("c_ts", "0 seconds")
    val p = purchases.toDS().toDF("p_user", "p_ts", "p_value")
      .withWatermark("p_ts", "0 seconds")
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
        col("p_ts") <= col("c_ts"), "left_outer")
      .select(col("click_id"), col("p_value"))
    val q = joined.writeStream.format("memory").queryName("loj_out")
      .outputMode("append").start()
    try {
      // batch 1: click 1 (user 1) has a purchase in its window; click 2
      // (user 2) has none. Global watermark after the batch is the MIN
      // of the two sides (t3) — below click 2's match window, so its
      // null row must NOT emit yet.
      clicks.addData((1L, 1L, ts(5)), (2L, 2L, ts(5)))
      purchases.addData((1L, ts(3), 7.0))
      q.processAllAvailable()
      val after1 = spark.table("loj_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toSet
      assert(after1.contains((1L, Some(7.0))), s"match missing: $after1")
      assert(!after1.exists(_._1 == 2L),
        s"null row emitted before the watermark proved no match: $after1")
      // batch 2: advance BOTH watermarks past click 2's window upper
      // bound (non-matching users, so the advance rows join nothing and
      // themselves stay unflushed at wm == their ts). The no-data batch
      // that follows must evict click 2 and emit its null row.
      clicks.addData((9L, 8L, ts(60)))
      purchases.addData((9L, ts(60), 0.0))
      q.processAllAvailable()
      val after2 = spark.table("loj_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toSet
      assert(after2.contains((2L, None)), s"null row not flushed: $after2")
      assert(after2 == after1 + ((2L, None)), s"unexpected extras: $after2")
    } finally q.stop()
  }

  test("asofEnrich binds an out-of-order cross-batch purchase and nulls past tolerance") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val q = Streams.asofEnrich(
        input.toDS().withWatermark("ts", "10 minutes"), tolerance = "10 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: click 10 at t5 arrives BEFORE the purchase that will
      // enrich it. Watermark after the batch = t5 - 10m, so nothing
      // folds (events hold until the watermark strictly passes them).
      input.addData(AsofEvent(1L, ts(5), 10L, "c", 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_out").isEmpty,
        "click emitted before the watermark passed it")
      // batch 2: the OUT-OF-ORDER purchase at t3 (on time: wm is still
      // t5 - 10m) must bind click 10 despite arriving a batch later;
      // click 11 at t30 is 27 min past the purchase — beyond tolerance.
      input.addData(AsofEvent(1L, ts(3), 1L, "p", 42.0),
        AsofEvent(1L, ts(30), 11L, "c", 0.0))
      q.processAllAvailable()
      // far-future drain on its own key: watermark jumps past all real
      // events and the timers flush every group
      input.addData(AsofEvent(-1L, ts(6000), -1L, "c", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_out")
        .where(col("eventId") =!= -1L)
        .collect().map(r => (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == Set((10L, Some(42.0)), (11L, None)), s"got $got")
    } finally q.stop()
  }

  test("asofEnrichForward binds a cross-batch future purchase and expires a click past tolerance") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val q = Streams.asofEnrichForward(
        input.toDS().withWatermark("ts", "10 minutes"), tolerance = "10 minutes")
      .writeStream.format("memory").queryName("asof_fwd_out")
      .outputMode("append").start()
    try {
      // batch 1: click 10 at t5 waits; click 11 at t6 waits too
      input.addData(AsofEvent(1L, ts(5), 10L, "c", 0.0),
        AsofEvent(1L, ts(6), 11L, "c", 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_fwd_out").isEmpty,
        "click resolved before the watermark passed anything")
      // batch 2: purchase at t8 (next for BOTH waiting clicks, within
      // tolerance of both); click 12 at t25 will find no purchase and
      // must expire to null at the drain
      input.addData(AsofEvent(1L, ts(8), 2L, "p", 99.0),
        AsofEvent(1L, ts(25), 12L, "c", 0.0))
      q.processAllAvailable()
      input.addData(AsofEvent(-1L, ts(6000), -1L, "c", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_fwd_out")
        .where(col("eventId") =!= -1L)
        .collect().map(r => (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == Set((10L, Some(99.0)), (11L, Some(99.0)), (12L, None)),
        s"got $got")
    } finally q.stop()
  }

  test("stream-stream full-outer join also flushes the unmatched RIGHT side after the watermark") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDS().toDF("click_id", "user_id", "c_ts")
      .withWatermark("c_ts", "0 seconds")
    val p = purchases.toDS().toDF("p_user", "p_ts", "p_value")
      .withWatermark("p_ts", "0 seconds")
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
        col("p_ts") <= col("c_ts"), "full_outer")
      .select(col("click_id"), col("p_value"))
    val q = joined.writeStream.format("memory").queryName("foj_out")
      .outputMode("append").start()
    try {
      // click 1 matches its purchase; purchase for user 9 has no click
      clicks.addData((1L, 1L, ts(5)))
      purchases.addData((1L, ts(3), 7.0), (9L, ts(4), 5.0))
      q.processAllAvailable()
      // advance both watermarks past every match window
      clicks.addData((8L, 8L, ts(60)))
      purchases.addData((7L, ts(60), 0.0))
      q.processAllAvailable()
      val got = spark.table("foj_out").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
      // matched pair + the right-only purchase with NULL click side
      assert(got.contains((Some(1L), Some(7.0))), s"match missing: $got")
      assert(got.contains((None, Some(5.0))),
        s"right-side null row not flushed: $got")
    } finally q.stop()
  }

  // ---- shared scaffolding for the randomized as-of equivalence tests ----

  private val asofTolUs = 30L * 60 * 1000000 // 30 minutes

  /** 15 users x 24 events (uniform click/purchase mix), minutes 0..199,
    * distinct per-purchase values so a wrong binding can't pass. */
  private def randomAsofEvents(rnd: scala.util.Random): Vector[AsofEvent] =
    (for {
      u <- 1 to 15
      i <- 0 until 24
    } yield {
      val id = (u * 1000 + i).toLong
      AsofEvent(u.toLong, ts(rnd.nextInt(200)), id,
        if (rnd.nextBoolean()) "c" else "p", id.toDouble)
    }).toVector

  /** Deliver `events` sorted by ts but locally shuffled within windows
    * of 4 (< the 5-minute watermark delay on this dense data, so
    * nothing arrives late), in random micro-batches; drain with two
    * far-future sentinel batches; return eventId -> enriched value for
    * the real events. ONE copy of the drive/drain discipline. */
  private def driveRandomAsof(events: Vector[AsofEvent],
                              rnd: scala.util.Random, table: String,
                              machine: org.apache.spark.sql.Dataset[AsofEvent]
                                => org.apache.spark.sql.Dataset[AsofOut])
      : Map[Long, Option[Double]] = {
    implicit val sc = spark.sqlContext
    val delivery = events.sortBy(e => (e.ts.getTime, e.eventId))
      .grouped(4).flatMap(w => rnd.shuffle(w)).toVector
    val input = MemoryStream[AsofEvent]
    val q = machine(input.toDS().withWatermark("ts", "5 minutes"))
      .writeStream.format("memory").queryName(table)
      .outputMode("append").start()
    try {
      var rest = delivery
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(40)
        input.addData(rest.take(n): _*)
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      input.addData(AsofEvent(-1L, ts(10000), -1L, "c", 0.0))
      q.processAllAvailable()
      input.addData(AsofEvent(-1L, ts(10001), -2L, "c", 0.0))
      q.processAllAvailable()
      spark.table(table).collect().map(r => (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .filter(_._1 >= 0).toMap
    } finally q.stop()
  }

  test("asofEnrich == batch backward as-of under randomized batch splits and bounded disorder") {
    val rnd = new scala.util.Random(211)
    val events = randomAsofEvents(rnd)
    val got = driveRandomAsof(events, rnd, "asof_rand_out",
      Streams.asofEnrich(_, tolerance = "30 minutes"))
    // reference: per user, single-threaded fold in the engine's
    // (ts, purchases-first, eventId) order
    val want = events.groupBy(_.userId).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e =>
        (e.ts.getTime, if (e.kind == "p") 0 else 1, e.eventId))
      var last: Option[(Long, Double)] = None
      sorted.flatMap { e =>
        if (e.kind == "p") { last = Some((e.ts.getTime * 1000, e.value)); None }
        else Some(e.eventId -> last.collect {
          case (pu, v) if e.ts.getTime * 1000 - pu <= asofTolUs => v
        })
      }
    }
    assert(got == want,
      s"diff=${(want.toSet -- got.toSet).take(3)} / ${(got.toSet -- want.toSet).take(3)}")
  }

  test("asofEnrichForward == batch forward as-of under randomized batch splits and bounded disorder") {
    val rnd = new scala.util.Random(223)
    val events = randomAsofEvents(rnd)
    val got = driveRandomAsof(events, rnd, "asof_fwd_rand_out",
      Streams.asofEnrichForward(_, tolerance = "30 minutes"))
    // reference: clicks-first at an equal ts; each click's nearest
    // next purchase is the first "p" AFTER its sorted position
    val want = events.groupBy(_.userId).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e =>
        (e.ts.getTime, if (e.kind == "c") 0 else 1, e.eventId)).toVector
      sorted.zipWithIndex.collect { case (e, i) if e.kind == "c" =>
        e.eventId -> sorted.drop(i + 1).find(_.kind == "p").collect {
          case p if p.ts.getTime * 1000 - e.ts.getTime * 1000 <= asofTolUs => p.value
        }
      }
    }
    assert(got == want,
      s"diff=${(want.toSet -- got.toSet).take(3)} / ${(got.toSet -- want.toSet).take(3)}")
  }

  test("scd2Intervals closes slices across micro-batches, opens after horizon") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StateEvent]
    val q = Streams.scd2Intervals(
        input.toDS().withWatermark("ts", "0 seconds"),
        horizon = "30 minutes")
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 logs in then browses, user 2 logs in — all
      // events buffer (the watermark hasn't passed them yet)
      input.addData(StateEvent(1, ts(0), 1, "login"),
        StateEvent(1, ts(2), 2, "browse"), StateEvent(2, ts(1), 3, "login"))
      q.processAllAvailable()
      // batch 2: user 1's purchase joins the buffer; earlier events
      // now below the watermark fold, closing slices ACROSS batches;
      // the 30-minute idle horizon keeps open edges from finalizing
      input.addData(StateEvent(1, ts(5), 4, "purchase"))
      q.processAllAvailable()
      // batch 3: traffic at t60 pushes the watermark past both idle
      // users' deadlines (t1+30, t5+30) -> their open slices append;
      // user 9 itself stays within its own horizon (deadline t90)
      input.addData(StateEvent(9, ts(60), 5, "login"))
      q.processAllAvailable()
      input.addData(StateEvent(9, ts(61), 6, "browse"))
      q.processAllAvailable()
      val got = spark.table("scd2_out")
        .select("userId", "state", "validFrom", "validTo")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3))))
        .toSet
      assert(got.contains((1L, "login", ts(0), Some(ts(2)))))
      assert(got.contains((1L, "browse", ts(2), Some(ts(5)))))
      assert(got.contains((1L, "purchase", ts(5), None))) // churned open
      assert(got.contains((2L, "login", ts(1), None)))
      // same-state repeat never splits a slice, and the still-active
      // user 9 has emitted nothing (login->browse closed slice aside)
      assert(!got.exists(s => s._1 == 1L && s._2 == "browse" && s._3 == ts(5)))
      assert(!got.exists(s => s._1 == 9L && s._4.isEmpty))
    } finally q.stop()
  }

  test("scd2Intervals folds out-of-order cross-batch arrivals in event-time order") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StateEvent]
    val q = Streams.scd2Intervals(
        input.toDS().withWatermark("ts", "5 minutes"),
        horizon = "30 minutes")
      .writeStream.format("memory").queryName("scd2_ooo_out")
      .outputMode("append").start()
    try {
      // browse arrives FIRST...
      input.addData(StateEvent(1, ts(10), 2, "browse"))
      q.processAllAvailable()
      // ...then the login that PRECEDES it in event time lands a batch
      // later (still above the watermark t10-5m = t5, so not late).
      // Arrival-order folding would emit an inverted browse slice
      // [t10, t7); the buffer must reorder before folding.
      input.addData(StateEvent(1, ts(7), 1, "login"))
      q.processAllAvailable()
      // push the watermark past user 1's idle deadline (t10 + 30m)
      input.addData(StateEvent(9, ts(60), 5, "login"))
      q.processAllAvailable()
      input.addData(StateEvent(9, ts(90), 6, "login"))
      q.processAllAvailable()
      val got = spark.table("scd2_ooo_out")
        .select("userId", "state", "validFrom", "validTo")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3))))
        .filter(_._1 == 1L).toSet
      assert(got == Set(
        (1L, "login", ts(7), Some(ts(10))),
        (1L, "browse", ts(10), None)), s"$got")
    } finally q.stop()
  }

  test("scd2Intervals == batch fold under randomized batch splits and bounded disorder") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(131)
    // 15 users x 20 events each, minutes 0..199; delivery order = sorted
    // by ts then locally shuffled within a 4-minute window (< the
    // 5-minute watermark delay, so nothing ever arrives late), split
    // into random micro-batches — the final table must equal the plain
    // in-memory SCD2 fold regardless of the split or the disorder
    val types = Array("login", "browse", "cart", "purchase")
    val events = (for {
      u <- 1 to 15
      i <- 0 until 20
    } yield StateEvent(u.toLong, ts(rnd.nextInt(200)),
      (u * 1000 + i).toLong, types(rnd.nextInt(types.length)))).toVector
    val delivery = events.sortBy(e => (e.ts.getTime, e.eventId))
      .grouped(4).flatMap(w => rnd.shuffle(w)).toVector
    val sentinel = StateEvent(-1L, ts(10000), 0L, "x")

    val input = MemoryStream[StateEvent]
    // horizon must exceed any intra-user event-time gap (events span
    // 200 minutes): a smaller horizon legitimately CHURNS idle users
    // mid-stream into separate chains, which the single-fold reference
    // below does not model
    val q = Streams.scd2Intervals(
        input.toDS().withWatermark("ts", "5 minutes"),
        horizon = "300 minutes")
      .writeStream.format("memory").queryName("scd2_rand_out")
      .outputMode("append").start()
    try {
      var rest = delivery
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(40)
        input.addData(rest.take(n): _*)
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      input.addData(sentinel)
      q.processAllAvailable()
      // one more watermark-advancing batch lets the idle timeouts fire
      input.addData(StateEvent(-1L, ts(10001), 1L, "x"))
      q.processAllAvailable()

      val got = spark.table("scd2_rand_out")
        .select("userId", "state", "validFrom", "validTo")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3))))
        .filter(_._1 >= 0).toSet

      // reference: the batch fold per user over the (ts, eventId) order
      val want = events.groupBy(_.userId).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.eventId))
        val changes = sorted.foldLeft(Vector.empty[StateEvent]) { (acc, e) =>
          if (acc.isEmpty || acc.last.eventType != e.eventType) acc :+ e else acc
        }
        changes.zipWithIndex.map { case (c, i) =>
          (u, c.eventType, c.ts,
            if (i + 1 < changes.length) Some(changes(i + 1).ts) else None)
        }
      }.toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally q.stop()
  }

  test("sessionizeWithState == batch gaps-and-islands under randomized splits") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(137)
    // 6 keys, bursty event times (gaps straddle the 10-minute session
    // gap), delivered sorted-with-local-disorder in random micro-batch
    // splits; the final table must equal the plain in-memory fold
    val keys = Array("a", "b", "c", "d", "e", "f")
    val events = (for {
      k <- keys.toSeq
      i <- 0 until 40
    } yield graft.streaming.SessEvent(k,
      ts(i * 3 + (if (rnd.nextInt(4) == 0) 15 else 0) + rnd.nextInt(3)))).toVector
    val delivery = events.sortBy(_.ts.getTime)
      .grouped(4).flatMap(w => rnd.shuffle(w)).toVector
    val input = MemoryStream[graft.streaming.SessEvent]
    val q = Streams.sessionizeWithState(
        input.toDS().withWatermark("ts", "5 minutes"), gap = "10 minutes")
      .writeStream.format("memory").queryName("sess_state_out")
      .outputMode("append").start()
    try {
      var rest = delivery
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(50)
        input.addData(rest.take(n): _*)
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      // sentinel key drives the watermark past every gap deadline; a
      // second advance lets the timeouts fire (timeouts fire only for
      // groups absent from the triggering batch)
      input.addData(graft.streaming.SessEvent("__s", ts(10000)))
      q.processAllAvailable()
      input.addData(graft.streaming.SessEvent("__s", ts(10001)))
      q.processAllAvailable()
      val got = spark.table("sess_state_out")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
        .filter(_._1 != "__s").toSet
      // reference: per-key sort, break when gap >= 10 minutes
      val want = events.groupBy(_.key).flatMap { case (k, evs) =>
        val sorted = evs.map(_.ts).sortBy(_.getTime)
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          (acc, t) =>
            if (t.getTime - acc.last.last.getTime >= 600000L) acc :+ Vector(t)
            else acc.init :+ (acc.last :+ t)
        }
        sessions.map(ses => (k, ses.head, ses.length.toLong))
      }.toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally q.stop()
  }

  test("rateLimit admits the first N per window in event-time order across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StateEvent]
    val q = Streams.rateLimit(
        input.toDS().withWatermark("ts", "5 minutes"),
        limit = 2, window = "1 hour")
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      // out-of-order delivery INSIDE the watermark: ts=3min arrives
      // before ts=1min — buffered admission must give the slots to
      // minutes 1 and 3, not to whatever arrived first
      input.addData(StateEvent(1, ts(3), 103, "x"), StateEvent(1, ts(4), 104, "x"))
      q.processAllAvailable()
      input.addData(StateEvent(1, ts(1), 101, "x"))
      q.processAllAvailable()
      // second hour: the window counter resets (minute 61, 62, 63)
      input.addData(StateEvent(1, ts(61), 201, "x"),
        StateEvent(1, ts(62), 202, "x"), StateEvent(1, ts(63), 203, "x"))
      q.processAllAvailable()
      // sentinel advances the watermark past everything; a second
      // advance lets the re-armed timeouts drain the buffers
      input.addData(StateEvent(-1, ts(10000), 0, "x"))
      q.processAllAvailable()
      input.addData(StateEvent(-1, ts(10001), 1, "x"))
      q.processAllAvailable()
      val got = spark.table("rate_out")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter(_._1 >= 0).toSet
      assert(got == Set((1L, 101L), (1L, 103L), (1L, 201L), (1L, 202L)),
        got.toSeq.sorted.mkString(","))
    } finally q.stop()
  }

  test("sessionizeWithState: sub-millisecond gaps never flush early") {
    implicit val sc = spark.sqlContext
    // gap = 500us: the fold compares in micros, but flush deadlines are
    // ms-granular — floor division would give gapMs = 0 and flush the
    // open session immediately, splitting in-gap events; ceil keeps it
    val t0 = ts(0)
    val t1 = new java.sql.Timestamp(t0.getTime)
    t1.setNanos(400000) // +400us, inside the 500us gap
    val input = MemoryStream[graft.streaming.SessEvent]
    val q = Streams.sessionizeWithState(
        input.toDS().withWatermark("ts", "0 seconds"), gap = "500 microseconds")
      .writeStream.format("memory").queryName("sess_subms_out")
      .outputMode("append").start()
    try {
      input.addData(graft.streaming.SessEvent("k", t0),
        graft.streaming.SessEvent("k", t1))
      q.processAllAvailable()
      input.addData(graft.streaming.SessEvent("__s", ts(100)))
      q.processAllAvailable()
      input.addData(graft.streaming.SessEvent("__s", ts(101)))
      q.processAllAvailable()
      val got = spark.table("sess_subms_out")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
        .filter(_._1 == "k")
      assert(got.toSeq == Seq(("k", t0, 2L)), got.mkString(","))
    } finally q.stop()
  }

  test("dedupFirstSeen with state TTL re-admits a fingerprint after expiry") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = Streams.dedupFirstSeen(
        input.toDS().withWatermark("ts", "0 seconds"),
        stateTtl = Some("10 minutes"))
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    try {
      // t=0: first sighting of fp=10 -> kept; state times out at t=10min
      input.addData(DocEvent(1, 10, ts(0)))
      q.processAllAvailable()
      // t=5min (within TTL): duplicate dropped; watermark advances
      input.addData(DocEvent(2, 10, ts(5)))
      q.processAllAvailable()
      // advance the watermark far past the timeout...
      input.addData(DocEvent(3, 99, ts(59)))
      q.processAllAvailable()
      // ...then a batch WITHOUT fp=10 lets its timed-out state get
      // removed (timeouts fire only for groups absent from the batch);
      // event times stay ahead of the watermark so rows aren't late
      input.addData(DocEvent(5, 98, ts(75)))
      q.processAllAvailable()
      // fp=10 reappears after expiry -> treated as first-seen again
      input.addData(DocEvent(4, 10, ts(80)))
      q.processAllAvailable()
      val kept = spark.table("dedup_ttl_out").select("docId").as[Long]
        .collect().toSet
      assert(kept == Set(1L, 3L, 5L, 4L), kept.toString)
    } finally q.stop()
  }

  test("dedupWithinWatermark: built-in operator drops repeats inside the horizon") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = Streams.dedupWithinWatermark(input.toDS().toDF(), Seq("fp"),
        delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      // batch 1: fp=10 twice in-batch (one survivor), fp=20 once
      input.addData(DocEvent(1, 10, ts(0)), DocEvent(2, 10, ts(1)),
        DocEvent(3, 20, ts(2)))
      q.processAllAvailable()
      // batch 2: fp=10 again within the horizon -> dropped; fp=30 kept
      input.addData(DocEvent(4, 10, ts(3)), DocEvent(5, 30, ts(4)))
      q.processAllAvailable()
      val out = spark.table("dedup_wm_out")
      val kept = out.select("docId").as[Long].collect().toSet
      // exactly one survivor per fp; which same-batch tie survives is
      // the operator's choice, so assert per-key counts not identities
      assert(out.count() == 3)
      assert(kept.contains(3L) && kept.contains(5L))
      assert((kept & Set(1L, 2L)).size == 1 && !kept.contains(4L))
    } finally q.stop()
  }

  test("geofencing: streaming points spatially joined to static polygons") {
    import graft.Geo._
    implicit val sc = spark.sqlContext
    // static fences: two diamonds around (10,10) and (50,50)
    val fences = Seq(
      (1L, Seq(Seq(15.0, 10, 10, 15, 5, 10, 10, 5, 15, 10))),
      (2L, Seq(Seq(55.0, 50, 50, 55, 45, 50, 50, 45, 55, 50)))
    ).toDF("fence_id", "fence")
    val input = MemoryStream[(Long, Double, Double)]
    val pts = input.toDF().toDF("event_id", "x", "y")
      .withColumn("pt", st_point(col("x"), col("y")))
    val enriched = graft.tools.SpatialJoin.gridInner(
      pts, fences, col("pt"), col("fence"), "polygon", cellSize = 20.0)
    val q = enriched.select("event_id", "fence_id")
      .writeStream.format("memory").queryName("geofence_out")
      .outputMode("append").start()
    try {
      input.addData((100L, 10.0, 10.0), (101L, 30.0, 30.0), (102L, 50.0, 50.0))
      q.processAllAvailable()
      input.addData((103L, 12.0, 10.0), (104L, 90.0, 90.0))
      q.processAllAvailable()
      val hits = spark.table("geofence_out")
        .as[(Long, Long)].collect().toSet
      assert(hits == Set((100L, 1L), (102L, 2L), (103L, 1L)), hits.toString)
    } finally q.stop()
  }

  test("watermarked hourly counts and session windows run on a stream") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    // schema-generic: analyzes against a stream with no `value` column
    Streams.hourlyCounts(events.drop("value"))
    val q = Streams.hourlyCounts(events,
        extraAggs = Seq(min(col("value")).as("vmin")))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("update").start()
    try {
      input.addData((ts(5), "click", 1.0), (ts(15), "click", 3.0),
        (ts(25), "view", 2.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select("event_type", "n").as[(String, Long)].collect().toMap
      assert(rows == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()

    val q2 = Streams.sessionize(events, "event_type", gap = "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      input.addData((ts(30), "click", 1.0), (ts(32), "click", 1.0),
        (ts(50), "click", 1.0))
      q2.processAllAvailable()
      // two click sessions: {30,32} and {50} (plus earlier batch events)
      assert(spark.table("sess_out").count() >= 2)
    } finally q2.stop()
  }

  // ---- streaming resample + forward fill -----------------------------

  test("resampleFfill: grid rows emit once and final, late user backfills, boundary events") {
    implicit val sc = spark.sqlContext
    val H = 3600000000L
    val h0 = ts(0).getTime * 1000 / H * H // 10:00
    val h1 = h0 + 4 * H                   // grid 10:00 .. 14:00
    val input = MemoryStream[ResEvent]
    val q = Streams.resampleFfill(
        input.toDS().withWatermark("ts", "1 minute"), h0, h1)
      .writeStream.format("memory").queryName("res_basic_out")
      .outputMode("append").start()
    try {
      def rows() = spark.table("res_basic_out").collect()
        .map(r => (r.getLong(0), (r.getLong(1) - h0) / H,
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      // user 1: event exactly ON the 11:00 mark (inclusive as-of edge)
      // plus a mid-hour event; user 2 appears LATE (first event 13:30)
      input.addData(ResEvent(1L, ts(30), 10L, Some(1.0)),
        ResEvent(1L, ts(60), 11L, Some(2.0)))
      q.processAllAvailable()
      // after feeding 12:31 the watermark passes 11:00, so the first
      // two grid rows must be out and FINAL: 10:00 -> None (the first
      // event is 10:30), 11:00 -> 2.0 (the ON-MARK 11:00 event is
      // inclusive, as-of's <= edge)
      input.addData(ResEvent(1L, ts(151), 12L, Some(3.0)))
      q.processAllAvailable()
      val afterTwo = rows()
      assert(afterTwo.contains((1L, 0L, None)), afterTwo.toString)
      assert(afterTwo.contains((1L, 1L, Some(2.0))), afterTwo.toString)
      // user 2 arrives late: every already-final hour backfills at once
      input.addData(ResEvent(2L, ts(210), 20L, Some(9.0)))
      input.addData(ResEvent(-1L, ts(100000), -1L, None))
      q.processAllAvailable()
      input.addData(ResEvent(-1L, ts(100001), -2L, None))
      q.processAllAvailable()
      val fin = spark.table("res_basic_out")
        .where(col("userId") =!= -1L).collect()
        .map(r => ((r.getLong(0), (r.getLong(1) - h0) / H),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      // exactly once: 2 users x 5 grid hours, no duplicates
      assert(fin.length == 10, fin.toSeq.toString)
      val m = fin.toMap
      assert(m((1L, 0L)) == None)         // before first event
      assert(m((1L, 1L)) == Some(2.0))    // on-mark inclusive
      assert(m((1L, 2L)) == Some(2.0))    // 12:31 is AFTER the 12:00 mark
      assert(m((1L, 3L)) == Some(3.0))    // 12:31 <= 13:00, then ffill
      assert(m((1L, 4L)) == Some(3.0))
      assert(m((2L, 0L)) == None)         // backfilled nulls
      assert(m((2L, 2L)) == None)
      assert(m((2L, 3L)) == None)         // 13:30 is AFTER the 13:00 mark
      assert(m((2L, 4L)) == Some(9.0))    // first mark at-or-after 13:30
      // exactly-once across COMPLETION: a later on-time event for a key
      // whose grid already drained must not re-create state and
      // re-emit the grid (the tombstone case)
      input.addData(ResEvent(1L, ts(100002), 30L, Some(7.0)))
      q.processAllAvailable()
      assert(spark.table("res_basic_out")
        .where(col("userId") =!= -1L).count() == 10)
    } finally q.stop()
  }

  test("resampleFfill == single-threaded grid fold under randomized batch splits and bounded disorder") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(229)
    val H = 3600000000L
    // 10 users x 30 events over 10 hours; clustered minutes force
    // equal-timestamp ties (the highest event_id must win)
    val events = (for { u <- 1 to 10; i <- 0 until 30 } yield {
      val id = (u * 1000 + i).toLong
      ResEvent(u.toLong, ts(rnd.nextInt(120) * 5), id, Some(id.toDouble))
    }).toVector
    def usOf(e: ResEvent) = e.ts.getTime * 1000
    val h0 = events.map(usOf).min / H * H
    val h1 = events.map(usOf).max / H * H
    val delivery = events.sortBy(e => (e.ts.getTime, e.eventId))
      .grouped(4).flatMap(w => rnd.shuffle(w)).toVector
    val input = MemoryStream[ResEvent]
    val q = Streams.resampleFfill(
        input.toDS().withWatermark("ts", "5 minutes"), h0, h1)
      .writeStream.format("memory").queryName("res_rand_out")
      .outputMode("append").start()
    try {
      var rest = delivery
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(50)
        input.addData(rest.take(n): _*)
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      input.addData(ResEvent(-1L, ts(100000), -1L, None))
      q.processAllAvailable()
      input.addData(ResEvent(-1L, ts(100001), -2L, None))
      q.processAllAvailable()
      val real = spark.table("res_rand_out")
        .where(col("userId") =!= -1L).collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      val got = real.toMap
      assert(real.length == got.size, "duplicate grid rows emitted")
      // reference: per user, fold events in (us, eventId) order across
      // the full grid — the batch resample's semantics
      val want = (1 to 10).flatMap { u =>
        val evs = events.filter(_.userId == u.toLong)
          .sortBy(e => (usOf(e), e.eventId))
        var last: Option[Double] = None
        var i = 0
        (h0 to h1 by H).map { h =>
          while (i < evs.size && usOf(evs(i)) <= h) {
            last = evs(i).value; i += 1
          }
          (u.toLong, h) -> last
        }
      }.toMap
      assert(got == want,
        s"diff=${(want.toSet -- got.toSet).take(3)} / ${(got.toSet -- want.toSet).take(3)}")
    } finally q.stop()
  }
}
