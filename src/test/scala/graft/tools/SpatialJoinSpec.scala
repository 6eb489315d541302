package graft.tools

import graft.Geo._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  /** Run `f` with the given session confs set, restoring (or
    * unsetting) each afterwards — the one exception-safe copy of the
    * save/set/restore dance every conf-sensitive test needs. */
  private def withConfs[T](kvs: (String, String)*)(f: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Run `f` with the adaptive-salt small-input gate disabled (these
    * specs exercise the detection path on deliberately tiny inputs). */
  private def forceDetection[T](f: => T): T =
    withConfs("spark.graft.sjoin.adaptiveSalt.minBytes" -> "0")(f)

  test("broadcast r-tree sjoin matches grid-cell sjoin") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 500).map(i =>
        (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    val polys = (0 until 25).map { i =>
      val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
      val r = 5 + rnd.nextDouble() * 10
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    val grid = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0)
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    val bcast = SpatialJoin.broadcastPointInGeom(pts, polys, "pt", "poly",
        "polygon", rightKey = "gid")
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(bcast == grid)
    assert(grid.nonEmpty)
  }

  test("salted grid join under 90% one-cell skew: exact result, hot cell split across reducer keys") {
    // 90% of points collapse into the single [0,20)^2 grid cell at
    // cellSize=20 (the pathological-skew shape the r13 verdict flagged);
    // the other 10% spread over [0,100)^2
    val pts = (0 until 1000).map { i =>
      if (i % 10 != 0)
        (i.toLong, (i * 13 % 1000) / 50.0, (i * 17 % 1000) / 50.0)
      else // spread side kept OUT of [0,20)^2 so the hot count is exact
        (i.toLong, 20.0 + (i * 7 % 80), 20.0 + (i * 11 % 80))
    }.toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    val polys = (0 until 20).map { i =>
      val cx = (i * 23 % 100).toDouble; val cy = (i * 37 % 100).toDouble
      val r = 4.0 + i % 7
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    val salt = 8
    val salted = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0, salt = salt)
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    // brute-force oracle: every pair through the exact kernel
    val brute = pts.crossJoin(polys)
      .where(st_intersects(col("pt"), col("poly"), "polygon"))
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(salted == brute)
    assert(brute.nonEmpty)
    // the reducer-size claim, asserted at the DATA level (what bounds a
    // shuffle partition is rows per join key): unsalted, the hot cell is
    // ONE key holding ~900 points; salted, each (cell, salt) sub-key
    // holds a hash-split share. Recompute the exact keys the join uses.
    def keyCounts(saltN: Int): Map[(Long, Long, Int), Long] = pts
      .withColumn("__kx", floor(st_x(col("pt")) / 20.0).cast("long"))
      .withColumn("__ky", floor(st_y(col("pt")) / 20.0).cast("long"))
      .withColumn("__ks",
        if (saltN == 1) lit(0) else pmod(hash(col("pt")), lit(saltN)))
      .groupBy("__kx", "__ky", "__ks").count()
      .as[(Long, Long, Int, Long)].collect()
      .map { case (a, b, c, n) => (a, b, c) -> n }.toMap
    val unsalted = keyCounts(1)
    val hotKey = unsalted.maxBy(_._2)
    assert(hotKey._1 == ((0L, 0L, 0)) && hotKey._2 == 900L,
      s"skew shape drifted: $hotKey")
    val saltedCounts = keyCounts(salt)
    val maxSalted = saltedCounts.values.max
    // fair share is 900/8 ≈ 113; hash splits are lumpy, so allow 2x —
    // the point is the hot cell no longer rides ONE reducer key
    assert(maxSalted <= 2 * (900 / salt + 1),
      s"hot cell not split: max salted key holds $maxSalted of 900")
    // and the geometry side replicates exactly salt-fold per overlapped
    // cell (the cost side of the trade, pinned so it never silently grows)
    val gridded = polys.select(st_bounds(col("poly")).as("b"))
      .select(floor(col("b.x0") / 20.0).cast("long").as("x0"),
        floor(col("b.x1") / 20.0).cast("long").as("x1"),
        floor(col("b.y0") / 20.0).cast("long").as("y0"),
        floor(col("b.y1") / 20.0).cast("long").as("y1"))
      .select(((col("x1") - col("x0") + 1) * (col("y1") - col("y0") + 1))
        .as("cells"))
      .as[Long].collect().sum
    val saltedGeomRows = polys
      .withColumn("b", st_bounds(col("poly")))
      .withColumn("cx", explode(sequence(floor(col("b.x0") / 20.0).cast("long"),
        floor(col("b.x1") / 20.0).cast("long"))))
      .withColumn("cy", explode(sequence(floor(col("b.y0") / 20.0).cast("long"),
        floor(col("b.y1") / 20.0).cast("long"))))
      .withColumn("s", explode(sequence(lit(0), lit(salt - 1))))
      .count()
    assert(saltedGeomRows == gridded * salt)
  }

  test("adaptive salting: only the hot cell splits; cold-cell geometries are NOT replicated; result exact") {
    // same 90%-one-cell shape as the blanket-salt spec above
    val pts = (0 until 1000).map { i =>
      if (i % 10 != 0)
        (i.toLong, (i * 13 % 1000) / 50.0, (i * 17 % 1000) / 50.0)
      else
        (i.toLong, 20.0 + (i * 7 % 80), 20.0 + (i * 11 % 80))
    }.toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    val polys = (0 until 20).map { i =>
      val cx = (i * 23 % 100).toDouble; val cy = (i * 37 % 100).toDouble
      val r = 4.0 + i % 7
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    val salt = 8

    // detection finds EXACTLY the dense cell: 900 of 1000 points in
    // [0,20)^2 vs fair share 1000/4 = 250 at factor 2 → threshold 500
    val hot = SpatialJoin.detectHotCells(pts, col("pt"), 20.0)
    assert(hot.contains(Seq((0L, 0L))), s"hot-cell detection drifted: $hot")

    // exactness: identical to the brute-force kernel oracle
    val adaptive = forceDetection {
      SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0, salt = salt, adaptiveSalt = true)
    }.select("pid", "gid").as[(Long, Long)].collect().toSet
    val brute = pts.crossJoin(polys)
      .where(st_intersects(col("pt"), col("poly"), "polygon"))
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(adaptive == brute)
    assert(brute.nonEmpty)

    // replication accounting against the REAL construction: run the
    // inner join's geometry side (gridInner with the detected hot set)
    // through the same per-cell explode and count rows. Each polygon
    // pays salt-fold ONLY in the one hot cell it overlaps; every cold
    // cell contributes exactly one row.
    val cells = polys.select(col("gid"), st_bounds(col("poly")).as("b"))
      .select(col("gid"),
        explode(sequence(floor(col("b.x0") / 20.0).cast("long"),
          floor(col("b.x1") / 20.0).cast("long"))).as("cx"),
        col("b"))
      .select(col("gid"), col("cx"),
        explode(sequence(floor(col("b.y0") / 20.0).cast("long"),
          floor(col("b.y1") / 20.0).cast("long"))).as("cy"))
    val overlaps = cells.as[(Long, Long, Long)].collect()
    val expectAdaptive = overlaps.map { case (_, cx, cy) =>
      if ((cx, cy) == ((0L, 0L))) salt.toLong else 1L }.sum
    val expectBlanket = overlaps.length.toLong * salt
    assert(expectAdaptive < expectBlanket,
      "shape drifted: no cold-cell savings to measure")
    val adaptiveGeomRows = SpatialJoin.gridInner(
        pts.select("pid", "pt"), polys, col("pt"), col("poly"), "polygon",
        cellSize = 20.0, salt = salt, hotCells = Some(Seq((0L, 0L))))
      .count() // sanity: the hot-set plan itself still evaluates
    assert(adaptiveGeomRows == brute.size)
    // the geometry-side row count under the adaptive plan, measured on
    // the identical salt expression the join uses
    val hotCond = col("__cx") === 0L && col("__cy") === 0L
    val salted = polys
      .withColumn("b", st_bounds(col("poly")))
      .withColumn("__cx", explode(sequence(floor(col("b.x0") / 20.0).cast("long"),
        floor(col("b.x1") / 20.0).cast("long"))))
      .withColumn("__cy", explode(sequence(floor(col("b.y0") / 20.0).cast("long"),
        floor(col("b.y1") / 20.0).cast("long"))))
      .withColumn("__salt", explode(when(hotCond, sequence(lit(0), lit(salt - 1)))
        .otherwise(sequence(lit(0), lit(0)))))
      .count()
    assert(salted == expectAdaptive,
      s"cold cells were replicated: $salted geometry rows, expected $expectAdaptive")

    // the hot cell still splits: max (cell, salt) point key ≤ 2x the
    // hash fair share of the 900-point cell
    val keyCounts = pts
      .withColumn("__kx", floor(st_x(col("pt")) / 20.0).cast("long"))
      .withColumn("__ky", floor(st_y(col("pt")) / 20.0).cast("long"))
      .withColumn("__ks", when(col("__kx") === 0L && col("__ky") === 0L,
        pmod(hash(col("pt")), lit(salt))).otherwise(lit(0)))
      .groupBy("__kx", "__ky", "__ks").count()
      .as[(Long, Long, Int, Long)].collect()
    val maxHotKey = keyCounts.filter(k => k._1 == 0 && k._2 == 0).map(_._4).max
    assert(maxHotKey <= 2 * (900 / salt + 1),
      s"hot cell not split under adaptive salting: $maxHotKey of 900")
    // no cold-cell point key was salted (they all ride __ks = 0)
    assert(keyCounts.filter(k => !(k._1 == 0 && k._2 == 0)).forall(_._3 == 0))
  }

  test("gridInner is exact for ARBITRARY hot-cell designations") {
    // the safety argument for adaptive salting is that the hot set is
    // a pure PERFORMANCE hint: both sides derive saltedness from the
    // same literal predicate, so ANY designation — cells with no
    // points, the whole grid, a random scatter — must leave the result
    // identical to brute force. Detection quality can then never be a
    // correctness question; seeded random designations pin it.
    val rnd = new scala.util.Random(421)
    val pts = (0 until 600).map(i =>
        (i.toLong, rnd.nextInt(50) * 2.0, rnd.nextInt(50) * 2.0))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("pid", "pt")
    val polys = (0 until 15).map { i =>
      val cx = rnd.nextInt(50) * 2.0; val cy = rnd.nextInt(50) * 2.0
      val r = rnd.nextInt(8) * 2 + 5.0 // odd radius, even centers: no ties
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    val brute = pts.crossJoin(polys)
      .where(st_intersects(col("pt"), col("poly"), "polygon"))
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    (1 to 6).foreach { trial =>
      val salt = 2 + rnd.nextInt(6)
      val hot = Seq.fill(1 + rnd.nextInt(4))(
        (rnd.nextInt(5).toLong, rnd.nextInt(5).toLong)).distinct
      val got = SpatialJoin.gridInner(pts, polys, col("pt"), col("poly"),
          "polygon", cellSize = 20.0, salt = salt, hotCells = Some(hot))
        .select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(got == brute, s"trial $trial drifted: salt=$salt hot=$hot")
    }
  }

  test("adaptive salting tolerates a null-majority point column") {
    // 250 of 300 points are null: nulls match nothing in the join, so
    // they must neither form a phantom hot cell (the (null,null) group
    // NPE'd the hot-cell collect pre-fix) nor inflate the fair-share
    // total; the 50 real points all land in one cell and still trip
    // detection on the non-null population alone
    val pts = (0 until 300).map(i => (i.toLong, (i * 13 % 100) / 5.0, (i * 17 % 100) / 5.0))
      .toDF("pid", "x", "y")
      .withColumn("pt", when(col("pid") >= 250, st_point(col("x"), col("y"))))
    val hot = SpatialJoin.detectHotCells(pts, col("pt"), 20.0)
    assert(hot.contains(Seq((0L, 0L))), s"null rows broke detection: $hot")
    val polys = Seq((0L, Seq(Seq(14.0, 7.0, 7.0, 14.0, 0.0, 7.0, 7.0, 0.0, 14.0, 7.0))))
      .toDF("gid", "poly")
    val adaptive = forceDetection {
      SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0, salt = 4, adaptiveSalt = true)
    }.select("pid", "gid").as[(Long, Long)].collect().toSet
    val brute = pts.where(col("pt").isNotNull).crossJoin(polys)
      .where(st_intersects(col("pt"), col("poly"), "polygon"))
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(adaptive == brute && brute.nonEmpty)
  }

  test("adaptive salting with no hot cell degrades to the unsalted plan") {
    val pts = (0 until 400).map(i =>
        (i.toLong, (i * 37 % 400) / 4.0, (i * 53 % 400) / 4.0))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    assert(SpatialJoin.detectHotCells(pts, col("pt"), 20.0).isEmpty)
    val polys = (0 until 10).map { i =>
      val cx = (i * 31 % 100).toDouble; val cy = (i * 41 % 100).toDouble
      (i.toLong, Seq(Seq(cx + 6, cy, cx, cy + 6, cx - 6, cy, cx, cy - 6, cx + 6, cy)))
    }.toDF("gid", "poly")
    val adaptive = forceDetection {
      SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0, salt = 8, adaptiveSalt = true)
    }.select("pid", "gid").as[(Long, Long)].collect().toSet
    val brute = pts.crossJoin(polys)
      .where(st_intersects(col("pt"), col("poly"), "polygon"))
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(adaptive == brute && brute.nonEmpty)
  }

  test("small-input gate: adaptiveSalt below minBytes skips the counting pass, result stays exact") {
    // a tiny local point side sits far under the (explicit, huge)
    // threshold — pointInGeom must NOT run the detection job, and the
    // join proceeds with blanket salting (cheap at this size)
    withConfs("spark.graft.sjoin.adaptiveSalt.minBytes" ->
        (1L << 40).toString) {
      val pts = (0 until 500).map { i =>
        if (i % 10 != 0) (i.toLong, (i * 13 % 1000) / 50.0, (i * 17 % 1000) / 50.0)
        else (i.toLong, 20.0 + (i * 7 % 80), 20.0 + (i * 11 % 80))
      }.toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      val polys = (0 until 20).map { i =>
        val cx = (i * 23 % 100).toDouble; val cy = (i * 37 % 100).toDouble
        val r = 4.0 + i % 7
        (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
      }.toDF("gid", "poly")
      val runsBefore = SpatialJoin.detectionRuns.get()
      val gated = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
          cellSize = 20.0, salt = 8, adaptiveSalt = true)
      assert(SpatialJoin.detectionRuns.get() == runsBefore,
        "the small-input gate did not skip the counting pass")
      val got = gated.select("pid", "gid").as[(Long, Long)].collect().toSet
      val brute = pts.crossJoin(polys)
        .where(st_intersects(col("pt"), col("poly"), "polygon"))
        .select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(got == brute && brute.nonEmpty)
    }
  }

  test("planner-path adaptive salting: a plain st_intersects join under the conf plans hot-cell-only salting and matches the API path") {
    graft.plans.SpatialJoinRewrite.install(spark)
    try withConfs(
      "spark.graft.sjoin.cellSize" -> "20.0",
      "spark.graft.sjoin.salt" -> "8",
      "spark.graft.sjoin.adaptiveSalt" -> "true",
      "spark.graft.sjoin.adaptiveSalt.minBytes" -> "0") {
      // the 90%-one-cell skew shape: hot cell (0,0) at cellSize 20
      val pts = (0 until 1000).map { i =>
        if (i % 10 != 0) (i.toLong, (i * 13 % 1000) / 50.0, (i * 17 % 1000) / 50.0)
        else (i.toLong, 20.0 + (i * 7 % 80), 20.0 + (i * 11 % 80))
      }.toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      val polys = (0 until 20).map { i =>
        val cx = (i * 23 % 100).toDouble; val cy = (i * 37 % 100).toDouble
        val r = 4.0 + i % 7
        (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
      }.toDF("gid", "poly")

      val runsBefore = SpatialJoin.detectionRuns.get()
      val j = pts.join(polys, st_intersects(pts("pt"), polys("poly"), "polygon"))
      val pairs = j.select("pid", "gid").as[(Long, Long)].collect().toSet
      val runsAfterFirst = SpatialJoin.detectionRuns.get()
      assert(runsAfterFirst > runsBefore,
        "planner path never ran hot-cell detection")
      val expect = forceDetection {
        SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
          cellSize = 20.0, salt = 8, adaptiveSalt = true)
      }.select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(pairs == expect && pairs.nonEmpty)

      // hot-cell-ONLY salting in the executed plan: the salt columns
      // are conditional (CASE WHEN on the hot-cell literals), never
      // the blanket unconditional pmod/explode, and the join is still
      // a hash join — no nested loop
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("CASE WHEN"),
        s"no conditional (hot-cell-only) salting in:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived:\n$plan")
      assert(plan.contains("HashJoin"), s"no hash join in:\n$plan")

      // the detection result is CACHED on the canonicalized point
      // side: re-planning the same join (fresh DataFrame, fixed-point
      // optimizer re-runs included) must not re-fire the counting job.
      // (runsAfterFirst can't be the baseline — the API-path `expect`
      // call above legitimately ran its own detection.)
      val runsBeforeReplan = SpatialJoin.detectionRuns.get()
      val j2 = pts.join(polys, st_intersects(pts("pt"), polys("poly"), "polygon"))
      val pairs2 = j2.select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(pairs2 == expect)
      assert(SpatialJoin.detectionRuns.get() == runsBeforeReplan,
        "detection re-fired on a re-plan of the same point side")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[graft.plans.SpatialJoinRewrite])
    }
  }

  test("planner-path small-input gate: adaptiveSalt conf on a small point side plans blanket salt with no counting pass") {
    graft.plans.SpatialJoinRewrite.install(spark)
    try withConfs(
      "spark.graft.sjoin.cellSize" -> "20.0",
      "spark.graft.sjoin.salt" -> "4",
      "spark.graft.sjoin.adaptiveSalt" -> "true",
      "spark.graft.sjoin.adaptiveSalt.minBytes" -> (1L << 40).toString) {
      val rnd = new scala.util.Random(47)
      val pts = (0 until 300).map(i =>
          (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
        .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      val polys = (0 until 15).map { i =>
        val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
        val r = 5 + rnd.nextDouble() * 10
        (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
      }.toDF("gid", "poly")
      val runsBefore = SpatialJoin.detectionRuns.get()
      val j = pts.join(polys, st_intersects(pts("pt"), polys("poly"), "polygon"))
      val pairs = j.select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(SpatialJoin.detectionRuns.get() == runsBefore,
        "the planner gate did not skip the counting pass")
      val expect = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
          cellSize = 20.0, salt = 4)
        .select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(pairs == expect && pairs.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[graft.plans.SpatialJoinRewrite])
    }
  }

  test("bucketed geometry table joins without a geometry-side exchange") {
    val rnd = new scala.util.Random(59)
    val pts = (0 until 400).map(i =>
        (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("pid", "pt")
    val polys = (0 until 30).map { i =>
      val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
      val r = 5 + rnd.nextDouble() * 10
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    val table = "graft_bucketed_polys_test"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      SpatialJoin.saveGeomsBucketedByCell(polys, "poly", table,
        cellSize = 20.0, numBuckets = 4)
      // force a shuffle-based join so the bucket distribution matters
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = SpatialJoin.pointInGeomBucketed(pts, table, "pt", "poly", "polygon")
      val got = j.select("pid", "gid").as[(Long, Long)].collect().toSet
      val expect = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
          cellSize = 20.0)
        .select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(got == expect && got.nonEmpty)
      // exactly ONE exchange: the point side; the geometry side reads
      // its buckets pre-distributed
      val plan = j.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("auto cell size (cellSize<=0) matches an explicit cell size") {
    val rnd = new scala.util.Random(41)
    val pts = (0 until 400).map(i =>
        (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    val polys = (0 until 20).map { i =>
      val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
      val r = 5 + rnd.nextDouble() * 10
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    val auto = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon")
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    val explicit = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0)
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(auto == explicit && auto.nonEmpty)
    // derived size is ~2x the median bbox edge (edges are 2r in [10,30])
    val cs = SpatialJoin.autoCellSize(polys, col("poly"))
    assert(cs >= 20.0 && cs <= 62.0, s"implausible auto cell size $cs")
  }

  test("optimizer rewrites a plain st_intersects join to the grid hash join") {
    graft.plans.SpatialJoinRewrite.install(spark)
    try {
      spark.conf.set("spark.graft.sjoin.cellSize", "20.0")
      val rnd = new scala.util.Random(31)
      val pts = (0 until 300).map(i =>
          (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
        .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      val polys = (0 until 15).map { i =>
        val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
        val r = 5 + rnd.nextDouble() * 10
        (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
      }.toDF("gid", "poly")

      // plain DataFrame join with the spatial predicate — no SpatialJoin call
      val j = pts.join(polys, st_intersects(pts("pt"), polys("poly"), "polygon"))
      val pairs = j.select("pid", "gid").as[(Long, Long)].collect().toSet
      val expect = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
          cellSize = 20.0)
        .select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(pairs == expect && pairs.nonEmpty)

      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived:\n$plan")
      assert(plan.contains("HashJoin"), s"no hash join in:\n$plan")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[graft.plans.SpatialJoinRewrite])
    }
  }

  test("optimizer rewrite derives cell size from data when the conf is unset") {
    graft.plans.SpatialJoinRewrite.install(spark)
    try {
      spark.conf.unset("spark.graft.sjoin.cellSize")
      val rnd = new scala.util.Random(41)
      val pts = (0 until 300).map(i =>
          (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
        .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      val polys = (0 until 15).map { i =>
        val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
        val r = 5 + rnd.nextDouble() * 10
        (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
      }.toDF("gid", "poly")

      // with no conf, the rule must probe the geometry side's bbox
      // stats (SpatialJoin.autoCellSize) instead of failing or
      // falling back to a nested loop; pair set is cell-size-invariant
      val j = pts.join(polys, st_intersects(pts("pt"), polys("poly"), "polygon"))
      val pairs = j.select("pid", "gid").as[(Long, Long)].collect().toSet
      val expect = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
          cellSize = 20.0)
        .select("pid", "gid").as[(Long, Long)].collect().toSet
      assert(pairs == expect && pairs.nonEmpty)

      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived:\n$plan")
      assert(plan.contains("HashJoin"), s"no hash join in:\n$plan")
    } finally {
      spark.conf.set("spark.graft.sjoin.cellSize", "20.0")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[graft.plans.SpatialJoinRewrite])
    }
  }

  test("optimizer rewrites a plain st_geom_intersects join to the dual-grid hash join") {
    graft.plans.SpatialJoinRewrite.install(spark)
    try {
      spark.conf.set("spark.graft.sjoin.cellSize", "20.0")
      val rnd = new scala.util.Random(37)
      // short integer segments vs diamond polygons
      val segs = (0 until 300).map { i =>
        val x = rnd.nextInt(100).toDouble; val y = rnd.nextInt(100).toDouble
        (i.toLong, Seq(x, y, x + rnd.nextInt(6) + 1.0, y + rnd.nextInt(6) + 1.0))
      }.toDF("sid", "seg")
      val polys = (0 until 15).map { i =>
        val cx = rnd.nextInt(100).toDouble; val cy = rnd.nextInt(100).toDouble
        val r = 5.0 + rnd.nextInt(10)
        (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
      }.toDF("gid", "poly")

      val j = segs.join(polys,
        st_geom_intersects(segs("seg"), "line", polys("poly"), "polygon"))
      val pairs = j.select("sid", "gid").as[(Long, Long)].collect().toSet
      val expect = SpatialJoin.geomGridInner(segs, polys, col("seg"), "line",
          col("poly"), "polygon", cellSize = 20.0)
        .select("sid", "gid").as[(Long, Long)].collect().toSet
      assert(pairs == expect && pairs.nonEmpty)

      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived:\n$plan")
      assert(plan.contains("HashJoin"), s"no hash join in:\n$plan")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[graft.plans.SpatialJoinRewrite])
    }
  }

  test("broadcastGeomJoin == geomGridInner on segments vs polygons") {
    val rnd = new scala.util.Random(41)
    val segs = (0 until 400).map { i =>
      val x = rnd.nextInt(100).toDouble; val y = rnd.nextInt(100).toDouble
      (i.toLong, Seq(x, y, x + rnd.nextInt(8) + 1.0, y + rnd.nextInt(8) + 1.0))
    }.toDF("sid", "seg")
    val polys = (0 until 12).map { i =>
      val cx = rnd.nextInt(100).toDouble; val cy = rnd.nextInt(100).toDouble
      val r = 4.0 + rnd.nextInt(12)
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    val grid = SpatialJoin.geomGridInner(segs, polys, col("seg"), "line",
        col("poly"), "polygon", cellSize = 16.0)
      .select("sid", "gid").as[(Long, Long)].collect().toSet
    val bcast = SpatialJoin.broadcastGeomJoin(segs, polys, "seg", "line",
        "poly", "polygon", rightKey = "gid")
      .select("sid", "gid").as[(Long, Long)].collect().toSet
    assert(bcast == grid && bcast.nonEmpty)

    // outer variants compose identically on both paths
    val gridLeft = SpatialJoin.geomJoin(segs, polys, "seg", "line",
        "poly", "polygon", cellSize = 16.0, how = "left", leftKey = "sid")
      .select(col("sid"), col("gid")).collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val bcastLeft = SpatialJoin.broadcastGeomJoin(segs, polys, "seg", "line",
        "poly", "polygon", rightKey = "gid", how = "left", leftKey = "sid")
      .select(col("sid"), col("gid")).collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(bcastLeft == gridLeft)
    assert(gridLeft.exists(_._2 == -1L)) // some segment misses every polygon
    val bcastRight = SpatialJoin.broadcastGeomJoin(segs, polys, "seg", "line",
        "poly", "polygon", rightKey = "gid", how = "right")
      .select(col("gid"), col("sid")).collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val gridRight = SpatialJoin.geomJoin(segs, polys, "seg", "line",
        "poly", "polygon", cellSize = 16.0, how = "right", rightKey = "gid")
      .select(col("gid"), col("sid")).collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(bcastRight == gridRight)
  }

  test("geomGridInner: empty sides and null geometries degrade cleanly") {
    val segs = Seq((1L, Seq(0.0, 0.0, 5.0, 5.0)), (2L, null.asInstanceOf[Seq[Double]]))
      .toDF("sid", "seg")
    val polys = Seq((1L, Seq(Seq(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0)))).toDF("gid", "poly")
    val got = SpatialJoin.geomGridInner(segs, polys, col("seg"), "line",
        col("poly"), "polygon", cellSize = 8.0)
      .select("sid", "gid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L))) // null geometry row silently drops (inner join)
    val emptyPolys = polys.where(col("gid") < 0)
    assert(SpatialJoin.geomGridInner(segs, emptyPolys, col("seg"), "line",
      col("poly"), "polygon", cellSize = 8.0).count() == 0)
  }

  test("broadcast sjoin skips null and NaN points") {
    val pts = Seq(
      (1L, Some((5.0, 5.0))),
      (2L, None),
      (3L, Some((Double.NaN, 5.0)))).map { case (id, p) =>
        (id, p.map { case (a, b) => (a, b) })
      }.toDF("pid", "raw")
      .withColumn("pt", when(col("raw").isNotNull,
        st_point(col("raw._1"), col("raw._2"))))
      .drop("raw")
    // a null build-side geometry must be skipped, not NPE the index build
    val polys = Seq(
      (1L, Some(Seq(Seq(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0)))),
      (2L, Option.empty[Seq[Seq[Double]]]))
      .toDF("gid", "poly")
    val out = SpatialJoin.broadcastPointInGeom(pts, polys, "pt", "poly",
        "polygon", rightKey = "gid")
      .select("pid").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("distanceJoin matches the brute-force pair set on random points") {
    val rnd = new scala.util.Random(71)
    val mkPts = (n: Int, seedOff: Int) => (0 until n).map(i =>
      (i.toLong + seedOff, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val la = mkPts(300, 0)
    val rb = mkPts(250, 1000)
    val a = la.toDF("ida", "xa", "ya").withColumn("pa", st_point(col("xa"), col("ya")))
      .select("ida", "pa")
    val b = rb.toDF("idb", "xb", "yb").withColumn("pb", st_point(col("xb"), col("yb")))
      .select("idb", "pb")
    val r = 7.5
    val got = SpatialJoin.distanceJoin(a, b, "pa", "pb", r, "d2")
      .select("ida", "idb", "d2").as[(Long, Long, Double)].collect()
    val expect = (for {
      (ia, xa, ya) <- la; (ib, xb, yb) <- rb
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet
    assert(got.toSet == expect && got.length == expect.size, // no dup pairs
      s"got ${got.length} pairs, expected ${expect.size}")
    assert(expect.nonEmpty)
  }

  test("distanceJoin skips null and NaN points") {
    val a = Seq((1L, Some((5.0, 5.0))), (2L, None), (3L, Some((Double.NaN, 1.0))))
      .toDF("ida", "raw")
      .withColumn("pa", when(col("raw").isNotNull,
        st_point(col("raw._1"), col("raw._2")))).drop("raw")
    val b = Seq((10L, 5.0, 6.0)).toDF("idb", "xb", "yb")
      .withColumn("pb", st_point(col("xb"), col("yb"))).select("idb", "pb")
    val got = SpatialJoin.distanceJoin(a, b, "pa", "pb", 2.0)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("nearestJoin k=1 left: nearest-with-tiebreak, isolated rows survive") {
    // two right points equidistant from left id=1 -> the smaller key wins;
    // left id=2 has no right point within radius -> null row (how=left)
    val cust = Seq((1L, 10.0, 10.0), (2L, 90.0, 90.0))
      .toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("id", "pt")
    val supp = Seq((7L, 13.0, 14.0), (3L, 13.0, 14.0), (9L, 10.0, 30.0))
      .toDF("nn_id", "sx", "sy").withColumn("spt", st_point(col("sx"), col("sy")))
      .select("nn_id", "spt")
    val got = SpatialJoin.nearestJoin(cust, supp, "pt", "spt", radius = 25.0,
        leftKey = "id", rightKey = "nn_id", k = 1, how = "left")
      .select("id", "nn_id", "nn_dist2").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set((1L, Some(3L), Some(25.0)), (2L, None, None)), s"$got")
  }

  test("broadcastNearestJoin == nearestJoin (k=1 and k=3, inner and left)") {
    val rnd = new scala.util.Random(83)
    val ls = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val rs = (0 until 30).map(i => (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val left = ls.toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("id", "pt")
    val right = rs.toDF("nn_id", "sx", "sy")
      .withColumn("spt", st_point(col("sx"), col("sy"))).select("nn_id", "spt")
    for (k <- Seq(1, 3); how <- Seq("inner", "left")) {
      val grid = SpatialJoin.nearestJoin(left, right, "pt", "spt", 12.0,
          "id", "nn_id", k, how)
        .select("id", "nn_id", "nn_dist2").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
      val bcast = SpatialJoin.broadcastNearestJoin(left, right, "pt", "spt",
          12.0, rightKey = "nn_id", k, how)
        .select("id", "nn_id", "nn_dist2").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
      assert(bcast == grid, s"k=$k how=$how")
      assert(grid.nonEmpty)
      if (how == "left")
        assert(grid.exists(_._2 == -1L), s"expected isolated rows at k=$k")
    }
  }

  test("nearestJoinAdaptive == nearestJoin on mixed-density data (k=1/3, inner/left)") {
    val rnd = new scala.util.Random(89)
    // dense cluster in [0,20)^2 plus sparse far points: phase 1 must
    // certify the cluster, phase 2 must still catch the sparse lefts
    val ls = (0 until 200).map(i => (i.toLong, rnd.nextDouble() * 20, rnd.nextDouble() * 20)) ++
      (200 until 230).map(i => (i.toLong, 60 + rnd.nextDouble() * 40, 60 + rnd.nextDouble() * 40))
    val rs = (0 until 150).map(i => (i.toLong, rnd.nextDouble() * 20, rnd.nextDouble() * 20)) ++
      (150 until 155).map(i => (i.toLong, 60 + rnd.nextDouble() * 40, 60 + rnd.nextDouble() * 40))
    val left = ls.toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("id", "pt")
    val right = rs.toDF("nn_id", "sx", "sy")
      .withColumn("spt", st_point(col("sx"), col("sy"))).select("nn_id", "spt")
    for (k <- Seq(1, 3); how <- Seq("inner", "left")) {
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select("id", "nn_id", "nn_dist2").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
      val plain = norm(SpatialJoin.nearestJoin(left, right, "pt", "spt", 40.0,
        "id", "nn_id", k, how))
      val adaptive = norm(SpatialJoin.nearestJoinAdaptive(left, right, "pt",
        "spt", 40.0, "id", "nn_id", k, how))
      assert(adaptive == plain, s"k=$k how=$how")
      assert(plain.nonEmpty)
    }
    // degenerate right sides fall back to the plain path, not an error
    val empty = right.where(col("nn_id") < 0)
    assert(SpatialJoin.nearestJoinAdaptive(left, empty, "pt", "spt", 40.0,
      "id", "nn_id", 1, "inner").count() == 0)
  }

  test("GeoFrame.sjoinNearest routes through the adaptive two-phase plan") {
    val rnd = new scala.util.Random(90)
    // dense extent: r0 = 2*sqrt(k*area/(pi*n)) << radius, so the
    // adaptive path must SPLIT (resolved union phase2) rather than
    // degrade to the single fixed-radius pass
    val ls = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 30, rnd.nextDouble() * 30))
    val rs = (0 until 400).map(i => (i.toLong, rnd.nextDouble() * 30, rnd.nextDouble() * 30))
    val left = ls.toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("id", "pt")
    val right = rs.toDF("nn_id", "sx", "sy")
      .withColumn("spt", st_point(col("sx"), col("sy"))).select("nn_id", "spt")
    val lf = graft.api.GeoFrame(left, "pt", "point")
    val rf = graft.api.GeoFrame(right, "spt", "point")
    val out = lf.sjoinNearest(rf, maxDistance = 40.0,
      leftKey = "id", rightKey = "nn_id", k = 2, how = "left")
    // the two-phase plan is a Union(resolved, phase2) — the fixed-radius
    // baseline contains no Union anywhere
    val hasUnion = out.queryExecution.analyzed.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.nonEmpty
    assert(hasUnion, "frame-level kNN did not take the adaptive two-phase plan")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "nn_id", "nn_dist2").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    val baseline = norm(SpatialJoin.nearestJoin(left, right, "pt", "spt", 40.0,
      "id", "nn_id", 2, "left"))
    assert(norm(out) == baseline)
  }

  test("broadcastNearestJoin skips null/NaN points and null keys on both sides") {
    val left = Seq(
      (1L, Some((5.0, 5.0))),   // matches
      (2L, None),               // null point -> kept with nulls (how=left)
      (3L, Some((Double.NaN, 1.0)))
    ).toDF("id", "raw")
      .withColumn("pt", when(col("raw").isNotNull,
        st_point(col("raw._1"), col("raw._2")))).drop("raw")
    val right = Seq(
      (Some(10L), Some((5.0, 6.0))),  // real neighbor
      (None, Some((5.0, 5.0))),       // null key -> excluded from index
      (Some(11L), None)               // null point -> excluded
    ).toDF("nn_id", "raw")
      .withColumn("spt", when(col("raw").isNotNull,
        st_point(col("raw._1"), col("raw._2")))).drop("raw")
    val got = SpatialJoin.broadcastNearestJoin(left, right, "pt", "spt",
        radius = 3.0, rightKey = "nn_id", k = 1, how = "left")
      .select("id", "nn_id", "nn_dist2").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set((1L, Some(10L), Some(1.0)), (2L, None, None),
      (3L, None, None)), s"$got")
  }

  test("nearestJoin k=1 and k>1 agree with brute force on random points") {
    val rnd = new scala.util.Random(37)
    val ls = (0 until 200).map(i => (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val rs = (0 until 40).map(i => (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val left = ls.toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("id", "pt")
    val right = rs.toDF("nn_id", "sx", "sy")
      .withColumn("spt", st_point(col("sx"), col("sy"))).select("nn_id", "spt")
    val radius = 30.0
    def brute(k: Int): Set[(Long, Long, Double)] = ls.flatMap { case (il, xl, yl) =>
      rs.map { case (ir, xr, yr) =>
        (ir, (xl - xr) * (xl - xr) + (yl - yr) * (yl - yr)) }
        .filter(_._2 <= radius * radius)
        .sortBy { case (ir, d2) => (d2, ir) }.take(k)
        .map { case (ir, d2) => (il, ir, d2) }
    }.toSet
    val g1 = SpatialJoin.nearestJoin(left, right, "pt", "spt", radius,
        "id", "nn_id", k = 1, how = "inner")
      .select("id", "nn_id", "nn_dist2").as[(Long, Long, Double)].collect().toSet
    assert(g1 == brute(1) && g1.nonEmpty)
    val g3 = SpatialJoin.nearestJoin(left, right, "pt", "spt", radius,
        "id", "nn_id", k = 3, how = "inner")
      .select("id", "nn_id", "nn_dist2").as[(Long, Long, Double)].collect().toSet
    assert(g3 == brute(3) && g3.size > g1.size)
  }

  test("broadcast variants fail fast on an oversized build side") {
    val pts = (0 until 10).map(i => (i.toLong, i * 1.0, i * 1.0))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("pid", "pt")
    val polys = (0 until 50).map { i =>
      val c = i * 2.0
      (i.toLong, Seq(Seq(c + 1, c, c, c + 1, c - 1, c, c, c - 1, c + 1, c)))
    }.toDF("gid", "poly")
    val spts = (0 until 50).map(i => (i.toLong, i * 2.0, i * 2.0))
      .toDF("nn_id", "sx", "sy")
      .withColumn("spt", st_point(col("sx"), col("sy"))).select("nn_id", "spt")
    spark.conf.set("spark.graft.broadcastJoin.maxRows", "20")
    try {
      val e1 = intercept[IllegalArgumentException] {
        SpatialJoin.broadcastPointInGeom(pts, polys, "pt", "poly", "polygon",
          rightKey = "gid").count()
      }
      assert(e1.getMessage.contains("pointInGeom")) // names the distributed twin
      val e2 = intercept[IllegalArgumentException] {
        SpatialJoin.broadcastGeomJoin(pts, polys, "pt", "point",
          "poly", "polygon", rightKey = "gid").count()
      }
      assert(e2.getMessage.contains("geomJoin"))
      val e3 = intercept[IllegalArgumentException] {
        SpatialJoin.broadcastNearestJoin(pts, spts, "pt", "spt",
          radius = 5.0, rightKey = "nn_id").count()
      }
      assert(e3.getMessage.contains("nearestJoin"))
      // under the cap the same joins run
      spark.conf.set("spark.graft.broadcastJoin.maxRows", "1000")
      assert(SpatialJoin.broadcastPointInGeom(pts, polys, "pt", "poly",
        "polygon", rightKey = "gid").count() >= 0)
    } finally spark.conf.unset("spark.graft.broadcastJoin.maxRows")
  }

  // ---- r17: planner outer/semi/anti, keyless left, geom salting,
  // ---- honest gate ----------------------------------------------------

  /** Uniform points over [0,100)^2 plus one NaN row (must be PRESERVED
    * by outer variants, matched by nothing) — pid NOT unique when
    * `dupEvery` > 0, to exercise the keyless multiplicity contract. */
  private def outerPts(seed: Int, n: Int = 300, dupEvery: Int = 0) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val pid = if (dupEvery > 0 && i % dupEvery == 0) 7L else i.toLong
      (pid, rnd.nextDouble() * 100, rnd.nextDouble() * 100)
    } :+ ((9998L, Double.NaN, Double.NaN))
    rows.toDF("pid", "x", "y")
      .withColumn("pt", st_point(col("x"), col("y"))).select("pid", "pt")
  }
  private def outerPolys(seed: Int, n: Int = 12) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
      val r = 5 + rnd.nextDouble() * 10
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
  }
  private def withRule[T](confs: (String, String)*)(f: => T): T = {
    graft.plans.SpatialJoinRewrite.install(spark)
    try withConfs(confs: _*)(f)
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[graft.plans.SpatialJoinRewrite])
  }
  /** Multiset compare (outer joins carry multiplicity, sets would hide
    * duplicate-row bugs). */
  private def bag(df: org.apache.spark.sql.DataFrame): Map[(Option[Long], Option[Long]), Int] =
    df.collect().toSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
                 if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .groupBy(identity).view.mapValues(_.size).toMap

  test("planner LEFT OUTER st_intersects join: NestedLoop-free, exact BNLJ multiset (NaN point preserved)") {
    val pts = outerPts(61, dupEvery = 25)
    val polys = outerPolys(62)
    // ground truth: the BNLJ semantics, rule NOT installed
    val expect = bag(pts.join(polys,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "left")
      .select("pid", "gid"))
    withRule("spark.graft.sjoin.cellSize" -> "20.0") {
      val j = pts.join(polys,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "left")
      assert(bag(j.select("pid", "gid")) == expect)
      assert(expect.exists(_._1._2.isEmpty), "shape drifted: no unmatched point")
      assert(expect.contains((Some(9998L), None)), "NaN point not preserved")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"no hash/merge join in:\n$plan")
    }
  }

  test("planner RIGHT OUTER (point side on the right) plans as the reordered left-outer grid join") {
    val pts = outerPts(63)
    val polys = outerPolys(64)
    val expect = bag(polys.join(pts,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "right")
      .select("gid", "pid"))
    withRule("spark.graft.sjoin.cellSize" -> "20.0") {
      val j = polys.join(pts,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "right")
      assert(bag(j.select("gid", "pid")) == expect)
      assert(expect.contains((None, Some(9998L))), "NaN point not preserved")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived:\n$plan")
    }
  }

  test("planner LEFT SEMI / LEFT ANTI st_intersects joins: NestedLoop-free, exact membership") {
    val pts = outerPts(65)
    val polys = outerPolys(66)
    val pred = st_intersects(pts("pt"), polys("poly"), "polygon")
    val expectSemi = pts.join(polys, pred, "left_semi")
      .select("pid").as[Long].collect().sorted.toSeq
    val expectAnti = pts.join(polys, pred, "left_anti")
      .select("pid").as[Long].collect().sorted.toSeq
    withRule("spark.graft.sjoin.cellSize" -> "20.0") {
      val semi = pts.join(polys, pred, "left_semi")
      val anti = pts.join(polys, pred, "left_anti")
      assert(semi.select("pid").as[Long].collect().sorted.toSeq == expectSemi)
      assert(anti.select("pid").as[Long].collect().sorted.toSeq == expectAnti)
      assert(expectSemi.nonEmpty && expectAnti.nonEmpty, "degenerate shape")
      assert(expectAnti.contains(9998L), "NaN point must be anti-kept")
      Seq(semi, anti).foreach { d =>
        val plan = d.queryExecution.executedPlan.toString
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
          s"nested loop survived:\n$plan")
      }
    }
  }

  test("preserved-GEOMETRY-side outer join falls through to BNLJ but stays correct (documented fallback)") {
    val pts = outerPts(67)
    val polys = outerPolys(68)
    // right join preserving the polys (point on the LEFT): the geometry
    // side explodes in the grid shape, so there is no keyless outer
    // rewrite — the rule must leave it to Catalyst
    val expect = bag(pts.join(polys,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "right")
      .select("pid", "gid"))
    withRule("spark.graft.sjoin.cellSize" -> "20.0") {
      val j = pts.join(polys,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "right")
      assert(bag(j.select("pid", "gid")) == expect)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("NestedLoop") || plan.contains("Cartesian"),
        s"fallback pin stale — preserved-geometry outer got rewritten:\n$plan")
    }
  }

  test("residual conjunct rides INSIDE the outer join condition (not a row-dropping post-filter)") {
    val pts = outerPts(69)
    val polys = outerPolys(70)
    val cond = st_intersects(pts("pt"), polys("poly"), "polygon") &&
      polys("gid") % 2 === 0
    val expect = bag(pts.join(polys, cond, "left").select("pid", "gid"))
    withRule("spark.graft.sjoin.cellSize" -> "20.0") {
      val j = pts.join(polys, cond, "left")
      assert(bag(j.select("pid", "gid")) == expect)
      // the residual must have changed something vs the pure predicate
      val pure = bag(pts.join(polys,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "left")
        .select("pid", "gid"))
      assert(expect != pure, "residual conjunct had no effect — shape drifted")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived:\n$plan")
    }
  }

  test("pointInGeom how=left is KEYLESS: duplicate left keys keep exact multiplicity (and salting composes)") {
    val pts = outerPts(71, dupEvery = 10) // pid=7 shared by ~30 rows
    val polys = outerPolys(72)
    val expect = bag(pts.join(polys,
        st_intersects(pts("pt"), polys("poly"), "polygon"), "left")
      .select("pid", "gid"))
    // no leftKey passed at all — the old key-join shape would have
    // required one and merged the duplicate-pid candidate sets
    val got = bag(SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0, how = "left")
      .select("pid", "gid"))
    assert(got == expect)
    val salted = bag(SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 20.0, how = "left", salt = 4)
      .select("pid", "gid"))
    assert(salted == expect)
  }

  test("geomGridInner salting (blanket and hot-cell-only) is exact; cold-cell build copies are NOT replicated") {
    // segments: 90% collapse into the [0,20)^2 cell, rest spread
    val segs = (0 until 800).map { i =>
      val (x0, y0) =
        if (i % 10 != 0) ((i * 13 % 200) / 10.0, (i * 17 % 200) / 10.0)
        else (20.0 + i * 7 % 70, 20.0 + i * 11 % 70)
      (i.toLong, Seq(x0, y0, x0 + 4.0, y0 + 3.0))
    }.toDF("sid", "seg")
    val polys = outerPolys(74).withColumnRenamed("gid", "pgid")
    val unsalted = SpatialJoin.geomGridInner(segs, polys, col("seg"), "line",
        col("poly"), "polygon", cellSize = 20.0)
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    val brute = segs.crossJoin(polys)
      .where(st_geom_intersects(col("seg"), "line", col("poly"), "polygon"))
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    assert(unsalted == brute && brute.nonEmpty)
    val blanket = SpatialJoin.geomGridInner(segs, polys, col("seg"), "line",
        col("poly"), "polygon", cellSize = 20.0, salt = 5)
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    assert(blanket == brute)
    val hotOnly = SpatialJoin.geomGridInner(segs, polys, col("seg"), "line",
        col("poly"), "polygon", cellSize = 20.0, salt = 5,
        hotCells = Some(Seq((0L, 0L))))
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    assert(hotOnly == brute)
    // arbitrary (even wrong) hot designations stay exact — hot-ness is
    // a performance hint, never a correctness input
    val weird = SpatialJoin.geomGridInner(segs, polys, col("seg"), "line",
        col("poly"), "polygon", cellSize = 20.0, salt = 3,
        hotCells = Some(Seq((2L, 2L), (-5L, 1L))))
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    assert(weird == brute)
    // cost side, at the data level: under hot-only salting the build
    // side replicates ONLY its hot-cell copies
    def buildRows(saltN: Int, hot: Option[Seq[(Long, Long)]]): Long = {
      val g = polys.withColumn("b", st_bounds(col("poly")))
        .withColumn("cx", explode(sequence(floor(col("b.x0") / 20.0).cast("long"),
          floor(col("b.x1") / 20.0).cast("long"))))
        .withColumn("cy", explode(sequence(floor(col("b.y0") / 20.0).cast("long"),
          floor(col("b.y1") / 20.0).cast("long"))))
      hot match {
        case None => g.count() * saltN
        case Some(cells) =>
          val isHot = cells.map { case (x, y) =>
            col("cx") === lit(x) && col("cy") === lit(y) }.reduce(_ || _)
          g.withColumn("n", when(isHot, lit(saltN)).otherwise(lit(1)))
            .agg(sum("n")).as[Long].head()
      }
    }
    val copies = buildRows(1, None)
    val hotCopies = buildRows(5, Some(Seq((0L, 0L))))
    assert(hotCopies < copies * 5,
      s"hot-only salting replicated cold cells: $hotCopies vs blanket ${copies * 5}")
  }

  test("geomJoin adaptiveSalt: the geometry detector fires past the override gate, result exact; gate skips below it") {
    val segs = (0 until 800).map { i =>
      val (x0, y0) =
        if (i % 10 != 0) ((i * 13 % 200) / 10.0, (i * 17 % 200) / 10.0)
        else (20.0 + i * 7 % 70, 20.0 + i * 11 % 70)
      (i.toLong, Seq(x0, y0, x0 + 4.0, y0 + 3.0))
    }.toDF("sid", "seg")
    val polys = outerPolys(74).withColumnRenamed("gid", "pgid")
    val brute = segs.crossJoin(polys)
      .where(st_geom_intersects(col("seg"), "line", col("poly"), "polygon"))
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    val runsBefore = SpatialJoin.detectionRuns.get()
    val adaptive = SpatialJoin.geomJoin(segs, polys, "seg", "line",
        "poly", "polygon", cellSize = 20.0, salt = 8,
        adaptiveSalt = true, adaptiveMinBytesOverride = 0)
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    assert(SpatialJoin.detectionRuns.get() > runsBefore,
      "geomJoin adaptive arm never ran the geometry hot-cell detector")
    assert(adaptive == brute && brute.nonEmpty)
    // gate: a huge override threshold must skip detection entirely
    // (blanket salting) without touching any session conf
    val runsGated = SpatialJoin.detectionRuns.get()
    val gated = SpatialJoin.geomJoin(segs, polys, "seg", "line",
        "poly", "polygon", cellSize = 20.0, salt = 8,
        adaptiveSalt = true, adaptiveMinBytesOverride = 1L << 40)
      .select("sid", "pgid").as[(Long, Long)].collect().toSet
    assert(SpatialJoin.detectionRuns.get() == runsGated,
      "the override gate did not skip the counting pass")
    assert(gated == brute)
    assert(spark.conf.getOption("spark.graft.sjoin.adaptiveSalt.minBytes").isEmpty,
      "geomJoin leaked a session conf mutation")
  }

  test("honest small-input gate: a DERIVED (non-scan) point side is probed, not byte-guessed — small skips detection, big detects") {
    // derive the point side through a JOIN so its sizeInBytes estimate
    // is a product of children (the dishonest-stats shape); minBytes=1
    // forces the gate past the bytes shortcut into the probe
    val base = outerPts(75)
    val keys = (0 until 500).map(i => Tuple1(i.toLong)).toDF("pid")
    val derived = base.join(keys, Seq("pid"), "inner")
    val polys = outerPolys(76)
    withConfs("spark.graft.sjoin.adaptiveSalt.minRows" -> "1000") {
      val probesBefore = SpatialJoin.probeRuns.get()
      val runsBefore = SpatialJoin.detectionRuns.get()
      val small = SpatialJoin.pointInGeom(derived, polys, "pt", "poly",
        "polygon", cellSize = 20.0, salt = 8, adaptiveSalt = true,
        adaptiveMinBytesOverride = 1L)
      assert(SpatialJoin.probeRuns.get() == probesBefore + 1,
        "the derived side was not probed")
      assert(SpatialJoin.detectionRuns.get() == runsBefore,
        "a probe-verdict-small side still ran detection")
      val got = bag(small.select("pid", "gid")
        .where(col("gid").isNotNull))
      val expect = bag(derived.crossJoin(polys)
        .where(st_intersects(col("pt"), col("poly"), "polygon"))
        .select("pid", "gid"))
      assert(got == expect && expect.nonEmpty)
    }
    withConfs("spark.graft.sjoin.adaptiveSalt.minRows" -> "100") {
      val runsBefore = SpatialJoin.detectionRuns.get()
      SpatialJoin.pointInGeom(derived, polys, "pt", "poly",
        "polygon", cellSize = 20.0, salt = 8, adaptiveSalt = true,
        adaptiveMinBytesOverride = 1L)
      assert(SpatialJoin.detectionRuns.get() > runsBefore,
        "a probe-verdict-big side skipped detection")
    }
  }

  test("small-input gate boundary: exactly minRows rows is NOT small on BOTH verdict paths (probe and stats agree)") {
    // "inputs UNDER this many rows skip detection" — the probe and the
    // stats verdict must agree at the boundary or the gate's answer
    // would depend on whether CBO stats happen to be present
    val df100 = spark.range(100).toDF("v")
    val df99 = spark.range(99).toDF("v")
    assert(!SpatialJoin.probeSmall(df100, 100), "probe: exactly minRows must be big")
    assert(SpatialJoin.probeSmall(df99, 100), "probe: minRows-1 must be small")
    // a BARE Range is a leaf with a known rowCount (a Project on top
    // would hide it behind the size-only stats visitor), so the
    // rowCount verdict decides here
    assert(SpatialJoin.smallPlanVerdict(
      spark.range(100).queryExecution.optimizedPlan, 1L, 100).contains(false),
      "stats: exactly minRows must be big")
    assert(SpatialJoin.smallPlanVerdict(
      spark.range(99).queryExecution.optimizedPlan, 1L, 100).contains(true),
      "stats: minRows-1 must be small")
  }

  test("SQL EXISTS / NOT EXISTS with st_intersects plan through the grid semi/anti joins (subquery rewrite feeds the point arm)") {
    // Catalyst's RewritePredicateSubquery turns the correlated
    // EXISTS/NOT EXISTS into LeftSemi/LeftAnti joins BEFORE the
    // user-provided optimizer batch runs, so the r17 point arm must
    // pick them up — the SQL-text twin of the semi/anti DataFrame
    // joins, and the decontamination shape analysts actually type.
    graft.Geo.registerAll(spark)
    val pts = outerPts(81)
    val polys = outerPolys(82)
    pts.createOrReplaceTempView("ex_pts")
    polys.createOrReplaceTempView("ex_polys")
    val pred = st_intersects(pts("pt"), polys("poly"), "polygon")
    val expectSemi = pts.join(polys, pred, "left_semi")
      .select("pid").as[Long].collect().sorted.toSeq
    val expectAnti = pts.join(polys, pred, "left_anti")
      .select("pid").as[Long].collect().sorted.toSeq
    withRule("spark.graft.sjoin.cellSize" -> "20.0") {
      val semi = spark.sql(
        """SELECT pid FROM ex_pts p WHERE EXISTS (
             SELECT 1 FROM ex_polys g
             WHERE st_intersects_polygon(p.pt, g.poly))""")
      val anti = spark.sql(
        """SELECT pid FROM ex_pts p WHERE NOT EXISTS (
             SELECT 1 FROM ex_polys g
             WHERE st_intersects_polygon(p.pt, g.poly))""")
      assert(semi.as[Long].collect().sorted.toSeq == expectSemi)
      assert(anti.as[Long].collect().sorted.toSeq == expectAnti)
      assert(expectSemi.nonEmpty && expectAnti.nonEmpty, "degenerate shape")
      Seq("EXISTS" -> semi, "NOT EXISTS" -> anti).foreach { case (what, d) =>
        val plan = d.queryExecution.executedPlan.toString
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
          s"$what survived as a nested loop:\n$plan")
      }
    }
  }

  test("planner honest gate: the probe runs ONCE per derived point side (cached), detection skipped while small") {
    val base = outerPts(77)
    val keys = (0 until 500).map(i => Tuple1(i.toLong)).toDF("pid")
    val derived = base.join(keys, Seq("pid"), "inner")
    val polys = outerPolys(78)
    withRule(
      "spark.graft.sjoin.cellSize" -> "20.0",
      "spark.graft.sjoin.salt" -> "8",
      "spark.graft.sjoin.adaptiveSalt" -> "true",
      "spark.graft.sjoin.adaptiveSalt.minBytes" -> "1",
      "spark.graft.sjoin.adaptiveSalt.minRows" -> "1000") {
      val probesBefore = SpatialJoin.probeRuns.get()
      val runsBefore = SpatialJoin.detectionRuns.get()
      val j = derived.join(polys,
        st_intersects(derived("pt"), polys("poly"), "polygon"))
      val n1 = j.count()
      assert(SpatialJoin.detectionRuns.get() == runsBefore,
        "planner gate did not skip detection for a probe-small derived side")
      val probesAfter = SpatialJoin.probeRuns.get()
      assert(probesAfter > probesBefore, "planner gate never probed")
      // re-plan: the probe verdict is cached per canonicalized plan
      val j2 = derived.join(polys,
        st_intersects(derived("pt"), polys("poly"), "polygon"))
      assert(j2.count() == n1)
      assert(SpatialJoin.probeRuns.get() == probesAfter,
        "the probe re-fired on a re-plan of the same point side")
    }
  }
}
