package graft.io

import graft.Geo._
import graft.api.GeoFrame
import graft.plans.SpatialFilePruning
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automatic planner-side file pruning (SpatialFilePruning rule):
  * a plain `spark.read.parquet(dir).where(st_*_intersects_bounds(...))`
  * must scan only the sidecar-surviving files — no GeoParquet.read call
  * needed — and return exactly the same rows. */
class GeoPruneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }.getOrElse(-1)

  test("CSV+WKT round trip preserves geometry exactly") {
    val dir = java.nio.file.Files.createTempDirectory("csvwkt").toFile
    try {
      import spark.implicits._
      val df = Seq(
        (1L, Seq(Seq(0.0, 0, 3, 0, 3, 3, 0, 3, 0, 0))),
        (2L, Seq(Seq(1.5, -2.5, 4.25, 0, 1.5, 7, 1.5, -2.5)))).toDF("id", "poly")
      GeoParquet.writeCsvWkt(GeoFrame(df, "poly", "polygon"), s"$dir/csv",
        mode = "overwrite")
      val back = GeoParquet.readCsvWkt(spark, s"$dir/csv", "wkt", "polygon", "poly")
      val got = back.df.select("id", "poly").as[(Long, Seq[Seq[Double]])]
        .collect().toMap
      assert(got == Map(
        1L -> Seq(Seq(0.0, 0, 3, 0, 3, 3, 0, 3, 0, 0)),
        2L -> Seq(Seq(1.5, -2.5, 4.25, 0, 1.5, 7, 1.5, -2.5))))
      // and the geometry functions work straight off the CSV source
      assert(back.area.where(col("id") === 1).select("area")
        .head().getDouble(0) == 9.0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("bounds read is conservative: unknown files and uncovered columns survive") {
    val dir = java.nio.file.Files.createTempDirectory("conserv").toFile
    try {
      val pts = (0 until 100).map(i => (i.toLong, (i % 10).toDouble, (i / 10).toDouble))
        .toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
        .select("id", "pt")
      GeoParquet.write(GeoFrame(pts, "pt", "point"), s"$dir/d", mode = "overwrite")
      // append data AFTER the sidecar was written (id 1000 far outside box)
      Seq((1000L, 500.0, 500.0)).toDF("id", "x", "y")
        .withColumn("pt", st_point(col("x"), col("y"))).select("id", "pt")
        .write.mode("append").parquet(s"$dir/d")
      val got = GeoParquet.read(spark, s"$dir/d", "pt", "point",
          bounds = Some((0.0, 0.0, 2.0, 2.0)))
        .df.select("id").as[Long].collect().toSet
      // sidecar-unknown file must be kept (bounds read prunes FILES only)
      assert(got.contains(1000L), s"appended file dropped: $got")
      // rows actually inside the box can never be pruned away (their
      // file's bounds intersect the box by definition)
      val inBox = (0 until 100).filter(i => i % 10 <= 2 && i / 10 <= 2)
        .map(_.toLong).toSet
      assert(inBox.subsetOf(got), s"in-box rows missing: ${inBox.diff(got)}")
      // a REAL column the sidecar doesn't cover (write records bounds
      // for the active geometry only): no pruning, full multi-file read.
      // (A geometry column missing from the schema entirely now fails
      // loudly at GeoFrame construction — f64/schema validation.)
      val pts2 = (0 until 100).map(i => (i.toLong, (i % 10).toDouble, (i / 10).toDouble))
        .toDF("id", "x", "y")
        .withColumn("pt", st_point(col("x"), col("y")))
        .withColumn("pt2", st_point(col("x"), col("y")))
        .select("id", "pt", "pt2")
        .repartition(4, col("id"))
      GeoParquet.write(GeoFrame(pts2, "pt", "point"), s"$dir/d2", mode = "overwrite")
      val uncovered = GeoParquet.read(spark, s"$dir/d2", "pt2", "point",
        bounds = Some((0.0, 0.0, 1.0, 1.0)))
      assert(uncovered.df.count() == 100,
        "uncovered column must read in full (no pruning)")
      import org.apache.spark.sql.functions.input_file_name
      assert(uncovered.df.select(input_file_name()).distinct().count() == 4,
        "uncovered column must scan every file")
      intercept[IllegalArgumentException] {
        GeoParquet.read(spark, s"$dir/d", "no_such_col", "point",
          bounds = Some((0.0, 0.0, 1.0, 1.0)))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("incremental sidecar append preserves other geometry columns") {
    val dir = java.nio.file.Files.createTempDirectory("sideapp").toFile
    try {
      val rows = (0 until 40).map(i => (i.toLong, (i % 10).toDouble, (i / 10).toDouble))
        .toDF("id", "x", "y")
        .withColumn("a", st_point(col("x"), col("y")))
        .withColumn("b", st_point(col("x") + 1000, col("y") + 1000))
        .select("id", "a", "b")
        // explicit range layout: the session is getOrCreate-shared
        // across suites, so the input's default partition count (and
        // with it, whether the write is prunable at all) must not
        // depend on which suite created it
        .repartitionByRange(4, col("id"))
      GeoParquet.write(GeoFrame(rows, "a", "point"), s"$dir/d",
        mode = "overwrite", extraGeomCols = Seq("b"))
      // append updating only column a's bounds
      val more = Seq((100L, 500.0, 500.0)).toDF("id", "x", "y")
        .withColumn("a", st_point(col("x"), col("y")))
        .withColumn("b", st_point(col("x") + 1000, col("y") + 1000))
        .select("id", "a", "b")
      GeoParquet.appendWithSidecar(more, s"$dir/d", Seq("a"))
      // column b's entries must still prune (appended file unknown for b
      // -> conservatively kept, so expect its row plus the b-box hits)
      val gotB = GeoParquet.read(spark, s"$dir/d", "b", "point",
          bounds = Some((1000.0, 1000.0, 1002.0, 1002.0)))
        .df.count()
      val total = spark.read.parquet(s"$dir/d").count()
      assert(total == 41 && gotB < total, s"no pruning on b: $gotB of $total")
      // and column a's sidecar now covers the appended file exactly
      val sidecar = GeoParquet.readSidecarText(s"$dir/d",
        spark.sessionState.newHadoopConf()).get
      val all = GeoParquet.parseSidecarAll(sidecar)
      // the reserved __rowcount block rides along since r11 (geo lakes
      // get metadata-only COUNTs too)
      assert(all.keySet == Set("a", "b", GeoParquet.RowCountCol))
      assert(all("a").size == all("b").size + 1, s"a=${all("a").size} b=${all("b").size}")
      assert(all(GeoParquet.RowCountCol).values.map(_(0).toLong).sum == 41L,
        "write + append files all carry their row counts")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("numeric z-order pack prunes files on a 2-D range and matches the plain filter") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    try {
      // two independent uniform numeric columns: a single-column sort
      // would skip on one and nothing on the other; the z-pack gives
      // both dimensions locality, so a small 2-D box hits few files
      val rnd = new scala.util.Random(41)
      // id 99999 sits EXACTLY on the box corner — pins inclusive-box
      // semantics (an off-by-one exclusive filter would drop it)
      val rows = (0 until 4000).map(i =>
        (i.toLong, rnd.nextInt(1000), rnd.nextInt(1000))) :+
        ((99999L, 120, 120))
      val df = rows.toDF("id", "a", "b")
      GeoParquet.packNumericToParquet(df, "a", "b", s"$dir/z", 8)
      val total = new java.io.File(s"$dir/z").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(total >= 8, s"expected >= 8 data files, got $total")
      val pruned = GeoParquet.readNumericRange(spark, s"$dir/z", 0, 0, 120, 120)
      assert(scannedFiles(pruned) < total,
        s"no file pruning: ${scannedFiles(pruned)} of $total")
      val got = pruned.select("id").as[Long].collect().toSet
      val want = rows.filter(r => r._2 <= 120 && r._3 <= 120).map(_._1).toSet
      assert(got.contains(99999L), "corner row must survive (inclusive box)")
      assert(got == want)
      // inverted bounds normalize like cx — same rows, no silent loss
      // from the sidecar prune using the raw box
      val inv = GeoParquet.readNumericRange(spark, s"$dir/z", 120, 120, 0, 0)
      assert(inv.select("id").as[Long].collect().toSet == want)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("k-column z-order pack prunes on any predicate subset and matches plain filters") {
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toFile
    try {
      // three independent uniform columns + a constant column (must not
      // break scaling) + a planted row on the exact box corner
      val rnd = new scala.util.Random(43)
      val rows = (0 until 6000).map(i =>
        (i.toLong, rnd.nextInt(1000), rnd.nextInt(1000), rnd.nextInt(1000), 7)) :+
        ((88888L, 150, 150, 150, 7))
      val df = rows.toDF("id", "a", "b", "c", "k")
      GeoParquet.packZOrderToParquet(df, Seq("a", "b", "c", "k"), s"$dir/z", 8)
      val total = new java.io.File(s"$dir/z").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(total >= 8, s"expected >= 8 data files, got $total")
      // full 3-D box (corner row inclusive), constant column unfiltered
      val got3 = GeoParquet.readZOrderRange(spark, s"$dir/z",
        Seq(("a", 0.0, 150.0), ("b", 0.0, 150.0), ("c", 0.0, 150.0)))
      assert(got3.inputFiles.length < total,
        s"no file pruning: ${got3.inputFiles.length} of $total")
      val ids3 = got3.select("id").as[Long].collect().toSet
      val want3 = rows.filter(r => r._2 <= 150 && r._3 <= 150 && r._4 <= 150)
        .map(_._1).toSet
      assert(ids3.contains(88888L), "corner row must survive (inclusive box)")
      assert(ids3 == want3)
      // SUBSET predicate (one of the packed columns) still prunes and
      // still matches; inverted bounds normalize
      val got1 = GeoParquet.readZOrderRange(spark, s"$dir/z", Seq(("a", 60.0, 0.0)))
      assert(got1.inputFiles.length < total)
      assert(got1.select("id").as[Long].collect().toSet ==
        rows.filter(_._2 <= 60).map(_._1).toSet)
      // constant-column predicate: every file matches (kept), rows exact
      val gotK = GeoParquet.readZOrderRange(spark, s"$dir/z", Seq(("k", 7.0, 7.0)))
      assert(gotK.count() == rows.length.toLong)
      // a range missing every file prunes the whole listing
      assert(GeoParquet.readZOrderRange(spark, s"$dir/z",
        Seq(("a", 5000.0, 6000.0))).count() == 0)
      // reserved-name and unknown-column guards fail fast
      intercept[IllegalArgumentException] {
        GeoParquet.packZOrderToParquet(df.withColumnRenamed("id", "__zcode"),
          Seq("a"), s"$dir/bad", 2)
      }
      intercept[IllegalArgumentException] {
        GeoParquet.packZOrderToParquet(df, Seq("a", "nope"), s"$dir/bad2", 2)
      }
      // integral residuals translate to native-typed bounds: fractional
      // limits round EXACTLY (0.5..149.5 on ints ⇔ 1..149) and the
      // predicate reaches the parquet scan (a cast-to-double residual
      // would block PushedFilters → no row-group skipping)
      val frac = GeoParquet.readZOrderRange(spark, s"$dir/z",
        Seq(("a", 0.5, 149.5)))
      assert(frac.select("id").as[Long].collect().toSet ==
        rows.filter(r => r._2 >= 1 && r._2 <= 149).map(_._1).toSet)
      val pushed = frac.queryExecution.executedPlan.collectFirst {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.metadata.getOrElse("PushedFilters", "")
      }.get
      assert(pushed.contains("GreaterThanOrEqual(a,1)") &&
        pushed.contains("LessThanOrEqual(a,149)"), s"not pushed: $pushed")
      // nulls: the rank propagates null (greatest/least would skip it),
      // the code clusters null rows at -1, and the residual BETWEEN
      // drops them — exactly the SQL BETWEEN semantics
      val nd = Seq((1L, Option(10), 5), (2L, Option.empty[Int], 6),
        (3L, Option(900), 7)).toDF("id", "a", "b")
      GeoParquet.packZOrderToParquet(nd, Seq("a", "b"), s"$dir/zn", 2)
      val gotN = GeoParquet.readZOrderRange(spark, s"$dir/zn",
        Seq(("a", 0.0, 1000.0)))
      assert(gotN.select("id").as[Long].collect().toSet == Set(1L, 3L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("incremental numeric-sidecar appends keep the lake skippable and conservative") {
    val dir = java.nio.file.Files.createTempDirectory("zappend").toFile
    try {
      // base generation: low values; appends: mid + high values — a
      // narrow box should skip files from OTHER generations entirely
      def gen(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 10000 + i).toLong, lo * 100 + i % 100, lo * 100 + (i * 7) % 100))
      val base = gen(0, 800).toDF("id", "a", "b")
      GeoParquet.packZOrderToParquet(base, Seq("a", "b"), s"$dir/z", 4)
      GeoParquet.appendNumericWithSidecar(gen(5, 800).toDF("id", "a", "b"),
        s"$dir/z", Seq("a", "b"))
      GeoParquet.appendNumericWithSidecar(gen(9, 800).toDF("id", "a", "b"),
        s"$dir/z", Seq("a", "b"))
      val total = spark.read.parquet(s"$dir/z").inputFiles.length
      // a box inside the MIDDLE generation: base + high files all skip
      val mid = GeoParquet.readZOrderRange(spark, s"$dir/z",
        Seq(("a", 500.0, 560.0), ("b", 500.0, 560.0)))
      assert(mid.inputFiles.length < total,
        s"no pruning: ${mid.inputFiles.length} of $total")
      val wantMid = (gen(0, 800) ++ gen(5, 800) ++ gen(9, 800))
        .filter(r => r._2 >= 500 && r._2 <= 560 && r._3 >= 500 && r._3 <= 560)
        .map(_._1).toSet
      assert(mid.select("id").as[Long].collect().toSet == wantMid)
      // a file appended WITHOUT a sidecar update (plain write) has no
      // entry — it must be conservatively kept, never silently skipped
      gen(3, 50).toDF("id", "a", "b").write.mode("append").parquet(s"$dir/z")
      val after = GeoParquet.readZOrderRange(spark, s"$dir/z",
        Seq(("a", 300.0, 320.0)))
      assert(after.select("id").as[Long].collect().toSet ==
        gen(3, 50).filter(r => r._2 >= 300 && r._2 <= 320).map(_._1).toSet)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("generation manifest: time-travel reads, pruning at a generation, guards") {
    val dir = java.nio.file.Files.createTempDirectory("ztimetravel").toFile
    try {
      def gen(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 10000 + i).toLong, lo * 100 + i % 100, lo * 100 + (i * 7) % 100))
      val path = s"$dir/z"
      GeoParquet.packZOrderToParquet(gen(0, 600).toDF("id", "a", "b"),
        Seq("a", "b"), path, 4)
      assert(GeoParquet.currentGeneration(spark, path) == 0)
      GeoParquet.appendNumericWithSidecar(gen(5, 600).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      GeoParquet.appendNumericWithSidecar(gen(9, 600).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      assert(GeoParquet.currentGeneration(spark, path) == 2)
      // snapshot at each generation == the batches committed so far
      def ids(g: Int) = GeoParquet.readZOrderAtGeneration(spark, path, g)
        .select("id").as[Long].collect().toSet
      assert(ids(0) == gen(0, 600).map(_._1).toSet)
      assert(ids(1) == (gen(0, 600) ++ gen(5, 600)).map(_._1).toSet)
      assert(ids(2) == (gen(0, 600) ++ gen(5, 600) ++ gen(9, 600)).map(_._1).toSet)
      // sidecar pruning still applies WITHIN a generation snapshot: a
      // box inside the middle batch scans fewer files than gen 1 holds,
      // with exact rows
      val g1Files = GeoParquet.readZOrderAtGeneration(spark, path, 1)
        .inputFiles.length
      val pruned = GeoParquet.readZOrderAtGeneration(spark, path, 1,
        Seq(("a", 500.0, 560.0)))
      assert(pruned.inputFiles.length < g1Files,
        s"no pruning: ${pruned.inputFiles.length} of $g1Files")
      assert(pruned.select("id").as[Long].collect().toSet ==
        (gen(0, 600) ++ gen(5, 600))
          .filter(r => r._2 >= 500 && r._2 <= 560).map(_._1).toSet)
      // a file written OUTSIDE the API belongs to no generation and is
      // invisible to time travel (single-writer contract)
      gen(3, 50).toDF("id", "a", "b").write.mode("append").parquet(path)
      assert(ids(2) ==
        (gen(0, 600) ++ gen(5, 600) ++ gen(9, 600)).map(_._1).toSet)
      // guards: unrecorded generation, negative, missing manifest
      intercept[IllegalArgumentException] {
        GeoParquet.readZOrderAtGeneration(spark, path, 3)
      }
      intercept[IllegalArgumentException] {
        GeoParquet.readZOrderAtGeneration(spark, path, -1)
      }
      gen(0, 10).toDF("id", "a", "b").write.parquet(s"$dir/plain")
      val e = intercept[IllegalArgumentException] {
        GeoParquet.readZOrderAtGeneration(spark, s"$dir/plain", 0)
      }
      assert(e.getMessage.contains("manifest"))
      // a PRE-MANIFEST dataset (plain parquet dir) backfills its
      // existing files as generation 0 on the first API append
      GeoParquet.appendNumericWithSidecar(gen(7, 40).toDF("id", "a", "b"),
        s"$dir/plain", Seq("a", "b"))
      assert(GeoParquet.currentGeneration(spark, s"$dir/plain") == 1)
      assert(GeoParquet.readZOrderAtGeneration(spark, s"$dir/plain", 0)
        .select("id").as[Long].collect().toSet == gen(0, 10).map(_._1).toSet)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("generation manifest under pack modes: append merges, ignore preserves, back-fill") {
    val dir = java.nio.file.Files.createTempDirectory("ztmode").toFile
    try {
      def gen(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 10000 + i).toLong, lo * 100 + i % 100, lo * 100 + (i * 7) % 100))
      val path = s"$dir/z"
      GeoParquet.packZOrderToParquet(gen(0, 200).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2)
      GeoParquet.appendNumericWithSidecar(gen(5, 200).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      assert(GeoParquet.currentGeneration(spark, path) == 1)
      // a pack in APPEND mode is one more commit, NOT a history reset
      GeoParquet.packZOrderToParquet(gen(9, 200).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2, mode = "append")
      assert(GeoParquet.currentGeneration(spark, path) == 2)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 0)
        .select("id").as[Long].collect().toSet == gen(0, 200).map(_._1).toSet)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 2).count() == 600)
      // IGNORE mode never touches an existing manifest (the write may
      // have been a no-op)
      GeoParquet.packZOrderToParquet(gen(3, 10).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2, mode = "ignore")
      assert(GeoParquet.currentGeneration(spark, path) == 2)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 2).count() == 600)
      // append-mode pack onto a PRE-MANIFEST dir back-fills old=0/new=1
      // (matching the incremental append's back-fill)
      gen(0, 50).toDF("id", "a", "b").write.parquet(s"$dir/plain")
      GeoParquet.packZOrderToParquet(gen(7, 60).toDF("id", "a", "b"),
        Seq("a", "b"), s"$dir/plain", 2, mode = "append")
      assert(GeoParquet.currentGeneration(spark, s"$dir/plain") == 1)
      assert(GeoParquet.readZOrderAtGeneration(spark, s"$dir/plain", 0)
        .count() == 50)
      assert(GeoParquet.readZOrderAtGeneration(spark, s"$dir/plain", 1)
        .count() == 110)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("append-mode pack preserves OTHER columns' sidecar entries") {
    val dir = java.nio.file.Files.createTempDirectory("zmerge").toFile
    try {
      val path = s"$dir/z"
      val rows = (0 until 400).map(i => (i.toLong, i % 100, (i * 7) % 100, i % 50))
      GeoParquet.packZOrderToParquet(rows.toDF("id", "a", "b", "c"),
        Seq("a", "b", "c"), path, 2)
      // re-pack-append on a SUBSET of columns must not drop c's entries
      GeoParquet.packZOrderToParquet(
        (400 until 800).map(i => (i.toLong, i % 100, (i * 7) % 100, 200 + i % 50))
          .toDF("id", "a", "b", "c"),
        Seq("a", "b"), path, 2, mode = "append")
      // c-range query: the ORIGINAL files' c-bounds survive, so a probe
      // outside their range prunes them while the exact residual keeps
      // results right either way
      val hi = GeoParquet.readZOrderRange(spark, path, Seq(("c", 200.0, 249.0)))
      assert(hi.select("id").as[Long].collect().toSet ==
        (400L until 800L).toSet)
      val total = spark.read.parquet(path).inputFiles.length
      assert(hi.inputFiles.length < total,
        s"c entries lost: scanned ${hi.inputFiles.length} of $total")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("point cx comparisons prune files too (no kernel predicate needed)") {
    val dir = java.nio.file.Files.createTempDirectory("pointprune").toFile
    try {
      import graft.api.GeoFrame
      import spark.implicits._
      val df = (0 until 400).map { i =>
        val x = (i % 100).toDouble
        (i.toLong, x, (i % 7).toDouble)
      }.toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
        .select("id", "pt")
        .repartitionByRange(4, col("pt.x"))
      GeoParquet.write(GeoFrame(df, "pt", "point"), s"$dir/pts", mode = "overwrite")

      SpatialFilePruning.install(spark)
      // plain cx: compiles to pt.x/pt.y comparisons, NOT a kernel call
      val q = GeoFrame(spark.read.parquet(s"$dir/pts"), "pt", "point")
        .cx(0, 0, 20, 10).df
      val rows = q.select("id").as[Long].collect().toSet
      val scanned = q.queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }.get
      assert(scanned == 1, s"expected 1 of 4 files, scanned $scanned")
      // parity with unpruned
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[SpatialFilePruning])
      val expect = GeoFrame(spark.read.parquet(s"$dir/pts"), "pt", "point")
        .cx(0, 0, 20, 10).df.select("id").as[Long].collect().toSet
      assert(rows == expect && rows.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[SpatialFilePruning])
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("multi-column sidecar prunes on whichever geometry is filtered") {
    val dir = java.nio.file.Files.createTempDirectory("multigeom").toFile
    try {
      import spark.implicits._
      // two geometry columns with OPPOSITE spatial layouts
      val df = (0 until 200).map { i =>
        val x = i % 100
        (i.toLong, Seq(x.toDouble, 0.0), Seq((99 - x).toDouble, 0.0))
      }.toDF("id", "a", "b")
        .repartitionByRange(4, element_at(col("a"), 1))
      GeoParquet.write(GeoFrame(df, "a", "multipoint"), s"$dir/two",
        mode = "overwrite", extraGeomCols = Seq("b"))

      SpatialFilePruning.install(spark)
      def scanned(c: String): Int = {
        val q = spark.read.parquet(s"$dir/two")
          .where(st_multipoint_intersects_bounds(col(c), lit(0), lit(0), lit(20), lit(5)))
        q.collect()
        q.queryExecution.executedPlan.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.inputFiles.length
        }.get
      }
      // both columns prune, selecting OPPOSITE ends of the file range
      assert(scanned("a") == 1, s"a scanned ${scanned("a")}")
      assert(scanned("b") == 1, s"b scanned ${scanned("b")}")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[SpatialFilePruning])
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("filter over sidecar'd parquet scans only intersecting files") {
    val dir = java.nio.file.Files.createTempDirectory("prunespec").toFile
    try {
      // 4 spatially-separated files: x in [0,25), [25,50), [50,75), [75,100)
      val df = (0 until 400).map { i =>
        val x = i % 100
        (i.toLong, Seq(x.toDouble, (x % 13).toDouble))
      }.toDF("id", "mp")
        .repartitionByRange(4, element_at(col("mp"), 1))
      GeoParquet.write(GeoFrame(df, "mp", "multipoint"), s"$dir/mp", mode = "overwrite")

      SpatialFilePruning.install(spark)
      val pred = st_multipoint_intersects_bounds(
        col("mp"), lit(0), lit(0), lit(20), lit(20))
      val pruned = spark.read.parquet(s"$dir/mp").where(pred)
      val rows = pruned.select("id").as[Long].collect().toSet

      // correctness: same rows as an unpruned evaluation
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[SpatialFilePruning])
      val expect = spark.read.parquet(s"$dir/mp").where(pred)
        .select("id").as[Long].collect().toSet
      assert(rows == expect && rows.nonEmpty)

      SpatialFilePruning.install(spark)
      val total = spark.read.parquet(s"$dir/mp").inputFiles.length
      val scanned = scannedFiles(spark.read.parquet(s"$dir/mp").where(pred))
      assert(total == 4, s"expected 4 files, got $total")
      assert(scanned == 1, s"expected 1 scanned file of $total, got $scanned")

      // driver-side partition sindex over the same sidecar (the
      // reference's partition_sindex): same 1-of-4 candidate set
      val Some((tree, files)) = GeoParquet.partitionSindex(s"$dir/mp", "mp")
      assert(files.length == 4)
      assert(tree.intersects(0, 0, 20, 20).length == 1)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[SpatialFilePruning])
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  private def genRows(lo: Int, n: Int) = (0 until n).map(i =>
    ((lo * 10000 + i).toLong, lo * 100 + i % 100, lo * 100 + (i * 7) % 100))

  test("compaction commits a new generation; every prior generation stays readable") {
    val dir = java.nio.file.Files.createTempDirectory("zcompact").toFile
    try {
      val path = s"$dir/z"
      GeoParquet.packZOrderToParquet(genRows(0, 600).toDF("id", "a", "b"),
        Seq("a", "b"), path, 4)
      GeoParquet.appendNumericWithSidecar(genRows(5, 600).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      GeoParquet.appendNumericWithSidecar(genRows(9, 600).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      def ids(g: Int) = GeoParquet.readZOrderAtGeneration(spark, path, g)
        .select("id").as[Long].collect().toSet
      val all = (genRows(0, 600) ++ genRows(5, 600) ++ genRows(9, 600))
        .map(_._1).toSet
      val filesBeforeCompact = GeoParquet
        .readZOrderAtGeneration(spark, path, 2).inputFiles.length
      val newGen = GeoParquet.compactZOrderGeneration(spark, path,
        Seq("a", "b"), numPartitions = 2)
      assert(newGen == 3 && GeoParquet.currentGeneration(spark, path) == 3)
      // the head snapshot: same rows, FEWER files (12 -> 2)
      val head = GeoParquet.readZOrderAtGeneration(spark, path, 3)
      assert(head.select("id").as[Long].collect().toSet == all)
      assert(head.inputFiles.length < filesBeforeCompact,
        s"no compaction: ${head.inputFiles.length} of $filesBeforeCompact")
      // time travel is PRESERVED: pre-compaction snapshots are intact
      assert(ids(0) == genRows(0, 600).map(_._1).toSet)
      assert(ids(1) == (genRows(0, 600) ++ genRows(5, 600)).map(_._1).toSet)
      assert(ids(2) == all)
      // the CURRENT-snapshot range read never double-counts: the
      // superseded files are on disk but tombstoned
      val ranged = GeoParquet.readZOrderRange(spark, path,
        Seq(("a", 0.0, 2000.0)))
      assert(ranged.select("id").as[Long].collect().toSet == all)
      // and sidecar pruning works on the compacted files too
      val probe = GeoParquet.readZOrderRange(spark, path,
        Seq(("a", 500.0, 560.0)))
      assert(probe.select("id").as[Long].collect().toSet ==
        (genRows(0, 600) ++ genRows(5, 600) ++ genRows(9, 600))
          .filter(r => r._2 >= 500 && r._2 <= 560).map(_._1).toSet)
      // an append AFTER compaction keeps composing
      GeoParquet.appendNumericWithSidecar(genRows(12, 100).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      assert(GeoParquet.currentGeneration(spark, path) == 4)
      assert(ids(4) == all ++ genRows(12, 100).map(_._1))
      assert(ids(3) == all)
      // INCREMENTAL change reads: exactly the rows that ARRIVED in the
      // window; the compaction generation (3) is a rewrite and must be
      // invisible to a change consumer
      def chg(a: Int, b: Int) = GeoParquet.readZOrderChanges(spark, path, a, b)
        .select("id").as[Long].collect().toSet
      assert(chg(-1, 0) == genRows(0, 600).map(_._1).toSet)
      assert(chg(0, 2) == (genRows(5, 600) ++ genRows(9, 600)).map(_._1).toSet)
      assert(chg(2, 3).isEmpty, "a compaction-only window must be empty")
      assert(chg(2, 4) == genRows(12, 100).map(_._1).toSet)
      // range pruning applies to the window's files too
      assert(GeoParquet.readZOrderChanges(spark, path, 0, 2,
          Seq(("a", 500.0, 560.0))).select("id").as[Long].collect().toSet ==
        (genRows(5, 600) ++ genRows(9, 600))
          .filter(r => r._2 >= 500 && r._2 <= 560).map(_._1).toSet)
      intercept[IllegalArgumentException] {
        GeoParquet.readZOrderChanges(spark, path, 0, 5)
      }
      // SECOND compaction: the manifest then carries a two-element
      // rewrite list ("_rw":[3,5]) — the state where a file-entry
      // regex scoped to the whole text (not the files block) swallowed
      // _rw as a phantom file and the strict parse bricked the dataset
      assert(GeoParquet.compactZOrderGeneration(spark, path,
        Seq("a", "b"), 2) == 5)
      assert(GeoParquet.currentGeneration(spark, path) == 5)
      assert(ids(5) == all ++ genRows(12, 100).map(_._1))
      assert(chg(4, 5).isEmpty, "the second rewrite is not an arrival")
      assert(ids(4) == all ++ genRows(12, 100).map(_._1))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("vacuum retains the newest generations, deletes dead files, is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("zvacuum").toFile
    try {
      val path = s"$dir/z"
      GeoParquet.packZOrderToParquet(genRows(0, 400).toDF("id", "a", "b"),
        Seq("a", "b"), path, 3)
      GeoParquet.appendNumericWithSidecar(genRows(5, 400).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      val all = (genRows(0, 400) ++ genRows(5, 400)).map(_._1).toSet
      val onDiskBefore = spark.read.parquet(path).inputFiles.length
      // retain 0 => only the head (gen 2) stays readable
      val deleted = GeoParquet.vacuumGenerations(spark, path, retain = 0)
      assert(deleted.nonEmpty)
      assert(GeoParquet.minReadableGeneration(spark, path) == 2)
      val e = intercept[IllegalArgumentException] {
        GeoParquet.readZOrderAtGeneration(spark, path, 1)
      }
      assert(e.getMessage.contains("vacuum"))
      // the head snapshot is untouched, on disk the dead files are gone
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 2)
        .select("id").as[Long].collect().toSet == all)
      assert(GeoParquet.readZOrderRange(spark, path, Seq(("a", 0.0, 2000.0)))
        .select("id").as[Long].collect().toSet == all)
      assert(spark.read.parquet(path).inputFiles.length < onDiskBefore)
      // idempotent: a second vacuum reclaims nothing new
      assert(GeoParquet.vacuumGenerations(spark, path, retain = 0).isEmpty)
      // a change window whose files were vacuumed away must FAIL, not
      // return a silently partial diff
      val ve = intercept[IllegalArgumentException] {
        GeoParquet.readZOrderChanges(spark, path, 0, 1)
      }
      assert(ve.getMessage.contains("vacuum"))
      // the head-only window still reads (its files are the compacted
      // ones... which are a rewrite, so the window is EMPTY — the
      // arrivals predate the vacuum horizon)
      assert(GeoParquet.readZOrderChanges(spark, path, 1, 2).count() == 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("manifest is strict: corruption is an error, never a smaller snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("zstrict").toFile
    try {
      val path = s"$dir/z"
      GeoParquet.packZOrderToParquet(genRows(0, 100).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2)
      // the checkpoint lives in the _gen/ log dir (unified ordinal
      // name, kind in the text head)
      val mf = LogLayout.genCkpts(path).head._2
      val text = new String(java.nio.file.Files.readAllBytes(mf.toPath))
      // raw edit: drop the Hadoop CRC twin too, or the checksum (not
      // the strict parse) is what trips
      def rawWrite(s: String): Unit = {
        java.nio.file.Files.write(mf.toPath, s.getBytes)
        new java.io.File(s"$path/_gen", s".${mf.getName}.crc").delete()
      }
      // truncate one entry's closing bracket — the permissive parse of
      // old rounds would silently drop entries; now it must throw
      rawWrite(text.replaceFirst("\\]", ""))
      val e = intercept[IllegalArgumentException] {
        GeoParquet.currentGeneration(spark, path)
      }
      assert(e.getMessage.contains("malformed"))
      rawWrite(text)
      assert(GeoParquet.currentGeneration(spark, path) == 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("metadata-only stats and history answer from the sidecar alone") {
    val dir = java.nio.file.Files.createTempDirectory("zstats").toFile
    try {
      val path = s"$dir/z"
      val base = genRows(0, 500)
      val app = genRows(5, 300)
      GeoParquet.packZOrderToParquet(base.toDF("id", "a", "b"),
        Seq("a", "b"), path, 3)
      GeoParquet.appendNumericWithSidecar(app.toDF("id", "a", "b"),
        path, Seq("a", "b"))
      // stats at each generation == brute-force over the prefix data
      val (n0, s0) = GeoParquet.statsAtGeneration(spark, path, 0, Seq("a"))
      assert(n0 == 500L && s0("a") ==
        (base.map(_._2).min.toDouble, base.map(_._2).max.toDouble))
      val (n1, s1) = GeoParquet.statsAtGeneration(spark, path, 1, Seq("a", "b"))
      val all = base ++ app
      assert(n1 == 800L)
      assert(s1("a") == (all.map(_._2).min.toDouble, all.map(_._2).max.toDouble))
      assert(s1("b") == (all.map(_._3).min.toDouble, all.map(_._3).max.toDouble))
      assert(GeoParquet.generationHistory(spark, path)
        .map(h => (h._1, h._2, h._4)) == Seq((0, false, 500L), (1, false, 300L)))
      // a compaction rewrite reports what it REWROTE; the snapshot
      // stats are unchanged
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      assert(GeoParquet.generationHistory(spark, path)
        .map(h => (h._1, h._2, h._4)) ==
        Seq((0, false, 500L), (1, false, 300L), (2, true, 800L)))
      assert(GeoParquet.statsAtGeneration(spark, path, 2, Seq("a")) ==
        ((800L, Map("a" -> (all.map(_._2).min.toDouble,
          all.map(_._2).max.toDouble)))))
      // an ADOPTED foreign file has no sidecar counts: stats must fail
      // fast, never silently undercount
      genRows(9, 40).toDF("id", "a", "b").write.mode("append").parquet(path)
      GeoParquet.adoptUnrecordedFiles(spark, path)
      val e = intercept[IllegalArgumentException] {
        GeoParquet.statsAtGeneration(spark, path, 3, Seq("a"))
      }
      assert(e.getMessage.contains("metadata-only stats unavailable"))
      // ...and its history row surfaces the unknown count as -1
      assert(GeoParquet.generationHistory(spark, path)
        .map(h => (h._1, h._4)).last == ((3, -1L)))
      // pre-adoption generations still answer
      assert(GeoParquet.statsAtGeneration(spark, path, 2, Seq("a"))._1 == 800L)
      // vacuum retires dead files' sidecar entries: their generations
      // report -1 instead of a stale count
      GeoParquet.vacuumGenerations(spark, path, retain = 0)
      val hist = GeoParquet.generationHistory(spark, path)
      assert(hist.filter(h => h._1 <= 1).forall(_._4 == -1L))
      assert(hist.find(_._1 == 2).get._4 == 800L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("unrecorded files are surfaced and adoptable; concurrent commits never lose history") {
    val dir = java.nio.file.Files.createTempDirectory("zcas").toFile
    try {
      val path = s"$dir/z"
      GeoParquet.packZOrderToParquet(genRows(0, 200).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2)
      // a foreign (or torn-commit) file: visible to plain reads,
      // invisible to time travel, SURFACED by the audit API
      genRows(3, 50).toDF("id", "a", "b").write.mode("append").parquet(path)
      val orphans = GeoParquet.unrecordedFiles(spark, path)
      assert(orphans.nonEmpty)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 0)
        .count() == 200)
      // explicit repair folds them into a NEW generation
      assert(GeoParquet.adoptUnrecordedFiles(spark, path) == orphans)
      assert(GeoParquet.unrecordedFiles(spark, path).isEmpty)
      assert(GeoParquet.currentGeneration(spark, path) == 1)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 1).count() == 250)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 0).count() == 200)
      // adopt with nothing to adopt: no commit written
      assert(GeoParquet.adoptUnrecordedFiles(spark, path).isEmpty)
      assert(GeoParquet.currentGeneration(spark, path) == 1)

      // an ORPHANED commit marker (a writer that died between marker
      // and manifest) must not wedge the dataset: the next commit
      // adopts it after a few stale reads
      val st = GeoParquet.readGenState(path,
        spark.sessionState.newHadoopConf()).get
      java.nio.file.Files.createFile(
        new java.io.File(s"$path/_gen", s".gencommit-${st.commit + 1}").toPath)
      GeoParquet.appendNumericWithSidecar(genRows(7, 50).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      assert(GeoParquet.currentGeneration(spark, path) == 2)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 2).count() == 300)

      // CONCURRENT API appends from 4 threads: with the old last-
      // writer-wins rename some thread's manifest entries were silently
      // clobbered (its files became permanently unrecorded); the CAS
      // loop must record every file
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = (0 until 4).map { t =>
        Future(GeoParquet.appendNumericWithSidecar(
          genRows(20 + t, 80).toDF("id", "a", "b"), path, Seq("a", "b")))
      }
      Await.result(Future.sequence(fs), 120.seconds)
      assert(GeoParquet.unrecordedFiles(spark, path).isEmpty,
        "concurrent commit lost manifest entries")
      val head = GeoParquet.currentGeneration(spark, path)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, head)
        .count() == 300 + 4 * 80)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("0-row parts never enter the manifest: empty packs, filtered appends, stats stay metadata-only") {
    // regression for the r11/r12 zorder_stats_history flake: Spark's
    // file writer emits a part file for TASK 0 even when its partition
    // is empty (schema preservation) — a 0-row file in the manifest
    // with no __rowcount sidecar twin permanently degrades the
    // metadata-only stats paths. Pin every entry point: fresh pack,
    // append-mode pack, incremental append, compaction.
    val dir = java.nio.file.Files.createTempDirectory("zemptyparts").toFile
    val conf = spark.sessionState.newHadoopConf()
    def assertMetadataConsistent(p: String): Unit = {
      val st = GeoParquet.readGenState(p, conf).get
      val counts = GeoParquet.readSidecarText(p, conf)
        .map(GeoParquet.parseSidecar(_, "__rowcount")).getOrElse(Map.empty)
      val live = st.files.collect { case (f, e) if e.removed < 0 => f }.toSet
      assert((live -- counts.keySet).isEmpty,
        s"live manifest entries with no __rowcount: ${live -- counts.keySet}")
      assert(GeoParquet.generationHistory(spark, p).forall(_._4 >= 0),
        s"unknown rowsAdded: ${GeoParquet.generationHistory(spark, p)}")
      // and stats answer from metadata at every readable generation
      (st.minGen to st.currentGen).foreach { g =>
        val (n, _) = GeoParquet.statsAtGeneration(spark, p, g, Nil)
        assert(n == GeoParquet.readZOrderAtGeneration(spark, p, g).count(),
          s"metadata count mismatch at generation $g")
      }
    }
    try {
      import spark.implicits._
      val path = s"$dir/z"
      def rows(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 1000 + i).toLong, lo * 10 + i % 10, lo * 10 + (i * 3) % 10))
      val empty = rows(0, 10).toDF("id", "a", "b").where(col("id") < 0)

      // 1. a fresh exclusive pack of an ALL-EMPTY frame was the live
      // bug: one 0-row part entered the manifest with no row count and
      // statsAtGeneration threw forever. Now: ONE schema-preserving
      // file, explicit zero count, readable and countable.
      GeoParquet.packZOrderToParquet(empty, Seq("a", "b"), path, 4)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 0).count() == 0)
      assert(GeoParquet.statsAtGeneration(spark, path, 0, Seq("a"))._1 == 0L)
      assertMetadataConsistent(path)

      // 2. a real append, then an append-mode PACK of an all-empty
      // frame: appends NOTHING — no new generation, no manifest entry,
      // no file left on disk
      GeoParquet.appendNumericWithSidecar(
        rows(1, 200).toDF("id", "a", "b"), path, Seq("a", "b"))
      val genBefore = GeoParquet.currentGeneration(spark, path)
      val filesBefore = new java.io.File(path).listFiles()
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
      GeoParquet.packZOrderToParquet(empty, Seq("a", "b"), path, 4,
        mode = "append")
      assert(GeoParquet.currentGeneration(spark, path) == genBefore,
        "all-empty append-mode pack committed a generation")
      val filesAfter = new java.io.File(path).listFiles()
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
      assert(filesAfter == filesBefore,
        "all-empty append-mode pack left files on disk")

      // 3. the original r12 reproducer shape: an incremental append
      // whose FIRST partition is filtered empty (task 0 writes the
      // 0-row part) — the empty part must be dropped, not committed
      val skewBatch = rows(2, 200).toDF("id", "a", "b")
        .repartitionByRange(2, col("id"))
        .where(col("id") >= 2100) // range partition 0 (low ids) now empty
      GeoParquet.appendNumericWithSidecar(skewBatch, path, Seq("a", "b"))
      assertMetadataConsistent(path)

      // 4. an append-mode pack of a real frame onto the skewed lake,
      // then compaction: every generation still metadata-consistent
      GeoParquet.packZOrderToParquet(rows(3, 150).toDF("id", "a", "b"),
        Seq("a", "b"), path, 3, mode = "append")
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      assertMetadataConsistent(path)
      val head = GeoParquet.currentGeneration(spark, path)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, head)
        .count() == 200 + 100 + 150)

      // 5. the numeric point-pack twin (geo bounds path) of case 1
      val p2 = s"$dir/npt"
      GeoParquet.packNumericToParquet(
        empty.withColumnRenamed("a", "x").withColumnRenamed("b", "y"),
        "x", "y", p2, 4)
      assert(GeoParquet.readNumericRange(spark, p2, 0, 0, 100, 100).count() == 0)
      assert(GeoParquet.statsAtGeneration(spark, p2, 0, Nil)._1 == 0L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("readers racing a compaction see one consistent snapshot in every interleaving") {
    import GeoParquet.{GenEntry, GenState}
    // --- unit level: reconcileListing over every list/commit order a
    // reader can observe around one compaction (old files a,b,c at
    // gens 0-1; rewrite gen 2 tombstones them and adds d,e) ---
    val pre = GenState(3, 0, Map(
      "a" -> GenEntry(0, -1), "b" -> GenEntry(0, -1), "c" -> GenEntry(1, -1)))
    val post = GenState(4, 0, Map(
      "a" -> GenEntry(0, 2), "b" -> GenEntry(0, 2), "c" -> GenEntry(1, 2),
      "rw-d" -> GenEntry(2, -1), "rw-e" -> GenEntry(2, -1)), rewrites = Set(2))
    def rec(listed: Seq[String], st: GenState) =
      GeoParquet.reconcileListing(listed.sorted, Some(st)).toSet
    // listing before any rename, manifest before the commit: old world
    assert(rec(Seq("a", "b", "c"), pre) == Set("a", "b", "c"))
    // renames visible, commit NOT yet landed (the in-flight window the
    // rw- marker exists for): rewrite output dropped, old rows once
    assert(rec(Seq("a", "b", "c", "rw-d", "rw-e"), pre) == Set("a", "b", "c"))
    // MID-rename listing, commit landed: rewrite output incomplete ->
    // the pre-rewrite snapshot stands (old kept, partial output dropped)
    assert(rec(Seq("a", "b", "c", "rw-d"), post) == Set("a", "b", "c"))
    // the r12-VERDICT interleaving, fixed by list-first: listing has
    // both copies, manifest has the tombstones -> new world exactly
    assert(rec(Seq("a", "b", "c", "rw-d", "rw-e"), post) == Set("rw-d", "rw-e"))
    // stale listing (pinned before the compaction), fresh manifest:
    // tombstones do NOT apply without their replacements -> old world
    assert(rec(Seq("a", "b", "c"), post) == Set("a", "b", "c"))
    // an unrecorded plain-named file is a foreign append: kept
    assert(rec(Seq("a", "b", "c", "part-foreign"), pre) ==
      Set("a", "b", "c", "part-foreign"))
    // a live rewrite-output file must survive its vacuumed generation
    // siblings: f added at rewrite 2 alongside g; g tombstoned at 3 and
    // vacuum (minGen 3) already deleted it from disk
    val vac = GenState(9, 3, Map(
      "rw-f" -> GenEntry(2, -1), "rw-g" -> GenEntry(2, 3),
      "h" -> GenEntry(3, -1)), rewrites = Set(2, 3))
    assert(rec(Seq("rw-f", "h"), vac) == Set("rw-f", "h"))

    // --- end-to-end: simulate the in-flight window on a real lake
    // (compaction output renamed into the live dir, commit pending) and
    // check the reader does not double-count ---
    val dir = java.nio.file.Files.createTempDirectory("zrace").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      def rows(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 1000 + i).toLong, lo * 10 + i % 10, lo * 10 + (i * 3) % 10))
      GeoParquet.packZOrderToParquet(rows(1, 300).toDF("id", "a", "b"),
        Seq("a", "b"), path, 3)
      GeoParquet.appendNumericWithSidecar(rows(2, 200).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      val full = GeoParquet.readZOrderRange(spark, path,
        Seq(("a", 0.0, 1e9))).count()
      assert(full == 500)
      // in-flight compaction: a fresh copy of every live row sits in
      // the dir under rw- names, tombstoning commit not yet landed
      val live = new java.io.File(path).listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".") && !f.getName.endsWith(".crc"))
      live.foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(path, s"rw-inflight-${f.getName}").toPath)
      }
      assert(GeoParquet.readZOrderRange(spark, path,
        Seq(("a", 0.0, 1e9))).count() == 500,
        "reader double-counted in-flight rewrite output")
      // the repair API must never adopt the duplicates either
      assert(GeoParquet.adoptUnrecordedFiles(spark, path).isEmpty)
      assert(GeoParquet.readZOrderRange(spark, path,
        Seq(("a", 0.0, 1e9))).count() == 500)
      // a real compaction over the simulated-torn state still yields
      // exactly one copy of every row at the new head
      live.foreach { f =>
        new java.io.File(path, s"rw-inflight-${f.getName}").delete() }
      val g = GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      assert(GeoParquet.readZOrderRange(spark, path,
        Seq(("a", 0.0, 1e9))).count() == 500)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, g).count() == 500)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("sidecar: frozen format version, separate CAS ordinal, legacy fallback") {
    val dir = java.nio.file.Files.createTempDirectory("scver").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def rows(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 1000 + i).toLong, lo * 10 + i % 10, lo * 10 + (i * 3) % 10))
      GeoParquet.packZOrderToParquet(rows(1, 100).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2)
      GeoParquet.appendNumericWithSidecar(rows(2, 100).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      val text = GeoParquet.readSidecarText(path, conf).get
      // the format version never moves; the CAS ordinal counts writes
      assert(text.contains("\"version\":1"), text.take(80))
      assert(GeoParquet.sidecarCommit(text).exists(_ >= 2), text.take(80))
      // a legacy sidecar (pre-r13: "version" doubled as the counter)
      // reads its version as the ordinal
      assert(GeoParquet.sidecarCommit(
        """{"version":7,"partition_bounds":{}}""") == Some(7))
      // a bounds entry that happens to be NAMED "_commit" cannot
      // shadow the header field
      assert(GeoParquet.sidecarCommit(
        """{"version":1,"_commit":3,"partition_bounds":{"c":{"_commit":[9,9,9,9]}}}""")
        == Some(3))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("vacuum reports only what it actually reclaimed; failed deletes retry") {
    val dir = java.nio.file.Files.createTempDirectory("vacdel").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      def rows(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 1000 + i).toLong, lo * 10 + i % 10, lo * 10 + (i * 3) % 10))
      GeoParquet.packZOrderToParquet(rows(1, 200).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2)
      GeoParquet.appendNumericWithSidecar(rows(2, 100).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      val before = new java.io.File(path).listFiles().map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".") &&
          !n.endsWith(".crc")).toSet
      val reclaimed = GeoParquet.vacuumGenerations(spark, path, retain = 0)
      val after = new java.io.File(path).listFiles().map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".") &&
          !n.endsWith(".crc")).toSet
      // the return value is exactly what left the disk, and a second
      // vacuum finds nothing left to do
      assert(reclaimed.toSet == before -- after)
      assert(reclaimed.nonEmpty)
      assert(GeoParquet.vacuumGenerations(spark, path, retain = 0).isEmpty)
      // the failure path itself: a non-recursive delete of a non-empty
      // directory fails on every Hadoop FS — it must land in `failed`,
      // not abort the sweep or be reported deleted
      val blocker = new java.io.File(dir, "blocked")
      assert(new java.io.File(blocker, "child").mkdirs())
      java.nio.file.Files.writeString(
        new java.io.File(blocker, "child/x.txt").toPath, "x")
      val realFile = new java.io.File(dir, "real.txt")
      java.nio.file.Files.writeString(realFile.toPath, "y")
      val (deleted, failed) = GeoParquet.deleteQuietlyEach(fs,
        new org.apache.hadoop.fs.Path(dir.getPath),
        Seq("real.txt", "blocked"))
      assert(deleted == Seq("real.txt") && failed == Seq("blocked"))
      assert(!realFile.exists() && blocker.exists())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("vacuum compacts dead tombstones: the manifest shrinks, readable generations are untouched") {
    val dir = java.nio.file.Files.createTempDirectory("ztombc").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def rows(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 1000 + i).toLong, lo * 10 + i % 10, lo * 10 + (i * 3) % 10))
      GeoParquet.packZOrderToParquet(rows(1, 300).toDF("id", "a", "b"),
        Seq("a", "b"), path, 3)
      GeoParquet.appendNumericWithSidecar(rows(2, 200).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      GeoParquet.appendNumericWithSidecar(rows(3, 100).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      val stBefore = GeoParquet.readGenState(path, conf).get
      // pin every snapshot that will REMAIN readable after the vacuum
      val keepFrom = stBefore.currentGen - 1
      val snapshots = (keepFrom to stBefore.currentGen).map { g =>
        g -> GeoParquet.readZOrderAtGeneration(spark, path, g)
          .select("id").as[Long].collect().toSet
      }
      GeoParquet.vacuumGenerations(spark, path, retain = 1)
      val stAfter = GeoParquet.readGenState(path, conf).get
      // dead tombstones are gone: strictly fewer entries, and none
      // below the horizon
      assert(stAfter.files.size < stBefore.files.size,
        s"manifest did not shrink: ${stBefore.files.size} -> ${stAfter.files.size}")
      assert(!stAfter.files.values.exists(e =>
        e.removed >= 0 && e.removed <= stAfter.minGen))
      // every still-readable generation reads back identical
      snapshots.foreach { case (g, ids) =>
        assert(GeoParquet.readZOrderAtGeneration(spark, path, g)
          .select("id").as[Long].collect().toSet == ids,
          s"generation $g changed across tombstone compaction")
      }
      // history covers only surviving generations, all with known rows
      val hist = GeoParquet.generationHistory(spark, path)
      assert(hist.forall(_._4 >= 0), s"unknown rowsAdded in $hist")
      // and the current-snapshot reader agrees
      assert(GeoParquet.readZOrderRange(spark, path, Seq(("a", 0.0, 1e9)))
        .count() == 600)
      // idempotent: nothing further to reclaim or compact
      assert(GeoParquet.vacuumGenerations(spark, path, retain = 1).isEmpty)
      assert(GeoParquet.readGenState(path, conf).get.files.size ==
        stAfter.files.size)
      // a deeper vacuum retires the older rewrite's whole generation:
      // its _rw marker must go with its entries (the _rw list is the
      // same O(compactions-ever) growth law the entry compaction fixed)
      GeoParquet.vacuumGenerations(spark, path, retain = 0)
      val stFinal = GeoParquet.readGenState(path, conf).get
      val addedGens = stFinal.files.values.map(_.added).toSet
      assert(stFinal.rewrites.subsetOf(addedGens),
        s"orphan _rw markers: ${stFinal.rewrites -- addedGens}")
      assert(stFinal.rewrites.size < stAfter.rewrites.size,
        s"rewrites did not shrink: ${stAfter.rewrites} -> ${stFinal.rewrites}")
      assert(GeoParquet.readZOrderRange(spark, path, Seq(("a", 0.0, 1e9)))
        .count() == 600)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("concurrent-compaction guard: tombstoned AND manifest-absent snapshot files abort the rival") {
    import GeoParquet.{GenEntry, GenState}
    // our compaction pinned snapshot {a, b, c}; by commit time a rival
    // rewrote a (tombstoned) and a vacuum compacted b's tombstone away
    // entirely (absent). Only c — still live — is safe.
    val cur = GenState(9, 2, Map(
      "a" -> GenEntry(0, 2), "c" -> GenEntry(0, -1),
      "rw-x" -> GenEntry(2, -1)), rewrites = Set(2))
    assert(GeoParquet.rivalTaken(Set("a", "b", "c"), cur) == Set("a", "b"),
      "tombstoned (a) and vacuum-compacted-absent (b) must both count " +
        "as taken; committing over either doubles every row at the head")
    assert(GeoParquet.rivalTaken(Set("c"), cur).isEmpty)
  }

  test("delta log: commits write O(change) deltas, fold into a checkpoint, and every generation stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("zdeltalog").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def batch(lo: Int) = Seq((lo.toLong, lo % 10, (lo * 3) % 10),
        (lo.toLong + 100000, lo % 10 + 1, (lo * 3) % 10 + 1))
        .toDF("id", "a", "b")
      def deltaFiles(): Seq[String] =
        LogLayout.genDeltas(path).map(_._2.getName)
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), path, 1)
      // first commit is the checkpoint itself — no delta
      assert(deltaFiles().isEmpty)
      // drive enough commits to cross at least one fold boundary
      // (each append = 1 manifest commit; pack was 1)
      val nAppends = GeoParquet.DeltaFoldEvery + 6
      (1 to nAppends).foreach { i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b"))
        val st = GeoParquet.readGenState(path, conf).get
        assert(st.currentGen == i, s"generation drift at append $i")
      }
      // the fold happened: far fewer deltas on disk than commits, and
      // the checkpoint carries most of the history
      val onTop = deltaFiles().size
      assert(onTop < GeoParquet.DeltaFoldEvery,
        s"fold never ran: $onTop deltas for ${nAppends + 1} commits")
      val ckptFile = LogLayout.genCkpts(path).last._2
      val ckpt = GeoParquet.parseGenState(
        java.nio.file.Files.readString(ckptFile.toPath), "ckpt")
      assert(ckpt.commit >= GeoParquet.DeltaFoldEvery,
        s"checkpoint never advanced: ${ckpt.commit}")
      // every generation reads back exactly its batches
      val head = GeoParquet.currentGeneration(spark, path)
      assert(head == nAppends)
      (0 to head).foreach { g =>
        assert(GeoParquet.readZOrderAtGeneration(spark, path, g).count() ==
          2L * (g + 1), s"wrong snapshot at generation $g")
      }
      // stats stay metadata-only across the delta/checkpoint seam
      assert(GeoParquet.statsAtGeneration(spark, path, head, Seq("a"))._1 ==
        2L * (head + 1))
      // compaction + vacuum ride the same log: tombstone compaction's
      // entry drops arrive as delta "del"s and survive a re-read
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      GeoParquet.vacuumGenerations(spark, path, retain = 0)
      val st2 = GeoParquet.readGenState(path, conf).get
      assert(st2.files.values.forall(_.removed < 0),
        "dead tombstones survived the delta-logged compaction")
      assert(GeoParquet.readZOrderRange(spark, path, Seq(("a", 0.0, 1e9)))
        .count() == 2L * (nAppends + 1))

      // a crash BETWEEN fold and cleanup leaves an older checkpoint +
      // covered deltas next to the new checkpoint: readers must take
      // the max checkpoint and ignore the stale artifacts
      val genDir = new java.io.File(s"$path/_gen")
      val stNow = GeoParquet.readGenState(path, conf).get
      // stale ordinals strictly below the live checkpoint's: a reader
      // takes the max checkpoint and filters deltas by ordinal, so
      // neither file below is ever opened
      java.nio.file.Files.writeString(
        new java.io.File(genDir, "_genckpt-1.json").toPath,
        "{this text is never read: the max-ordinal checkpoint wins}")
      java.nio.file.Files.writeString(
        new java.io.File(genDir, "_gendelta-5.json").toPath,
        "{covered delta, filtered by ordinal, never read}")
      assert(GeoParquet.readGenState(path, conf).get == stNow,
        "stale fold artifacts changed the read state")
      Seq("_genckpt-1.json", "_gendelta-5.json").foreach(n =>
        new java.io.File(genDir, n).delete())

      // LEGACY layout (pre-delta era): the checkpoint at the root as
      // _generations.json and no _gen/ dir must read, append (first
      // delta), and migrate on the first fold
      val legacy = s"$dir/legacy"
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), legacy, 1)
      val lGen = new java.io.File(s"$legacy/_gen")
      val lCkpt = LogLayout.genCkpts(legacy).head._2
      java.nio.file.Files.move(lCkpt.toPath,
        new java.io.File(legacy, "_generations.json").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(lGen)
      assert(GeoParquet.currentGeneration(spark, legacy) == 0)
      GeoParquet.appendNumericWithSidecar(batch(1), legacy, Seq("a", "b"))
      assert(GeoParquet.currentGeneration(spark, legacy) == 1)
      assert(new java.io.File(legacy, "_generations.json").exists())
      (2 to GeoParquet.DeltaFoldEvery).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), legacy, Seq("a", "b")))
      // the fold migrated: versioned checkpoint present, legacy gone
      assert(LogLayout.genCkpts(legacy).nonEmpty)
      assert(!new java.io.File(legacy, "_generations.json").exists())
      assert(GeoParquet.readZOrderAtGeneration(spark, legacy,
        GeoParquet.DeltaFoldEvery).count() ==
        2L * (GeoParquet.DeltaFoldEvery + 1))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("retention policy end-to-end: _min's reader guarantee, and over-vacuumed windows fail fast") {
    // the policy surface, hand-driven: retain=k after vacuum means
    //   - EVERY generation in [_min, head] (with _min = head - k) reads
    //     exactly and answers metadata-only stats,
    //   - EVERY read below _min fails fast naming the vacuum,
    //   - an incremental consumer can still poll (lastSeen, head] iff
    //     lastSeen + 1 >= _min; one generation staler fails fast
    //     ("no longer reconstructible"), never a partial result,
    //   - _min never moves backwards (a later, laxer vacuum cannot
    //     resurrect a guarantee already given up).
    val dir = java.nio.file.Files.createTempDirectory("retain").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def batch(lo: Int) = Seq((lo.toLong, lo % 10, (lo * 3) % 10),
        (lo.toLong + 100000, lo % 10 + 1, (lo * 3) % 10 + 1))
        .toDF("id", "a", "b").coalesce(1)
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), path, 1)
      (1 to 4).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2) // g5
      GeoParquet.appendNumericWithSidecar(batch(5), path, Seq("a", "b")) // g6
      assert(GeoParquet.currentGeneration(spark, path) == 6)
      assert(GeoParquet.minReadableGeneration(spark, path) == 0)
      // pre-vacuum: the full history is readable and reconstructible
      assert(GeoParquet.readZOrderChanges(spark, path, -1, 6).count() == 12)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 0).count() == 2)
      // vacuum(retain=2): _min = 4. The g0-g4 originals were tombstoned
      // at g5 (the compaction), 5 > _min, so nothing is deletable yet —
      // the retention guard is a POLICY line, not (yet) physics
      assert(GeoParquet.vacuumGenerations(spark, path, retain = 2).isEmpty)
      assert(GeoParquet.minReadableGeneration(spark, path) == 4)
      // _min's guarantee: every g in [4, 6] exact (snapshot + stats)
      val wantRows = Map(4 -> 10L, 5 -> 10L, 6 -> 12L)
      (4 to 6).foreach { g =>
        assert(GeoParquet.readZOrderAtGeneration(spark, path, g).count() ==
          wantRows(g), s"snapshot at g$g")
        assert(GeoParquet.statsAtGeneration(spark, path, g, Seq("a"))._1 ==
          wantRows(g), s"stats at g$g")
      }
      // below _min: fail fast, named
      val e1 = intercept[IllegalArgumentException] {
        GeoParquet.readZOrderAtGeneration(spark, path, 3) }
      assert(e1.getMessage.contains("vacuumed"))
      val e2 = intercept[IllegalArgumentException] {
        GeoParquet.statsAtGeneration(spark, path, 3, Seq("a")) }
      assert(e2.getMessage.contains("unreadable"))
      // incremental consumers: lastSeen=3 is exactly at the edge
      // (fromGen+1 == _min) and still reconstructible; the arrivals in
      // (3,6] are the g4 and g6 batches (g5 is a rewrite, skipped)
      assert(GeoParquet.readZOrderChanges(spark, path, 3, 6).count() == 4)
      val e3 = intercept[IllegalArgumentException] {
        GeoParquet.readZOrderChanges(spark, path, 2, 6) }
      assert(e3.getMessage.contains("no longer reconstructible"))
      // a later, laxer vacuum cannot move _min backwards
      GeoParquet.vacuumGenerations(spark, path, retain = 5)
      assert(GeoParquet.minReadableGeneration(spark, path) == 4)
      // the aggressive end: retain=0 keeps only the head. Now the g5
      // tombstones (removed=5 <= _min=6) are dead — bytes reclaimed
      val reclaimed = GeoParquet.vacuumGenerations(spark, path, retain = 0)
      assert(reclaimed.nonEmpty)
      assert(GeoParquet.minReadableGeneration(spark, path) == 6)
      assert(GeoParquet.readZOrderAtGeneration(spark, path, 6).count() == 12)
      // a consumer one generation stale (lastSeen=4) is cut off LOUDLY;
      // one at lastSeen=5 still reads exactly the g6 arrivals
      assert(GeoParquet.readZOrderChanges(spark, path, 5, 6).count() == 2)
      val e4 = intercept[IllegalArgumentException] {
        GeoParquet.readZOrderChanges(spark, path, 4, 6) }
      assert(e4.getMessage.contains("below the oldest readable"))
      // history stays metadata-only and all-known for what survives
      val hist = GeoParquet.generationHistory(spark, path)
      assert(hist.forall(_._4 >= 0), s"unknown row counts in $hist")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("a listing pinned across a vacuum's tombstone compaction never hands a vanished file to the scan") {
    // the race: reader lists the dir (tombstoned file X present), a
    // vacuum deletes X AND compacts X's manifest entry away, reader
    // then reads the manifest — X is now unrecorded, and the pure
    // conservative keep would put the deleted path into an explicit
    // parquet scan (FileNotFound at execution). The probed reconcile
    // drops exactly that file; live and genuinely-foreign files are
    // untouched.
    val dir = java.nio.file.Files.createTempDirectory("vacpin").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      def rows(lo: Int, n: Int) = (0 until n).map(i =>
        ((lo * 1000 + i).toLong, lo * 10 + i % 10, lo * 10 + (i * 3) % 10))
      GeoParquet.packZOrderToParquet(rows(1, 200).toDF("id", "a", "b"),
        Seq("a", "b"), path, 2)
      GeoParquet.appendNumericWithSidecar(rows(2, 100).toDF("id", "a", "b"),
        path, Seq("a", "b"))
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      // PIN the listing while the superseded files are still on disk
      val pinned = new java.io.File(path).listFiles().map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".") &&
          !n.endsWith(".crc")).toSeq.sorted
      val stPre = GeoParquet.readGenState(path, conf).get
      val tombstoned = stPre.files.collect {
        case (f, e) if e.removed >= 0 => f }.toSet
      assert(tombstoned.nonEmpty && tombstoned.subsetOf(pinned.toSet))
      // the vacuum deletes the dead files and compacts their entries
      val reclaimed = GeoParquet.vacuumGenerations(spark, path, retain = 0)
      assert(reclaimed.toSet == tombstoned)
      val stPost = GeoParquet.readGenState(path, conf).get
      assert(tombstoned.forall(f => !stPost.files.contains(f)),
        "tombstone compaction did not drop the dead entries")
      // pre-fix behavior, pinned for documentation: the pure reconcile
      // keeps the vanished files (they look like foreign appends)
      val pure = GeoParquet.reconcileListing(pinned, Some(stPost))
      assert(tombstoned.subsetOf(pure.toSet))
      // the probed reconcile drops exactly the vanished ones
      val probed = GeoParquet.reconcileListingProbed(fs, root, pinned,
        Some(stPost))
      assert(probed.toSet == pure.toSet -- tombstoned)
      assert(probed.toSet == stPost.liveAt(stPost.currentGen).toSet)
      // a genuinely-foreign file still on disk survives the probe
      java.nio.file.Files.writeString(
        new java.io.File(path, "foreign-append.parquet").toPath, "x")
      val withForeign = GeoParquet.reconcileListingProbed(fs, root,
        pinned :+ "foreign-append.parquet", Some(stPost))
      assert(withForeign.contains("foreign-append.parquet"))
      assert(new java.io.File(path, "foreign-append.parquet").delete())
      // end-to-end: the explicit-path read over the probed listing
      // returns the full snapshot (and the normal read path agrees)
      assert(spark.read.parquet(probed.map(f => s"$path/$f"): _*)
        .count() == 300)
      assert(GeoParquet.readZOrderRange(spark, path,
        Seq(("a", -1e9, 1e9))).count() == 300)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("sidecar delta log: commits write O(change) deltas, fold into the checkpoint, reads stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("scdeltalog").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def batch(lo: Int) = Seq((lo.toLong, lo % 10, (lo * 3) % 10),
        (lo.toLong + 100000, lo % 10 + 1, (lo * 3) % 10 + 1))
        .toDF("id", "a", "b").coalesce(1)
      def scFiles(p: String = path): Seq[String] =
        LogLayout.scDeltas(p).map(_._2.getName)
      def ckptFile(): java.io.File = LogLayout.scCkpts(path).last._2
      def ckptText() = java.nio.file.Files.readString(ckptFile().toPath)
      def rowCounts(): Map[String, Double] = GeoParquet.parseSidecar(
        GeoParquet.readSidecarText(path, conf).get, "__rowcount")
        .map { case (f, v) => f -> v(0) }
      // first commit is the checkpoint itself — no delta
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), path, 1)
      assert(scFiles().isEmpty)
      // appends commit O(change) deltas; the checkpoint does not move
      val rootAfterPack = ckptText()
      (1 to 5).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      assert(scFiles().size == 5, scFiles().mkString(","))
      assert(ckptText() == rootAfterPack,
        "a delta commit rewrote the checkpoint")
      // the materialized text carries the advanced ordinal and EVERY
      // file's row count — stats across the checkpoint/delta seam
      val text5 = GeoParquet.readSidecarText(path, conf).get
      assert(GeoParquet.sidecarCommit(text5).contains(6), text5.take(60))
      assert(rowCounts().values.sum == 12.0)
      // cross the fold boundary: deltas collapse into a new checkpoint
      (6 to GeoParquet.DeltaFoldEvery).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      assert(scFiles().size < GeoParquet.DeltaFoldEvery,
        s"fold never ran: ${scFiles().size} deltas")
      assert(GeoParquet.sidecarCommit(ckptText())
        .exists(_ >= GeoParquet.DeltaFoldEvery),
        "fold did not advance the checkpoint ordinal")
      assert(!new java.io.File(path, "_spatial_metadata.json").exists(),
        "fold left a root-file copy a fixed-name swap would need")
      // O(change) at the byte level: one more single-file append's
      // delta is several times smaller than the checkpoint it avoids
      GeoParquet.appendNumericWithSidecar(
        batch(GeoParquet.DeltaFoldEvery + 1), path, Seq("a", "b"))
      val deltaLen = new java.io.File(s"$path/_sc", scFiles().last).length()
      val ckptLen = ckptFile().length()
      assert(deltaLen * 4 < ckptLen,
        s"delta $deltaLen B is not O(change) vs checkpoint $ckptLen B")
      // reads stay exact across the seam: pruning, counts, generations
      val n = GeoParquet.DeltaFoldEvery + 2 // batches 0..DeltaFoldEvery+1
      assert(GeoParquet.readZOrderRange(spark, path,
        Seq(("a", 0.0, 1e9))).count() == 2L * n)
      assert(GeoParquet.statsAtGeneration(spark, path,
        GeoParquet.currentGeneration(spark, path), Seq("a"))._1 == 2L * n)
      // a stale delta BELOW the checkpoint ordinal is dead by ordinal
      // filtering — its content is never opened
      java.nio.file.Files.writeString(
        new java.io.File(s"$path/_sc", "_scdelta-1.json").toPath,
        "{this text is never read: ordinals <= the checkpoint's are dead}")
      val before = GeoParquet.readSidecarText(path, conf).get
      assert(GeoParquet.readSidecarText(path, conf).contains(before))
      new java.io.File(s"$path/_sc", "_scdelta-1.json").delete()
      // compaction + vacuum removals ride the same log: dead files'
      // entries leave every block (including __rowcount) via delta dels
      val liveBefore = rowCounts().keySet
      GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 2)
      GeoParquet.vacuumGenerations(spark, path, retain = 0)
      val countsAfter = rowCounts()
      assert(countsAfter.values.sum == 2.0 * n)
      assert(countsAfter.keySet.intersect(liveBefore).isEmpty,
        "vacuumed files still recorded in the sidecar")
      // LEGACY layout: a root checkpoint with no _sc/ at all (every
      // pre-delta-log dataset) reads verbatim and upgrades on append
      val legacy = s"$dir/legacy"
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), legacy, 1)
      val lCkpt = LogLayout.scCkpts(legacy).head._2
      java.nio.file.Files.move(lCkpt.toPath,
        new java.io.File(legacy, "_spatial_metadata.json").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$legacy/_sc"))
      val legacyRaw = java.nio.file.Files.readString(
        new java.io.File(legacy, "_spatial_metadata.json").toPath)
      assert(GeoParquet.readSidecarText(legacy, conf).contains(legacyRaw))
      GeoParquet.appendNumericWithSidecar(batch(1), legacy, Seq("a", "b"))
      assert(scFiles(legacy).nonEmpty, "append onto a legacy sidecar " +
        "must start the delta log")
      assert(GeoParquet.parseSidecar(
        GeoParquet.readSidecarText(legacy, conf).get, "__rowcount")
        .size == 2)
      // the first fold MIGRATES: versioned checkpoint lands in _sc,
      // the legacy root file is swept
      (2 to GeoParquet.DeltaFoldEvery).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), legacy, Seq("a", "b")))
      assert(LogLayout.scCkpts(legacy).nonEmpty)
      assert(!new java.io.File(legacy, "_spatial_metadata.json").exists())
      assert(GeoParquet.parseSidecar(
        GeoParquet.readSidecarText(legacy, conf).get, "__rowcount")
        .size == GeoParquet.DeltaFoldEvery + 1)
      // TORN dataset: deltas with no readable base must THROW, never
      // degrade to "no sidecar" — a conservative None would let the
      // next commit fabricate a fresh base UNDER the surviving deltas
      // (wrong-base replay / permanently non-contiguous ordinals)
      val torn = s"$dir/torn"
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), torn, 1)
      GeoParquet.appendNumericWithSidecar(batch(1), torn, Seq("a", "b"))
      LogLayout.scCkpts(torn).foreach(c => assert(c._2.delete()))
      val tornEx = intercept[java.io.IOException] {
        GeoParquet.readSidecarText(torn, conf) }
      assert(tornEx.getMessage.contains("torn dataset"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("log-read memo: a same-path rebuild never serves the dead dataset's state") {
    // the memo keys on the (name, length, mtime) listing of the log
    // artifacts. A dataset DELETED and REBUILT at the same path whose
    // checkpoint collides in all three (fixed-width part names make
    // lengths collide by construction; object-store mtimes are coarse)
    // would alias — the _genid-* dataset-identity file, created at
    // fold time and carried in the signature, is what breaks the tie.
    // This spec constructs the collision EXACTLY and proves the fresh
    // state is served.
    import GeoParquet.{GenEntry, GenState}
    val dir = java.nio.file.Files.createTempDirectory("zmemoalias").toFile
    try {
      val path = s"$dir/d"
      val conf = spark.sessionState.newHadoopConf()
      val genDir = new java.io.File(s"$path/_gen")
      assert(genDir.mkdirs())
      // same-shape states: one file each, fixed-width names, identical
      // numeric fields -> rendered texts are byte-length-equal
      val st1 = GenState(0, 0, Map("part-aaaaaaaa.parquet" -> GenEntry(0, -1)))
      val st2 = GenState(0, 0, Map("part-bbbbbbbb.parquet" -> GenEntry(0, -1)))
      val t1 = GeoParquet.renderGenState(st1)
      val t2 = GeoParquet.renderGenState(st2)
      assert(t1 != t2 && t1.length == t2.length,
        "precondition: distinct same-length checkpoint texts")
      val ckpt = new java.io.File(genDir, "_gen-0.json")
      java.nio.file.Files.writeString(ckpt.toPath, t1)
      assert(new java.io.File(genDir, "_genid-aaaaaaaaaaaa").createNewFile())
      val mt = 1700000000000L
      assert(ckpt.setLastModified(mt))
      new java.io.File(genDir, "_genid-aaaaaaaaaaaa").setLastModified(mt)
      assert(GeoParquet.readGenState(path, conf).contains(st1))
      // second read is memo-hot (same signature) and must still be st1
      assert(GeoParquet.readGenState(path, conf).contains(st1))
      val oldListing = genDir.listFiles().filterNot(_.getName
        .startsWith("_genid-")).map(f =>
        (f.getName, f.length(), f.lastModified())).toSeq.sorted
      // adversarial rebuild: delete the dataset, recreate at the SAME
      // path with the SAME checkpoint name/length/mtime but different
      // content — plus the fresh identity a real fold would write
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
      assert(genDir.mkdirs())
      java.nio.file.Files.writeString(ckpt.toPath, t2)
      assert(new java.io.File(genDir, "_genid-bbbbbbbbbbbb").createNewFile())
      assert(ckpt.setLastModified(mt))
      new java.io.File(genDir, "_genid-bbbbbbbbbbbb").setLastModified(mt)
      val newListing = genDir.listFiles().filterNot(_.getName
        .startsWith("_genid-")).map(f =>
        (f.getName, f.length(), f.lastModified())).toSeq.sorted
      assert(oldListing == newListing,
        "precondition: without the identity file the signatures collide")
      assert(GeoParquet.readGenState(path, conf).contains(st2),
        "memo served the dead dataset's state after a same-path rebuild")

      // the real write path plants the identity: a pack (first commit
      // = fold) creates _genid-*, and a pre-identity dataset (id file
      // removed, as a legacy-era lake would be) gains one at the next
      // fold without any extra per-commit work in between
      import spark.implicits._
      val real = s"$dir/real"
      def batch(lo: Int) = Seq((lo.toLong, lo % 10, (lo * 3) % 10))
        .toDF("id", "a", "b")
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), real, 1)
      def idFiles() = new java.io.File(s"$real/_gen").listFiles()
        .map(_.getName).filter(_.startsWith("_genid-")).toSeq
      assert(idFiles().nonEmpty, "pack (first fold) must plant _genid-*")
      idFiles().foreach(n => new java.io.File(s"$real/_gen", n).delete())
      (1 to GeoParquet.DeltaFoldEvery).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), real, Seq("a", "b")))
      assert(idFiles().nonEmpty, "fold must re-plant a missing _genid-*")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("manifest scale ceiling: a 10k-file state parses, renders, and round-trips in bounded time") {
    import GeoParquet.{GenEntry, GenState}
    // the per-commit driver cost at scale is parse(text) + render(next)
    // over the whole manifest — measure it at the 10k-file ceiling the
    // lake is specified for (PLANS.md records the numbers; the assert
    // is a loose non-flake bound catching accidental quadratic blowups)
    val files = (0 until 10000).map(i =>
      f"part-$i%05d-0123456789ab.c000.snappy.parquet" ->
        GenEntry(i % 50, if (i % 7 == 0) i % 50 + 1 else -1)).toMap
    val st = GenState(123, 3, files, rewrites = Set(10, 20, 30))
    val t0 = System.nanoTime()
    val text = GeoParquet.renderGenState(st)
    val parsed = GeoParquet.parseGenState(text, "ceiling-spec")
    val t1 = System.nanoTime()
    assert(parsed == st)
    val ms = (t1 - t0) / 1e6
    info(f"10k-file manifest render+parse: $ms%.1f ms, ${text.length} bytes")
    assert(ms < 10000, f"render+parse took $ms%.1f ms at 10k files")
    // liveAt + reconcileListing stay linear too. The listing is what a
    // real directory holds: every file not yet vacuumed (tombstoned
    // files stay on disk until a vacuum reclaims them) — reconciling
    // it must recover exactly the live snapshot
    val onDisk = st.files.collect {
      case (f, e) if e.removed < 0 || e.removed > st.minGen => f
    }.toSeq.sorted
    val t2 = System.nanoTime()
    val live = st.liveAt(st.currentGen)
    val rec = GeoParquet.reconcileListing(onDisk, Some(st))
    val t3 = System.nanoTime()
    assert(rec.toSet == live.toSet)
    val ms2 = (t3 - t2) / 1e6
    info(f"10k-file liveAt+reconcile: $ms2%.1f ms")
    assert(ms2 < 10000, f"liveAt+reconcile took $ms2%.1f ms at 10k files")
  }
}
