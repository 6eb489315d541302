package graft.api

import graft.Geo._
import graft.io.GeoParquet
import graft.tools.SpatialJoin
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoFrameSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  def pointsDf(n: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("id", "x", "y")
      .withColumn("pt", st_point(col("x"), col("y")))
  }

  test("construction rejects non-float64 coordinates, bad kinds, missing columns") {
    // int coordinate arrays: the reference's polygon[int32] subtype is
    // deliberately f64-only here (SURVEY §1.4) — must fail at wrap time
    val intLines = Seq((1L, Seq(0, 0, 3, 4))).toDF("id", "geom")
    val e = intercept[IllegalArgumentException] {
      GeoFrame(intLines, "geom", "line")
    }
    assert(e.getMessage.contains("float64"))
    intercept[IllegalArgumentException] {
      GeoFrame(pointsDf(3), "pt", "hexagon") // unknown kind
    }
    intercept[IllegalArgumentException] {
      GeoFrame(pointsDf(3), "nope", "point") // missing column
    }
    // the double twin of the int frame constructs fine
    val okLines = Seq((1L, Seq(0.0, 0.0, 3.0, 4.0))).toDF("id", "geom")
    assert(GeoFrame(okLines, "geom", "line").length.count() == 1)
  }

  test("cx bbox selection matches brute-force filter; inverted bounds normalized") {
    val df = pointsDf(500)
    val gf = GeoFrame(df, "pt", "point")
    val expected = df.where(col("x").between(20, 60) && col("y").between(30, 70))
      .select("id").as[Long].collect().toSet
    assert(gf.cx(20, 30, 60, 70).df.select("id").as[Long].collect().toSet == expected)
    // inverted rect (reference normalizes: base.py:684-688)
    assert(gf.cx(60, 70, 20, 30).df.select("id").as[Long].collect().toSet == expected)
  }

  test("totalBounds matches min/max") {
    val df = pointsDf(200)
    val gf = GeoFrame(df, "pt", "point")
    val r = df.agg(min("x"), min("y"), max("x"), max("y")).head()
    val tb = gf.totalBounds
    assert(tb == ((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))))
  }

  test("cxOpen: open slice ends default to total bounds") {
    val df = pointsDf(200)
    val gf = GeoFrame(df, "pt", "point")
    // only an upper x bound: everything with x <= 40 (y unbounded)
    val open = gf.cxOpen(x1 = Some(40.0)).df.select("id").as[Long].collect().toSet
    val expect = df.where(col("x") <= 40.0).select("id").as[Long].collect().toSet
    assert(open == expect && open.nonEmpty)
    // all ends open = identity
    assert(gf.cxOpen().df.count() == df.count())
  }

  test("st_total_bounds_agg == min/max compose, skips empties, groups") {
    val df = Seq(
      ("a", Seq(1.0, 2.0, 3.0, 4.0)),
      ("a", Seq.empty[Double]),
      ("b", Seq(5.0, 6.0)),
      ("b", Seq(-1.0, 9.0))).toDF("k", "mp")
    val r = df.groupBy("k")
      .agg(st_total_bounds_agg(col("mp")).as("tb"))
      .orderBy("k")
      .select(col("k"), col("tb.x0"), col("tb.y0"), col("tb.x1"), col("tb.y1"))
      .collect()
    assert(r(0).toSeq == Seq("a", 1.0, 2.0, 3.0, 4.0))
    assert(r(1).toSeq == Seq("b", -1.0, 6.0, 5.0, 9.0))
    // all-empty group -> all-null struct
    val empty = Seq(("z", Seq.empty[Double])).toDF("k", "mp")
      .agg(st_total_bounds_agg(col("mp")).as("tb")).select("tb.x0").head()
    assert(empty.isNullAt(0))
  }

  test("totalBounds ignores empty/all-NaN geometries (ADVICE r1)") {
    // an empty multipoint has NaN per-row bounds; the frame totals must
    // skip it like the reference's bounds kernels skip non-finite coords
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq.empty[Double]),
      (3L, Seq(5.0, 6.0))).toDF("id", "mp")
    val tb = GeoFrame(df, "mp", "multipoint").totalBounds
    assert(tb == ((1.0, 2.0, 5.0, 6.0)), s"got $tb")
  }

  test("packPartitions: hilbert ranges of partitions are disjoint and sorted") {
    // port of the reference's pack sortedness property (test_parquet.py:136-167)
    val gf = GeoFrame(pointsDf(1000), "pt", "point").packPartitions(8)
    val stats = gf.df
      .select(col("hilbert_distance"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(min("hilbert_distance").as("lo"), max("hilbert_distance").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("pid").collect()
    assert(stats.map(_.getLong(3)).sum == 1000)
    val nonEmpty = stats.filter(_.getLong(3) > 0)
    nonEmpty.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"partition ranges overlap: $a vs $b")
      case _ =>
    }
    // within-partition sortedness
    val sortedOk = gf.df.select("hilbert_distance").rdd
      .mapPartitions { it =>
        val v = it.map(_.getLong(0)).toArray
        Iterator.single(v.sameElements(v.sorted))
      }.collect()
    assert(sortedOk.forall(identity))
  }

  test("packPartitions(curve=morton): z-order ranges disjoint, values match MortonCurve") {
    val gf = GeoFrame(pointsDf(1000), "pt", "point")
      .packPartitions(8, curve = "morton")
    val stats = gf.df
      .select(col("morton_distance"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(min("morton_distance").as("lo"), max("morton_distance").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("pid").collect()
    assert(stats.map(_.getLong(3)).sum == 1000)
    stats.filter(_.getLong(3) > 0).sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"partition ranges overlap: $a vs $b")
      case _ =>
    }
    // the expression agrees with the scalar curve on every row
    val base = GeoFrame(pointsDf(1000), "pt", "point")
    val (tx0, ty0, tx1, ty1) = base.totalBounds
    base.mortonDistance(15).select(col("pt.x"), col("pt.y"), col("morton_distance"))
      .collect().foreach { r =>
        val exp = graft.geom.MortonCurve.distanceFromBounds(15,
          r.getDouble(0), r.getDouble(1), r.getDouble(0), r.getDouble(1),
          tx0, ty0, tx1, ty1)
        assert(r.getLong(2) == exp)
      }
  }

  test("GeoParquet round trip + sidecar + bounds-pruned read") {
    val dir = Files.createTempDirectory("geoparquet").toString + "/pts"
    val gf = GeoFrame(pointsDf(1000), "pt", "point").packPartitions(4)
    GeoParquet.write(gf.copy(df = gf.df.drop("x", "y")), dir)

    // the sidecar lives as a versioned checkpoint in _sc/ (the root
    // name remains only as the pre-delta-log legacy base)
    assert(GeoParquet.readSidecarText(dir,
      spark.sessionState.newHadoopConf()).exists(_.contains("partition_bounds")))
    assert(graft.io.LogLayout.scCkpts(dir).nonEmpty)
    val full = GeoParquet.read(spark, dir, "pt", "point")
    assert(full.df.count() == 1000)

    // pruned read must return a subset of files but ALL rows whose file
    // bounds intersect the query box (partition-pruning semantics — no
    // residual row filter, like read_parquet_dask(bounds=...))
    val pruned = GeoParquet.read(spark, dir, "pt", "point", Some((0.0, 0.0, 10.0, 10.0)))
    val prunedFiles = pruned.df.select(input_file_name()).distinct().count()
    val allFiles = full.df.select(input_file_name()).distinct().count()
    assert(allFiles == 4)
    assert(prunedFiles < allFiles, "hilbert packing should let a small box prune files")
    // every point in the box must survive pruning
    val inBox = full.cx(0, 0, 10, 10).df.select("id").as[Long].collect().toSet
    val prunedIds = pruned.df.select("id").as[Long].collect().toSet
    assert(inBox.subsetOf(prunedIds))

    // disjoint query box -> empty
    val none = GeoParquet.read(spark, dir, "pt", "point", Some((500.0, 500.0, 600.0, 600.0)))
    assert(none.df.count() == 0)
  }

  test("sjoin left/right keep unmatched rows with nulls") {
    val pts = Seq((1L, 5.0, 5.0), (2L, 50.0, 50.0), (3L, 95.0, 95.0))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    // one square polygon covering (0..10, 0..10)
    val polys = Seq((100L, Seq(Seq(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0))))
      .toDF("gid", "poly")
    val inner = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon", 16.0)
    assert(inner.select("pid", "gid").as[(Long, Long)].collect().toSeq == Seq((1L, 100L)))

    val left = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon", 16.0,
      how = "left", leftKey = "pid")
    val leftRows = left.select("pid", "gid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(leftRows == Set((1L, 100L), (2L, -1L), (3L, -1L)))

    val polys2 = polys.unionAll(
      Seq((200L, Seq(Seq(90.0, 90.0, 99.0, 90.0, 99.0, 99.0, 90.0, 99.0, 90.0, 90.0))))
        .toDF("gid", "poly"))
    val right = SpatialJoin.pointInGeom(pts, polys2, "pt", "poly", "polygon", 16.0,
      how = "right", rightKey = "gid")
    val rightRows = right.select("gid", "pid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rightRows == Set((100L, 1L), (200L, 3L)))
  }

  test("GeoFrame.sjoin dispatches by left kind (point grid vs geom grid)") {
    val pts = Seq((1L, 5.0, 5.0), (2L, 50.0, 50.0))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    val polys = Seq((100L, Seq(Seq(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0))))
      .toDF("gid", "poly")
    val viaPoint = GeoFrame(pts, "pt", "point")
      .sjoin(GeoFrame(polys, "poly", "polygon"), cellSize = 16.0)
      .select("pid", "gid").as[(Long, Long)].collect().toSeq
    assert(viaPoint == Seq((1L, 100L)))
    // non-point left side routes through the full-matrix geometry join
    val segs = Seq((1L, Seq(2.0, 2.0, 8.0, 8.0)), (2L, Seq(40.0, 40.0, 45.0, 45.0)))
      .toDF("sid", "seg")
    val viaGeom = GeoFrame(segs, "seg", "line")
      .sjoin(GeoFrame(polys, "poly", "polygon"), cellSize = 16.0)
      .select("sid", "gid").as[(Long, Long)].collect().toSeq
    assert(viaGeom == Seq((1L, 100L)))
    // left join through the geometry path keeps unmatched rows
    val geomLeft = GeoFrame(segs, "seg", "line")
      .sjoin(GeoFrame(polys, "poly", "polygon"), how = "left",
        cellSize = 16.0, leftKey = "sid")
      .select("sid", "gid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(geomLeft == Set((1L, 100L), (2L, -1L)))
  }

  test("sindex: driver R-tree probes match brute-force bbox filters") {
    val rnd = new scala.util.Random(71)
    val pts = (0 until 400).map(i =>
        (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("id", "pt")
      // a null geometry row must be skipped by the index build
      .unionByName(Seq((999L, -1.0)).toDF("id", "z")
        .select(col("id"), lit(null).cast(pts0Schema).as("pt")))
    val gf = GeoFrame(pts, "pt", "point")
    val idx = gf.sindex("id")
    assert(idx.size == 400)
    val got = idx.intersects(20, 30, 60, 70).toSet
    val want = gf.cx(20, 30, 60, 70).df.select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
    // points: every intersecting bbox is fully covered by the box
    val (covers, overlaps) = idx.coversOverlaps(20, 30, 60, 70)
    assert(covers.toSet == want && overlaps.isEmpty)
    // degenerate probe off the data: empty, not an error
    assert(idx.intersects(1000, 1000, 1001, 1001).isEmpty)
  }

  test("positional slice/take match iloc semantics under the explicit order") {
    val rnd = new scala.util.Random(83)
    val rows = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    val pts = rows.toDF("id", "x", "y")
      .withColumn("pt", st_point(col("x"), col("y"))).select("id", "pt")
    val gf = GeoFrame(pts, "pt", "point")
    val ord = Seq(col("pt.x"), col("pt.y"), col("id"))
    // the oracle order computed locally: (x, y, id)
    val sorted = rows.sortBy(r => (r._2, r._3, r._1)).map(_._1)
    val sliced = gf.slicePositional(3, 40, 5, 8, ord: _*)
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(sliced == (3L until 40L by 5L).map(p => sorted(p.toInt)).toSet)
    val taken = gf.takePositional(Seq(0L, 7L, 499L), 8, ord: _*)
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(taken == Set(sorted(0), sorted(7), sorted(499)))
    // out-of-range take positions select nothing (documented contract)
    assert(gf.takePositional(Seq(10000L), 8, ord: _*).df.count() == 0)
    // guards fail fast
    intercept[IllegalArgumentException] {
      gf.slicePositional(-1, 5, 1, 8, ord: _*)
    }
    intercept[IllegalArgumentException] {
      gf.takePositional(Nil, 8, ord: _*)
    }
    spark.catalog.clearCache() // release the rank cache pinned by globalRowNumber
  }

  private def pts0Schema: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.DoubleType)))
}
