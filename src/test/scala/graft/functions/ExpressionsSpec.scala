package graft.functions

import graft.Geo._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataFrame-level golden tests for the st_* catalog (fixtures from
  * FIXTURES.md §2 / reference tests/geometry/test_geometry.py). */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  val unitCw = Seq(1.0, 1, 1, 2, 2, 2, 2, 1, 1, 1)
  val largeCcw = Seq(0.0, 0, 3, 0, 3, 3, 0, 3, 0, 0)

  test("st_area / st_length on polygon with hole; signed area preserved") {
    val df = Seq((Seq(largeCcw, unitCw), Seq(unitCw))).toDF("withHole", "cwOnly")
    val r = df.select(st_area($"withHole"), st_length($"withHole"), st_area($"cwOnly")).head()
    assert(r.getDouble(0) == 8.0 && r.getDouble(1) == 16.0 && r.getDouble(2) == -1.0)
  }

  test("st_area on multipolygon; st_length zero for points") {
    val shifted = largeCcw.map(_ + 4.0)
    val df = Seq((Seq(Seq(largeCcw, unitCw), Seq(shifted)), (1.5, 2.5)))
      .toDF("mp", "pt")
    val r = df.select(st_area($"mp"), st_length($"pt"), st_area($"pt")).head()
    assert(r.getDouble(0) == 17.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
  }

  test("st_bounds and null propagation") {
    val df = Seq((Some(unitCw), 1), (None, 2)).toDF("line", "id")
    val rows = df.select(st_bounds($"line"), $"id").orderBy($"id").collect()
    assert(rows(0).getStruct(0).toSeq == Seq(1.0, 1.0, 2.0, 2.0))
    assert(rows(1).isNullAt(0))
  }

  test("st_boundary: multipolygon -> multiline flattening") {
    val shifted = largeCcw.map(_ + 4.0)
    val df = Seq(Tuple1(Seq(Seq(largeCcw, unitCw), Seq(shifted)))).toDF("mp")
    val b = df.select(st_boundary($"mp").as("b")).head().getSeq[Seq[Double]](0)
    assert(b.length == 3)
    assert(st_lengthOf(df.select(st_length(st_boundary($"mp"))).head()) == 28.0)
  }

  private def st_lengthOf(r: org.apache.spark.sql.Row): Double = r.getDouble(0)

  test("st_oriented flips a CW shell to CCW") {
    val df = Seq(Tuple1(Seq(unitCw))).toDF("poly")
    val r = df.select(st_area(st_oriented($"poly"))).head()
    assert(r.getDouble(0) == 1.0)
  }

  test("st_hilbert_distance orders near points together") {
    val df = Seq((0.0, 0.0), (0.1, 0.1), (100.0, 100.0))
      .toDF("x", "y").withColumn("pt", st_point($"x", $"y"))
    val h = df.select(st_hilbert_distance($"pt", lit(0), lit(0), lit(100), lit(100), 15))
      .as[Long].collect()
    assert(math.abs(h(0) - h(1)) < math.abs(h(0) - h(2)))
  }

  test("WKT round trip for all six kinds") {
    val shifted = largeCcw.map(_ + 4.0)
    val df = Seq((
      (1.5, -2.5),
      Seq(1.0, 2, 3, 4),
      Seq(0.0, 0, 1, 1, 2, 0),
      Seq(Seq(0.0, 0, 1, 1), Seq(2.0, 2, 3, 3)),
      Seq(largeCcw, unitCw),
      Seq(Seq(largeCcw, unitCw), Seq(shifted))
    )).toDF("pt", "mp", "ln", "ml", "pg", "mpg")

    val texts = df.select(
      st_astext($"pt", "point"), st_astext($"mp", "multipoint"),
      st_astext($"ln", "line"), st_astext($"ml", "multiline"),
      st_astext($"pg", "polygon"), st_astext($"mpg", "multipolygon")).head()
    assert(texts.getString(0) == "POINT (1.5 -2.5)")
    assert(texts.getString(1) == "MULTIPOINT (1 2, 3 4)")
    assert(texts.getString(2) == "LINESTRING (0 0, 1 1, 2 0)")
    assert(texts.getString(4) == "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))")

    val back = df.select(
      st_geomfromtext(st_astext($"pt", "point"), "point").as("pt2"),
      st_geomfromtext(st_astext($"mp", "multipoint"), "multipoint").as("mp2"),
      st_geomfromtext(st_astext($"ln", "line"), "line").as("ln2"),
      st_geomfromtext(st_astext($"ml", "multiline"), "multiline").as("ml2"),
      st_geomfromtext(st_astext($"pg", "polygon"), "polygon").as("pg2"),
      st_geomfromtext(st_astext($"mpg", "multipolygon"), "multipolygon").as("mpg2")).head()
    assert(back.getStruct(0).toSeq == Seq(1.5, -2.5))
    assert(back.getSeq[Double](1) == Seq(1.0, 2, 3, 4))
    assert(back.getSeq[Double](2) == Seq(0.0, 0, 1, 1, 2, 0))
    assert(back.getSeq[Seq[Double]](3) == Seq(Seq(0.0, 0, 1, 1), Seq(2.0, 2, 3, 3)))
    assert(back.getSeq[Seq[Double]](4) == Seq(largeCcw, unitCw))
    assert(back.getSeq[Seq[Seq[Double]]](5) == Seq(Seq(largeCcw, unitCw), Seq(shifted)))
  }

  test("GeoJSON round trip for all six kinds") {
    val shifted = largeCcw.map(_ + 4.0)
    val df = Seq((
      (1.5, -2.5),
      Seq(1.0, 2, 3, 4),
      Seq(0.0, 0, 1, 1, 2, 0),
      Seq(Seq(0.0, 0, 1, 1), Seq(2.0, 2, 3, 3)),
      Seq(largeCcw, unitCw),
      Seq(Seq(largeCcw, unitCw), Seq(shifted))
    )).toDF("pt", "mp", "ln", "ml", "pg", "mpg")

    val texts = df.select(
      st_asgeojson($"pt", "point"), st_asgeojson($"mp", "multipoint"),
      st_asgeojson($"ln", "line"), st_asgeojson($"pg", "polygon")).head()
    assert(texts.getString(0) == """{"type":"Point","coordinates":[1.5,-2.5]}""")
    assert(texts.getString(1) == """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""")
    assert(texts.getString(2) == """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}""")
    assert(texts.getString(3).startsWith("""{"type":"Polygon","coordinates":[[[0,0],[3,0]"""))

    val back = df.select(
      st_geomfromgeojson(st_asgeojson($"pt", "point"), "point").as("pt2"),
      st_geomfromgeojson(st_asgeojson($"mp", "multipoint"), "multipoint").as("mp2"),
      st_geomfromgeojson(st_asgeojson($"ln", "line"), "line").as("ln2"),
      st_geomfromgeojson(st_asgeojson($"ml", "multiline"), "multiline").as("ml2"),
      st_geomfromgeojson(st_asgeojson($"pg", "polygon"), "polygon").as("pg2"),
      st_geomfromgeojson(st_asgeojson($"mpg", "multipolygon"), "multipolygon").as("mpg2")).head()
    assert(back.getStruct(0).toSeq == Seq(1.5, -2.5))
    assert(back.getSeq[Double](1) == Seq(1.0, 2, 3, 4))
    assert(back.getSeq[Double](2) == Seq(0.0, 0, 1, 1, 2, 0))
    assert(back.getSeq[Seq[Double]](3) == Seq(Seq(0.0, 0, 1, 1), Seq(2.0, 2, 3, 3)))
    assert(back.getSeq[Seq[Double]](4) == Seq(largeCcw, unitCw))
    assert(back.getSeq[Seq[Seq[Double]]](5) == Seq(Seq(largeCcw, unitCw), Seq(shifted)))
  }

  test("GeoJSON non-finite coordinates: pen-up lines split/rejoin, others reject") {
    import graft.geom.GeoJson
    // A pen-up line (NaN-pair separator, see StLength) becomes a
    // MultiLineString — valid RFC 7946 JSON, no bare NaN tokens.
    val nan = Double.NaN
    val penUp = Array(0.0, 0, 3, 4, nan, nan, 10, 0, 10, 2)
    val json = GeoJson.lineString(penUp)
    assert(json ==
      """{"type":"MultiLineString","coordinates":[[[0,0],[3,4]],[[10,0],[10,2]]]}""")
    // ...and reading it back as a line restores the separator, so
    // st_length round-trips (5.0 + 2.0).
    val df = Seq(Tuple1(penUp.toSeq)).toDF("ln")
    val rt = df.select(
      st_length($"ln").as("len0"),
      st_length(st_geomfromgeojson(st_asgeojson($"ln", "line"), "line")).as("len1")).head()
    assert(rt.getDouble(0) == 7.0 && rt.getDouble(1) == 7.0)
    // multiline parts with internal separators split into more parts
    val mlJson = GeoJson.multiLineString(penUp, Array(0, penUp.length))
    assert(mlJson ==
      """{"type":"MultiLineString","coordinates":[[[0,0],[3,4]],[[10,0],[10,2]]]}""")
    // leading/trailing separators collapse; all-NaN line writes empty
    assert(GeoJson.lineString(Array(nan, nan, 1.0, 0, 2, 0)) ==
      """{"type":"LineString","coordinates":[[1,0],[2,0]]}""")
    assert(GeoJson.lineString(Array(nan, nan)) ==
      """{"type":"LineString","coordinates":[]}""")
    // non-line kinds have no pen-up semantics: reject loudly
    intercept[IllegalArgumentException](GeoJson.multiPoint(Array(1.0, nan)))
    intercept[IllegalArgumentException](
      GeoJson.polygon(Array(0.0, 0, 1, 0, Double.NegativeInfinity, 1), Array(0, 6)))
    intercept[IllegalArgumentException](GeoJson.point(1.0, Double.PositiveInfinity))
    // the parser fails loudly on non-finite tokens instead of skipping
    val e1 = intercept[IllegalArgumentException](GeoJson.parse(
      """{"type":"LineString","coordinates":[[0,0],[NaN,NaN],[1,1]]}"""))
    assert(e1.getMessage.contains("invalid token"))
    val e2 = intercept[IllegalArgumentException](GeoJson.parse(
      """{"type":"LineString","coordinates":[[0,0],[-Infinity,1]]}"""))
    assert(e2.getMessage.contains("invalid number"))
  }

  test("st_collect_points builds multipoints (nulls skipped, merge across partitions)") {
    val df = spark.range(0, 1000, 1, 8)
      .select(col("id") % 10 as "k",
        when(col("id") % 97 =!= 0, (col("id") % 31).cast("double")).as("x"),
        (col("id") % 17).cast("double").as("y"))
    val viaAgg = df.groupBy(col("k"))
      .agg(st_collect_points(col("x"), col("y")).as("mp"))
      .select(col("k"), sort_array(col("mp")).as("sorted"), size(col("mp")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getInt(2))).toMap
    val viaList = df.where(col("x").isNotNull)
      .groupBy(col("k"))
      .agg(flatten(collect_list(array(col("x"), col("y")))).as("mp"))
      .select(col("k"), sort_array(col("mp")).as("sorted"), size(col("mp")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getInt(2))).toMap
    // multiset equality via sorted contents (both orders are arrival order)
    assert(viaAgg == viaList)
    // null coordinates were skipped, not zero-filled
    assert(viaAgg.values.map(_._2).sum == 2 * (1000 - 1000 / 97 - 1))

    registerAll(spark)
    df.createOrReplaceTempView("cp_in")
    val sqlN = spark.sql(
      """SELECT sum(n) FROM (
           SELECT size(st_collect_points(x, y)) AS n FROM cp_in GROUP BY k)""")
      .head().getLong(0)
    assert(sqlN == viaAgg.values.map(_._2.toLong).sum)
  }

  test("st_geom_intersects: full kind matrix goldens") {
    // big CCW square (0..3)^2 with the unit hole (1..2)^2; small square
    // inside the hole; shifted-away square; crossing "plus" rectangles
    val inHole = Seq(1.2, 1.2, 1.8, 1.2, 1.8, 1.8, 1.2, 1.8, 1.2, 1.2)
    val far = largeCcw.map(_ + 100.0)
    val wide = Seq(-10.0, 1, 10, 1, 10, 2, -10, 2, -10, 1)
    val df = Seq(1).toDF("one")
      .withColumn("holed", typedLit(Seq(largeCcw, unitCw)))
      .withColumn("inHole", typedLit(Seq(inHole)))
      .withColumn("far", typedLit(Seq(far)))
      .withColumn("wide", typedLit(Seq(wide)))
      .withColumn("innerSq",
        typedLit(Seq(Seq(0.5, 0.5, 0.7, 0.5, 0.7, 0.7, 0.5, 0.7, 0.5, 0.5))))
      .withColumn("mp", typedLit(Seq(Seq(far), Seq(inHole))))
      .withColumn("lineIn", typedLit(Seq(0.2, 0.2, 0.8, 0.8)))
      .withColumn("lineCross", typedLit(Seq(-1.0, -1.0, 4.0, 4.0)))
      .withColumn("lineFar", typedLit(Seq(50.0, 50.0, 60.0, 60.0)))
      .withColumn("mpts", typedLit(Seq(0.5, 0.5, 50.0, 50.0)))
    def b(c: org.apache.spark.sql.Column): Boolean =
      df.select(c).head().getBoolean(0)
    // polygon x polygon: containment both orders, hole exclusion, crossing
    assert(b(st_geom_intersects($"innerSq", "polygon", $"holed", "polygon")))
    assert(b(st_geom_intersects($"holed", "polygon", $"innerSq", "polygon")))
    assert(!b(st_geom_intersects($"inHole", "polygon", $"holed", "polygon")),
      "a polygon inside the hole does not intersect")
    assert(!b(st_geom_intersects($"far", "polygon", $"holed", "polygon")))
    assert(b(st_geom_intersects($"wide", "polygon", $"holed", "polygon")),
      "crossing rectangles intersect with no vertex containment")
    // multipolygon: one part in the hole (miss), so only far part decides
    assert(!b(st_geom_intersects($"mp", "multipolygon", $"holed", "polygon")))
    assert(b(st_geom_intersects($"mp", "multipolygon", $"far", "polygon")))
    // line x polygon: inside, crossing, far; line x line
    assert(b(st_geom_intersects($"lineIn", "line", $"holed", "polygon")))
    assert(b(st_geom_intersects($"holed", "polygon", $"lineCross", "line")))
    assert(!b(st_geom_intersects($"lineFar", "line", $"holed", "polygon")))
    assert(b(st_geom_intersects($"lineIn", "line", $"lineCross", "line")))
    assert(!b(st_geom_intersects($"lineIn", "line", $"lineFar", "line")))
    // multipoint: one point inside the polygon interior; (0.5,0.5) lies
    // exactly ON the diagonal lineIn segment (boundary counts); a point
    // off the diagonal misses it
    assert(b(st_geom_intersects($"mpts", "multipoint", $"holed", "polygon")))
    assert(b(st_geom_intersects($"holed", "polygon", $"mpts", "multipoint")))
    assert(b(st_geom_intersects($"mpts", "multipoint", $"lineIn", "line")))
    val mptsOff = typedLit(Seq(0.5, 0.6, 50.0, 50.0))
    assert(!b(st_geom_intersects(mptsOff, "multipoint", $"lineIn", "line")))
    // SQL surface with kind literals
    graft.Geo.registerAll(spark)
    df.createOrReplaceTempView("gi")
    val viaSql = spark.sql(
      "SELECT st_geom_intersects(innerSq, 'polygon', holed, 'polygon') FROM gi")
      .head().getBoolean(0)
    assert(viaSql)
  }

  test("SQL registry: st_* callable from spark.sql") {
    registerAll(spark)
    Seq(Tuple1(Seq(largeCcw, unitCw))).toDF("poly").createOrReplaceTempView("polys")
    val r = spark.sql(
      """SELECT st_area(poly) a, st_length(poly) l,
                st_polygon_intersects_bounds(poly, 0.5, 0.5, 0.6, 0.6) hit,
                st_astext_polygon(poly) wkt
         FROM polys""").head()
    assert(r.getDouble(0) == 8.0 && r.getDouble(1) == 16.0 && r.getBoolean(2))
    assert(r.getString(3).startsWith("POLYGON"))

    // the custom AGGREGATE and hilbert are SQL-surface citizens too
    val agg = spark.sql(
      """SELECT st_total_bounds(poly).x0 x0, st_total_bounds(poly).y1 y1,
                min(st_hilbert_distance(poly, 0, 0, 10, 10, 10)) h
         FROM polys""").head()
    assert(agg.getDouble(0) == 0.0 && agg.getDouble(1) == 3.0 && agg.getLong(2) >= 0L)
  }

  test("streaming: st_* + windowed agg over the events table shape") {
    import org.apache.spark.sql.streaming.Trigger
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts TIMESTAMP, x DOUBLE, y DOUBLE")
    val src = (0 until 100).map { i =>
      (java.sql.Timestamp.valueOf(f"2026-01-01 00:${i % 60}%02d:00"),
        (i % 10).toDouble, (i % 7).toDouble)
    }.toDF("ts", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    src.write.parquet(dir + "/in")
    val stream = spark.readStream.schema(schema).parquet(dir + "/in")
      .withColumn("pt", st_point($"x", $"y"))
      .where(st_x($"pt") < 5)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("st_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append mode holds back open windows past the watermark; the point
    // is st_* expressions compose with streaming plans without error
    assert(spark.table("st_stream").schema.fieldNames.contains("n"))
  }
}
