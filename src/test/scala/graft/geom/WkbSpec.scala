package graft.geom

import graft.Geo._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WKB interop: decode golden payloads written by an INDEPENDENT
  * pure-Python WKB writer (scripts/gen_wkb_golden.py — struct.pack, no
  * shared code), byte-order handling (little/big/mixed), byte-exact
  * writer parity on the canonical little-endian rows, and pen-up-line
  * round-trips. */
class WkbSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  val golden = "src/test/resources/golden/wkb_golden.parquet"

  test("golden python-written WKB decodes to the expected WKT, any endianness") {
    val rows = spark.read.parquet(golden).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val kind = r.getAs[String]("kind")
      val one = spark.read.parquet(golden)
        .where(col("id") === r.getAs[Long]("id"))
        .select(st_astext(graft.Geo.st_geomfromwkb(col("wkb"), kind), kind).as("t"))
        .head().getString(0)
      assert(one == r.getAs[String]("wkt"), s"id=${r.getAs[Long]("id")}")
    }
  }

  test("our writer reproduces the python bytes exactly (little-endian rows)") {
    val mismatches = spark.read.parquet(golden).where(col("le"))
      .collect().filter { r =>
        val kind = r.getAs[String]("kind")
        val ours = spark.read.parquet(golden)
          .where(col("id") === r.getAs[Long]("id"))
          .select(graft.Geo.st_aswkb(st_geomfromtext(col("wkt"), kind), kind).as("b"))
          .head().getAs[Array[Byte]](0)
        !java.util.Arrays.equals(ours, r.getAs[Array[Byte]]("wkb"))
      }
    assert(mismatches.isEmpty,
      s"byte mismatch on ids ${mismatches.map(_.getAs[Long]("id")).mkString(",")}")
  }

  test("WKB round-trips every kind, including pen-up lines") {
    import spark.implicits._
    val fixtures = Seq(
      ("point", "POINT (7 -3)"),
      ("multipoint", "MULTIPOINT (1 1, 2 2)"),
      ("line", "LINESTRING (0 0, 3 4, 6 8)"),
      ("multiline", "MULTILINESTRING ((0 0, 1 0), (2 2, 3 3))"),
      ("polygon", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      ("multipolygon", "MULTIPOLYGON (((0 0, 2 0, 1 2, 0 0)), ((5 5, 7 5, 6 7, 5 5)))"))
    fixtures.foreach { case (kind, wkt) =>
      val back = Seq(wkt).toDF("w")
        .select(st_astext(graft.Geo.st_geomfromwkb(
          graft.Geo.st_aswkb(st_geomfromtext(col("w"), kind), kind), kind), kind).as("t"))
        .head().getString(0)
      assert(back == wkt, s"$kind failed WKB round trip")
    }
    // pen-up line: NaN separators export as MULTILINESTRING, and reading
    // the payload back as "line" rejoins the parts — st_length agrees
    val penUp = Seq((Seq(0.0, 0.0, 3.0, 4.0, Double.NaN, Double.NaN, 6.0, 8.0, 9.0, 12.0)))
      .toDF("line")
    val out = penUp.select(
      st_length(col("line")).as("l0"),
      st_astext(stAsWkbLine(col("line")), "multiline").as("asMulti"),
      st_length(graft.Geo.st_geomfromwkb(graft.Geo.st_aswkb(col("line"), "line"), "line")).as("l1"))
    // helper alias below keeps this readable
    val row = out.head()
    assert(row.getDouble(0) == 10.0 && row.getDouble(2) == 10.0)
    assert(row.getString(1) == "MULTILINESTRING ((0 0, 3 4), (6 8, 9 12))")
  }

  // a pen-up line's WKB payload IS a MultiLineString — decode it as one
  private def stAsWkbLine(c: org.apache.spark.sql.Column) =
    graft.Geo.st_geomfromwkb(graft.Geo.st_aswkb(c, "line"), "multiline")

  test("GeoParquet.readWkb turns a WKB parquet into a working GeoFrame") {
    val gf = graft.io.GeoParquet.readWkb(spark,
      "src/test/resources/golden/wkb_points.parquet", "wkb", "point")
    // decoded coordinates equal the x/y the python writer recorded
    assert(gf.df.where(st_x(col("geometry")) =!= col("x") ||
      st_y(col("geometry")) =!= col("y")).count() == 0)
    assert(gf.df.count() == 40)
    // and the frame is fully operational: cx + totalBounds work
    val (x0, y0, x1, y1) = gf.totalBounds
    assert(x0 >= 0 && y0 >= 0 && x1 < 100 && y1 < 100)
    assert(gf.cx(0, 0, 50, 50).df.count() > 0)
    // write-side roundtrip through writeWkb
    val dir = java.nio.file.Files.createTempDirectory("wkbw").toFile
    try {
      graft.io.GeoParquet.writeWkb(gf, s"$dir/out", mode = "overwrite")
      val back = graft.io.GeoParquet.readWkb(spark, s"$dir/out", "wkb", "point")
      assert(back.df.where(st_x(col("geometry")) =!= col("x")).count() == 0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("Z/M, EWKB and truncated payloads are rejected loudly") {
    import spark.implicits._
    def decode(bytes: Array[Byte]): Unit =
      Seq(bytes).toDF("b").select(graft.Geo.st_geomfromwkb(col("b"), "point")).collect()
    val zPoint = Array[Byte](1) ++
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(1001).array() ++ new Array[Byte](24) // ISO Z point
    intercept[Exception] { decode(zPoint) }
    val ewkb = Array[Byte](1) ++
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(0x20000001).array() ++ new Array[Byte](28) // EWKB SRID flag
    intercept[Exception] { decode(ewkb) }
    intercept[Exception] { decode(Array[Byte](1, 1, 0, 0)) } // truncated
    intercept[Exception] { decode(Array[Byte](7, 0, 0, 0, 0)) } // bad order flag
  }
}
