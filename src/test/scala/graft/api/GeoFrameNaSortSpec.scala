package graft.api

import graft.Geo._
import graft.tools.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoFrameNaSortSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("isNa / dropNa / fillNa / padNa") {
    val df = Seq(
      (1L, Some(Seq(1.0, 1, 2, 2))),
      (2L, None),
      (3L, Some(Seq(5.0, 5, 6, 6))),
      (4L, None)).toDF("id", "line")
    val gf = GeoFrame(df, "line", "line")
    assert(gf.df.select(gf.isNa).as[Boolean].collect().count(identity) == 2)
    assert(gf.dropNa.df.count() == 2)
    val filled = gf.fillNa(typedLit(Seq(0.0, 0))).df
      .select("line").as[Seq[Double]].collect()
    assert(filled.count(_ == Seq(0.0, 0)) == 2)
    val padded = gf.padNa(col("id")).df.orderBy("id")
      .select("line").as[Seq[Double]].collect()
    assert(padded(1) == Seq(1.0, 1, 2, 2) && padded(3) == Seq(5.0, 5, 6, 6))
  }

  test("backfillNa and fill limits") {
    val df = Seq(
      (1L, None), (2L, None), (3L, Some(Seq(3.0, 3))),
      (4L, None), (5L, None), (6L, None), (7L, Some(Seq(7.0, 7)))
    ).toDF("id", "mp")
    val gf = GeoFrame(df, "mp", "multipoint")
    val back = gf.backfillNa(col("id")).df.orderBy("id")
      .select("mp").collect().map(r => Option(r.getSeq[Double](0)))
    assert(back(0).contains(Seq(3.0, 3)) && back(1).contains(Seq(3.0, 3)))
    assert(back(3).contains(Seq(7.0, 7)) && back(5).contains(Seq(7.0, 7)))
    // limit=1: only the row immediately after/before a non-null fills
    val back1 = gf.backfillNa(col("id"), limit = 1).df.orderBy("id")
      .select("mp").collect().map(r => Option(r.getSeq[Double](0)))
    assert(back1(0).isEmpty && back1(1).contains(Seq(3.0, 3)))
    assert(back1(3).isEmpty && back1(4).isEmpty && back1(5).contains(Seq(7.0, 7)))
    val pad1 = gf.padNa(col("id"), limit = 1).df.orderBy("id")
      .select("mp").collect().map(r => Option(r.getSeq[Double](0)))
    assert(pad1(3).contains(Seq(3.0, 3)) && pad1(4).isEmpty && pad1(5).isEmpty)
  }

  test("padNaPartitioned matches single-window padNa") {
    val rnd = new scala.util.Random(7)
    // leading nulls (ids 0,1) stay null in both; null runs crossing
    // partition boundaries take the carry from an earlier partition
    val rows = (0L until 500L).map { i =>
      val g = if (i < 2 || rnd.nextDouble() < 0.6) None
              else Some(Seq(i.toDouble, i.toDouble))
      (i, g)
    }
    val df = spark.createDataFrame(rows).toDF("id", "line").repartition(7)
    val gf = GeoFrame(df, "line", "line")
    val expect = gf.padNa(col("id")).df.orderBy("id")
      .select("line").collect().map(r => Option(r.get(0)).map(_.toString))
    val got = gf.padNaPartitioned(col("id"), 6).df.orderBy("id")
      .select("line").collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got.toSeq == expect.toSeq)
  }

  test("backfillNaPartitioned matches single-window backfillNa") {
    val rnd = new scala.util.Random(11)
    // trailing nulls (ids 498,499) stay null in both; null runs crossing
    // partition boundaries take the carry from a LATER partition
    val rows = (0L until 500L).map { i =>
      val g = if (i >= 498 || rnd.nextDouble() < 0.6) None
              else Some(Seq(i.toDouble, i.toDouble))
      (i, g)
    }
    val df = spark.createDataFrame(rows).toDF("id", "line").repartition(7)
    val gf = GeoFrame(df, "line", "line")
    val expect = gf.backfillNa(col("id")).df.orderBy("id")
      .select("line").collect().map(r => Option(r.get(0)).map(_.toString))
    val got = gf.backfillNaPartitioned(col("id"), 6).df.orderBy("id")
      .select("line").collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got.toSeq == expect.toSeq)
  }

  test("lexicographic geometry sort, shorter-first ties") {
    val df = Seq(
      (1L, Seq(2.0, 0)),
      (2L, Seq(1.0, 5, 0, 0)),
      (3L, Seq(1.0, 5)),
      (4L, Seq(0.0, 9))).toDF("id", "mp")
    val sorted = GeoFrame(df, "mp", "multipoint").sortByGeometry
      .df.select("id").as[Long].collect().toSeq
    assert(sorted == Seq(4L, 3L, 2L, 1L)) // [0,9] < [1,5] < [1,5,0,0] < [2,0]
    // nested kind sorts on flattened coords
    val polys = Seq(
      (1L, Seq(Seq(3.0, 3, 4, 4))),
      (2L, Seq(Seq(1.0, 1), Seq(2.0, 2)))).toDF("id", "poly")
    val ps = GeoFrame(polys, "poly", "polygon").sortByGeometry
      .df.select("id").as[Long].collect().toSeq
    assert(ps == Seq(2L, 1L)) // flat [1,1,2,2] < [3,3,4,4]
  }

  test("groupBy on geometry values uses structural equality") {
    val df = Seq(
      (1L, Seq(1.0, 1)), (2L, Seq(1.0, 1)), (3L, Seq(2.0, 2))).toDF("id", "mp")
    val counts = df.groupBy("mp").count()
      .select("count").as[Long].collect().sorted.toSeq
    assert(counts == Seq(1L, 2L))
  }

  test("salted spatial join returns identical pairs to unsalted") {
    val rnd = new scala.util.Random(19)
    val pts = (0 until 400).map(i =>
        (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    val polys = (0 until 20).map { i =>
      val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
      val r = 5 + rnd.nextDouble() * 10
      (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
    }.toDF("gid", "poly")
    def pairs(salt: Int) = SpatialJoin.pointInGeom(pts, polys, "pt", "poly",
        "polygon", cellSize = 20.0, salt = salt)
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    assert(pairs(1) == pairs(4))
    assert(pairs(1).nonEmpty)
  }
}
