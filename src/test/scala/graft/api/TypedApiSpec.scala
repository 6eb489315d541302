package graft.api

import graft.Geo._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset[T] ergonomics (SURVEY §1.1): ordinary case classes map
  * onto the geometry schemas — a struct field IS a point, a
  * Seq[Seq[Double]] field IS a polygon — so the whole st_* catalog and
  * the typed API compose without conversions. */
object TypedFixtures {
  case class PointT(x: Double, y: Double)
  case class Site(id: Long, pt: PointT)
  case class Parcel(id: Long, poly: Seq[Seq[Double]])
  case class SiteArea(id: Long, area: Double)
}

class TypedApiSpec extends AnyFunSuite {
  import TypedFixtures._

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("case-class Datasets drive st_* and come back typed") {
    val sites = Seq(Site(1, PointT(1, 1)), Site(2, PointT(10, 10))).toDS()
    val parcels = Seq(
      Parcel(7, Seq(Seq(0.0, 0, 3, 0, 3, 3, 0, 3, 0, 0))),
      Parcel(8, Seq(Seq(8.0, 8, 12, 8, 12, 12, 8, 12, 8, 8)))).toDS()

    // expressions operate directly on the case-class fields
    val inBox = sites.where(st_point_intersects_bounds(col("pt"),
      lit(0), lit(0), lit(5), lit(5))).as[Site].collect()
    assert(inBox.toSeq == Seq(Site(1, PointT(1, 1))))

    // typed output of a spatial computation
    val areas = parcels.select(col("id"), st_area(col("poly")).as("area"))
      .as[SiteArea].collect().map(a => a.id -> a.area).toMap
    assert(areas == Map(7L -> 9.0, 8L -> 16.0))

    // typed spatial join through the grid planner
    val joined = graft.tools.SpatialJoin.gridInner(
        sites.toDF(), parcels.toDF().withColumnRenamed("id", "parcel_id"),
        col("pt"), col("poly"), "polygon", 10.0)
      .select(col("id"), col("pt")).as[Site].collect()
    assert(joined.map(_.id).toSet == Set(1L, 2L))
  }
}
