package graft.io

import graft.api.GeoFrame
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Backward-compat read of the version-pinned golden dataset committed in
  * test resources (analog of the reference's serial_<ver>.parq corpus,
  * reference: tests/test_parquet.py:408-444). Written by writer v0.1.0
  * (seed 123, 200 rows, 3 hilbert-packed partitions). */
class GoldenReadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  val golden = "src/test/resources/golden/points_v010"

  test("golden dataset reads with sidecar intact") {
    val gf = GeoParquet.read(spark, golden, "pt", "point")
    assert(gf.df.count() == 200)
    assert(gf.df.schema.fieldNames.toSet == Set("id", "mp", "pt", "hilbert_distance"))
    val (x0, y0, x1, y1) = gf.totalBounds
    assert(x0 >= 0 && y0 >= 0 && x1 <= 100 && y1 <= 100)
  }

  test("golden dataset bounds-pruned read still prunes correctly") {
    val full = GeoParquet.read(spark, golden, "pt", "point")
    val pruned = GeoParquet.read(spark, golden, "pt", "point",
      Some((0.0, 0.0, 20.0, 20.0)))
    import org.apache.spark.sql.functions.input_file_name
    val nf = pruned.df.select(input_file_name()).distinct().count()
    assert(nf < 3, "pruning must skip at least one of the 3 packed files")
    val inBox = full.cx(0, 0, 20, 20).df.select("id").collect().map(_.getLong(0)).toSet
    val prunedIds = pruned.df.select("id").collect().map(_.getLong(0)).toSet
    assert(inBox.subsetOf(prunedIds))
  }
}
