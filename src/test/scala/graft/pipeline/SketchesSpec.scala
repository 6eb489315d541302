package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate sketches can't be hash-compared to a foreign engine
  * (implementation-specific estimates); correctness here = error bounds
  * against the exact answers at test scale, plus the merge law the 100 TB
  * roll-up depends on. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  // 3 groups with known distinct counts 1000 / 200 / 7 (values overlap
  // across groups on purpose: 0..999, 500..699, 0..6)
  private lazy val df = (
    (0 until 4000).map(i => ("a", (i % 1000).toLong)) ++
    (0 until 600).map(i => ("b", (500 + i % 200).toLong)) ++
    (0 until 21).map(i => ("c", (i % 7).toLong))
  ).toDF("grp", "v")

  test("approxDistinctByGroup within rsd-implied error of exact") {
    val got = Sketches.approxDistinctByGroup(df, col("grp"), col("v"), rsd = 0.02)
      .as[(String, Long, Long)].collect()
      .map { case (g, ad, n) => g -> ((ad, n)) }.toMap
    val exact = Map("a" -> 1000L, "b" -> 200L, "c" -> 7L)
    exact.foreach { case (g, e) =>
      val (ad, _) = got(g)
      assert(math.abs(ad - e) <= math.max(1L, (e * 0.06).toLong),
        s"group $g: approx $ad vs exact $e")
    }
    assert(got("a")._2 == 4000L && got("b")._2 == 600L && got("c")._2 == 21L)
  }

  test("approxQuantilesByGroup brackets the exact quantiles") {
    val got = Sketches.approxQuantilesByGroup(df.where(col("grp") === "a"),
        col("grp"), col("v"), Seq(0.25, 0.5, 0.9))
      .select("quantiles").as[Seq[Long]].head()
    // group a holds a uniform 0..999 population
    assert(math.abs(got(0) - 250) <= 10 && math.abs(got(1) - 500) <= 10 &&
      math.abs(got(2) - 900) <= 10, s"quantiles $got")
  }

  test("hll sketches merge: union of per-group == estimate over the union") {
    val perGroup = Sketches.hllSketchByGroup(df, col("grp"), col("v"))
    assert(perGroup.count() == 3)
    val rolled = Sketches.hllUnionEstimate(perGroup)
      .as[Long].head()
    // global distinct = |0..999| = 1000; DataSketches HLL lgK=12 is ~1.6% rse
    assert(math.abs(rolled - 1000L) <= 50, s"rolled-up estimate $rolled")
    // and the roll-up equals sketching the whole table directly
    val direct = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("d"))
      .as[Long].head()
    assert(rolled == direct)
  }
}
