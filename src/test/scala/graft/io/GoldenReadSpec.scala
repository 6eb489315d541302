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

  // ---- the REFERENCE's own golden files (ecosystem interop) -----------
  // Fixtures copied verbatim from the reference test corpus
  // (reference: tests/test_data/*, written by old pyarrow/dask); the
  // assertions mirror tests/test_parquet.py:408-444. The nested-list
  // multiline layout (list<list<double>> of interleaved x/y) is exactly
  // this engine's physical schema, so the files read natively.
  val refGolden = "src/test/resources/golden/ref"

  for (f <- Seq("serial_5.0.0.parq", "serial_8.0.0.parq")) {
    test(s"reference golden file $f reads as a multiline GeoFrame") {
      val df = spark.read.parquet(s"$refGolden/$f")
      assert(df.columns.toSeq == Seq("multiline", "a"))
      assert(df.count() == 5)
      assert(df.select("a").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 5L))
      val gf = GeoFrame(df, "multiline", "multiline")
      // the geometry is computable, not just structurally readable:
      // every row has a finite positive length and finite bounds
      val lens = gf.length.select("length").collect().map(_.getDouble(0))
      assert(lens.length == 5 && lens.forall(l => l > 0 && !l.isNaN))
      val (x0, y0, x1, y1) = gf.totalBounds
      assert(!x0.isNaN && !y0.isNaN && x0 <= x1 && y0 <= y1)
    }
  }

  for ((d, repart) <- Seq(("dask_5.0.0.parq", false), ("dask_8.0.0.parq", false),
                          ("dask_repart_5.0.0.parq", true),
                          ("dask_repart_8.0.0.parq", true))) {
    test(s"reference golden dask dataset $d reads (2 partition files)") {
      // Spark skips the _metadata/_common_metadata footers automatically
      val df = spark.read.parquet(s"$refGolden/$d")
      assert(df.count() == 5)
      assert(df.select("a").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 5L))
      import org.apache.spark.sql.functions.{col, input_file_name}
      assert(df.select(input_file_name()).distinct().count() == 2)
      val gf = GeoFrame(df, "multiline", "multiline")
      val lens = gf.length.select("length").collect().map(_.getDouble(0))
      assert(lens.length == 5 && lens.forall(l => l > 0 && !l.isNaN))
      if (repart) {
        // hilbert-repartitioned layout carries the hilbert_distance
        // index; per-file ranges must not interleave (the packing
        // invariant the reference's writer guarantees)
        val byFile = df.select(input_file_name().as("f"), col("hilbert_distance"))
          .collect().groupBy(_.getString(0))
          .map { case (_, rows) =>
            val hs = rows.map(_.getLong(1))
            (hs.min, hs.max)
          }.toSeq.sortBy(_._1)
        assert(byFile.sliding(2).forall {
          case Seq((_, aMax), (bMin, _)) => aMax <= bMin
          case _ => true
        })
      } else assert(df.columns.contains("__null_dask_index__"))
    }
  }
}
