package graft.api

import graft.Geo._
import graft.io.GeoParquet
import graft.plans.{SpatialFilePruning, SpatialJoinRewrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Capstone lifecycle test — the reference's full workflow (SURVEY §3)
 * through the Spark-native machinery end-to-end:
 *
 *   pack (hilbert repartitionByRange) → parquet + bounds sidecar →
 *   PLAIN spark.read + bbox filter (SpatialFilePruning prunes files) →
 *   PLAIN join(st_intersects) (SpatialJoinRewrite plans the grid hash
 *   join) → aggregate,
 *
 * asserting both plan shape (files pruned, no nested loop) and result
 * parity with the unpruned/unrewritten evaluation.
 */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("pack -> sidecar -> pruned read -> auto sjoin -> agg") {
    val dir = java.nio.file.Files.createTempDirectory("lifecycle").toFile
    val rnd = new scala.util.Random(41)
    try {
      // world: 2000 multipoints across [0,400)^2, 12 diamond polygons
      val pts = (0 until 2000).map { i =>
        val x = rnd.nextDouble() * 400; val y = rnd.nextDouble() * 400
        (i.toLong, Seq(x, y, x + 1, y + 1))
      }.toDF("pid", "mp")
      val polys = (0 until 12).map { i =>
        val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
        val r = 10 + rnd.nextDouble() * 15
        (i.toLong, Seq(Seq(cx + r, cy, cx, cy + r, cx - r, cy, cx, cy - r, cx + r, cy)))
      }.toDF("gid", "poly")

      // 1. hilbert-pack to 8 files with the spatial sidecar
      GeoParquet.packPartitionsToParquet(GeoFrame(pts, "mp", "multipoint"),
        s"$dir/packed", numPartitions = 8, mode = "overwrite")

      SpatialFilePruning.install(spark)
      SpatialJoinRewrite.install(spark)
      try {
        spark.conf.set("spark.graft.sjoin.cellSize", "50.0")
        // 2. plain read + bbox filter: the rule must prune files
        val pred = st_multipoint_intersects_bounds(col("mp"),
          lit(0), lit(0), lit(120), lit(120))
        val filtered = spark.read.parquet(s"$dir/packed").where(pred)
        filtered.collect()
        val scanned = filtered.queryExecution.executedPlan.collectFirst {
          case s: FileSourceScanExec => s.relation.location.inputFiles.length
        }.get
        assert(scanned < 8, s"no file pruning: scanned $scanned of 8")

        // 3. plain join with the exact spatial predicate: the rule must
        // plan a hash join. Point = first coordinate pair of the multipoint.
        val withPt = filtered.withColumn("pt",
          st_point(element_at(col("mp"), 1), element_at(col("mp"), 2)))
        val joined = withPt.join(polys,
          st_intersects(withPt("pt"), polys("poly"), "polygon"))
        val agg = joined.groupBy("gid").agg(count(lit(1)).as("n"))
        val rows = agg.as[(Long, Long)].collect().toMap
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)

        // 4. parity with the naive evaluation (no rules, no pruning)
        spark.experimental.extraOptimizations = Seq.empty
        val naivePts = pts.where(pred)
          .withColumn("pt", st_point(element_at(col("mp"), 1), element_at(col("mp"), 2)))
        val expect = naivePts.join(polys,
            st_intersects(naivePts("pt"), polys("poly"), "polygon"))
          .groupBy("gid").agg(count(lit(1)).as("n"))
          .as[(Long, Long)].collect().toMap
        assert(rows == expect && rows.nonEmpty, s"got $rows want $expect")
      } finally {
        spark.experimental.extraOptimizations = Seq.empty
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
