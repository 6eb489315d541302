package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.sjoin.cellSize", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/session warmup: run EVERY query once on the smallest
    // sf so the timed sf0.1 pass measures steady state, not one-time
    // codegen compilation.
    val warmDir = "/root/testdata/sf0.001"
    val warmOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.keys.filter(q => warmOnly.forall(_.contains(q))).foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => }
    }
    // median of 3 runs per query: a single-shot wall time cannot tell a
    // regression from driver-side contention (a co-scheduled process
    // inflated several r5 numbers ~3x); the median of 3 is robust to one
    // contended run while keeping the suite under a few minutes.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional comma-separated subset for targeted perf iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case t: Throwable =>
          // keep the JSON contract; failures must still be visible
          System.err.println(s"[bench] $name FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // hygiene OUTSIDE the timed window: 160+ queries in one JVM pile
      // up persisted frames and localCheckpoint blocks (queries are
      // self-contained, so dropping them between queries is safe), and
      // unreclaimed blocks inflate LATER queries' times via GC pressure
      // — an isolated run measured vocab_coverage 8x faster than the
      // same query late in a full-suite run.
      spark.catalog.clearCache()
      System.gc()
      name -> times(times.length / 2)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // stop Spark BEFORE printing so the JSON is the last stdout line
    // (shutdown logs go to stderr; the driver parses stdout).
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
