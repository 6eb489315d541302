package graft.io

import org.apache.spark.sql.SparkSession

/** Child-JVM entry point for [[CrossProcessSpec]]: appends `count`
  * 2-row batches to the shared dataset at `path` through the public
  * append API, each batch carrying ids derived from `lo` so the parent
  * can prove no batch was lost or duplicated. Runs in its OWN process
  * (own JVM, own SparkSession, own filesystem handles) — this is what
  * exercises the `_gen`/`_sc` exclusive-create CAS across real process
  * boundaries, which an in-process multi-thread spec cannot. */
object CrossProcessAppendMain {
  def main(args: Array[String]): Unit = {
    val Array(path, loS, countS) = args
    val lo = loS.toInt
    val count = countS.toInt
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName(s"xproc-appender-$lo")
      .getOrCreate()
    try {
      import spark.implicits._
      (0 until count).foreach { i =>
        val k = lo + i
        val base = k.toLong * 1000L
        val df = Seq(
          (base, k % 10, (k * 3) % 10),
          (base + 1L, k % 10 + 1, (k * 3) % 10 + 1))
          .toDF("id", "a", "b").coalesce(1)
        GeoParquet.appendNumericWithSidecar(df, path, Seq("a", "b"))
      }
    } finally spark.stop()
    // Spark leaves non-daemon threads behind; the work is done and
    // verified by the parent from the dataset itself
    sys.exit(0)
  }
}
