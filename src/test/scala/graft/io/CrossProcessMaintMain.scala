package graft.io

import org.apache.spark.sql.SparkSession

/** Child-JVM entry point for [[CrossProcessSpec]]'s vacuum race: runs
  * `cycles` maintenance rounds — compact the current snapshot, then
  * vacuum down to `retain` generations — against a dataset another
  * process is APPENDING to and a third is READING. This is the real
  * process interleaving behind the `reconcileListingProbed` guarantee
  * (a reader's pinned listing straddling a vacuum's delete +
  * compaction must drop the vanished file, not throw FileNotFound or
  * double-count); the in-process GeoPruneSpec race constructs the same
  * window synthetically. Any failure exits nonzero for the parent. */
object CrossProcessMaintMain {
  def main(args: Array[String]): Unit = {
    val Array(path, cyclesS, retainS) = args
    val cycles = cyclesS.toInt
    val retain = retainS.toInt
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("xproc-maint")
      .getOrCreate()
    try {
      (0 until cycles).foreach { _ =>
        GeoParquet.compactZOrderGeneration(spark, path, Seq("a", "b"), 1)
        GeoParquet.vacuumGenerations(spark, path, retain)
        Thread.sleep(50L)
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
