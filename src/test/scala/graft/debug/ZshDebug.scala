package graft.debug

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary round-12 debug harness for the zorder_stats_history
  * sf0.1 failure: replays the query's exact lake-building steps and
  * prints, after every commit, the manifest's file set vs the
  * sidecar's __rowcount file set. */
object ZshDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = "/tmp/graft_zsh_debug"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val zcols = Seq("l_quantity", "l_extendedprice")
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select(col("l_orderkey"),
      col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val conf = spark.sessionState.newHadoopConf()

    def dump(stage: String): Unit = {
      val st = graft.io.GeoParquet.readGenState(out, conf)
      val sc = graft.io.GeoParquet.readSidecarText(out, conf)
      val counts = sc.map(graft.io.GeoParquet.parseSidecar(_, "__rowcount"))
        .getOrElse(Map.empty)
      val manifest = st.map(_.files.keySet).getOrElse(Set.empty)
      val missing = manifest -- counts.keySet
      println(s"== $stage: manifest=${manifest.size} counts=${counts.size} " +
        s"missing=${missing.size} ${missing.toSeq.sorted.mkString(", ")}")
      if (missing.nonEmpty && st.isDefined)
        missing.toSeq.sorted.foreach { f =>
          println(s"   missing $f -> gen ${st.get.files(f)}")
        }
    }

    graft.io.GeoParquet.packZOrderToParquet(
      li.where(col("l_orderkey") % 4 === 0), zcols, out, numPartitions = 3)
    dump("pack(gen0)")
    graft.io.GeoParquet.appendNumericWithSidecar(
      li.where(col("l_orderkey") % 4 === 1), out, zcols)
    dump("append1(gen1)")
    graft.io.GeoParquet.appendNumericWithSidecar(
      li.where(col("l_orderkey") % 4 === 2), out, zcols)
    dump("append2(gen2)")
    val g = graft.io.GeoParquet.compactZOrderGeneration(
      spark, out, zcols, numPartitions = 2)
    println(s"compaction returned gen $g")
    dump("compact(gen3)")
    graft.io.GeoParquet.appendNumericWithSidecar(
      li.where(col("l_orderkey") % 4 === 3), out, zcols)
    dump("append3(gen4)")
    val hist = graft.io.GeoParquet.generationHistory(spark, out)
    hist.foreach { case (gen, rw, nf, rows) =>
      println(s"gen=$gen rewrite=$rw files=$nf rowsAdded=$rows")
    }
    spark.stop()
  }
}
