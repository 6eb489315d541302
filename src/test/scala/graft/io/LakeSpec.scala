package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-lake layout behaviors behind the merge_schema_read /
  * compact_small_files queries: the oracle gates content; these gate
  * the LAYOUT facts the oracle can't see (file counts, null-fill of
  * absent columns). */
class LakeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compaction bounds the shard count and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toFile
    try {
      val docs = (0 until 1000).map(i => (i.toLong, s"doc body $i"))
        .toDF("doc_id", "text")
      docs.repartition(32).write.parquet(s"$dir/small")
      assert(parquetFiles(s"$dir/small").size == 32)
      spark.read.parquet(s"$dir/small").repartition(3)
        .write.parquet(s"$dir/compact")
      assert(parquetFiles(s"$dir/compact").size == 3)
      val back = spark.read.parquet(s"$dir/compact")
      assert(back.count() == 1000)
      assert(back.agg(sum("doc_id")).as[Long].head == (0L until 1000L).sum)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("mergeSchema read null-fills the column the old batch lacks") {
    val dir = java.nio.file.Files.createTempDirectory("mergeschema").toFile
    try {
      Seq((1L, "en"), (2L, "fr")).toDF("doc_id", "lang")
        .write.parquet(s"$dir/b=1")
      Seq((3L, "en", 10), (4L, "zh", 20)).toDF("doc_id", "lang", "n_chars")
        .write.parquet(s"$dir/b=2")
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/b=1", s"$dir/b=2")
      assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars"))
      assert(merged.where(col("n_chars").isNull).count() == 2)
      assert(merged.agg(sum("n_chars")).as[Long].head == 30L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
