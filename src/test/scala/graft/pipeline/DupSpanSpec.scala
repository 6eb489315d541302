package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-span removal (exact-substring dedup) semantics. */
class DupSpanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], span: Int = 4): Map[Long, (String, Long, Long)] =
    Dedup.removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", span)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, k, r) => id -> ((t, k, r)) }.toMap

  private val words = ('a' to 'z').map(c => s"w$c")

  test("full copy of an earlier doc collapses to empty; the first holder is untouched") {
    val text = words.take(10).mkString(" ")
    val out = run(Seq(1L -> text, 2L -> text))
    assert(out(1L) == ((text, 10L, 0L)))
    assert(out(2L) == (("", 0L, 10L)))
  }

  test("partially-copied doc loses exactly the covered windows, keeps novel text") {
    // doc 2 embeds doc 1's full 6 tokens between novel prefix/suffix:
    // every 4-window inside the copied block is duplicate; the covered
    // region is exactly the 6 copied tokens (novel neighbors break the
    // boundary windows)
    val copied = words.take(6).mkString(" ")
    val d2 = s"novelA novelB $copied novelY novelZ"
    val out = run(Seq(1L -> copied, 2L -> d2))
    assert(out(1L)._1 == copied)
    assert(out(2L) == (("novelA novelB novelY novelZ", 4L, 6L)))
  }

  test("within-doc repetition is not removed; short docs pass through ws-normalized") {
    val rep = "x y x y x y" // repeated bigram, but no EARLIER doc holds it
    val short = "only  three\ttokens"
    val out = run(Seq(1L -> rep, 2L -> short))
    assert(out(1L) == ((rep, 6L, 0L)))
    assert(out(2L) == (("only three tokens", 3L, 0L)))
  }

  test("overlapping duplicate windows merge their coverage (no double removal)") {
    // doc 2 = doc 1's 5 tokens: windows at positions 0 and 1 overlap on
    // tokens 1..3; the union covers all 5 exactly once
    val t5 = words.take(5).mkString(" ")
    val out = run(Seq(1L -> t5, 2L -> t5))
    assert(out(2L) == (("", 0L, 5L)))
  }

  test("chain of copies: each doc deduped against ALL earlier holders, not just the first") {
    val text = words.take(8).mkString(" ")
    val out = run(Seq(3L -> text, 7L -> text, 9L -> text))
    assert(out(3L)._1 == text)
    assert(out(7L)._1 == "")
    assert(out(9L)._1 == "")
  }
}
