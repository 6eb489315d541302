package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  /** Plain single-threaded replay of the scaled-integer formula —
    * an implementation with no Spark machinery to disagree with. */
  private def refRanks(edges: Seq[(String, String)], iters: Int,
                       scale: Long = 1000000000L, num: Long = 17L,
                       den: Long = 20L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * (den - num) / den
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => (r(s) * num) / (den * deg(s)) }.sum
      }
      r = nodes.map(n => n -> (base + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("integer pagerank matches the single-threaded reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 120).map { _ =>
      (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}")
    }.distinct.filter(e => e._1 != e._2)
    for (iters <- Seq(1, 5)) {
      val got = Graphs.pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters)
        .as[(String, Long)].collect().toMap
      assert(got == refRanks(edges, iters), s"iters $iters")
    }
  }

  test("pagerank ranks a hub above leaves and conserves the dangling-free total") {
    // star + cycle: c0 -> c1 -> c2 -> c0 plus leaves l1,l2 -> c0
    val edges = Seq(("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
      ("l1", "c0"), ("l2", "c0")).toDF("src", "dst")
    val r = Graphs.pageRankInt(edges, "src", "dst", iters = 10)
      .as[(String, Long)].collect().toMap
    // leaves get only the base mass; cycle nodes accumulate flow
    assert(r("l1") == r("l2"))
    assert(r("c0") > r("c1") && r("c1") > r("c2") && r("c2") > r("l1"))
  }
}
