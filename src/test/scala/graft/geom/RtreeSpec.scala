package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** R-tree correctness vs brute force over random boxes, including degenerate
  * pages (reference: tests/spatialindex/test_rtree.py:66-224). */
class RtreeSpec extends AnyFunSuite {

  def randomBoxes(n: Int, seed: Int): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val out = new Array[Double](n * 4)
    var i = 0
    while (i < n) {
      val x0 = rnd.nextDouble() * 9
      val y0 = rnd.nextDouble() * 9
      out(i * 4) = x0
      out(i * 4 + 1) = y0
      out(i * 4 + 2) = x0 + rnd.nextDouble()
      out(i * 4 + 3) = y0 + rnd.nextDouble()
      i += 1
    }
    out
  }

  def bruteIntersects(bounds: Array[Double], q: (Double, Double, Double, Double)): Set[Int] =
    (0 until bounds.length / 4).filter { i =>
      val b = i * 4
      !(bounds(b + 2) < q._1 || bounds(b) > q._3 || bounds(b + 3) < q._2 || bounds(b + 1) > q._4)
    }.toSet

  def bruteCovers(bounds: Array[Double], q: (Double, Double, Double, Double)): Set[Int] =
    (0 until bounds.length / 4).filter { i =>
      val b = i * 4
      bounds(b) >= q._1 && bounds(b + 1) >= q._2 && bounds(b + 2) <= q._3 && bounds(b + 3) <= q._4
    }.toSet

  test("intersects and coversOverlaps match brute force") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 5, 100, 700, 1000); pageSize <- Seq(1, 4, 512)) {
      val bounds = randomBoxes(n, n + pageSize)
      val tree = HilbertRtree.build(bounds, p = 10, pageSize = pageSize)
      (1 to 20).foreach { _ =>
        val qx0 = rnd.nextDouble() * 10 - 0.5
        val qy0 = rnd.nextDouble() * 10 - 0.5
        val q = (qx0, qy0, qx0 + rnd.nextDouble() * 5, qy0 + rnd.nextDouble() * 5)
        val expected = bruteIntersects(bounds, q)
        assert(tree.intersects(q._1, q._2, q._3, q._4).toSet == expected)
        val (covers, overlaps) = tree.coversOverlaps(q._1, q._2, q._3, q._4)
        assert(covers.toSet == bruteCovers(bounds, q))
        assert(covers.toSet ++ overlaps.toSet == expected)
        assert(covers.toSet.intersect(overlaps.toSet).isEmpty)
      }
    }
  }

  test("empty tree") {
    val tree = HilbertRtree.build(Array.emptyDoubleArray)
    assert(tree.isEmpty)
    assert(tree.intersects(0, 0, 1, 1).isEmpty)
    assert(tree.totalBounds._1.isNaN)
  }

  test("totalBounds matches data") {
    val bounds = randomBoxes(200, 3)
    val tree = HilbertRtree.build(bounds)
    val tb = tree.totalBounds
    val xs0 = (0 until 200).map(i => bounds(i * 4)).min
    val ys0 = (0 until 200).map(i => bounds(i * 4 + 1)).min
    val xs1 = (0 until 200).map(i => bounds(i * 4 + 2)).max
    val ys1 = (0 until 200).map(i => bounds(i * 4 + 3)).max
    assert(tb == ((xs0, ys0, xs1, ys1)))
  }
}
