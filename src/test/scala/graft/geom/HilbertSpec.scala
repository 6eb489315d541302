package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference Hilbert-curve tests: exhaustive round-trip and
  * adjacency at small p (reference: tests/spatialindex/test_hilbert_curve.py:29-78). */
class HilbertSpec extends AnyFunSuite {

  test("p=1 canonical order (0,0)->(0,1)->(1,1)->(1,0)") {
    val coords = (0L until 4L).map(HilbertCurve.coordinateFromDistance(1, _))
    assert(coords == Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)))
    (0L until 4L).foreach { h =>
      val (x, y) = HilbertCurve.coordinateFromDistance(1, h)
      assert(HilbertCurve.distanceFromCoordinate(1, x, y) == h)
    }
  }

  test("exhaustive round-trip + unit-step adjacency for p <= 6") {
    for (p <- 1 to 6) {
      val side = 1L << p
      var prev: (Long, Long) = null
      var h = 0L
      while (h < side * side) {
        val c @ (x, y) = HilbertCurve.coordinateFromDistance(p, h)
        assert(x >= 0 && x < side && y >= 0 && y < side)
        assert(HilbertCurve.distanceFromCoordinate(p, x, y) == h)
        if (prev != null)
          assert(math.abs(x - prev._1) + math.abs(y - prev._2) == 1,
            s"p=$p h=$h not adjacent: $prev -> $c")
        prev = c
        h += 1
      }
    }
  }

  test("round-trip at p=15 (packing default) on random coords") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextInt(1 << 15).toLong
      val y = rnd.nextInt(1 << 15).toLong
      val h = HilbertCurve.distanceFromCoordinate(15, x, y)
      assert(h >= 0 && h < (1L << 30))
      assert(HilbertCurve.coordinateFromDistance(15, h) == ((x, y)))
    }
  }

  test("dataToCoord truncates toward zero and clips") {
    assert(HilbertCurve.dataToCoord(0.0, 0.0, 10.0, 1024) == 0)
    assert(HilbertCurve.dataToCoord(10.0, 0.0, 10.0, 1024) == 1023) // clip
    assert(HilbertCurve.dataToCoord(-5.0, 0.0, 10.0, 1024) == 0)    // clip
    assert(HilbertCurve.dataToCoord(5.0, 0.0, 10.0, 1024) == 512)
  }
}
