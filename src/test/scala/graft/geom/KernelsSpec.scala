package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Golden scalar fixtures from the reference test corpus
  * (reference: tests/geometry/test_geometry.py:18-159, FIXTURES.md §2). */
class KernelsSpec extends AnyFunSuite {
  val unitSquareCw: Array[Double] = Array(1, 1, 1, 2, 2, 2, 2, 1, 1, 1)
  val largeSquareCcw: Array[Double] = Array(0, 0, 3, 0, 3, 3, 0, 3, 0, 0)

  def offs(parts: Array[Double]*): (Array[Double], Array[Int]) = {
    val values = parts.flatten.toArray
    val offsets = parts.scanLeft(0)(_ + _.length).toArray
    (values, offsets)
  }

  test("line length: unit square 4.0, large square 12.0") {
    assert(Kernels.lineLength(unitSquareCw, Array(0, 10)) === 4.0)
    assert(Kernels.lineLength(largeSquareCcw, Array(0, 10)) === 12.0)
  }

  test("NaN pair acts as pen-up separator in length") {
    val vals = largeSquareCcw ++ Array(Double.NaN, Double.NaN) ++ unitSquareCw
    assert(Kernels.lineLength(vals, Array(0, vals.length)) === 16.0)
  }

  test("signed area: CW unit square ring alone = -1.0") {
    assert(Kernels.area(unitSquareCw, Array(0, 10)) === -1.0)
    assert(Kernels.area(largeSquareCcw, Array(0, 10)) === 9.0)
  }

  test("polygon with hole: area 8.0, perimeter 16.0") {
    val (v, o) = offs(largeSquareCcw, unitSquareCw)
    assert(Kernels.area(v, o) === 8.0)
    assert(Kernels.lineLength(v, o) === 16.0)
  }

  test("multipolygon [large+hole, shifted large]: area 17.0, length 28.0") {
    val shifted = largeSquareCcw.map(_ + 4.0)
    val (v, o) = offs(largeSquareCcw, unitSquareCw, shifted)
    val polyOffsets = Array(0, 2, 3) // rings 0-1 = poly 0; ring 2 = poly 1
    var total = 0.0
    var pi = 0
    while (pi < polyOffsets.length - 1) {
      total += Kernels.area(v, o.slice(polyOffsets(pi), polyOffsets(pi + 1) + 1))
      pi += 1
    }
    assert(total === 17.0)
    assert(Kernels.lineLength(v, o) === 28.0)
  }

  test("degenerate ring (<3 points) contributes 0 area") {
    assert(Kernels.area(Array(1, 1, 2, 2), Array(0, 4)) === 0.0)
  }

  test("total bounds of unit square points = (1,1,2,2); NaN skipped") {
    assert(Kernels.totalBounds(unitSquareCw).toSeq == Seq(1.0, 1.0, 2.0, 2.0))
    val withNan = Array(Double.NaN, 5.0, 1.0, Double.NaN, 2.0, 3.0)
    assert(Kernels.totalBounds(withNan).toSeq == Seq(1.0, 3.0, 2.0, 5.0))
    val allNan = Array(Double.NaN, Double.NaN)
    assert(Kernels.totalBounds(allNan).forall(_.isNaN))
  }

  test("winding-number point in polygon (with hole)") {
    val (v, o) = offs(largeSquareCcw, unitSquareCw)
    assert(Kernels.pointIntersectsPolygon(0.5, 0.5, v, o))
    assert(!Kernels.pointIntersectsPolygon(1.5, 1.5, v, o)) // inside the hole
    assert(!Kernels.pointIntersectsPolygon(4.0, 4.0, v, o)) // outside
    assert(Kernels.pointIntersectsPolygon(2.5, 2.5, v, o))
  }

  test("segment intersection: crossing, collinear, disjoint, zero-length") {
    assert(Kernels.segmentsIntersect(0, 0, 2, 2, 0, 2, 2, 0))
    assert(Kernels.segmentsIntersect(0, 0, 2, 0, 1, 0, 3, 0)) // collinear overlap
    assert(!Kernels.segmentsIntersect(0, 0, 1, 0, 2, 1, 3, 1))
    assert(Kernels.segmentsIntersect(0, 0, 0, 0, 0, 0, 1, 1))  // zero-len at endpoint
    assert(!Kernels.segmentsIntersect(5, 5, 5, 5, 0, 0, 1, 1)) // zero-len apart
  }

  test("line vs bounds: zero-width rect intersects nothing") {
    assert(!Kernels.lineIntersectsBounds(1, 0, 1, 5, largeSquareCcw, Array(0, 10)))
    assert(Kernels.lineIntersectsBounds(-1, -1, 0.5, 0.5, largeSquareCcw, Array(0, 10)))
    assert(!Kernels.lineIntersectsBounds(1, 1, 2, 2, largeSquareCcw, Array(0, 10))) // inside ring, no touch
  }

  test("multipoint vs bounds: zero-width rect CAN match a point") {
    assert(Kernels.multipointIntersectsBounds(1, 1, 1, 1, unitSquareCw, 0, 10))
    assert(!Kernels.multipointIntersectsBounds(9, 9, 9.5, 9.5, unitSquareCw, 0, 10))
    // inverted rect normalized
    assert(Kernels.multipointIntersectsBounds(2, 2, 1, 1, unitSquareCw, 0, 10))
  }

  test("polygon vs bounds: rect fully inside polygon (corner check)") {
    val (v, o) = offs(largeSquareCcw)
    assert(Kernels.polygonIntersectsBounds(0.5, 0.5, 1.2, 1.2, v, o))
    assert(!Kernels.polygonIntersectsBounds(5, 5, 6, 6, v, o))
    // rect fully inside hole -> no intersection
    val (v2, o2) = offs(largeSquareCcw, unitSquareCw)
    assert(!Kernels.polygonIntersectsBounds(1.2, 1.2, 1.8, 1.8, v2, o2))
    // rect covering whole polygon
    assert(Kernels.polygonIntersectsBounds(-1, -1, 10, 10, v, o))
  }

  test("orientPolygons flips wrong-orientation rings") {
    val vals = unitSquareCw.clone() // shell but CW -> should flip to CCW
    Kernels.orientPolygons(vals, Array(0, 10), Array(0, 1))
    assert(Kernels.area(vals, Array(0, 10)) === 1.0)
    // hole that is CCW should flip to CW
    val unitSquareCcw: Array[Double] = Array(1, 1, 2, 1, 2, 2, 1, 2, 1, 1)
    val (v, o) = offs(largeSquareCcw, unitSquareCcw)
    val vv = v.clone()
    Kernels.orientPolygons(vv, o, Array(0, 2))
    assert(Kernels.area(vv, o) === 8.0)
  }
}
