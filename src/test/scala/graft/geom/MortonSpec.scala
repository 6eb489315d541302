package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Morton (z-order) curve: the bit-spread against a naive per-bit loop,
  * exhaustively on small grids and at the 31-bit extremes. */
class MortonSpec extends AnyFunSuite {

  private def naive(cx: Long, cy: Long): Long = {
    var m = 0L
    var b = 0
    while (b < 31) {
      m |= ((cx >> b) & 1L) << (2 * b)
      m |= ((cy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    m
  }

  test("interleave matches the naive bit loop exhaustively on a 64x64 grid") {
    for (x <- 0L until 64L; y <- 0L until 64L)
      assert(MortonCurve.interleave(x, y) == naive(x, y), s"($x,$y)")
  }

  test("interleave at the 31-bit extremes and asymmetric patterns") {
    val probes = Seq(0L, 1L, (1L << 30) - 1, 1L << 30, (1L << 31) - 1,
      0x55555555L, 0x2aaaaaaaL, 0x12345678L, 0x7fffffffL)
    for (x <- probes; y <- probes)
      assert(MortonCurve.interleave(x, y) == naive(x, y), s"($x,$y)")
    // full-range sanity: max 31-bit coords use all 62 bits, stay positive
    assert(MortonCurve.interleave((1L << 31) - 1, (1L << 31) - 1) ==
      (1L << 62) - 1)
  }

  test("codes are unique and monotone along each axis") {
    val all = for (x <- 0L until 32L; y <- 0L until 32L)
      yield MortonCurve.interleave(x, y)
    assert(all.distinct.size == 32 * 32)
    for (y <- 0L until 32L; x <- 0L until 31L)
      assert(MortonCurve.interleave(x, y) < MortonCurve.interleave(x + 1, y))
    for (x <- 0L until 32L; y <- 0L until 31L)
      assert(MortonCurve.interleave(x, y) < MortonCurve.interleave(x, y + 1))
  }

  test("distanceFromBounds quantizes like hilbert (same grid contract)") {
    // integer grid: scale 1, cell = coordinate
    assert(MortonCurve.distanceFromBounds(10, 3.0, 5.0, 3.0, 5.0,
      0.0, 0.0, 1024.0, 1024.0) == MortonCurve.interleave(3, 5))
    // degenerate total bounds widen by 1.0 without dividing by zero
    val d = MortonCurve.distanceFromBounds(4, 7.0, 7.0, 7.0, 7.0,
      7.0, 7.0, 7.0, 7.0)
    assert(d == 0L) // center at the lower corner of the widened range
    // clamping: centers outside the bounds land on the edge cells
    assert(MortonCurve.distanceFromBounds(4, -10.0, -10.0, -10.0, -10.0,
      0.0, 0.0, 16.0, 16.0) == 0L)
    assert(MortonCurve.distanceFromBounds(4, 99.0, 99.0, 99.0, 99.0,
      0.0, 0.0, 16.0, 16.0) == MortonCurve.interleave(15, 15))
  }
}
