package graft.geom

/**
 * 2-D Hilbert curve encoding (Skilling's transform), specialized for n=2
 * dimensions with Long bit arithmetic.
 *
 * Semantics ported from reference: spatialpandas/spatialindex/hilbert_curve.py
 * (distance_from_coordinate:141-176, _transpose_to_hilbert_integer:52-71) and
 * spatialpandas/utils.py:16-37 (_data2coord discretization).
 *
 * p <= 15 in all reference call sites, so h = 2p bits <= 30 bits; we allow
 * p up to 31 (h fits a signed Long at 62 bits).
 */
object HilbertCurve {

  /** Hilbert distance of integer grid coordinate (x, y), each in [0, 2^p). */
  def distanceFromCoordinate(p: Int, cx: Long, cy: Long): Long = {
    var x = cx
    var y = cy
    // Inverse undo excess work
    var q = 1L << (p - 1)
    while (q > 1) {
      val mask = q - 1
      // i = 0 (coord[0] = x): the exchange branch is a no-op for i == 0
      if ((x & q) != 0) x ^= mask
      // i = 1 (coord[1] = y)
      if ((y & q) != 0) {
        x ^= mask
      } else {
        val t = (x ^ y) & mask
        x ^= t
        y ^= t
      }
      q >>= 1
    }
    // Gray encode
    y ^= x
    var t = 0L
    q = 1L << (p - 1)
    while (q > 1) {
      if ((y & q) != 0) t ^= q - 1
      q >>= 1
    }
    x ^= t
    y ^= t
    // Interleave: bit i (from MSB) of x then y — matches
    // _transpose_to_hilbert_integer bit concatenation order.
    var h = 0L
    var i = p - 1
    while (i >= 0) {
      h = (h << 1) | ((x >> i) & 1L)
      h = (h << 1) | ((y >> i) & 1L)
      i -= 1
    }
    h
  }

  /** Decode Hilbert distance back to (x, y) grid coordinate.
    * Reference: hilbert_curve.py:75-110 (coordinate_from_distance). */
  def coordinateFromDistance(p: Int, h: Long): (Long, Long) = {
    // de-interleave
    var x = 0L
    var y = 0L
    var i = p - 1
    var hh = h
    while (i >= 0) {
      y |= (hh & 1L) << (p - 1 - i)
      hh >>= 1
      x |= (hh & 1L) << (p - 1 - i)
      hh >>= 1
      i -= 1
    }
    val z = 2L << (p - 1)
    // Gray decode by H ^ (H/2)
    val t0 = y >> 1
    y ^= x
    x ^= t0
    // Undo excess work
    var q = 2L
    while (q != z) {
      val mask = q - 1
      // i = n-1 = 1 (y) first, then i = 0 (x)
      if ((y & q) != 0) {
        x ^= mask
      } else {
        val t = (x ^ y) & mask
        x ^= t
        y ^= t
      }
      if ((x & q) != 0) x ^= mask
      q <<= 1
    }
    (x, y)
  }

  /** Continuous value -> discrete grid cell in [0, n), truncating toward
    * zero then clipping — exact port of utils.py:16-37 (_data2coord). */
  def dataToCoord(v: Double, lo: Double, hi: Double, n: Long): Long = {
    val res = ((v - lo) * (n / (hi - lo))).toLong
    if (res < 0) 0L else if (res > n - 1) n - 1 else res
  }

  /** Hilbert distance of the center of bbox (x0,y0,x1,y1) discretized onto a
    * 2^p x 2^p grid over totalBounds (tx0,ty0,tx1,ty1). Degenerate
    * zero-width ranges widened by 1.0.
    * Reference: spatialindex/rtree.py:50-65 (_distances_from_bounds). */
  def distanceFromBounds(p: Int,
                         x0: Double, y0: Double, x1: Double, y1: Double,
                         tx0: Double, ty0: Double, tx1: Double, ty1: Double): Long = {
    val sideLength = 1L << p
    val hx = if (tx0 == tx1) tx1 + 1 else tx1
    val hy = if (ty0 == ty1) ty1 + 1 else ty1
    val midX = (x0 + x1) / 2.0
    val midY = (y0 + y1) / 2.0
    val cx = dataToCoord(midX, tx0, hx, sideLength)
    val cy = dataToCoord(midY, ty0, hy, sideLength)
    distanceFromCoordinate(p, cx, cy)
  }
}
