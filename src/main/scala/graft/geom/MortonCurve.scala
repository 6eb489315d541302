package graft.geom

/** Morton (Z-order) curve: bit-interleave of the quantized cell
  * coordinates — x in even bit positions, y in odd. The standard
  * multi-dimensional clustering layout of lakehouse table formats
  * (Z-ORDER clustering): unlike Hilbert it has seams at power-of-two
  * boundaries, but the code is a branch-free bit spread and is directly
  * computable in any engine with integer arithmetic — the DuckDB oracle
  * replays it bit-for-bit, so (unlike hilbert, whose oracle can only
  * check packing invariants) z-order codes are value-level gated.
  *
  * The reference ships only hilbert ordering
  * (spatialpandas/spatialindex/hilbert_curve.py); z-order is the
  * extension every lakehouse layout tool expects, sharing the exact
  * quantization contract of [[HilbertCurve.distanceFromBounds]] so the
  * two curves pack interchangeably.
  */
object MortonCurve {

  /** Spread the low 31 bits of `v` to even bit positions (classic
    * magic-mask bit spread, 5 mask-shift steps). */
  def spreadBits(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of cell (cx, cy): x bits even, y bits odd. */
  def interleave(cx: Long, cy: Long): Long =
    spreadBits(cx) | (spreadBits(cy) << 1)

  /** Morton distance of the bbox center quantized on a 2^p grid over the
    * total bounds — the same quantization as
    * [[HilbertCurve.distanceFromBounds]] (degenerate ranges widened by
    * 1.0, center clamped into [0, 2^p)). */
  def distanceFromBounds(p: Int,
                         x0: Double, y0: Double, x1: Double, y1: Double,
                         tx0: Double, ty0: Double, tx1: Double, ty1: Double): Long = {
    val side = 1L << p
    val hx = if (tx0 == tx1) tx1 + 1 else tx1
    val hy = if (ty0 == ty1) ty1 + 1 else ty1
    val midX = (x0 + x1) / 2.0
    val midY = (y0 + y1) / 2.0
    interleave(HilbertCurve.dataToCoord(midX, tx0, hx, side),
      HilbertCurve.dataToCoord(midY, ty0, hy, side))
  }
}
