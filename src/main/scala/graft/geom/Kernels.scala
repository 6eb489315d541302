package graft.geom

/**
 * Pure-Scala computational-geometry kernels over flat interleaved
 * coordinate buffers `[x0, y0, x1, y1, ...]` plus offset arrays — the same
 * "no object graph" contract as the reference engine's numba kernels
 * (reference: spatialpandas/geometry/_algorithms/measures.py,
 * bounds.py, orientation.py, intersection.py).
 *
 * Coordinate layout per geometry kind:
 *  - point:                     values.length == 2
 *  - multipoint / line / ring:  values (one part)
 *  - multiline / polygon:       values + `offsets1` delimiting parts/rings
 *                               (offsets1 has k+1 entries for k parts,
 *                               offsets1(0)==0, offsets1(k)==values.length)
 *  - multipolygon:              values + offsets1 (ring starts into values)
 *                               + offsets2 (polygon starts into offsets1)
 *
 * Semantics ported faithfully, including:
 *  - non-finite coordinate pairs act as "pen up" separators in length
 *    and are skipped in bounds (reference: measures.py:21-23, bounds.py:16-25)
 *  - area is SIGNED shoelace (CCW positive, CW/hole negative)
 *    (reference: measures.py:31-58)
 *  - zero-width/height query rects intersect nothing for lines/polygons
 *    but can intersect points/multipoints
 *    (reference: intersection.py:332-334 vs intersection.py:218-231)
 */
object Kernels {

  /** Sum of Euclidean segment lengths over one or more parts; skips
    * segments with any non-finite endpoint coordinate.
    * Reference: measures.py:8-28 (compute_line_length). */
  def lineLength(values: Array[Double], offsets: Array[Int]): Double = {
    var total = 0.0
    var oi = 0
    while (oi < offsets.length - 1) {
      val start = offsets(oi)
      val stop = offsets(oi + 1)
      if (stop - start >= 2) {
        var x0 = values(start)
        var y0 = values(start + 1)
        var i = start + 2
        while (i < stop) {
          val x1 = values(i)
          val y1 = values(i + 1)
          if (java.lang.Double.isFinite(x0) && java.lang.Double.isFinite(y0) &&
              java.lang.Double.isFinite(x1) && java.lang.Double.isFinite(y1)) {
            val dx = x1 - x0
            val dy = y1 - y0
            total += math.sqrt(dx * dx + dy * dy)
          }
          x0 = x1
          y0 = y1
          i += 2
        }
      }
      oi += 1
    }
    total
  }

  /** Signed shoelace area summed over rings (CCW shell +, CW hole −);
    * rings with fewer than 3 points contribute 0.
    * Arithmetic order matches reference: measures.py:31-58 (compute_area). */
  def area(values: Array[Double], ringOffsets: Array[Int]): Double = {
    var area = 0.0
    var oi = 0
    while (oi < ringOffsets.length - 1) {
      val start = ringOffsets(oi)
      val stop = ringOffsets(oi + 1)
      val polyLength = stop - start
      if (polyLength >= 6) {
        var k = start
        while (k < stop - 4) {
          val ix = values(k + 2)
          val jy = values(k + 5)
          val ky = values(k + 1)
          area += ix * (jy - ky)
          k += 2
        }
        val firstx = values(start)
        val secondy = values(start + 3)
        val lasty = values(stop - 3)
        area += firstx * (secondy - lasty)
      }
      oi += 1
    }
    area / 2.0
  }

  /** Total bounds (xmin, ymin, xmax, ymax) over finite coords in
    * values[start, stop); NaN components when no finite value exists.
    * Reference: bounds.py:6-33 (total_bounds_interleaved). */
  def totalBoundsInterleaved(values: Array[Double], start: Int, stop: Int,
                             out: Array[Double]): Unit = {
    var xmin = Double.PositiveInfinity
    var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity
    var ymax = Double.NegativeInfinity
    var i = start
    while (i + 1 < stop) {
      val x = values(i)
      if (java.lang.Double.isFinite(x)) {
        if (x < xmin) xmin = x
        if (x > xmax) xmax = x
      }
      val y = values(i + 1)
      if (java.lang.Double.isFinite(y)) {
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
      }
      i += 2
    }
    if (!java.lang.Double.isFinite(xmin)) { xmin = Double.NaN; xmax = Double.NaN }
    if (!java.lang.Double.isFinite(ymin)) { ymin = Double.NaN; ymax = Double.NaN }
    out(0) = xmin; out(1) = ymin; out(2) = xmax; out(3) = ymax
  }

  def totalBounds(values: Array[Double]): Array[Double] = {
    val out = new Array[Double](4)
    totalBoundsInterleaved(values, 0, values.length, out)
    out
  }

  /** Orientation of triangle (a, b, c): +1 CCW, 0 collinear, −1 CW.
    * Reference: orientation.py:8-35 (triangle_orientation). */
  def triangleOrientation(ax: Double, ay: Double, bx: Double, by: Double,
                          cx: Double, cy: Double): Int = {
    val abx = bx - ax
    val aby = by - ay
    val acx = cx - ax
    val acy = cy - ay
    val cross = abx * acy - aby * acx
    if (cross > 0) 1 else if (cross < 0) -1 else 0
  }

  /** Whether segment (a0,a1) passes exactly through point b.
    * Reference: intersection.py:10-40 (segment_intersects_point). */
  def segmentIntersectsPoint(ax0: Double, ay0: Double, ax1: Double, ay1: Double,
                             bx: Double, by: Double): Boolean = {
    if (bx < math.min(ax0, ax1) || bx > math.max(ax0, ax1)) return false
    if (by < math.min(ay0, ay1) || by > math.max(ay0, ay1)) return false
    val sx = ax1 - ax0
    val sy = ay1 - ay0
    val px = bx - ax0
    val py = by - ay0
    sx * py - sy * px == 0
  }

  /** 1-D interval overlap. Reference: intersection.py:43-60. */
  def segmentsIntersect1d(ax0: Double, ax1: Double, bx0: Double, bx1: Double): Boolean = {
    var a0 = ax0; var a1 = ax1; var b0 = bx0; var b1 = bx1
    if (a1 < a0) { val t = a0; a0 = a1; a1 = t }
    if (b1 < b0) { val t = b0; b0 = b1; b1 = t }
    math.max(a0, b0) <= math.min(a1, b1)
  }

  /** Exact 2-segment intersection with collinear and zero-length handling.
    * Reference: intersection.py:63-119 (segments_intersect). */
  def segmentsIntersect(ax0: Double, ay0: Double, ax1: Double, ay1: Double,
                        bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean = {
    if (!segmentsIntersect1d(ax0, ax1, bx0, bx1)) return false
    if (!segmentsIntersect1d(ay0, ay1, by0, by1)) return false

    val aZero = ax0 == ax1 && ay0 == ay1
    val bZero = bx0 == bx1 && by0 == by1
    if (aZero && !bZero &&
        ((ax0 == bx0 && ay0 == by0) || (ax0 == bx1 && ay0 == by1))) return true
    if (bZero && !aZero &&
        ((bx0 == ax0 && by0 == ay0) || (bx0 == ax1 && by0 == ay1))) return true
    if (aZero || bZero) return false

    val b0o = triangleOrientation(ax0, ay0, ax1, ay1, bx0, by0)
    val b1o = triangleOrientation(ax0, ay0, ax1, ay1, bx1, by1)
    if (b0o == 0 && b1o == 0) return true
    if (b0o == b1o) return false

    val a0o = triangleOrientation(bx0, by0, bx1, by1, ax0, ay0)
    val a1o = triangleOrientation(bx0, by0, bx1, by1, ax1, ay1)
    if (a0o == 0 && a1o == 0) return true
    if (a0o == a1o) return false
    true
  }

  /** Winding-number point-in-polygon over all rings (ring 0 shell, rest
    * holes); horizontal edges skipped; boundary on an ascending edge counts
    * as inside. Reference: intersection.py:122-186 (point_intersects_polygon).
    * Tests rings with indices in [ringStart, ringStopExcl); ring i spans
    * values[ringOffsets(i) until ringOffsets(i+1)). */
  def pointIntersectsPolygon(x: Double, y: Double, values: Array[Double],
                             ringOffsets: Array[Int], ringStart: Int, ringStopExcl: Int): Boolean = {
    var winding = 0
    var i = ringStart
    while (i < ringStopExcl) {
      val start = ringOffsets(i)
      val stop = ringOffsets(i + 1)
      var k = start
      while (k < stop - 2) {
        var x0 = values(k)
        var y0 = values(k + 1)
        var x1 = values(k + 2)
        var y1 = values(k + 3)
        if (y1 != y0) {
          var ascending = 1
          if (y1 < y0) {
            ascending = -1
            var t = y0; y0 = y1; y1 = t
            t = x0; x0 = x1; x1 = t
          }
          if (!(y0 >= y || y1 < y || (x0 < x && x1 < x))) {
            if (x0 >= x && x1 >= x) {
              winding += ascending
            } else {
              val ax = x0 - x
              val ay = y0 - y
              val bx = x1 - x
              val by = y1 - y
              val axb = ax * by - ay * bx
              if (axb > 0 || (axb == 0 && ascending != 0)) winding += ascending
            }
          }
        }
        k += 2
      }
      i += 1
    }
    winding != 0
  }

  def pointIntersectsPolygon(x: Double, y: Double, values: Array[Double],
                             ringOffsets: Array[Int]): Boolean =
    pointIntersectsPolygon(x, y, values, ringOffsets, 0, ringOffsets.length - 1)

  /** Point in rect (closed; zero-area rect can match).
    * Reference: intersection.py:189-235 semantics for the single-row case. */
  def pointIntersectsBounds(px: Double, py: Double,
                            bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean = {
    var x0 = bx0; var y0 = by0; var x1 = bx1; var y1 = by1
    if (x1 < x0) { val t = x0; x0 = x1; x1 = t }
    if (y1 < y0) { val t = y0; y0 = y1; y1 = t }
    x0 <= px && px <= x1 && y0 <= py && py <= y1
  }

  /** Any point of the multipoint in rect. Reference: intersection.py:189-235. */
  def multipointIntersectsBounds(bx0: Double, by0: Double, bx1: Double, by1: Double,
                                 values: Array[Double], start: Int, stop: Int): Boolean = {
    var x0 = bx0; var y0 = by0; var x1 = bx1; var y1 = by1
    if (x1 < x0) { val t = x0; x0 = x1; x1 = t }
    if (y1 < y0) { val t = y0; y0 = y1; y1 = t }
    var j = start
    while (j + 1 < stop) {
      val x = values(j)
      val y = values(j + 1)
      if (x0 <= x && x <= x1 && y0 <= y && y <= y1) return true
      j += 2
    }
    false
  }

  /** One line part vs rect, 4-stage test (bbox reject → projected-containment
    * shortcut → vertex-in-rect → segment-crosses-edge). Rect must already be
    * oriented (x0<=x1, y0<=y1). Reference: intersection.py:238-301. */
  private def linePartIntersectsOrientedBounds(
      x0: Double, y0: Double, x1: Double, y1: Double,
      values: Array[Double], start: Int, stop: Int): Boolean = {
    val b = new Array[Double](4)
    totalBoundsInterleaved(values, start, stop, b)
    if (b(0) > x1 || b(1) > y1 || b(2) < x0 || b(3) < y0) return false
    if ((b(0) >= x0 && b(2) <= x1) || (b(1) >= y0 && b(3) <= y1)) return true

    var j = start
    while (j + 1 < stop) {
      val x = values(j)
      val y = values(j + 1)
      if (x0 <= x && x <= x1 && y0 <= y && y <= y1) return true
      j += 2
    }

    j = start
    while (j < stop - 2) {
      val ex0 = values(j)
      val ey0 = values(j + 1)
      val ex1 = values(j + 2)
      val ey1 = values(j + 3)
      if (segmentsIntersect(ex0, ey0, ex1, ey1, x0, y1, x1, y1)) return true
      if (segmentsIntersect(ex0, ey0, ex1, ey1, x0, y0, x1, y0)) return true
      if (segmentsIntersect(ex0, ey0, ex1, ey1, x0, y0, x0, y1)) return true
      if (segmentsIntersect(ex0, ey0, ex1, ey1, x1, y0, x1, y1)) return true
      j += 2
    }
    false
  }

  /** Line (one or more parts) vs rect; zero-width/height rect intersects
    * nothing. Reference: intersection.py:304-341, 344-395. */
  def lineIntersectsBounds(bx0: Double, by0: Double, bx1: Double, by1: Double,
                           values: Array[Double], offsets: Array[Int]): Boolean = {
    var x0 = bx0; var y0 = by0; var x1 = bx1; var y1 = by1
    if (x1 < x0) { val t = x0; x0 = x1; x1 = t }
    if (y1 < y0) { val t = y0; y0 = y1; y1 = t }
    if (x0 == x1 || y0 == y1) return false
    var i = 0
    while (i < offsets.length - 1) {
      if (linePartIntersectsOrientedBounds(x0, y0, x1, y1, values, offsets(i), offsets(i + 1)))
        return true
      i += 1
    }
    false
  }

  /** One polygon (shell + holes: rings ringOffsets[ringStart..ringStop]) vs
    * oriented rect. Reference: intersection.py:398-481. */
  private def polygonIntersectsOrientedBounds(
      x0: Double, y0: Double, x1: Double, y1: Double,
      values: Array[Double], ringOffsets: Array[Int],
      ringStart: Int, ringStop: Int): Boolean = {
    val start1 = ringOffsets(ringStart)
    val stop1 = ringOffsets(ringStop)
    val b = new Array[Double](4)
    totalBoundsInterleaved(values, start1, stop1, b)
    if (b(0) > x1 || b(1) > y1 || b(2) < x0 || b(3) < y0) return false
    if ((b(0) >= x0 && b(2) <= x1) || (b(1) >= y0 && b(3) <= y1)) return true

    var k = start1
    while (k + 1 < stop1) {
      val x = values(k)
      val y = values(k + 1)
      if (x0 <= x && x <= x1 && y0 <= y && y <= y1) return true
      k += 2
    }

    var j = ringStart
    while (j < ringStop) {
      var kk = ringOffsets(j)
      val ringEnd = ringOffsets(j + 1)
      while (kk < ringEnd - 2) {
        val ex0 = values(kk)
        val ey0 = values(kk + 1)
        val ex1 = values(kk + 2)
        val ey1 = values(kk + 3)
        if (segmentsIntersect(ex0, ey0, ex1, ey1, x0, y1, x1, y1)) return true
        if (segmentsIntersect(ex0, ey0, ex1, ey1, x0, y0, x1, y0)) return true
        if (segmentsIntersect(ex0, ey0, ex1, ey1, x0, y0, x0, y1)) return true
        if (segmentsIntersect(ex0, ey0, ex1, ey1, x1, y0, x1, y1)) return true
        kk += 2
      }
      j += 1
    }

    if (pointIntersectsPolygon(x0, y0, values, ringOffsets, ringStart, ringStop)) return true
    if (pointIntersectsPolygon(x1, y0, values, ringOffsets, ringStart, ringStop)) return true
    if (pointIntersectsPolygon(x1, y1, values, ringOffsets, ringStart, ringStop)) return true
    if (pointIntersectsPolygon(x0, y1, values, ringOffsets, ringStart, ringStop)) return true
    false
  }

  /** Polygon vs rect. Reference: intersection.py:484-518. Note: the
    * reference has no zero-width early-out here, but the per-polygon test
    * cannot succeed via segment/corner stages on a degenerate rect anyway. */
  def polygonIntersectsBounds(bx0: Double, by0: Double, bx1: Double, by1: Double,
                              values: Array[Double], ringOffsets: Array[Int]): Boolean = {
    var x0 = bx0; var y0 = by0; var x1 = bx1; var y1 = by1
    if (x1 < x0) { val t = x0; x0 = x1; x1 = t }
    if (y1 < y0) { val t = y0; y0 = y1; y1 = t }
    polygonIntersectsOrientedBounds(x0, y0, x1, y1, values, ringOffsets, 0, ringOffsets.length - 1)
  }

  /** Multipolygon vs rect; polyOffsets(i) are starts into ringOffsets.
    * Zero-width/height rect intersects nothing.
    * Reference: intersection.py:521-569. */
  def multipolygonIntersectsBounds(bx0: Double, by0: Double, bx1: Double, by1: Double,
                                   values: Array[Double], ringOffsets: Array[Int],
                                   polyOffsets: Array[Int]): Boolean = {
    var x0 = bx0; var y0 = by0; var x1 = bx1; var y1 = by1
    if (x1 < x0) { val t = x0; x0 = x1; x1 = t }
    if (y1 < y0) { val t = y0; y0 = y1; y1 = t }
    var i = 0
    while (i < polyOffsets.length - 1) {
      if (polygonIntersectsOrientedBounds(x0, y0, x1, y1, values, ringOffsets,
        polyOffsets(i), polyOffsets(i + 1)))
        return true
      i += 1
    }
    false
  }

  /** Any segment of part-set A intersects any segment of part-set B
    * (parts = consecutive-pair segment chains; rings are stored closed,
    * so polygon boundaries are the same shape). Per-part bbox prefilter
    * on B; segments with non-finite endpoints (pen-up separators) never
    * intersect anything. Built on [[segmentsIntersect]] — the exact
    * reference arithmetic (intersection.py:63-119) pair-wise. */
  def anySegmentsCross(va: Array[Double], oa: Array[Int],
                       vb: Array[Double], ob: Array[Int]): Boolean = {
    val nb = ob.length - 1
    val bb = new Array[Double](nb * 4)
    val tmp = new Array[Double](4)
    var p = 0
    while (p < nb) {
      totalBoundsInterleaved(vb, ob(p), ob(p + 1), tmp)
      bb(p * 4) = tmp(0); bb(p * 4 + 1) = tmp(1)
      bb(p * 4 + 2) = tmp(2); bb(p * 4 + 3) = tmp(3)
      p += 1
    }
    var pa = 0
    while (pa < oa.length - 1) {
      var i = oa(pa)
      while (i < oa(pa + 1) - 2) {
        val ax0 = va(i); val ay0 = va(i + 1)
        val ax1 = va(i + 2); val ay1 = va(i + 3)
        if (java.lang.Double.isFinite(ax0) && java.lang.Double.isFinite(ay0) &&
            java.lang.Double.isFinite(ax1) && java.lang.Double.isFinite(ay1)) {
          val sx0 = math.min(ax0, ax1); val sx1 = math.max(ax0, ax1)
          val sy0 = math.min(ay0, ay1); val sy1 = math.max(ay0, ay1)
          var pb = 0
          while (pb < nb) {
            if (!(sx1 < bb(pb * 4) || sx0 > bb(pb * 4 + 2) ||
                  sy1 < bb(pb * 4 + 1) || sy0 > bb(pb * 4 + 3))) {
              var j = ob(pb)
              while (j < ob(pb + 1) - 2) {
                if (segmentsIntersect(ax0, ay0, ax1, ay1,
                      vb(j), vb(j + 1), vb(j + 2), vb(j + 3))) return true
                j += 2
              }
            }
            pb += 1
          }
        }
        i += 2
      }
      pa += 1
    }
    false
  }

  /** Any finite vertex of the part-set lies inside the polygon (winding
    * number over all rings). Every vertex is tested, so NaN-separated
    * runs of a pen-up line are each covered. */
  def anyVertexInPolygon(v: Array[Double], pv: Array[Double],
                         pRingOffsets: Array[Int]): Boolean = {
    var i = 0
    while (i + 1 < v.length) {
      val x = v(i); val y = v(i + 1)
      if (java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y) &&
          pointIntersectsPolygon(x, y, pv, pRingOffsets)) return true
      i += 2
    }
    false
  }

  /** Flip rings whose orientation doesn't match the convention
    * (ring at polyOffsets start = shell CCW; others = holes CW). Mutates
    * `values`. Reference: orientation.py:38-77 (orient_polygons). */
  def orientPolygons(values: Array[Double], ringOffsets: Array[Int],
                     polyOffsets: Array[Int]): Unit = {
    val numRings = ringOffsets.length - 1
    val expectedCcw = new Array[Boolean](numRings)
    var pi = 0
    while (pi < polyOffsets.length - 1) {
      expectedCcw(polyOffsets(pi)) = true
      pi += 1
    }
    var i = 0
    while (i < numRings) {
      val ringArea = area(values, Array(ringOffsets(i), ringOffsets(i + 1)))
      val isCcw = ringArea >= 0
      if (isCcw != expectedCcw(i)) {
        // reverse point order in place
        var lo = ringOffsets(i)
        var hi = ringOffsets(i + 1) - 2
        while (lo < hi) {
          val tx = values(lo); val ty = values(lo + 1)
          values(lo) = values(hi); values(lo + 1) = values(hi + 1)
          values(hi) = tx; values(hi + 1) = ty
          lo += 2
          hi -= 2
        }
      }
      i += 1
    }
  }
}
