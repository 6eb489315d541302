package graft.geom

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/**
 * Property-based differential tests of the geometry kernels against
 * INDEPENDENT oracle implementations — the Spark port of the reference's
 * hypothesis-vs-shapely layer (reference: tests/geometry/strategies.py
 * and the tests/geometry/algorithms suite).
 *
 * All generators emit integer (or half-integer) coordinates small enough
 * that every product/sum below is exact in double arithmetic, so kernel
 * and oracle can be compared with == (no tolerance hiding real bugs).
 */
object KernelProperties extends Properties("kernels") {

  private val coord: Gen[Int] = Gen.choose(-50, 50)

  // -- simple polygon: integer points, one per angle, sorted around the
  // centroid (star-shaped => simple by construction) -------------------
  private val simplePolyGen: Gen[Array[Double]] = for {
    n <- Gen.choose(4, 14)
    pts <- Gen.listOfN(n, Gen.zip(coord, coord))
  } yield {
    val distinct = pts.distinct
    val cx = distinct.map(_._1).sum.toDouble / distinct.size
    val cy = distinct.map(_._2).sum.toDouble / distinct.size
    val byAngle = distinct
      .groupBy { case (x, y) => math.atan2(y - cy, x - cx) }
      .map { case (_, same) => same.maxBy { case (x, y) =>
        (x - cx) * (x - cx) + (y - cy) * (y - cy) } }
      .toList
    val sorted = byAngle.sortBy { case (x, y) => math.atan2(y - cy, x - cx) }
    if (sorted.size < 3) Array.empty[Double]
    else {
      val ring = sorted :+ sorted.head
      ring.flatMap { case (x, y) => Seq(x.toDouble, y.toDouble) }.toArray
    }
  }

  /** Exact: (x, y) lies on segment (x0,y0)-(x1,y1). All inputs are
    * multiples of 0.5 with magnitude <= 100, so every product is exact. */
  private def onSegment(x: Double, y: Double,
                        x0: Double, y0: Double, x1: Double, y1: Double): Boolean = {
    val cross = (x1 - x0) * (y - y0) - (y1 - y0) * (x - x0)
    cross == 0.0 &&
      x >= math.min(x0, x1) && x <= math.max(x0, x1) &&
      y >= math.min(y0, y1) && y <= math.max(y0, y1)
  }

  private def onBoundary(x: Double, y: Double, ring: Array[Double]): Boolean = {
    var i = 0
    while (i < ring.length - 2) {
      if (onSegment(x, y, ring(i), ring(i + 1), ring(i + 2), ring(i + 3))) return true
      i += 2
    }
    false
  }

  // -- oracle 1: crossing-number PIP, division-free (exact) --------------
  private def crossingNumberInside(x: Double, y: Double, ring: Array[Double]): Boolean = {
    var crossings = 0
    var i = 0
    while (i < ring.length - 2) {
      val x0 = ring(i); val y0 = ring(i + 1)
      val x1 = ring(i + 2); val y1 = ring(i + 3)
      if ((y0 <= y) != (y1 <= y)) {
        // crossing strictly right of x  <=>  sign((x0-x)*den + num) == sign(den)
        val den = y1 - y0
        val num = (y - y0) * (x1 - x0)
        val lhs = (x0 - x) * den + num
        if ((den > 0 && lhs > 0) || (den < 0 && lhs < 0)) crossings += 1
      }
      i += 2
    }
    crossings % 2 == 1
  }

  property("winding-number PIP == crossing-number oracle (simple polygons)") =
    forAll(simplePolyGen, coord, coord) { (ring, qx, qy) =>
      (ring.length >= 8) ==> {
        // half-integer query point, filtered off the boundary (a
        // diagonal edge can still pass through half-integers)
        val x = qx + 0.5
        val y = qy + 0.5
        !onBoundary(x, y, ring) ==> {
          val got = Kernels.pointIntersectsPolygon(x, y, ring, Array(0, ring.length))
          val want = crossingNumberInside(x, y, ring)
          Prop(got == want) :| s"point ($x,$y) ring ${ring.toSeq} kernel=$got oracle=$want"
        }
      }
    }

  // -- oracle 2: shoelace invariances (exact in integer coords) ----------
  private def rotateRing(ring: Array[Double], k: Int): Array[Double] = {
    val open = ring.dropRight(2)
    val n = open.length / 2
    val s = ((k % n) + n) % n
    val rot = open.drop(2 * s) ++ open.take(2 * s)
    rot ++ rot.take(2)
  }

  property("signed area invariant under ring rotation; negated by reversal") =
    forAll(simplePolyGen, Gen.choose(0, 11)) { (ring, k) =>
      (ring.length >= 8) ==> {
        val a0 = Kernels.area(ring, Array(0, ring.length))
        val aRot = Kernels.area(rotateRing(ring, k), Array(0, ring.length))
        val rev = ring.grouped(2).toArray.reverse.flatten
        val aRev = Kernels.area(rev, Array(0, ring.length))
        Prop(a0 == aRot && a0 == -aRev) :| s"a0=$a0 rot=$aRot rev=$aRev"
      }
    }

  // -- oracle 3: multipoint-vs-rect == exists(point in rect) -------------
  private val multipointGen: Gen[Array[Double]] = for {
    n <- Gen.choose(1, 20)
    pts <- Gen.listOfN(n, Gen.zip(coord, coord))
  } yield pts.flatMap { case (x, y) => Seq(x.toDouble, y.toDouble) }.toArray

  property("multipoint-vs-rect kernel == brute-force point-in-rect") =
    forAll(multipointGen, coord, coord, coord, coord) { (mp, x0, y0, x1, y1) =>
      val lx0 = math.min(x0, x1).toDouble; val lx1 = math.max(x0, x1).toDouble
      val ly0 = math.min(y0, y1).toDouble; val ly1 = math.max(y0, y1).toDouble
      val got = Kernels.multipointIntersectsBounds(lx0, ly0, lx1, ly1, mp, 0, mp.length)
      val want = mp.grouped(2).exists(p =>
        p(0) >= lx0 && p(0) <= lx1 && p(1) >= ly0 && p(1) <= ly1)
      Prop(got == want) :| s"kernel=$got oracle=$want"
    }

  // -- oracle 4: segment-vs-rect via SAT corner-side test (exact; the
  // same independent formulation as the line_bbox DuckDB oracle) ---------
  private def satSegmentHitsRect(x0: Double, y0: Double, x1: Double, y1: Double,
                                 rx0: Double, ry0: Double, rx1: Double, ry1: Double): Boolean = {
    val bboxOverlap = math.max(x0, x1) >= rx0 && math.min(x0, x1) <= rx1 &&
      math.max(y0, y1) >= ry0 && math.min(y0, y1) <= ry1
    if (!bboxOverlap) return false
    def side(cx: Double, cy: Double): Double =
      (x1 - x0) * (cy - y0) - (y1 - y0) * (cx - x0)
    val s = Seq(side(rx0, ry0), side(rx0, ry1), side(rx1, ry0), side(rx1, ry1))
    !(s.forall(_ > 0) || s.forall(_ < 0))
  }

  property("segment-vs-rect kernel == SAT oracle (non-degenerate rects)") =
    forAll(Gen.zip(coord, coord, coord, coord), Gen.zip(coord, coord, coord, coord)) {
      case ((sx0, sy0, sx1, sy1), (rx0, ry0, rx1, ry1)) =>
        val lx0 = math.min(rx0, rx1).toDouble; val lx1 = math.max(rx0, rx1).toDouble
        val ly0 = math.min(ry0, ry1).toDouble; val ly1 = math.max(ry0, ry1).toDouble
        // the kernel defines zero-area rects as intersecting nothing
        // (reference: intersection.py:332-334): oracle covers the rest
        (lx1 > lx0 && ly1 > ly0) ==> {
          val seg = Array(sx0.toDouble, sy0.toDouble, sx1.toDouble, sy1.toDouble)
          val got = Kernels.lineIntersectsBounds(lx0, ly0, lx1, ly1, seg, Array(0, 4))
          val want = satSegmentHitsRect(sx0, sy0, sx1, sy1, lx0, ly0, lx1, ly1)
          Prop(got == want) :|
            s"seg=${seg.toSeq} rect=($lx0,$ly0,$lx1,$ly1) kernel=$got oracle=$want"
        }
    }

  // -- oracle 5: polygon-vs-rect via edge-SAT + corner containment -------
  // polygon ∩ rect ≠ ∅  ⟺  some edge hits the rect (covers polygon-
  // inside-rect too: a segment interior to the rect always separates its
  // corners)  ∨  the rect is entirely inside the polygon (all corners in)
  property("polygon-vs-rect kernel == edge-SAT + corner-containment oracle") =
    forAll(simplePolyGen, coord, coord, Gen.choose(1, 30), Gen.choose(1, 30)) {
      (ring, rx, ry, w, h) =>
        (ring.length >= 8) ==> {
          // half-integer rect corners never coincide with integer vertices
          val rx0 = rx + 0.5; val ry0 = ry + 0.5
          val rx1 = rx0 + w; val ry1 = ry0 + h
          val corners = Seq((rx0, ry0), (rx0, ry1), (rx1, ry0), (rx1, ry1))
          // skip rects whose corner sits exactly on a polygon edge — the
          // oracle's strict/non-strict boundary choices differ there
          corners.forall { case (cx, cy) => !onBoundary(cx, cy, ring) } ==> {
            val edgeHit = (0 until ring.length - 2 by 2).exists { i =>
              satSegmentHitsRect(ring(i), ring(i + 1), ring(i + 2), ring(i + 3),
                rx0, ry0, rx1, ry1)
            }
            val rectInside = corners.forall { case (cx, cy) =>
              crossingNumberInside(cx, cy, ring) }
            val want = edgeHit || rectInside
            val got = Kernels.polygonIntersectsBounds(rx0, ry0, rx1, ry1,
              ring, Array(0, ring.length))
            Prop(got == want) :|
              s"ring=${ring.toSeq} rect=($rx0,$ry0,$rx1,$ry1) kernel=$got edge=$edgeHit inside=$rectInside"
          }
        }
    }

  // -- oracle 6: multi-part kernels == any(part hits) over the same
  // single-part oracles (catches offset-slicing bugs) --------------------
  private val multiSegGen: Gen[List[Array[Double]]] = for {
    n <- Gen.choose(1, 5)
    segs <- Gen.listOfN(n, Gen.zip(coord, coord, coord, coord))
  } yield segs.map { case (a, b, c, d) =>
    Array(a.toDouble, b.toDouble, c.toDouble, d.toDouble) }

  property("multiline-vs-rect kernel == any(segment SAT oracle)") =
    forAll(multiSegGen, coord, coord, Gen.choose(1, 30), Gen.choose(1, 30)) {
      (segs, rx, ry, w, h) =>
        val rx0 = rx.toDouble; val ry0 = ry.toDouble
        val rx1 = rx0 + w; val ry1 = ry0 + h
        val values = segs.flatten.toArray
        val offsets = segs.scanLeft(0)(_ + _.length).toArray
        val got = Kernels.lineIntersectsBounds(rx0, ry0, rx1, ry1, values, offsets)
        val want = segs.exists(s =>
          satSegmentHitsRect(s(0), s(1), s(2), s(3), rx0, ry0, rx1, ry1))
        Prop(got == want) :| s"kernel=$got oracle=$want"
    }

  property("multipolygon-vs-rect kernel == any(polygon kernel)") =
    forAll(Gen.listOfN(3, simplePolyGen), coord, coord,
      Gen.choose(1, 30), Gen.choose(1, 30)) { (rings0, rx, ry, w, h) =>
        val rings = rings0.filter(_.length >= 8)
        (rings.nonEmpty) ==> {
          val rx0 = rx + 0.5; val ry0 = ry + 0.5
          val rx1 = rx0 + w; val ry1 = ry0 + h
          val values = rings.flatten.toArray
          val ringOffsets = rings.scanLeft(0)(_ + _.length).toArray
          val polyOffsets = (0 to rings.length).toArray // one ring per polygon
          val got = Kernels.multipolygonIntersectsBounds(rx0, ry0, rx1, ry1,
            values, ringOffsets, polyOffsets)
          val want = rings.exists(r =>
            Kernels.polygonIntersectsBounds(rx0, ry0, rx1, ry1, r, Array(0, r.length)))
          Prop(got == want) :| s"kernel=$got oracle=$want"
        }
    }

  // -- oracle: CLRS-formulation segment intersection (independent of the
  // kernel's 1-D-overlap + double-orientation structure; exact in Long
  // arithmetic for integer coords) --------------------------------------
  private def clrsSegsIntersect(ax0: Long, ay0: Long, ax1: Long, ay1: Long,
                                bx0: Long, by0: Long, bx1: Long, by1: Long): Boolean = {
    def cross(ox: Long, oy: Long, px: Long, py: Long, qx: Long, qy: Long): Long =
      (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    def onSeg(px: Long, py: Long, x0: Long, y0: Long, x1: Long, y1: Long): Boolean =
      px >= math.min(x0, x1) && px <= math.max(x0, x1) &&
        py >= math.min(y0, y1) && py <= math.max(y0, y1)
    val d1 = cross(ax0, ay0, ax1, ay1, bx0, by0)
    val d2 = cross(ax0, ay0, ax1, ay1, bx1, by1)
    val d3 = cross(bx0, by0, bx1, by1, ax0, ay0)
    val d4 = cross(bx0, by0, bx1, by1, ax1, ay1)
    (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
     ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) ||
      (d1 == 0 && onSeg(bx0, by0, ax0, ay0, ax1, ay1)) ||
      (d2 == 0 && onSeg(bx1, by1, ax0, ay0, ax1, ay1)) ||
      (d3 == 0 && onSeg(ax0, ay0, bx0, by0, bx1, by1)) ||
      (d4 == 0 && onSeg(ax1, ay1, bx0, by0, bx1, by1))
  }

  // line strings with no zero-length segments (the reference kernel's
  // zero-length semantics — endpoint-contact only — are deliberately
  // NOT CLRS's; degenerate inputs are excluded the same way the sjoin
  // queries exclude them)
  private val lineStringGen: Gen[Array[Double]] = for {
    n <- Gen.choose(2, 6)
    pts <- Gen.listOfN(n, Gen.zip(coord, coord))
  } yield {
    val dedup = pts.foldLeft(List.empty[(Int, Int)]) {
      case (acc, p) if acc.headOption.contains(p) => acc
      case (acc, p) => p :: acc
    }.reverse
    dedup.flatMap { case (x, y) => Seq(x.toDouble, y.toDouble) }.toArray
  }

  property("line-vs-line segment sweep == CLRS pairwise oracle") =
    forAll(lineStringGen, lineStringGen) { (a, b) =>
      (a.length >= 4 && b.length >= 4) ==> {
        val got = Kernels.anySegmentsCross(a, Array(0, a.length), b, Array(0, b.length))
        val pairs = for {
          i <- 0 until (a.length - 2) by 2
          j <- 0 until (b.length - 2) by 2
        } yield clrsSegsIntersect(
          a(i).toLong, a(i + 1).toLong, a(i + 2).toLong, a(i + 3).toLong,
          b(j).toLong, b(j + 1).toLong, b(j + 2).toLong, b(j + 3).toLong)
        val want = pairs.contains(true)
        Prop(got == want) :| s"a=${a.toSeq} b=${b.toSeq} kernel=$got oracle=$want"
      }
    }

  property("polygon-vs-polygon intersects == boundary-CLRS + containment oracle") =
    forAll(simplePolyGen, simplePolyGen, Gen.choose(-8, 8), Gen.choose(-8, 8)) {
      (pa, pb0, sx, sy) =>
        (pa.length >= 8 && pb0.length >= 8) ==> {
          // shift B so overlap / containment / disjoint all occur
          val pb = pb0.zipWithIndex.map { case (v, i) =>
            if (i % 2 == 0) v + sx else v + sy }
          val oa = Array(0, pa.length)
          val ob = Array(0, pb.length)
          // the kernel composition used by GeomEval.intersectsGeom
          val got = Kernels.anySegmentsCross(pa, oa, pb, ob) ||
            Kernels.anyVertexInPolygon(pb, pa, oa) ||
            Kernels.anyVertexInPolygon(pa, pb, ob)
          // independent: CLRS boundary pairs + crossing-number/boundary
          // vertex containment
          val segPairs = for {
            i <- 0 until (pa.length - 2) by 2
            j <- 0 until (pb.length - 2) by 2
          } yield clrsSegsIntersect(
            pa(i).toLong, pa(i + 1).toLong, pa(i + 2).toLong, pa(i + 3).toLong,
            pb(j).toLong, pb(j + 1).toLong, pb(j + 2).toLong, pb(j + 3).toLong)
          def vertexIn(v: Array[Double], ring: Array[Double]): Boolean =
            (0 until v.length - 2 by 2).exists(i =>
              crossingNumberInside(v(i), v(i + 1), ring) ||
                onBoundary(v(i), v(i + 1), ring))
          val want = segPairs.contains(true) ||
            vertexIn(pb, pa) || vertexIn(pa, pb)
          Prop(got == want) :| s"kernel=$got oracle=$want a=${pa.toSeq} b=${pb.toSeq}"
        }
    }

  // -- oracle 7: orientation normalization invariants --------------------
  property("orientPolygons: shell CCW afterwards, |area| preserved, idempotent") =
    forAll(simplePolyGen) { ring =>
      (ring.length >= 8) ==> {
        val v1 = ring.clone()
        Kernels.orientPolygons(v1, Array(0, ring.length), Array(0, 1))
        val a1 = Kernels.area(v1, Array(0, v1.length))
        val a0 = Kernels.area(ring, Array(0, ring.length))
        val v2 = v1.clone()
        Kernels.orientPolygons(v2, Array(0, v2.length), Array(0, 1))
        Prop(a1 == math.abs(a0) && v2.sameElements(v1)) :|
          s"a0=$a0 a1=$a1 idempotent=${v2.sameElements(v1)}"
      }
    }

  // -- serde round trips on arbitrary doubles ----------------------------
  private val doubleCoord: Gen[Double] =
    Gen.oneOf(Gen.choose(-1e6, 1e6), Gen.choose(-1.0, 1.0),
      Gen.oneOf(0.0, -0.0, 1.5, -2.25e-10, 3.14159e15))

  property("WKT and GeoJSON round-trip arbitrary line coordinates bit-exactly") =
    forAll(Gen.choose(2, 8).flatMap(n => Gen.listOfN(2 * n, doubleCoord))) { coords =>
      val v = coords.toArray
      val wkt = Wkt.parse(Wkt.lineString(v))
      val gj = GeoJson.parse(GeoJson.lineString(v))
      Prop(wkt.values.sameElements(v) && gj.values.sameElements(v)) :|
        s"wkt=${wkt.values.toSeq} gj=${gj.values.toSeq} orig=${v.toSeq}"
    }

  // -- GeoJSON pen-up lines: NaN separators survive via MultiLineString --
  private val penUpLineGen: Gen[Array[Double]] = for {
    n <- Gen.choose(2, 10)
    pairs <- Gen.listOfN(n, Gen.zip(Gen.choose(-100, 100), Gen.choose(-100, 100)))
    nanMask <- Gen.listOfN(n, Gen.frequency(4 -> false, 1 -> true))
  } yield pairs.zip(nanMask).flatMap { case ((x, y), isNan) =>
    if (isNan) Seq(Double.NaN, Double.NaN) else Seq(x.toDouble, y.toDouble)
  }.toArray

  property("GeoJSON pen-up lines write valid JSON and preserve st_length") =
    forAll(penUpLineGen) { v =>
      val json = GeoJson.lineString(v)
      val parsed = GeoJson.parse(json)
      // rejoin MultiLineString parts with NaN separators (the expression
      // layer's read-as-line path)
      val rejoined: Array[Double] =
        if (parsed.kind != "multiline") parsed.values
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[Double]
          var p = 0
          while (p < parsed.offsets1.length - 1) {
            if (p > 0) { out += Double.NaN; out += Double.NaN }
            var i = parsed.offsets1(p)
            while (i < parsed.offsets1(p + 1)) { out += parsed.values(i); i += 1 }
            p += 1
          }
          out.toArray
        }
      val lenBefore = Kernels.lineLength(v, Array(0, v.length))
      val lenAfter = Kernels.lineLength(rejoined, Array(0, rejoined.length))
      // WKT, unlike JSON, carries NaN tokens natively: bit-exact trip
      // (Arrays.equals treats NaN == NaN)
      val wktTrip = java.util.Arrays.equals(Wkt.parse(Wkt.lineString(v)).values, v)
      Prop(!json.contains("NaN") && !json.contains("Infinity") && wktTrip &&
        (lenBefore == lenAfter || (lenBefore.isNaN && lenAfter.isNaN))) :|
        s"json=$json wktTrip=$wktTrip lenBefore=$lenBefore lenAfter=$lenAfter"
    }
}
