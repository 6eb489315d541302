package graft.functions

import graft.geom.{HilbertCurve, Kernels}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Catalyst expressions for the st_* spatial function catalog
 * (SURVEY.md §2.6, §4.3). Geometry kind is dispatched on the child's
 * resolved dataType (nesting depth); where a depth is ambiguous
 * (array<double> = multipoint OR line) the kind is an explicit
 * constructor parameter chosen by the Column-level API.
 *
 * All expressions are deterministic and null-propagating. CodegenFallback
 * for now — the eval bodies are tight loops over primitive arrays; custom
 * doGenCode is a later optimization (SURVEY.md §7.4).
 */

/** Signed shoelace area; 0.0 for point/multipoint/line kinds.
  * Reference: geometry/_algorithms/measures.py:31-58. */
case class StArea(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_area"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any = depth match {
    case 2 =>
      val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
      Kernels.area(v, o)
    case 3 =>
      val (v, ro, _) = GeomData.flat3(g.asInstanceOf[ArrayData])
      Kernels.area(v, ro)
    case _ => 0.0
  }
  override protected def withNewChildInternal(c: Expression): StArea = copy(c)
}

/** Sum of segment lengths (perimeter for polygons); 0.0 for points; NaN
  * coordinate pairs act as pen-up separators.
  * Reference: geometry/_algorithms/measures.py:8-28. */
case class StLength(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_length"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any = depth match {
    case 1 =>
      val v = GeomData.flat1(g.asInstanceOf[ArrayData])
      Kernels.lineLength(v, Array(0, v.length))
    case 2 =>
      val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
      Kernels.lineLength(v, o)
    case 3 =>
      val (v, ro, _) = GeomData.flat3(g.asInstanceOf[ArrayData])
      Kernels.lineLength(v, ro)
    case _ => 0.0
  }
  override protected def withNewChildInternal(c: Expression): StLength = copy(c)
}

/** Per-row bounds struct (x0, y0, x1, y1); NaN components for empty/all-NaN
  * geometry. Reference: geometry/_algorithms/bounds.py:56-66. */
case class StBounds(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = GeomData.boundsType
  override def prettyName: String = "st_bounds"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any = {
    val values = GeomData.flatValues(g, depth)
    val b = Kernels.totalBounds(values)
    InternalRow(b(0), b(1), b(2), b(3))
  }
  override protected def withNewChildInternal(c: Expression): StBounds = copy(c)
}

/** Geometry-vs-rectangle intersection predicate. `kind` selects the exact
  * reference semantics ("point", "multipoint", "line", "multiline",
  * "polygon", "multipolygon"); notably a zero-area rect can intersect
  * point/multipoint but never line/polygon kinds.
  * Reference: geometry/_algorithms/intersection.py:189-569, point.py:74-86. */
case class StIntersectsBounds(geom: Expression, x0: Expression, y0: Expression,
                              x1: Expression, y1: Expression, kind: String)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(geom, x0, y0, x1, y1)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_intersects_bounds"
  private lazy val depth = GeomData.nestingDepth(geom.dataType)

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input)
    if (g == null) return null
    val bx0 = x0.eval(input); val by0 = y0.eval(input)
    val bx1 = x1.eval(input); val by1 = y1.eval(input)
    if (bx0 == null || by0 == null || bx1 == null || by1 == null) return null
    intersects(g, bx0.asInstanceOf[Double], by0.asInstanceOf[Double],
      bx1.asInstanceOf[Double], by1.asInstanceOf[Double])
  }

  private def intersects(g: Any, bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean =
    kind match {
      case "point" =>
        val row = g.asInstanceOf[InternalRow]
        val px = row.getDouble(0)
        val py = row.getDouble(1)
        var lx0 = bx0; var ly0 = by0; var lx1 = bx1; var ly1 = by1
        if (lx1 < lx0) { val t = lx0; lx0 = lx1; lx1 = t }
        if (ly1 < ly0) { val t = ly0; ly0 = ly1; ly1 = t }
        // NaN x => outside; the reference tests only x for NaN
        // (reference: point.py:74-86, point.py:196-210)
        !(px.isNaN || px < lx0 || px > lx1 || py < ly0 || py > ly1)
      case "multipoint" =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        Kernels.multipointIntersectsBounds(bx0, by0, bx1, by1, v, 0, v.length)
      case "line" =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        Kernels.lineIntersectsBounds(bx0, by0, bx1, by1, v, Array(0, v.length))
      case "multiline" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Kernels.lineIntersectsBounds(bx0, by0, bx1, by1, v, o)
      case "polygon" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Kernels.polygonIntersectsBounds(bx0, by0, bx1, by1, v, o)
      case "multipolygon" =>
        val (v, ro, po) = GeomData.flat3(g.asInstanceOf[ArrayData])
        Kernels.multipolygonIntersectsBounds(bx0, by0, bx1, by1, v, ro, po)
      case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
    }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(geom = cs(0), x0 = cs(1), y0 = cs(2), x1 = cs(3), y1 = cs(4))
}

/** Exact point-vs-geometry intersection (the reference implements exact
  * intersects for Point/PointArray left-hand sides only; same support
  * matrix here). rightKind as in StIntersectsBounds.
  * Reference: geometry/point.py:87-149, point.py:212-322. */
case class StIntersects(point: Expression, other: Expression, rightKind: String)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = point
  override def right: Expression = other
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_intersects"

  override protected def nullSafeEval(p: Any, g: Any): Any = {
    val row = p.asInstanceOf[InternalRow]
    val x = row.getDouble(0)
    val y = row.getDouble(1)
    rightKind match {
      case "point" =>
        val r = g.asInstanceOf[InternalRow]
        x == r.getDouble(0) && y == r.getDouble(1)
      case "multipoint" =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        var i = 0
        var found = false
        while (i + 1 < v.length && !found) {
          found = v(i) == x && v(i + 1) == y
          i += 2
        }
        found
      case "line" =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        pointIntersectsLine(x, y, v, Array(0, v.length))
      case "multiline" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        pointIntersectsLine(x, y, v, o)
      case "polygon" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Kernels.pointIntersectsPolygon(x, y, v, o)
      case "multipolygon" =>
        val (v, ro, _) = GeomData.flat3(g.asInstanceOf[ArrayData])
        Kernels.pointIntersectsPolygon(x, y, v, ro)
      case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
    }
  }

  /** Point-on-line: per part, bbox check then vertex check then segment
    * pass-through (reference: point.py:270-311, _perform_intersects_line). */
  private def pointIntersectsLine(x: Double, y: Double,
                                  v: Array[Double], offsets: Array[Int]): Boolean = {
    var part = 0
    while (part < offsets.length - 1) {
      val start = offsets(part)
      val stop = offsets(part + 1)
      val b = new Array[Double](4)
      Kernels.totalBoundsInterleaved(v, start, stop, b)
      if (!(x < b(0) || y < b(1) || x > b(2) || y > b(3))) {
        var i = start
        while (i + 1 < stop) {
          if (v(i) == x && v(i + 1) == y) return true
          i += 2
        }
        i = start
        while (i < stop - 2) {
          if (Kernels.segmentIntersectsPoint(v(i), v(i + 1), v(i + 2), v(i + 3), x, y))
            return true
          i += 2
        }
      }
      part += 1
    }
    false
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(point = l, other = r)
}

/** Hilbert distance of the geometry's bbox center on a 2^p grid over the
  * given total bounds (degenerate bounds widened by 1.0).
  * Reference: geometry/base.py:603-615, spatialindex/rtree.py:50-65. */
case class StHilbertDistance(geom: Expression, tx0: Expression, ty0: Expression,
                             tx1: Expression, ty1: Expression, p: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(geom, tx0, ty0, tx1, ty1)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_hilbert_distance"
  private lazy val depth = GeomData.nestingDepth(geom.dataType)

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input)
    if (g == null) return null
    val a = tx0.eval(input); val b = ty0.eval(input)
    val c = tx1.eval(input); val d = ty1.eval(input)
    if (a == null || b == null || c == null || d == null) return null
    val bounds =
      if (depth == 0) {
        val row = g.asInstanceOf[InternalRow]
        val x = row.getDouble(0); val y = row.getDouble(1)
        Array(x, y, x, y)
      } else Kernels.totalBounds(GeomData.flatValues(g, depth))
    HilbertCurve.distanceFromBounds(p, bounds(0), bounds(1), bounds(2), bounds(3),
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(geom = cs(0), tx0 = cs(1), ty0 = cs(2), tx1 = cs(3), ty1 = cs(4))
}

/** Boundary: polygon -> multiline (same physical value), multipolygon ->
  * multiline (drop one nesting level).
  * Reference: geometry/polygon.py:92-95, multipolygon.py:103-107. */
case class StBoundary(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = GeomData.ringsType
  override def prettyName: String = "st_boundary"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any = depth match {
    case 2 => g
    case 3 =>
      val ad = g.asInstanceOf[ArrayData]
      val rings = scala.collection.mutable.ArrayBuffer.empty[Any]
      var i = 0
      while (i < ad.numElements()) {
        val poly = ad.getArray(i)
        var j = 0
        while (j < poly.numElements()) {
          rings += poly.getArray(j).copy()
          j += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rings.toArray)
    case _ => throw new IllegalArgumentException(
      s"st_boundary expects polygon or multipolygon, got ${child.dataType}")
  }
  override protected def withNewChildInternal(c: Expression): StBoundary = copy(c)
}

/** Normalize ring orientation: shell CCW, holes CW.
  * Reference: geometry/polygon.py:177-191, _algorithms/orientation.py:38-77. */
case class StOriented(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "st_oriented"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any = depth match {
    case 2 =>
      val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
      Kernels.orientPolygons(v, o, Array(0, o.length - 1))
      GeomData.nest2(v, o)
    case 3 =>
      val (v, ro, po) = GeomData.flat3(g.asInstanceOf[ArrayData])
      Kernels.orientPolygons(v, ro, po)
      GeomData.nest3(v, ro, po)
    case _ => g
  }
  override protected def withNewChildInternal(c: Expression): StOriented = copy(c)
}
