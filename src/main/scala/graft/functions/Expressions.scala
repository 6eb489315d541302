package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Catalyst expressions for the st_* spatial function catalog
 * (SURVEY.md §2.6, §4.3). Geometry kind is dispatched on the child's
 * resolved dataType (nesting depth); where a depth is ambiguous
 * (array<double> = multipoint OR line) the kind is an explicit
 * constructor parameter chosen by the Column-level API.
 *
 * All expressions are deterministic and null-propagating. Both the
 * interpreted path (nullSafeEval) and the generated path (doGenCode)
 * call the same static kernel bodies in [[GeomEval]], so the hot
 * predicates stay inside whole-stage codegen with a single copy of the
 * dispatch logic.
 */

/** Signed shoelace area; 0.0 for point/multipoint/line kinds.
  * Reference: geometry/_algorithms/measures.py:31-58. */
case class StArea(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_area"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any =
    GeomEval.area(depth, g.asInstanceOf[AnyRef])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomEval.area($depth, $c)")
  override protected def withNewChildInternal(c: Expression): StArea = copy(c)
}

/** Sum of segment lengths (perimeter for polygons); 0.0 for points; NaN
  * coordinate pairs act as pen-up separators.
  * Reference: geometry/_algorithms/measures.py:8-28. */
case class StLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_length"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any =
    GeomEval.length(depth, g.asInstanceOf[AnyRef])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomEval.length($depth, $c)")
  override protected def withNewChildInternal(c: Expression): StLength = copy(c)
}

/** Per-row bounds struct (x0, y0, x1, y1); NaN components for empty/all-NaN
  * geometry. Reference: geometry/_algorithms/bounds.py:56-66. */
case class StBounds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GeomData.boundsType
  override def prettyName: String = "st_bounds"
  private lazy val depth = GeomData.nestingDepth(child.dataType)
  override protected def nullSafeEval(g: Any): Any =
    GeomEval.bounds(depth, g.asInstanceOf[AnyRef])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomEval.bounds($depth, $c)")
  override protected def withNewChildInternal(c: Expression): StBounds = copy(c)
}

/** Geometry-vs-rectangle intersection predicate. `kind` selects the exact
  * reference semantics ("point", "multipoint", "line", "multiline",
  * "polygon", "multipolygon"); notably a zero-area rect can intersect
  * point/multipoint but never line/polygon kinds.
  * Reference: geometry/_algorithms/intersection.py:189-569, point.py:74-86. */
case class StIntersectsBounds(geom: Expression, x0: Expression, y0: Expression,
                              x1: Expression, y1: Expression, kind: String)
    extends Expression {
  override def children: Seq[Expression] = Seq(geom, x0, y0, x1, y1)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_intersects_bounds"
  private lazy val kid = GeomEval.kindId(kind)

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input)
    if (g == null) return null
    val bx0 = x0.eval(input); val by0 = y0.eval(input)
    val bx1 = x1.eval(input); val by1 = y1.eval(input)
    if (bx0 == null || by0 == null || bx1 == null || by1 == null) return null
    GeomEval.intersectsBounds(kid, g.asInstanceOf[AnyRef],
      bx0.asInstanceOf[Double], by0.asInstanceOf[Double],
      bx1.asInstanceOf[Double], by1.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = geom.genCode(ctx)
    val a = x0.genCode(ctx); val b = y0.genCode(ctx)
    val c = x1.genCode(ctx); val d = y1.genCode(ctx)
    ev.copy(code =
      code"""
        ${g.code}
        ${a.code}
        ${b.code}
        ${c.code}
        ${d.code}
        boolean ${ev.isNull} = ${g.isNull} || ${a.isNull} || ${b.isNull} ||
          ${c.isNull} || ${d.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.GeomEval.intersectsBounds($kid,
            ${g.value}, ${a.value}, ${b.value}, ${c.value}, ${d.value});
        }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(geom = cs(0), x0 = cs(1), y0 = cs(2), x1 = cs(3), y1 = cs(4))
}

/** Exact point-vs-geometry intersection (the reference implements exact
  * intersects for Point/PointArray left-hand sides only; same support
  * matrix here). rightKind as in StIntersectsBounds.
  * Reference: geometry/point.py:87-149, point.py:212-322. */
case class StIntersects(point: Expression, other: Expression, rightKind: String)
    extends BinaryExpression {
  override def left: Expression = point
  override def right: Expression = other
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_intersects"
  private lazy val kid = GeomEval.kindId(rightKind)

  override protected def nullSafeEval(p: Any, g: Any): Any =
    GeomEval.intersectsPoint(kid, p.asInstanceOf[InternalRow], g.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, g) => s"graft.functions.GeomEval.intersectsPoint($kid, $p, $g)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(point = l, other = r)
}

/** Exact geometry-vs-geometry intersection over the FULL kind matrix —
  * the engine's extension past the reference's point-LHS-only exact
  * predicate (geometry/base.py:634-651 raises NotImplementedError for
  * non-point left-hand sides). Composed from the same ported kernels:
  * segment-pair intersection, point-on-line, winding-number containment.
  * Kinds are declared per side, as in [[StIntersects]]. */
case class StGeomIntersects(a: Expression, b: Expression,
                            leftKind: String, rightKind: String)
    extends BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_geom_intersects"
  private lazy val kidA = GeomEval.kindId(leftKind)
  private lazy val kidB = GeomEval.kindId(rightKind)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    GeomEval.intersectsGeom(kidA, l.asInstanceOf[AnyRef], kidB, r.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.GeomEval.intersectsGeom($kidA, $l, $kidB, $r)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(a = l, b = r)
}

/** Hilbert distance of the geometry's bbox center on a 2^p grid over the
  * given total bounds (degenerate bounds widened by 1.0).
  * Reference: geometry/base.py:603-615, spatialindex/rtree.py:50-65. */
case class StHilbertDistance(geom: Expression, tx0: Expression, ty0: Expression,
                             tx1: Expression, ty1: Expression, p: Int)
    extends Expression {
  require(p >= 1 && p <= 31, s"hilbert order p must be in [1,31] (2p bits in a long), got $p")
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
    GeomEval.hilbert(depth, p, g.asInstanceOf[AnyRef],
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = geom.genCode(ctx)
    val a = tx0.genCode(ctx); val b = ty0.genCode(ctx)
    val c = tx1.genCode(ctx); val d = ty1.genCode(ctx)
    ev.copy(code =
      code"""
        ${g.code}
        ${a.code}
        ${b.code}
        ${c.code}
        ${d.code}
        boolean ${ev.isNull} = ${g.isNull} || ${a.isNull} || ${b.isNull} ||
          ${c.isNull} || ${d.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.GeomEval.hilbert($depth, $p,
            ${g.value}, ${a.value}, ${b.value}, ${c.value}, ${d.value});
        }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(geom = cs(0), tx0 = cs(1), ty0 = cs(2), tx1 = cs(3), ty1 = cs(4))
}

/** Morton (z-order) distance of the geometry's bbox center on a 2^p grid —
  * the bit-interleave twin of [[StHilbertDistance]] with the identical
  * quantization contract, so either curve drives the same packing
  * machinery. Unlike hilbert the code is replayable in plain integer
  * SQL, so the oracle gates the VALUES, not just packing invariants. */
case class StMortonDistance(geom: Expression, tx0: Expression, ty0: Expression,
                            tx1: Expression, ty1: Expression, p: Int)
    extends Expression {
  require(p >= 1 && p <= 31, s"morton order p must be in [1,31] (2p bits in a long), got $p")
  override def children: Seq[Expression] = Seq(geom, tx0, ty0, tx1, ty1)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_morton_distance"
  private lazy val depth = GeomData.nestingDepth(geom.dataType)

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input)
    if (g == null) return null
    val a = tx0.eval(input); val b = ty0.eval(input)
    val c = tx1.eval(input); val d = ty1.eval(input)
    if (a == null || b == null || c == null || d == null) return null
    GeomEval.morton(depth, p, g.asInstanceOf[AnyRef],
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = geom.genCode(ctx)
    val a = tx0.genCode(ctx); val b = ty0.genCode(ctx)
    val c = tx1.genCode(ctx); val d = ty1.genCode(ctx)
    ev.copy(code =
      code"""
        ${g.code}
        ${a.code}
        ${b.code}
        ${c.code}
        ${d.code}
        boolean ${ev.isNull} = ${g.isNull} || ${a.isNull} || ${b.isNull} ||
          ${c.isNull} || ${d.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.GeomEval.morton($depth, $p,
            ${g.value}, ${a.value}, ${b.value}, ${c.value}, ${d.value});
        }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(geom = cs(0), tx0 = cs(1), ty0 = cs(2), tx1 = cs(3), ty1 = cs(4))
}

/** Whole-frame bounds as ONE custom aggregate: (x0, y0, x1, y1) over all
  * finite per-row bounds — the reference's total_bounds
  * (_algorithms/bounds.py:6-33; dask tree-aggregate dask.py:43-51).
  * DeclarativeAggregate: updates/merges are pure expressions, so Spark
  * plans map-side partial aggregation (the tree-aggregate) natively.
  * NaN per-row bounds (empty geometries) are mapped to null before
  * Least/Greatest, which skip nulls — empties never poison the totals. */
case class StTotalBoundsAgg(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
    with UnaryLike[Expression] {
  override def dataType: DataType = GeomData.boundsType
  override def nullable: Boolean = true
  override def prettyName: String = "st_total_bounds"

  private lazy val bx0 = AttributeReference("bx0", DoubleType)()
  private lazy val by0 = AttributeReference("by0", DoubleType)()
  private lazy val bx1 = AttributeReference("bx1", DoubleType)()
  private lazy val by1 = AttributeReference("by1", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bx0, by0, bx1, by1)
  override lazy val initialValues: Seq[Expression] =
    Seq.fill(4)(Literal(null, DoubleType))

  private def nanToNull(e: Expression): Expression =
    If(IsNaN(e), Literal(null, DoubleType), e)

  override lazy val updateExpressions: Seq[Expression] = {
    val b = StBounds(child)
    Seq(
      Least(Seq(bx0, nanToNull(GetStructField(b, 0, Some("x0"))))),
      Least(Seq(by0, nanToNull(GetStructField(b, 1, Some("y0"))))),
      Greatest(Seq(bx1, nanToNull(GetStructField(b, 2, Some("x1"))))),
      Greatest(Seq(by1, nanToNull(GetStructField(b, 3, Some("y1"))))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Least(Seq(bx0.left, bx0.right)), Least(Seq(by0.left, by0.right)),
    Greatest(Seq(bx1.left, bx1.right)), Greatest(Seq(by1.left, by1.right)))

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("x0"), bx0, Literal("y0"), by0,
      Literal("x1"), bx1, Literal("y1"), by1))

  override protected def withNewChildInternal(c: Expression): StTotalBoundsAgg = copy(c)
}

/** Multipoint-building aggregate: collects (x, y) pairs into one flat
  * interleaved coordinate array — the groupBy constructor for the
  * multipoint data model (SURVEY §1.2), the aggregate analog of the
  * reference's from-raw-coordinates construction (base.py:799-871).
  *
  * A TypedImperativeAggregate over a growable primitive double buffer:
  * updates append two doubles (no per-row array allocation, unlike
  * collect_list(array(x,y)) + flatten), merges concatenate buffers, and
  * partial results serialize as raw little-endian doubles. Rows where
  * either coordinate is null are skipped. Element order follows row
  * arrival order (like collect_list, not deterministic across runs) —
  * every multipoint kernel is order-insensitive. */
case class StCollectPoints(xExpr: Expression, yExpr: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[StCollectPoints.Buf] {
  override def children: Seq[Expression] = Seq(xExpr, yExpr)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "st_collect_points"

  override def createAggregationBuffer(): StCollectPoints.Buf =
    new StCollectPoints.Buf()

  override def update(b: StCollectPoints.Buf, input: InternalRow): StCollectPoints.Buf = {
    val xv = xExpr.eval(input)
    val yv = yExpr.eval(input)
    if (xv != null && yv != null)
      b.append(xv.asInstanceOf[Double], yv.asInstanceOf[Double])
    b
  }

  override def merge(b: StCollectPoints.Buf, o: StCollectPoints.Buf): StCollectPoints.Buf = {
    b.appendAll(o); b
  }

  override def eval(b: StCollectPoints.Buf): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.result())

  override def serialize(b: StCollectPoints.Buf): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(b.size * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bytes.asDoubleBuffer().put(b.values, 0, b.size)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): StCollectPoints.Buf = {
    val n = bytes.length / 8
    val vals = new Array[Double](n)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asDoubleBuffer().get(vals)
    val b = new StCollectPoints.Buf(vals, n)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): StCollectPoints =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StCollectPoints =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): StCollectPoints =
    copy(xExpr = cs(0), yExpr = cs(1))
}

object StCollectPoints {
  /** Growable primitive buffer of interleaved coordinates. */
  final class Buf(var values: Array[Double], var size: Int) {
    def this() = this(new Array[Double](16), 0)
    private def ensure(extra: Int): Unit = {
      if (size + extra > values.length) {
        var cap = math.max(values.length * 2, 16) // floor: 0-capacity never doubles
        while (cap < size + extra) cap *= 2
        values = java.util.Arrays.copyOf(values, cap)
      }
    }
    def append(x: Double, y: Double): Unit = {
      ensure(2); values(size) = x; values(size + 1) = y; size += 2
    }
    def appendAll(o: Buf): Unit = {
      ensure(o.size)
      System.arraycopy(o.values, 0, values, size, o.size)
      size += o.size
    }
    def result(): Array[Double] = java.util.Arrays.copyOf(values, size)
  }
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
      graft.geom.Kernels.orientPolygons(v, o, Array(0, o.length - 1))
      GeomData.nest2(v, o)
    case 3 =>
      val (v, ro, po) = GeomData.flat3(g.asInstanceOf[ArrayData])
      graft.geom.Kernels.orientPolygons(v, ro, po)
      GeomData.nest3(v, ro, po)
    case _ => g
  }
  override protected def withNewChildInternal(c: Expression): StOriented = copy(c)
}
