package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions._

/**
 * Column-level st_* function catalog (SURVEY.md §2.6). Import
 * `graft.Geo._` (or call `Geo.registerAll(spark)` for the SQL surface).
 *
 * Geometry kinds with identical physical schemas (multipoint vs line:
 * array<double>; multiline vs polygon: array<array<double>>) get explicit
 * per-kind predicate variants, mirroring the reference's per-dtype
 * dispatch (reference: geometry/base.py:51-87).
 */
object Geo {

  // ---- constructors --------------------------------------------------
  /** Point as struct<x,y> — plain Catalyst struct: codegen'd, prunable. */
  def st_point(x: Column, y: Column): Column = struct(x.as("x"), y.as("y"))
  def st_x(g: Column): Column = g.getField("x")
  def st_y(g: Column): Column = g.getField("y")

  // ---- measures ------------------------------------------------------
  def st_area(g: Column): Column = Bridge.column(StArea(Bridge.expression(g)))
  def st_length(g: Column): Column = Bridge.column(StLength(Bridge.expression(g)))
  def st_bounds(g: Column): Column = Bridge.column(StBounds(Bridge.expression(g)))

  /** 4 aggregate columns (xmin, ymin, xmax, ymax) over a geometry column —
    * Spark's partial aggregation gives the reference's tree-aggregate for
    * free (reference: dask.py:43-51). */
  def st_total_bounds(g: Column): Seq[Column] = {
    // NaN bounds (empty / all-non-finite geometries) must not poison the
    // frame totals: Spark sorts NaN greater than any value, so max() would
    // return NaN — the reference's bounds kernels skip non-finite coords
    // (reference: _algorithms/bounds.py:16-25; ADVICE r1). Map NaN->null;
    // min/max ignore nulls.
    def finite(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)
    val b = st_bounds(g)
    Seq(min(finite(b.getField("x0"))).as("x0"), min(finite(b.getField("y0"))).as("y0"),
        max(finite(b.getField("x1"))).as("x1"), max(finite(b.getField("y1"))).as("y1"))
  }

  /** The same four totals as ONE custom aggregate expression returning
    * struct(x0,y0,x1,y1) — usable in SQL (`SELECT st_total_bounds(g)`)
    * and anywhere a single aggregate column is more ergonomic. */
  def st_total_bounds_agg(g: Column): Column =
    Bridge.column(StTotalBoundsAgg(Bridge.expression(g)).toAggregateExpression())

  /** Aggregate constructor: collect (x, y) pairs into one multipoint
    * (flat interleaved array) — groupBy analog of the reference's
    * coordinate-list construction (base.py:799-871). Null coordinates
    * are skipped; element order matches collect_list semantics. */
  def st_collect_points(x: Column, y: Column): Column =
    Bridge.column(StCollectPoints(Bridge.expression(x.cast("double")),
        Bridge.expression(y.cast("double")))
      .toAggregateExpression())

  // ---- predicates ----------------------------------------------------
  private def intersectsBounds(g: Column, kind: String,
                               x0: Column, y0: Column, x1: Column, y1: Column): Column =
    Bridge.column(StIntersectsBounds(Bridge.expression(g),
      Bridge.expression(x0.cast("double")), Bridge.expression(y0.cast("double")),
      Bridge.expression(x1.cast("double")), Bridge.expression(y1.cast("double")), kind))

  def st_point_intersects_bounds(g: Column, x0: Column, y0: Column, x1: Column, y1: Column): Column =
    intersectsBounds(g, "point", x0, y0, x1, y1)
  def st_multipoint_intersects_bounds(g: Column, x0: Column, y0: Column, x1: Column, y1: Column): Column =
    intersectsBounds(g, "multipoint", x0, y0, x1, y1)
  def st_line_intersects_bounds(g: Column, x0: Column, y0: Column, x1: Column, y1: Column): Column =
    intersectsBounds(g, "line", x0, y0, x1, y1)
  def st_multiline_intersects_bounds(g: Column, x0: Column, y0: Column, x1: Column, y1: Column): Column =
    intersectsBounds(g, "multiline", x0, y0, x1, y1)
  def st_polygon_intersects_bounds(g: Column, x0: Column, y0: Column, x1: Column, y1: Column): Column =
    intersectsBounds(g, "polygon", x0, y0, x1, y1)
  def st_multipolygon_intersects_bounds(g: Column, x0: Column, y0: Column, x1: Column, y1: Column): Column =
    intersectsBounds(g, "multipolygon", x0, y0, x1, y1)

  /** Exact point-in-geometry intersection; rightKind in {point, multipoint,
    * line, multiline, polygon, multipolygon}. */
  def st_intersects(point: Column, other: Column, rightKind: String): Column =
    Bridge.column(StIntersects(Bridge.expression(point), Bridge.expression(other), rightKind))

  /** Exact geometry-vs-geometry intersection, ANY kind on either side —
    * the extension past the reference's point-LHS-only matrix. */
  def st_geom_intersects(a: Column, leftKind: String,
                         b: Column, rightKind: String): Column =
    Bridge.column(StGeomIntersects(Bridge.expression(a), Bridge.expression(b),
      leftKind, rightKind))

  // ---- spatial ordering ----------------------------------------------
  /** Hilbert distance of the geometry bbox center on a 2^p x 2^p grid over
    * totalBounds (must be precomputed, mirroring dask.py:542-550). */
  def st_hilbert_distance(g: Column, tx0: Column, ty0: Column,
                          tx1: Column, ty1: Column, p: Int = 15): Column =
    Bridge.column(StHilbertDistance(Bridge.expression(g),
      Bridge.expression(tx0.cast("double")), Bridge.expression(ty0.cast("double")),
      Bridge.expression(tx1.cast("double")), Bridge.expression(ty1.cast("double")), p))

  /** Morton (z-order) distance — bit-interleave twin of
    * [[st_hilbert_distance]] on the identical quantized grid. */
  def st_morton_distance(g: Column, tx0: Column, ty0: Column,
                         tx1: Column, ty1: Column, p: Int = 15): Column =
    Bridge.column(StMortonDistance(Bridge.expression(g),
      Bridge.expression(tx0.cast("double")), Bridge.expression(ty0.cast("double")),
      Bridge.expression(tx1.cast("double")), Bridge.expression(ty1.cast("double")), p))

  // ---- transforms ----------------------------------------------------
  def st_boundary(g: Column): Column = Bridge.column(StBoundary(Bridge.expression(g)))
  def st_oriented(g: Column): Column = Bridge.column(StOriented(Bridge.expression(g)))

  // ---- serde ----------------------------------------------------------
  def st_astext(g: Column, kind: String): Column =
    Bridge.column(StAsText(Bridge.expression(g), kind))
  def st_geomfromtext(text: Column, kind: String): Column =
    Bridge.column(StGeomFromText(Bridge.expression(text), kind))
  def st_asgeojson(g: Column, kind: String): Column =
    Bridge.column(StAsGeoJson(Bridge.expression(g), kind))
  def st_geomfromgeojson(text: Column, kind: String): Column =
    Bridge.column(StGeomFromGeoJson(Bridge.expression(text), kind))
  def st_aswkb(g: Column, kind: String): Column =
    Bridge.column(StAsWkb(Bridge.expression(g), kind))
  def st_geomfromwkb(wkb: Column, kind: String): Column =
    Bridge.column(StGeomFromWkb(Bridge.expression(wkb), kind))

  /** Register the SQL-surface st_* functions on a session. Kind-ambiguous
    * predicates are registered per kind (e.g. st_polygon_intersects_bounds). */
  def registerAll(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "st_area", es => StArea(es.head))
    Bridge.registerFunction(spark, "st_length", es => StLength(es.head))
    Bridge.registerFunction(spark, "st_bounds", es => StBounds(es.head))
    Bridge.registerFunction(spark, "st_boundary", es => StBoundary(es.head))
    Bridge.registerFunction(spark, "st_oriented", es => StOriented(es.head))
    Bridge.registerFunction(spark, "st_total_bounds",
      es => StTotalBoundsAgg(es.head).toAggregateExpression())
    Bridge.registerFunction(spark, "st_collect_points",
      es => StCollectPoints(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.DoubleType))
        .toAggregateExpression())
    Bridge.registerFunction(spark, "st_hilbert_distance", { es =>
      val p = es(5) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue
        case other => throw new IllegalArgumentException(
          s"st_hilbert_distance p must be an integer literal, got $other")
      }
      def dbl(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.DoubleType)
      StHilbertDistance(es(0), dbl(es(1)), dbl(es(2)), dbl(es(3)), dbl(es(4)), p)
    })
    Bridge.registerFunction(spark, "st_morton_distance", { es =>
      val p = es(5) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue
        case other => throw new IllegalArgumentException(
          s"st_morton_distance p must be an integer literal, got $other")
      }
      def dbl(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.DoubleType)
      StMortonDistance(es(0), dbl(es(1)), dbl(es(2)), dbl(es(3)), dbl(es(4)), p)
    })
    // kinds as string literals (36 per-kind names would bloat the catalog):
    //   st_geom_intersects(a, 'line', b, 'polygon')
    Bridge.registerFunction(spark, "st_geom_intersects", { es =>
      def kindOf(e: org.apache.spark.sql.catalyst.expressions.Expression) = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
               s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"st_geom_intersects kinds must be string literals, got $other")
      }
      StGeomIntersects(es(0), es(2), kindOf(es(1)), kindOf(es(3)))
    })
    for (kind <- Seq("point", "multipoint", "line", "multiline", "polygon", "multipolygon")) {
      // SQL numeric literals may arrive as Decimal — cast bounds to double
      Bridge.registerFunction(spark, s"st_${kind}_intersects_bounds",
        es => StIntersectsBounds(es(0),
          org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(es(2), org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(es(3), org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(es(4), org.apache.spark.sql.types.DoubleType), kind))
      Bridge.registerFunction(spark, s"st_intersects_$kind",
        es => StIntersects(es(0), es(1), kind))
      Bridge.registerFunction(spark, s"st_astext_$kind", es => StAsText(es.head, kind))
      Bridge.registerFunction(spark, s"st_geomfromtext_$kind",
        es => StGeomFromText(es.head, kind))
      Bridge.registerFunction(spark, s"st_asgeojson_$kind",
        es => StAsGeoJson(es.head, kind))
      Bridge.registerFunction(spark, s"st_geomfromgeojson_$kind",
        es => StGeomFromGeoJson(es.head, kind))
      Bridge.registerFunction(spark, s"st_aswkb_$kind", es => StAsWkb(es.head, kind))
      Bridge.registerFunction(spark, s"st_geomfromwkb_$kind",
        es => StGeomFromWkb(es.head, kind))
    }
  }
}
