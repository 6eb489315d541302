package graft.functions

import graft.geom.Wkb
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** WKB serialization — the binary twin of [[StAsText]], and what the geo
  * ecosystem's parquet files actually store (geopandas GeoParquet =
  * WKB blobs). Always little-endian output. A pen-up "line" (NaN-pair
  * separators) exports as MULTILINESTRING, mirroring the GeoJSON writer
  * (WKB has no non-finite coordinate convention). Codegen'd via the
  * reference-object pattern (same as [[LangId]]) so the serde stays
  * inside whole-stage codegen instead of a fallback eval per row. */
case class StAsWkb(child: Expression, kind: String)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_aswkb"

  def compute(g: AnyRef): Array[Byte] =
    nullSafeEval(g).asInstanceOf[Array[Byte]]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stAsWkb", this, classOf[StAsWkb].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def nullSafeEval(g: Any): Any = kind match {
    case "point" =>
      val r = g.asInstanceOf[InternalRow]
      Wkb.point(r.getDouble(0), r.getDouble(1))
    case "multipoint" => Wkb.multiPoint(GeomData.flat1(g.asInstanceOf[ArrayData]))
    case "line" =>
      val v = GeomData.flat1(g.asInstanceOf[ArrayData])
      if (v.exists(_.isNaN)) {
        val (vals, offs) = Wkb.splitPenUp(v)
        Wkb.multiLineString(vals, offs)
      } else Wkb.lineString(v)
    case "multiline" =>
      val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
      Wkb.multiLineString(v, o)
    case "polygon" =>
      val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
      Wkb.polygon(v, o)
    case "multipolygon" =>
      val (v, ro, po) = GeomData.flat3(g.asInstanceOf[ArrayData])
      Wkb.multiPolygon(v, ro, po)
    case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
  }
  override protected def withNewChildInternal(c: Expression): StAsWkb = copy(c)
}

/** WKB parsing into the nested-array geometry schema for `kind` — reads
  * what shapely/geopandas/PostGIS write (either byte order; 2-D only).
  * kind="line" additionally accepts MULTILINESTRING payloads and
  * rejoins the parts with NaN pen-up separators, so pen-up lines
  * round-trip through WKB exactly like through GeoJSON. */
case class StGeomFromWkb(child: Expression, kind: String)
    extends UnaryExpression {
  override def dataType: DataType = kind match {
    case "point" => GeomData.pointType
    case "multipoint" | "line" => GeomData.coordsType
    case "multiline" | "polygon" => GeomData.ringsType
    case "multipolygon" => GeomData.polysType
    case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
  }
  override def prettyName: String = "st_geomfromwkb"

  def compute(b: Array[Byte]): AnyRef = nullSafeEval(b).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stFromWkb", this, classOf[StGeomFromWkb].getName)
    val tpe = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    defineCodeGen(ctx, ev, c => s"($tpe) $ref.compute($c)")
  }

  override protected def nullSafeEval(t: Any): Any = {
    val g = Wkb.parse(t.asInstanceOf[Array[Byte]])
    if (kind == "line" && g.kind == "multiline")
      return GeomData.toArrayData(Wkb.rejoinPenUp(g.values, g.offsets1))
    require(g.kind == kind,
      s"WKB kind ${g.kind} does not match expected $kind")
    kind match {
      case "point" =>
        if (g.values.isEmpty) InternalRow(Double.NaN, Double.NaN)
        else InternalRow(g.values(0), g.values(1))
      case "multipoint" | "line" => GeomData.toArrayData(g.values)
      case "multiline" | "polygon" => GeomData.nest2(g.values, g.offsets1)
      case "multipolygon" => GeomData.nest3(g.values, g.offsets1, g.offsets2)
    }
  }
  override protected def withNewChildInternal(c: Expression): StGeomFromWkb = copy(c)
}
