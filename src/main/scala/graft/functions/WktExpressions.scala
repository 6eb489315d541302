package graft.functions

import graft.geom.{GeoJson, Wkt}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WKT serialization (reference export surface: to_shapely/to_geopandas,
  * geometry/point.py:36-44 etc.). `kind` disambiguates multipoint vs line
  * for the shared array<double> schema. */
case class StAsText(child: Expression, kind: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  def compute(g: AnyRef): org.apache.spark.unsafe.types.UTF8String =
    nullSafeEval(g).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stAsText", this, classOf[StAsText].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override def prettyName: String = "st_astext"

  override protected def nullSafeEval(g: Any): Any = {
    val s = kind match {
      case "point" =>
        val r = g.asInstanceOf[InternalRow]
        Wkt.point(r.getDouble(0), r.getDouble(1))
      case "multipoint" => Wkt.multiPoint(GeomData.flat1(g.asInstanceOf[ArrayData]))
      case "line" => Wkt.lineString(GeomData.flat1(g.asInstanceOf[ArrayData]))
      case "multiline" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Wkt.multiLineString(v, o)
      case "polygon" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Wkt.polygon(v, o)
      case "multipolygon" =>
        val (v, ro, po) = GeomData.flat3(g.asInstanceOf[ArrayData])
        Wkt.multiPolygon(v, ro, po)
      case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
    }
    UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): StAsText = copy(c)
}

/** GeoJSON serialization (RFC 7946 §3.1 geometry objects) — the second
  * export surface next to WKT. */
case class StAsGeoJson(child: Expression, kind: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  def compute(g: AnyRef): org.apache.spark.unsafe.types.UTF8String =
    nullSafeEval(g).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stAsGeoJson", this, classOf[StAsGeoJson].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override def prettyName: String = "st_asgeojson"

  override protected def nullSafeEval(g: Any): Any = {
    val s = kind match {
      case "point" =>
        val r = g.asInstanceOf[InternalRow]
        GeoJson.point(r.getDouble(0), r.getDouble(1))
      case "multipoint" => GeoJson.multiPoint(GeomData.flat1(g.asInstanceOf[ArrayData]))
      case "line" => GeoJson.lineString(GeomData.flat1(g.asInstanceOf[ArrayData]))
      case "multiline" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        GeoJson.multiLineString(v, o)
      case "polygon" =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        GeoJson.polygon(v, o)
      case "multipolygon" =>
        val (v, ro, po) = GeomData.flat3(g.asInstanceOf[ArrayData])
        GeoJson.multiPolygon(v, ro, po)
      case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
    }
    UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): StAsGeoJson = copy(c)
}

/** GeoJSON parsing into the nested-array geometry schema for `kind`. */
case class StGeomFromGeoJson(child: Expression, kind: String)
    extends UnaryExpression {

  def compute(t: org.apache.spark.unsafe.types.UTF8String): AnyRef =
    nullSafeEval(t).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stFromGeoJson", this, classOf[StGeomFromGeoJson].getName)
    val tpe = CodeGenerator.javaType(dataType)
    defineCodeGen(ctx, ev, c => s"($tpe) $ref.compute($c)")
  }

  override def dataType: DataType = kind match {
    case "point" => GeomData.pointType
    case "multipoint" | "line" => GeomData.coordsType
    case "multiline" | "polygon" => GeomData.ringsType
    case "multipolygon" => GeomData.polysType
    case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
  }
  override def prettyName: String = "st_geomfromgeojson"

  override protected def nullSafeEval(t: Any): Any = {
    val g = GeoJson.parse(t.asInstanceOf[UTF8String].toString)
    // A pen-up line (NaN-pair separators) is written as MultiLineString
    // (RFC 7946 has no non-finite numbers); reading it back as "line"
    // rejoins the parts with NaN separators so st_length round-trips.
    if (kind == "line" && g.kind == "multiline")
      return GeomData.toArrayData(rejoinParts(g.values, g.offsets1))
    require(g.kind == kind,
      s"GeoJSON kind ${g.kind} does not match expected $kind")
    kind match {
      case "point" =>
        if (g.values.isEmpty) InternalRow(Double.NaN, Double.NaN)
        else InternalRow(g.values(0), g.values(1))
      case "multipoint" | "line" => GeomData.toArrayData(g.values)
      case "multiline" | "polygon" => GeomData.nest2(g.values, g.offsets1)
      case "multipolygon" => GeomData.nest3(g.values, g.offsets1, g.offsets2)
    }
  }

  private def rejoinParts(v: Array[Double], offsets: Array[Int]): Array[Double] = {
    val parts = offsets.length - 1
    if (parts <= 0) return Array.empty
    val out = new Array[Double](v.length + 2 * (parts - 1))
    var w = 0
    var p = 0
    while (p < parts) {
      if (p > 0) { out(w) = Double.NaN; out(w + 1) = Double.NaN; w += 2 }
      var i = offsets(p)
      while (i < offsets(p + 1)) { out(w) = v(i); w += 1; i += 1 }
      p += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): StGeomFromGeoJson = copy(c)
}

/** WKT parsing into the nested-array geometry schema for `kind`
  * (reference ingestion surface: from_shapely/_shapely_to_coordinates). */
case class StGeomFromText(child: Expression, kind: String)
    extends UnaryExpression {

  def compute(t: org.apache.spark.unsafe.types.UTF8String): AnyRef =
    nullSafeEval(t).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stFromText", this, classOf[StGeomFromText].getName)
    val tpe = CodeGenerator.javaType(dataType)
    defineCodeGen(ctx, ev, c => s"($tpe) $ref.compute($c)")
  }

  override def dataType: DataType = kind match {
    case "point" => GeomData.pointType
    case "multipoint" | "line" => GeomData.coordsType
    case "multiline" | "polygon" => GeomData.ringsType
    case "multipolygon" => GeomData.polysType
    case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
  }
  override def prettyName: String = "st_geomfromtext"

  override protected def nullSafeEval(t: Any): Any = {
    val g = Wkt.parse(t.asInstanceOf[UTF8String].toString)
    require(g.kind == kind,
      s"WKT kind ${g.kind} does not match expected $kind")
    kind match {
      case "point" =>
        if (g.values.isEmpty) InternalRow(Double.NaN, Double.NaN)
        else InternalRow(g.values(0), g.values(1))
      case "multipoint" | "line" => GeomData.toArrayData(g.values)
      case "multiline" | "polygon" => GeomData.nest2(g.values, g.offsets1)
      case "multipolygon" => GeomData.nest3(g.values, g.offsets1, g.offsets2)
    }
  }
  override protected def withNewChildInternal(c: Expression): StGeomFromText = copy(c)
}
