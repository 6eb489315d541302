package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal WKT reader/writer for the seven geometry kinds, over the same
 * flat interleaved-coordinate model as the kernels. This is the
 * ingestion/export surface standing in for the reference's
 * shapely/geopandas conversion (reference: geometry/base.py:185-215,
 * per-type _shapely_to_coordinates / to_shapely).
 *
 * Numbers are written with the shortest round-trip representation
 * (Double.toString) and parsed with java.lang.Double.parseDouble, so
 * write→read is bit-exact.
 */
object Wkt {

  // ---------- writing ----------

  private def coordPair(sb: StringBuilder, values: Array[Double], i: Int): Unit = {
    sb.append(fmt(values(i))).append(' ').append(fmt(values(i + 1)))
  }

  private def fmt(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def ring(sb: StringBuilder, values: Array[Double], from: Int, until: Int): Unit = {
    sb.append('(')
    var i = from
    while (i < until) {
      if (i > from) sb.append(", ")
      coordPair(sb, values, i)
      i += 2
    }
    sb.append(')')
  }

  def point(x: Double, y: Double): String =
    if (x.isNaN && y.isNaN) "POINT EMPTY"
    else s"POINT (${fmt(x)} ${fmt(y)})"

  def multiPoint(values: Array[Double]): String = {
    if (values.isEmpty) return "MULTIPOINT EMPTY"
    val sb = new StringBuilder("MULTIPOINT ")
    ring(sb, values, 0, values.length)
    sb.toString
  }

  def lineString(values: Array[Double]): String = {
    if (values.isEmpty) return "LINESTRING EMPTY"
    val sb = new StringBuilder("LINESTRING ")
    ring(sb, values, 0, values.length)
    sb.toString
  }

  private def parts(sb: StringBuilder, values: Array[Double], offsets: Array[Int]): Unit = {
    sb.append('(')
    var p = 0
    while (p < offsets.length - 1) {
      if (p > 0) sb.append(", ")
      ring(sb, values, offsets(p), offsets(p + 1))
      p += 1
    }
    sb.append(')')
  }

  def multiLineString(values: Array[Double], offsets: Array[Int]): String = {
    if (values.isEmpty) return "MULTILINESTRING EMPTY"
    val sb = new StringBuilder("MULTILINESTRING ")
    parts(sb, values, offsets)
    sb.toString
  }

  def polygon(values: Array[Double], ringOffsets: Array[Int]): String = {
    if (values.isEmpty) return "POLYGON EMPTY"
    val sb = new StringBuilder("POLYGON ")
    parts(sb, values, ringOffsets)
    sb.toString
  }

  def multiPolygon(values: Array[Double], ringOffsets: Array[Int],
                   polyOffsets: Array[Int]): String = {
    if (values.isEmpty) return "MULTIPOLYGON EMPTY"
    val sb = new StringBuilder("MULTIPOLYGON (")
    var p = 0
    while (p < polyOffsets.length - 1) {
      if (p > 0) sb.append(", ")
      val sub = new StringBuilder
      parts(sub, values, ringOffsets.slice(polyOffsets(p), polyOffsets(p + 1) + 1))
      sb.append(sub)
      p += 1
    }
    sb.append(')')
    sb.toString
  }

  // ---------- parsing ----------

  /** Parsed geometry: kind + flat values + offsets (semantics per kind,
    * matching graft.geom.Kernels conventions). */
  final case class Geom(kind: String, values: Array[Double],
                        offsets1: Array[Int], offsets2: Array[Int])

  def parse(wkt: String): Geom = {
    val s = wkt.trim
    val kindEnd = s.indexWhere(c => c == '(' || c == ' ')
    val kind = (if (kindEnd < 0) s else s.substring(0, kindEnd)).toUpperCase
    val body = if (kindEnd < 0) "" else s.substring(kindEnd).trim
    if (body.equalsIgnoreCase("EMPTY") || body.isEmpty)
      return Geom(kindName(kind), Array.empty, Array(0), Array(0))
    kind match {
      case "POINT" =>
        val vals = parseFlat(body)
        Geom("point", vals, Array(0, vals.length), Array.empty)
      case "MULTIPOINT" =>
        // both "MULTIPOINT (1 2, 3 4)" and "MULTIPOINT ((1 2), (3 4))"
        val vals = parseFlat(body)
        Geom("multipoint", vals, Array(0, vals.length), Array.empty)
      case "LINESTRING" =>
        val vals = parseFlat(body)
        Geom("line", vals, Array(0, vals.length), Array.empty)
      case "MULTILINESTRING" =>
        val (vals, offs) = parseNested(body)
        Geom("multiline", vals, offs, Array.empty)
      case "POLYGON" =>
        val (vals, offs) = parseNested(body)
        Geom("polygon", vals, offs, Array.empty)
      case "MULTIPOLYGON" =>
        val polys = splitTop(stripParens(body)).map(p => parseNested(p.trim))
        val values = ArrayBuffer.empty[Double]
        val ringOffsets = ArrayBuffer(0)
        val polyOffsets = ArrayBuffer(0)
        polys.foreach { case (vals, offs) =>
          val base = values.length
          values ++= vals
          offs.drop(1).foreach(o => ringOffsets += base + o)
          polyOffsets += ringOffsets.length - 1
        }
        Geom("multipolygon", values.toArray, ringOffsets.toArray, polyOffsets.toArray)
      case other => throw new IllegalArgumentException(s"unsupported WKT kind: $other")
    }
  }

  private def kindName(k: String): String = k match {
    case "POINT" => "point"
    case "MULTIPOINT" => "multipoint"
    case "LINESTRING" => "line"
    case "MULTILINESTRING" => "multiline"
    case "POLYGON" => "polygon"
    case "MULTIPOLYGON" => "multipolygon"
    case o => o.toLowerCase
  }

  private def stripParens(s0: String): String = {
    val s = s0.trim
    require(s.startsWith("(") && s.endsWith(")"), s"malformed WKT body: $s0")
    s.substring(1, s.length - 1)
  }

  /** Split a paren-balanced list on top-level commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Parse "(x y, x y, ...)" or "((x y), (x y))" into flat coords. */
  private def parseFlat(body: String): Array[Double] = {
    val inner = stripParens(body)
    val out = ArrayBuffer.empty[Double]
    splitTop(inner).foreach { part =>
      val t = part.trim
      val coords = if (t.startsWith("(")) stripParens(t) else t
      coords.trim.split("\\s+").foreach(tok => out += java.lang.Double.parseDouble(tok))
    }
    out.toArray
  }

  /** Parse "((...), (...))" into flat values + part offsets. */
  private def parseNested(body: String): (Array[Double], Array[Int]) = {
    val inner = stripParens(body)
    val values = ArrayBuffer.empty[Double]
    val offsets = ArrayBuffer(0)
    splitTop(inner).foreach { part =>
      val vals = parseFlat(part.trim)
      values ++= vals
      offsets += values.length
    }
    (values.toArray, offsets.toArray)
  }
}
