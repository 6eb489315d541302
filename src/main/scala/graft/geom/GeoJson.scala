package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal GeoJSON geometry reader/writer over the same flat
 * interleaved-coordinate model as [[Wkt]] — the second ingestion/export
 * surface standing in for the reference's shapely conversions
 * (reference: geometry/base.py:185-215; SURVEY §1.4 lists GeoJSON/WKT
 * parsers as the inference-free entry points).
 *
 * Writes the 6 geometry types of RFC 7946 §3.1 that the engine models
 * (no GeometryCollection). Numbers use shortest-round-trip formatting,
 * so write→read is bit-exact; the parser is a small hand-rolled scanner
 * (numbers, brackets, the "type"/"coordinates" members) — no JSON
 * library dependency.
 *
 * Non-finite coordinates: RFC 7946 only allows finite JSON numbers, so
 * NaN/Infinity can never be emitted. Line kinds use the engine's pen-up
 * convention (a non-finite pair separates sub-lines — see StLength):
 * on write those runs become MultiLineString parts, and a read that
 * expects kind "line" rejoins MultiLineString parts with a NaN-pair
 * separator, so st_length survives the round trip. Every other kind
 * rejects non-finite coordinates with an error (they have no pen-up
 * semantics), and the parser fails loudly on NaN/Infinity tokens
 * instead of skipping them.
 */
object GeoJson {

  // ---------- writing ----------

  private def fmt(d: Double): String = {
    if (d.isNaN || d.isInfinite)
      throw new IllegalArgumentException(
        "non-finite coordinate in GeoJSON output (RFC 7946 requires finite numbers)")
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
  }

  private def finitePair(v: Array[Double], i: Int): Boolean =
    java.lang.Double.isFinite(v(i)) && java.lang.Double.isFinite(v(i + 1))

  /** Maximal [start, end) runs of finite pairs inside [from, until) —
    * the pen-up split (non-finite pairs are the separators). */
  private def finiteRuns(v: Array[Double], from: Int, until: Int): Seq[(Int, Int)] = {
    val out = ArrayBuffer.empty[(Int, Int)]
    var i = from
    while (i + 1 < until) {
      if (finitePair(v, i)) {
        var j = i
        while (j + 1 < until && finitePair(v, j)) j += 2
        out += ((i, j))
        i = j
      } else i += 2
    }
    out.toSeq
  }

  private def requireFinite(kind: String, v: Array[Double]): Unit = {
    var i = 0
    while (i < v.length) {
      if (!java.lang.Double.isFinite(v(i)))
        throw new IllegalArgumentException(
          s"non-finite coordinate in $kind: GeoJSON (RFC 7946) requires finite numbers " +
            "and only line kinds carry pen-up separators")
      i += 1
    }
  }

  private def pairs(sb: StringBuilder, v: Array[Double], from: Int, until: Int): Unit = {
    var i = from
    while (i < until) {
      if (i > from) sb.append(',')
      sb.append('[').append(fmt(v(i))).append(',').append(fmt(v(i + 1))).append(']')
      i += 2
    }
  }

  private def wrap(typ: String, coords: String): String =
    s"""{"type":"$typ","coordinates":$coords}"""

  def point(x: Double, y: Double): String =
    if (x.isNaN && y.isNaN) wrap("Point", "[]")
    else wrap("Point", s"[${fmt(x)},${fmt(y)}]")

  def multiPoint(v: Array[Double]): String = {
    requireFinite("MultiPoint", v)
    val sb = new StringBuilder("[")
    pairs(sb, v, 0, v.length)
    wrap("MultiPoint", sb.append(']').toString)
  }

  private def runsJson(v: Array[Double], runs: Seq[(Int, Int)]): String = {
    val sb = new StringBuilder("[")
    var p = 0
    while (p < runs.length) {
      if (p > 0) sb.append(',')
      sb.append('[')
      pairs(sb, v, runs(p)._1, runs(p)._2)
      sb.append(']')
      p += 1
    }
    sb.append(']').toString
  }

  def lineString(v: Array[Double]): String = {
    val runs = finiteRuns(v, 0, v.length)
    if (runs.isEmpty) wrap("LineString", "[]")
    else if (runs.length == 1) {
      val sb = new StringBuilder("[")
      pairs(sb, v, runs.head._1, runs.head._2)
      wrap("LineString", sb.append(']').toString)
    } else wrap("MultiLineString", runsJson(v, runs))
  }

  private def nested(v: Array[Double], offsets: Array[Int]): String = {
    val sb = new StringBuilder("[")
    var p = 0
    while (p < offsets.length - 1) {
      if (p > 0) sb.append(',')
      sb.append('[')
      pairs(sb, v, offsets(p), offsets(p + 1))
      sb.append(']')
      p += 1
    }
    sb.append(']').toString
  }

  def multiLineString(v: Array[Double], offsets: Array[Int]): String = {
    // Pen-up split inside each part: non-finite pairs separate runs, each
    // run becomes its own MultiLineString part (st_length is preserved —
    // the length kernel skips non-finite pairs either way).
    val runs = (0 until offsets.length - 1)
      .flatMap(p => finiteRuns(v, offsets(p), offsets(p + 1)))
    wrap("MultiLineString", runsJson(v, runs))
  }

  def polygon(v: Array[Double], ringOffsets: Array[Int]): String = {
    requireFinite("Polygon", v)
    wrap("Polygon", nested(v, ringOffsets))
  }

  def multiPolygon(v: Array[Double], ringOffsets: Array[Int],
                   polyOffsets: Array[Int]): String = {
    requireFinite("MultiPolygon", v)
    val sb = new StringBuilder("[")
    var p = 0
    while (p < polyOffsets.length - 1) {
      if (p > 0) sb.append(',')
      sb.append(nested(v, ringOffsets.slice(polyOffsets(p), polyOffsets(p + 1) + 1)))
      p += 1
    }
    wrap("MultiPolygon", sb.append(']').toString)
  }

  // ---------- parsing ----------

  def parse(json: String): Wkt.Geom = {
    val typ = extractString(json, "type")
    val coords = extractValue(json, "coordinates")
    typ match {
      case "Point" =>
        val v = flatNumbers(coords)
        Wkt.Geom("point", v, Array(0, v.length), Array.empty)
      case "MultiPoint" =>
        val v = flatNumbers(coords)
        Wkt.Geom("multipoint", v, Array(0, v.length), Array.empty)
      case "LineString" =>
        val v = flatNumbers(coords)
        Wkt.Geom("line", v, Array(0, v.length), Array.empty)
      case "MultiLineString" =>
        val (v, o) = nestedNumbers(coords)
        Wkt.Geom("multiline", v, o, Array.empty)
      case "Polygon" =>
        val (v, o) = nestedNumbers(coords)
        Wkt.Geom("polygon", v, o, Array.empty)
      case "MultiPolygon" =>
        val values = ArrayBuffer.empty[Double]
        val ringOffsets = ArrayBuffer(0)
        val polyOffsets = ArrayBuffer(0)
        topElements(coords).foreach { poly =>
          val (v, o) = nestedNumbers(poly)
          val base = values.length
          values ++= v
          o.drop(1).foreach(x => ringOffsets += base + x)
          polyOffsets += ringOffsets.length - 1
        }
        Wkt.Geom("multipolygon", values.toArray, ringOffsets.toArray, polyOffsets.toArray)
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }

  /** Value of a `"name": "string"` member. */
  private def extractString(json: String, name: String): String = {
    val key = "\"" + name + "\""
    val k = json.indexOf(key)
    require(k >= 0, s"missing $key in $json")
    val colon = json.indexOf(':', k + key.length)
    val q0 = json.indexOf('"', colon + 1)
    val q1 = json.indexOf('"', q0 + 1)
    json.substring(q0 + 1, q1)
  }

  /** Raw bracket-balanced value of a `"name": [...]` member. */
  private def extractValue(json: String, name: String): String = {
    val key = "\"" + name + "\""
    val k = json.indexOf(key)
    require(k >= 0, s"missing $key in $json")
    val start = json.indexOf('[', k + key.length)
    var depth = 0
    var i = start
    while (i < json.length) {
      json.charAt(i) match {
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) return json.substring(start, i + 1)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced brackets in $json")
  }

  /** Split "[a,b,c]" on top-level commas; empty for "[]". */
  private def topElements(arr: String): Seq[String] = {
    val inner = arr.trim.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < inner.length) {
      inner.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1
        case ',' if depth == 0 => out += inner.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += inner.substring(start)
    out.toSeq
  }

  /** All numbers in a (possibly nested) coordinate array, in order.
    * Fails loudly on anything that is not a finite JSON number — bare
    * NaN/Infinity tokens or malformed runs raise instead of being
    * silently skipped (they would otherwise merge pen-up line parts). */
  private def flatNumbers(arr: String): Array[Double] = {
    val out = ArrayBuffer.empty[Double]
    var i = 0
    while (i < arr.length) {
      val c = arr.charAt(i)
      if (c == '-' || c == '+' || c.isDigit) {
        var j = i
        while (j < arr.length && "+-0123456789.eE".indexOf(arr.charAt(j)) >= 0) j += 1
        val run = arr.substring(i, j)
        // A sign directly followed by a letter is a non-finite token
        // ("-Infinity"): report the full token, not the bare sign.
        if (j < arr.length && arr.charAt(j).isLetter)
          throw new IllegalArgumentException(
            s"invalid number in GeoJSON coordinates at offset $i: " +
              s"'${arr.substring(i, math.min(i + 12, arr.length))}...'")
        try out += java.lang.Double.parseDouble(run)
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"invalid number in GeoJSON coordinates at offset $i: '$run'")
        }
        i = j
      } else if (c.isLetter) {
        throw new IllegalArgumentException(
          s"invalid token in GeoJSON coordinates at offset $i: " +
            s"'${arr.substring(i, math.min(i + 12, arr.length))}'")
      } else i += 1
    }
    out.toArray
  }

  /** One nesting level: [[pair...],[pair...]] -> flat values + offsets. */
  private def nestedNumbers(arr: String): (Array[Double], Array[Int]) = {
    val values = ArrayBuffer.empty[Double]
    val offsets = ArrayBuffer(0)
    topElements(arr).foreach { part =>
      values ++= flatNumbers(part)
      offsets += values.length
    }
    (values.toArray, offsets.toArray)
  }
}
