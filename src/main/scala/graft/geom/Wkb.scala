package graft.geom

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/**
 * Minimal WKB (well-known binary, OGC SFA part 1 §8.2) reader/writer
 * over the flat interleaved-coordinate model — the interop surface for
 * the broader geo ecosystem: geopandas' GeoParquet stores geometry as
 * WKB blobs, so parsing WKB is what lets this engine read those files
 * directly (reference ingestion analog: geometry/base.py:185-215 via
 * shapely, which speaks WKB natively).
 *
 * Writing always emits little-endian (NDR, byteOrder=1), the form every
 * mainstream writer produces; parsing honours either byte-order flag,
 * including mixed orders on nested geometries. 2-D only, matching the
 * engine's coordinate model (SURVEY §1.4); Z/M or SRID-prefixed (EWKB)
 * payloads are rejected loudly rather than misread.
 */
object Wkb {

  private val PointT = 1
  private val LineT = 2
  private val PolygonT = 3
  private val MultiPointT = 4
  private val MultiLineT = 5
  private val MultiPolygonT = 6

  // ---------- writing (little-endian) ----------

  private def alloc(cap: Int): ByteBuffer =
    ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN)

  private def header(b: ByteBuffer, tpe: Int): Unit = {
    b.put(1.toByte); b.putInt(tpe)
  }

  def point(x: Double, y: Double): Array[Byte] = {
    val b = alloc(21)
    header(b, PointT); b.putDouble(x); b.putDouble(y)
    b.array
  }

  def multiPoint(values: Array[Double]): Array[Byte] = {
    val n = values.length / 2
    val b = alloc(9 + n * 21)
    header(b, MultiPointT); b.putInt(n)
    var i = 0
    while (i < n) {
      header(b, PointT); b.putDouble(values(2 * i)); b.putDouble(values(2 * i + 1))
      i += 1
    }
    b.array
  }

  def lineString(values: Array[Double]): Array[Byte] = {
    val b = alloc(9 + values.length * 8)
    header(b, LineT); b.putInt(values.length / 2)
    var i = 0
    while (i < values.length) { b.putDouble(values(i)); i += 1 }
    b.array
  }

  private def putRings(b: ByteBuffer, values: Array[Double],
                       offsets: Array[Int], from: Int, until: Int): Unit = {
    b.putInt(until - from)
    var p = from
    while (p < until) {
      b.putInt((offsets(p + 1) - offsets(p)) / 2)
      var i = offsets(p)
      while (i < offsets(p + 1)) { b.putDouble(values(i)); i += 1 }
      p += 1
    }
  }

  def polygon(values: Array[Double], ringOffsets: Array[Int]): Array[Byte] = {
    val nRings = ringOffsets.length - 1
    val b = alloc(9 + 4 * nRings + 8 * values.length)
    header(b, PolygonT)
    putRings(b, values, ringOffsets, 0, nRings)
    b.array
  }

  def multiLineString(values: Array[Double], offsets: Array[Int]): Array[Byte] = {
    val nParts = offsets.length - 1
    val b = alloc(9 + nParts * 9 + 8 * values.length)
    header(b, MultiLineT); b.putInt(nParts)
    var p = 0
    while (p < nParts) {
      header(b, LineT); b.putInt((offsets(p + 1) - offsets(p)) / 2)
      var i = offsets(p)
      while (i < offsets(p + 1)) { b.putDouble(values(i)); i += 1 }
      p += 1
    }
    b.array
  }

  def multiPolygon(values: Array[Double], ringOffsets: Array[Int],
                   polyOffsets: Array[Int]): Array[Byte] = {
    val nPolys = polyOffsets.length - 1
    val nRings = ringOffsets.length - 1
    val b = alloc(9 + nPolys * 9 + nRings * 4 + 8 * values.length)
    header(b, MultiPolygonT); b.putInt(nPolys)
    var p = 0
    while (p < nPolys) {
      header(b, PolygonT)
      putRings(b, values, ringOffsets, polyOffsets(p), polyOffsets(p + 1))
      p += 1
    }
    b.array
  }

  /** Split a NaN-pen-up line into (values-without-NaN, part offsets) —
    * WKB (like GeoJSON) has no non-finite coordinate convention, so a
    * pen-up line exports as MULTILINESTRING. */
  def splitPenUp(values: Array[Double]): (Array[Double], Array[Int]) = {
    val out = ArrayBuffer.empty[Double]
    val offsets = ArrayBuffer(0)
    var i = 0
    while (i < values.length) {
      if (values(i).isNaN) {
        if (out.length > offsets.last) offsets += out.length
        i += 2 // NaN separator pair
      } else {
        out += values(i); out += values(i + 1)
        i += 2
      }
    }
    if (out.length > offsets.last) offsets += out.length
    (out.toArray, offsets.toArray)
  }

  /** Rejoin multi-part values with NaN-pair separators (the inverse of
    * [[splitPenUp]], shared with the GeoJSON reader's line handling). */
  def rejoinPenUp(v: Array[Double], offsets: Array[Int]): Array[Double] = {
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

  // ---------- parsing (either endianness) ----------

  def parse(bytes: Array[Byte]): Wkt.Geom = {
    val b = ByteBuffer.wrap(bytes)
    val g = parseGeom(b)
    require(!b.hasRemaining, s"trailing bytes after WKB geometry (${b.remaining} left)")
    g
  }

  private def readHeader(b: ByteBuffer): Int = {
    val bo = b.get()
    require(bo == 0 || bo == 1, s"bad WKB byte-order flag $bo")
    b.order(if (bo == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val raw = b.getInt
    // 2-D plain WKB only: ISO Z/M types live at +1000/+2000/+3000,
    // EWKB sets dimension/SRID flag bits in the high byte
    require(raw >= 1 && raw <= 6,
      s"unsupported WKB geometry type $raw (only 2-D types 1-6; Z/M/EWKB rejected)")
    raw
  }

  private def expect(b: ByteBuffer, tpe: Int): Unit = {
    val got = readHeader(b)
    require(got == tpe, s"nested WKB type $got, expected $tpe")
  }

  private def readCoords(b: ByteBuffer, nPoints: Int, out: ArrayBuffer[Double]): Unit = {
    var i = 0
    while (i < nPoints) { out += b.getDouble; out += b.getDouble; i += 1 }
  }

  private def parseGeom(b: ByteBuffer): Wkt.Geom = readHeader(b) match {
    case PointT =>
      val x = b.getDouble; val y = b.getDouble
      if (x.isNaN && y.isNaN) Wkt.Geom("point", Array.empty, Array(0), Array(0))
      else Wkt.Geom("point", Array(x, y), Array(0, 2), Array.empty)
    case LineT =>
      val out = ArrayBuffer.empty[Double]
      readCoords(b, b.getInt, out)
      Wkt.Geom("line", out.toArray, Array(0, out.length), Array.empty)
    case MultiPointT =>
      val n = b.getInt
      val out = ArrayBuffer.empty[Double]
      var i = 0
      while (i < n) { expect(b, PointT); readCoords(b, 1, out); i += 1 }
      Wkt.Geom("multipoint", out.toArray, Array(0, out.length), Array.empty)
    case MultiLineT =>
      val n = b.getInt
      val values = ArrayBuffer.empty[Double]
      val offsets = ArrayBuffer(0)
      var i = 0
      while (i < n) {
        expect(b, LineT)
        readCoords(b, b.getInt, values)
        offsets += values.length
        i += 1
      }
      Wkt.Geom("multiline", values.toArray, offsets.toArray, Array.empty)
    case PolygonT =>
      val values = ArrayBuffer.empty[Double]
      val offsets = ArrayBuffer(0)
      readPolygonBody(b, values, offsets)
      Wkt.Geom("polygon", values.toArray, offsets.toArray, Array.empty)
    case MultiPolygonT =>
      val n = b.getInt
      val values = ArrayBuffer.empty[Double]
      val ringOffsets = ArrayBuffer(0)
      val polyOffsets = ArrayBuffer(0)
      var i = 0
      while (i < n) {
        expect(b, PolygonT)
        readPolygonBody(b, values, ringOffsets)
        polyOffsets += ringOffsets.length - 1
        i += 1
      }
      Wkt.Geom("multipolygon", values.toArray, ringOffsets.toArray, polyOffsets.toArray)
  }

  private def readPolygonBody(b: ByteBuffer, values: ArrayBuffer[Double],
                              ringOffsets: ArrayBuffer[Int]): Unit = {
    val nRings = b.getInt
    var r = 0
    while (r < nRings) {
      readCoords(b, b.getInt, values)
      ringOffsets += values.length
      r += 1
    }
  }
}
