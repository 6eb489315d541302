package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Conversions between Catalyst values and the flat interleaved-coordinate
 * buffers the graft.geom kernels operate on.
 *
 * Geometry schemas (SURVEY.md §1.2, reference: geometry/baselist.py:189-198):
 *   point         struct<x:double, y:double>
 *   multipoint /
 *   line / ring   array<double>                        (interleaved x,y)
 *   multiline /
 *   polygon       array<array<double>>                 (parts / rings)
 *   multipolygon  array<array<array<double>>>          (polys / rings)
 */
object GeomData {

  val pointType: StructType =
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))
  val coordsType: ArrayType = ArrayType(DoubleType, containsNull = false)
  val ringsType: ArrayType = ArrayType(coordsType, containsNull = false)
  val polysType: ArrayType = ArrayType(ringsType, containsNull = false)
  val boundsType: StructType = StructType(Seq(
    StructField("x0", DoubleType), StructField("y0", DoubleType),
    StructField("x1", DoubleType), StructField("y1", DoubleType)))

  /** 0 = point struct, 1..3 = array nesting depth, -1 = not a geometry. */
  def nestingDepth(dt: DataType): Int = dt match {
    case _: StructType => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(ArrayType(DoubleType, _), _) => 2
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => 3
    case _ => -1
  }

  /** depth-1 geometry -> flat values. */
  def flat1(ad: ArrayData): Array[Double] = ad.toDoubleArray()

  /** depth-2 geometry -> (flat values, part offsets). */
  def flat2(ad: ArrayData): (Array[Double], Array[Int]) = {
    val n = ad.numElements()
    val parts = new Array[Array[Double]](n)
    var total = 0
    var i = 0
    while (i < n) {
      parts(i) = ad.getArray(i).toDoubleArray()
      total += parts(i).length
      i += 1
    }
    val values = new Array[Double](total)
    val offsets = new Array[Int](n + 1)
    var pos = 0
    i = 0
    while (i < n) {
      System.arraycopy(parts(i), 0, values, pos, parts(i).length)
      pos += parts(i).length
      offsets(i + 1) = pos
      i += 1
    }
    (values, offsets)
  }

  /** depth-3 geometry -> (flat values, ring offsets, poly offsets).
    * polyOffsets index into ringOffsets. */
  def flat3(ad: ArrayData): (Array[Double], Array[Int], Array[Int]) = {
    val nPolys = ad.numElements()
    val polyOffsets = new Array[Int](nPolys + 1)
    var nRings = 0
    var i = 0
    while (i < nPolys) {
      nRings += ad.getArray(i).numElements()
      polyOffsets(i + 1) = nRings
      i += 1
    }
    val rings = new Array[Array[Double]](nRings)
    var total = 0
    var r = 0
    i = 0
    while (i < nPolys) {
      val poly = ad.getArray(i)
      var j = 0
      while (j < poly.numElements()) {
        rings(r) = poly.getArray(j).toDoubleArray()
        total += rings(r).length
        r += 1
        j += 1
      }
      i += 1
    }
    val values = new Array[Double](total)
    val ringOffsets = new Array[Int](nRings + 1)
    var pos = 0
    r = 0
    while (r < nRings) {
      System.arraycopy(rings(r), 0, values, pos, rings(r).length)
      pos += rings(r).length
      ringOffsets(r + 1) = pos
      r += 1
    }
    (values, ringOffsets, polyOffsets)
  }

  /** Any-depth geometry -> flat coordinate values only (for bounds/hilbert). */
  def flatValues(value: Any, depth: Int): Array[Double] = depth match {
    case 0 =>
      val row = value.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      Array(row.getDouble(0), row.getDouble(1))
    case 1 => flat1(value.asInstanceOf[ArrayData])
    case 2 => flat2(value.asInstanceOf[ArrayData])._1
    case 3 => flat3(value.asInstanceOf[ArrayData])._1
    case _ => throw new IllegalArgumentException(s"not a geometry (depth $depth)")
  }

  def toArrayData(values: Array[Double]): ArrayData = new GenericArrayData(values)

  /** Rebuild a depth-2 value from flat values + offsets. */
  def nest2(values: Array[Double], offsets: Array[Int]): ArrayData = {
    val parts = new Array[Any](offsets.length - 1)
    var i = 0
    while (i < offsets.length - 1) {
      parts(i) = new GenericArrayData(java.util.Arrays.copyOfRange(values, offsets(i), offsets(i + 1)))
      i += 1
    }
    new GenericArrayData(parts)
  }

  /** Rebuild a depth-3 value from flat values + ring offsets + poly offsets. */
  def nest3(values: Array[Double], ringOffsets: Array[Int], polyOffsets: Array[Int]): ArrayData = {
    val polys = new Array[Any](polyOffsets.length - 1)
    var p = 0
    while (p < polyOffsets.length - 1) {
      val rings = new Array[Any](polyOffsets(p + 1) - polyOffsets(p))
      var r = 0
      while (r < rings.length) {
        val ri = polyOffsets(p) + r
        rings(r) = new GenericArrayData(
          java.util.Arrays.copyOfRange(values, ringOffsets(ri), ringOffsets(ri + 1)))
        r += 1
      }
      polys(p) = new GenericArrayData(rings)
      p += 1
    }
    new GenericArrayData(polys)
  }
}
