package graft.functions

import graft.geom.{HilbertCurve, Kernels, MortonCurve}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Statically-callable eval bodies shared by interpreted `eval` and
 * generated code (`doGenCode` emits calls to these), keeping the st_* /
 * pipeline expressions inside whole-stage codegen instead of falling
 * back to interpreted evaluation per row.
 *
 * Geometry kind ids match the order point, multipoint, line, multiline,
 * polygon, multipolygon.
 */
object GeomEval {
  final val Point = 0
  final val MultiPoint = 1
  final val Line = 2
  final val MultiLine = 3
  final val Polygon = 4
  final val MultiPolygon = 5

  def kindId(kind: String): Int = kind match {
    case "point" => Point
    case "multipoint" => MultiPoint
    case "line" => Line
    case "multiline" => MultiLine
    case "polygon" => Polygon
    case "multipolygon" => MultiPolygon
    case other => throw new IllegalArgumentException(s"unknown geometry kind $other")
  }

  def area(depth: Int, g: AnyRef): Double = depth match {
    case 2 =>
      val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
      Kernels.area(v, o)
    case 3 =>
      val (v, ro, _) = GeomData.flat3(g.asInstanceOf[ArrayData])
      Kernels.area(v, ro)
    case _ => 0.0
  }

  def length(depth: Int, g: AnyRef): Double = depth match {
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

  def bounds(depth: Int, g: AnyRef): InternalRow = {
    val values = GeomData.flatValues(g, depth)
    val b = Kernels.totalBounds(values)
    InternalRow(b(0), b(1), b(2), b(3))
  }

  def intersectsBounds(kind: Int, g: AnyRef,
                       bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean =
    kind match {
      case Point =>
        val row = g.asInstanceOf[InternalRow]
        val px = row.getDouble(0)
        val py = row.getDouble(1)
        var lx0 = bx0; var ly0 = by0; var lx1 = bx1; var ly1 = by1
        if (lx1 < lx0) { val t = lx0; lx0 = lx1; lx1 = t }
        if (ly1 < ly0) { val t = ly0; ly0 = ly1; ly1 = t }
        // NaN x => outside; the reference tests only x for NaN
        // (reference: point.py:74-86, point.py:196-210)
        !(px.isNaN || px < lx0 || px > lx1 || py < ly0 || py > ly1)
      case MultiPoint =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        Kernels.multipointIntersectsBounds(bx0, by0, bx1, by1, v, 0, v.length)
      case Line =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        Kernels.lineIntersectsBounds(bx0, by0, bx1, by1, v, Array(0, v.length))
      case MultiLine =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Kernels.lineIntersectsBounds(bx0, by0, bx1, by1, v, o)
      case Polygon =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Kernels.polygonIntersectsBounds(bx0, by0, bx1, by1, v, o)
      case MultiPolygon =>
        val (v, ro, po) = GeomData.flat3(g.asInstanceOf[ArrayData])
        Kernels.multipolygonIntersectsBounds(bx0, by0, bx1, by1, v, ro, po)
    }

  def intersectsPoint(rightKind: Int, p: InternalRow, g: AnyRef): Boolean = {
    val x = p.getDouble(0)
    val y = p.getDouble(1)
    rightKind match {
      case Point =>
        val r = g.asInstanceOf[InternalRow]
        x == r.getDouble(0) && y == r.getDouble(1)
      case MultiPoint =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        var i = 0
        var found = false
        while (i + 1 < v.length && !found) {
          found = v(i) == x && v(i + 1) == y
          i += 2
        }
        found
      case Line =>
        val v = GeomData.flat1(g.asInstanceOf[ArrayData])
        pointIntersectsLine(x, y, v, Array(0, v.length))
      case MultiLine =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        pointIntersectsLine(x, y, v, o)
      case Polygon =>
        val (v, o) = GeomData.flat2(g.asInstanceOf[ArrayData])
        Kernels.pointIntersectsPolygon(x, y, v, o)
      case MultiPolygon =>
        val (v, ro, _) = GeomData.flat3(g.asInstanceOf[ArrayData])
        Kernels.pointIntersectsPolygon(x, y, v, ro)
    }
  }

  /** Flat coordinate parts of any geometry kind: (values, offsets) where
    * part i spans values[offsets(i) until offsets(i+1)). For polygons /
    * multipolygons the parts are the (closed) RINGS — i.e. the boundary
    * as a segment soup, plus the same arrays feed the winding-number
    * interior test. */
  private def partsOf(kind: Int, g: AnyRef): (Array[Double], Array[Int]) = kind match {
    case Point =>
      val r = g.asInstanceOf[InternalRow]
      (Array(r.getDouble(0), r.getDouble(1)), Array(0, 2))
    case MultiPoint | Line =>
      val v = GeomData.flat1(g.asInstanceOf[ArrayData])
      (v, Array(0, v.length))
    case MultiLine | Polygon =>
      GeomData.flat2(g.asInstanceOf[ArrayData])
    case MultiPolygon =>
      val (v, ro, _) = GeomData.flat3(g.asInstanceOf[ArrayData])
      (v, ro)
  }

  private def isPointy(kind: Int): Boolean = kind == Point || kind == MultiPoint
  private def isPolygonal(kind: Int): Boolean = kind == Polygon || kind == MultiPolygon

  /** Exact geometry × geometry intersection over the FULL kind matrix —
    * the extension past the reference's point-LHS-only support
    * (geometry/base.py:634-651 raises NotImplementedError there; SURVEY
    * §2.2 "extension: full matrix"). Composed entirely from the ported
    * reference kernels: point equality / point-on-line / winding-number
    * point-in-polygon for point sides, exact segment-pair intersection
    * for line/boundary sides, plus vertex-containment for polygon
    * interiors (if two closed shapes overlap with no boundary crossing,
    * one contains the other, so some vertex is interior). */
  def intersectsGeom(kindA: Int, a: AnyRef, kindB: Int, b: AnyRef): Boolean = {
    if (isPointy(kindA) && isPointy(kindB)) {
      val (va, _) = partsOf(kindA, a)
      val (vb, _) = partsOf(kindB, b)
      var i = 0
      while (i + 1 < va.length) {
        var j = 0
        while (j + 1 < vb.length) {
          if (va(i) == vb(j) && va(i + 1) == vb(j + 1)) return true
          j += 2
        }
        i += 2
      }
      return false
    }
    if (isPointy(kindA)) return pointsIntersectGeom(kindA, a, kindB, b)
    if (isPointy(kindB)) return pointsIntersectGeom(kindB, b, kindA, a)
    val (va, oa) = partsOf(kindA, a)
    val (vb, ob) = partsOf(kindB, b)
    if (Kernels.anySegmentsCross(va, oa, vb, ob)) return true
    if (isPolygonal(kindA) && Kernels.anyVertexInPolygon(vb, va, oa)) return true
    if (isPolygonal(kindB) && Kernels.anyVertexInPolygon(va, vb, ob)) return true
    false
  }

  /** Any point of the point/multipoint side intersects the line-ish or
    * polygonal geometry (same per-point kernels as [[intersectsPoint]]). */
  private def pointsIntersectGeom(ptKind: Int, p: AnyRef, kind: Int, g: AnyRef): Boolean = {
    val (pts, _) = partsOf(ptKind, p)
    val (v, o) = partsOf(kind, g)
    val polygonal = isPolygonal(kind)
    var i = 0
    while (i + 1 < pts.length) {
      val x = pts(i); val y = pts(i + 1)
      if (java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y)) {
        val hit =
          if (polygonal) Kernels.pointIntersectsPolygon(x, y, v, o)
          else pointIntersectsLine(x, y, v, o)
        if (hit) return true
      }
      i += 2
    }
    false
  }

  /** Point-on-line: per part, bbox check then vertex check then segment
    * pass-through (reference: point.py:270-311, _perform_intersects_line). */
  def pointIntersectsLine(x: Double, y: Double,
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

  def hilbert(depth: Int, p: Int, g: AnyRef,
              tx0: Double, ty0: Double, tx1: Double, ty1: Double): Long = {
    val bounds =
      if (depth == 0) {
        val row = g.asInstanceOf[InternalRow]
        val x = row.getDouble(0); val y = row.getDouble(1)
        Array(x, y, x, y)
      } else Kernels.totalBounds(GeomData.flatValues(g, depth))
    HilbertCurve.distanceFromBounds(p, bounds(0), bounds(1), bounds(2), bounds(3),
      tx0, ty0, tx1, ty1)
  }

  /** Morton (z-order) twin of [[hilbert]]: same bbox-center quantization,
    * bit-interleaved code instead of the Skilling transform. */
  def morton(depth: Int, p: Int, g: AnyRef,
             tx0: Double, ty0: Double, tx1: Double, ty1: Double): Long = {
    val bounds =
      if (depth == 0) {
        val row = g.asInstanceOf[InternalRow]
        val x = row.getDouble(0); val y = row.getDouble(1)
        Array(x, y, x, y)
      } else Kernels.totalBounds(GeomData.flatValues(g, depth))
    MortonCurve.distanceFromBounds(p, bounds(0), bounds(1), bounds(2), bounds(3),
      tx0, ty0, tx1, ty1)
  }
}

/** Static bodies for the text/vector pipeline expressions. */
object TextEval {

  /** All overlapping `n`-code-point character grams, ONE pass over the
    * UTF-8 bytes (code-point starts collected once, grams sliced by
    * byte offset). The builtin-composed substr(i, n) formulation is
    * O(len²): every substr re-scans from the buffer start for
    * code-point indexing. Gram VALUES are identical to the substr
    * formulation, so SQL oracles keep using substr. */
  def charNgrams(t: UTF8String, n: Int): ArrayData = {
    val bytes = t.getBytes
    var points = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) points += 1
      i += 1
    }
    if (points < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](points + 1)
    var p = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(p) = i; p += 1 }
      i += 1
    }
    starts(points) = bytes.length
    val out = new Array[Any](points - n + 1)
    var j = 0
    while (j < out.length) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + n) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Plain char-level rolling hash: h = h*P + codePoint (mod 2^64)
    * over the CODE POINTS of `t`, seeded. No tokenization, no
    * finisher — the exact `traw` stage of the fingerprint oracle, so
    * SQL replays it as one list_reduce of ord() values. Drives the
    * CDC boundary test. */
  def charRollHash(t: UTF8String, seed: Long): Long = {
    val P = 1099511628211L
    val bytes = t.getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      var cp = 0
      var extra = 0
      if (b < 0x80) { cp = b; extra = 0 }
      else if ((b & 0xe0) == 0xc0) { cp = b & 0x1f; extra = 1 }
      else if ((b & 0xf0) == 0xe0) { cp = b & 0x0f; extra = 2 }
      else { cp = b & 0x07; extra = 3 }
      var j = 0
      while (j < extra && i + 1 + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + 1 + j) & 0x3f)
        j += 1
      }
      i += 1 + extra
      h = h * P + cp
    }
    h
  }

  /** Unicode NFC (canonical composition). Pure-ASCII input — the
    * dominant case in a web corpus — is detected with one branch-
    * predictable byte scan and returns the original buffer with no
    * String allocation at all; only multibyte rows decode for the
    * isNormalized quick-check / normalize. */
  def nfc(t: UTF8String): UTF8String = {
    val bytes = t.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return t // all ASCII: NFC by definition
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def simhash(t: UTF8String, ngram: Int, seed: Long): Long = {
    val bytes = t.getBytes
    val toks = TextHashing.tokenHashes(bytes, seed)
    val counts = new Array[Int](64)
    val n = toks.length
    if (n >= ngram) {
      var i = 0
      while (i + ngram <= n) {
        val h = TextHashing.gramHash(toks, i, ngram, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def minhash(t: UTF8String, shingle: Int, numHashes: Int, seed: Long): ArrayData = {
    val bytes = t.getBytes
    val toks = TextHashing.tokenHashes(bytes, seed)
    val n = toks.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // 2-universal per-gram family: hash_j = h1 + j*h2 (h2 odd). Two
    // mix64 per shingle instead of numHashes of them — the signature
    // stage is CPU-bound at corpus scale and this is its hot loop. The
    // standard LSH band analysis holds for this family.
    val seedA = TextHashing.mix64(seed + 0x9e3779b97f4a7c15L)
    val seedB = TextHashing.mix64(seed + 2 * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i + shingle <= n) {
      val h = TextHashing.gramHash(toks, i, shingle, seed)
      val h2 = TextHashing.mix64(h ^ seedB) | 1L
      var hj = TextHashing.mix64(h ^ seedA)
      var j = 0
      while (j < numHashes) {
        if (hj < mins(j)) mins(j) = hj
        hj += h2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** All n-gram hashes of the whitespace-tokenized text, one per
    * position (with duplicates — slot semantics, not set semantics).
    * Fuses tokenize + gram-build + hash into one pass with zero
    * intermediate strings: the vectorized replacement for
    * explode(transform(slice…)) + xxhash64 in the decontamination path. */
  def ngramHashes(t: UTF8String, ngram: Int, seed: Long): ArrayData = {
    val toks = TextHashing.tokenHashes(t.getBytes, seed)
    val count = toks.length - ngram + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      out(i) = TextHashing.gramHash(toks, i, ngram, seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  def jaccard(l: UTF8String, r: UTF8String, ngram: Int): Double = {
    def grams(t: UTF8String): scala.collection.mutable.HashSet[Long] = {
      val bytes = t.getBytes
      val toks = TextHashing.tokenHashes(bytes, 0L)
      val set = new scala.collection.mutable.HashSet[Long]
      var i = 0
      while (i + ngram <= toks.length) {
        set += TextHashing.gramHash(toks, i, ngram, 0L)
        i += 1
      }
      set
    }
    val a = grams(l)
    val b = grams(r)
    // empty-vs-empty = 0.0: two docs too short to have any n-grams share
    // no content; a SQL oracle's 0/0 division (NULL) drops such pairs the
    // same way (ADVICE r1: short docs must not read as perfect dups)
    if (a.isEmpty && b.isEmpty) 0.0
    else {
      val inter = a.count(b.contains)
      inter.toDouble / (a.size + b.size - inter)
    }
  }

  /** " " + lower(text) + " " as UTF-8 bytes (lowercased exactly as
    * Spark's lower(), so oracle parity is unchanged). */
  def paddedLowerBytes(t: UTF8String): Array[Byte] = {
    val low = t.toLowerCase.getBytes
    val out = new Array[Byte](low.length + 2)
    out(0) = ' '
    System.arraycopy(low, 0, out, 1, low.length)
    out(out.length - 1) = ' '
    out
  }

  /** Non-overlapping left-to-right occurrence count — exactly the
    * (length(s) - length(replace(s, needle, ''))) / length(needle)
    * arithmetic of the SQL oracle, without materializing the replace. */
  def countOccurrences(hay: Array[Byte], needle: Array[Byte]): Int = {
    var count = 0
    var i = 0
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) { count += 1; i += needle.length }
      else i += 1
    }
    count
  }

  def fingerprint(t: UTF8String, seed: Long): Long = {
    val bytes = t.getBytes
    val toks = TextHashing.tokenHashes(bytes, seed)
    var h = seed
    var i = 0
    while (i < toks.length) {
      h = h * 0x100000001b3L + toks(i)
      i += 1
    }
    TextHashing.mix64(h)
  }

  def cosine(leftFloat: Boolean, rightFloat: Boolean, a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** PQ encode: nearest sub-centroid per subspace by reconstruction L2
    * (argmax of dot - |c|^2/2). cb is (m)(ksub)(dsub); halfSq is the
    * precomputed |c|^2/2 table. One kernel loop instead of an m*ksub
    * expression forest (which blows up codegen compile time). */
  /** Total dimensionality the codebook expects; ragged input vectors
    * must fail loudly, not read past the array (unsafe rows would
    * silently yield garbage codes). */
  private def pqRequireDim(v: ArrayData, cb: Array[Array[Array[Double]]]): Unit = {
    var need = 0
    var i = 0
    while (i < cb.length) { need += cb(i)(0).length; i += 1 }
    if (v.numElements() < need)
      throw new IllegalArgumentException(
        s"pq: vector has ${v.numElements()} dims, codebook expects $need")
  }

  def pqEncode(isFloat: Boolean, v: ArrayData,
               cb: Array[Array[Array[Double]]],
               halfSq: Array[Array[Double]]): ArrayData = {
    pqRequireDim(v, cb)
    val m = cb.length
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val dsub = cb(i)(0).length
      val base = i * dsub
      var best = Double.NegativeInfinity
      var bestJ = 0
      var j = 0
      while (j < cb(i).length) {
        val c = cb(i)(j)
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) v.getFloat(base + d).toDouble else v.getDouble(base + d)
          s += x * c(d)
          d += 1
        }
        s -= halfSq(i)(j)
        if (s > best) { best = s; bestJ = j }
        j += 1
      }
      out(i) = bestJ.toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** PQ lookup table: per (subspace, sub-centroid) dot products of the
    * query vector against the codebook — array(m) of array(ksub). */
  def pqLut(isFloat: Boolean, v: ArrayData,
            cb: Array[Array[Array[Double]]]): ArrayData = {
    pqRequireDim(v, cb)
    val m = cb.length
    val rows = new Array[ArrayData](m)
    var i = 0
    while (i < m) {
      val dsub = cb(i)(0).length
      val base = i * dsub
      val lut = new Array[Double](cb(i).length)
      var j = 0
      while (j < cb(i).length) {
        val c = cb(i)(j)
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) v.getFloat(base + d).toDouble else v.getDouble(base + d)
          s += x * c(d)
          d += 1
        }
        lut(j) = s
        j += 1
      }
      rows(i) = new GenericArrayData(lut)
      i += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  def dot(leftFloat: Boolean, rightFloat: Boolean, a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def quantizedDot(leftFloat: Boolean, rightFloat: Boolean,
                   a: ArrayData, b: ArrayData, scale: Double): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += roundHalfUp(x * scale) * roundHalfUp(y * scale)
      i += 1
    }
    dot
  }

  @inline private def roundHalfUp(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  /** Per-executor cache of SRP sign tables: the ±1 projection components
    * depend only on (seed, bits, dim), so computing mix64 per (row, bit,
    * dim) wastes bits*dim hashes on every row — at 100 TB that's the
    * dominant cost of the LSH pass. Built once, published safely via
    * computeIfAbsent; one entry per (seed,bits,dim) triple in practice. */
  private val srpTables =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Long]]

  private def srpSigns(seed: Long, bits: Int, dim: Int): Array[Long] =
    srpTables.computeIfAbsent((seed, bits, dim), { key =>
      val (s, b, n) = key
      val tbl = new Array[Long](b * n)
      var j = 0
      while (j < b) {
        var d = 0
        while (d < n) {
          tbl(j * n + d) =
            if ((TextHashing.mix64(s ^ (j.toLong << 32) ^ d.toLong) & 1L) == 1L) 1L else -1L
          d += 1
        }
        j += 1
      }
      tbl
    })

  /** SRP projection scale: components quantize to round(x·2²⁰) before
    * the signed accumulation, so each bit is the sign of an EXACT
    * (order-independent) integer sum — bit-replayable by an independent
    * engine, unlike a floating-point left fold whose sign near zero
    * depends on summation order. 2²⁰ keeps quantization noise (≤ dim/2
    * units = dim·2⁻²¹ in value) far below any meaningful projection
    * magnitude while 64-dim unit-ish vectors stay orders of magnitude
    * under Long overflow. */
  val SrpQuantScale: Double = 1048576.0

  def srpBits(isFloat: Boolean, v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    val signs = srpSigns(seed, bits, n)
    var out = 0L
    var j = 0
    while (j < bits) {
      var acc = 0L
      val base = j * n
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        acc += signs(base + d) * roundHalfUp(x * SrpQuantScale).toLong
        d += 1
      }
      if (acc > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Bloom-filter membership probe over a power-of-two bit array
    * (`words.length * 64` bits). Double hashing (Kirsch-Mitzenmacher):
    * probe i tests bit (h1 + i*h2) & mask. No false negatives by
    * construction; the false-positive rate is the standard
    * (1 - e^(-k·n/m))^k. Shared verbatim by the builder
    * ([[graft.functions.LongBloom]]) and [[graft.functions.BloomMightContain]],
    * interpreted and codegen'd alike. */
  def bloomContains(x: Long, words: Array[Long], k: Int): Boolean = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = TextHashing.mix64(x ^ 0x71ee2bdcbdd6f9a1L)
    val h2 = TextHashing.mix64(x ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val bit = (h1 + i * h2) & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
