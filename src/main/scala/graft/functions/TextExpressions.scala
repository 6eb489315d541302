package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions for the large-scale training-data pipeline
 * operators (dedup, similarity, fingerprinting). These extend the engine
 * beyond the reference's spatial surface; implemented as native
 * expressions (not UDFs) so they stay inside Tungsten rows with no ser/de.
 *
 * All hashing is deterministic (fixed mixing constants, seeds passed
 * explicitly) so results are reproducible across runs and cluster sizes.
 */
object TextHashing {
  /** 64-bit avalanche mix (splitmix64 finalizer — public domain constant
    * scheme, same family as Spark's own hash finalizers). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Rolling polynomial hash of UTF-8 bytes in [from, until). */
  def bytesHash(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = seed
    var i = from
    while (i < until) {
      h = h * 0x100000001b3L + bytes(i)
      i += 1
    }
    mix64(h)
  }

  /** Hashes of whitespace-delimited tokens, in order. Whitespace layout
    * does not affect the result (tokens are hashed individually), so
    * gram hashes match a `split(text, '\s+')`-based oracle exactly. */
  def tokenHashes(bytes: Array[Byte], seed: Long): Array[Long] = {
    val (starts, ends) = tokenSpans(bytes)
    val out = new Array[Long](starts.length)
    var i = 0
    while (i < starts.length) {
      out(i) = bytesHash(bytes, starts(i), ends(i), seed)
      i += 1
    }
    out
  }

  /** Hash of the n consecutive token hashes starting at i. */
  @inline def gramHash(toks: Array[Long], i: Int, n: Int, seed: Long): Long = {
    var h = seed
    var j = i
    while (j < i + n) {
      h = h * 0x100000001b3L + toks(j)
      j += 1
    }
    mix64(h)
  }

  /** Split UTF-8 text into whitespace-delimited token spans; returns
    * (starts, ends) index arrays into the byte array. */
  def tokenSpans(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
    val starts = new scala.collection.mutable.ArrayBuffer[Int]
    val ends = new scala.collection.mutable.ArrayBuffer[Int]
    var i = 0
    var inTok = false
    var s = 0
    while (i < bytes.length) {
      val ws = bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' || bytes(i) == '\r'
      if (!ws && !inTok) { inTok = true; s = i }
      else if (ws && inTok) { inTok = false; starts += s; ends += i }
      i += 1
    }
    if (inTok) { starts += s; ends += bytes.length }
    (starts.toArray, ends.toArray)
  }
}

/** 64-bit SimHash over word n-grams: each n-gram hash votes ±1 per bit;
  * the sign of each bit-sum forms the fingerprint. Near-duplicate texts
  * have fingerprints within a small Hamming distance. */
case class SimHash64(child: Expression, ngram: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(ngram >= 1)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(t: Any): Any = {
    val bytes = t.asInstanceOf[UTF8String].getBytes
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
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** MinHash signature over word shingles: numHashes permutation minima of
  * shingle hashes, h_i(x) = mix64(x ^ seed_i). Returns array<long>;
  * identical shingle sets => identical signatures, Jaccard-similar sets
  * agree on ~J fraction of slots (standard MinHash estimator). */
case class MinHashSignature(child: Expression, shingle: Int, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(shingle >= 1 && numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => TextHashing.mix64(seed + 0x9e3779b97f4a7c15L * (i + 1)))

  override protected def nullSafeEval(t: Any): Any = {
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val toks = TextHashing.tokenHashes(bytes, seed)
    val n = toks.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i + shingle <= n) {
      val h = TextHashing.gramHash(toks, i, shingle, seed)
      var j = 0
      while (j < numHashes) {
        val hj = TextHashing.mix64(h ^ seeds(j))
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(c)
}

/** Exact word-n-gram Jaccard similarity between two texts (the verify
  * stage after LSH candidate generation). */
case class NgramJaccard(left: Expression, right: Expression, ngram: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  private def grams(t: UTF8String): scala.collection.mutable.HashSet[Long] = {
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

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = grams(l.asInstanceOf[UTF8String])
    val b = grams(r.asInstanceOf[UTF8String])
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.count(b.contains)
      inter.toDouble / (a.size + b.size - inter)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NgramJaccard =
    copy(left = l, right = r)
}

/** Rolling-hash document fingerprint: hash of the full normalized
  * (whitespace-collapsed) token stream. Equal token streams => equal
  * fingerprints regardless of whitespace layout. */
case class DocFingerprint(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(t: Any): Any = {
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val toks = TextHashing.tokenHashes(bytes, seed)
    var h = seed
    var i = 0
    while (i < toks.length) {
      h = h * 0x100000001b3L + toks(i)
      i += 1
    }
    TextHashing.mix64(h)
  }
  override protected def withNewChildInternal(c: Expression): DocFingerprint = copy(c)
}

/** Cosine similarity between two numeric arrays (float or double),
  * accumulated in double, sequential order. 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  @inline private def get(ad: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)

  private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, leftFloat, i)
      val y = get(b, rightFloat, i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Integer-quantized dot product: sum of round(x*scale)*round(y*scale)
  * accumulated in double. Products of quantized values are exact
  * integers (< 2^53), so the sum is order-independent and bit-exact
  * across engines — the ranking primitive for oracle-checkable ANN. */
case class QuantizedDot(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_dot"

  private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      // BigDecimal HALF_UP matches both Spark's round() and DuckDB's
      // round() (ties away from zero) — plain math.round floors ties
      // for negative values and would diverge
      dot += roundHalfUp(x * scale) * roundHalfUp(y * scale)
      i += 1
    }
    dot
  }

  @inline private def roundHalfUp(v: Double): Double = {
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

/** Sign-random-projection LSH bits for cosine ANN: bit j = sign of
  * <v, r_j> where r_j components are deterministic ±1 from mix64(seed,
  * j, dim). Vectors with high cosine similarity agree on most bits. */
case class SrpBits(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 64)
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bits"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var out = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val sign = if ((TextHashing.mix64(seed ^ (j.toLong << 32) ^ d.toLong) & 1L) == 1L) 1.0 else -1.0
        val x = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
        acc += sign * x
        d += 1
      }
      if (acc > 0) out |= (1L << j)
      j += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): SrpBits = copy(c)
}
