package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
 * Interpreted eval and generated code both call the static bodies in
 * [[TextEval]] — one copy of each kernel.
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
      // exactly Java regex \s = [ \t\n\x0B\f\r], so gram hashes agree
      // with the split("\\s+") string path and the SQL oracles
      val ws = bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' ||
        bytes(i) == '\r' || bytes(i) == 0x0B || bytes(i) == 0x0C
      if (!ws && !inTok) { inTok = true; s = i }
      else if (ws && inTok) { inTok = false; starts += s; ends += i }
      i += 1
    }
    if (inTok) { starts += s; ends += bytes.length }
    (starts.toArray, ends.toArray)
  }
}

/** Builder for the long-key Bloom filter probed by [[BloomMightContain]].
  * The bit array is sized to the next power of two of
  * `items * bitsPerItem` (so the probe is a mask, not a modulo) and the
  * probe count k = round(ln 2 · m/n), the standard optimum. */
object LongBloom {
  /** (bit count, k) sized for `n` items at roughly `bitsPerItem` bits
    * each: next power of two of n*bitsPerItem (the probe is a mask, not
    * a modulo); k from the REQUESTED density n*bitsPerItem, not the
    * rounded-up m — rounding m up only lowers the false-positive rate. */
  private def sizing(n: Long, bitsPerItem: Int): (Long, Int) = {
    require(bitsPerItem >= 1, "bitsPerItem must be >= 1")
    val items = math.max(1L, n)
    val mBits = math.max(64L, java.lang.Long.highestOneBit(
      math.max(1L, items * bitsPerItem - 1)) << 1)
    // the JVM caps a long[] at ~2^31 words = 2^37 bits (16 GiB). Fail
    // loudly instead of silently truncating the word count to Int
    // (which would build a zero-length filter for ~8.6B+ items).
    require((mBits >>> 6) <= Int.MaxValue.toLong,
      s"bloom filter of $items items x $bitsPerItem bits needs ${mBits} bits" +
        " — exceeds the JVM array limit; lower bitsPerItem or shard the filter")
    val k = math.max(1, math.round(0.6931471805599453 * bitsPerItem).toInt)
    (mBits, k)
  }

  /** Set the k probe bits of `x` in `words` (length a power of two). */
  private def add(words: Array[Long], k: Int, x: Long): Unit = {
    val mask = (words.length.toLong << 6) - 1
    val h1 = TextHashing.mix64(x ^ 0x71ee2bdcbdd6f9a1L)
    val h2 = TextHashing.mix64(x ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val bit = (h1 + i * h2) & mask
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** (bit words, k) for `values` at roughly `bitsPerItem` bits each. */
  def build(values: Array[Long], bitsPerItem: Int = 16): (Array[Long], Int) = {
    val (mBits, k) = sizing(values.length.toLong, bitsPerItem)
    val words = new Array[Long]((mBits >>> 6).toInt)
    var vi = 0
    while (vi < values.length) { add(words, k, values(vi)); vi += 1 }
    (words, k)
  }

  /** Distributed build over a single-LongType-column frame: each
    * partition folds its keys into a local bit array, and the arrays
    * tree-OR down to the driver — the driver receives FILTER-SIZED data
    * (m bits per tree edge), never the keys themselves. Two passes over
    * the hash column (a cheap count sizes the filter, then the fold);
    * both are narrow scans. This is the build path when the key set is
    * too large to collect ([[build]]'s contract). */
  def buildDistributed(hashes: org.apache.spark.sql.DataFrame,
                       bitsPerItem: Int = 16): (Array[Long], Int) = {
    require(hashes.schema.fields.length == 1 &&
      hashes.schema.fields(0).dataType == LongType,
      "buildDistributed expects a single LongType column")
    val (mBits, k) = sizing(hashes.count(), bitsPerItem)
    val numWords = (mBits >>> 6).toInt
    val rdd = hashes.toDF("__h").na.drop().rdd
    if (rdd.getNumPartitions == 0) (new Array[Long](numWords), k)
    else {
      val words = rdd
        .mapPartitions { it =>
          val w = new Array[Long](numWords)
          while (it.hasNext) add(w, k, it.next().getLong(0))
          Iterator.single(w)
        }
        .treeReduce({ (a, b) =>
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        }, depth = 2)
      (words, k)
    }
  }
}

/** Identity-equality holder for a Bloom bit array inside an expression
  * tree: Catalyst's structural equals/hashCode on a case-class field
  * would otherwise walk the (potentially megabytes-sized) word array on
  * every canonicalization / rule-fixpoint comparison during planning.
  * Two holders are equal only if they are the SAME object — plan
  * fragments built from one filter instance still deduplicate, and
  * nothing ever pays an O(bits) comparison. */
final class BloomBitsRef(val words: Array[Long]) extends Serializable {
  override def hashCode: Int = System.identityHashCode(this)
  override def equals(o: Any): Boolean = o match {
    case b: BloomBitsRef => this eq b
    case _ => false
  }
}

/** Bloom-filter membership test of a long key (true = maybe present,
  * false = definitely absent). The bits ride the plan as a codegen
  * reference object — Spark broadcasts the task binary once per
  * executor, so a megabytes-sized filter costs one transfer, not one
  * per task. This is the pre-shuffle guard for semi-join shapes whose
  * build side fits as ~bits-per-key but not as a hash relation. */
case class BloomMightContain(child: Expression, bits: BloomBitsRef, k: Int)
    extends UnaryExpression {
  require(bits.words.nonEmpty &&
    (bits.words.length & (bits.words.length - 1)) == 0,
    "bloom word count must be a nonzero power of two")
  require(k >= 1)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(x: Any): Any =
    TextEval.bloomContains(x.asInstanceOf[Long], bits.words, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloombits", bits.words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEval.bloomContains($c, $ref, $k)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/** 64-bit SimHash over word n-grams: each n-gram hash votes ±1 per bit;
  * the sign of each bit-sum forms the fingerprint. Near-duplicate texts
  * have fingerprints within a small Hamming distance. */
case class SimHash64(child: Expression, ngram: Int, seed: Long)
    extends UnaryExpression {
  require(ngram >= 1)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(t: Any): Any =
    TextEval.simhash(t.asInstanceOf[UTF8String], ngram, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextEval.simhash($c, $ngram, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** All overlapping n-code-point character grams of a text in one pass
  * (the char-bigram LM feature extractor). Equivalent to
  * transform(sequence(1, length-n+1), i -> substr(text, i, n)) but
  * O(len) instead of O(len²) — substr's code-point indexing re-scans
  * the buffer per call. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"
  override protected def nullSafeEval(t: Any): Any =
    TextEval.charNgrams(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextEval.charNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharNgrams = copy(c)
}

/** Char-level rolling hash (h = h*P + codePoint mod 2^64, seeded) — the
  * content-defined-chunking boundary hash. Matches a SQL list_reduce
  * over ord() values exactly (it IS the fingerprint oracle's traw
  * stage, minus tokenization and finisher). */
case class CharRollHash(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_roll_hash"
  override protected def nullSafeEval(t: Any): Any =
    TextEval.charRollHash(t.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextEval.charRollHash($c, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): CharRollHash = copy(c)
}

/** Multiplicative bucket hash: (child · const mod 2⁶⁴) >>> shift —
  * Java long wrap semantics, i.e. the top (64 − shift) bits of an
  * odd-constant multiply. The count–min-sketch row hash: exact integer
  * semantics an independent engine can replay with mod-2⁶⁴ HUGEINT
  * arithmetic. Implemented as an expression because ANSI mode
  * (Spark 4's default) makes `col * lit` THROW on the intended wrap. */
case class WrapMulShift(child: Expression, const: Long, shift: Int)
    extends UnaryExpression {
  require(shift >= 0 && shift < 64, "shift must be in [0, 64)")
  // input-type contract enforced at ANALYSIS time: a non-long child
  // would ClassCastException in the interpreted path and silently get
  // int-width wrap (≠ the intended mod-2⁶⁴) in codegen
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wrap_mul_shift requires a BIGINT child, got " +
          child.dataType.catalogString)
  override def dataType: DataType = LongType
  override def prettyName: String = "wrap_mul_shift"
  override protected def nullSafeEval(t: Any): Any =
    (t.asInstanceOf[Long] * const) >>> shift
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(($c * ${const}L) >>> $shift)")
  override protected def withNewChildInternal(c: Expression): WrapMulShift =
    copy(c)
}

/** Unicode NFC normalization (canonical composition): visually
  * identical strings — 'é' vs 'e' + U+0301 combining acute — compare,
  * hash, group, and dedup equal after it. The step a multilingual
  * corpus needs BEFORE any hash-keyed dedup; semantics match DuckDB's
  * nfc_normalize (both implement Unicode canonical composition), so
  * oracles can replay it. Codegen'd static call; the already-normalized
  * fast path (all ASCII included) returns the input buffer untouched. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(t: Any): Any =
    TextEval.nfc(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextEval.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}

/** MinHash signature over word shingles: numHashes permutation minima of
  * shingle hashes, h_i(x) = mix64(x ^ seed_i). Returns array<long>;
  * identical shingle sets => identical signatures, Jaccard-similar sets
  * agree on ~J fraction of slots (standard MinHash estimator). */
case class MinHashSignature(child: Expression, shingle: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(shingle >= 1 && numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(t: Any): Any =
    TextEval.minhash(t.asInstanceOf[UTF8String], shingle, numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEval.minhash($c, $shingle, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(c)
}

/** All word-n-gram hashes of a text, one per gram position (duplicates
  * kept). One pass, no intermediate token/gram strings — feeds the
  * decontamination explode+join without materializing grams. Gram hashes
  * depend only on token CONTENT (tokens hashed individually), so any
  * whitespace layout yields the same hashes as a split-based oracle. */
case class TokenNgramHashes(child: Expression, ngram: Int, seed: Long)
    extends UnaryExpression {
  require(ngram >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ngram_hashes"
  override protected def nullSafeEval(t: Any): Any =
    TextEval.ngramHashes(t.asInstanceOf[UTF8String], ngram, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEval.ngramHashes($c, $ngram, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): TokenNgramHashes = copy(c)
}

/** Exact word-n-gram Jaccard similarity between two texts (the verify
  * stage after LSH candidate generation). Empty-vs-empty gram sets
  * compare as 0.0 (no shared content — matches a division-free SQL
  * oracle that drops 0/0 pairs). */
case class NgramJaccard(left: Expression, right: Expression, ngram: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextEval.jaccard(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], ngram)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.TextEval.jaccard($l, $r, $ngram)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NgramJaccard =
    copy(left = l, right = r)
}

/** Rolling-hash document fingerprint: hash of the full normalized
  * (whitespace-collapsed) token stream. Equal token streams => equal
  * fingerprints regardless of whitespace layout. */
case class DocFingerprint(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(t: Any): Any =
    TextEval.fingerprint(t.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextEval.fingerprint($c, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): DocFingerprint = copy(c)
}

/** Element-wise vector sum aggregate over a numeric-array column (float
  * or double elements, accumulated in double). The reduction primitive
  * for centroid computation (k-means / IVF refinement): groupBy(cell)
  * .agg(vector_sum(vec), count(*)) gives the mean vector with native
  * map-side partials and no per-element explode. Null rows are skipped;
  * mismatched lengths raise. Empty groups evaluate to null. */
case class VectorSumAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Double]] {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum requires array<float> or array<double>, got $other")
    }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = null

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return b
    val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = ad.numElements()
    val acc = if (b == null) new Array[Double](n) else b
    require(acc.length == n,
      s"vector_sum: mismatched vector lengths ${acc.length} vs $n")
    var i = 0
    while (i < n) {
      // getFloat/getDouble on a null slot silently reads 0.0 — reject
      // instead of corrupting the sum (null ROWS are skipped above, but
      // a null ELEMENT inside a vector has no meaningful sum)
      require(!ad.isNullAt(i), s"vector_sum: null element at index $i")
      acc(i) += (if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i))
      i += 1
    }
    acc
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    if (o == null) return b
    if (b == null) return o
    require(b.length == o.length,
      s"vector_sum: mismatched vector lengths ${b.length} vs ${o.length}")
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any =
    if (b == null) null
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b)

  // a leading marker byte distinguishes the null "no input seen" buffer
  // from a genuine zero-length vector sum
  override def serialize(b: Array[Double]): Array[Byte] = {
    if (b == null) return Array.empty
    val bytes = java.nio.ByteBuffer.allocate(1 + b.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bytes.put(1.toByte)
    bytes.asDoubleBuffer().put(b)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val vals = new Array[Double]((bytes.length - 1) / 8)
    java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asDoubleBuffer().get(vals)
    vals
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): VectorSumAgg = copy(child = cs(0))
}

/** Sum of upper-triangle outer products of the QUANTIZED vector —
  * acc[k(i,j)] += round(x_i·scale)·round(x_j·scale) for i <= j, one
  * d(d+1)/2 buffer per partition (partial-merge aggregate). This is
  * the covariance-moments hot path: the equivalent Catalyst
  * formulation (flatten(transform(sequence, i => transform(sequence,
  * j => ...)))) evaluates interpreted lambdas and materializes a
  * d(d+1)/2 array PER ROW — measured ~250µs/row at d=64 vs ~5µs here.
  * Quantization replicates Spark's Round(HALF_UP) on doubles
  * bit-for-bit (java.math.BigDecimal.valueOf — the exact code Round's
  * codegen emits), so the output is indistinguishable from the old
  * formula; VectorOuterSumSpec pins equality on adversarial values.
  * Output is array<double> of the products' sums, in (i, j>=i)
  * row-major order — the old formula's order. */
case class VectorOuterSumAgg(child: Expression, scale: Double, dim: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Double]] {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_outer_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_outer_sum requires array<float> or array<double>, got $other")
    }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Spark Round(d, 0, HALF_UP) for DoubleType, exactly as its codegen
  // emits it — NOT floor(v+0.5), which disagrees on doubles whose
  // decimal rendering sits just below a half
  @inline private def roundQ(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  override def createAggregationBuffer(): Array[Double] = null

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return b
    val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // the old Catalyst formula truncated LONGER vectors to dim (its
    // product indices were literals 0..dim-1) and threw on SHORTER
    // ones (element_at past the end nulled a product and vector_sum
    // rejected the null) — keep both behaviors
    require(ad.numElements() >= dim,
      s"vector_outer_sum: vector of ${ad.numElements()} elements, need $dim")
    val acc = if (b == null) new Array[Double](dim * (dim + 1) / 2) else b
    val q = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      require(!ad.isNullAt(i), s"vector_outer_sum: null element at index $i")
      val x = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      q(i) = roundQ(x * scale)
      i += 1
    }
    var k = 0
    i = 0
    while (i < dim) {
      val qi = q(i)
      var j = i
      while (j < dim) { acc(k) += qi * q(j); k += 1; j += 1 }
      i += 1
    }
    acc
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    if (o == null) return b
    if (b == null) return o
    require(b.length == o.length,
      s"vector_outer_sum: mismatched buffer lengths ${b.length} vs ${o.length}")
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any =
    if (b == null) null
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b)

  // same marker-byte serde as vector_sum: empty = "no input seen"
  override def serialize(b: Array[Double]): Array[Byte] = {
    if (b == null) return Array.empty
    val bytes = java.nio.ByteBuffer.allocate(1 + b.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bytes.put(1.toByte)
    bytes.asDoubleBuffer().put(b)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val vals = new Array[Double]((bytes.length - 1) / 8)
    java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asDoubleBuffer().get(vals)
    vals
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorOuterSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorOuterSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): VectorOuterSumAgg = copy(child = cs(0))
}

/** Cosine similarity between two numeric arrays (float or double),
  * accumulated in double, sequential order. 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextEval.cosine(leftFloat, rightFloat,
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.TextEval.cosine($leftFloat, $rightFloat, $l, $r)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Plain dot product over float/double arrays (left-to-right double
  * accumulation) — the scoring primitive for the PQ codebook training /
  * lookup-table path, codegen'd like [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextEval.dot(leftFloat, rightFloat,
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.TextEval.dot($leftFloat, $rightFloat, $l, $r)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Product-quantization code assignment: for each of the codebook's
  * subspaces, the index of the sub-centroid minimizing reconstruction
  * L2 -> array<long> of m codes. The codebook rides along as a
  * reference object, so the expression tree (and the generated code)
  * stays a single call regardless of m x ksub. */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val halfSq: Array[Array[Double]] =
    cb.map(_.map(c => c.map(x => x * x).sum / 2))

  override protected def nullSafeEval(v: Any): Any =
    TextEval.pqEncode(isFloat, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cb, halfSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    val hsRef = ctx.addReferenceObj("pqhs", halfSq, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEval.pqEncode($isFloat, $c, $cbRef, $hsRef)")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** Product-quantization query lookup table: dot products of the query's
  * sub-vectors against every sub-centroid -> array(m) of array(ksub). */
case class PqLut(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(v: Any): Any =
    TextEval.pqLut(isFloat, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEval.pqLut($isFloat, $c, $cbRef)")
  }

  override protected def withNewChildInternal(c: Expression): PqLut = copy(child = c)
}

/** Integer-quantized dot product: sum of round(x*scale)*round(y*scale)
  * accumulated in double. Products of quantized values are exact
  * integers (< 2^53), so the sum is order-independent and bit-exact
  * across engines — the ranking primitive for oracle-checkable ANN.
  * Rounding is HALF_UP (ties away from zero), matching both Spark's and
  * DuckDB's round(). */
case class QuantizedDot(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {
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

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextEval.quantizedDot(leftFloat, rightFloat,
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.TextEval.quantizedDot($leftFloat, $rightFloat, $l, $r, ${scale}D)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

/** Heuristic language ID in ONE pass over the text: lowercase once, count
  * non-overlapping stopword occurrences for every language, argmax with
  * later-index-wins tie-break; zero hits => "unknown".
  *
  * Semantically identical to the greatest()-of-replace()-counts formula
  * (and its SQL oracle) but O(langs * needles) byte scans instead of
  * O(langs * needles) full replace+length string materializations — the
  * replace-based plan was the slowest query in the r1 bench.
  *
  * `langs` is ordered lowest -> highest tie-break priority. */
case class LangId(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val labels: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val needles: Array[Array[Array[Byte]]] =
    langs.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
  private val unknown = UTF8String.fromString("unknown")

  def compute(t: UTF8String): UTF8String = {
    val hay = TextEval.paddedLowerBytes(t)
    var bestScore = 0
    var bestIdx = -1
    var i = 0
    while (i < needles.length) {
      var score = 0
      var j = 0
      while (j < needles(i).length) {
        score += TextEval.countOccurrences(hay, needles(i)(j))
        j += 1
      }
      // >= : later (higher-priority) language wins ties, matching the
      // encoded-greatest formula score*8 + idx
      if (score >= 1 && score >= bestScore) { bestScore = score; bestIdx = i }
      i += 1
    }
    if (bestIdx < 0) unknown else labels(bestIdx)
  }

  override protected def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this, classOf[LangId].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): LangId = copy(c)
}

/** splitmix64 avalanche of a BIGINT ([[TextHashing.mix64]]) as a
  * column: the engine's REPLAYABLE scalar hash. Used where a
  * deterministic hash order must be reproducible by an independent
  * engine (e.g. the IVF centroid sample) — Spark's builtin `hash()` is
  * Murmur3 over internal row bytes, which an oracle can't replay
  * cheaply; this one is three shift-xor-multiply stages a SQL engine
  * replays in exact mod-2⁶⁴ arithmetic. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mix64 requires a BIGINT child, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(t: Any): Any =
    TextHashing.mix64(t.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.mix64($c)")
  override protected def withNewChildInternal(c: Expression): Mix64 = copy(c)
}

/** Sign-random-projection LSH bits for cosine ANN: bit j = sign of
  * <round(v·2²⁰), r_j> where r_j components are deterministic ±1 from
  * mix64(seed, j, dim). Vectors with high cosine similarity agree on
  * most bits. The projection is an exact integer sum over quantized
  * components (GeomEval.SrpQuantScale), so the bits are deterministic
  * REGARDLESS of accumulation order — an independent engine replays
  * them bit-for-bit (the ann_srp_topk DuckDB oracle does). */
case class SrpBits(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64)
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bits"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    TextEval.srpBits(isFloat,
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEval.srpBits($isFloat, $c, $bits, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): SrpBits = copy(c)
}
