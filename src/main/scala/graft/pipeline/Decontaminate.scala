package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Train/eval decontamination: remove training documents that share any
 * token n-gram with a held-out evaluation set — the standard guard
 * against benchmark leakage into a training corpus.
 *
 * Plan shape at scale: both sides explode to (id, gram) — a bounded
 * ~tokens-per-doc blowup — the eval grams are distinct'd (eval sets are
 * small: AQE broadcasts them when they fit), the contaminated-id set
 * comes from one hash join on the gram key, and survivors are an
 * anti-join on the id. Nothing is ever collected to the driver.
 */
object Decontaminate {

  /** All `n`-token grams of whitespace-tokenized `text`, joined with
    * single spaces (so differing whitespace does not defeat matching).
    * Documents shorter than `n` tokens produce no grams. */
  def tokenNgrams(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Training rows whose text shares at least one `n`-gram with any
    * eval row, as a distinct set of `idCol` values (plus the overlap
    * count per id — the contamination evidence). With `hashGrams` the
    * grams never exist as strings at all: one fused expression
    * ([[graft.functions.TokenNgramHashes]]) tokenizes, grams, and hashes
    * in a single pass, and the join/shuffle key is an 8-byte long
    * instead of a ~50-byte string (a 64-bit collision could only
    * over-flag, with probability ~n_grams²/2⁶⁴). */
  def contaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
                      textCol: String, n: Int,
                      hashGrams: Boolean = true): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = {
      val g =
        if (hashGrams) Tx.token_ngram_hashes(col(textCol), n)
        else tokenNgrams(col(textCol), n)
      df.select(cols :+ explode(g).as("__gram"): _*)
    }
    val evalGrams = grams(eval).distinct()
    grams(train, col(idCol))
      .join(evalGrams, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap_grams"))
  }

  /** `train` minus every row contaminated by `eval` (shared `n`-gram). */
  def byNgramOverlap(train: DataFrame, eval: DataFrame, idCol: String,
                     textCol: String, n: Int,
                     hashGrams: Boolean = true): DataFrame =
    train.join(
      contaminatedIds(train, eval, idCol, textCol, n, hashGrams)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /**
   * [[contaminatedIds]] with a Bloom-filter pre-filter on the train
   * grams — IDENTICAL results (a Bloom filter has no false negatives;
   * false positives are removed by the exact join that follows), but the
   * join sees only the ~fpp fraction of train grams that might match.
   *
   * The scale case this serves: an eval gram set too big for a
   * broadcast-hash relation (which needs ~50+ bytes per entry) still
   * fits as a Bloom filter at `bitsPerItem` BITS per entry (16 bits →
   * fpp ≈ 0.0004). Without the filter, a non-broadcastable eval side
   * degrades the join to a full shuffle of EVERY train gram — tokens ×
   * corpus rows; with it, only probable hits shuffle. The filter rides
   * the plan as one reference object per executor (see
   * [[graft.functions.BloomMightContain]]).
   *
   * The eval gram hashes are collected once to build the filter (they
   * are re-parallelized for the exact join, not recomputed) — the same
   * "small collected state" contract as the IVF centroids.
   */
  def contaminatedIdsBloom(train: DataFrame, eval: DataFrame, idCol: String,
                           textCol: String, n: Int,
                           bitsPerItem: Int = 16): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val evalHashes: Array[Long] =
      eval.select(explode(Tx.token_ngram_hashes(col(textCol), n)).as("__gram"))
        .distinct().as[Long].collect()
    val (bits, k) = graft.functions.LongBloom.build(evalHashes, bitsPerItem)
    val mightMatch = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("__gram")),
        new graft.functions.BloomBitsRef(bits), k))
    // no broadcast hint: a small eval set broadcasts on its own (AQE /
    // static estimate of the LocalRelation), and for the LARGE eval
    // sets this path exists for — too big for a hash relation, fine as
    // ~bits-per-key Bloom bits — forcing a broadcast would rebuild
    // exactly the multi-GB relation the filter avoids. Then the right
    // plan is a shuffle join of the ~fpp-sized filtered train side
    // against the re-parallelized eval grams.
    val evalGrams = evalHashes.toSeq.toDF("__gram")
    train
      .select(col(idCol), explode(Tx.token_ngram_hashes(col(textCol), n)).as("__gram"))
      .where(mightMatch)
      .join(evalGrams, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap_grams"))
  }

  /** [[byNgramOverlap]] through the Bloom pre-filter path. */
  def byNgramOverlapBloom(train: DataFrame, eval: DataFrame, idCol: String,
                          textCol: String, n: Int,
                          bitsPerItem: Int = 16): DataFrame =
    train.join(
      contaminatedIdsBloom(train, eval, idCol, textCol, n, bitsPerItem)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
