package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * language ID (stopword heuristic), quality scoring. Built from
 * codegen'd built-in expressions only (no UDFs), so they inline into
 * whole-stage codegen and push down through Catalyst.
 *
 * Where an operator is used in a driver query, the identical arithmetic
 * is expressed in the DuckDB oracle (integer counts — exact compare).
 */
object TextAnalysis {

  /** Number of whitespace-delimited tokens. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /**
   * Split each document into overlapping token-window chunks — the
   * pretraining/RAG prep step that turns long documents into
   * model-window-sized pieces. Chunk i covers tokens
   * [i*(chunkTokens-overlap), …+chunkTokens); the final chunk may be
   * short; a document with <= chunkTokens tokens yields exactly one
   * chunk. Zero-token documents disappear.
   *
   * Pure narrow plan: tokenization + a bounded per-row transform +
   * posexplode — no shuffle at all; the 1→N blowup is bounded by
   * n/(chunkTokens-overlap)+1 rows per doc. Returns
   * (idCol, chunk_idx, chunk_text).
   */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens >= 1 and 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    df.withColumn("__toks", regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
      .withColumn("__n", size(col("__toks")))
      .where(col("__n") > 0)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L),
          greatest(ceil((col("__n") - lit(chunkTokens)).cast("double") / stride)
            .cast("long"), lit(0L))),
        i => array_join(
          slice(col("__toks"), (i * stride + 1).cast("int"), lit(chunkTokens)), " "))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"))
  }

  /** BPE-style pre-tokenizer pattern (GPT-2 family): contractions,
    * letter runs, digit runs, punctuation runs, whitespace runs — kept
    * RE2-compatible (no lookahead) so the same pattern runs in the
    * DuckDB oracle. */
  val bpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Number of BPE-ish pre-tokens — the token-budget estimator a
    * training-data pipeline uses before real BPE. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Occurrences of `needle` in `text` (non-overlapping, left-to-right) —
    * pure length arithmetic so it is expressible in any SQL oracle. */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / needle.length).cast("int")

  /** Per-language stopword hit counts. Padded with spaces so only whole
    * words count. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " die ", " und ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "es" -> Seq(" el ", " los ", " que ", " es ")
  )

  private def langScore(text: Column, lang: String): Column =
    langStopwords(lang).map(w => occurrences(text, w)).reduce(_ + _)

  /** Heuristic language ID: argmax of stopword hits over a padded,
    * lowercased copy; ties broken by fixed order en>de>fr>es; zero hits
    * => "unknown".
    *
    * One custom expression scanning the text once (lowercase once, count
    * all needles) — the pure-builtin formulation repeated a full
    * replace()+length() pass per stopword and was the slowest r1 bench
    * query. The SQL-oracle arithmetic is unchanged. */
  def langId(text: Column): Column = {
    val langs = Seq("es", "fr", "de", "en") // index = tie-break priority
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.LangId(
        org.apache.spark.sql.graftbridge.Bridge.expression(text),
        langs.map(l => l -> langStopwords(l))))
  }

  /** Quality features: token count, char count, punctuation count, mean
    * token length x100 (integer), stopword hits; quality flag = enough
    * tokens, sane mean token length, at least one stopword, not
    * punctuation-drowned. All-integer arithmetic (engine-portable). */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokenCount(text)
    val chars = length(text)
    val stop = langScore(concat(lit(" "), lower(text), lit(" ")), "en")
    // count of . , ! ? ; : — plain length/replace arithmetic so any SQL
    // oracle computes the identical number (no regex class divergence)
    val punct = Seq(".", ",", "!", "?", ";", ":")
      .map(c => occurrences(text, c)).reduce(_ + _)
    val meanTokLenX100 = when(toks > 0, floor((chars * 100) / toks)).otherwise(lit(0)).cast("long")
    // punct_x1000: punctuation per 1000 chars (integer ratio)
    val punctX1000 = when(chars > 0, floor((punct * 1000) / chars)).otherwise(lit(0)).cast("long")
    val flag = (toks >= 5) && (meanTokLenX100 >= 200) && (meanTokLenX100 <= 2000) &&
      (stop >= 1) && (punctX1000 <= 300)
    Seq("tokens" -> toks, "chars" -> chars, "stop_hits" -> stop, "punct" -> punct,
      "mean_tok_len_x100" -> meanTokLenX100, "punct_x1000" -> punctX1000,
      "quality_ok" -> flag.cast("int"))
  }

  /** Repetition signals (the Gopher/C4-style within-document dedup
    * features): token count, distinct-token count, duplicate-token
    * count, distinct-bigram count, and the top single token's frequency.
    * All integers — engine-portable for exact oracle compare.
    *
    * Everything is array arithmetic inside one projection (no shuffle,
    * no explode). `top_tok` is O(distinct·tokens) per row — fine for
    * document-sized text; for book-length inputs explode + count
    * instead. */
  def repetitionColumns(text: Column): Seq[(String, Column)] = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    val nDistinct = size(array_distinct(toks))
    val bigrams = when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val topTok = when(n > 0,
      array_max(transform(array_distinct(toks),
        u => size(filter(toks, x => x === u))))).otherwise(lit(0))
    Seq("n_tokens" -> n, "n_distinct" -> nDistinct,
      "dup_tokens" -> (n - nDistinct),
      "distinct_bigrams" -> size(array_distinct(bigrams)),
      "top_tok" -> topTok)
  }

  /** Per-(doc, term) frequency table: (id, term, tf). Whitespace
    * tokens (the `\S+` convention shared by every oracle here). One
    * explode + one keyed aggregation; the downstream df/idf frames are
    * aggregations OF this frame, so the corpus is scanned once. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Shared tf→df→N scaffolding: the tf frame is PERSISTED because both
    * the result and its df aggregation consume it — without the cache
    * Catalyst re-derives tf from scratch and the corpus is exploded,
    * hashed, and shuffled TWICE (verified in the formatted plan). df
    * comes from a groupBy (partial aggregation, skew-safe — a window
    * `count over (partition by term)` would put every "the" row in one
    * task) and joins back broadcast-sized. */
  private def tfDfScaffold(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, () => Unit) = {
    val tf = termFrequencies(docs, idCol, textCol).persist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val ndocs = docs.agg(count_distinct(col(idCol)).as("__nd"))
    val joined = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(ndocs))
    (joined, () => { tf.unpersist(false); () })
  }

  /**
   * TF-IDF scores: (id, term, tf, df, tfidf) with the sklearn-style
   * smooth idf = ln((N+1)/(df+1)) + 1. One corpus scan: tf (one shuffle
   * on (id, term), cached) → df (aggregation of the TF FRAME on term)
   * → broadcast join back → the N-row count rides in as a 1-row cross
   * join, never a collected literal. The release handle unpersists the
   * tf cache once the result is consumed.
   */
  def tfidfWithRelease(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, () => Unit) = {
    val (joined, release) = tfDfScaffold(docs, idCol, textCol)
    (joined
      .withColumn("tfidf", col("tf") *
        (log((col("__nd") + 1).cast("double") / (col("df") + 1)) + 1))
      .select(col("id"), col("term"), col("tf"), col("df"), col("tfidf")),
      release)
  }

  /** [[tfidfWithRelease]] without the unpersist handle — the tf cache
    * stays pinned until `spark.catalog.clearCache()`. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tfidfWithRelease(docs, idCol, textCol)._1

  /**
   * Top `top` terms per document by a QUANTIZED tf-idf:
   * score = tf * floor(1e6 * N / df) — pure integer-valued arithmetic
   * (double division of exact integers, then floor), so ranking and
   * score are bit-identical across engines, unlike the ln() variant
   * whose last-ulp differences could flip near-ties. Ties break on the
   * term string. Same plan shape as [[tfidf]] plus the per-doc top-k
   * window (WindowGroupLimit keeps it map-side partial).
   */
  def tfidfTopTermsWithRelease(docs: DataFrame, idCol: String, textCol: String,
                               top: Int): (DataFrame, () => Unit) = {
    require(top >= 1, "top must be >= 1")
    val (joined, release) = tfDfScaffold(docs, idCol, textCol)
    val scored = joined.withColumn("score",
      col("tf") * floor(lit(1000000.0) * col("__nd") / col("df")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("term").asc)
    (scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= top)
      .select(col("id"), col("term"), col("tf"), col("df"), col("score")),
      release)
  }

  /** [[tfidfTopTermsWithRelease]] without the unpersist handle. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    top: Int): DataFrame =
    tfidfTopTermsWithRelease(docs, idCol, textCol, top)._1
}
