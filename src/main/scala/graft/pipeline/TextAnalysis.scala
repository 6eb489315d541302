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
    // let-bind toks wherever a lambda captures it: an expression
    // referenced INSIDE a lambda re-evaluates per element, so the
    // unbound forms re-split the text once per index (O(n²) splits)
    val bigrams = bindArray(toks)(ts => when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>")))
    val topTok = when(n > 0,
      bindArray(toks)(ts => array_max(transform(array_distinct(ts),
        u => size(filter(ts, x => x === u)))))).otherwise(lit(0))
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

  /**
   * Line-level document-format signals (the Gopher-style repetition and
   * formatting filters that work on LINES, complementing the token-level
   * [[repetitionColumns]]): line count, duplicate-line count,
   * characters inside duplicate lines, bullet-started lines, and
   * ellipsis-ended lines. Lines are '\n'-split, trimmed, empties
   * dropped. All integers, all inside one narrow projection (array
   * arithmetic, no explode/shuffle) — and every definition is plain
   * split/trim/length arithmetic any SQL oracle reproduces exactly.
   */
  def lineColumns(text: Column): Seq[(String, Column)] = {
    val lines = trimmedLines(text)
    val distinctLines = array_distinct(lines)
    val n = size(lines)
    val totalChars = aggregate(lines, lit(0L), (acc, l) => acc + length(l))
    val distinctChars =
      aggregate(distinctLines, lit(0L), (acc, l) => acc + length(l))
    // ASCII bullets only ("- ", "* ") — unicode bullet glyphs would tie
    // the oracle compare to the engines' unicode handling for no proof
    // value
    val bullets = size(filter(lines,
      l => substring(l, 1, 2) === "- " || substring(l, 1, 2) === "* "))
    // endsWith, not substring(-3): negative-start substring semantics
    // for strings shorter than the needle differ between engines
    val ellipsis = size(filter(lines, l => l.endsWith("...")))
    Seq("n_lines" -> n,
      "dup_lines" -> (n - size(distinctLines)),
      "dup_line_chars" -> (totalChars - distinctChars),
      "bullet_lines" -> bullets,
      "ellipsis_lines" -> ellipsis)
  }

  /** The shared line model: '\n'-split, trimmed, empties dropped. Both
    * the line STATS ([[lineColumns]]) and the line REMOVAL op
    * ([[Scrub.dedupLinesInDoc]]) build on this one definition, so the
    * stats always describe exactly what the removal would do. */
  def trimmedLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Let-binding for expression trees (any element type, not just
    * arrays): evaluate `x` ONCE per row and hand the body an O(1)
    * lambda-variable reference. Required whenever a non-trivial
    * expression is referenced inside a higher-order-function lambda —
    * lambda bodies re-evaluate their captured expressions PER ELEMENT
    * (measured: the unbound CDC formulation was O(len²) and ~18×
    * slower end to end). */
  def bindArray(x: Column)(body: Column => Column): Column =
    element_at(transform(array(x), body), 1)

  /** All overlapping character bigrams of `text` (documents shorter than
    * 2 chars yield none). Bounded 2x-chars blowup when exploded. One
    * O(len) pass ([[graft.functions.CharNgrams]]) — the substr-transform
    * formulation is O(len²) because substr's code-point indexing
    * re-scans the buffer per gram; values are identical, so oracles
    * keep the substr form. */
  def charBigrams(text: Column): Column = charNgramsCol(text, 2)

  /** Corpus character-bigram counts: (gram, cnt). The model is at most
    * |charset|² rows regardless of corpus size — the explode shuffles
    * only the per-partition PARTIAL counts (map-side combine collapses
    * each partition to <= |charset|² rows), so building it on 100 TB
    * moves kilobytes. */
  def charBigramModel(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(charBigrams(col(textCol))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))

  /**
   * Language-model familiarity score per document — the CCNet-style
   * "how much does this doc look like the reference corpus" quality
   * signal, scored against a character-bigram model ([[charBigramModel]]).
   *
   * Integer log arithmetic by construction: each bigram contributes
   * floor(log2(count)) = length(bin(count)) - 1 — an EXACT integer both
   * Spark and any SQL oracle compute identically (no ln() ulp
   * divergence). Unseen grams (possible when the model was trained on a
   * different corpus) count as frequency 1, contributing 0.
   *
   * Returns (id, n_grams, sum_log2, fam_x100) where fam_x100 =
   * floor(100 * sum_log2 / n_grams) — higher = more familiar.
   * Documents with < 2 chars have no grams and are absent.
   *
   * Scale shape: the model is broadcast (bounded |charset|² rows); the
   * scoring pass is one explode + broadcast-join + per-doc aggregation —
   * the corpus itself never shuffles, only (id, gram-count) partial
   * aggregates do.
   */
  def lmFamiliarity(docs: DataFrame, idCol: String, textCol: String,
                    model: DataFrame): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
      explode(charBigrams(col(textCol))).as("gram"))
    grams.join(broadcast(model), Seq("gram"), "left")
      .select(col("id"),
        (length(bin(coalesce(col("cnt"), lit(1L)))) - 1).cast("long").as("__l2"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__l2")).as("sum_log2"))
      .withColumn("fam_x100",
        floor(col("sum_log2") * 100 / col("n_grams")).cast("long"))
  }

  /** [[lmFamiliarity]] self-trained on the scored corpus itself (two
    * narrow scans of the corpus — cheaper than caching the exploded
    * char-level gram frame, which is ~2x the corpus). */
  def lmFamiliaritySelf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    lmFamiliarity(docs, idCol, textCol, charBigramModel(docs, textCol))

  /** Hashed-unigram bucket distribution of a corpus: each whitespace
    * token lands in `buckets` (power of two) via its 64-bit rolling-hash
    * fingerprint; returns (bucket, cnt) with at most `buckets` rows.
    * Map-side combine collapses every partition to <= `buckets` partial
    * rows, so building this on 100 TB moves kilobytes. */
  def hashedBucketCounts(docs: DataFrame, textCol: String,
                         buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two (bucket = hash bit mask)")
    docs.select(explode(
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("__tok"))
      .select(Tx.doc_fingerprint(col("__tok"))
        .bitwiseAND(lit((buckets - 1).toLong)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /**
   * DSIR-style importance model (Data Selection via Importance
   * Resampling): per hash bucket, the integer log-ratio of the TARGET
   * distribution (the small corpus you want more of) to the RAW
   * distribution — s(b) = log2f(cnt_target(b)+1) − log2f(cnt_raw(b)+1),
   * with log2f the exact integer floor-log2 (length(bin(x)) − 1; the
   * +1 smooths empty buckets, and integer logs are bit-identical in any
   * engine — no ln() ulps). At most `buckets` rows: two corpus-count
   * passes, then a `buckets`-row join. Swap in real estimated
   * distributions by constructing the (bucket, s) frame yourself.
   */
  def importanceModel(raw: DataFrame, target: DataFrame, textCol: String,
                      buckets: Int = 64): DataFrame = {
    val log2f: Column => Column =
      c => (length(bin(c + 1)) - 1).cast("long")
    hashedBucketCounts(raw, textCol, buckets)
      .withColumnRenamed("cnt", "__rc")
      .join(hashedBucketCounts(target, textCol, buckets)
        .withColumnRenamed("cnt", "__tc"), Seq("bucket"), "full")
      .select(col("bucket"),
        (log2f(coalesce(col("__tc"), lit(0L)))
          - log2f(coalesce(col("__rc"), lit(0L)))).as("s"))
  }

  /**
   * Per-document DSIR importance log-weight: the sum of the model score
   * of every token occurrence — logweight = Σ_b count(doc, b) · s(b),
   * higher = more target-like. Returns (id, n_tokens, logweight);
   * documents with zero tokens are absent (no evidence either way).
   *
   * Scale shape mirrors [[lmFamiliarity]]: the model is a broadcast of
   * <= `buckets` rows, the corpus does one narrow explode into a
   * per-doc aggregation — the corpus itself never shuffles, only
   * (id, partial-sum) rows do. Buckets absent from the model (possible
   * with a hand-built model frame) score 0.
   */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        model: DataFrame, buckets: Int = 64): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two (bucket = hash bit mask)")
    docs.select(col(idCol).as("id"), explode(
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("__tok"))
      .select(col("id"), Tx.doc_fingerprint(col("__tok"))
        .bitwiseAND(lit((buckets - 1).toLong)).as("bucket"))
      .join(broadcast(model), Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("s"), lit(0L))).as("logweight"))
  }

  /**
   * DSIR importance resampling end-to-end: score the raw corpus against
   * the target distribution, then keep the most target-like
   * `keepFraction` — the documents at or above the exact distributed
   * (1 − keepFraction)-quantile of logweight ([[Sketches.exactQuantiles]],
   * no single-task window; >= on the discrete threshold means ties keep
   * slightly more than the fraction, never less). The deterministic,
   * shuffle-light stand-in for sampling-with-replacement: at 100 TB a
   * top-quantile cut is one threshold broadcast, and the weights are
   * already available for a downstream weighted sampler.
   */
  def importanceResample(raw: DataFrame, target: DataFrame, idCol: String,
                         textCol: String, buckets: Int = 64,
                         keepFraction: Double = 0.5): DataFrame = {
    require(keepFraction > 0.0 && keepFraction < 1.0,
      "keepFraction must be in (0, 1)")
    // lazy localCheckpoint: the weights frame is consumed TWICE (the
    // quantile's rank pass and the final filter) and each evaluation
    // re-runs the whole tokenize+model pipeline — including the model's
    // two corpus-count passes — so without the pin the corpus is
    // tokenized ~6x instead of 3x. One (id, n_tokens, logweight) row
    // per doc: bounded blocks, GC-reclaimed (the candidate-set
    // convention in Dedup).
    val w = importanceWeights(raw, idCol, textCol,
      importanceModel(raw, target, textCol, buckets), buckets)
      .localCheckpoint(false)
    val thr = graft.pipeline.Sketches
      .exactQuantiles(w, col("logweight"), Seq(1.0 - keepFraction))
      .select(col("quantile").as("__thr"))
    w.crossJoin(broadcast(thr))
      .where(col("logweight") >= col("__thr"))
      .select(col("id"), col("n_tokens"), col("logweight"))
  }

  /**
   * Inverted index: term -> (document frequency, postings list sorted by
   * doc id, each entry (id, tf)). The `minDf`/`maxDf` band is applied to
   * the df AGGREGATE BEFORE any posting list is materialized — the
   * stopword rows ("the" in every document: a posting list the size of
   * the corpus, and the classic collect_list OOM + skew key) are
   * discarded as counts, never built as lists. At scale maxDf is the
   * memory contract: the largest surviving posting list is maxDf
   * entries.
   *
   * Plan: tf (one shuffle, persisted — consumed by both the df
   * aggregate and the postings aggregate) → df band filter → join back
   * (the df side is the post-filter term set; broadcast when small) →
   * per-term collect. The release handle unpersists the tf cache.
   */
  def invertedIndexWithRelease(docs: DataFrame, idCol: String, textCol: String,
                               minDf: Long = 1L, maxDf: Long = Long.MaxValue)
      : (DataFrame, () => Unit) = {
    require(minDf >= 1L && maxDf >= minDf, "need 1 <= minDf <= maxDf")
    val tf = termFrequencies(docs, idCol, textCol).persist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf && col("df") <= maxDf)
    val out = tf.join(dfreq, Seq("term"))
      .groupBy(col("term"))
      .agg(min(col("df")).as("df"),
        array_sort(collect_list(struct(col("id"), col("tf")))).as("postings"))
    (out, () => { tf.unpersist(false); () })
  }

  /** [[invertedIndexWithRelease]] without the unpersist handle. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame =
    invertedIndexWithRelease(docs, idCol, textCol, minDf, maxDf)._1

  /**
   * Hashed-feature linear text-classifier score — the fastText-style
   * "quality model" shape used to rank corpora for curation: each
   * whitespace token hashes into one of `weights.length` buckets
   * (power of two, so the bucket is a bit mask of the hash) via the
   * 64-bit rolling-hash fingerprint ([[Tx.doc_fingerprint]] of the
   * single token), and the document score is the sum of its tokens'
   * bucket weights.
   *
   * Integer weights => integer score: bit-exact across engines that can
   * compute the fingerprint (the DuckDB oracle reimplements it in
   * HUGEINT arithmetic). At scale this is ONE narrow fused projection
   * per document — the model rides as a literal array; no join, no
   * shuffle, nothing driver-side. Swapping in real trained weights
   * changes the array literal only.
   */
  def hashedLinearScore(text: Column, weights: Seq[Long]): Column = {
    require(weights.nonEmpty && (weights.length & (weights.length - 1)) == 0,
      "weights length must be a power of two (bucket = hash bit mask)")
    val d = weights.length
    val wLit = array(weights.map(lit): _*)
    aggregate(regexp_extract_all(text, lit("\\S+"), lit(0)), lit(0L),
      (acc, t) => acc + element_at(wLit,
        Tx.doc_fingerprint(t).bitwiseAND(lit((d - 1).toLong)).cast("int") + 1))
  }

  /** Deterministic 64-bucket demo weight vector for the linear scorer
    * (stands in for trained weights; the oracle embeds the same
    * literals). */
  val demoQualityWeights: Seq[Long] =
    (0 until 64).map(i => ((i * 37 + 11) % 21) - 10L)

  /** All overlapping `n`-code-point grams (the [[charBigrams]]
    * machinery at any width). */
  def charNgramsCol(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.CharNgrams(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), n))

  /**
   * Content-defined chunking (CDC): split `text` AFTER every position
   * whose trailing `window`-char rolling hash has its low `maskBits`
   * bits zero (expected chunk length 2^maskBits chars). The boundary
   * test depends only on a fixed-width window, so boundaries
   * RE-SYNCHRONIZE after an insertion or deletion — the property that
   * makes chunk-level dedup robust to edits, where fixed-size chunking
   * loses every chunk after the first edit. The storage/dedup-systems
   * primitive (LBFS/FastCDC lineage), here as a narrow per-row
   * projection: gram array (one [[graft.functions.CharNgrams]] pass) →
   * boundary filter ([[graft.functions.CharRollHash]], integer
   * arithmetic any SQL oracle replays) → a sequential min-gap fold
   * (`minChunk`, the FastCDC-style floor: without it adjacent boundary
   * hits produce degenerate few-char chunks whose values collide all
   * over the corpus) → substring slicing. The final chunk may be
   * shorter than `minChunk`; texts shorter than `window` form one
   * chunk. Expected chunk length ≈ minChunk + 2^maskBits.
   *
   * Returns array<string> of chunks; concat(chunks) == text.
   */
  def cdcChunks(text: Column, window: Int = 8, maskBits: Int = 5,
                minChunk: Int = 16, seed: Long = 42L): Column = {
    require(window >= 1 && maskBits >= 1 && maskBits < 63 && minChunk >= 1,
      "need window >= 1, 1 <= maskBits < 63, minChunk >= 1")
    val maskLit = lit((1L << maskBits) - 1)
    def rollHash(c: Column): Column =
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.CharRollHash(
          org.apache.spark.sql.graftbridge.Bridge.expression(c), seed))
    // see bindArray: every intermediate referenced inside a downstream
    // lambda must be let-bound or it re-evaluates per element — the
    // unbound formulation re-built the full gram array per position
    // (O(len²); measured minutes instead of seconds at sf0.01)
    def bind(x: Column)(body: Column => Column): Column = bindArray(x)(body)
    // the OUTER bind is the caller-supplied text itself: the slicing
    // lambda below references it per chunk, and a computed argument
    // (e.g. lower(col)) would otherwise re-evaluate per chunk
    bind(text) { t =>
      val rolled = transform(charNgramsCol(t, window), g => rollHash(g))
      bind(rolled) { hs =>
        val n = size(hs) // = len - window + 1 when len >= window, else 0
        // cut positions (1-based, cut AFTER the position): gram j ends
        // at j + window - 1. sequence(1, 0) would be DESCENDING — guard.
        val cands = filter(
          transform(sequence(lit(1), greatest(n, lit(1))),
            j => when(element_at(hs, j).bitwiseAND(maskLit) === 0L,
              j + lit(window - 1)).otherwise(lit(0))),
          p => p > 0)
        // sequential min-gap fold: keep a candidate cut only when it is
        // >= minChunk past the last KEPT cut (seeded with 0 = text
        // start, dropped after the fold)
        val ends0 = bind(when(n < 1, array().cast("array<int>"))
            .otherwise(cands)) { cs =>
          val kept = aggregate(cs, array(lit(0)),
            (acc, p) => when(p - element_at(acc, size(acc)) >= minChunk,
              concat(acc, array(p))).otherwise(acc))
          slice(kept, lit(2), greatest(size(kept) - 1, lit(0)))
        }
        bind(ends0) { es =>
          val len = length(t)
          bind(when(size(es) > 0 && element_at(es, size(es)) === len, es)
              .otherwise(concat(es, array(len)))) { ef =>
            transform(sequence(lit(1), size(ef)), i => {
              val prev = when(i === 1, lit(0)).otherwise(element_at(ef, i - 1))
              t.substr((prev + 1).cast("int"),
                (element_at(ef, i) - prev).cast("int"))
            })
          }
        }
      }
    }
  }

  /**
   * Vocabulary coverage curve — the tokenizer-sizing question "what
   * fraction of all token occurrences do the top-v terms cover?", one
   * row (v, covered, ppm) per requested v.
   *
   * The term rank comes from [[graft.tools.Ranks.globalRowNumberWithRelease]]
   * (a web-scale vocabulary outgrows the single-task `row_number()
   * over (order by cnt)` window), the per-v coverages are conditional
   * sums in ONE aggregate pass over the ranked counts, and the result
   * reshapes via a literal struct array — |vs| rows total,
   * localCheckpoint-pinned so the rank cache releases eagerly. ppm =
   * floor(1e6 * covered / total).
   */
  /**
   * Top-k collocations (adjacent token pairs) by an integer-staged PMI
   * score — the merge-candidate selection shape of tokenizer/phrase
   * construction (BPE picks argmax pair frequency; wordpiece/phrase
   * mining picks association strength — this emits both signals).
   *
   * PMI = log p(ab)/(p(a)p(b)) is monotone in (c_ab·N²)/(M·c_a·c_b),
   * so ranking needs no log. The score is computed in STAGED integer
   * division — ((c_ab·N) div c_a)·N·100 div (c_b·M) — every
   * intermediate bounded by N²·100 (fits a Long to ~300G tokens per
   * partition-count scale-out) and bit-replayable by any engine with
   * integer division; ties resolve on the pair strings.
   *
   * Plan: one corpus scan explodes bigrams (narrow), one for unigrams;
   * counts aggregate map-side; the two count joins key on the word
   * (hash joins, broadcast when the vocabulary is small); the two
   * 1-row totals ride broadcast crossJoins. Top-k is a single ordered
   * limit (Spark's TakeOrderedAndProject — no full sort at scale).
   */
  def collocationTopK(docs: DataFrame, textCol: String, k: Int = 20)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = split(trim(col(textCol)), "\\s+")
    val toks = docs.select(w.as("__w")).where(size(col("__w")) >= 1)
    val uni = toks.select(explode(col("__w")).as("__tok"))
    val ucnt = uni.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val n = uni.agg(count(lit(1)).as("__n"))
    val big = toks.where(size(col("__w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__w")) - 1),
        i => struct(element_at(col("__w"), i).as("w1"),
          element_at(col("__w"), i + 1).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val bcnt = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__cab"))
    val m = big.agg(count(lit(1)).as("__m"))
    bcnt
      .join(ucnt.select(col("__tok").as("w1"), col("__c").as("__ca")), Seq("w1"))
      .join(ucnt.select(col("__tok").as("w2"), col("__c").as("__cb")), Seq("w2"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(m))
      .select(col("w1"), col("w2"),
        expr("(((__cab * __n) div __ca) * __n * 100) div (__cb * __m)")
          .as("score"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /**
   * Distributed BPE merge training — learn the first `merges` merge
   * rules over the corpus, the core of tokenizer construction.
   *
   * Classic BPE (Sennrich et al. 2016, arXiv:1508.07909): start from
   * character sequences, repeatedly (1) count adjacent symbol pairs,
   * (2) pick the globally most frequent pair, (3) merge its
   * left-to-right non-overlapping occurrences everywhere; the merged
   * symbol participates in later rounds.
   *
   * Scale shape: the corpus collapses ONCE to a (word-type, count)
   * histogram — the only corpus-sized shuffle; every round then runs
   * on the type table (orders of magnitude smaller: English web text
   * has ~10⁷ types per 10¹⁰ tokens), as one pair-count aggregate plus
   * a narrow merge projection. Driver traffic per round is exactly one
   * row (the winning pair). The type table is localCheckpoint'd per
   * round (iterative-DataFrame discipline: persist alone never
   * truncates the compounding plan).
   *
   * Symbol sequences are space-joined (symbols are drawn from
   * whitespace-split words, so they can never contain the separator).
   * A merge is a string replace over the SEPARATOR-DOUBLED form
   * `' s1  s2  s3 '` — every symbol its own ` sym ` block, so a pair
   * match consumes exactly two whole blocks and consecutive matches
   * never share a character. `replace`'s left-to-right non-overlapping
   * scan over blocks is then EXACTLY greedy BPE merging, including
   * same-symbol runs (`a a a a a` → `aa aa a`; naive single-space
   * padding would miss every other run merge because adjacent matches
   * share the separator). Both engines' `replace` agree, so an oracle
   * replays training verbatim. Ties on pair frequency break
   * lexicographically (deterministic across engines and cluster
   * sizes).
   *
   * Returns one row per learned rule: (merge_rank 1..merges, lhs, rhs,
   * freq at selection time). Stops early if no pair remains.
   */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // merge_rank/lhs/rhs, not rank/left/right: all three collide with
    // SQL function names in common oracle dialects
    bpeCore(docs, textCol, merges)._1
      .toDF("merge_rank", "lhs", "rhs", "freq")
  }

  /**
   * BPE ENCODE over the corpus with rules learned by [[bpeTrain]]'s
   * loop: per document, the word count and the total symbol count
   * after all merges apply — the tokenizer-side sizing statistic
   * (tokens-per-doc under the learned vocab).
   *
   * Scale shape: the merge chain is applied ONCE per word TYPE (it
   * already happened during training — the final type table maps every
   * word to its merged sequence); encoding is then a single keyed join
   * of exploded doc words against the type table plus a per-doc
   * aggregate. No per-occurrence merge evaluation anywhere.
   */
  def bpeEncodeCounts(docs: DataFrame, idCol: String, textCol: String,
                      merges: Int): DataFrame = {
    val vocab = bpeCore(docs, textCol, merges)._2
    val words = docs.select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
    val wsyms = vocab.select(replace(col("seq"), lit(" "), lit("")).as("word"),
      size(split(col("seq"), " ")).as("__ns"))
    words.join(wsyms, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__ns")).cast("long").as("n_symbols"))
  }

  /** Shared BPE training loop: returns (learned rules, final word-type
    * table with merged `seq` and type count `cnt`). */
  private def bpeCore(docs: DataFrame, textCol: String, merges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(merges >= 1, "merges must be >= 1")
    import org.apache.spark.sql.Row
    // word-type histogram; seq = space-joined character symbols
    val chars = {
      val w = col("word")
      array_join(transform(sequence(lit(1), length(w)),
        i => substring(w, i, lit(1))), " ")
    }
    var vocab = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(chars.as("seq"), col("cnt"))
      .localCheckpoint(false)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val syms = split(col("seq"), " ")
      val top = vocab.where(size(syms) >= 2)
        .select(explode(transform(sequence(lit(1), size(syms) - 1),
          i => concat(element_at(syms, i), lit(" "),
            element_at(syms, i + 1)))).as("pair"), col("cnt"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Row(pair: String, freq: Long) = top(0)
        val Array(l, r) = pair.split(" ", 2)
        learned += ((rank, l, r, freq))
        val doubled = concat(lit(" "),
          replace(col("seq"), lit(" "), lit("  ")), lit(" "))
        vocab = vocab.select(
          replace(trim(replace(doubled, lit(s" $l  $r "), lit(s" $l$r "))),
            lit("  "), lit(" ")).as("seq"), col("cnt"))
          .localCheckpoint(false)
        rank += 1
      }
    }
    (learned.toSeq, vocab)
  }

  def vocabCoverage(docs: DataFrame, textCol: String, vs: Seq[Int],
                    numPartitions: Int = 32): DataFrame = {
    require(vs.nonEmpty && vs.forall(_ >= 1), "vs must be positive")
    val counts = docs.select(
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val (ranked, release) = graft.tools.Ranks.globalRowNumberWithRelease(
      counts, "__rank", numPartitions, col("cnt").desc, col("term"))
    val covSums = vs.map(v =>
      sum(when(col("__rank") <= v, col("cnt")).otherwise(lit(0L))).as(s"__c$v"))
    val one = ranked.agg(covSums.head,
      covSums.tail :+ sum(col("cnt")).as("__total"): _*)
    val entries = array(vs.map(v =>
      struct(lit(v).as("v"), col(s"__c$v").as("covered"))): _*)
    // double multiply, matching the oracle's 1000000.0 arithmetic —
    // covered * 1000000 in LONG overflows past ~9.2e12 occurrences
    val out = one.select(col("__total"), explode(entries).as("e"))
      .select(col("e.v").as("v"), col("e.covered").as("covered"),
        floor(col("e.covered") * lit(1000000.0) / col("__total"))
          .cast("long").as("ppm"))
      .localCheckpoint(true)
    release()
    out
  }

  /** Frequency-ordered label index (the StringIndexer encoding, made
    * deterministic): labels get dense 0-based indices by descending
    * count, ties broken by the label string. Returns
    * (label, n, label_idx) — the categorical-feature dictionary of an
    * ML-prep pipeline, joinable back onto the corpus.
    *
    * Scale shape: ONE grouped aggregate over the corpus; the rank
    * window then orders |labels| rows (the dictionary), never corpus
    * rows. */
  def labelIndex(df: DataFrame, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(label.as("label")).agg(count(lit(1)).as("n"))
      .withColumn("label_idx",
        (row_number().over(Window.orderBy(col("n").desc, col("label"))) - 1)
          .cast("long"))
  }
}
