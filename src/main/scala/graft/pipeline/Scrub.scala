package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Web-corpus scrubbing operators: PII detection/redaction, URL/domain
 * extraction with blocklist filtering, and text normalization (the
 * canonical form fed to exact dedup).
 *
 * Everything here is regex/string arithmetic over built-in codegen'd
 * expressions — narrow projections with NO shuffle, the right shape for
 * a 100 TB scrub pass (the scan dominates; the filter/redact is free on
 * top of it). Every pattern is written in the common Java-regex/RE2
 * dialect (no lookahead, no backreferences), so the identical pattern
 * string runs in the DuckDB oracles.
 */
object Scrub {

  /** PII patterns (detection AND redaction use the same string). The
    * ASCII character classes are deliberate: \d etc. match identically
    * in Java regex and RE2. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Pattern: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Match count of `pattern` in `text` (non-overlapping). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Remove duplicate LINES within each document, keeping first
    * occurrences in order — the in-document half of C4/Gopher line
    * dedup (the cross-corpus half is `Dedup.dedupParagraphs` with a
    * newline separator). Lines are trimmed; empty lines drop. Pure
    * narrow array arithmetic (no shuffle, no explode); the
    * first-occurrence test is array_position == own index, O(L²) in
    * the LINE count per doc — fine for document-sized texts, and the
    * identical list arithmetic runs in any SQL oracle. */
  def dedupLinesInDoc(text: Column): Column =
    // let-bind the line array: referenced inside the filter lambda it
    // would re-split the text per line index (see TextAnalysis.bindArray)
    TextAnalysis.bindArray(TextAnalysis.trimmedLines(text)) { lines =>
      // guard: sequence(1, 0) would generate a DESCENDING [1, 0], not
      // an empty array — all-blank docs must short-circuit
      when(size(lines) === 0, lit("")).otherwise(
        array_join(
          transform(
            filter(sequence(lit(1), size(lines)),
              i => array_position(lines, element_at(lines, i)) === i),
            i => element_at(lines, i)),
          "\n"))
    }

  /** Unicode NFC canonical composition ('é' == 'e' + combining acute
    * after it) — apply before any hash-keyed dedup/groupBy on
    * multilingual text, where byte-different but canonically-equal
    * strings must collide. Codegen'd custom expression
    * ([[graft.functions.NfcNormalize]]); DuckDB's nfc_normalize
    * implements the identical Unicode transformation for oracles. */
  def nfc(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** Per-row PII hit counts: emails, phone numbers, IPv4 addresses. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "emails" -> matchCount(text, emailPattern),
    "phones" -> matchCount(text, phonePattern),
    "ipv4s" -> matchCount(text, ipv4Pattern))

  /** Redact all PII matches with typed tags. Emails first (an email can
    * contain digit runs a later pattern might clip), then IPv4 before
    * phone (both are digit shapes; fixed order keeps the output
    * deterministic and oracle-reproducible). */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val i = regexp_replace(e, ipv4Pattern, "<IP>")
    regexp_replace(i, phonePattern, "<PHONE>")
  }

  /** URL host extraction: group 1 of this pattern is the host of each
    * http(s) URL in the text. */
  val urlHostPattern: String = "https?://([A-Za-z0-9.-]+)"

  /** All URL hosts in `text`, in order (possibly with duplicates). */
  def urlHosts(text: Column): Column =
    regexp_extract_all(text, lit(urlHostPattern), lit(1))

  /** One row per (id, host) occurrence — the explode that feeds domain
    * statistics and blocklist joins. */
  def explodeHosts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(urlHosts(col(textCol))).as("host"))

  /** Drop every row whose text links to a blocklisted host. The
    * blocklist is a (small) one-column `host` frame: the anti-join
    * broadcasts it, so the pass stays shuffle-free on the corpus side. */
  def filterBlockedHosts(df: DataFrame, idCol: String, textCol: String,
                         blocklist: DataFrame): DataFrame = {
    val hits = explodeHosts(df, idCol, textCol)
      .join(broadcast(blocklist.select(col("host"))), Seq("host"))
      .select(col(idCol))
    df.join(hits, Seq(idCol), "left_anti")
  }

  /** Query parameters stripped by [[canonicalizeUrl]]: click-tracking
    * ids that make byte-identical pages look like distinct URLs. utm_*
    * is matched as a prefix family. */
  val trackingParamPattern: String = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)="

  /** URL canonicalization — the key for URL-level dedup and frontier
    * visited-set checks, where the same page arrives spelled a dozen
    * ways. Pure string/regex/array arithmetic over codegen'd built-ins
    * (no UDF, no java.net parsing), so the identical steps replay in a
    * SQL oracle:
    *
    *   - scheme and host lowercase; a leading `www.` drops
    *   - default ports drop (`:80` for http, `:443` for https);
    *     non-default ports survive
    *   - the fragment (`#...`) drops
    *   - tracking query params drop ([[trackingParamPattern]]); the
    *     survivors are sorted (param order never distinguishes pages);
    *     an emptied query string loses its `?`
    *   - a bare-root `/` path drops
    *
    * Input must be a single absolute http(s)-style URL; anything the
    * scheme/host regexes don't match canonicalizes to a degenerate
    * string rather than raising (filter upstream if needed). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val noDefault = when(
      (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      regexp_replace(hostPort, ":[0-9]+$", "")).otherwise(hostPort)
    val host = regexp_replace(noDefault, "^www\\.", "")
    val path0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "/", lit("")).otherwise(path0)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(query, "&"),
      p => !p.rlike(trackingParamPattern) && p =!= ""))
    concat(scheme, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Canonical text form for exact dedup: lowercase, every non-alnum
    * run collapsed to a single space, trimmed. Two documents differing
    * only in case, punctuation, or whitespace layout normalize
    * identically. (ASCII classes — the portable-regex rule above.) */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Exact dedup under [[normalize]]: keep the lowest-id row per
    * normalized form (delegates to [[Dedup.exact]] — same single-shuffle
    * plan, keyed on the normalized text). */
  def dedupNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exact(
      df.withColumn("__norm", normalize(col(textCol))), "__norm", idCol)
      .drop("__norm")

  /** HTML → text extraction (the WET step: what a crawl pipeline runs
    * before any quality/dedup pass). Deliberately rule-based and
    * deterministic — script/style/comment blocks drop whole, remaining
    * tags become spaces, the five core entities decode (amp LAST, so
    * `&amp;lt;` yields the literal `&lt;` like a real entity decoder),
    * whitespace collapses. Pure codegen'd regex/replace chain — narrow,
    * shuffle-free, scan-dominated at 100 TB — and every pattern is in
    * the common Java-regex/RE2 dialect with explicit ASCII whitespace
    * classes (no `\s`: Java and RE2 disagree on vertical tab), so the
    * identical steps replay in the DuckDB oracle. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "[ \\t\\r\\n\\f]+", " "))
  }

  /** Per-domain boilerplate LINE removal (the CCNet/C4 sibling of
    * [[dedupLinesInDoc]], across documents instead of within one):
    * a line whose trimmed form appears in >= `minDocs` distinct
    * documents of the SAME domain is navigation/footer chrome, not
    * content — drop it from every document of that domain. Blank lines
    * are never boilerplate (they are structure) and survive untouched;
    * line order is preserved.
    *
    * Plan shape (the 100 TB question): posexplode → ONE
    * (domain, line)-keyed distinct+count to find boilerplate keys, an
    * anti-join of the exploded lines against that (small — boilerplate
    * vocabularies are tiny next to the corpus) key set, then ONE
    * id-keyed reassembly aggregate. The sort-by-position happens in a
    * narrow `array_sort` over per-doc structs (struct ordering = first
    * field = position), never a window. Skew bound: lines per document
    * on the reassembly key; docs per (domain, line) on the count key —
    * both corpus-structure constants, not corpus-size terms. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        domainCol: String, minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol), col(domainCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines
      .where(trim(col("__line")) =!= "")
      .select(col(domainCol).as("__dom"), trim(col("__line")).as("__lt"),
        col(idCol))
      .distinct()
      .groupBy(col("__dom"), col("__lt"))
      .agg(count(lit(1)).as("__docs"))
      .where(col("__docs") >= minDocs)
      .select(col("__dom"), col("__lt"))
    val kept = lines.join(boiler,
      lines(domainCol) === boiler("__dom") &&
        trim(lines("__line")) === boiler("__lt"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")),
        "\n").as("__clean"))
    // left join: a document whose every line was boilerplate keeps an
    // empty text rather than vanishing (the caller decides to filter)
    df.join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__clean"), lit("")))
      .drop("__clean")
  }
}
