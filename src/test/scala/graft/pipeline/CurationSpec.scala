package graft.pipeline

import graft.functions.{LongBloom, TextEval}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Line-level stats, char-bigram LM scoring, inverted index, and
  * incremental (cross-snapshot) dedup. */
class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("collocationTopK ranks a glued pair above frequent independents") {
    // "new york" always co-occur; "the" is frequent but promiscuous
    val docs = Seq(
      "new york is the city the people the visit",
      "new york has the parks the rivers the bridges",
      "new york draws the crowds the artists the makers"
    ).toDF("text")
    val top = TextAnalysis.collocationTopK(docs, "text", k = 5)
      .select("w1", "w2").as[(String, String)].collect()
    assert(top.head == ("new", "york"))
    // deterministic: same input, same full ordering on a re-run
    val again = TextAnalysis.collocationTopK(docs, "text", k = 5)
      .select("w1", "w2").as[(String, String)].collect()
    assert(top.toSeq == again.toSeq)
  }

  test("lineColumns: counts, duplicate lines/chars, bullets, ellipsis") {
    val text = Seq(
      "alpha beta",    // line 1
      "  alpha beta ", // trims to a duplicate of line 1 (10 chars)
      "- item one",    // bullet
      "* item two",    // bullet
      "",              // dropped (empty after trim)
      "   ",           // dropped
      "to be continued..."
    ).mkString("\n")
    val df = Seq((1L, text)).toDF("id", "text")
    val cols = TextAnalysis.lineColumns(col("text"))
    val r = df.select(cols.map { case (n, c) => c.as(n) }: _*).head()
    assert(r.getAs[Int]("n_lines") == 5)
    assert(r.getAs[Int]("dup_lines") == 1)
    assert(r.getAs[Long]("dup_line_chars") == 10L) // "alpha beta"
    assert(r.getAs[Int]("bullet_lines") == 2)
    assert(r.getAs[Int]("ellipsis_lines") == 1)
  }

  test("charBigrams and self-trained lmFamiliarity integer arithmetic") {
    // corpus: "aaab" and "ab" -> bigrams aa,aa,ab | ab
    // model: aa->2, ab->2
    // doc 1: grams aa,aa,ab -> n=3, sum_log2 = 1+1+1 = 3, fam = 100
    // doc 2: grams ab       -> n=1, sum_log2 = 1,     fam = 100
    val docs = Seq((1L, "aaab"), (2L, "ab")).toDF("id", "text")
    val out = TextAnalysis.lmFamiliaritySelf(docs, "id", "text")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((1L, 3L, 3L, 100L), (2L, 1L, 1L, 100L)))
    // a 1-char doc yields no grams and is absent
    val tiny = TextAnalysis.lmFamiliaritySelf(
      Seq((1L, "x")).toDF("id", "text"), "id", "text")
    assert(tiny.count() == 0)
  }

  test("lmFamiliarity against a foreign model counts unseen grams as 1") {
    val model = Seq(("zz", 8L)).toDF("gram", "cnt")
    val out = TextAnalysis.lmFamiliarity(
      Seq((1L, "zzq")).toDF("id", "text"), "id", "text", model).head()
    // grams zz (cnt 8 -> log2 3), zq (unseen -> cnt 1 -> log2 0)
    assert(out.getAs[Long]("n_grams") == 2L)
    assert(out.getAs[Long]("sum_log2") == 3L)
    assert(out.getAs[Long]("fam_x100") == 150L)
  }

  test("invertedIndex: df band drops stopwords as counts, postings sorted") {
    val docs = Seq(
      (3L, "the cat sat"),
      (1L, "the cat ran"),
      (2L, "the dog ran ran")
    ).toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "id", "text",
        minDf = 2L, maxDf = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    // "the" has df=3 > maxDf: dropped; "sat"/"dog" df=1 < minDf: dropped
    assert(idx.keySet == Set("cat", "ran"))
    val cat = idx("cat")
    assert(cat.getAs[Long]("df") == 2L)
    val catPostings = cat.getSeq[org.apache.spark.sql.Row](2)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(catPostings == Seq((1L, 1L), (3L, 1L))) // sorted by id
    val ranPostings = idx("ran").getSeq[org.apache.spark.sql.Row](2)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(ranPostings == Seq((1L, 1L), (2L, 2L))) // tf 2 in doc 2
    spark.catalog.clearCache()
  }

  val corpusSnap = Seq((10L, "seen before"), (11L, "also seen")).toDF("doc_id", "text")
  val freshBatch = Seq(
    (20L, "brand new"),
    (21L, "seen before"),   // dup of 10 -> dropped
    (22L, "also seen"),     // dup of 11 -> dropped
    (23L, "another new one")
  ).toDF("doc_id", "text")

  test("againstCorpus drops exactly the rows whose text is in the corpus") {
    val out = Dedup.againstCorpus(freshBatch, corpusSnap, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(20L, 23L))
  }

  test("againstCorpusBucketed == againstCorpus, batch-side-only exchange") {
    val exact = Dedup.againstCorpus(freshBatch, corpusSnap, "text")
      .select("doc_id").as[Long].collect().toSet
    val table = "graft_bucketed_corpus_test"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Dedup.saveCorpusBucketedByHash(corpusSnap, "text", table, numBuckets = 4)
      // force a shuffle join so the bucket distribution matters
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Dedup.againstCorpusBucketed(freshBatch, table, "text")
      assert(j.select("doc_id").as[Long].collect().toSet == exact)
      val plan = j.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("againstCorpusBloom returns the identical survivor set") {
    val exact = Dedup.againstCorpus(freshBatch, corpusSnap, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloom = Dedup.againstCorpusBloom(freshBatch, corpusSnap, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(bloom == exact)
    // schema preserved (text column survives)
    assert(Dedup.againstCorpusBloom(freshBatch, corpusSnap, "text")
      .columns.toSeq == Seq("doc_id", "text"))
  }

  test("dedupLinesInDoc keeps first occurrences in order; blanks drop") {
    val df = Seq(
      (1L, "a b\nc d\na b\n  \nc d\ne"),
      (2L, "\n  \n"),
      (3L, "only line")
    ).toDF("id", "text")
    val out = df.select(col("id"), Scrub.dedupLinesInDoc(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b\nc d\ne")
    assert(out(2L) == "")
    assert(out(3L) == "only line")
  }

  test("NFC normalization composes decomposed sequences; ASCII untouched") {
    val df = Seq(
      (1L, "café"),   // decomposed e + combining acute
      (2L, "plain ascii"),
      (3L, "café")     // composed
    ).toDF("id", "text")
    val out = df.select(col("id"), Scrub.nfc(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "café") // composed, 4 code points
    assert(out(1L) == out(3L))     // canonical equality after NFC
    assert(out(2L) == "plain ascii")
    // grouping on the normalized key collapses both spellings
    val groups = df.groupBy(Scrub.nfc(col("text")).as("k"))
      .count().collect()
    assert(groups.length == 2)
  }

  test("hashedLinearScore: additive over tokens, zero for empty, bucketed weights") {
    val w = TextAnalysis.demoQualityWeights
    val df = Seq((1L, "alpha"), (2L, "alpha alpha"), (3L, ""), (4L, "alpha beta"))
      .toDF("id", "text")
    val s = df.select(col("id"),
        TextAnalysis.hashedLinearScore(col("text"), w).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(3L) == 0L)                 // no tokens -> 0
    assert(s(2L) == 2 * s(1L))          // additive
    assert(w.contains(s(1L)))           // a single token hits one bucket
    assert(w.contains(s(4L) - s(1L)))   // and so does the second token
    intercept[IllegalArgumentException](
      TextAnalysis.hashedLinearScore(col("text"), Seq(1L, 2L, 3L)))
  }

  test("DSIR importance weights: target-like docs outscore raw-like docs") {
    // raw corpus dominated by "noise*" tokens; target is all "signal*"
    val raw = (0L until 40L).map { i =>
      if (i < 30) (i, s"noise${i % 7} noise${i % 5} noise${i % 3}")
      else (i, s"signal${i % 4} signal${i % 2} signal${i % 3}")
    }.toDF("id", "text")
    val target = raw.where(col("text").startsWith("signal"))
    val model = TextAnalysis.importanceModel(raw, target, "text", buckets = 64)
    assert(model.count() <= 64)
    val w = TextAnalysis.importanceWeights(raw, "id", "text", model, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sigAvg = (30L until 40L).map(w).sum / 10.0
    val noiseAvg = (0L until 30L).map(w).sum / 30.0
    assert(sigAvg > noiseAvg,
      s"signal docs must outscore noise docs: $sigAvg vs $noiseAvg")
    // resample at 0.5 must keep >= half (ties keep more, never less)
    val kept = TextAnalysis.importanceResample(raw, target, "id", "text",
      buckets = 64, keepFraction = 0.5).count()
    assert(kept >= 20 && kept < 40)
  }

  test("property: DSIR logweight equals a Scala model on random docs") {
    // Scala model of the whole chain: bucket = doc_fingerprint(tok)&63
    // computed BY SPARK (the fingerprint itself is oracled elsewhere);
    // counts/log2/sum recomputed independently here
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0L until 30L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("id", "text")
    val target = df.where(col("id") % 3 === 0)
    val bucketOf = df.sparkSession.range(1)
      .select(vocab.map(v => Tx.doc_fingerprint(lit(v))
        .bitwiseAND(lit(63L)).as(v)): _*)
      .collect()(0)
    val bmap = vocab.zipWithIndex.map { case (v, i) => v -> bucketOf.getLong(i) }.toMap
    def counts(rows: Seq[(Long, String)]): Map[Long, Long] =
      rows.flatMap(_._2.split("\\s+")).groupBy(bmap).map { case (b, ts) => b -> ts.size.toLong }
    val rc = counts(docs)
    val tc = counts(docs.filter(_._1 % 3 == 0))
    def log2f(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val s = rc.keys.map(b => b ->
      (log2f(tc.getOrElse(b, 0L) + 1) - log2f(rc(b) + 1))).toMap
    val expected = docs.map { case (i, t2) =>
      i -> t2.split("\\s+").map(tok => s(bmap(tok))).sum
    }.toMap
    val got = TextAnalysis.importanceWeights(df, "id", "text",
        TextAnalysis.importanceModel(df, target, "text", buckets = 64),
        buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("exactQuantiles global and by-group match brute-force rank selection") {
    val df = Seq((0L, 5L), (1L, 1L), (0L, 9L), (1L, 3L), (0L, 7L),
        (1L, 2L), (0L, 8L), (1L, 4L), (0L, 6L), (1L, 10L))
      .toDF("g", "v")
    // n=10; ranks ceil(.3*10)=3, ceil(.5*10)=5, ceil(1*10)=10 over 1..10
    val g = Sketches.exactQuantiles(df, col("v"), Seq(0.3, 0.5, 1.0),
        numPartitions = 3)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(g == Map(0.3 -> 3L, 0.5 -> 5L, 1.0 -> 10L))
    // group 0 sorted: 5,6,7,8,9; group 1 sorted: 1,2,3,4,10
    val bg = Sketches.exactQuantilesByGroup(df, col("g"), col("v"),
        Seq(0.5, 1.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(bg == Map((0L, 0.5) -> 7L, (0L, 1.0) -> 9L,
      (1L, 0.5) -> 3L, (1L, 1.0) -> 10L))
  }

  test("vocabCoverage: conditional top-v sums over the distributed rank") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("id", "text")
    // counts: a=3, b=2, c=1; total 6
    val out = TextAnalysis.vocabCoverage(docs, "text", Seq(1, 2),
        numPartitions = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1) == (3L, 500000L))
    assert(out(2) == (5L, 833333L))
  }

  test("cdcChunks: lossless concat; boundaries re-sync after a prefix edit") {
    val rnd = new scala.util.Random(3)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val text = Seq.fill(400)(words(rnd.nextInt(words.size))).mkString(" ")
    val df = Seq((1L, text), (2L, "INSERTED-PREFIX " + text)).toDF("id", "text")
    val chunks = df.select(col("id"),
        TextAnalysis.cdcChunks(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // lossless: chunks concatenate back to the text
    assert(chunks(1L).mkString("") == text)
    assert(chunks(2L).mkString("") == "INSERTED-PREFIX " + text)
    // re-sync: after the leading insertion most chunks are shared —
    // fixed-size chunking would share (essentially) none
    val shared = chunks(1L).toSet.intersect(chunks(2L).toSet)
    assert(shared.size * 2 >= chunks(1L).size,
      s"only ${shared.size}/${chunks(1L).size} chunks survived the prefix edit")
    // degenerate inputs: shorter than the window -> one chunk
    val tiny = Seq((1L, "short")).toDF("id", "text")
      .select(TextAnalysis.cdcChunks(col("text")).as("c"))
      .head().getSeq[String](0)
    assert(tiny == Seq("short"))
  }

  test("dedupCdcChunks strips the copied span, keeps the novel prefix") {
    // unique tokens: within-doc chunk repeats would (correctly!)
    // self-dedup and break the out(1) == text assertion
    val text = Seq.tabulate(300)(i => s"word$i").mkString(" ")
    val df = Seq((1L, text), (2L, "FRESH LEAD-IN " + text)).toDF("id", "text")
    val out = Dedup.dedupCdcChunks(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == text) // first holder keeps everything
    // the copy keeps its novel prefix (plus at most the pre-resync
    // tail of copied content) and loses the re-synced copied chunks
    assert(out(2L).startsWith("FRESH LEAD-IN "))
    assert(out(2L).length < text.length / 2,
      s"copy kept ${out(2L).length} chars of ${text.length}")
  }

  test("property: dedupLinesInDoc equals a Scala model on random docs") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b b", "c", "dd d", " ", "")
    val docs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString("\n"))
    }
    def model(text: String): String =
      text.split("\n", -1).map(_.trim).filter(_.nonEmpty).distinct.mkString("\n")
    val out = docs.toDF("id", "text")
      .select(col("id"), Scrub.dedupLinesInDoc(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) => assert(out(id) == model(text),
      s"doc $id: ${text.replace("\n", "\\n")}") }
  }

  test("property: exactQuantiles equals sorted-array selection on random data") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(257)(rnd.nextInt(1000).toLong)
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val sorted = values.sorted
    val expect = probs.map(p =>
      p -> sorted(math.ceil(p * values.size).toInt.max(1) - 1)).toMap
    val got = Sketches.exactQuantiles(values.toDF("v"), col("v"), probs,
        numPartitions = 5)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("LongBloom.buildDistributed equals the sequential build bit-for-bit") {
    val values = (0 until 5000).map(i => i.toLong * 0x9e3779b97f4a7c15L)
    val (seqWords, seqK) = LongBloom.build(values.toArray, 16)
    val df = values.toDF("h").repartition(7)
    val (distWords, distK) = LongBloom.buildDistributed(df, 16)
    assert(distK == seqK)
    assert(java.util.Arrays.equals(distWords, seqWords))
    // sanity: every inserted key is contained
    assert(values.forall(v => TextEval.bloomContains(v, distWords, distK)))
  }

  test("bpeTrain learns the hand-computed merges on the Sennrich corpus") {
    // low x5, lower x2, newest x6, widest x3 — the BPE paper's example
    // shape. Hand peel: es(9) tie-beats st lexicographically, then
    // est(9), lo(7), low(7), and ew(6) tie-beats ne and "w est".
    val docs = Seq(
      ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)
    ).toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L)))
    // merged symbols must not re-pair within their own round: "aaaa"
    // merges (a,a) left-to-right non-overlapping -> aa aa, so round 2
    // learns (aa,aa) with freq 1
    val aaaa = Seq("aaaa").toDF("text")
    val got2 = TextAnalysis.bpeTrain(aaaa, "text", merges = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
    // early stop: single-char words run out of pairs
    val tiny = Seq("a b a").toDF("text")
    assert(TextAnalysis.bpeTrain(tiny, "text", merges = 4).isEmpty)
  }

  test("bpeEncodeCounts sizes docs under the learned merges") {
    // same Sennrich-style corpus, split over two docs; after 5 merges
    // low -> [low], lower -> [low, e, r], newest -> [n, ew, est],
    // widest -> [w, i, d, est]
    val docs = Seq(
      (1L, ("low " * 5) + ("lower " * 2)),
      (2L, ("newest " * 6) + ("widest " * 3))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text", merges = 5)
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, s) => id -> ((w, s)) }.toMap
    // doc 1: 7 words, 5*1 + 2*3 = 11 symbols; doc 2: 9 words, 6*3 + 3*4 = 30
    assert(got == Map(1L -> ((7L, 11L)), 2L -> ((9L, 30L))))
  }
}
