package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sparse and dense retrieval over a document corpus — the "find me the
 * training examples most relevant to X" building blocks of RAG-style
 * curation, plus dataset-versioning diff.
 *
 * All scoring is INTEGER-staged (floor-log2 idf via binary-string
 * length, integer pivoted length normalization, quantized embedding
 * distances) so results are bit-identical across engines — the same
 * convention as the rest of the pipeline (no ln()/double-division
 * ulps anywhere near a hash-gated output).
 */
object Retrieval {

  /** floor(log2(x)) for x >= 1, as the Catalyst-native
    * length(bin(x)) - 1 — exact integer, replayable in any SQL engine. */
  private def floorLog2(x: Column): Column = length(bin(x)) - lit(1)

  /**
   * Sparse lexical top-k retrieval (BM25 family, integer-staged).
   *
   * Score of document d for query q:
   *   score(q,d) = (1000 * Σ_{t ∈ q∩d} tf(t,d) · idf(t)) // (pivot + dl(d))
   * with idf(t) = floor(log2(N / df(t))) + 1 and dl = token count —
   * tf·idf weighting with pivoted length normalization, all in int64
   * (the BM25 shape with the k1-saturation replaced by raw tf so both
   * engines agree bit-for-bit; // is integer division).
   *
   * Scale plan: corpus tf is ONE explode+groupBy shuffle keyed
   * (id, term); df is a groupBy over tf (partial-agg, skew-safe); the
   * QUERY side (queries are dimension-table-sized: a dashboard of
   * hundreds, not billions) broadcasts into the tf join, so the corpus
   * never reshuffles for scoring. Per-query top-k runs as a rank<=k
   * window — Spark plans WindowGroupLimit, so only k rows per query
   * cross the final exchange.
   *
   * Ties break by doc id ascending (deterministic output).
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               k: Int = 10, pivot: Long = 50L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = TextAnalysis.termFrequencies(docs, idCol, textCol).persist()
    val n = docs.count()
    // distinct query terms: q∩d membership weighting, not qtf weighting
    val qterms = queries.select(col(qidCol).as("query_id"), explode(
        array_distinct(regexp_extract_all(col(qtextCol), lit("\\S+"), lit(0))))
        .as("term"))
    // The score only ever READS df/idf for terms of some query (the
    // qterms join is inner), and df(t) over the query-term-filtered tf
    // equals df(t) over the full tf for every such term — so filter the
    // corpus tf down with the broadcast query side FIRST and aggregate
    // df on the survivors. The corpus then never crosses a term-keyed
    // exchange at all (the old shape shuffled the full tf into a
    // sort-merge join with the full-corpus dfreq): dfreq is
    // query-vocabulary-sized, broadcast like the query side itself.
    val qdist = qterms.select(col("term")).distinct()
    val tfq = tf.join(broadcast(qdist), Seq("term"))
    val dfreq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // integer div (Column./ is double division; `div` is IntegralDivide)
      .select(col("term"), (floorLog2(expr(s"$n div df")) + lit(1)).as("idf"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val scored = tfq.join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("tf") * col("idf")).as("__num"))
      .join(dl, Seq("id"))
      .select(col("query_id"), col("id"),
        expr(s"(1000 * __num) div ($pivot + dl)").as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    // tf stays persisted: the RESULT is lazy, and an eager unpersist
    // here would silently recompute the tokenize+groupBy for each of
    // its three consumers (df, dl, scoring) when the caller finally
    // acts — same convention as invertedIndex (caller clears cache).
  }

  /**
   * Ranking-quality metrics over a top-k retrieval result: per query,
   * the rank of the first RELEVANT hit within the top `k`, rolled up to
   * the corpus-level (n_queries, n_hit, Σ reciprocal-rank) — the
   * retrieval-eval counterpart of the eval-decontamination ops. MRR is
   * staged as ppm integers (`1e6 div first_rank`) so the aggregate is
   * exact and order-independent cross-engine; divide by n_queries at
   * the consumer for the conventional [0,1] figure.
   *
   * Scale shape: the relevance table is eval-set-sized (small by
   * construction) — it broadcasts; the top-k frame carries ≤ k rows per
   * query. One (query, doc) hash join + one per-query min + one global
   * aggregate. Queries with NO relevant hit in the top-k contribute 0
   * through the left join (they must still count in n_queries — the
   * inner-join formulation silently inflates MRR).
   */
  def mrrAtK(topk: DataFrame, qidCol: String, docCol: String, rankCol: String,
             relevance: DataFrame, relQidCol: String, relDocCol: String,
             k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val hits = topk.where(col(rankCol) <= k)
      .join(broadcast(relevance.select(col(relQidCol).as("__rq"),
        col(relDocCol).as("__rd"))),
        col(qidCol) === col("__rq") && col(docCol) === col("__rd"))
      .groupBy(col(qidCol).as("qid"))
      .agg(min(col(rankCol)).as("first_rank"))
    relevance.select(col(relQidCol).as("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .agg(count(lit(1)).as("n_queries"),
        count(col("first_rank")).as("n_hit"),
        coalesce(sum(expr("1000000 div first_rank")), lit(0L))
          .as("sum_rr_ppm"))
  }

  /** Fixed-point nDCG discount weights: w_r = floor(1e6 / log₂(r+1)).
    * Computed ONCE here and embedded as the literal table BOTH the plan
    * and any replaying oracle share — the log never re-evaluates on
    * another engine's libm, so the metric stays exact-integer. */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(r => math.floor(1e6 / (math.log(r + 1.0) /
      math.log(2.0))).toLong)

  /**
   * nDCG@k under binary relevance, exact-integer: per query
   * DCG = Σ w_rank over relevant results in the top k,
   * IDCG = Σ_{r ≤ min(|rel|, k)} w_r (the prefix-sum literal), and
   * ndcg_ppm = 1e6·DCG div IDCG. Missed queries score 0.
   *
   * Scale shape mirrors [[mrrAtK]]: the relevance table broadcasts,
   * the top-k frame crosses one query-keyed aggregate; the weight and
   * prefix tables are k-entry literals inside codegen.
   */
  def ndcgAtK(topk: DataFrame, qidCol: String, docCol: String,
              rankCol: String, relevance: DataFrame, relQidCol: String,
              relDocCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = ndcgWeights(k)
    val cum = w.scanLeft(0L)(_ + _).tail
    val hits = topk.where(col(rankCol) <= k)
      .join(broadcast(relevance.select(col(relQidCol).as("__rq"),
        col(relDocCol).as("__rd"))),
        col(qidCol) === col("__rq") && col(docCol) === col("__rd"))
      .groupBy(col(qidCol).as("qid"))
      .agg(sum(element_at(typedLit(w), col(rankCol).cast("int"))).as("__dcg"))
    relevance.groupBy(col(relQidCol).as("qid"))
      .agg(count(lit(1)).as("__nrel"))
      .withColumn("__idcg", element_at(typedLit(cum),
        least(col("__nrel"), lit(k.toLong)).cast("int")))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(expr("1000000L * __dcg DIV __idcg"), lit(0L))
          .as("ndcg_ppm"))
  }

  /**
   * K-means ASSIGNMENT over an embedding column against a fixed
   * centroid table — the clustering pass of topic bucketing / IVF-style
   * partitioning, exposed as its own operator.
   *
   * Distances are exact int64: both sides quantize to round(x*1000)
   * and dist2 = Σ (a-b)², so the argmin (ties to the smaller centroid
   * id) is deterministic in any engine.
   *
   * Scale plan: centroids are bounded small state (k × dim — thousands
   * of rows at most, the k-means contract) and ride into the plan as a
   * collected array literal: the corpus scan is ONE narrow projection,
   * zero shuffles, nothing keyed. The per-row argmin folds over the
   * centroid array inside codegen.
   */
  def kmeansAssign(embs: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame, cidCol: String, cvecCol: String)
      : DataFrame = {
    val quant: Column => Column =
      v => transform(v, x => round(x.cast("double") * 1000).cast("long"))
    // bounded driver collect: k centroids (k-means contract, documented)
    val cents = centroids
      .select(col(cidCol).cast("long").as("cid"), quant(col(cvecCol)).as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "centroid table is empty")
    val centLit = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"))
    }: _*)
    val q = quant(col(vecCol))
    val best = array_min(transform(centLit, c =>
      struct(
        aggregate(
          zip_with(q, c.getField("cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist2"),
        c.getField("cid").as("cid"))))
    embs.select(col(idCol), best.getField("cid").as("cluster"),
      best.getField("dist2").as("dist2"))
  }

  /**
   * Dataset snapshot diff — the versioning primitive of iterative
   * curation: classify every id across two corpus snapshots as
   * added / removed / changed / unchanged (content compared by
   * xxhash64 of the compare columns, so wide rows never ship twice).
   *
   * One full-outer hash join keyed on the id; both sides reduce to
   * (id, content-hash) projections before the shuffle, so the join
   * carries 16 bytes per row regardless of document width.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    def h(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as("id"),
        xxhash64(compareCols.map(col): _*).as(s"__h_$side"))
    h(oldDf, "old").join(h(newDf, "new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /**
   * CDC changelog APPLY — the MERGE INTO / upsert shape of lakehouse
   * table maintenance: fold a changelog of (key, ts, seq, op,
   * payload…) rows into a snapshot, LATEST-WINS per key under the
   * (tsCol, seqCol) order; an op of "D" deletes the key, anything
   * else ("I"/"U") upserts the payload (keys absent from the snapshot
   * insert). Unchanged snapshot rows pass through untouched.
   *
   * Scale shape: ONE keyed aggregate collapses the changelog to its
   * per-key latest row via max(struct(ts, seq, op, payload…)) —
   * lexicographic struct max, partially aggregated MAP-SIDE, so a
   * hot key's million-row history arrives at the reducer already
   * folded (the window-rank formulation shuffles and sorts every
   * version instead). Then one anti join carries untouched snapshot
   * rows past the touched-key set and the surviving upserts union in;
   * the (wide) snapshot crosses exactly one key shuffle.
   *
   * Contract: (tsCol, seqCol) must totally order each key's changes
   * (equal pairs would tie-break on op then payload bytes — make the
   * sequence number unique instead). The changelog must carry every
   * snapshot payload column plus tsCol/seqCol/opCol.
   */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame,
                     keyCol: String, tsCol: String, seqCol: String,
                     opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == keyCol).toSeq
    val missing = (Seq(keyCol, tsCol, seqCol, opCol) ++ payload)
      .filterNot(changelog.columns.contains)
    require(missing.isEmpty,
      s"changelog is missing column(s): ${missing.mkString(", ")}")
    // NULL key/op rows have no sane meaning here and would diverge
    // SILENTLY (a NULL op null-filters the =!= "D" upsert branch —
    // treated as a delete; a NULL key both survives the left_anti,
    // null keys never match, AND unions back in) — enforced in-plan,
    // no extra pass, the job fails naming the column
    val guarded = changelog
      .withColumn(keyCol, nonNullOrRaise(keyCol, "applyChangelog"))
      .withColumn(opCol, nonNullOrRaise(opCol, "applyChangelog"))
    val latest = guarded.groupBy(col(keyCol))
      .agg(max(struct((Seq(tsCol, seqCol, opCol) ++ payload).map(col): _*))
        .as("__c"))
    val upserts = latest
      .where(col("__c").getField(opCol) =!= "D")
      .select(col(keyCol) +: payload.map(c => col("__c").getField(c).as(c)): _*)
    snapshot.join(latest, Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }

  /**
   * SPLIT-INVARIANT versioned merge — the incremental/streaming form
   * of [[applyChangelog]]. Both `state` and `changes` carry
   * (key, ts, seq, op, payload…); the merge keeps, per key, the row
   * with the maximum (ts, seq) INCLUDING "D" tombstones. Because a
   * per-key max is associative and commutative, applying a changelog
   * in ANY batch split — or out of order across batches — yields the
   * same table: a batch that arrives carrying only OLDER versions of
   * a key can never regress the stored row, and an old update can
   * never resurrect a newer delete ([[applyChangelog]], which drops
   * tombstones, has neither property — it is the one-shot form).
   * Filter `op != "D"` for the user view; a compaction may drop
   * tombstones once no older change can still arrive (the same
   * watermark argument as streaming state eviction).
   *
   * Scale shape: one keyed max(struct…) aggregate over
   * state ∪ changes — map-side partial like [[applyChangelog]]; the
   * state table crosses one key shuffle per merge.
   */
  def mergeVersioned(state: DataFrame, changes: DataFrame, keyCol: String,
                     tsCol: String, seqCol: String,
                     opCol: String): DataFrame = {
    // unlike applyChangelog's snapshot, `state` here is itself a
    // versioned table — it must carry the version columns too (a plain
    // snapshot passed by mistake would otherwise die much later with an
    // opaque unresolved-column error)
    val stateMissing = Seq(keyCol, tsCol, seqCol, opCol)
      .filterNot(state.columns.contains)
    require(stateMissing.isEmpty,
      s"state is missing column(s): ${stateMissing.mkString(", ")}")
    val ordered = Seq(tsCol, seqCol, opCol) ++
      state.columns.filterNot(c =>
        c == keyCol || c == tsCol || c == seqCol || c == opCol)
    val missing = (keyCol +: ordered).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes are missing column(s): ${missing.mkString(", ")}")
    // same NULL contract as applyChangelog: a NULL key would fold all
    // null-key versions into one phantom row, a NULL op is
    // uninterpretable at compaction/user-view time — fail naming the column
    state.unionByName(changes.select(state.columns.map(col).toSeq: _*))
      .withColumn(keyCol, nonNullOrRaise(keyCol, "mergeVersioned"))
      .withColumn(opCol, nonNullOrRaise(opCol, "mergeVersioned"))
      .groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("__c"))
      .select(col(keyCol) +:
        ordered.map(c => col("__c").getField(c).as(c)): _*)
  }

  /** In-plan NULL contract guard: passes the column through untouched
    * when non-null, otherwise fails the job with a message naming the
    * offending column — a codegen'd per-row expression, so the check
    * costs no extra pass and runs distributed (a driver-side count
    * would scan the changelog twice). */
  private def nonNullOrRaise(c: String, fn: String): Column =
    when(col(c).isNull,
      raise_error(lit(s"$fn: NULL value in required column '$c'")))
      .otherwise(col(c))
}
