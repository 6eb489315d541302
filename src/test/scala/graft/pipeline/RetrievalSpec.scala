package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 top-k retrieval, k-means assignment, snapshot diff. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("bm25TopK ranks the matching doc first and breaks ties by id") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple apple apple"), // high tf but longer
      (3L, "banana cherry durian"),
      (4L, "elderberry fig grape"),
      (5L, "apple banana")             // both query terms, short
    ).toDF("doc_id", "text")
    val probes = Seq((100L, "apple banana")).toDF("query_id", "qtext")
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", probes,
        "query_id", "qtext", k = 3)
      .orderBy(col("rank"))
      .select("id", "rank").as[(Long, Int)].collect()
    assert(top.length == 3)
    // hand-computed: idf(apple)=idf(banana)=floorlog2(5 div 3)+1=1;
    // doc2 4000//54=74 > doc5 2000//52=38 > doc1 2000//53=37
    assert(top.map(_._1).toSeq == Seq(2L, 5L, 1L))
    // doc 4 shares no term: never retrieved
    assert(!top.map(_._1).contains(4L))
    // deterministic across reruns
    val again = Retrieval.bm25TopK(docs, "doc_id", "text", probes,
        "query_id", "qtext", k = 3)
      .orderBy(col("rank")).select("id", "rank").as[(Long, Int)].collect()
    assert(top.toSeq == again.toSeq)
  }

  test("bm25TopK length normalization: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "term " * 2 + "pad " * 50),
      (2L, "term " * 2 + "pad " * 2)
    ).map { case (i, t) => (i, t.trim) }.toDF("doc_id", "text")
    val probes = Seq((9L, "term")).toDF("query_id", "qtext")
    val r = Retrieval.bm25TopK(docs, "doc_id", "text", probes,
        "query_id", "qtext", k = 2)
      .orderBy(col("rank")).select("id").as[Long].collect()
    assert(r.toSeq == Seq(2L, 1L))
  }

  test("kmeansAssign puts every vector in its nearest centroid, ties to smaller cid") {
    val embs = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.9f, 0.9f)),
      (3L, Array(0.5f, 0.5f)) // exactly between → tie → smaller cid (10)
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (10L, Array(0.0f, 0.0f)),
      (20L, Array(1.0f, 1.0f))
    ).toDF("cid", "vec")
    val r = Retrieval.kmeansAssign(embs, "vec_id", "embedding",
        cents, "cid", "vec")
      .orderBy("vec_id")
      .select("vec_id", "cluster", "dist2").as[(Long, Long, Long)].collect()
    assert(r(0) == ((0L, 10L, 0L)))
    assert(r(1) == ((1L, 20L, 0L)))
    assert(r(2)._2 == 20L)
    assert(r(3)._2 == 10L) // tie at dist2 = 2*500^2 each side
    assert(r(3)._3 == 2L * 500L * 500L)
  }

  test("kmeansAssign rejects an empty centroid table") {
    val embs = Seq((0L, Array(0.0f))).toDF("vec_id", "embedding")
    val none = Seq.empty[(Long, Array[Float])].toDF("cid", "vec")
    assertThrows[IllegalArgumentException] {
      Retrieval.kmeansAssign(embs, "vec_id", "embedding", none, "cid", "vec")
    }
  }

  test("bm25TopK matches an independent in-memory scorer on random corpora") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 3) {
      val nDocs = 40 + rnd.nextInt(40)
      val vocab = (0 until 25).map(i => s"w$i")
      val docs = (0 until nDocs).map { i =>
        val len = 3 + rnd.nextInt(20)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val probes = (0 until 4).map { i =>
        (1000L + i, Seq.fill(2 + rnd.nextInt(3))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val k = 5
      // independent reference: plain-collections replay of the formula
      val tf = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty)
          .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
      }.toMap
      val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
        .map { case (w, a) => w -> a.size.toLong }
      def floorLog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val n = docs.size.toLong
      val expected = probes.flatMap { case (qid, qt) =>
        val qterms = qt.split("\\s+").filter(_.nonEmpty).distinct
        val scored = docs.flatMap { case (id, _) =>
          val num = qterms.map(t => tf(id).getOrElse(t, 0L) *
            (dfreq.get(t).map(d => floorLog2(n / d) + 1).getOrElse(0L))).sum
          if (qterms.exists(t => tf(id).contains(t)))
            Some((id, 1000L * num / (50L + tf(id).values.sum)))
          else None
        }
        scored.sortBy { case (id, s) => (-s, id) }.take(k)
          .zipWithIndex.map { case ((id, s), r) => (qid, id, s, r + 1) }
      }.toSet
      val got = Retrieval.bm25TopK(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          probes.toDF("query_id", "qtext"), "query_id", "qtext", k = k)
        .select("query_id", "id", "score", "rank")
        .as[(Long, Long, Long, Int)].collect()
        .map { case (q, i, s, r) => (q, i, s, r) }.toSet
      assert(got == expected, s"trial $trial: mismatch")
    }
  }

  test("mrrAtK: hits, misses, and beyond-k all counted correctly") {
    // top-k table: q1 hits its doc at rank 2, q2 at rank 1, q3's doc
    // only appears at rank 11 (beyond k), q4 absent entirely
    val topk = Seq(
      (1L, 10L, 1), (1L, 100L, 2), (2L, 200L, 1),
      (3L, 300L, 11), (4L, 40L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 400L))
      .toDF("query_id", "rel_doc")
    val out = Retrieval.mrrAtK(topk, "query_id", "doc_id", "rank",
        rel, "query_id", "rel_doc", k = 10)
      .as[(Long, Long, Long)].collect().head
    // 4 queries; hits: q1 rr=1/2, q2 rr=1; q3/q4 contribute 0
    assert(out == ((4L, 2L, 500000L + 1000000L)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val r = Retrieval.snapshotDiff(oldSnap, newSnap, "doc_id", Seq("text"))
      .orderBy("id").select("id", "status").as[(Long, String)].collect()
    assert(r.toSeq == Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("applyChangelog: latest-wins upsert/delete/resurrect/insert semantics") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("id", "v", "n")
    val chg = Seq(
      // id 2: two updates — the later one wins
      (2L, 1, 0, "U", "b1", 21L), (2L, 2, 0, "U", "b2", 22L),
      // id 3: deleted
      (3L, 1, 0, "D", "c", 30L),
      // id 4: delete then a LATER update — the row must resurrect
      (4L, 1, 0, "D", "d", 40L), (4L, 2, 0, "U", "d2", 42L),
      // id 9: insert of a key absent from the snapshot
      (9L, 1, 0, "I", "new", 90L),
      // id 5: same ts, seq breaks the tie — seq 1 wins
      (5L, 1, 0, "I", "x0", 50L), (5L, 1, 1, "U", "x1", 51L)
    ).toDF("id", "ts", "seq", "op", "v", "n")
    val out = Retrieval.applyChangelog(snap, chg, "id", "ts", "seq", "op")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "b2", 22L), (4L, "d2", 42L),
      (5L, "x1", 51L), (9L, "new", 90L)))
    // a changelog missing a payload column fails fast NAMING it
    val e = intercept[IllegalArgumentException] {
      Retrieval.applyChangelog(snap,
        chg.drop("n"), "id", "ts", "seq", "op")
    }
    assert(e.getMessage.contains("n"))
  }

  test("mergeVersioned is split-invariant: any batch order converges, tombstones hold") {
    val rnd = new scala.util.Random(61)
    // random versioned history over 30 keys (ts unique per key via the
    // version index; ~1/4 deletes), initial state = empty-version rows
    val state0 = (1L to 30L).map(k => (k, 0, 0, "I", s"v$k", k * 10))
      .toDF("id", "ts", "seq", "op", "v", "n")
    val history = (1L to 30L).flatMap { k =>
      (1 to 1 + rnd.nextInt(5)).map { ver =>
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (k, ver, 0, op, s"v$k-$ver", k * 100 + ver)
      }
    }
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq
    val oneShot = Retrieval.mergeVersioned(state0,
      history.toDF("id", "ts", "seq", "op", "v", "n"),
      "id", "ts", "seq", "op")
    // shuffle the history, split into random batches, fold
    val shuffled = rnd.shuffle(history)
    var acc = state0
    var rest = shuffled
    while (rest.nonEmpty) {
      val b = 1 + rnd.nextInt(20)
      acc = Retrieval.mergeVersioned(acc,
        rest.take(b).toDF("id", "ts", "seq", "op", "v", "n"),
        "id", "ts", "seq", "op").localCheckpoint(true)
      rest = rest.drop(b)
    }
    assert(norm(acc) == norm(oneShot))
    // tombstone guard across batches: delete at ts 2, then an OLDER
    // update arrives in a later batch — the row must stay deleted
    val s1 = Retrieval.mergeVersioned(state0.where(col("id") === 1),
      Seq((1L, 2, 0, "D", "x", 0L)).toDF("id", "ts", "seq", "op", "v", "n"),
      "id", "ts", "seq", "op")
    val s2 = Retrieval.mergeVersioned(s1,
      Seq((1L, 1, 0, "U", "old", 1L)).toDF("id", "ts", "seq", "op", "v", "n"),
      "id", "ts", "seq", "op")
    assert(s2.where(col("op") =!= "D").count() == 0)
    // a plain snapshot (no version columns) as state fails fast with a
    // named-column message, not a deep unresolved-column error
    val e = intercept[IllegalArgumentException] {
      Retrieval.mergeVersioned(
        Seq((1L, "x")).toDF("id", "v"),
        Seq((1L, 1, 0, "U", "x")).toDF("id", "ts", "seq", "op", "v"),
        "id", "ts", "seq", "op")
    }
    assert(e.getMessage.contains("state is missing"))
  }

  test("applyChangelog / mergeVersioned: NULL key or op fails naming the column") {
    // a NULL op would otherwise SILENTLY count as a delete (=!= "D"
    // null-filters the upsert branch) and a NULL key both survives the
    // left_anti and unions back in — the in-plan guard must fail the
    // job with the column name instead
    def allMsgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${allMsgs(t.getCause)}"
    val snap = Seq((1L, "a")).toDF("id", "v")
    val nullKey = Seq((Option.empty[Long], 1, 0, "U", "x"),
      (Some(1L), 1, 0, "U", "y")).toDF("id", "ts", "seq", "op", "v")
    val e1 = intercept[Throwable] {
      Retrieval.applyChangelog(snap, nullKey, "id", "ts", "seq", "op").collect()
    }
    assert(allMsgs(e1).contains("applyChangelog") && allMsgs(e1).contains("'id'"))
    val nullOp = Seq((1L, 1, 0, Option.empty[String], "x"))
      .toDF("id", "ts", "seq", "op", "v")
    val e2 = intercept[Throwable] {
      Retrieval.applyChangelog(snap, nullOp, "id", "ts", "seq", "op").collect()
    }
    assert(allMsgs(e2).contains("'op'"))
    val state = Seq((1L, 0, 0, "I", "a")).toDF("id", "ts", "seq", "op", "v")
    val e3 = intercept[Throwable] {
      Retrieval.mergeVersioned(state, nullOp, "id", "ts", "seq", "op").collect()
    }
    assert(allMsgs(e3).contains("mergeVersioned") && allMsgs(e3).contains("'op'"))
    // non-null changelogs still pass through the guard untouched
    val ok = Retrieval.applyChangelog(snap,
      Seq((1L, 1, 0, "U", "z")).toDF("id", "ts", "seq", "op", "v"),
      "id", "ts", "seq", "op").orderBy("id").as[(Long, String)].collect()
    assert(ok.toSeq == Seq((1L, "z")))
  }
}
