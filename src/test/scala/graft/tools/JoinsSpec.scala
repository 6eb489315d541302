package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("asofBackward: latest at-or-before match, exact ts allowed, null before first") {
    val quotes = Seq(
      ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
      ("b", 15L, 9.0)
    ).toDF("k", "ts", "px")
    val trades = Seq(
      ("a", 5L, 100L),   // before any quote -> null
      ("a", 20L, 101L),  // exact match -> 2.0
      ("a", 25L, 102L),  // between -> 2.0
      ("a", 99L, 103L),  // after all -> 3.0
      ("b", 15L, 104L),  // exact -> 9.0
      ("c", 50L, 105L)   // key with no quotes -> null
    ).toDF("k", "ts", "tid")
    val out = Joins.asofBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .select(col("tid"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1)))
      .toMap
    assert(out(100L).isNaN && out(105L).isNaN)
    assert(out(101L) == 2.0 && out(102L) == 2.0 && out(103L) == 3.0 && out(104L) == 9.0)
    assert(out.size == 6) // every left row survives (left-join semantics)
  }

  test("asofBackward matches a brute-force oracle on random data") {
    val rnd = new scala.util.Random(7)
    val right = (0 until 300).map(_ =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100000).toLong))
      .distinct.map { case (k, ts, v) => (k, ts, v) }
    val left = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val rdf = right.toDF("k", "ts", "v")
      // de-dup (k,ts) so "latest" is unique and the oracle is well-defined
      .groupBy("k", "ts").agg(max("v").as("v"))
    val ldf = left.toDF("lid", "k", "ts")
    val got = Joins.asofBackward(ldf, rdf, Seq("k"), "ts", "ts", Seq("v"))
      .select(col("lid"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val rightKeyed = rdf.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    left.foreach { case (lid, k, ts) =>
      val expect = rightKeyed.getOrElse(k, Array.empty[(Long, Long, Long)])
        .filter(_._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      assert(got(lid) == expect, s"lid=$lid k=$k ts=$ts")
    }
  }

  test("asof carries the matched row ATOMICALLY: genuine nulls survive") {
    // the matched right row has a null in one carried column; a
    // per-column carry would tear the row (a=1 from ts=10, b=3 from
    // ts=20) — the struct carry must return exactly (null, 3)
    val quotes = Seq(
      ("k", 10L, Some(1.0), Some(2.0)),
      ("k", 20L, None, Some(3.0))
    ).toDF("k", "ts", "a", "b")
    val trades = Seq(("k", 25L, 1L)).toDF("k", "ts", "tid")
    val r = Joins.asofBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("a", "b"))
      .select("a", "b").collect().head
    assert(r.isNullAt(0) && r.getDouble(1) == 3.0,
      s"torn or stale carry: $r")
  }

  test("asof treats null timestamps as unmatchable on both sides") {
    val quotes = Seq(
      ("k", Some(5L), 1.0),    // real quote
      ("k", None, 99.0)        // null-ts right row: never matchable
    ).toDF("k", "ts", "px")
    val trades = Seq(
      ("k", Some(10L), 1L),    // matches the ts=5 quote
      ("k", Some(1L), 2L),     // before any real quote -> null (NOT 99.0)
      ("k", None, 3L)          // null-ts left row -> null match
    ).toDF("k", "ts", "tid")
    def run(fwd: Boolean) = (if (fwd)
        Joins.asofForward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      else Joins.asofBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("px")))
      .select(col("tid"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val bwd = run(false)
    assert(bwd(1L) == Some(1.0) && bwd(2L) == None && bwd(3L) == None, s"bwd $bwd")
    val fwd = run(true)
    assert(fwd(1L) == None && fwd(2L) == Some(1.0) && fwd(3L) == None, s"fwd $fwd")
  }

  test("asof tolerance nulls too-far matches, never substitutes a farther row") {
    val quotes = Seq(
      ("a", 10L, 1.0), ("a", 100L, 2.0)
    ).toDF("k", "ts", "px")
    val trades = Seq(
      ("a", 12L, 1L),   // gap 2 <= 5 -> 1.0
      ("a", 40L, 2L),   // nearest prior is ts=10, gap 30 > 5 -> null
                        // (NOT the farther-but-within-nothing ts=100)
      ("a", 104L, 3L)   // gap 4 -> 2.0
    ).toDF("k", "ts", "tid")
    val bwd = Joins.asofBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        tolerance = 5L)
      .select(col("tid"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(bwd == Map(1L -> Some(1.0), 2L -> None, 3L -> Some(2.0)), s"$bwd")
    val fwd = Joins.asofForward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        tolerance = 5L)
      .select(col("tid"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // forward: tid=1 next quote ts=100 gap 88 -> null; tid=2 gap 60 -> null;
    // tid=3 has no later quote -> null... use a case with a near match
    assert(fwd(1L) == None && fwd(2L) == None && fwd(3L) == None, s"$fwd")
    val fwd2 = Joins.asofForward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        tolerance = 90L)
      .select(col("tid"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(fwd2 == Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> None), s"$fwd2")
  }

  test("asofNearest: closer side wins, backward wins ties, tolerance applies per side") {
    val quotes = Seq(
      ("a", 10L, 1.0), ("a", 30L, 2.0)
    ).toDF("k", "ts", "px")
    val trades = Seq(
      ("a", 12L, 1L),  // gaps 2 back / 18 fwd -> 1.0
      ("a", 28L, 2L),  // gaps 18 back / 2 fwd -> 2.0
      ("a", 20L, 3L),  // equal gaps 10/10 -> backward 1.0
      ("a", 5L, 4L),   // before all -> forward 1.0
      ("b", 9L, 5L)    // no quotes for key -> null
    ).toDF("k", "ts", "tid")
    def run(tol: Long) =
      Joins.asofNearest(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
          tolerance = tol)
        .select(col("tid"), col("px")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    val free = run(-1L)
    assert(free == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(1.0),
      4L -> Some(1.0), 5L -> None), s"$free")
    // tolerance 6: tid=3's both gaps (10) exceed it -> null; tid=4 gap 5 ok
    val tight = run(6L)
    assert(tight == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None,
      4L -> Some(1.0), 5L -> None), s"$tight")
  }

  test("asofNearest matches a brute-force oracle on random data") {
    val rnd = new scala.util.Random(43)
    val right = (0 until 300).map(_ =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
    val left = (0 until 400).map(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toLong))
    val r = right.toDF("k", "ts", "px")
    val l = left.toDF("k", "ts", "tid")
    val got = Joins.asofNearest(l, r, Seq("k"), "ts", "ts", Seq("px"),
        tieBreak = "px")
      .select(col("tid"), col("px")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    left.foreach { case (k, ts, tid) =>
      val back = right.filter(q => q._1 == k && q._2 <= ts)
        .sortBy(q => (q._2, q._3)).lastOption
      val fwd = right.filter(q => q._1 == k && q._2 >= ts)
        .sortBy(q => (-q._2, -q._3)).lastOption
      val expect = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (ts - b._2 <= f._2 - ts) Some(b._3) else Some(f._3)
        case (Some(b), None) => Some(b._3)
        case (None, Some(f)) => Some(f._3)
        case _ => None
      }
      assert(got(tid) == expect, s"tid=$tid k=$k ts=$ts: ${got(tid)} != $expect")
    }
  }

  test("asofForward matches a brute-force oracle on random data") {
    val rnd = new scala.util.Random(19)
    val right = (0 until 300).map(_ =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100000).toLong))
    val left = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val rdf = right.toDF("k", "ts", "v").groupBy("k", "ts").agg(max("v").as("v"))
    val ldf = left.toDF("lid", "k", "ts")
    val got = Joins.asofForward(ldf, rdf, Seq("k"), "ts", "ts", Seq("v"))
      .select(col("lid"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val rightKeyed = rdf.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    left.foreach { case (lid, k, ts) =>
      val expect = rightKeyed.getOrElse(k, Array.empty[(Long, Long, Long)])
        .filter(_._2 >= ts).sortBy(_._2).headOption.map(_._3)
      assert(got(lid) == expect, s"lid=$lid k=$k ts=$ts")
    }
  }

  test("intervalOverlapJoin equals the naive overlap join, each pair once") {
    val rnd = new scala.util.Random(23)
    val a = (0 until 200).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 15)
    }.toDF("aid", "alo", "ahi")
    val b = (0 until 60).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 8)
    }.toDF("bid", "blo", "bhi")
    val gotAll = Joins.intervalOverlapJoin(a, b, "alo", "ahi", "blo", "bhi",
        binSize = 10.0)
      .select("aid", "bid").as[(Long, Long)].collect()
    val got = gotAll.toSet
    assert(gotAll.length == got.size, "a pair was emitted more than once")
    val expect = a.join(b, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("rangeJoin equals the naive BETWEEN join on random intervals") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("pid", "v")
    val ivs = (0 until 40).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }.toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binSize = 8.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val expect = pts.join(ivs, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("rangeJoin survives intervals narrower and wider than the bin") {
    val pts = Seq((1L, 0.0), (2L, 7.999), (3L, 8.0), (4L, 40.0)).toDF("pid", "v")
    val ivs = Seq((1L, 7.9, 8.1), (2L, 0.0, 40.0)).toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binSize = 8.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (4L, 2L)))
  }

  test("editDistancePairs finds typos, exact dups, and nothing else") {
    val rows = Seq(
      (1L, "acme corporation"),
      (2L, "acme corporatiom"), // 1 substitution from 1
      (3L, "acme corporation"), // exact dup of 1
      (4L, "acme inc"),
      (5L, "zebra")
    ).toDF("id", "s")
    val got = Joins.editDistancePairs(rows, "id", "s", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 0), (2L, 3L, 1)))
  }

  test("editDistancePairs matches brute force, including the short-string branch") {
    val rnd = new scala.util.Random(31)
    val alpha = "ab"
    // lengths 1..8 over a 2-letter alphabet: dense near-pairs, and
    // lengths 1-3 exercise the both-short length-band path at q=2, d=1
    val rows = (0L until 60L).map { i =>
      val len = 1 + rnd.nextInt(8)
      (i, Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("id", "s")
    val a = rows.select(col("id").as("id_a"), col("s").as("sa"))
    val b = rows.select(col("id").as("id_b"), col("s").as("sb"))
    for (d <- Seq(1, 2); rare <- Seq(true, false)) {
      val brute = a.crossJoin(b).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), levenshtein(col("sa"), col("sb")).as("dist"))
        .where(col("dist") <= d)
        .as[(Long, Long, Int)].collect().toSet
      val fast = Joins.editDistancePairs(rows, "id", "s", maxDist = d, rareFirst = rare)
        .as[(Long, Long, Int)].collect().toSet
      assert(fast == brute, s"maxDist $d rareFirst $rare: ${fast.size} vs brute ${brute.size}")
    }
  }

  test("editDistancePairs short-branch salting: planted hot length bucket, output invariant") {
    val rnd = new scala.util.Random(37)
    val alpha = "abcd"
    // planted HOT BUCKET: 250 length-3 strings (every one a short-branch
    // row at q=2, d=1, all landing on the same few length keys) plus a
    // sprinkle of longer strings so both branches run
    val rows = ((0L until 250L).map { i =>
      (i, Seq.fill(3)(alpha(rnd.nextInt(alpha.length))).mkString)
    } ++ (250L until 280L).map { i =>
      (i, Seq.fill(6 + rnd.nextInt(4))(alpha(rnd.nextInt(alpha.length))).mkString)
    }).toDF("id", "s")
    val a = rows.select(col("id").as("id_a"), col("s").as("sa"))
    val b = rows.select(col("id").as("id_b"), col("s").as("sb"))
    val brute = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).as("dist"))
      .where(col("dist") <= 1)
      .as[(Long, Long, Int)].collect().toSet
    // the salt must not change results at ANY factor (1 = unsalted)
    for (salt <- Seq(1, 8, 13)) {
      val got = Joins.editDistancePairs(rows, "id", "s", maxDist = 1,
          shortSalt = salt)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute, s"shortSalt=$salt: ${got.size} vs ${brute.size}")
    }
    intercept[IllegalArgumentException] {
      Joins.editDistancePairs(rows, "id", "s", shortSalt = 0)
    }
  }

  test("saltedJoin == plain inner join, skewed fact key included") {
    // fact: key 0 is hot (200 rows), keys 1..9 sparse; dim unique keys
    val fact = ((0 until 200).map(i => (0L, i.toLong)) ++
      (1 to 9).map(k => (k.toLong, 1000L + k))).toDF("k", "rid")
    val dim = (0L until 10L).map(k => (k, s"label$k")).toDF("k", "label")
    val got = Salted.saltedJoin(fact, dim, "k", saltFromCol = "rid", salts = 4)
      .select("k", "rid", "label").as[(Long, Long, String)].collect().toSet
    val want = fact.join(dim, "k")
      .select("k", "rid", "label").as[(Long, Long, String)].collect().toSet
    assert(got == want && got.size == 209)
  }
}
