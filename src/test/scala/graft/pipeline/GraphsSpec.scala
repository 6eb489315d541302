package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  /** Plain single-threaded replay of the scaled-integer formula —
    * an implementation with no Spark machinery to disagree with. */
  private def refRanks(edges: Seq[(String, String)], iters: Int,
                       scale: Long = 1000000000L, num: Long = 17L,
                       den: Long = 20L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * (den - num) / den
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => (r(s) * num) / (den * deg(s)) }.sum
      }
      r = nodes.map(n => n -> (base + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("integer pagerank matches the single-threaded reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 120).map { _ =>
      (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}")
    }.distinct.filter(e => e._1 != e._2)
    for (iters <- Seq(1, 5)) {
      val got = Graphs.pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters)
        .as[(String, Long)].collect().toMap
      assert(got == refRanks(edges, iters), s"iters $iters")
    }
  }

  test("pagerank ranks a hub above leaves and conserves the dangling-free total") {
    // star + cycle: c0 -> c1 -> c2 -> c0 plus leaves l1,l2 -> c0
    val edges = Seq(("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
      ("l1", "c0"), ("l2", "c0")).toDF("src", "dst")
    val r = Graphs.pageRankInt(edges, "src", "dst", iters = 10)
      .as[(String, Long)].collect().toMap
    // leaves get only the base mass; cycle nodes accumulate flow
    assert(r("l1") == r("l2"))
    assert(r("c0") > r("c1") && r("c1") > r("c2") && r("c2") > r("l1"))
  }

  /** Single-threaded replay of the integer L∞-normalized HITS rounds. */
  private def refHits(edges: Seq[(String, String)], iters: Int,
                      scale: Long = 100000L): Map[String, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> scale).toMap
    var a = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val araw = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => h(e._1)).sum }
      val am = math.max(if (araw.isEmpty) 0L else araw.values.max, 1L)
      a = nodes.map(n => n -> araw.getOrElse(n, 0L) * scale / am).toMap
      val hraw = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => a(e._2)).sum }
      val hm = math.max(if (hraw.isEmpty) 0L else hraw.values.max, 1L)
      h = nodes.map(n => n -> hraw.getOrElse(n, 0L) * scale / hm).toMap
    }
    nodes.map(n => n -> ((h(n), a(n)))).toMap
  }

  test("integer HITS matches the single-threaded reference; hubs/authorities separate") {
    val rnd = new scala.util.Random(23)
    val rand = (0 until 150).map { _ =>
      (s"n${rnd.nextInt(14)}", s"n${rnd.nextInt(14)}")
    }.distinct.filter(e => e._1 != e._2)
    for (iters <- Seq(1, 3)) {
      val got = Graphs.hitsInt(rand.toDF("src", "dst"), "src", "dst", iters)
        .as[(String, Long, Long)].collect()
        .map { case (n, hb, au) => n -> ((hb, au)) }.toMap
      assert(got == refHits(rand, iters), s"iters $iters")
    }
    // a pure directory page (links out to every content page, no
    // in-links) must be the top hub with zero authority, and vice versa
    val star = (1 to 5).map(i => ("dir", s"content$i"))
    val g = Graphs.hitsInt(star.toDF("src", "dst"), "src", "dst", iters = 3)
      .as[(String, Long, Long)].collect()
      .map { case (n, hb, au) => n -> ((hb, au)) }.toMap
    assert(g("dir") == ((100000L, 0L)))
    assert((1 to 5).forall(i => g(s"content$i") == ((0L, 100000L))))
  }

  /** Brute-force per-node triangle counts over unordered node triples. */
  private def refTriangles(edges: Seq[(String, String)]): Map[String, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: String, b: String) =
      und(if (a < b) (a, b) else (b, a))
    val counts = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if adj(x, y) && adj(y, z) && adj(x, z)
    } Seq(x, y, z).foreach(n => counts(n) += 1)
    counts.toMap
  }

  test("triangle counts: K4 gives 3 per node; a path gives 0") {
    val k4 = (for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)).toDF("src", "dst")
    val got = Graphs.triangleCounts(k4, "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))

    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got2 = Graphs.triangleCounts(path, "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got2.values.forall(_ == 0L) && got2.size == 4)
  }

  test("triangle counts match brute force on a random graph, duplicates/reversals ignored") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 150).map { _ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}")
    }
    // feed raw directed multi-edges: orientation/distinct must canonicalize
    val got = Graphs.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == refTriangles(edges))
  }

  test("triangle counts: a hub with many leaves adds no triangles (orientation sanity)") {
    val hub = (1 to 40).map(i => ("hub", s"leaf$i")) ++
      Seq(("hub", "t1"), ("hub", "t2"), ("t1", "t2"))
    val got = Graphs.triangleCounts(hub.toDF("src", "dst"), "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got("hub") == 1L && got("t1") == 1L && got("t2") == 1L)
    assert(got("leaf7") == 0L)
  }

  /** Single-threaded peel reference for k-core. */
  private def refKCore(edges: Seq[(String, String)], k: Int): Map[String, Int] = {
    var adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val bad = adj.filter(_._2.size < k).keySet
      changed = bad.nonEmpty
      adj = adj.collect { case (n, ns) if !bad(n) => n -> (ns -- bad) }
    }
    adj.map { case (n, ns) => n -> ns.size }
  }

  test("k-core: triangle survives k=2, dangling chain cascades one node per round") {
    // triangle {a,b,c} + chain c-d-e-f: d,e,f peel in cascade
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("c", "d"), ("d", "e"), ("e", "f"))
    val got = Graphs.kCore(edges.toDF("src", "dst"), "src", "dst", k = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // the same graph has an empty 3-core
    assert(Graphs.kCore(edges.toDF("src", "dst"), "src", "dst", k = 3).isEmpty)
  }

  test("k-core matches the single-threaded peel on random graphs, self-loops/duplicates ignored") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val edges = (0 until 80 * trial).map { _ =>
        (s"n${rnd.nextInt(10 * trial)}", s"n${rnd.nextInt(10 * trial)}")
      }
      for (k <- Seq(2, 3)) {
        val got = Graphs.kCore(edges.toDF("src", "dst"), "src", "dst", k)
          .as[(String, Long)].collect().toMap
        assert(got == refKCore(edges, k).map { case (n, d) => n -> d.toLong },
          s"trial $trial k $k")
      }
    }
  }

  /** Single-threaded level BFS over a directed edge list. */
  private def refBfs(edges: Seq[(String, String)], seeds: Seq[String],
                     maxHops: Int, directed: Boolean = true): Map[String, Long] = {
    val adj = (if (directed) edges else edges ++ edges.map(_.swap))
      .distinct.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct
    for (h <- 1 to maxHops if frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil)).distinct
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  /** Single-threaded replay of the seed-restart integer formula. */
  private def refPprRanks(edges: Seq[(String, String)], seeds: Set[String],
                          iters: Int, scale: Long = 1000000000L,
                          num: Long = 17L, den: Long = 20L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * (den - num) / den
    var r = nodes.map(n => n -> (if (seeds(n)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => (r(s) * num) / (den * deg(s)) }.sum
      }
      r = nodes.map(n =>
        n -> ((if (seeds(n)) base else 0L) + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("personalized pagerank matches the single-threaded reference; unreachable nodes stay at hard zero") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 120).map { _ =>
      (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}")
    }.distinct.filter(e => e._1 != e._2)
    for (iters <- Seq(1, 5)) {
      val got = Graphs.pageRankPersonalizedInt(edges.toDF("src", "dst"),
        "src", "dst", Seq("n0", "n3").toDF("s"), "s", iters)
        .as[(String, Long)].collect().toMap
      assert(got == refPprRanks(edges, Set("n0", "n3"), iters), s"iters $iters")
    }
    // an island with no inbound path from the seed holds exactly 0
    val island = Seq(("a", "b"), ("b", "a"), ("x", "y"), ("y", "x"))
    val r = Graphs.pageRankPersonalizedInt(island.toDF("src", "dst"),
      "src", "dst", Seq("a").toDF("s"), "s", iters = 6)
      .as[(String, Long)].collect().toMap
    assert(r("x") == 0L && r("y") == 0L && r("a") > 0L && r("b") > 0L)
  }

  /** Single-threaded hop-bounded Bellman-Ford. */
  private def refMinCost(edges: Seq[(String, String, Long)], seeds: Seq[String],
                         maxHops: Int): Map[String, Long] = {
    var dist = seeds.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to maxHops) {
      val relaxed = edges.flatMap { case (s, t, w) =>
        dist.get(s).map(c => t -> (c + w))
      }.groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).min }
      dist = (dist.keySet ++ relaxed.keySet).map { n =>
        n -> math.min(dist.getOrElse(n, Long.MaxValue),
          relaxed.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    dist
  }

  test("minCostHops: cheaper two-hop path beats the direct edge; hop bound forces the expensive edge") {
    // a -> b (1), b -> c (1), a -> c (10): two hops cost 2, one hop 10
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 10L))
    val got = Graphs.minCostHops(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      Seq("a").toDF("n"), "n", maxHops = 5).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val oneHop = Graphs.minCostHops(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      Seq("a").toDF("n"), "n", maxHops = 1).as[(String, Long)].collect().toMap
    assert(oneHop == Map("a" -> 0L, "b" -> 1L, "c" -> 10L))
  }

  test("minCostHops matches the single-threaded Bellman-Ford on random weighted graphs, negative weights included") {
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 4) {
      // trial 4 draws weights from [-10, 19]: the hop bound keeps the
      // result well-defined under negative weights (the documented
      // contract) — a '<' vs '<=' improvement-test regression or a
      // premature early exit would surface here
      val edges = (0 until 150).map { _ =>
        val w = if (trial == 4) rnd.nextInt(30).toLong - 10
                else rnd.nextInt(30).toLong
        (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}", w)
      }
      val seeds = Seq(s"n${rnd.nextInt(20)}")
      for (maxHops <- Seq(0, 3, 9)) {
        val got = Graphs.minCostHops(edges.toDF("src", "dst", "w"),
          "src", "dst", "w", seeds.toDF("n"), "n", maxHops)
          .as[(String, Long)].collect().toMap
        assert(got == refMinCost(edges, seeds, maxHops),
          s"trial $trial maxHops $maxHops")
      }
    }
  }

  test("bfs hops: path + shortcut takes the shortcut; maxHops truncates; seed is 0") {
    // a -> b -> c -> d -> e, plus shortcut a -> d
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "d"))
    val got = Graphs.bfsHops(edges.toDF("src", "dst"), "src", "dst",
      Seq("a").toDF("n"), "n", maxHops = 10).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 1L, "e" -> 2L))
    // truncation: only the 1-hop ball survives maxHops = 1
    val trunc = Graphs.bfsHops(edges.toDF("src", "dst"), "src", "dst",
      Seq("a").toDF("n"), "n", maxHops = 1).as[(String, Long)].collect().toMap
    assert(trunc == Map("a" -> 0L, "b" -> 1L, "d" -> 1L))
    // a seed absent from the graph still reports distance 0
    val lone = Graphs.bfsHops(edges.toDF("src", "dst"), "src", "dst",
      Seq("zz").toDF("n"), "n", maxHops = 3).as[(String, Long)].collect().toMap
    assert(lone == Map("zz" -> 0L))
  }

  test("bfs hops match the single-threaded reference on random graphs, both directions") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3; directed <- Seq(true, false)) {
      val edges = (0 until 150).map { _ =>
        (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")
      }
      val seeds = Seq(s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")
      for (maxHops <- Seq(0, 2, 8)) {
        val got = Graphs.bfsHops(edges.toDF("src", "dst"), "src", "dst",
          seeds.toDF("n"), "n", maxHops, directed).as[(String, Long)]
          .collect().toMap
        assert(got == refBfs(edges, seeds, maxHops, directed),
          s"trial $trial directed $directed maxHops $maxHops")
      }
    }
  }
}
