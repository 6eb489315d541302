package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph operators for web-corpus curation: PageRank-style host
 * authority is a standard pretraining quality weight (crawl frontier
 * scoring, domain mixing). Iterative DataFrame algorithms follow the
 * same discipline as the connected-components family in [[Dedup]]:
 * one keyed shuffle per round, localCheckpoint per round so the plan
 * never compounds, bounded rounds.
 */
object Graphs {

  /**
   * PageRank with ALL arithmetic in scaled integers — every engine
   * that replays the formula gets bit-identical ranks (integer sums
   * are order-independent, unlike the usual floating-point PageRank
   * whose Σ depends on reduction order), so the result is
   * differential-oracle-checkable.
   *
   * Per iteration, in exact Long arithmetic:
   *   rank'(v) = base + Σ_{u→v} (rank(u) · dampNum) div (dampDen · outdeg(u))
   * with base = scale · (dampDen − dampNum) div dampDen — the integer
   * analog of r' = (1−d) + d·Σ r/deg at d = dampNum/dampDen (0.85 by
   * default). Truncation loses < 1 unit per in-edge per round — at
   * scale = 1e9 a relative error < 1e-6 per edge, irrelevant for
   * ranking, decisive for cross-engine parity. Dangling mass (nodes
   * with no out-edges) is dropped, the common simplification; the
   * oracle replays the same formula so parity is unconditional.
   *
   * Plan shape (scales to any graph that fits a cluster):
   *   - edges persisted once, reused every round (src-keyed join +
   *     dst-keyed aggregate = the two shuffles per round),
   *   - ranks localCheckpoint'd per round: plan size stays O(1) in
   *     iterations (persist alone does NOT truncate the logical plan
   *     — the connected-components lesson),
   *   - iteration count is fixed (power iteration converges
   *     geometrically; 5-20 rounds is the practical web-graph range).
   *
   * Returns (node, rank) with rank in scaled units; Σ ranks <=
   * nNodes · scale. Self-loops and parallel edges are honored as
   * given — dedup/filter upstream if unwanted.
   */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 5, scale: Long = 1000000000L,
                  dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    validateRankArgs(iters, dampNum, dampDen)
    val e = stageEdges(edges, srcCol, dstCol)
    val nodes = e.select(col("__src").as("__node"))
      .unionAll(e.select(col("__dst").as("__node")))
      .distinct().withColumn("__s", lit(1L)).localCheckpoint(false)
    val out = pageRankCore(e, nodes, iters, scale, dampNum, dampDen)
    e.unpersist(false)
    out
  }

  private def stageEdges(edges: DataFrame, srcCol: String,
                         dstCol: String): DataFrame =
    edges.select(col(srcCol).cast("string").as("__src"),
      col(dstCol).cast("string").as("__dst")).persist()

  /** Validated BEFORE stageEdges persists anything — a require that
    * fires after the persist would leak a CacheManager entry on every
    * invalid call. */
  private def validateRankArgs(iters: Int, dampNum: Long,
                               dampDen: Long): Unit = {
    require(iters >= 1, "iters must be >= 1")
    require(dampNum > 0 && dampDen > dampNum, "need 0 < dampNum < dampDen")
  }

  /** Shared power-iteration core: `nodes` carries (__node, __s) where
    * the indicator __s gates BOTH the initial mass (r0 = __s·scale)
    * and the per-round restart base (__s·base) — an all-ones indicator
    * reproduces uniform PageRank bit-for-bit, a seed indicator gives
    * the personalized variant. One place holds the iteration
    * discipline (two keyed shuffles per round, localCheckpoint so the
    * plan stays O(1) in rounds). */
  private def pageRankCore(e: DataFrame, nodes: DataFrame, iters: Int,
                           scale: Long, dampNum: Long,
                           dampDen: Long): DataFrame = {
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(false)
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.select(col("__node"), (col("__s") * scale).as("__r"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("__src") === ranks("__node"))
        .join(deg, Seq("__src"))
        .select(col("__dst"),
          expr(s"(__r * $dampNum) div ($dampDen * __deg)").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, nodes("__node") === contrib("__dst"), "left")
        .select(col("__node"),
          (col("__s") * base + coalesce(col("__in"), lit(0L))).as("__r"))
        .localCheckpoint(false)
    }
    ranks.select(col("__node").as("node"), col("__r").as("rank"))
  }

  /**
   * PERSONALIZED PageRank (seed-restart) with the same all-integer
   * staging as [[pageRankInt]] — authority RELATIVE to a trusted seed
   * set, i.e. TrustRank proper: the restart mass returns to the seeds
   * every round instead of spreading uniformly, so pages rank by how
   * reachable they are from trust, and spam islands with no inbound
   * path from the seeds stay at exactly 0 (integer arithmetic makes
   * "no trust" a hard zero, not a small float).
   *
   * Per iteration, in exact Long arithmetic:
   *   rank'(v) = [v ∈ seeds]·base + Σ_{u→v} (rank(u)·dampNum) div (dampDen·outdeg(u))
   * with rank₀(v) = [v ∈ seeds]·scale and base as in [[pageRankInt]].
   * Seeds outside the graph's node set are ignored (they have no edges
   * to carry mass). Same plan discipline: edges persisted once, two
   * keyed shuffles per round, localCheckpoint'd ranks, fixed rounds;
   * the seed indicator is joined onto the node table ONCE and reused
   * every round. Returns (node, rank) in scaled units.
   */
  def pageRankPersonalizedInt(edges: DataFrame, srcCol: String, dstCol: String,
                              seeds: DataFrame, seedCol: String,
                              iters: Int = 5, scale: Long = 1000000000L,
                              dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    validateRankArgs(iters, dampNum, dampDen)
    val e = stageEdges(edges, srcCol, dstCol)
    val seedSet = seeds.select(col(seedCol).cast("string").as("__node"))
      .where(col("__node").isNotNull).distinct()
    val nodes = e.select(col("__src").as("__node"))
      .unionAll(e.select(col("__dst").as("__node")))
      .distinct()
      .join(seedSet.withColumn("__s", lit(1L)), Seq("__node"), "left")
      .select(col("__node"), coalesce(col("__s"), lit(0L)).as("__s"))
      .localCheckpoint(false)
    val out = pageRankCore(e, nodes, iters, scale, dampNum, dampDen)
    e.unpersist(false)
    out
  }

  /**
   * HITS hubs & authorities with ALL arithmetic in scaled Longs — the
   * directory-page vs content-page separation PageRank's single score
   * blurs (a links-out-to-good-content hub ranks low in PageRank but
   * high in hub score). Like [[pageRankInt]], integer staging makes
   * every engine that replays the formula agree bit-for-bit.
   *
   * Per round, in exact Long arithmetic (all values in [0, scale]):
   *   a_raw(v) = Σ_{u→v} h(u);  a(v) = a_raw(v)·scale div max(a_raw)
   *   h_raw(u) = Σ_{u→v} a(v);  h(u) = h_raw(u)·scale div max(h_raw)
   * — max-normalization (L∞) instead of the classical L2: a global max
   * is a 1-row broadcast, stays in integers, and preserves the ranking
   * fixpoint structure. Overflow contract: scale²·max-degree < 2⁶³,
   * i.e. max in/out-degree ≤ ~9·10⁸ at the default scale 10⁵ — lower
   * the scale, not the graph, for hub-ier graphs (rank resolution is
   * 1/scale of the max score).
   *
   * Plan shape: two keyed join+aggregate shuffles per round plus two
   * 1-row max broadcasts; ranks localCheckpoint'd per round (O(1) plan
   * size in iterations — the iterative-DataFrame discipline).
   * Returns (node, hub, authority).
   */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
              iters: Int = 3, scale: Long = 100000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(srcCol).cast("string").as("__src"),
      col(dstCol).cast("string").as("__dst")).persist()
    val nodes = e.select(col("__src").as("__node"))
      .unionAll(e.select(col("__dst").as("__node")))
      .distinct().localCheckpoint(false)
    var h = nodes.withColumn("__h", lit(scale)).localCheckpoint(false)
    var a = nodes.withColumn("__a", lit(0L))
    for (_ <- 1 to iters) {
      val araw = e.join(h, e("__src") === h("__node"))
        .groupBy(col("__dst")).agg(sum(col("__h")).as("__ar"))
      val amax = araw.agg(greatest(max(col("__ar")), lit(1L)).as("__am"))
      a = nodes.join(araw, nodes("__node") === araw("__dst"), "left")
        .crossJoin(amax) // 1-row: Catalyst broadcasts
        .select(col("__node"),
          expr(s"coalesce(__ar, CAST(0 AS BIGINT)) * ${scale}L div __am").as("__a"))
        .localCheckpoint(false)
      val hraw = e.join(a, e("__dst") === a("__node"))
        .groupBy(col("__src")).agg(sum(col("__a")).as("__hr"))
      val hmax = hraw.agg(greatest(max(col("__hr")), lit(1L)).as("__hm"))
      h = nodes.join(hraw, nodes("__node") === hraw("__src"), "left")
        .crossJoin(hmax)
        .select(col("__node"),
          expr(s"coalesce(__hr, CAST(0 AS BIGINT)) * ${scale}L div __hm").as("__h"))
        .localCheckpoint(false)
    }
    val out = h.join(a, "__node")
      .select(col("__node").as("node"), col("__h").as("hub"),
        col("__a").as("authority"))
    e.unpersist(false)
    out
  }

  /**
   * k-core extraction over an undirected graph: iteratively peel every
   * node whose (induced) degree is < k until a fixpoint — the standard
   * link-spam / crawl-frontier density filter (a k-core survives only
   * where every member keeps >= k neighbors INSIDE the core, so thin
   * chains, trees and dangling tails cascade away no matter how big).
   *
   * Plan shape per round: one degree aggregate over the symmetric edge
   * list + two key-partitioned semi-join filters (both endpoints must
   * survive) — no broadcast assumptions, hub-safe (a hub's degree is
   * one aggregate row). The surviving edge set is localCheckpoint'd
   * per round (O(1) plan size in rounds — the iterative-DataFrame
   * discipline), and each round's only driver traffic is the single
   * removed-node count that decides termination. Round count is the
   * peel depth of the graph (the longest removal cascade); each round
   * strictly shrinks the edge set, so the loop always terminates.
   *
   * Returns (node, deg) for every node of the k-core with its induced
   * degree — empty when the whole graph peels away. Self-loops are
   * dropped (a self-loop is not a neighbor); parallel edges are
   * deduped so degree = distinct-neighbor count.
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val raw = edges.select(col(srcCol).cast("string").as("__s"),
      col(dstCol).cast("string").as("__t"))
    val und = raw.select(least(col("__s"), col("__t")).as("__u"),
        greatest(col("__s"), col("__t")).as("__v"))
      .where(col("__u") =!= col("__v")).distinct()
    var sym = und.select(col("__u"), col("__v"))
      .unionAll(und.select(col("__v").as("__u"), col("__u").as("__v")))
      .localCheckpoint(false)
    var done = false
    var round = 0
    while (!done) {
      round += 1
      val deg = sym.groupBy(col("__u")).agg(count(lit(1)).as("__d"))
      val bad = deg.where(col("__d") < k).select(col("__u").as("__bad"))
        .localCheckpoint(false) // reused by the probe and both filters
      // fixpoint probe every SECOND round (r18, guide §1.2): the count
      // is the loop's only per-round driver action — skipping it on
      // even rounds halves the sequential job chain on deep peel
      // cascades (each unprobed round's work folds into the next
      // probe's job; the lazy checkpoints still truncate lineage).
      // Filtering with an EMPTY bad set is the identity, so at worst
      // one no-op round runs past the fixpoint — the result is
      // byte-identical either way, and the loop still terminates
      // because the probe fires every other round.
      if (round % 2 == 1 && bad.count() == 0L) done = true
      else {
        sym = sym
          .join(bad, sym("__u") === bad("__bad"), "left_anti")
          .join(bad, sym("__v") === bad("__bad"), "left_anti")
          .localCheckpoint(false)
      }
    }
    sym.groupBy(col("__u")).agg(count(lit(1)).as("deg"))
      .select(col("__u").as("node"), col("deg"))
  }

  /**
   * Multi-source BFS hop distances: min-hop distance from a seed set to
   * every node reachable within `maxHops` — the link-distance feature a
   * crawl-frontier scorer keys on (distance from the trusted-seed set
   * is the classic TrustRank-style spam prior), and the generic
   * "k-hop neighborhood" primitive.
   *
   * Level-synchronous frontier expansion, the scalable BFS shape: each
   * round joins ONLY the current frontier (not the visited set) against
   * the edge list, then anti-joins the visited set — two key-partitioned
   * shuffles per round, no broadcast assumptions, hub fan-out handled by
   * the join's hash partitioning (AQE-skew-splittable). The visited set
   * and frontier are localCheckpoint'd per round (O(1) plan size in
   * rounds — the iterative-DataFrame discipline shared by the whole
   * module), and each round's only driver traffic is the one-bit
   * frontier-emptiness probe that allows early exit. Hop counts are
   * exact integers, so any engine replaying the expansion agrees
   * bit-for-bit (the differential-oracle property).
   *
   * Seeds are distance 0 BY DEFINITION — a seed absent from the edge
   * list still appears with hops = 0. Returns (node, hops) for every
   * node whose min distance is <= maxHops; unreachable nodes are
   * absent (a distributed frame can't enumerate "the rest of the
   * graph" cheaper than the caller's own node list — left-join this
   * result against it for an infinity-padded table).
   */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int,
              directed: Boolean = true): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val fwd = edges.select(col(srcCol).cast("string").as("__src"),
        col(dstCol).cast("string").as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
    val adj = (if (directed) fwd
               else fwd.unionAll(fwd.select(col("__dst").as("__src"),
                 col("__src").as("__dst"))))
      .distinct().persist()
    var dist = seeds.select(col(seedCol).cast("string").as("__node"))
      .where(col("__node").isNotNull).distinct()
      .withColumn("__h", lit(0L)).localCheckpoint(false)
    var frontier = dist
    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      val next = frontier.join(adj, frontier("__node") === adj("__src"))
        .select(adj("__dst").as("__node")).distinct()
        .join(dist, Seq("__node"), "left_anti")
        .withColumn("__h", lit(hop.toLong))
        .localCheckpoint(false) // reused by the probe, the union, and next round
      // emptiness probe every SECOND hop (r18, guide §1.2): the probe
      // is the loop's only per-round driver action; expanding an EMPTY
      // frontier yields an empty next and unioning it is the identity,
      // so a skipped probe costs at most one no-op round while halving
      // the sequential job chain (maxHops still bounds the loop).
      if (hop % 2 == 1 && next.isEmpty) exhausted = true
      else {
        dist = dist.unionAll(next).localCheckpoint(false)
        frontier = next
      }
      hop += 1
    }
    adj.unpersist(false)
    dist.select(col("__node").as("node"), col("__h").as("hops"))
  }

  /**
   * Hop-bounded CHEAPEST-PATH costs (weighted BFS / delta-frontier
   * Bellman-Ford): the minimum total integer edge weight from a seed
   * set to every node reachable within `maxHops` edges — link distance
   * with per-edge cost (crawl politeness budgets, weighted trust
   * propagation), [[bfsHops]]'s weighted generalization.
   *
   * Per round, only the FRONTIER (nodes whose cost improved last
   * round) relaxes its out-edges — the delta optimization that keeps a
   * settled graph quiet; a min-aggregate collapses parallel candidates
   * map-side, and a left join against the running table keeps strict
   * improvements. After k rounds the table holds the exact minimum
   * over paths of <= k edges (the Bellman-Ford invariant, preserved by
   * the frontier form), so the hop bound makes the result well-defined
   * even with negative weights — no negative-cycle divergence inside a
   * bounded horizon. All integer arithmetic: any engine replaying the
   * relaxation agrees bit-for-bit.
   *
   * Plan shape per round: one keyed join + one min aggregate + one
   * left-join diff — key-partitioned shuffles only, localCheckpoint
   * discipline, early exit when a round improves nothing. Returns
   * (node, cost); unreachable nodes are absent, seeds cost 0.
   */
  def minCostHops(edges: DataFrame, srcCol: String, dstCol: String,
                  weightCol: String, seeds: DataFrame, seedCol: String,
                  maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.select(col(srcCol).cast("string").as("__src"),
        col(dstCol).cast("string").as("__dst"),
        col(weightCol).cast("long").as("__w"))
      .where(col("__src").isNotNull && col("__dst").isNotNull &&
        col("__w").isNotNull)
      .persist()
    var dist = seeds.select(col(seedCol).cast("string").as("__node"))
      .where(col("__node").isNotNull).distinct()
      .withColumn("__c", lit(0L)).localCheckpoint(false)
    var frontier = dist
    var hop = 1
    var settled = false
    while (hop <= maxHops && !settled) {
      val cand = frontier.join(e, frontier("__node") === e("__src"))
        .select(e("__dst").as("__node"),
          (frontier("__c") + e("__w")).as("__cand"))
        .groupBy(col("__node")).agg(min(col("__cand")).as("__cand"))
      val improved = cand.join(dist, Seq("__node"), "left")
        .where(col("__c").isNull || col("__cand") < col("__c"))
        .select(col("__node"), col("__cand").as("__c"))
        .localCheckpoint(false) // reused by the probe, the diff, and next round
      // settledness probe every SECOND hop (r18, guide §1.2): same
      // argument as bfsHops — relaxing from an EMPTY frontier improves
      // nothing, and diffing/unioning an empty improved set is the
      // identity, so a skipped probe costs at most one no-op round
      // while halving the sequential job chain (maxHops still bounds).
      if (hop % 2 == 1 && improved.isEmpty) settled = true
      else {
        dist = dist.join(improved, Seq("__node"), "left_anti")
          .unionAll(improved).localCheckpoint(false)
        frontier = improved
      }
      hop += 1
    }
    e.unpersist(false)
    dist.select(col("__node").as("node"), col("__c").as("cost"))
  }

  /**
   * Per-node triangle counts over an undirected graph (the clustering
   * signal a link-graph quality model keys on: spam farms are
   * triangle-dense, organic link neighborhoods are sparse).
   *
   * Degree-ordered node-iterator: every edge is oriented from its
   * lower-(degree, id) endpoint to the higher one, wedges are built at
   * the orientation's source, and a wedge closes iff its two heads are
   * themselves a directed edge — each triangle is found exactly once,
   * at its minimum-order vertex. The orientation is the scale story:
   * out-degree under degree ordering is bounded by O(√m) on any graph
   * (arboricity bound), so a celebrity hub with 10⁸ followers
   * contributes wedges from its LOW-degree neighbors' tiny out-lists,
   * never 10¹⁶ hub wedges — the plain node-iterator would die there.
   *
   * Plan shape: one distinct + degree aggregate, two src-keyed
   * hash-join shuffles for the wedge build, one (x, y)-keyed closing
   * join, one final count — all key-partitioned joins over (node,
   * node) pairs, no broadcast assumptions, AQE-skew-splittable.
   * Returns (node, triangles) for every node of the graph, zeros
   * included.
   */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("string").as("__s"),
      col(dstCol).cast("string").as("__t"))
    // canonical undirected edge set (self-loops can't be in a triangle)
    val und = raw.select(least(col("__s"), col("__t")).as("__u"),
        greatest(col("__s"), col("__t")).as("__v"))
      .where(col("__u") =!= col("__v"))
      .distinct().persist()
    val nodes = und.select(col("__u").as("__n"))
      .unionAll(und.select(col("__v").as("__n"))).distinct()
    val deg = und.select(col("__u").as("__n"))
      .unionAll(und.select(col("__v").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    // orient each edge low-(degree, id) -> high
    val dirE = und
      .join(deg.select(col("__n").as("__u"), col("__d").as("__du")), "__u")
      .join(deg.select(col("__n").as("__v"), col("__d").as("__dv")), "__v")
      .select(when(col("__du") < col("__dv") ||
            (col("__du") === col("__dv") && col("__u") < col("__v")),
          struct(col("__u").as("a"), col("__v").as("b")))
        .otherwise(struct(col("__v").as("a"), col("__u").as("b"))).as("__e"))
      .select(col("__e.a").as("__a"), col("__e.b").as("__b"))
      .persist()
    // wedges at the orientation source; the closing edge's direction is
    // determined by the total order, so each triangle matches exactly once
    val e1 = dirE.select(col("__a"), col("__b").as("__x"))
    val e2 = dirE.select(col("__a"), col("__b").as("__y"))
    val tri = e1.join(e2, "__a").where(col("__x") =!= col("__y"))
      .join(dirE.select(col("__a").as("__x"), col("__b").as("__y")),
        Seq("__x", "__y"))
    val perNode = tri
      .select(explode(array(col("__a"), col("__x"), col("__y"))).as("__n"))
      .groupBy(col("__n")).agg(count(lit(1)).as("__c"))
    val out = nodes.join(perNode, Seq("__n"), "left")
      .select(col("__n").as("node"),
        coalesce(col("__c"), lit(0L)).as("triangles"))
    out
  }
}
