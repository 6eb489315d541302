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
    require(iters >= 1, "iters must be >= 1")
    require(dampNum > 0 && dampDen > dampNum, "need 0 < dampNum < dampDen")
    val e = edges.select(col(srcCol).cast("string").as("__src"),
      col(dstCol).cast("string").as("__dst")).persist()
    val nodes = e.select(col("__src").as("__node"))
      .unionAll(e.select(col("__dst").as("__node")))
      .distinct().localCheckpoint(false)
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(false)
    val base = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("__r", lit(scale)).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("__src") === ranks("__node"))
        .join(deg, Seq("__src"))
        .select(col("__dst"),
          expr(s"(__r * $dampNum) div ($dampDen * __deg)").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, nodes("__node") === contrib("__dst"), "left")
        .select(col("__node"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("__r"))
        .localCheckpoint(false)
    }
    e.unpersist(false)
    ranks.select(col("__node").as("node"), col("__r").as("rank"))
  }
}
