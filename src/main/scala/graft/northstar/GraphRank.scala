package graft.northstar

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in pure INTEGER arithmetic — graph-authority ranking of the
  * kind crawl/corpus-curation pipelines run (CommonCrawl publishes
  * centrality ranks; quality-weighted sampling consumes them), expressed
  * so a fixed iteration count is EXACTLY reproducible across engines:
  * every operation is 64-bit integer multiply / floor-divide / sum, so a
  * DuckDB oracle can replay the same K iterations and hash-match — no
  * floating-point drift, unlike textbook double-precision PageRank.
  *
  * Update rule (damping d = dampNum/100, score scale `scale`):
  *   s_0(v)     = scale DIV n
  *   s_{k+1}(v) = (100-dampNum)·scale DIV (100·n)
  *              + Σ_{u→v} (dampNum · s_k(u)) DIV (100 · outdeg(u))
  * Floor-division truncation loses mass (bounded by 1 per in-edge per
  * round — immaterial at scale 10¹²) but is BIT-deterministic, which is
  * the property an oracle-checked engine needs.
  *
  * Scale shape: one shuffle per iteration (join on src reuses the edge
  * partitioning; the groupBy(dst) is the exchange), K iterations total —
  * the same O(K) round structure as [[Dedup.connectedComponents]], with
  * the same eager `localCheckpoint` per round so the plan does not nest
  * K join-aggregates deep. Assumes every node has at least one out-edge
  * (no dangling mass); callers with directed graphs add back-edges or
  * self-loops first.
  */
object GraphRank {

  /** `edges`: (src: long, dst: long), duplicates meaningful (parallel
    * edges weight the walk). Returns (node, score) after `iterations`
    * rounds. The node count (the one driver scalar) comes free off the
    * out-degree aggregate's materialization — no separate distinct pass.
    */
  def pageRank(edges: DataFrame, iterations: Int,
      scale: Long = 1000000000000L, dampNum: Int = 85): DataFrame = {
    require(iterations >= 0 && dampNum >= 1 && dampNum <= 99)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .persist()
    val nodeCount = outdeg.count()
    require(nodeCount > 0, "pageRank: empty graph")
    val base = ((100L - dampNum) * scale) / (100L * nodeCount)
    var scores = outdeg.select(col("src").as("node"),
      lit(scale / nodeCount).as("score"))
    for (_ <- 1 to iterations) {
      // persist, not localCheckpoint: K is small and bounded, so plan
      // depth is fine, and the cached relation KEEPS size statistics —
      // Catalyst then broadcasts the node-sized scores/outdeg sides
      // instead of sort-merge-shuffling the edge table every round (a
      // checkpointed round loses its stats and pessimizes to SMJ; at
      // 6 rounds × sf0.1 that measured ~6× slower end-to-end)
      scores = round(edges, outdeg, scores, base, dampNum).persist()
    }
    scores
  }

  /** One PageRank round as a lazy plan — the repeated unit [[pageRank]]
    * checkpoints per iteration. Public so the plan audit can census the
    * per-round shape (the checkpointed end-to-end query shows none of
    * it).
    */
  def round(edges: DataFrame, outdeg: DataFrame, scores: DataFrame,
      base: Long, dampNum: Int): DataFrame =
    edges
      .join(scores, edges("src") === scores("node"))
      .join(outdeg, "src")
      .select(col("dst"),
        expr(s"(${dampNum}L * score) DIV (100L * d)").as("contrib"))
      .groupBy(col("dst"))
      .agg(sum(col("contrib")).as("contrib"))
      .select(col("dst").as("node"),
        (lit(base) + col("contrib")).as("score"))
}
