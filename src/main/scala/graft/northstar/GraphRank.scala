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
  * for EVERY node v with an out-edge — a node nobody links to stays at
  * the base teleport score and keeps feeding its neighbors, it does not
  * vanish from the ranking. Floor-division truncation loses mass
  * (bounded by 1 per in-edge per round — immaterial at scale 10¹²) but
  * is BIT-deterministic, which is the property an oracle-checked engine
  * needs.
  *
  * Scale shape: K rounds, each a join of the edge table against the
  * node-sized scores/out-degree frames plus one rollup exchange on dst.
  * Rounds are `persist`ed, NOT checkpointed: K is small and bounded so
  * plan depth is fine, and a cached relation KEEPS size statistics — so
  * Catalyst broadcasts the node-sized sides instead of sort-merge-
  * shuffling the edge table every round (the checkpointed variant loses
  * stats and measured ~2× slower end-to-end at sf0.1). The caches are
  * released by the harness's per-query `spark.catalog.clearCache()`
  * (Verify/Bench); a long-lived session embedding this API should clear
  * or unpersist likewise — K+1 node-sized relations ride per call.
  * Assumes every node has at least one out-edge (no dangling mass);
  * callers with directed graphs add back-edges or self-loops first.
  */
object GraphRank {

  /** Single-sourced defaults — the q93 DuckDB oracle and plan-audit
    * entry interpolate THESE, so engine and oracle cannot desynchronize.
    */
  val DefaultScale: Long = 1000000000000L
  val DefaultDamp: Int = 85

  /** `edges`: (src: long, dst: long) with an OPTIONAL `w` long column —
    * a weighted edge (src, dst, w) is exactly equivalent to w parallel
    * copies (each copy contributes the identical floor term, so
    * multiplying is bit-exact), at 1/w the per-round edge volume; callers
    * with heavy parallel-edge multiplicity should pre-aggregate to the
    * weighted form. Without `w`, duplicates still weight the walk (each
    * row counts once). Returns (node, score) after `iterations` rounds —
    * one row per node with an out-edge, including nodes that never
    * receive a link. The node count (the one driver scalar) comes free
    * off the out-degree aggregate's materialization — no separate
    * distinct pass.
    */
  def pageRank(edges: DataFrame, iterations: Int,
      scale: Long = DefaultScale, dampNum: Int = DefaultDamp,
      allNodesReceive: Boolean = false): DataFrame = {
    require(iterations >= 0 && dampNum >= 1 && dampNum <= 99)
    val weighted =
      if (edges.columns.contains("w")) edges
      else edges.withColumn("w", lit(1L))
    val outdeg = weighted.groupBy(col("src"))
      .agg(sum(col("w")).as("d")).persist()
    val nodeCount = outdeg.count()
    require(nodeCount > 0, "pageRank: empty graph")
    val base = ((100L - dampNum) * scale) / (100L * nodeCount)
    var scores = outdeg.select(col("src").as("node"),
      lit(scale / nodeCount).as("score"))
    for (_ <- 1 to iterations) {
      scores = round(weighted, outdeg, scores, base, dampNum,
        allNodesReceive).persist()
    }
    scores
  }

  /** One PageRank round as a lazy plan — the repeated unit [[pageRank]]
    * persists per iteration. Public so the plan audit can census the
    * per-round shape (the end-to-end query's final projection shows
    * little of it). By default the contributions are left-joined against
    * the out-degree node universe: zero-in-degree nodes stay alive at
    * the base score — an inner rollup would silently drop them AND lose
    * the mass they feed forward. `allNodesReceive = true` skips that
    * universe join (one fewer node-sized join per round) — ONLY valid
    * when the caller guarantees every node has an in-edge, e.g. a
    * structurally bidirectional edge table (a spec pins both paths equal
    * there).
    */
  def round(edges: DataFrame, outdeg: DataFrame, scores: DataFrame,
      base: Long, dampNum: Int,
      allNodesReceive: Boolean = false): DataFrame = {
    val weighted =
      if (edges.columns.contains("w")) edges
      else edges.withColumn("w", lit(1L))
    val contribs = weighted
      .join(scores, weighted("src") === scores("node"))
      .join(outdeg, "src")
      .select(col("dst"),
        expr(s"w * ((${dampNum}L * score) DIV (100L * d))").as("contrib"))
      .groupBy(col("dst"))
      .agg(sum(col("contrib")).as("contrib"))
    if (allNodesReceive)
      contribs.select(col("dst").as("node"),
        (lit(base) + col("contrib")).as("score"))
    else
      outdeg.select(col("src").as("node"))
        .join(contribs, col("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("contrib"), lit(0L))).as("score"))
  }
}
