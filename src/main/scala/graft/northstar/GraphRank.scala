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
  *              + Σ_{u→v} w_{u,v} · (dampNum · s_k(u)) DIV (100·outdeg(u))
  * for EVERY node v with an out-edge — a node nobody links to stays at
  * the base teleport score and keeps feeding its neighbors, it does not
  * vanish from the ranking. Floor-division truncation loses mass
  * (bounded by 1 per in-edge per round — immaterial at scale 10¹²) but
  * is BIT-deterministic, which is the property an oracle-checked engine
  * needs.
  *
  * Scale shape: out-degrees are STATIC across rounds, so they are folded
  * into the cached edge relation ONCE — (src, dst, w, d) — and each
  * round is exactly one join of that relation against the scores plus
  * the rollup exchange on `dst`. The edge table never moves after its
  * one-time materialization. Two regimes:
  *
  *  - node-sized scores below the broadcast threshold (the default):
  *    rounds broadcast the cached scores against the cached edges —
  *    zero edge movement, one rollup shuffle per round.
  *  - `coPartition = true` (the big-node regime, where scores exceed any
  *    broadcast budget): the edges are hash-partitioned on `src` ONCE at
  *    materialization; each round's scores land hash-partitioned on the
  *    same key count from their rollup, so the per-round join is
  *    exchange-free on the edge side regardless of node count — what
  *    survives a 100× node scale-up (ScaleSpec proves the no-broadcast
  *    plan shape).
  *
  * The iteration loop runs EAGERLY (each round materialized before the
  * next is planned), which permits two measured micro-costs to be
  * scoped: adaptive execution is disabled for the loop's small fixed
  * per-round jobs (AQE's per-stage re-planning added ~25% end-to-end on
  * the q93 corpus; the plans here are static by construction), and the
  * rollup exchange can be right-sized to the NODE count via
  * `roundPartitions` (a node-sized aggregate does not need a
  * fact-table-sized reducer count; callers scale it with their graph).
  * Both session confs are restored before returning.
  *
  * Cache discipline: each round is materialized eagerly and the PREVIOUS
  * round is unpersisted as soon as its successor exists — exactly ONE
  * node-sized cached relation (the returned final scores) outlives the
  * call, released by `result.unpersist()` (or a harness `clearCache()`).
  * The edge/degree caches are released before returning. Assumes every
  * node has at least one out-edge (no dangling mass); callers with
  * directed graphs add back-edges or self-loops first.
  */
object GraphRank {

  /** Single-sourced defaults — the q93 DuckDB oracle and plan-audit
    * entry interpolate THESE, so engine and oracle cannot desynchronize.
    */
  val DefaultScale: Long = 1000000000000L
  val DefaultDamp: Int = 85

  /** Normalize to the weighted form: a weighted edge (src, dst, w) is
    * exactly equivalent to w parallel copies (each copy contributes the
    * identical floor term), at 1/w the per-round edge volume. Without
    * `w`, duplicates still weight the walk (each row counts once).
    * Callers with heavy parallel-edge multiplicity should pre-aggregate
    * to the weighted form.
    */
  private def weightedEdges(edges: DataFrame): DataFrame =
    if (edges.columns.contains("w")) edges
    else edges.withColumn("w", lit(1L))

  /** `edges`: (src: long, dst: long) with an OPTIONAL `w` long column
    * (see [[weightedEdges]]). Returns (node, score) after `iterations`
    * rounds — one row per node with an out-edge, including nodes that
    * never receive a link. The node count (the one driver scalar) comes
    * free off the out-degree aggregate's materialization — no separate
    * distinct pass. The returned frame is the ONE cached relation that
    * outlives the call (see the cache discipline above).
    */
  def pageRank(edges: DataFrame, iterations: Int,
      scale: Long = DefaultScale, dampNum: Int = DefaultDamp,
      allNodesReceive: Boolean = false,
      coPartition: Boolean = false,
      roundPartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 0 && dampNum >= 1 && dampNum <= 99)
    val spark = edges.sparkSession
    val AqeKey = "spark.sql.adaptive.enabled"
    val PartKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(AqeKey)
    val prevParts = spark.conf.get(PartKey)
    spark.conf.set(AqeKey, "false")
    roundPartitions.foreach(p => spark.conf.set(PartKey, p.toString))
    try {
      val weighted = weightedEdges(edges)
      val laid =
        if (coPartition) weighted.repartition(col("src")) else weighted
      val weightedP = laid.persist()
      val outdeg0 = weightedP.groupBy(col("src")).agg(sum(col("w")).as("d"))
      val outdeg =
        (if (coPartition) outdeg0.repartition(col("src")) else outdeg0)
          .persist()
      // one job: pulls the edge build through its cache and the degree
      // rollup through its own, and yields the node-count scalar
      val nodeCount = outdeg.count()
      require(nodeCount > 0, "pageRank: empty graph")
      // fold the static degrees into the edge relation once — rounds then
      // carry ONE join each instead of edges ⋈ scores ⋈ outdeg
      val edgesDeg = weightedP.join(outdeg, "src").persist()
      val base = ((100L - dampNum) * scale) / (100L * nodeCount)
      var scores = outdeg.select(col("src").as("node"),
        lit(scale / nodeCount).as("score"))
      var prevCached: Option[DataFrame] = None
      for (k <- 1 to iterations) {
        val next = round(edgesDeg, outdeg, scores, base, dampNum,
          allNodesReceive, coPartition).persist()
        next.count() // materialize so the predecessor can be released NOW
        if (k == 1) weightedP.unpersist(blocking = false) // folded now
        prevCached.foreach(_.unpersist(blocking = false))
        prevCached = Some(next)
        scores = next
      }
      // the final scores are materialized — the static inputs can go; a
      // post-eviction lineage recompute falls back to source, the normal
      // cache contract. The iterations == 0 branch materializes the
      // initial scores itself first: without that, the returned frame
      // would lean on outdeg's lineage and releasing edgesDeg/outdeg here
      // would leave THREE cached relations behind (contradicting the
      // one-surviving-cache contract above) or an uncached result.
      if (iterations == 0) {
        scores = scores.persist()
        scores.count()
      }
      weightedP.unpersist(blocking = false) // no-op after round 1 released it
      edgesDeg.unpersist(blocking = false)
      outdeg.unpersist(blocking = false)
      scores
    } finally {
      spark.conf.set(AqeKey, prevAqe)
      spark.conf.set(PartKey, prevParts)
    }
  }

  /** One PageRank round as a lazy plan — the repeated unit [[pageRank]]
    * materializes per iteration: one join of the degree-folded edge
    * relation (src, dst, w, d) against the scores, then the rollup
    * exchange on `dst`. Public so the plan audit can census the
    * per-round shape (the end-to-end query's final projection shows
    * little of it).
    *
    * By default the contributions are left-joined against the out-degree
    * node universe: zero-in-degree nodes stay alive at the base score —
    * an inner rollup would silently drop them AND lose the mass they
    * feed forward. `allNodesReceive = true` skips that universe join
    * (one fewer node-sized join per round) — ONLY valid when the caller
    * guarantees every node has an in-edge, e.g. a structurally
    * bidirectional edge table (a spec pins both paths equal there).
    *
    * `edgesWithDeg` may carry the folded degree column `d`; when absent
    * (a raw (src, dst[, w]) table), the degree join is added here —
    * the audit entry and spec callers pass raw edges.
    */
  def round(edgesWithDeg: DataFrame, outdeg: DataFrame, scores: DataFrame,
      base: Long, dampNum: Int,
      allNodesReceive: Boolean = false,
      coPartition: Boolean = false): DataFrame = {
    val weighted = weightedEdges(edgesWithDeg)
    val folded =
      if (weighted.columns.contains("d")) weighted
      else weighted.join(outdeg, "src")
    val contribs0 = folded
      .join(scores, folded("src") === scores("node"))
      .select(col("dst"),
        expr(s"w * ((${dampNum}L * score) DIV (100L * d))").as("contrib"))
      .groupBy(col("dst"))
      .agg(sum(col("contrib")).as("contrib"))
    // pin the rollup's output layout in the co-partitioned regime when
    // AQE could coalesce it (which would force a scores-side exchange
    // next round); under pageRank's AQE-off loop the aggregate already
    // lands hash(dst, n) deterministically and the pin would be a
    // redundant node-sized exchange
    val aqeOn = edgesWithDeg.sparkSession.conf
      .get("spark.sql.adaptive.enabled").toBoolean
    val contribs =
      if (coPartition && aqeOn) contribs0.repartition(col("dst"))
      else contribs0
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
