package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.GraphRank

/** Integer PageRank against hand-computed iterations and its invariants. */
class GraphRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    import spark.implicits._
    GraphRank.pageRank(edges.toDF("src", "dst"), iters, scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a symmetric 2-cycle is a fixed point: each node keeps scale/2") {
    val edges = Seq((1L, 2L), (2L, 1L))
    for (k <- 0 to 3)
      assert(rank(edges, k, 1000000000000L) ===
        Map(1L -> 500000000000L, 2L -> 500000000000L), s"iteration $k")
  }

  test("hand-computed star graph at scale 300: two exact iterations") {
    // 1↔2 and 1↔3; outdeg 1:2, 2:1, 3:1; base = 15·300/(100·3) = 15
    // iter1: s(1)=15+85+85=185, s(2)=s(3)=15+(85·100)//200=57
    // iter2: s(1)=15+2·((85·57)//100)=111, s(2)=s(3)=15+(85·185)//200=93
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
    assert(rank(edges, 1, 300L) === Map(1L -> 185L, 2L -> 57L, 3L -> 57L))
    assert(rank(edges, 2, 300L) === Map(1L -> 111L, 2L -> 93L, 3L -> 93L))
  }

  test("zero-in-degree nodes stay at base and keep feeding neighbors") {
    // node 1 links out but nobody links to it: it must stay in the
    // ranking at the base teleport score and its mass must reach node 2
    // every round — an inner rollup would drop it after round 1
    // n=3, scale 300, base 15; outdeg all 1; s0 = 100 each
    // iter1: s(1)=15, s(2)=15+85[from 1]+85[from 3]=185, s(3)=15+85=100
    // iter2: s(1)=15, s(2)=15+(85·15)//100+(85·100)//100=12+85+15=112,
    //        s(3)=15+(85·185)//100=15+157=172
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L))
    assert(rank(edges, 1, 300L) === Map(1L -> 15L, 2L -> 185L, 3L -> 100L))
    assert(rank(edges, 2, 300L) === Map(1L -> 15L, 2L -> 112L, 3L -> 172L))
  }

  test("mass is conserved up to floor loss: total in (scale - edges, scale]") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 2L),
      (2L, 1L))
    val scores = rank(edges, 5, 1000000000000L)
    val total = scores.values.sum
    assert(total <= 1000000000000L)
    // each in-edge loses < 1 unit per round to truncation, plus the base
    // division's < 100·n units
    assert(total > 1000000000000L - 5L * (edges.size + 300))
  }

  test("allNodesReceive fast path equals the universe-join path on a " +
      "bidirectional graph") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L))
    val slow = rank(edges, 3, 1000000000000L)
    val fast = GraphRank.pageRank(edges.toDF("src", "dst"), 3,
        1000000000000L, allNodesReceive = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slow === fast)
  }

  test("a weighted edge is bit-exactly its parallel-copy expansion") {
    import spark.implicits._
    val expanded = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L),
      (3L, 1L), (3L, 1L))
    val weighted = expanded.groupBy(identity).map { case (e, xs) =>
      (e._1, e._2, xs.size.toLong)
    }.toSeq
    val a = rank(expanded, 3, 1000000000000L)
    val b = GraphRank.pageRank(weighted.toDF("src", "dst", "w"), 3,
        1000000000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("coPartition pageRank equals the broadcast-regime result with " +
      "broadcast disabled") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(v =>
      Seq((v, v % 40 + 1), (v % 40 + 1, v), (v, (v * 7) % 40 + 1),
        ((v * 7) % 40 + 1, v)))
    val default = rank(edges, 3, 1000000000000L)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val co = GraphRank.pageRank(edges.toDF("src", "dst"), 3,
          1000000000000L, coPartition = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(co === default)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.catalog.clearCache()
    }
  }

  test("co-partitioned round is exchange-free on the edge side with no " +
      "broadcast: one rollup shuffle, no broadcast join") {
    // the big-node regime: scores exceed any broadcast budget (forced via
    // threshold -1). Build the loop state exactly as pageRank lays it
    // out — edges hash-partitioned on src ONCE, degrees folded in, scores
    // landing hash-partitioned from their rollup — and prove the round
    // plan moves no edge data: the ONLY exchange is the contribution
    // rollup, and no broadcast join appears anywhere.
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // pageRank's loop conf
    try {
      val edges0 = (1L to 200L).flatMap(v => Seq((v, v % 200 + 1),
        (v % 200 + 1, v))).toDF("src", "dst").withColumn("w", lit(1L))
      val weighted = edges0.repartition(col("src")).persist()
      val outdeg = weighted.groupBy(col("src")).agg(sum(col("w")).as("d"))
        .repartition(col("src")).persist()
      outdeg.count()
      val edgesDeg = weighted.join(outdeg, "src").persist()
      val s0 = outdeg.select(col("src").as("node"), lit(100L).as("score"))
      val r1 = GraphRank.round(edgesDeg, outdeg, s0, 1L, 85,
        allNodesReceive = true, coPartition = true).persist()
      r1.count()
      val r2 = GraphRank.round(edgesDeg, outdeg, r1, 1L, 85,
        allNodesReceive = true, coPartition = true)
      // collect over the EXECUTED tree: InMemoryTableScan is a leaf, so
      // exchanges recorded inside the already-materialized cache build
      // plans (rendered by toString) are correctly out of scope — only
      // what THIS round would actually run counts
      val tree = r2.queryExecution.executedPlan
      val bcasts = tree.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      assert(bcasts.isEmpty, s"no-broadcast round must not broadcast:\n$tree")
      val exchanges = tree.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.length === 1,
        s"round must shuffle ONLY the rollup (1 exchange), got " +
          s"${exchanges.length}:\n$tree")
      // and that one exchange is the node-sized ROLLUP, not edge data:
      // its child is the partial aggregate over dst
      assert(exchanges.head.child.toString.contains("HashAggregate"),
        s"the single exchange must be the contribution rollup:\n$tree")
      assert(r2.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.catalog.clearCache()
    }
  }

  test("more in-links rank higher: a hub out-scores leaves") {
    // leaves 2..5 all link to 1 and back
    val edges = (2L to 5L).flatMap(v => Seq((v, 1L), (1L, v)))
    val scores = rank(edges, 4, 1000000000000L)
    assert((2L to 5L).forall(v => scores(1L) > scores(v)))
    assert((2L to 5L).map(scores).distinct.size === 1) // symmetric leaves
  }

  test("iterations = 0 returns the uniform initial scores as the ONE " +
      "surviving cached relation — edge/degree caches are released " +
      "(ADVICE: the 0-iteration branch leaked outdeg/edgesDeg)") {
    import spark.implicits._
    spark.catalog.clearCache()
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val scores = GraphRank.pageRank(edges, iterations = 0, scale = 300L)
    val got = scores.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 100L, 2L -> 100L, 3L -> 100L))
    assert(!org.apache.spark.sql.GraftBridge.cacheIsEmpty(spark),
      "the returned scores are the one documented surviving cache")
    scores.unpersist(blocking = true)
    assert(org.apache.spark.sql.GraftBridge.cacheIsEmpty(spark),
      "no edge/degree cache may outlive the call")
  }

  test("iterations > 0 keeps the same one-surviving-cache contract") {
    import spark.implicits._
    spark.catalog.clearCache()
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val scores = GraphRank.pageRank(edges, iterations = 3, scale = 300L)
    scores.collect()
    scores.unpersist(blocking = true)
    assert(org.apache.spark.sql.GraftBridge.cacheIsEmpty(spark))
  }
}
