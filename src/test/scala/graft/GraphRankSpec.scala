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

  test("more in-links rank higher: a hub out-scores leaves") {
    // leaves 2..5 all link to 1 and back
    val edges = (2L to 5L).flatMap(v => Seq((v, 1L), (1L, v)))
    val scores = rank(edges, 4, 1000000000000L)
    assert((2L to 5L).forall(v => scores(1L) > scores(v)))
    assert((2L to 5L).map(scores).distinct.size === 1) // symmetric leaves
  }
}
