package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.SeqPack

/** Greedy sequence-packing laws: budget respected (oversized docs as
  * singletons), order preserved, greedy tightness, bucket independence,
  * determinism, and the one-shuffle plan shape.
  */
class SeqPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** docs with EXACT token counts: id → "w w w ..." of n(id) tokens. */
  private def docsOf(ns: Seq[(Long, Int)]) =
    ns.toDF("doc_id", "n").select(col("doc_id"),
      when(col("n") > 0,
        concat_ws(" ", transform(sequence(lit(1), col("n")), _ => lit("w"))))
        .otherwise(lit("")).as("text"))

  test("budget respected: multi-doc sequences fit; only an oversized doc " +
      "packs alone over budget; empty docs join the current sequence") {
    val ns = Seq[(Long, Int)]((0L, 5), (1L, 3), (2L, 0), (3L, 9), (4L, 25),
      (5L, 2), (6L, 7), (7L, 1))
    val packed = SeqPack.packGreedy(docsOf(ns), "doc_id", "text",
      budget = 10, bucketSize = 100).collect()
    val byDoc = packed.map(p => p.doc_id -> p).toMap
    // greedy replay by hand (budget 10):
    // d0(5) seq0 fill5; d1(3) fill8; d2(0) fill8; d3(9) -> seq1 fill9;
    // d4(25, OVERSIZED) -> seq2; d5(2) -> seq3 (25+2>10) fill2;
    // d6(7) fill9; d7(1) fill10
    assert(byDoc(0L).seq == 0 && byDoc(1L).seq == 0 && byDoc(2L).seq == 0)
    assert(byDoc(3L).seq == 1)
    assert(byDoc(4L).seq == 2, "oversized doc must pack alone")
    assert(byDoc(5L).seq == 3 && byDoc(6L).seq == 3 && byDoc(7L).seq == 3)
    val census = SeqPack.sequenceCensus(
      SeqPack.packGreedy(docsOf(ns), "doc_id", "text", 10, 100))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // every multi-doc sequence fits the budget; only the singleton
    // oversized one exceeds it
    census.foreach { case (seq, nDocs, fill) =>
      if (nDocs > 1) assert(fill <= 10, s"seq $seq overfilled: $fill")
      else if (fill > 10) assert(nDocs == 1)
    }
  }

  test("greedy tightness and order: each next sequence's first doc would " +
      "NOT have fit in its predecessor; ids are contiguous per sequence") {
    val ns = (0L until 200L).map(i => (i, 1 + (i * 13 % 47).toInt))
    val packed = SeqPack.packGreedy(docsOf(ns), "doc_id", "text",
        budget = 64, bucketSize = 1000)
      .collect().sortBy(_.doc_id)
    val bySeq = packed.groupBy(_.seq).toSeq.sortBy(_._1)
    bySeq.sliding(2).foreach {
      case Seq((_, prev), (_, cur)) =>
        val prevFill = prev.map(_.n_tokens.toLong).sum
        assert(prevFill + cur.head.n_tokens > 64,
          s"seq ${cur.head.seq} split too early: $prevFill + ${cur.head.n_tokens}")
      case _ =>
    }
    // sequence ids are non-decreasing in doc order and id-contiguous
    assert(packed.map(_.seq).sliding(2).forall(s => s(0) <= s(1)))
    bySeq.foreach { case (_, ds) =>
      val ids = ds.map(_.doc_id).sorted
      assert(ids.last - ids.head + 1 == ids.length,
        "a sequence must hold a contiguous doc_id run")
    }
  }

  test("bucket independence: a bucket packs identically alone or within " +
      "the full corpus; determinism across repartitionings") {
    val ns = (0L until 300L).map(i => (i, 1 + (i * 7 % 31).toInt))
    val full = SeqPack.packGreedy(docsOf(ns), "doc_id", "text", 50, 64)
      .collect().map(p => (p.doc_id, p.bucket, p.seq)).toSet
    val bucket2Only = SeqPack.packGreedy(
        docsOf(ns.filter(t => t._1 / 64 == 2)), "doc_id", "text", 50, 64)
      .collect().map(p => (p.doc_id, p.bucket, p.seq)).toSet
    assert(bucket2Only === full.filter(_._2 == 2L))
    val reshuffled = SeqPack.packGreedy(docsOf(ns).repartition(13),
        "doc_id", "text", 50, 64)
      .collect().map(p => (p.doc_id, p.bucket, p.seq)).toSet
    assert(reshuffled === full)
  }

  test("grouped packing: sequences never cross groups, and each group " +
      "packs exactly as its subset would alone") {
    val ns = (0L until 200L).map(i => (i, 1 + (i * 7 % 31).toInt))
    val withGroup = docsOf(ns).withColumn("grp",
      when(col("doc_id") % 3 === 0, "train").otherwise("val"))
    val grouped = SeqPack.packGreedyGrouped(withGroup, "doc_id", "text",
        budget = 50, bucketSize = 64, groupCol = "grp")
      .collect().map(p => (p.group, p.bucket, p.seq, p.doc_id)).toSet
    // per-group parity with the ungrouped packer over the subset
    for (g <- Seq("train", "val")) {
      val subset = SeqPack.packGreedy(
          withGroup.filter(col("grp") === g), "doc_id", "text", 50, 64)
        .collect().map(p => (g, p.bucket, p.seq, p.doc_id)).toSet
      assert(grouped.filter(_._1 == g) === subset, s"group $g")
    }
  }

  test("census plans exactly two exchanges: the corpus bucket shuffle " +
      "and the sequence-sized rollup") {
    val ns = (0L until 100L).map(i => (i, 5))
    val plan = SeqPack.sequenceCensus(
      SeqPack.packGreedy(docsOf(ns), "doc_id", "text", 50, 64))
    val tree = plan.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val exchanges = tree.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // corpus data moves ONCE (the bucket key feeding the sorted-group
    // pack); the second exchange is the (bucket, seq) rollup over
    // already-aggregated sequence rows — the typed MapGroups boundary
    // erases partitioning info, so Spark cannot elide it, and it is
    // sequence-sized, not corpus-sized
    assert(exchanges.length == 2,
      s"expected bucket shuffle + rollup, got ${exchanges.length}:\n$tree")
    assert(exchanges.exists(_.toString.contains("MapGroups")),
      "the deep exchange must feed the sorted-group pack")
  }
}
