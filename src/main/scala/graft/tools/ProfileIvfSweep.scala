package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.northstar.{IvfIndex, Similarity}

/** Scratch sweep for the q112 dense arm (round-11 verdict item 7): the
  * dense-arm recall@k of the IVF probe vs the brute-force exact answer,
  * across (nlist, nprobe) — the recall / scan-fraction tradeoff curve
  * BASELINE.md records and the Accuracy q112 gate is pinned from.
  * Usage: runMain graft.tools.ProfileIvfSweep [sfDir]
  */
object ProfileIvfSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.read(spark, dir, "embeddings").cache()
    val n = emb.count()
    val probeIds = graft.queries.NorthStarQueries.DenseProbes
    val probes = emb.filter(col("vec_id").isin(probeIds.map(_._2): _*))
      .cache()
    probes.count()
    // both gate metrics: q112's recall@Bm25TopK and q50's recall@5
    val ks = Seq(5, graft.queries.NorthStarQueries.Bm25TopK).distinct
    val exact = ks.map { k =>
      k -> Similarity
        .bruteForceTopK(emb, probes, "vec_id", "embedding", k)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }.toMap
    println(s"[sweep] corpus $n vectors, ${probeIds.size} probes, " +
      s"k=${ks.mkString("/")}")
    for (nlist <- Seq(8, 16, 32)) {
      val idx = IvfIndex.build(emb, "vec_id", "embedding", nlist)
      for (nprobe <- 1 to nlist) {
        val rec = ks.map { k =>
          val got = idx.search(probes, "vec_id", "embedding", k, nprobe)
            .select("query_id", "neighbor_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          f"recall@$k=${(exact(k) & got).size.toDouble / exact(k).size}%.3f"
        }.mkString(" ")
        println(f"[sweep] nlist=$nlist%2d nprobe=$nprobe%2d " +
          f"scan=${nprobe.toDouble / nlist}%.3f $rec")
      }
    }
    spark.stop()
  }
}
