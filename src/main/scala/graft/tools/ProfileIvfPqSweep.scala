package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.northstar.{IvfPqIndex, Similarity}

/** Scratch sweep for the CODED q112 serving arm (round-12 verdict item
  * 5): dense-arm recall@k of the IVFADC probe vs the brute-force exact
  * answer, across (nlist, m, nprobe, rerank) — the recall / scan-fraction
  * curve BASELINE.md records and the Accuracy q112 gate is re-pinned
  * from when the serving index moves from uncompressed IVF to
  * residual-coded IVFPQ. ksub is held at 16 (the q81/q82 codebook
  * budget: 4-bit codes, the sf0.01 tier has only 500 vectors to train
  * on, so 256-way sub-codebooks would memorize the corpus).
  * Usage: runMain graft.tools.ProfileIvfPqSweep [sfDir]
  */
object ProfileIvfPqSweep {
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
    val k = graft.queries.NorthStarQueries.Bm25TopK
    val exact = Similarity
      .bruteForceTopK(emb, probes, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[pqsweep] corpus $n vectors, ${probeIds.size} probes, k=$k")
    val nlists = sys.env.get("PQSWEEP_NLIST").map(s => Seq(s.toInt))
      .getOrElse(Seq(16, 32))
    val ms = sys.env.get("PQSWEEP_M").map(s => Seq(s.toInt))
      .getOrElse(Seq(8, 16))
    val reranks = sys.env.get("PQSWEEP_RERANK")
      .map(_.split(',').map(_.toInt).toSeq).getOrElse(Seq(4, 8))
    for (nlist <- nlists; m <- ms) {
      val idx = IvfPqIndex.build(spark, emb, "vec_id", "embedding",
        nlist = nlist, m = m, ksub = 16)
      for (nprobe <- Seq(4, 8, 12, 16, 24).filter(_ <= nlist);
           rerank <- reranks) {
        val got = idx
          .search(probes, "vec_id", "embedding", k, nprobe, rerank)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (exact & got).size.toDouble / exact.size
        println(f"[pqsweep] nlist=$nlist%2d m=$m%2d nprobe=$nprobe%2d " +
          f"rerank=$rerank scan=${nprobe.toDouble / nlist}%.3f " +
          f"recall@$k=$rec%.3f")
      }
    }
    spark.stop()
  }
}
