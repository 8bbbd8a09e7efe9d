package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the q112 coded serving arm (round 13):
  * attributes the query's wall between index load, probe planning,
  * dense-arm execution, BM25 arm, and fusion. Not part of the surface.
  * Usage: runMain graft.tools.ProfileQ112 [sfDir]
  */
object ProfileQ112 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q112prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.queries.NorthStarQueries._
    val emb = graft.io.Tables.read(spark, dir, "embeddings")
    val probes = emb.filter(col("vec_id").isin(DenseProbes.map(_._2): _*))
    for (pass <- 1 to 3) {
      println(s"[q112prof] ---- pass $pass ----")
      val idx = time("load")(
        graft.northstar.IvfPqIndex.load(spark, servingIvfPqPath(dir)).get)
      val dense = time("search plan")(
        idx.search(probes, "vec_id", "embedding", k = Bm25TopK,
          nprobe = Q112DenseNprobe, rerank = Q112Rerank))
      time("dense execute")(dense.count())
      val bm25 = time("bm25 plan+exec") {
        val b = graft.northstar.Bm25.topK(
          graft.io.Tables.read(spark, dir, "documents"),
          "doc_id", "text", Bm25Queries, Bm25TopK)
        b.count(); b
      }
      // q112's real vec_id → query_id remap: without it every dense
      // query would collapse into one RRF partition and the profiled
      // fuse phase would not reflect q112's fusion workload
      val qidFor = DenseProbes.foldLeft(lit(null).cast("int")) {
        case (acc, (qid, vid)) =>
          when(col("query_id") === vid, lit(qid)).otherwise(acc)
      }
      time("fuse")(graft.northstar.HybridRetrieval.fuse(
        bm25.select(col("query_id"), col("doc_id"),
          col("rank").as("sparse_rank")),
        dense.select(qidFor.as("query_id"),
          col("neighbor_id").as("doc_id"), col("rank").as("dense_rank")),
        Bm25TopK).count())
      bm25.unpersist(blocking = false)
      ()
    }
    spark.stop()
  }
}
