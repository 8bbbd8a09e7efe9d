package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.northstar.{PqIndex, ProductQuantizer, Similarity, VectorOps}

/** Scratch profiler for the PQ ANN path: times fit / encode / search
  * stages separately (not part of the surface; Bench is the contract).
  * This is the instrument that caught the Column-algebra ADC's
  * 0.25 ms/row `element_at(<nested literal>, <code>)` term — keep it
  * runnable so a kernel regression is a one-command diagnosis.
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (i <- 1 to 2) {
      println(s"--- pass $i ---")
      val emb = Tables.read(spark, dir, "embeddings")
      val unit = VectorOps.unitVecs(emb, "vec_id", "embedding",
        "vec_id", "__uv")
      val pq = time("fit") {
        ProductQuantizer.fit(unit, "vec_id", "__uv", m = 8, ksub = 16)
      }
      time("encode count") {
        unit.withColumn("__codes", pq.encode(col("__uv"))).count()
      }
      val idx = time("build (fit+encode lazy)") {
        PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
      }
      time("search count") {
        idx.search(emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, rerank = 8).count()
      }
      // the ADC term in isolation: the per-row kernel cost without the
      // shortlist window/re-rank machinery
      val coded = unit.withColumn("__codes", pq.encode(col("__uv")))
      val q = unit.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("__uv").as("__qv"))
      time("crossjoin+adc agg") {
        coded.crossJoin(broadcast(q))
          .select(pq.adcDot(col("__qv"), col("__codes")).as("a"))
          .agg(sum(col("a"))).collect()
      }
      // IVFADC decomposition
      val ivfpq = time("ivfpq build") {
        graft.northstar.IvfPqIndex.build(spark, emb, "vec_id", "embedding",
          nlist = 16, m = 8, ksub = 16)
      }
      time("ivfpq cellSizes count") { ivfpq.cellSizes().count() }
      time("ivfpq search count (mem)") {
        ivfpq.search(emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 8).count()
      }
      val path = java.nio.file.Files
        .createTempDirectory("graft_prof_ivfpq").toString + "/idx"
      time("ivfpq persist") { ivfpq.persist(spark, path) }
      val loaded = time("ivfpq load") {
        graft.northstar.IvfPqIndex.load(spark, path).get
      }
      time("ivfpq probe #1") {
        loaded.search(emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 8).count()
      }
      time("ivfpq probe #2") {
        loaded.search(emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 8).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
