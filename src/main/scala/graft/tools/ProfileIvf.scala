package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.northstar.{IvfIndex, Similarity}

/** Scratch profiler for the IVF path (not part of the surface): times the
  * q50 sub-steps — quantizer fit + assignment, the cell-partitioned
  * persist, and the pruned probe — separately, three rounds each, with
  * per-step /proc/stat steal so a contended round is visible.
  */
object ProfileIvf {
  private def steal(): Long =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = line.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else 0L
    } catch { case _: Throwable => 0L }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def timed(tag: String)(f: => Unit): Unit = {
      val s0 = steal(); val t0 = System.nanoTime()
      f
      println(f"[ivf] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  steal=${(steal() - s0) / 100.0}%.2f")
    }
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    for (round <- 1 to 3) {
      println(s"-- round $round")
      var idx: IvfIndex = null
      timed("fit+assign")  { idx = IvfIndex.build(emb, "vec_id", "embedding", 16); idx.assigned.count() }
      val path = java.nio.file.Files.createTempDirectory("ivf_prof").toString
      var persisted: IvfIndex = null
      timed("persist")     { persisted = idx.persist(spark, path) }
      timed("search")      { persisted.search(queries, "vec_id", "embedding", 5, 8).count() }
      timed("search again"){ persisted.search(queries, "vec_id", "embedding", 5, 8).count() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
