package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q93 PageRank rounds (not part of the surface). */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val orders = graft.io.Tables.read(spark, dir, "orders")
    val li = graft.io.Tables.read(spark, dir, "lineitem")
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(li.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp")).distinct()
    val edges = pairs.select((col("c") * 2).as("src"), (col("sp") * 2 + 1).as("dst"))
      .unionByName(pairs.select((col("sp") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
      .persist()
    val ecount = time("edges build")(edges.count())
    println(s"[prof] edges=$ecount")
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .persist()
    val n = time("outdeg")(outdeg.count())
    var scores = outdeg.select(col("src").as("node"),
      lit(1000000000000L / n).as("score"))
    for (k <- 1 to 6) {
      scores = graft.northstar.GraphRank.round(edges, outdeg, scores,
        150000000000L / n, 85).persist()
      time(s"round $k")(scores.count())
    }
    scores.explain("formatted")
    spark.stop()
  }
}
