package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.northstar.{Dedup, TextAnalysis}

/** Scratch profiler for the dedup query stages (not part of the surface). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.read(spark, dir, "documents")
    docs.count()

    for (i <- 1 to 3) {
      time(s"shingle sets #$i") {
        docs.select(col("doc_id"),
          array_distinct(TextAnalysis.shingleHashes(col("text"), 3)).as("s" + i))
          .agg(sum(size(col("s" + i)))).head
      }
    }
    for (i <- 1 to 3) {
      time(s"full q25 #$i") {
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3).count()
      }
      spark.catalog.clearCache()
    }
    for (i <- 1 to 2) {
      time(s"full q24 #$i") {
        Dedup.minhashNearDuplicates(docs, "doc_id", "text", 64, 16, 3, 0.5).count()
      }
      spark.catalog.clearCache()
    }

    // --- q24 stage attribution ---
    val sets = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.shingleHashes(col("text"), 3)).as("__shingles"))
    for (i <- 1 to 2) {
      sets.cache()
      time(s"q24a sets materialize #$i") { sets.count() }
      time(s"q24b signatures agg #$i") {
        Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)
          .agg(max(element_at(col("__sig"), 1))).head
      }
      time(s"q24c sig+bands+cand #$i") {
        Dedup.candidatePairs(
          Dedup.lshBands(Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3),
            "doc_id", "__sig", 16, 4), "doc_id").count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
