package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected queries so the partition /
  * pushdown / broadcast / codegen story can be audited (SURVEY.md §4).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_top_segment_nations",
      "q06_delivery_by_priority_month", "q24_minhash_near_dups",
      "q41_train_split", "q42_corpus_clean", "q44_vector_quantize",
      "q55_fuzzy_suppliers", "q58_decontamination", "q61_zipf_profile",
      "q67_winnowing_fingerprints", "q68_bpe_pretokenize",
      "q73_temperature_mixture", "q74_collision_diversity",
      "q75_bloom_decontaminate")
    names.foreach { n =>
      println(s"================ $n ================")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
