package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch runner for INDIVIDUAL accuracy-gate builders while tuning
  * bounds (Accuracy.main always runs the whole battery at both tiers —
  * minutes — where re-pinning one query's bound needs seconds).
  * Usage: runMain graft.tools.GateProbe <sfDir> q50 q112 ...
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val builders: Map[String, () => Seq[Accuracy.Gate]] = Map(
      "q50" -> (() => Accuracy.q50Gates(spark, dir)),
      "q112" -> (() => Accuracy.q112Gates(spark, dir)),
      "q116" -> (() => Accuracy.q116Gates(spark, dir)))
    for ((n, b) <- builders if names.isEmpty || names(n); g <- b())
      println(f"[gate] ${g.query}/${g.metric} = ${g.value}%.4f " +
        f"${g.op} ${g.bound} pass=${g.pass}")
    spark.stop()
  }
}
