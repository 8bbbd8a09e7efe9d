package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Optimization-round evidence dumper: for each named query, write
  * `plans/<round>/<query>_before.txt` and `..._after.txt` holding (1)
  * the returned frame's `explain("formatted")` and (2) every versioned
  * WRITE plan the query executed (captured via the
  * `graft.write.explainDir` hook — write-side plans never appear in
  * the returned frame). "Before" runs with `graft.write.rebalance=off`
  * (the pre-optimization write shape on the same binary); "after" runs
  * the defaults. Queries whose returned-frame plans are identical in
  * both captures differ only in the write path — by construction the
  * computed result is unchanged.
  *
  * Usage: runMain graft.tools.PlanDump plans/r17 q123_cow_merge ...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args.headOption.getOrElse("plans/r17"))
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "PlanDump: name at least one query")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def capture(name: String, label: String, rebalanceOff: Boolean): String = {
      val tmp = Files.createTempDirectory(s"plandump_$label")
      sys.props("graft.write.explainDir") = tmp.toString
      if (rebalanceOff) spark.conf.set("graft.write.rebalance", "off")
      else spark.conf.unset("graft.write.rebalance")
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.count()
        val framePlan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        import scala.jdk.CollectionConverters._
        val listing = Files.list(tmp)
        val writes =
          try listing.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
            .map(Files.readString(_)).mkString("\n")
          finally listing.close()
        spark.catalog.clearCache()
        s"== $name ($label) ==\n\n-- returned frame --\n$framePlan\n" +
          s"\n-- versioned write plans (in commit order per table) --\n$writes"
      } finally {
        sys.props.remove("graft.write.explainDir")
        spark.conf.unset("graft.write.rebalance")
        def rm(p: Path): Unit = {
          val w = Files.walk(p)
          try w.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.delete(f))
          finally w.close()
        }
        rm(tmp)
      }
    }

    for (n <- names) {
      Files.writeString(outDir.resolve(s"${n}_before.txt"),
        capture(n, "before: graft.write.rebalance=off", rebalanceOff = true))
      Files.writeString(outDir.resolve(s"${n}_after.txt"),
        capture(n, "after: HEAD defaults", rebalanceOff = false))
      println(s"[plandump] $n done")
    }
    spark.stop()
  }
}
