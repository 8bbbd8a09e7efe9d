package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.io.VersionLog

/** Scratch profiler attributing the r13 bench census's regressed flags on
  * the commit-bearing queries (q50_ivf_build 1.46x, q84_ivf_append 1.50x,
  * q08_merge 1.33x) to the synchronous commit-time footer-stats census
  * (`Tables.commitCensus` → `VersionLog.collectStats`), per the round-13
  * verdict's task 1. Measures, on the SAME binary:
  *
  *   1. the footer pass in isolation over a real persisted index
  *      version's files — sequential (the r13 shape: one
  *      `collectStats(Seq(f))` per file) vs the new bounded-pool
  *      parallel path;
  *   2. the commit-bearing queries end-to-end with stats capture on vs
  *      off (`graft.log.stats=off` override — for q50/q84 the HEAD
  *      default is already off via `captureStats = false` on index
  *      tables, so on/off there shows the residual override cost only;
  *      q08's seed store keeps stats on, so its delta IS the census
  *      cost).
  *
  * Output feeds BASELINE.md's attribution table; not part of the
  * measured surface.
  */
object ProfileCensus {
  private def steal(): Long =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = line.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else 0L
    } catch { case _: Throwable => 0L }

  private def parquetFiles(verDir: Path): Seq[(Path, String)] = {
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(verDir)
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => (p, verDir.relativize(p).toString))
      .toSeq.sortBy(_._2)
    finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed(tag: String)(f: => Unit): Double = {
      val s0 = steal(); val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[census] $tag%-34s $sec%6.3f s  steal=${(steal() - s0) / 100.0}%.2f")
      sec
    }

    // 1. build the serving index once so its version dir exists, then
    //    time the footer pass in isolation over its real files
    SparkEntry.queries("q50_ivf_build")(spark, dir).count()
    val idxPath = graft.queries.NorthStarQueries.servingIvfPath(dir)
    val cur = Files.readString(Paths.get(idxPath, "_current")).trim
    val files = parquetFiles(Paths.get(idxPath, cur))
    println(s"[census] index version $cur: ${files.size} data files")
    for (i <- 1 to 3) {
      timed(s"footer pass SEQUENTIAL #$i") {
        files.foreach(f => VersionLog.collectStats(Seq(f)))
      }
      timed(s"footer pass PARALLEL   #$i") {
        VersionLog.collectStats(files)
      }
    }

    // 2. commit-bearing queries end-to-end, stats on vs off
    for (q <- Seq("q50_ivf_build", "q84_ivf_append",
        "q08_merge_insert_if_absent"); mode <- Seq("on", "off"); i <- 1 to 3) {
      if (mode == "off") sys.props("graft.log.stats") = "off"
      else sys.props.remove("graft.log.stats")
      timed(f"$q%-26s stats=$mode #$i") {
        SparkEntry.queries(q)(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
    sys.props.remove("graft.log.stats")
    spark.stop()
  }
}
