package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // drive the ContextCleaner even if the heap never fills: accumulated
      // shuffle/broadcast state from 70+ queries otherwise survives until
      // an expensive full GC lands mid-query (see build.sbt's -Xmx note)
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths so per-query timings
    // measure steady state, not first-query startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()

    // Hypervisor CPU-steal during the run, in seconds of stolen CPU time
    // (field 8 of /proc/stat's cpu line, USER_HZ ticks summed over all
    // vCPUs). Host-level steal bursts freeze the whole JVM for tens of
    // seconds and land on whichever query is running — recording the
    // delta lets a reader tell a real regression from a noisy-neighbor
    // episode before comparing totals across runs.
    def stealTicks(): Long =
      try {
        val line = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).getOrElse("")
        val f = line.trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } catch { case _: Throwable => 0L }
    val steal0 = stealTicks()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must not masquerade as a fast healthy one — record
      // a negative marker and say so on stderr
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        finally spark.catalog.clearCache()
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1.0 failure markers must not be summed — they would understate the
    // total and make it non-monotonic with failures
    val total = results.values.filter(_ >= 0).sum
    val stealSec = (stealTicks() - steal0) / 100.0
    // stop Spark BEFORE printing so no shutdown logging can land after the
    // JSON — the driver parses the final stdout line as the result object
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"steal_sec":$stealSec,"sf":"$sfDir"}""")
    Console.out.flush()
  }
}
