package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Prints ONE JSON line on stdout:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"steal_sec":S,...}
  *
  * Timing on this host is contaminated by hypervisor CPU steal (round-3
  * adjudication measured ~950 s of stolen CPU in a 300 s wall window), so a
  * single-shot timing of any query can be 3-40x its true cost. This harness
  * is steal-robust by construction:
  *
  *   - every query runs up to PASSES times within one JVM, in an order
  *     re-shuffled per pass so a steal burst never keeps landing on the
  *     same (long) query;
  *   - /proc/stat steal ticks are sampled around EACH run; a run whose
  *     window saw more than STEAL_RUN_TOL seconds of stolen CPU is flagged
  *     dirty and the query earns extra retry attempts (up to MAX_ATTEMPTS);
  *   - the reported number per query is the best CLEAN run when one
  *     exists, else the best overall; all raw runs and their per-run steal
  *     are emitted so a reader can audit the selection.
  *
  * The first pass is also recorded separately ("first") for readers who
  * want codegen-inclusive cold timings.
  */
object Bench {
  private val Passes = 3
  private val MaxAttempts = 5
  private val StealRunTolSec = 0.5
  private val RetryBudgetSec = 300.0

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

    // Hypervisor CPU-steal in seconds of stolen CPU time (field 8 of
    // /proc/stat's cpu line, USER_HZ ticks summed over all vCPUs).
    def stealTicks(): Long =
      try {
        val line = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).getOrElse("")
        val f = line.trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } catch { case _: Throwable => 0L }

    final case class Run(sec: Double, stealSec: Double, failed: Boolean)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val runs = scala.collection.mutable.Map[String, Vector[Run]]()
      .withDefaultValue(Vector.empty)
    // Deterministic-but-decorrelated pass orders: seed from wall clock so
    // two bench invocations don't align their pass schedules with a
    // periodic steal pattern, but log it for reproducibility.
    val seed = System.nanoTime()
    val rng = new scala.util.Random(seed)

    def runOne(name: String): Run = {
      val fn = SparkEntry.queries(name)
      val s0 = stealTicks()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        finally spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      Run(sec, (stealTicks() - s0) / 100.0, failed = !ok)
    }

    val steal0 = stealTicks()
    for (_ <- 1 to Passes)
      for (name <- rng.shuffle(names)) runs(name) = runs(name) :+ runOne(name)
    // Extra attempts for queries with no clean (steal-free, non-failed) run
    // yet — a burst that straddled all three passes of one query would
    // otherwise poison its best-of. Budgeted: under SUSTAINED contention
    // every query can earn its full retry quota and the run never ends —
    // the retry phase stops after RetryBudgetSec of wall clock and the
    // affected queries simply report dirty with their best contended run
    // (the honest answer on a host that never went quiet).
    val retryDeadline = System.nanoTime() + (RetryBudgetSec * 1e9).toLong
    var more = true
    while (more && System.nanoTime() < retryDeadline) {
      more = false
      for (name <- rng.shuffle(names)
           if System.nanoTime() < retryDeadline) {
        val rs = runs(name)
        val hasClean = rs.exists(r => !r.failed && r.stealSec <= StealRunTolSec)
        if (!hasClean && rs.length < MaxAttempts) {
          runs(name) = rs :+ runOne(name); more = true
        }
      }
    }
    val stealSec = (stealTicks() - steal0) / 100.0

    def bestOf(rs: Vector[Run]): Double = {
      val okRuns = rs.filter(!_.failed)
      if (okRuns.isEmpty) -1.0
      else {
        val clean = okRuns.filter(_.stealSec <= StealRunTolSec)
        (if (clean.nonEmpty) clean else okRuns).map(_.sec).min
      }
    }
    def fmt(d: Double): String = f"$d%.4f"
    val best = names.map(n => n -> bestOf(runs(n))).toMap
    val qs = names.map(n => s"\"$n\":${fmt(best(n))}").mkString("{", ",", "}")
    val detail = names.map { n =>
      val rs = runs(n)
      val secs = rs.map(r => fmt(if (r.failed) -1.0 else r.sec)).mkString("[", ",", "]")
      val st = rs.map(r => fmt(r.stealSec)).mkString("[", ",", "]")
      s""""$n":{"best":${fmt(best(n))},"first":${fmt(if (rs.head.failed) -1.0 else rs.head.sec)},"runs":$secs,"steal":$st}"""
    }.mkString("{", ",", "}")
    // -1.0 failure markers must not be summed — they would understate the
    // total and make it non-monotonic with failures
    val total = best.values.filter(_ >= 0).sum
    val dirty = names.count(n => !runs(n).exists(r => !r.failed && r.stealSec <= StealRunTolSec))
    // stop Spark BEFORE printing so no shutdown logging can land after the
    // JSON — the driver parses the final stdout line as the result object
    spark.stop()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"steal_sec":${fmt(stealSec)},"passes":$Passes,"dirty_queries":$dirty,"seed":$seed,"detail":$detail,"sf":"$sfDir"}""")
    Console.out.flush()
  }
}
