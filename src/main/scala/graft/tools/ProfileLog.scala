package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.{ColumnBound, ParquetTable}

/** Scratch profiler for the commit log ([[graft.io.VersionLog]], not
  * part of the surface): builds a LONG commit history (default 1,000
  * versions — the serving-cadence shape the streaming mirrors produce)
  * and brackets
  *
  *   1. CDF span resolution WITH the log (O(span/K) sidecar reads,
  *      grouped scans) vs WITHOUT it (`_log` renamed away — the
  *      walk-based per-step classification),
  *   2. near-head advance (the per-trigger IVM unit), and
  *   3. stats-pruned selective reads vs the full scan + filter,
  *
  * printing `[prof]` rows for BASELINE.md. Usage:
  *   runMain graft.tools.ProfileLog [numCommits] [feedEvery]
  * Every `feedEvery`-th commit is a feed-carrying overwrite (the gold
  * IVM write shape); the rest are appends (the intake shape).
  */
object ProfileLog {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(1000)
    val feedEvery = args.drop(1).headOption.flatMap(_.toIntOption)
      .getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("graft_logprof")
    val t = new ParquetTable(s"$root/t")

    // ---- intake: n commits, mixed append/feed-overwrite ----------------
    val rowsPer = 10
    time(s"intake $n commits") {
      var live = Vector.empty[(Long, Long)] // (id, val)
      for (v <- 1 to n) {
        val batch = ((v * 1000L) until (v * 1000L + rowsPer))
          .map(i => (i, i % 37)).toVector
        if (v == 1) {
          live = batch
          val df = batch.toDF("id", "value")
          t.overwriteWithChanges(df,
            df.withColumn("_change_type", lit("insert")))
        } else if (v % feedEvery == 0) {
          // feed overwrite: drop the oldest batch, add the new one —
          // the keyed-maintenance write shape (deletes + inserts)
          val dropped = live.take(rowsPer)
          live = live.drop(rowsPer) ++ batch
          val feed = dropped.map { case (i, x) => (i, x, "delete") } ++
            batch.map { case (i, x) => (i, x, "insert") }
          t.overwriteWithChanges(live.toDF("id", "value"),
            feed.toDF("id", "value", "_change_type"))
        } else {
          live = live ++ batch
          t.appendVersion(batch.toDF("id", "value"))
        }
      }
    }
    val logNames = graft.io.FsUtil.listDir(
        java.nio.file.Paths.get(s"$root/t/_log"))
      .map(_.getFileName.toString)
    println(s"[prof] _log files after $n commits: total ${logNames.size} " +
      s"(records ${logNames.count(_.startsWith("r_"))}, " +
      s"checkpoints ${logNames.count(_.startsWith("ckpt_"))}) — " +
      s"record compaction keeps loose records O(K), not O(commits)")

    // ---- CDF spans: log vs walk ----------------------------------------
    def cdf(label: String, from: Int): Long =
      time(s"cdf($from -> $n) $label")(
        t.changesBetween(spark, from, n).count())
    val fullLog = cdf("log", 1)
    val nearLog = cdf("log", n - 10)
    // disable the log (rename) — the walk-based per-step classification
    val logDir = java.nio.file.Paths.get(s"$root/t/_log")
    val hidden = java.nio.file.Paths.get(s"$root/t/_log_off")
    java.nio.file.Files.move(logDir, hidden)
    val fullWalk = cdf("walk", 1)
    val nearWalk = cdf("walk", n - 10)
    java.nio.file.Files.move(hidden, logDir)
    require(fullLog == fullWalk && nearLog == nearWalk,
      s"log and walk spans must agree ($fullLog/$fullWalk, " +
        s"$nearLog/$nearWalk)")

    // ---- hybrid CDF across the retirement horizon -----------------------
    // retire checkpoints below n/5 (a consumer far behind, MOST of the
    // span still log-covered): the hybrid path walks only the retired
    // prefix and serves the suffix from grouped log scans — the cost
    // should land near walk(prefix) + log(suffix), not walk(whole span)
    val prevRetain = sys.props.get("graft.log.retainCommits")
    val hybridCount = try {
      sys.props("graft.log.retainCommits") = (n - n / 5).toString
      val retired = graft.io.VersionLog.retireCheckpoints(s"$root/t", n)
      val h = graft.io.VersionLog.resolvableSuffixStart(s"$root/t", 1, n)
      println(s"[prof] retired $retired checkpoints; hybrid split at " +
        s"$h (walked prefix ${h - 1} steps, log-served suffix ${n - h})")
      require(h > 1 && h < n, s"split point $h must be inside (1, $n)")
      cdf("hybrid (walk prefix + log suffix)", 1)
    } finally prevRetain match {
      case Some(v) => sys.props("graft.log.retainCommits") = v
      case None => sys.props.remove("graft.log.retainCommits")
    }
    require(hybridCount == fullLog,
      s"hybrid span must agree with the full-log span " +
        s"($hybridCount/$fullLog)")

    // ---- stats skipping: pruned vs full selective read ------------------
    time("compact(32, sort id)")(t.compact(spark, 32, Seq("id")))
    val lo = 400_000L; val hi = 401_000L
    val bounds = Seq(ColumnBound("id", Some(lo), Some(hi)))
    val census = t.prunedFileCensus(bounds)
    println(s"[prof] pruned file census: $census")
    sys.props("graft.read.skipping") = "off"
    val full =
      try time("selective filter, full scan")(
        t.read(spark).filter(col("id").between(lo, hi)).count())
      finally sys.props.remove("graft.read.skipping")
    val auto = time("selective filter, AUTO-skipping read")(
      t.read(spark).filter(col("id").between(lo, hi)).count())
    val pruned = time("selective filter, explicit readPruned")(
      t.readPruned(spark, bounds)
        .filter(col("id").between(lo, hi)).count())
    require(full == pruned && full == auto,
      s"pruned reads must match ($full/$auto/$pruned)")
    println(s"[prof] rows matched: $full")
    graft.io.FsUtil.deleteRecursively(root)
    spark.stop()
  }
}
