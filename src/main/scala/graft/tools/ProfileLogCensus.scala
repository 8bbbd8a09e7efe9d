package graft.tools

import java.nio.file.Files

import graft.io.VersionLog

/** Scratch profiler for `_log/` metadata scale at DEEP commit counts
  * (not part of the surface): drives [[graft.io.VersionLog]] directly
  * with synthetic single-file commits — no Spark session, no parquet
  * IO — because the census under measurement (file counts, checkpoint
  * retirement, resolution latency) is a property of the LOG layer
  * alone. ProfileLog stays the end-to-end profiler at 1,000 commits;
  * this answers "what does `_log/` look like after 10,000?" in
  * seconds. Usage:
  *   runMain graft.tools.ProfileLogCensus [numCommits]
  */
object ProfileLogCensus {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(10000)
    val root = Files.createTempDirectory("graft_logcensus")
    val path = s"$root/t"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time(s"append $n synthetic commits") {
      (1 to n).foreach { v =>
        VersionLog.append(path, VersionLog.Record(
          v, if (v == 1) "overwrite" else "append",
          Seq(VersionLog.FileEntry(f"part-$v%05d.parquet",
            Map("id" -> VersionLog.ColStat("long", (v * 1000L).toString,
              (v * 1000L + 9).toString, hasNulls = false)))),
          Nil, Nil, renamed = false))
      }
    }
    val names = graft.io.FsUtil
      .listDir(java.nio.file.Paths.get(s"$path/_log"))
      .map(_.getFileName.toString)
    val retain = sys.props.get("graft.log.retainCommits")
      .flatMap(_.toIntOption).getOrElse(VersionLog.RetainCommits)
    println(s"[prof] _log files after $n commits (retainCommits=" +
      s"$retain): total ${names.size} " +
      s"(records ${names.count(_.startsWith("r_"))}, " +
      s"checkpoints ${names.count(_.startsWith("ckpt_"))})")
    val live = time(s"resolveFiles(v=$n) live set")(
      VersionLog.resolveFiles(path, n))
    println(s"[prof] live set resolves: ${live.map(_.size)} files")
    val nearSteps = time(s"resolveSteps($n-10 -> $n)")(
      VersionLog.resolveSteps(path, n - 10, n))
    println(s"[prof] near-head span resolves: ${nearSteps.map(_.size)}")
    // clearly below the horizon (the boundary checkpoint itself is
    // retained, so probe well inside the retired interval)
    val deepV = math.max(1, n - retain - 100)
    println(s"[prof] retired-interval step resolvable (expected false " +
      s"for deep n): ${VersionLog.resolveSteps(path, deepV,
        deepV + 1).nonEmpty}")
    graft.io.FsUtil.deleteRecursively(root)
  }
}
