package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-surface plan-shape audit: for EVERY SparkEntry query, count the
  * physical plan's shuffle exchanges, broadcast exchanges, parquet scans,
  * and flag any CartesianProduct / BroadcastNestedLoopJoin — emitted as one
  * machine-readable JSON artifact (committed per round as
  * `PLANAUDIT_r{NN}.json`).
  *
  * This is the scale story in numbers instead of prose: a query whose
  * shuffle count silently grows, loses its broadcast, or picks up a
  * cartesian product is exactly the regression that stays invisible at
  * sf0.1 wall times but dominates at 100 TB. The ScaleSpec plan assertions
  * pin a handful of headline shapes; this audit covers the whole surface
  * every round. `cartesian_free` is a top-level gate: BroadcastNestedLoop
  * joins here are the justified broadcast-1-row-bounds pattern
  * (flagged per query for review), CartesianProduct is never acceptable.
  *
  * Usage: `runMain graft.tools.PlanAudit [outPath]` (default
  * `PLANAUDIT.json`); scale dir from SPARK_GRAFT_SF_DIR (default sf0.01).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("PLANAUDIT.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // A plan line's operator name, tree-drawing prefix stripped.
    def opName(line: String): String =
      line.dropWhile(c => !c.isLetter)

    final case class Shape(shuffles: Int, broadcasts: Int, scans: Int,
        cartesian: Boolean, bnlj: Boolean, err: Option[String])

    val shapes = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val shape =
          try {
            val plan = fn(spark, dir).queryExecution.executedPlan.toString
            val ops = plan.linesIterator.map(opName).toVector
            Shape(
              shuffles = ops.count(_.startsWith("Exchange")),
              broadcasts = ops.count(_.startsWith("BroadcastExchange")),
              scans = ops.count(o => o.startsWith("FileScan") ||
                o.startsWith("Scan parquet")),
              cartesian = ops.exists(_.startsWith("CartesianProduct")),
              bnlj = ops.exists(_.startsWith("BroadcastNestedLoopJoin")),
              err = None)
          } catch { case e: Throwable =>
            // getMessage is null for NPEs and many wrapped JVM errors — a
            // null here must record the query's failure, not kill the audit
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            Shape(-1, -1, -1, cartesian = false, bnlj = false,
              err = Some(msg.takeWhile(_ != '\n').take(200)))
          } finally spark.catalog.clearCache()
        name -> shape
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val body = shapes.map { case (n, s) =>
      val errJson = s.err.map(jstr).getOrElse("null")
      s"${jstr(n)}:{\"shuffles\":${s.shuffles},\"broadcasts\":${s.broadcasts}," +
        s"\"scans\":${s.scans},\"cartesian\":${s.cartesian}," +
        s"\"bnlj\":${s.bnlj},\"err\":$errJson}"
    }.mkString(",")
    val cartesianFree = shapes.forall(!_._2.cartesian)
    val errCount = shapes.count(_._2.err.isDefined)
    val maxShuffles = shapes.map(_._2.shuffles).max
    val json = s"""{"sf":"$dir","cartesian_free":$cartesianFree,""" +
      s""""errors":$errCount,"max_shuffles":$maxShuffles,"queries":{$body}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
