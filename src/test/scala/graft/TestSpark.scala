package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_cat").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Order-insensitive row materialization for golden comparisons: each row
    * becomes a Seq of values (arrays → Lists), the whole set sorted by
    * string form.
    */
  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq
      .map(_.toSeq.map {
        case s: scala.collection.Seq[_] => s.toList
        case x => x
      })
      .sortBy(_.mkString("|"))

  def assertSameRows(actual: DataFrame, expected: Seq[Seq[Any]]): Unit = {
    val a = rows(actual)
    val e = expected.map(_.map {
      case s: scala.collection.Seq[_] => s.toList
      case x => x
    }).sortBy(_.mkString("|"))
    assert(a == e, s"\nactual:\n  ${a.mkString("\n  ")}\nexpected:\n  ${e.mkString("\n  ")}")
  }
}
