package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (optimization round): time the per-statement
  * catalog re-registration the SQL write surface pays after every
  * commit — DROP TABLE, CREATE TABLE, recoverPartitions, stats walk —
  * against a real committed partitioned table. Not part of the
  * measured surface.
  */
object ProfileRegister {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.io.Tables.read(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val p = java.nio.file.Paths.get("/tmp/graft_rt/profreg")
    graft.io.FsUtil.deleteRecursively(p)
    val tbl = new graft.io.ParquetTable(p.toString,
      partitionColumns = Seq("status"))
    tbl.overwrite(base)
    graft.io.Catalog.ensureDatabase(spark, "graft_profreg")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[reg] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (i <- 1 to 4)
      time(s"registerTable #$i") {
        graft.io.Catalog.registerTable(spark, "graft_profreg", "t", tbl)
      }
    // component breakdown
    for (_ <- 1 to 2) {
      time("  DROP") { spark.sql("DROP TABLE IF EXISTS graft_profreg.t") }
      val st = tbl.liveSchema.get
      time("  CREATE") {
        spark.sql(s"CREATE TABLE graft_profreg.t (${st.toDDL}) USING " +
          s"parquet PARTITIONED BY (status) LOCATION '${tbl.currentPath}'")
      }
      time("  recoverPartitions") {
        spark.catalog.recoverPartitions("graft_profreg.t")
      }
      time("  sql-count") {
        spark.sql("SELECT count(*) FROM graft_profreg.t").collect()
      }
    }
    spark.stop()
  }
}
