package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the delegate-parsed plan classes/fields for the DDL
  * statements the graft SQL bridge intercepts — pins the exact Spark
  * node shapes (CreateTable / CreateTableAsSelect / DropTable and their
  * name children) the rewrite must match.
  */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parser = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser
    val stmts = Seq(
      "CREATE TABLE wh.t (id BIGINT, status STRING, cents BIGINT) " +
        "USING graft PARTITIONED BY (status) LOCATION '/tmp/x'",
      "CREATE TABLE IF NOT EXISTS wh.t (id BIGINT) USING graft",
      "CREATE TABLE wh.t2 USING graft PARTITIONED BY (status) AS " +
        "SELECT 1L AS id, 'O' AS status",
      "DROP TABLE wh.t",
      "DROP TABLE IF EXISTS wh.t PURGE")
    for (s <- stmts) {
      val p = parser.parsePlan(s)
      println(s"== $s\n  ${p.getClass.getName}")
      println("  " + p.toString.linesIterator.take(6).mkString("\n  "))
      p.children.foreach(c => println(s"  child: ${c.getClass.getName} $c"))
      p match {
        case ct: org.apache.spark.sql.catalyst.plans.logical.CreateTable =>
          println(s"  name=${ct.name.getClass.getName} ${ct.name}")
          println(s"  spec=${ct.tableSpec.getClass.getName} ${ct.tableSpec}")
          println(s"  partitioning=${ct.partitioning}")
          println(s"  columns=${ct.columns}")
        case ct: org.apache.spark.sql.catalyst.plans.logical.CreateTableAsSelect =>
          println(s"  name=${ct.name.getClass.getName} ${ct.name}")
          println(s"  spec=${ct.tableSpec.getClass.getName} ${ct.tableSpec}")
          println(s"  partitioning=${ct.partitioning}")
        case dt: org.apache.spark.sql.catalyst.plans.logical.DropTable =>
          println(s"  child=${dt.child.getClass.getName} ${dt.child}")
        case _ => ()
      }
    }
    spark.stop()
  }
}
