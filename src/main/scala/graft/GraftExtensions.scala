package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity
import graft.io.Tables

/** Session extension wiring — the deployment path for graft's native SQL
  * surface on a cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Injects `cosine_sim(array<double>, array<double>)` into every session
  * built with the extension (no per-session register() call needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
  }
}

/** SQL-first entry point: register the testdata tables as temp views (plus
  * graft functions) so the whole engine is drivable from `spark.sql`.
  */
object GraftCatalog {
  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    TableNames.foreach(n =>
      Tables.read(spark, sfDir, n).createOrReplaceTempView(n))
    graft.functions.GraftFunctions.register(spark)
  }
}
