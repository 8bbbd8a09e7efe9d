package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, ShingleHashes, TokenCollisionStats}
import graft.io.Tables

/** Session extension wiring — the deployment path for graft's native SQL
  * surface on a cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Injects the native functions — `cosine_sim(array<double>,
  * array<double>)`, `dot_product(array<double>, array<double>)`,
  * `shingle_hashes(string, k)`, `dict_match_counts(string,
  * array<string> literal)` — into every session built with the
  * extension (no per-session register() call needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.arity
  override def apply(extensions: SparkSessionExtensions): Unit = {
    // SQL MERGE INTO on graft-registered tables: stock grammar, one
    // plan rewrite for registered targets (everything else untouched) —
    // see org.apache.spark.sql.GraftMergeInto
    extensions.injectParser((session, delegate) =>
      new org.apache.spark.sql.GraftSqlParser(session, delegate))
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "cosine_sim(vec, vec)")
        CosineSimilarity(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "dot_product(vec, vec)")
        DotProduct(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "shingle_hashes(text, k)")
        ShingleHashes(exprs.head,
          GraftExtensions.literalInt(exprs(1), "shingle_hashes k"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("token_collision_stats"),
      new ExpressionInfo(classOf[TokenCollisionStats].getName,
        "token_collision_stats"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 1, "token_collision_stats(text)")
        TokenCollisionStats(exprs.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("vec_sub"),
      new ExpressionInfo(classOf[graft.functions.VecSub].getName, "vec_sub"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "vec_sub(vec, vec)")
        graft.functions.VecSub(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("dict_match_counts"),
      new ExpressionInfo(classOf[graft.functions.DictMatchCounts].getName,
        "dict_match_counts"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "dict_match_counts(text, array_of_string_literals)")
        graft.functions.DictMatchCounts(exprs.head,
          GraftExtensions.literalStrings(exprs(1),
            "dict_match_counts phrases"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("dict_replace"),
      new ExpressionInfo(classOf[graft.functions.DictReplace].getName,
        "dict_replace"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3,
          "dict_replace(text, array_of_string_literals, replacement)")
        graft.functions.DictReplace(exprs.head,
          GraftExtensions.literalStrings(exprs(1), "dict_replace phrases"),
          GraftExtensions.literalString(exprs(2),
            "dict_replace replacement"))
      }))
    // the q116 quantile-histogram algebra (Column builders bridged
    // EAGERLY — see GraftBridge.toExpressionEager's rationale)
    import org.apache.spark.sql.GraftBridge
    extensions.injectFunction((
      FunctionIdentifier("qhist_bucket"),
      new ExpressionInfo(graft.gold.QuantileHist.getClass.getName,
        "qhist_bucket"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 1, "qhist_bucket(non_negative_long)")
        GraftBridge.toExpressionEager(
          graft.gold.QuantileHist.bucketOf(GraftBridge.toColumn(exprs.head)))
      }))
    extensions.injectFunction((
      FunctionIdentifier("qhist_rep"),
      new ExpressionInfo(graft.gold.QuantileHist.getClass.getName,
        "qhist_rep"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 1, "qhist_rep(bucket)")
        GraftBridge.toExpressionEager(
          graft.gold.QuantileHist.representative(
            GraftBridge.toColumn(exprs.head)))
      }))
    extensions.injectFunction((
      FunctionIdentifier("qhist_percentile"),
      new ExpressionInfo(graft.gold.QuantileHist.getClass.getName,
        "qhist_percentile"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 3, "qhist_percentile(hist, num_literal, den_literal)")
        GraftBridge.toExpressionEager(
          graft.gold.QuantileHist.percentile(
            GraftBridge.toColumn(exprs.head),
            GraftExtensions.literalInt(exprs(1), "qhist_percentile num"),
            GraftExtensions.literalInt(exprs(2), "qhist_percentile den")))
      }))
  }
}

object GraftExtensions {

  /** Arity guard for the injected builders: a wrong-arg-count SQL call
    * must surface as an analysis-style error naming the signature, not
    * an IndexOutOfBoundsException from `exprs(1)`.
    */
  private[graft] def arity(exprs: Seq[Expression], n: Int,
      signature: String): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"wrong number of arguments: expected $n as $signature, " +
        s"got ${exprs.length}")

  /** k must be a foldable int literal — it parameterizes the expression,
    * it is not a per-row input.
    */
  private[graft] def literalInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** A single string-literal parameter (e.g. a replacement tag). */
  private[graft] def literalString(e: Expression, what: String): String = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    e match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
  }

  /** The dictionary must be a foldable array of string literals — it
    * parameterizes the automaton (built once, driver-side), it is not a
    * per-row input. Accepts both the `array('a','b')` constructor form
    * and an already-folded array literal.
    */
  private[graft] def literalStrings(e: Expression, what: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    e match {
      case CreateArray(items, _) => items.map {
        case Literal(v: UTF8String, StringType) => v.toString
        case other => throw new IllegalArgumentException(
          s"$what must be string literals, got $other")
      }
      case Literal(a: ArrayData, ArrayType(StringType, _)) =>
        // folded array literals (Column-API arrays, optimizer constant
        // folding) can carry null ELEMENTS — raise the same loud error
        // as the constructor form, not a raw NullPointerException
        a.toArray[UTF8String](StringType).toSeq.map { v =>
          if (v == null) throw new IllegalArgumentException(
            s"$what must be string literals, got a null element")
          v.toString
        }
      case other => throw new IllegalArgumentException(
        s"$what must be an array of string literals, got $other")
    }
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
