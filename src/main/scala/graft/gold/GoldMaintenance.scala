package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{ParquetTable, Sidecar}

/** CDF-driven incremental GOLD maintenance — the warehouse loop that
  * closes the versioned-table story: a gold AGGREGATE table kept current
  * from a source [[ParquetTable]]'s commit stream via the change-data
  * feed ([[ParquetTable.changesBetween]], q87), never a full source
  * rescan after the first build.
  *
  * Mechanics: the gold table records which source version it reflects in
  * a `_cdf_applied` sidecar inside its live version dir (state and the
  * data it describes live and die together — the [[Sidecar]] contract).
  * [[advance]] folds the signed multiset delta between that version and
  * the source's live version into the aggregate: inserts +1/+value,
  * deletes −1/−value, an update = its delete+insert pair — count and
  * SUM are the distributive aggregates for which signed folding is
  * EXACT, so incremental maintenance lands bit-identically on the full
  * rebuild (q97's oracle pins exactly that; non-distributive aggregates
  * like distinct would need q86's sketch route instead). Groups whose
  * count reaches zero are dropped, not left as ghost rows.
  *
  * Scale shape: per advance the work is O(|changes| + |gold|) — the CDF
  * diff of two versions plus a gold-sized full-outer merge — while the
  * source is never rescanned. Replay-safe the same way the streaming
  * mirrors are: an advance that finds the sidecar already at the live
  * version is a no-op, so re-running a maintenance job cannot
  * double-apply a delta (StreamingSpec proves both laws).
  */
object GoldMaintenance {

  private val AppliedMarker = "_cdf_applied"

  /** Right-size a gold write: gold relations are GROUP-cardinality
    * bounded by design (every table in this module aggregates to its
    * grain), but a fold plan's output sits at the session's shuffle
    * parallelism, so the raw write emits `spark.sql.shuffle.partitions`
    * near-empty files per version — each one a footer for the commit
    * census and a scan task for the next advance's `gold.read`. A
    * keyless AQE REBALANCE (shuffling only gold-sized bytes — KBs at
    * any corpus scale) lets AQE collapse the write to the few files the
    * bytes justify; at a deployment where a gold table ever grows, the
    * same hint sizes files to `advisoryPartitionSizeInBytes` instead of
    * one-file-per-reducer. No-op when AQE is disabled.
    */
  private[gold] def goldSized(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.sql.adaptive.enabled")
        .forall(_ == "true") &&
      !df.sparkSession.conf.getOption("graft.write.rebalance")
        .contains("off")) df.hint("rebalance")
    else df

  /** The maintained aggregate: per-`keys` row count and `value` sum.
    * `value` should be an EXACT type (integer cents, not doubles) —
    * signed folding re-associates additions, which is only
    * order-insensitive for exact arithmetic.
    */
  def aggregate(source: DataFrame, keys: Seq[String],
      value: Column): DataFrame =
    // NULL values count as 0 (not sum's skip-null) so the rebuild and
    // the signed incremental fold agree even on all-NULL groups
    source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(value, lit(0L))).as("value_sum"))

  /** The source version the gold table currently reflects, if any. */
  def appliedVersion(gold: ParquetTable): Option[Int] =
    Sidecar.read(gold.path, Nil, AppliedMarker)
      .flatMap(_.headOption).flatMap(_.toIntOption)

  /** The feed-retention horizon a SOURCE table must honor for this set
    * of consumers ([[ParquetTable.vacuumKeepingFeeds]]): a consumer at
    * applied version v advances through `changesBetween(v, live)`,
    * which serves from the per-commit feeds of versions v+1..live — so
    * the source must keep feeds from `min(applied)+1` up. Consumers
    * with NO marker take the full-rebuild path on first advance and
    * need no feeds at all; with no marked consumer the horizon is the
    * live version (everything below is reclaimable).
    */
  def feedHorizon(source: ParquetTable, golds: Seq[ParquetTable]): Int =
    golds.flatMap(appliedVersion).minOption.map(_ + 1)
      .getOrElse(source.version)

  /** The LAZY merged-gold plan for one advance — the repeated unit a
    * maintenance job runs per commit, split out so the plan audit can
    * census its shape (the q97 query executes eagerly, so its returned
    * frame's plan is just a gold scan): the signed CDF delta between
    * `fromV` and `toV`, folded into the current gold via a null-safe
    * full-outer merge.
    */
  def incrementalPlan(spark: SparkSession, source: ParquetTable,
      gold: ParquetTable, keys: Seq[String], value: Column,
      fromV: Int, toV: Int): DataFrame = {
    val changes = source.changesBetween(spark, fromV, toV)
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sum(sign * coalesce(value, lit(0L))).as("__dv"))
    val renamed = keys.foldLeft(delta)((d, k) =>
      d.withColumnRenamed(k, s"__k_$k"))
    // null-safe key join: groupBy collates NULL key values, so the
    // merge must too, or a null-keyed group would split
    val cond = keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    gold.read(spark).join(renamed, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"__k_$k")).as(k)) ++ Seq(
          (coalesce(col("n_rows"), lit(0L)) +
            coalesce(col("__dn"), lit(0L))).as("n_rows"),
          (coalesce(col("value_sum"), lit(0L)) +
            coalesce(col("__dv"), lit(0L))).as("value_sum")): _*)
      .filter(col("n_rows") > 0)
  }

  /** Count/sum/min/max per group — [[aggregate]] plus the two
    * NON-signed-foldable extrema (Spark min/max skip NULLs, so an
    * all-NULL group reads NULL; [[advanceMinMax]]'s fold and rescan
    * preserve exactly that).
    */
  def aggregateMinMax(source: DataFrame, keys: Seq[String],
      value: Column): DataFrame =
    source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(value, lit(0L))).as("value_sum"),
        min(value).as("value_min"),
        max(value).as("value_max"))

  /** [[advance]] extended to MIN/MAX — the documented
    * rescan-affected-groups fallback, implemented: extrema are not
    * signed-foldable (a deleted row may have carried the group's min),
    * so per advance the CDF delta is split by group:
    *
    *  - groups whose changes are INSERT-ONLY fold without touching the
    *    source: new min = least(stored, min(inserted)) (least/greatest
    *    skip NULLs, matching min-over-union);
    *  - groups that LOST rows are RESCANNED — one source read
    *    semi-joined down to exactly those group keys (null-safe), never
    *    the whole table re-aggregated; count/sum still fold signed.
    *
    * CDC streams are dominated by inserts, so the rescan is the rare
    * path; an insert-only commit performs ZERO source reads (the spec
    * asserts rescannedGroups == 0). Returns (source version now
    * reflected, number of groups rescanned). Crash/replay laws are
    * [[advance]]'s (same sidecar).
    */
  def advanceMinMax(spark: SparkSession, source: ParquetTable,
      gold: ParquetTable, keys: Seq[String], value: Column): (Int, Long) = {
    val toV = source.version
    val fromV = if (gold.exists) appliedVersion(gold) else None
    var rescanned = 0L
    fromV match {
      case Some(v) if v == toV => () // already current — replay no-op
      case Some(v) =>
        val changes = source.changesBetween(spark, v, toV)
        val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
        // one small cached relation (O(changed groups)) drives both the
        // rescan decision and the fold; released before returning
        val delta = changes.groupBy(keys.map(col): _*)
          .agg(sum(sign).as("__dn"),
            sum(sign * coalesce(value, lit(0L))).as("__dv"),
            min(when(sign === 1L, value)).as("__ins_min"),
            max(when(sign === 1L, value)).as("__ins_max"),
            max(when(sign === -1L, 1L).otherwise(0L)).as("__has_del"))
          .persist()
        try {
          val delKeys = delta.filter(col("__has_del") === 1L)
            .select(keys.map(col): _*)
          rescanned = delKeys.count()
          val rescan =
            if (rescanned == 0) None
            else {
              val keyCond = keys.map(k =>
                col(s"src.$k") <=> col(s"aff.$k")).reduce(_ && _)
              Some(source.read(spark).as("src")
                .join(delKeys.as("aff"), keyCond, "left_semi")
                .groupBy(keys.map(col): _*)
                .agg(min(value).as("__rs_min"), max(value).as("__rs_max")))
            }
          val deltaR = keys.foldLeft(delta)((d, k) =>
            d.withColumnRenamed(k, s"__k_$k"))
          val cond = keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
          var folded = gold.read(spark).join(deltaR, cond, "full_outer")
            .select(
              keys.map(k => coalesce(col(k), col(s"__k_$k")).as(k)) ++ Seq(
                (coalesce(col("n_rows"), lit(0L)) +
                  coalesce(col("__dn"), lit(0L))).as("n_rows"),
                (coalesce(col("value_sum"), lit(0L)) +
                  coalesce(col("__dv"), lit(0L))).as("value_sum"),
                least(col("value_min"), col("__ins_min")).as("value_min"),
                greatest(col("value_max"), col("__ins_max")).as("value_max"),
                coalesce(col("__has_del"), lit(0L)).as("__has_del")): _*)
          rescan.foreach { rs =>
            val rsR = keys.foldLeft(rs)((d, k) =>
              d.withColumnRenamed(k, s"__r_$k"))
            val rcond = keys.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _)
            folded = folded.join(rsR, rcond, "left_outer")
              .select(keys.map(col) ++ Seq(
                col("n_rows"), col("value_sum"),
                when(col("__has_del") === 1L, col("__rs_min"))
                  .otherwise(col("value_min")).as("value_min"),
                when(col("__has_del") === 1L, col("__rs_max"))
                  .otherwise(col("value_max")).as("value_max"),
                col("__has_del")): _*)
          }
          gold.overwrite(goldSized(folded.filter(col("n_rows") > 0)
            .drop("__has_del")))
        } finally delta.unpersist()
      case None =>
        gold.overwrite(goldSized(aggregateMinMax(source.read(spark), keys,
          value)))
    }
    Sidecar.write(java.nio.file.Paths.get(gold.currentPath), AppliedMarker,
      Seq(toV.toString))
    (toV, rescanned)
  }

  /** Count/sum/percentiles per group — the PERCENTILE measure kind
    * (q116): each group stores a deterministic log-bucketed histogram
    * ([[QuantileHist]]) next to the additive measures, and every
    * requested percentile is derived from it as `p{num}_{den}` → named
    * column. NULL values stay outside the histogram (min/max's
    * NULL-skip convention): an all-NULL group reports NULL percentiles.
    */
  def aggregatePercentile(source: DataFrame, keys: Seq[String],
      value: Column, ps: Seq[(String, Int, Int)]): DataFrame = {
    val withB = source.select(keys.map(col) :+ value.as("__v") :+
      QuantileHist.bucketOf(value).as("__b"): _*)
    val perBucket = withB.groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("__bn"),
        sum(coalesce(col("__v"), lit(0L))).as("__bs"))
    val hist = perBucket.groupBy(keys.map(col): _*)
      .agg(sum(col("__bn")).as("__all_n"),
        sum(col("__bs")).as("value_sum"),
        sort_array(collect_list(when(col("__b").isNotNull,
          struct(col("__b").as("b"), col("__bn").as("n")))))
          .as("value_hist"))
    // __all_n counts every source row (NULL buckets included) = n_rows;
    // the NULL-bucket group contributes no hist entry (when → null is
    // dropped by collect_list)
    withDerivedPercentiles(
      hist.withColumnRenamed("__all_n", "n_rows")
        .withColumn("value_hist", coalesce(col("value_hist"),
          QuantileHist.emptyHist)), ps)
  }

  private def withDerivedPercentiles(df: DataFrame,
      ps: Seq[(String, Int, Int)]): DataFrame =
    ps.foldLeft(df) { case (d, (name, num, den)) =>
      d.withColumn(name, QuantileHist.percentile(col("value_hist"), num, den))
    }

  /** [[advance]] extended to PERCENTILES: the histogram is SIGNED-
    * foldable (bucket counts are longs — inserts add, deletes subtract
    * exactly), so unlike [[advanceMinMax]] there is NO rescan path at
    * all: every advance is O(|changes| + |gold|), even delete-heavy
    * ones, and fold ≡ rebuild is bit-exact (q116's oracle claim).
    * Derived percentile columns are recomputed from the folded
    * histogram after every advance. Crash/replay laws are [[advance]]'s
    * (same sidecar).
    */
  def advancePercentile(spark: SparkSession, source: ParquetTable,
      gold: ParquetTable, keys: Seq[String], value: Column,
      ps: Seq[(String, Int, Int)]): Int = {
    val toV = source.version
    val fromV = if (gold.exists) appliedVersion(gold) else None
    fromV match {
      case Some(v) if v == toV => () // already current — replay no-op
      case Some(v) =>
        gold.overwrite(goldSized(percentileIncrementalPlan(spark, source,
          gold, keys, value, ps, v, toV)))
      case None =>
        gold.overwrite(goldSized(aggregatePercentile(source.read(spark),
          keys, value, ps)))
    }
    Sidecar.write(java.nio.file.Paths.get(gold.currentPath), AppliedMarker,
      Seq(toV.toString))
    toV
  }

  /** The LAZY fold plan for one percentile advance — split out (the
    * [[incrementalPlan]] convention) so the plan audit can census the
    * repeated maintenance unit; [[advancePercentile]] executes it.
    */
  def percentileIncrementalPlan(spark: SparkSession, source: ParquetTable,
      gold: ParquetTable, keys: Seq[String], value: Column,
      ps: Seq[(String, Int, Int)], fromV: Int, toV: Int): DataFrame = {
    val changes = source.changesBetween(spark, fromV, toV)
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    // one shuffle over the changes: per-(group, bucket) signed counts
    // plus the additive deltas riding along
    val withB = changes.select(keys.map(col) :+ sign.as("__sign") :+
      value.as("__v") :+ QuantileHist.bucketOf(value).as("__b"): _*)
    val delta = withB.groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(sum(col("__sign")).as("__dbn"),
        sum(col("__sign") * coalesce(col("__v"), lit(0L))).as("__dbs"))
    val deltaG = delta.groupBy(keys.map(col): _*)
      .agg(sum(col("__dbn")).as("__dn"),
        sum(col("__dbs")).as("__dv"),
        // the histogram delta as an array (NULL bucket excluded),
        // possibly with negative counts — the fold nets them
        sort_array(collect_list(when(col("__b").isNotNull,
          struct(col("__b").as("b"), col("__dbn").as("n")))))
          .as("__dhist"))
    val deltaR = keys.foldLeft(deltaG)((d, k) =>
      d.withColumnRenamed(k, s"__k_$k"))
    val cond = keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    // fold: additive merges + histogram vector add, all inside one
    // row-local expression (concat two bucket arrays, net by bucket)
    // — no explode/regroup shuffle; the arrays are bounded (<1k)
    val mergedHist = {
      val both = concat(
        coalesce(col("value_hist"), QuantileHist.emptyHist),
        coalesce(col("__dhist"), QuantileHist.emptyHist))
      // distinct buckets present, sorted; then net each bucket's count
      val buckets = array_sort(array_distinct(
        transform(both, x => x.getField("b"))))
      // functions.aggregate spelled fully — the object's own
      // `aggregate(DataFrame, ...)` shadows the HOF import
      val netted = transform(buckets, (b: Column) =>
        struct(b.as("b"),
          org.apache.spark.sql.functions.aggregate(
            filter(both, (x: Column) => x.getField("b") === b),
            lit(0L), (acc: Column, x: Column) =>
              acc + x.getField("n")).as("n")))
      filter(netted, (x: Column) => x.getField("n") > 0L)
    }
    val folded = gold.read(spark)
      .select(keys.map(col) ++ Seq(col("n_rows"), col("value_sum"),
        col("value_hist")): _*)
      .join(deltaR, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"__k_$k")).as(k)) ++ Seq(
          (coalesce(col("n_rows"), lit(0L)) +
            coalesce(col("__dn"), lit(0L))).as("n_rows"),
          (coalesce(col("value_sum"), lit(0L)) +
            coalesce(col("__dv"), lit(0L))).as("value_sum"),
          mergedHist.as("value_hist")): _*)
      .filter(col("n_rows") > 0)
    withDerivedPercentiles(folded, ps)
  }

  /** Bring `gold` current with `source`'s live version. First call (no
    * gold / no marker) is the one full build; later calls fold only the
    * CDF delta. Returns the source version now reflected. `value` must
    * be evaluable on both the source rows and the CDF change rows (same
    * columns by construction).
    */
  def advance(spark: SparkSession, source: ParquetTable, gold: ParquetTable,
      keys: Seq[String], value: Column): Int = {
    val toV = source.version
    val fromV = if (gold.exists) appliedVersion(gold) else None
    fromV match {
      case Some(v) if v == toV => () // already current — replay no-op
      case Some(v) =>
        gold.overwrite(goldSized(
          incrementalPlan(spark, source, gold, keys, value, v, toV)))
      case None =>
        gold.overwrite(goldSized(aggregate(source.read(spark), keys, value)))
    }
    Sidecar.write(java.nio.file.Paths.get(gold.currentPath), AppliedMarker,
      Seq(toV.toString))
    toV
  }
}
