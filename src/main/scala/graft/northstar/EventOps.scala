package graft.northstar

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern analytics over an event stream — the funnel /
  * retention workloads of a product-analytics warehouse, expressed as
  * user-keyed aggregate cascades (never a self-join on time).
  *
  * Contract: `tsCol` is long ns-since-epoch (the engine-wide events
  * contract, [[graft.io.Tables.read]]).
  */
object EventOps {

  /** Conversion funnel: for each stage after the first, a user counts iff
    * their first occurrence of that stage is STRICTLY after their
    * (first-occurrence) time of the previous stage. Emits one row per
    * stage: `stage` (ordinal-prefixed label), `users`, and the exact
    * summed per-user transition lag in µs (`total_lag_us`, 0 for the
    * first stage).
    *
    * Scale shape: ONE scan of the (stage-filtered) events and ONE shuffle
    * on the user key. Each stage's first-qualifying time is a conditional
    * window MIN over the user partition, referencing the previous stage's
    * window column — the stacked Window operators all reuse the one
    * exchange, a null previous-stage time nulls every later stage for
    * free, and the per-user → global rollup rides the same partitioning.
    * Stage rows come off the 1-row total via explode, NOT a per-stage
    * union — a union of stage chains re-plans each chain (the q39/SCD2
    * lesson: 6 scans where 1 suffices). Per-user lags are µs-multiples in
    * ns, so integer DIV is exact and the DuckDB oracle hash-matches.
    */
  def funnel(events: DataFrame, idCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame =
    funnelRollup(stageTimes(events, idCol, typeCol, tsCol, stages),
      idCol, stages)

  /** Per-user first-qualifying time of each stage (`__t0`..`__tN`, one row
    * per user) — the funnel's sufficient statistic, shared by the batch
    * rollup above and the incremental streaming mirror
    * ([[graft.streaming.EventAnalyticsStream]]), so the chain semantics
    * exist once.
    */
  def stageTimes(events: DataFrame, idCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(idCol))
    var df = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(idCol), col(typeCol), col(tsCol))
      .withColumn("__t0",
        min(when(col(typeCol) === stages.head, col(tsCol))).over(w))
    for (i <- 1 until stages.size)
      df = df.withColumn(s"__t$i",
        min(when(col(typeCol) === stages(i) &&
          col(tsCol) > col(s"__t${i - 1}"), col(tsCol))).over(w))
    df.groupBy(col(idCol))
      .agg(min(col("__t0")).as("__t0"),
        (1 until stages.size).map(i => min(col(s"__t$i")).as(s"__t$i")): _*)
  }

  /** (stage, users, total_lag_us) rows from the per-user stage times. */
  def funnelRollup(perUser: DataFrame, idCol: String,
      stages: Seq[String]): DataFrame = {
    val totalCols = stages.indices.flatMap { i =>
      val lag =
        if (i == 0) lit(0L)
        else coalesce(sum(expr(s"(__t$i - __t${i - 1}) DIV 1000")), lit(0L))
      Seq(count(col(s"__t$i")).cast("long").as(s"__u$i"),
        lag.cast("long").as(s"__l$i"))
    }
    perUser.agg(totalCols.head, totalCols.tail: _*)
      .select(explode(array(stages.indices.map(i =>
        struct(lit(s"${i + 1}_${stages(i)}").as("stage"),
          col(s"__u$i").as("users"),
          col(s"__l$i").as("total_lag_us"))): _*)).as("__r"))
      .select(col("__r.*"))
  }

  /** Weekly retention cohorts: users bucketed by the week of their first
    * event, crossed with every week they were active →
    * (cohort_week, active_week, users). Weeks are identified by their
    * Monday DATE (`date_trunc('week')`), NOT a bare week-of-year number —
    * week numbers repeat every year, so a numeric bucket would merge week
    * 5 of 2024 with week 5 of 2025 (and put late-December dates "before"
    * their own cohort) on any corpus spanning a year boundary.
    *
    * Scale shape: one groupBy(user), one distinct on (user, week), one
    * user-keyed join, then an aggregate over weeks²-sized output.
    */
  def retentionCohorts(events: DataFrame, idCol: String,
      tsCol: String): DataFrame =
    cohortMatrix(userWeeks(events, idCol, tsCol), idCol)

  /** Distinct (user, Monday-of-week) activity — the retention sufficient
    * statistic (bounded by users × active weeks), shared with the
    * streaming mirror.
    */
  def userWeeks(events: DataFrame, idCol: String, tsCol: String): DataFrame =
    events.select(col(idCol),
      expr(s"CAST(date_trunc('week', timestamp_micros($tsCol DIV 1000)) AS DATE)")
        .as("__wk"))
      .distinct()

  /** (cohort_week, active_week, users) from the distinct user-week rows. */
  def cohortMatrix(userWeeks: DataFrame, idCol: String): DataFrame = {
    val cohorts = userWeeks.groupBy(col(idCol))
      .agg(min(col("__wk")).as("cohort_week"))
    val active = userWeeks.select(col(idCol), col("__wk").as("active_week"))
    cohorts.join(active, idCol)
      .groupBy(col("cohort_week"), col("active_week"))
      .agg(countDistinct(col(idCol)).as("users"))
  }

  /** Per-(event_type, day) HLL sketches of distinct users — q86's stage 1
    * and the streamed sketch table's per-batch partial
    * ([[graft.streaming.EventAnalyticsStream.sketchRollupStream]]).
    * Single-sourced so the batch query and its streaming mirror can never
    * drift on the day derivation (the events contract: `ts` long
    * ns-since-epoch, UTC session).
    */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        to_date(timestamp_micros(expr("ts DIV 1000"))).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))

  /** Per-type distinct-user rollup from a daily sketch table — answered
    * from sketch rows alone, never a raw-event rescan.
    */
  def distinctUsersRollup(daily: DataFrame): DataFrame =
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
}
