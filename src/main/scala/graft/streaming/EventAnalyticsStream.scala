package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.ParquetTable
import graft.northstar.{BpeLearn, EventOps}

/** Streaming mirrors of the q77 funnel / q78 retention event analytics —
  * incremental `foreachBatch` maintenance of each workload's sufficient
  * statistic in a versioned [[ParquetTable]], with the SAME
  * [[EventOps]] chain/matrix code computing the answer, so batch and
  * stream can never drift semantically (the dedup/sessionize mirrors'
  * pattern). Every micro-batch atomically refreshes a result table with
  * the funnel/retention over ALL events seen so far (complete-mode
  * semantics through the table pointer flip), and both state tables stay
  * compacted:
  *
  *  - Funnel state = per (user, stage) the event times that can still
  *    matter. The per-user chain times `t_i` are monotone non-increasing
  *    as events accumulate (more events only shrink each stage's
  *    first-qualifying min), so a stage-i time STRICTLY ABOVE the current
  *    `t_i` can never become a future `t_i` — it is dropped each batch.
  *    Kept: times ≤ `t_i` (they stay reachable if an earlier stage's time
  *    later drops) and all times of still-unreached stages. State is
  *    bounded by each user's pre-conversion activity; a production
  *    deployment would additionally bound it with a conversion-window
  *    TTL, the standard funnel contract.
  *  - Retention state = distinct (user, Monday-of-week) rows — bounded by
  *    users × active weeks, no compaction needed beyond distinct.
  *
  * Out-of-order and replayed events are absorbed exactly: both statistics
  * are set-valued (distinct unions), so arrival order and duplicates
  * cannot change the refreshed answer.
  */
object EventAnalyticsStream {

  /** Incremental q77: refresh `result` with the full-history funnel each
    * micro-batch; `state` holds the compacted (user, stage, ts) set.
    */
  def funnelStream(events: DataFrame, idCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], state: ParquetTable,
      result: ParquetTable): StreamingQuery = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        val incoming = batch.toDF()
          .filter(col(typeCol).isin(stages: _*))
          .select(col(idCol), col(typeCol), col(tsCol))
          .distinct() // MIN-based chain: duplicate events carry nothing
        // cached: the merged state feeds BOTH the chain computation and
        // the compaction join, and perUser feeds both writes — without
        // the cache each write re-runs the window cascade over the full
        // state
        val all =
          (if (state.exists) state.read(s).unionByName(incoming)
           else incoming).distinct().cache()
        try {
          val perUser = EventOps
            .stageTimes(all, idCol, typeCol, tsCol, stages).cache()
          try {
            // drop every stage-i time strictly above the current t_i — it
            // can never be a future first-qualifying time (monotonicity,
            // above)
            val stillRelevant = stages.indices.map { i =>
              col(typeCol) === stages(i) &&
                (col(s"__t$i").isNull || col(tsCol) <= col(s"__t$i"))
            }.reduce(_ || _)
            val compacted = all.join(perUser, Seq(idCol))
              .filter(stillRelevant)
              .select(col(idCol), col(typeCol), col(tsCol))
            // Writes may lazily re-scan the PRIOR state version (old
            // versions stay readable through the pointer flip, and the
            // cache is not pinned), so all overwrites run BEFORE the
            // vacuums; vacuuming then bounds disk at ~2 versions per
            // table instead of one per micro-batch forever. State and
            // result are derived, rebuildable data — the same retention
            // call IvfIndex.persist makes. Replay safety needs no
            // checkpointed offsets: both statistics are set-valued, so a
            // re-delivered batch is absorbed by the distinct.
            result.overwrite(EventOps.funnelRollup(perUser, idCol, stages))
            state.overwrite(compacted)
          } finally perUser.unpersist()
        } finally all.unpersist()
        state.vacuum(); result.vacuum()
        ()
      }
      .start()
  }

  /** Incremental q78: refresh `result` with the full-history cohort
    * matrix each micro-batch; `state` holds distinct (user, week) rows.
    */
  def retentionStream(events: DataFrame, idCol: String, tsCol: String,
      state: ParquetTable, result: ParquetTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        val incoming = EventOps.userWeeks(batch.toDF(), idCol, tsCol)
        // cached: cohortMatrix scans the user-week set twice (cohorts +
        // active sides) and the state write scans it again
        val all =
          (if (state.exists) state.read(s).unionByName(incoming)
           else incoming).distinct().cache()
        try {
          // result first — its plan may re-scan the prior state version,
          // which the vacuums below delete (see funnelStream)
          result.overwrite(EventOps.cohortMatrix(all, idCol))
          state.overwrite(all)
        } finally all.unpersist()
        state.vacuum(); result.vacuum()
        ()
      }
      .start()

  /** Incremental q86: maintain the per-(event_type, day) HLL sketch table
    * and refresh the per-type distinct-users rollup each micro-batch.
    * Sketches are the ideal streamed statistic: inserting a user is
    * idempotent (the same value drives the same register) and union is a
    * register-wise max, so replayed/duplicate deliveries are absorbed
    * exactly like the funnel/retention set-valued state — and
    * equal-config union is lossless, so the streamed estimate equals the
    * batch q86 over the same events, not merely approximates it. Per
    * micro-batch the raw events are touched ONCE (the incoming partial);
    * everything else is sketch-sized.
    */
  def sketchRollupStream(events: DataFrame, state: ParquetTable,
      result: ParquetTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        // the per-batch partial and the rollup are the SAME EventOps code
        // q86 runs, so batch and stream cannot drift on the day
        // derivation or rollup shape
        val incoming = EventOps.dailyUserSketches(batch.toDF())
        // cached: the rollup and the state write both read the merged
        // sketch table (days × types rows — KBs)
        val merged =
          (if (state.exists) state.read(s).unionByName(incoming)
           else incoming)
            .groupBy(col("event_type"), col("day"))
            .agg(hll_union_agg(col("sk")).as("sk"))
            .cache()
        try {
          // result first — its plan may re-scan the prior state version,
          // which the vacuums below delete (see funnelStream)
          result.overwrite(EventOps.distinctUsersRollup(merged))
          state.overwrite(merged)
        } finally merged.unpersist()
        state.vacuum(); result.vacuum()
        ()
      }
      .start()

  /** Incremental q88: maintain the corpus-wide BPE piece-count table from
    * a document stream and re-learn the merge table each micro-batch —
    * tokenizer-statistics maintenance over a continuous crawl. Unlike the
    * other mirrors' statistics, COUNTS are not idempotent under replay, so
    * absorption is id-keyed like [[IndexStream.ivfAppendStream]]: a
    * `seen` doc-id table anti-joins re-delivered documents out before
    * their pieces are counted (contract: `idCol` uniquely identifies a
    * document and re-sends carry identical text). Per micro-batch the raw
    * documents are touched once ([[BpeLearn.pieceCounts]], the SAME code
    * as q88's corpus stage); everything downstream — count merge, top-V
    * cap, the driver-side merge loop — is vocabulary-sized, so a batch
    * costs O(batch + vocab) however large the accumulated corpus.
    */
  def bpeStatsStream(docs: DataFrame, idCol: String, textCol: String,
      pattern: String, vocabCap: Int, numMerges: Int, seen: ParquetTable,
      state: ParquetTable, result: ParquetTable): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        // cached: feeds the piece count AND the seen-table append
        val fresh = {
          val b = batch.toDF().select(col(idCol), col(textCol))
            .dropDuplicates(idCol) // in-batch re-sends
          (if (seen.exists)
             b.join(seen.read(s).select(col(idCol)), Seq(idCol), "left_anti")
           else b).cache()
        }
        try {
          val incoming = BpeLearn.pieceCounts(fresh, textCol, pattern)
          // cached: the vocab collect and the state write both read it
          val merged =
            (if (state.exists) state.read(s).unionByName(incoming)
             else incoming)
              .groupBy(col("piece"))
              .agg(sum(col("weight")).as("weight"))
              .cache()
          try {
            val vocab = merged
              .orderBy(col("weight").desc, col("piece").asc)
              .limit(vocabCap)
              .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
            val merges = BpeLearn.learnMerges(vocab, numMerges)
            // result first — see funnelStream's vacuum-ordering note
            result.overwrite(s.createDataFrame(merges)
              .select(col("rank"), col("left"), col("right"), col("weight"),
                col("token")))
            state.overwrite(merged)
            val seenNow = fresh.select(col(idCol))
            if (seen.exists)
              seen.overwrite(seen.read(s).select(col(idCol))
                .unionByName(seenNow).distinct())
            else seen.overwrite(seenNow)
          } finally merged.unpersist()
        } finally fresh.unpersist()
        seen.vacuum(); state.vacuum(); result.vacuum()
        ()
      }
      .start()
}
