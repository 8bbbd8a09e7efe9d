package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.northstar.{CorpusClean, Dedup, TextAnalysis}

/** Streaming corpus intake — the continuous-crawl form of the batch corpus
  * pipeline. Documents arrive as files; the intake transform is the SAME
  * stateless Column algebra the batch path uses (PII scrub, then quality
  * gate), so micro-batch output is identical to a batch run by
  * construction — StreamingSpec proves the equivalence. Stateful stages
  * (dedup, decontamination) stay downstream in the batch layer, where the
  * full-corpus state lives; at 100 TB/day the intake runs per-file with
  * zero state and zero shuffles.
  */
object CorpusStream {

  /** File-stream source over the testdata documents parquet. A stream
    * source cannot infer its schema, so it is sniffed from the live file's
    * footer (a metadata-only batch read) rather than hardcoded — the
    * driver regenerates testdata between rounds and a silently drifted
    * column type would otherwise corrupt the stream (the events table's
    * ts column did exactly that; see [[EventStream.readEvents]]).
    */
  def readDocuments(spark: SparkSession, sfDir: String): DataFrame =
    graft.io.Tables.readStreamTable(spark, sfDir, "documents",
      // fallback for declaring the stream before any file has landed
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))

  /** PII scrub then quality gate, in that order — nothing downstream ever
    * sees unredacted text, and the gate scores the text that will actually
    * be trained on. Pure map-side predicates/projections: works identically
    * on a stream or a batch DataFrame.
    */
  def intake(docs: DataFrame,
      cfg: CorpusClean.Config = CorpusClean.Config()): DataFrame =
    CorpusClean.qualityFilter(
      docs.withColumn("text", TextAnalysis.redactPii(col("text"))),
      "text", cfg)

  final case class BandRow(doc_id: Long, ts: java.sql.Timestamp,
      band_id: Int, band_hash: Long)
  final case class BucketState(members: List[Long], lastTs: Long)
  final case class CandidatePair(id_a: Long, id_b: Long)

  /** Streaming near-duplicate CANDIDATE detection: the continuous-crawl
    * form of MinHash+LSH dedup. Each arriving document is shingled,
    * signed and banded with the SAME single-sourced expressions as the
    * batch path ([[Dedup.minhashSignaturesWith]]/[[Dedup.lshBandsWith]] —
    * so a pair collides here iff it collides in a batch run), then a
    * stateful operator keyed by (band_id, band_hash) emits a candidate
    * pair for every prior bucket member a new document lands next to.
    *
    * State is the LSH bucket membership itself — the minimum any
    * streaming LSH can carry — and it is BOUNDED by the watermark: a
    * bucket idle past `lateness` is evicted (event-time timeout), exactly
    * the dropDuplicatesWithinWatermark trade. A document arriving after
    * its near-twin's bucket expired pairs with nothing: at 100 TB/day the
    * alternative (unbounded bucket state) is not an option, and the batch
    * layer's incremental index (q69) catches cross-window pairs on its
    * own cadence.
    *
    * Candidates are emitted at-least-once (a pair colliding in several
    * bands, or re-sent doc ids, emits repeats) and UNVERIFIED — exact
    * Jaccard confirmation needs the shingle sets, which belong to the
    * batch verifier, not to per-bucket state. Downstream consumers
    * treat this stream as the trigger feed for verification, so repeats
    * are harmless and state stays minimal.
    */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, numPerm: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, lateness: String = "1 hour"): Dataset[CandidatePair] = {
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm) — and bands=0 would " +
        "divide-by-zero before any banding happens")
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(lateness))
    require(iv.months == 0, s"calendar-month lateness not supported: $lateness")
    val latenessMs = iv.days * 86400000L + iv.microseconds / 1000L
    val spark = docs.sparkSession
    import spark.implicits._

    // NULL event-time or NULL id rows are poison pills downstream: the
    // watermark late-filter KEEPS null-predicate rows, so a null ts would
    // reach update() and NPE (and a null id fails the primitive-Long
    // encoder) — crashing the query on every restart since the same file
    // re-reads. A null-keyed doc carries no dedup information; drop it.
    val clean = docs.filter(col(tsCol).isNotNull && col(idCol).isNotNull)
    val banded = Dedup.lshBandsWith(
      Dedup.minhashSignaturesWith(
        clean.withWatermark(tsCol, lateness), idCol, textCol,
        numPerm, shingleSize, carry = Seq(tsCol)),
      idCol, "__sig", bands, numPerm / bands, carry = Seq(tsCol))
      // NB: no cast on the event-time column — a Cast drops the watermark
      // metadata the stateful operator's analysis check looks for
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col("band_id"), col("band_hash"))
      .as[BandRow]

    def update(key: (Int, Long), rows: Iterator[BandRow],
        state: GroupState[BucketState]): Iterator[CandidatePair] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      // deterministic intra-batch order: event time, then id
      val arrived = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
      var members = state.getOption.map(_.members).getOrElse(Nil)
      val out = List.newBuilder[CandidatePair]
      arrived.foreach { r =>
        if (!members.contains(r.doc_id)) { // buckets are small by design
          members.foreach(m => out += CandidatePair(
            math.min(m, r.doc_id), math.max(m, r.doc_id)))
          members = r.doc_id :: members
        }
      }
      val lastTs = math.max(state.getOption.map(_.lastTs).getOrElse(0L),
        arrived.map(_.ts.getTime).max)
      state.update(BucketState(members, lastTs))
      state.setTimeoutTimestamp(lastTs + latenessMs)
      out.result().iterator
    }

    banded
      .groupByKey(r => (r.band_id, r.band_hash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
