package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomFunctions

/** Bloom-gated replay probes for the streaming mirrors.
  *
  * Every at-least-once `foreachBatch` mirror ([[PackStream]],
  * [[IndexStream]]) absorbs redelivery by anti-joining the batch against
  * the accumulated log of already-seen ids. Correct — but the probe side
  * of that anti-join is a CORPUS-sized (column-pruned) scan per trigger,
  * the one per-trigger cost that grows with the corpus instead of the
  * batch. This gate puts a Bloom filter of the seen ids in front of it:
  *
  *  - ids the filter rules DEFINITELY UNSEEN skip the log probe entirely
  *    (the common all-fresh batch touches the log zero times);
  *  - only the MAYBE-seen ids (true replays + false positives) matter to
  *    the anti-join, and the log scan is restricted to them EXECUTOR-SIDE:
  *    their [min, max] range pushes into the parquet scan and the batch's
  *    own Bloom sketch rides the plan as a scan-stage predicate, so the
  *    probe materializes O(batch + FP) rows, not O(log) — and the driver
  *    never holds an id array or compiles an id list into the plan.
  *
  * Correctness never rests on the filter: the anti-join stays the
  * mechanism, the filter only PRUNES it — a false positive costs one
  * probed id, never a dropped row. The one invariant the gate must keep
  * is the SUPERSET contract: the filter must contain every id the log
  * contains (a missing id would route a replay around the anti-join and
  * duplicate it). Hence the write ordering [[addAndSave]] documents —
  * filter first, log second: a crash between the two strands ids in the
  * filter but not the log, which are harmless false positives, while the
  * reverse order would strand ids in the log but not the filter, which
  * is the data-duplicating direction.
  *
  * Saturation degrades gracefully: past `expectedIds` the FP rate rises
  * and the gate converges on the old full-probe behavior — never wrong,
  * just no longer cheap. Rebuild (reseed) on a maintenance window to
  * restore pruning. Single-writer per filter file, like the mirrors'
  * single-writer table contract.
  */
object ReplayGate {

  /** File name of the seen-ids filter, placed at a table's ROOT (next to
    * `_current`, not inside a version dir): the filter is a superset
    * ACROSS versions, so it must survive version swaps and vacuums.
    */
  val BloomFile = "_seen_ids.bloom"

  /** Fresh-row count at or below which [[commitToFilter]] updates the
    * filter DRIVER-side (collect the bounded id set, `putLong` each)
    * instead of running the distributed full-geometry sketch aggregate:
    * for a typical micro-batch the aggregate's per-task partial filters
    * are multi-MB (the persistent geometry), a per-trigger constant far
    * exceeding the 80 KB of longs this cutoff admits to the driver. This
    * is a BOUNDED collect (≤ cutoff longs), not the unbounded batch-id
    * array the gated probe was built to remove.
    */
  val SmallBatchCutoff = 10000L

  /** The id column normalized to the BIGINT domain every sketch and
    * probe in this gate operates on: BIGINT passes through (so the
    * maybe-id range still prunes parquet row groups in [[freshRows]]),
    * narrower integrals upcast (Catalyst unwraps the cast for pushdown),
    * and any other type (string keys etc.) maps through `xxhash64`. A
    * hash collision is one more Bloom false positive — routed to the
    * anti-join, which joins on the RAW id column, so correctness is
    * untouched. The normalization is part of the filter format: it is
    * applied identically by [[loadOrSeed]]'s seed, [[batchSketch]] /
    * [[probeSketch]], [[commitToFilter]] and [[freshRows]], so the
    * filter and its probes can never disagree on the domain.
    */
  private def idExpr(df: DataFrame, idCol: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case LongType => col(idCol)
      case ByteType | ShortType | IntegerType => col(idCol).cast(LongType)
      case _ => xxhash64(col(idCol))
    }
  }

  def load(file: Path): Option[BloomFilter] =
    if (!Files.exists(file)) None
    else {
      val in = Files.newInputStream(file)
      try Some(BloomFilter.readFrom(in)) finally in.close()
    }

  /** The ONE filter geometry for (expectedIds, fpp), applied to every
    * construction path — `BloomFilter.create` and the distributed
    * `bloom_filter_agg` ([[loadOrSeed]]'s seed, [[batchSketch]]) — so the
    * filters are always merge-compatible (same bit count, hash count and
    * V2 seed). Spark's aggregate clamps its item estimate and bit count
    * to the `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` session confs; this applies the SAME clamp up front
    * and passes the resolved values explicitly, so the clamp can never
    * desynchronize the two paths. Saturation past the clamp raises the
    * FP rate (degraded pruning), never correctness; a deployment with a
    * bigger id universe raises the confs — and must then delete the
    * filter file once so it reseeds at the new geometry (merging across
    * geometries fails loudly rather than corrupting).
    */
  private def geometry(spark: org.apache.spark.sql.SparkSession,
      expectedIds: Long, fpp: Double): (Long, Long) = {
    def conf(key: String, dflt: Long): Long =
      spark.conf.getOption(key).map(_.toLong).getOrElse(dflt)
    val maxItems = conf(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val maxBits = conf(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)
    (math.max(1L, math.min(expectedIds, maxItems)),
      math.max(1L, math.min(
        BloomFilter.optimalNumOfBits(expectedIds, fpp), maxBits)))
  }

  /** Load the filter, or SEED it from the full existing id log when the
    * log pre-dates the gate (one corpus-sized distributed pass — the
    * one-time migration cost; `df.stat.bloomFilter` aggregates on the
    * executors, only the filter bits reach the driver). Creating an EMPTY
    * filter next to a non-empty log would violate the superset contract
    * and re-append every replayed old id. `seenIds` is only invoked on
    * that migration path.
    */
  def loadOrSeed(file: Path, seenIds: () => Option[DataFrame], idCol: String,
      expectedIds: Long, fpp: Double = 0.01): BloomFilter =
    load(file).getOrElse {
      seenIds() match {
        case Some(df) =>
          val (items, bits) = geometry(df.sparkSession, expectedIds, fpp)
          val seeded = df.stat.bloomFilter(idExpr(df, idCol), items, bits)
          save(file, seeded)
          seeded
        case None =>
          val (items, bits) = geometry(
            org.apache.spark.sql.SparkSession.active, expectedIds, fpp)
          BloomFilter.create(items, bits)
      }
    }

  /** Add `ids` to the filter and persist it (tmp + atomic move — a torn
    * write is never visible under the real name). MUST be called BEFORE
    * the ids are committed to the log (see the superset contract above).
    * Driver-side iteration — for small known-cardinality callers (tests,
    * maintenance scripts); streaming mirrors use [[batchSketch]] +
    * [[mergeAndSave]] so ids never reach the driver.
    */
  def addAndSave(file: Path, bloom: BloomFilter, ids: Iterable[Any]): Unit = {
    ids.foreach(v => bloom.put(v.asInstanceOf[AnyRef]))
    save(file, bloom)
  }

  /** The batch's own id sketch at the PERSISTENT filter's geometry,
    * built by a DISTRIBUTED aggregate (only the filter bits reach the
    * driver — no id array ever does) — the [[mergeAndSave]] /
    * [[commitToFilter]] delta for LARGE batches, where the multi-MB
    * per-task partials amortize. Small batches take
    * [[commitToFilter]]'s driver path instead; the probe restriction in
    * [[freshRows]] uses the batch-sized [[probeSketch]].
    */
  def batchSketch(batch: DataFrame, idCol: String, expectedIds: Long,
      fpp: Double = 0.01): BloomFilter = {
    val (items, bits) = geometry(batch.sparkSession, expectedIds, fpp)
    batch.stat.bloomFilter(idExpr(batch, idCol), items, bits)
  }

  /** Default [[probeSketch]] sizing — 64 Ki ids. A deployment whose
    * micro-batches carry more distinct ids passes its real batch size
    * through the mirror entry points (IndexStream / PackStream /
    * RetrievalStream / GoldIncStream all expose `expectedBatch`):
    * saturating the sketch is never incorrect, but it drives the FP
    * rate toward 1 and the gated log probe silently degrades to a
    * near-full log anti-join — the O(batch + FP) bound only holds while
    * the sketch is sized for the batch.
    */
  val DefaultProbeBatch = 65536L

  /** The probe-restriction sketch for [[freshRows]], at BATCH-sized
    * geometry: it only has to have NO FALSE NEGATIVES over the batch
    * (any Bloom filter guarantees that at any size — undersizing only
    * raises the FP rate, i.e. extra probe-side rows, never a dropped
    * row), so sizing it like the persistent filter just inflated every
    * trigger's plan and aggregate partials by the full ~MB geometry for
    * a sketch that is discarded after one probe. At the default 64 Ki ×
    * 1 % geometry the serialized sketch is ~77 KB.
    */
  def probeSketch(batch: DataFrame, idCol: String,
      expectedBatch: Long = DefaultProbeBatch,
      fpp: Double = 0.01): BloomFilter =
    batch.stat.bloomFilter(idExpr(batch, idCol), expectedBatch,
      BloomFilter.optimalNumOfBits(expectedBatch, fpp))

  /** Fold the batch's sketch into the persistent filter and persist it —
    * the executor-side replacement for [[addAndSave]]'s driver-side id
    * iteration. The sketch covers ALL batch ids, fresh and replayed;
    * merging replayed ids is a no-op (they are already in the filter),
    * and the superset contract only needs every FRESH id present before
    * the log commit, which batch ⊇ fresh guarantees. MUST be called
    * BEFORE the fresh rows are committed to the log.
    */
  def mergeAndSave(file: Path, bloom: BloomFilter,
      sketch: BloomFilter): Unit = {
    bloom.mergeInPlace(sketch)
    save(file, bloom)
  }

  /** The per-trigger filter update the mirrors call once `fresh` is
    * known non-empty — MUST run BEFORE the log commit (superset
    * contract). Two paths by `freshCount`:
    *
    *  - ≤ `smallBatch` (the typical micro-batch): collect the BOUNDED
    *    normalized id set (≤ cutoff longs) and `putLong` driver-side —
    *    no full-geometry aggregate, and geometry-immune (putLong works
    *    against any on-disk geometry, so this path can never hit the
    *    incompatible-merge case at all);
    *  - larger: the distributed [[batchSketch]] delta merged in. A
    *    sketch/filter geometry mismatch (filter file from a release or
    *    session with different clamps) is NOT a poison pill: the filter
    *    is an optimization whose loss is harmless by design, so an
    *    incompatible merge logs a warning and RESEEDS at the current
    *    geometry from the seen-id log (`readSeenIds` — the pre-commit
    *    log, superset-complete for everything before this batch), then
    *    merges the same-geometry delta. The one-corpus-pass reseed
    *    replaces the old behavior of failing every subsequent trigger
    *    until the file was deleted by hand.
    */
  def commitToFilter(file: Path, bloom: BloomFilter, fresh: DataFrame,
      idCol: String, freshCount: Long, expectedIds: Long,
      readSeenIds: () => Option[DataFrame], fpp: Double = 0.01,
      smallBatch: Long = SmallBatchCutoff): Unit =
    if (freshCount <= smallBatch) {
      // NULL ids never enter the filter on ANY path (the distributed
      // bloom aggregate skips them too) — a null key also never matches
      // the log anti-join, so such rows are structurally un-dedupable
      // and stay the caller's contract; the filter update must not NPE
      // on them
      fresh.select(idExpr(fresh, idCol).as("__h")).distinct()
        .filter(col("__h").isNotNull)
        .collect().foreach(r => bloom.putLong(r.getLong(0)))
      save(file, bloom)
    } else {
      val sketch = batchSketch(fresh, idCol, expectedIds, fpp)
      try mergeAndSave(file, bloom, sketch)
      catch {
        case e: org.apache.spark.util.sketch.IncompatibleMergeException =>
          System.err.println(s"ReplayGate: filter at $file has a stale " +
            s"geometry (${e.getMessage}) — reseeding from the seen-id log")
          val reseeded = readSeenIds() match {
            case Some(df) =>
              val (items, bits) = geometry(df.sparkSession, expectedIds, fpp)
              df.stat.bloomFilter(idExpr(df, idCol), items, bits)
            case None =>
              val (items, bits) = geometry(
                org.apache.spark.sql.SparkSession.active, expectedIds, fpp)
              BloomFilter.create(items, bits)
          }
          mergeAndSave(file, reseeded, sketch)
      }
    }

  private def save(file: Path, bloom: BloomFilter): Unit = {
    Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    val out = Files.newOutputStream(tmp)
    try bloom.writeTo(out) finally out.close()
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The gated replay probe: rows of `batch` (already in-batch
    * deduplicated on `idCol` — any type: BIGINT passes through and gets
    * parquet row-group pruning from the maybe-id range, narrower
    * integrals upcast, other types hash through `xxhash64` (the range
    * then restricts post-scan; see [[idExpr]]) — whose id is NOT in the
    * seen-id log. Fully executor-side — no batch-id array ever reaches
    * the driver, and no literal id list is compiled into the plan (the
    * former `collect()` + `isin` shape breaks at large micro-batches:
    * a driver-resident id array plus a plan-embedded literal list).
    *
    *  - `bloom = None` (no gate / legacy): the plain full anti-join.
    *  - All batch ids definitely unseen: returns `batch` as-is and NEVER
    *    invokes `readSeenIds` — zero log I/O (the spec pins this law).
    *    Decided by ONE batch-sized job: the seen-filter probe runs as a
    *    codegen'd [[graft.functions.BloomMightContain]] predicate over
    *    the batch, and the same job's min/max yields the probe range
    *    (min is NULL exactly when no id is maybe-seen) — two scalars are
    *    the only values the driver sees.
    *  - Otherwise: anti-join against the log RESTRICTED executor-side —
    *    the maybe-seen ids' [min, max] range pushes into the parquet
    *    scan (row-group stats pruning), and the batch's own sketch
    *    ([[batchSketch]]) rides the plan as a broadcast-equivalent
    *    predicate evaluated in the scan stage, so the probe materializes
    *    O(batch + FP) rows, not O(log). Definitely-new rows pass the
    *    same anti-join untouched (they cannot match the restricted
    *    probe), so there is exactly one join, not a union of branches.
    *
    * Correctness never rests on either sketch: a seen-filter false
    * positive costs one probed id; a batch-sketch false positive costs
    * one extra probe-side row. The anti-join decides.
    */
  def freshRows(batch: DataFrame, idCol: String, bloom: Option[BloomFilter],
      batchSketch: Option[BloomFilter],
      readSeenIds: () => DataFrame): DataFrame =
    bloom match {
      case None =>
        batch.join(readSeenIds().select(col(idCol)), Seq(idCol), "left_anti")
      case Some(b) =>
        val seen = BloomFunctions.serialize(b)
        val range = batch
          .filter(BloomFunctions.mightContain(idExpr(batch, idCol), seen))
          .agg(min(idExpr(batch, idCol)), max(idExpr(batch, idCol))).head()
        if (range.isNullAt(0)) batch
        else {
          val sk = batchSketch.getOrElse(sys.error(
            "freshRows: the gated path needs the batch sketch " +
              "(ReplayGate.probeSketch) to restrict the log probe"))
          val log = readSeenIds().select(col(idCol))
          val logId = idExpr(log, idCol)
          val probed = log
            .filter(logId.between(range.getLong(0), range.getLong(1)) &&
              BloomFunctions.mightContain(logId,
                BloomFunctions.serialize(sk)))
          batch.join(probed, Seq(idCol), "left_anti")
        }
    }
}
