package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

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
  *  - only the MAYBE-seen ids (true replays + false positives) reach the
  *    anti-join, and the log scan is filtered to exactly those ids — the
  *    predicate pushes to parquet, so the probe reads O(batch + FP) rows,
  *    not O(log).
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

  def load(file: Path): Option[BloomFilter] =
    if (!Files.exists(file)) None
    else {
      val in = Files.newInputStream(file)
      try Some(BloomFilter.readFrom(in)) finally in.close()
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
          val seeded = df.stat.bloomFilter(idCol, expectedIds, fpp)
          save(file, seeded)
          seeded
        case None => BloomFilter.create(expectedIds, fpp)
      }
    }

  /** Add `ids` to the filter and persist it (tmp + atomic move — a torn
    * write is never visible under the real name). MUST be called BEFORE
    * the ids are committed to the log (see the superset contract above).
    */
  def addAndSave(file: Path, bloom: BloomFilter, ids: Iterable[Any]): Unit = {
    ids.foreach(v => bloom.put(v.asInstanceOf[AnyRef]))
    save(file, bloom)
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
    * deduplicated on `idCol`) whose id is NOT in the seen-id log.
    *
    *  - `bloom = None` (no gate / legacy): the plain full anti-join.
    *  - All batch ids definitely unseen: returns `batch` as-is and NEVER
    *    invokes `readSeenIds` — zero log I/O (the spec pins this law).
    *  - Otherwise: anti-join against the log RESTRICTED to the maybe-seen
    *    ids — the isin predicate pushes into the parquet scan, so the
    *    probe is O(batch + FP) rows. Definitely-new rows pass the same
    *    anti-join untouched (they cannot match the restricted probe), so
    *    there is exactly one join, not a union of two branches.
    *
    * `batchIds` are the batch's distinct ids (callers collect them anyway
    * for bloom maintenance / touched-partition lists — batch-sized).
    */
  def freshRows(batch: DataFrame, idCol: String, batchIds: Seq[Any],
      bloom: Option[BloomFilter],
      readSeenIds: () => DataFrame): DataFrame =
    bloom match {
      case None =>
        batch.join(readSeenIds().select(col(idCol)), Seq(idCol), "left_anti")
      case Some(b) =>
        val maybe = batchIds.filter(v => b.mightContain(v.asInstanceOf[AnyRef]))
        if (maybe.isEmpty) batch
        else {
          val probed = readSeenIds().select(col(idCol))
            .filter(col(idCol).isin(maybe: _*))
          batch.join(probed, Seq(idCol), "left_anti")
        }
    }
}
