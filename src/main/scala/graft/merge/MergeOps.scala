package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6–S11 (SURVEY.md §2.1): Delta-MERGE semantics as plain DataFrame algebra.
  *
  * The reference drives every table write through Delta `MERGE`
  * (reference: src/ETL/Bronze-Ingestion-Orders.py:51-58,
  * src/ETL/Silver-DLQ-Customers.py:73-101,
  * src/ETL/Gold-Customer-Breakdown.py:55-62). With no Delta on the
  * classpath we re-express each MERGE shape as joins, which is also the
  * scale-friendly form: Catalyst is free to broadcast the small side or
  * shuffle on the keys, and AQE handles skew — none of which a row-by-row
  * merge loop would get.
  *
  * Deliberate divergence from SQL MERGE: keys compare **null-safely**
  * (`<=>`). A plain equality condition never matches NULL keys, so a NULL-
  * keyed row (e.g. a bronze row whose derived `year` partition is NULL
  * because its date failed to parse) would be re-inserted on every re-run —
  * breaking exactly the idempotence these merges exist to provide. The
  * reference inherits that leak from Delta; we fix it.
  */
object MergeOps {

  /** S10 (reference: src/ETL/CommonFunctions.py:39-59): the columns that
    * participate in a full-row merge condition — every column except
    * ingestion-time stamps.
    */
  def mergeKeyColumns(columns: Seq[String]): Seq[String] =
    columns.filterNot(_.contains("ingestion_time"))

  private def aligned(target: DataFrame, updates: DataFrame): DataFrame =
    updates.select(target.columns.map(col).toIndexedSeq: _*)

  /** Null-safe key condition against a copy of `keyed` whose key columns are
    * renamed with `prefix` (left_anti/left joins need unambiguous names).
    */
  private def renamedKeys(keyed: DataFrame, keys: Seq[String],
      prefix: String): (DataFrame, Column) = {
    // empty keys would crash the condition reduce with an opaque
    // 'empty.reduce' at plan-build time — name the contract instead
    require(keys.nonEmpty, "merge keys must be non-empty")
    val renamed = keys.foldLeft(keyed.select(keys.map(col).toIndexedSeq: _*).distinct()) {
      (d, c) => d.withColumnRenamed(c, s"$prefix$c")
    }
    val cond = keys.map(c => col(c) <=> col(s"$prefix$c")).reduce(_ && _)
    (renamed, cond)
  }

  /** S6/S7: `whenNotMatchedInsert` — append update rows whose key tuple is
    * absent from the target (idempotent re-ingestion). Returns the new table
    * content.
    */
  def insertIfAbsent(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val (targetKeys, cond) = renamedKeys(target, keys, "__t_")
    target.unionByName(aligned(target, updates).join(targetKeys, cond, "left_anti"))
  }

  /** S8: `whenMatchedUpdate` only — rewrite `setCols` of matched target rows
    * from the update side; unmatched target rows pass through, unmatched
    * update rows are dropped. Delta MERGE errors on multiple update matches
    * per target row; we resolve it deterministically by `dropDuplicates` on
    * the keys (documented divergence — the reference never feeds duplicate
    * update keys).
    */
  def updateMatched(target: DataFrame, updates: DataFrame, keys: Seq[String],
      setCols: Seq[String]): DataFrame = {
    val u0 = updates.dropDuplicates(keys)
      .select((keys ++ setCols).map(col).toIndexedSeq: _*)
    val u = keys.foldLeft(
      setCols.foldLeft(u0)((d, c) => d.withColumnRenamed(c, s"__u_$c"))) {
      (d, c) => d.withColumnRenamed(c, s"__k_$c")
    }.withColumn("__matched", lit(true))
    val cond = keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    target.join(u, cond, "left")
      .select(target.columns.toIndexedSeq.map {
        case c if setCols.contains(c) =>
          when(col("__matched"), col(s"__u_$c")).otherwise(col(c)).as(c)
        case c => col(c)
      }: _*)
  }

  /** S9: full upsert — matched target rows are replaced by their update row,
    * unmatched update rows are inserted (the gold refresh pattern). With
    * `deleteUnmatched` (MERGE's WHEN NOT MATCHED BY SOURCE THEN DELETE),
    * target grains absent from the update are dropped — required when the
    * update is a full recompute and grains can legitimately vanish (e.g. a
    * customer's latest-order city moved).
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
      deleteUnmatched: Boolean = false): DataFrame = {
    val u = aligned(target, updates).dropDuplicates(keys)
    val (updateKeys, cond) = renamedKeys(u, keys, "__u_")
    val kept =
      if (deleteUnmatched) target.limit(0)
      else target.join(updateKeys, cond, "left_anti")
    kept.unionByName(u)
  }

  /** [[upsert]] that ALSO emits the commit's exact row-level change feed
    * from the SAME full-outer join — the write-side-CDF production
    * story ([[graft.io.ParquetTable.overwriteWithChanges]]): a keyed
    * merge already pairs each matched target row with its update row, so
    * the multiset delta falls out for free —
    *
    *  - matched and IDENTICAL (all columns null-safe-equal): merged
    *    keeps the row, feed emits NOTHING (the strict feed contract:
    *    exactly the delta, no self-cancelling pairs);
    *  - matched and changed: feed = delete(old) + insert(new);
    *  - update-only key: insert; target-only key: delete under
    *    `deleteUnmatched`, else pass-through (no feed row).
    *
    * Output rows are built through ONE case-array explode off the single
    * join ([[scdType2]]'s rationale — a union of filtered projections
    * re-plans the join per branch). Returns (merged, feed); both derive
    * from the one join, so a caller executing them as two jobs should
    * persist — [[upsertInto]] is the commit-shaped wrapper that does.
    */
  /** The paired-row full-outer join both [[upsertWithFeed]] outputs
    * derive from — exposed as one frame so a commit can persist it once.
    */
  private def upsertJoined(target: DataFrame, updates: DataFrame,
      keys: Seq[String], preDeduped: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge keys must be non-empty")
    // the join below owns the scratch names __m, __t and __u_<col>; a
    // target already using __m/__t would be silently overwritten by the
    // withColumn calls (corrupting the matched/unmatched classification
    // and the emitted feed with it) — fail at plan time instead
    val reserved = target.columns.filter(c =>
      c == "__m" || c == "__t" || c.startsWith("__u_"))
    require(reserved.isEmpty,
      s"merge target columns may not use the reserved names __m, __t or " +
        s"__u_* (got ${reserved.mkString(", ")})")
    val tCols = target.columns.toIndexedSeq
    // preDeduped: the CDC paths dedup (and persist) the batch once for
    // their touched-partition planning — re-deduplicating here would
    // pay one more full exchange of the batch per commit for nothing
    val u0 =
      if (preDeduped) aligned(target, updates)
      else aligned(target, updates).dropDuplicates(keys)
    val uRen = tCols.foldLeft(u0.withColumn("__m", lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"__u_$c")
    }
    val t = target.withColumn("__t", lit(true))
    val cond = keys.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    t.join(uRen, cond, "full_outer")
  }

  private def fromJoined(joined: DataFrame,
      targetSchema: org.apache.spark.sql.types.StructType,
      deleteUnmatched: Boolean): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    val tCols = targetSchema.fields.map(_.name).toIndexedSeq
    val matched = col("__t").isNotNull && col("__m").isNotNull
    val identical = tCols.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    def tRow = struct(tCols.map(col): _*)
    def uRow = struct(tCols.map(c => col(s"__u_$c").as(c)): _*)
    // typed empty array so the when-branches coerce (array() alone is
    // array<null>, which poisons the common type)
    def rowType(extra: StructField*) =
      ArrayType(StructType(targetSchema.fields ++ extra))
    val merged = joined.select(explode(
        when(col("__m").isNotNull, array(uRow)) // matched or brand-new
          .otherwise(if (deleteUnmatched) array().cast(rowType())
            else array(tRow))).as("__r"))
      .select(col("__r.*"))
    def feedRow(r: Column, kind: String) = struct(
      (tCols.map(c => r.getField(c).as(c)) :+
        lit(kind).as("_change_type")): _*)
    val none = array().cast(rowType(StructField("_change_type", StringType)))
    val feed = joined.select(explode(
        when(matched && identical, none)
          .when(matched,
            array(feedRow(tRow, "delete"), feedRow(uRow, "insert")))
          .when(col("__t").isNull, array(feedRow(uRow, "insert")))
          .otherwise(if (deleteUnmatched) array(feedRow(tRow, "delete"))
            else none)).as("__r"))
      .select(col("__r.*"))
    (merged, feed)
  }

  /** PRECONDITION (both feed APIs): the TARGET is unique per key tuple —
    * the invariant these APIs themselves maintain (updates are deduped,
    * the seed commit is deduped), and the assumption under which
    * `merged ≡ upsert()` and the feed's strict exactness hold. A
    * duplicate-keyed target (only producible by writing the table
    * through some other path) would replicate the update row per target
    * copy — caught by `graft.cdf.verifyDeclaredChanges` in spec runs,
    * garbage-in-garbage-out otherwise (SQL MERGE's own multi-match
    * behavior class).
    */
  def upsertWithFeed(target: DataFrame, updates: DataFrame,
      keys: Seq[String],
      deleteUnmatched: Boolean = false): (DataFrame, DataFrame) =
    fromJoined(upsertJoined(target, updates, keys), target.schema,
      deleteUnmatched)

  /** Commit-shaped wrapper: upsert `updates` into a versioned table WITH
    * write-side change capture — reads the live version (or initializes
    * from `updates` with an all-insert feed), derives merged + feed from
    * ONE persisted join (both writes reuse it; released before return),
    * and commits through
    * [[graft.io.ParquetTable.overwriteWithChanges]]. After this, every
    * CDF consumer (gold IVM, `changesBetween` spans) reads O(changes)
    * feeds instead of diffing snapshots — the full production loop of
    * the write-side-CDF design on the MERGE path the reference actually
    * uses for its silver writes.
    */
  def upsertInto(spark: org.apache.spark.sql.SparkSession,
      table: graft.io.ParquetTable, updates: DataFrame, keys: Seq[String],
      deleteUnmatched: Boolean = false): graft.io.ParquetTable = {
    if (!table.exists) {
      // seed commit dedups like every other merge path — otherwise the
      // table starts duplicate-keyed and every later keyed merge on the
      // duplicated keys multiplies rows (the unique-key precondition).
      // No feed on the seed: a version-1 feed is DEAD WEIGHT by
      // construction (changesBetween spans read feeds of steps ≥ 2
      // only — v1 is always the base, never a step).
      return table.overwrite(updates.dropDuplicates(keys))
    }
    val current = table.read(spark)
    val joined = upsertJoined(current, updates, keys).persist()
    try {
      val (merged, feed) = fromJoined(joined, current.schema,
        deleteUnmatched)
      table.overwriteWithChanges(merged, feed)
    } finally { joined.unpersist(); () }
  }

  /** COPY-ON-WRITE keyed upsert into a PARTITIONED versioned table:
    * rewrite only the partitions the batch touches, hard-link the rest
    * (Delta MERGE's touched-file behavior at partition granularity —
    * the scale fix for [[upsertInto]]'s full-snapshot rewrite). Touched
    * = partitions of the update images ∪ partitions currently holding
    * the updated keys (the union covers rows a merge MOVES across
    * partitions: the destination gets the new image, the origin is
    * rewritten — or dropped outright via `alsoReplace` when the move
    * emptied it). The merge itself runs on the touched RESTRICTION of
    * the snapshot, so compute is O(|touched partitions| + |batch|), and
    * commits through [[graft.io.ParquetTable.replacePartitionsWithChanges]]
    * with the exact feed — downstream CDF/IVM consumers stay O(changes).
    * The touched-partition VALUES are collected to the driver (bounded:
    * partition counts are metadata-scale by design).
    */
  /** Touched-partition cap: beyond this many leaf values the literal
    * restriction predicate stops paying for itself (planning cost grows
    * with the disjunct count while the rewrite approaches the full
    * snapshot anyway) — the COW path falls back LOUDLY to the
    * full-snapshot merge. Overridable via -Dgraft.merge.maxTouchedParts.
    */
  private def maxTouchedParts: Int =
    sys.props.get("graft.merge.maxTouchedParts")
      .flatMap(_.toIntOption).getOrElse(4096)

  /** The touched-leaf restriction predicate over collected partition
    * values. Single partition column → ONE flat `IN` list (partition-
    * prunable, no expression-tree depth); multi-column → an OR of
    * per-leaf AND tuples, reduced as a BALANCED tree so a
    * thousands-of-partitions batch cannot build a deep left-leaning
    * Catalyst tree (planner stack depth is bounded by log₂ n, not n).
    * Null partition values keep the null-safe `<=>` form — they fail
    * loudly downstream in the replace commit, never silently.
    */
  def touchedPredicate(pCols: Seq[String],
      vals: Array[org.apache.spark.sql.Row]): Column = {
    def balanced(ps: IndexedSeq[Column]): Column =
      if (ps.length == 1) ps.head
      else {
        val (l, r) = ps.splitAt(ps.length / 2)
        balanced(l) || balanced(r)
      }
    val anyNull = vals.exists(r => pCols.indices.exists(r.isNullAt))
    if (pCols.size == 1 && !anyNull)
      col(pCols.head).isin(vals.map(_.get(0)).toIndexedSeq: _*)
    else balanced(vals.map { r =>
      pCols.zipWithIndex.map { case (c, i) =>
        col(c) <=> lit(r.get(i))
      }.reduce(_ && _)
    }.toIndexedSeq)
  }

  def upsertIntoPartitioned(spark: org.apache.spark.sql.SparkSession,
      table: graft.io.ParquetTable, updates: DataFrame,
      keys: Seq[String]): graft.io.ParquetTable =
    applyCdcPartitioned(spark, table, updates, None, keys,
      skipEmptyFeed = false)

  /** Layout-dispatching CDC merge: the COW touched-leaf path on
    * partitioned tables ([[applyCdcPartitioned]]), the full-snapshot
    * commit otherwise ([[applyCdcSnapshot]]) — one entry point for
    * callers (SQL MERGE lowering, the streamed CDC intake) that take
    * whatever handle the warehouse hands them.
    */
  def applyCdc(spark: org.apache.spark.sql.SparkSession,
      table: graft.io.ParquetTable, updates: DataFrame,
      deleteKeys: Option[DataFrame], keys: Seq[String],
      skipEmptyFeed: Boolean): graft.io.ParquetTable =
    if (table.partitionColumns.nonEmpty)
      applyCdcPartitioned(spark, table, updates, deleteKeys, keys,
        skipEmptyFeed)
    else applyCdcSnapshot(spark, table, updates, deleteKeys, keys,
      skipEmptyFeed)

  /** [[applyCdcPartitioned]]'s semantics on an UNPARTITIONED table:
    * deletes first, keyed upsert, exact feed, `skipEmptyFeed` replay
    * absorption — but the commit necessarily rewrites the full
    * snapshot ([[graft.io.ParquetTable.overwriteWithChanges]]; there
    * are no leaves to copy-on-write). That cost is announced loudly
    * per call: at scale a CDC consumer should sit on a partitioned
    * silver so the COW path runs instead.
    */
  def applyCdcSnapshot(spark: org.apache.spark.sql.SparkSession,
      table: graft.io.ParquetTable, updates: DataFrame,
      deleteKeys: Option[DataFrame], keys: Seq[String],
      skipEmptyFeed: Boolean): graft.io.ParquetTable = {
    if (!table.exists)
      // deletes against a table with no committed state are no-ops
      return table.overwrite(updates.dropDuplicates(keys))
    val current = table.read(spark)
    // dedup ONCE, persisted: the batch feeds the delete anti/semi joins
    // AND the upsert join — without the persist each action re-pays the
    // dedup exchange
    val u = updates.dropDuplicates(keys).persist()
    val dk = deleteKeys.map(_.select(keys.map(col): _*).distinct())
    val afterDel = dk.fold(current)(d => current.join(d, keys, "left_anti"))
    val delFeed = dk.map(d => current.join(d, keys, "left_semi")
      .withColumn("_change_type", lit("delete")))
    val joined = upsertJoined(afterDel, u, keys, preDeduped = true).persist()
    try {
      val (merged, upsFeed) = fromJoined(joined, afterDel.schema,
        deleteUnmatched = false)
      val feed = delFeed.fold(upsFeed)(_.unionByName(upsFeed)).persist()
      try {
        if (skipEmptyFeed && feed.isEmpty) table
        else {
          System.err.println(s"[MergeOps] CDC merge into UNPARTITIONED " +
            s"${table.path}: rewriting the full snapshot (v${table.version}" +
            ") — partition the table to get the copy-on-write merge path")
          table.overwriteWithChanges(merged, feed)
        }
      } finally { feed.unpersist(); () }
    } finally { joined.unpersist(); u.unpersist(); () }
  }

  /** The CDC generalization of [[upsertIntoPartitioned]]: one keyed
    * merge applying `updates` (full row images) AND `deleteKeys` (key
    * tuples to remove) copy-on-write — touched partitions only, exact
    * feed, hard links for the rest. Deletes apply FIRST, so an id
    * carried by both nets to its update image (the per-batch contract a
    * CDC intake wants). Touched = partitions of the update images ∪
    * partitions currently holding any updated OR deleted key — the same
    * move-covering union as the upsert-only form. With `skipEmptyFeed`
    * a batch whose exact feed is EMPTY (pure replay: identical
    * re-upserts, deletes of absent keys) commits NOTHING and returns
    * the table at its version — the streaming zero-churn contract,
    * reached through merge exactness. Batches touching more than
    * [[maxTouchedParts]] leaves fall back loudly to the full-snapshot
    * merge commit ([[graft.io.ParquetTable.overwriteWithChanges]]) —
    * correctness identical, cost logged.
    */
  def applyCdcPartitioned(spark: org.apache.spark.sql.SparkSession,
      table: graft.io.ParquetTable, updates: DataFrame,
      deleteKeys: Option[DataFrame], keys: Seq[String],
      skipEmptyFeed: Boolean): graft.io.ParquetTable = {
    require(table.partitionColumns.nonEmpty,
      "upsertIntoPartitioned needs a partitioned table — use upsertInto")
    if (!table.exists)
      // deletes against a table with no committed state are no-ops
      return table.overwrite(updates.dropDuplicates(keys))
    val pCols = table.partitionColumns
    // dedup ONCE, persisted: the deduped batch feeds the touched-set
    // planning (newParts, touchedKeys) AND the upsert join — without a
    // persist each of those actions re-pays the dedup exchange
    val u = updates.dropDuplicates(keys).persist()
    val dk = deleteKeys.map(_.select(keys.map(col): _*).distinct())
    val current = table.read(spark)
    val newParts = u.select(pCols.map(col): _*).distinct()
    val touchedKeys = dk.foldLeft(u.select(keys.map(col): _*).distinct()) {
      (a, d) => a.unionByName(d).distinct()
    }
    val oldParts = current.join(touchedKeys, keys, "left_semi")
      .select(pCols.map(col): _*).distinct()
    val touched = newParts.unionByName(oldParts).distinct().persist()
    try {
      // partition pruning restricts the snapshot read to touched leaves
      // (the values are literal after the collect; bounded: partition
      // counts are metadata-scale by design, and capped below)
      val vals = graft.io.JobLabel(spark, s"merge:touchedParts ${table.path}") {
        touched.collect()
      }
      if (vals.isEmpty) return table // nothing to do (empty batch)
      val overCap = vals.length > maxTouchedParts
      if (overCap)
        System.err.println(s"[MergeOps] batch touches ${vals.length} " +
          s"leaf partitions of ${table.path} (cap $maxTouchedParts) — " +
          "falling back to the full-snapshot merge commit; raise " +
          "-Dgraft.merge.maxTouchedParts to keep the COW path")
      val scope = if (overCap) current
        else current.filter(touchedPredicate(pCols, vals))
      val afterDel = dk.fold(scope)(d => scope.join(d, keys, "left_anti"))
      val delFeed = dk.map(d => scope.join(d, keys, "left_semi")
        .withColumn("_change_type", lit("delete")))
      val joined = upsertJoined(afterDel, u, keys, preDeduped = true)
        .persist()
      try {
        val (merged, upsFeed) = fromJoined(joined, afterDel.schema,
          deleteUnmatched = false)
        val feed0 = delFeed.fold(upsFeed)(_.unionByName(upsFeed)).persist()
        try {
          if (skipEmptyFeed && graft.io.JobLabel(spark,
              s"merge:feedEmpty? ${table.path}")(feed0.isEmpty)) table
          else if (overCap) table.overwriteWithChanges(merged, feed0)
          // the collected touched set IS the replacement cover (merged's
          // partition values ⊆ touched by construction: merged derives
          // from the touched restriction + update images, whose values
          // seeded the set) — hand it down instead of having the commit
          // re-collect it from two more distinct() jobs
          else table.replacePartitionsWithChangesCovering(merged, feed0,
            vals)
        } finally { feed0.unpersist(); () }
      } finally { joined.unpersist(); () }
    } finally { touched.unpersist(); u.unpersist(); () }
  }

  /** Seed an SCD Type 2 dimension from its first snapshot: every row becomes
    * the current version, open-ended (`valid_to` NULL, typed like
    * `effective` so later merges union cleanly).
    */
  def scdType2Init(updates: DataFrame, keys: Seq[String], attrs: Seq[String],
      effective: Column): DataFrame =
    updates.select((keys ++ attrs).map(col).toIndexedSeq: _*)
      .dropDuplicates(keys)
      .withColumn("valid_from", effective)
      .withColumn("valid_to", when(lit(false), effective))
      .withColumn("is_current", lit(true))

  /** SCD Type 2 history merge (Kimball slowly-changing dimension, the
    * `MERGE`-with-history pattern Delta users hand-roll). Target schema:
    * `keys ++ attrs ++ (valid_from, valid_to, is_current)`; `updates` is the
    * new snapshot (`keys ++ attrs`), `effective` the version timestamp.
    *
    *  - changed attributes → the current row is CLOSED (`valid_to =
    *    effective`, `is_current = false`) and a new open version inserted;
    *  - unchanged / absent-from-update keys → pass through untouched
    *    (an absent key means "no new observation", not a delete);
    *  - brand-new keys → inserted open;
    *  - closed history rows are never revisited.
    *
    * Keys and attribute changes compare null-safely (`<=>`), consistent
    * with the other merge shapes. The join is computed STRUCTURALLY once:
    * each joined row emits its 1-or-2 output rows (untouched | closed +
    * opened | opened-new) through one case-array explode, NOT through a
    * union of three filtered projections of the join — a union re-plans
    * the join per branch (filter pushdown specializes each copy, exchange
    * reuse misses, and the update/target sides get re-scanned per branch:
    * measured 6 scans of the fact table in the q39 plan), tripling the
    * join work at 100 TB. One join on the keys + a partition-local
    * explode; only the (cheap, pass-through) closed-history branch unions.
    */
  def scdType2(target: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], effective: Column): DataFrame = {
    require(keys.nonEmpty, "scdType2 keys must be non-empty")
    require(attrs.nonEmpty,
      "scdType2 attrs must be non-empty — a presence-only dimension has " +
        "no change to version; use insertIfAbsent")
    val tCols = target.columns.toIndexedSeq
    val u0 = updates.select((keys ++ attrs).map(col).toIndexedSeq: _*)
      .dropDuplicates(keys)
    val uRen = (keys ++ attrs).foldLeft(u0.withColumn("__m", lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"__u_$c")
    }
    val history = target.filter(!col("is_current"))
    val current = target.filter(col("is_current")).withColumn("__t", lit(true))
    val cond = keys.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    val joined = current.join(uRen, cond, "full_outer")
    val changed = col("__t").isNotNull && col("__m").isNotNull &&
      !attrs.map(a => col(a) <=> col(s"__u_$a")).reduce(_ && _)
    def asRow(cols: Seq[Column]): Column =
      struct(tCols.zip(cols).map { case (n, c) => c.as(n) }: _*)
    val untouchedRow = asRow(tCols.map(col))
    val closedRow = asRow(tCols.map {
      case "valid_to" => effective
      case "is_current" => lit(false)
      case c => col(c)
    })
    // update-side columns drive the opened rows (matched-changed rows have
    // both sides; brand-new keys have only the update side)
    val openedRow = asRow(tCols.map {
      case "valid_from" => effective
      case "valid_to" => when(lit(false), effective)
      case "is_current" => lit(true)
      case c if keys.contains(c) || attrs.contains(c) => col(s"__u_$c")
      case c => col(c)
    })
    val merged = joined.select(explode(
      when(changed, array(closedRow, openedRow))
        .when(col("__t").isNull, array(openedRow))
        .otherwise(array(untouchedRow))).as("__r"))
      .select(col("__r.*"))
    history.unionByName(merged)
  }
}
