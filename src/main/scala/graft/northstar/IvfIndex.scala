package graft.northstar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.io.ParquetTable

/** IVF (inverted-file) approximate nearest neighbor — the scale path beyond
  * LSH (BASELINE.json north-star: "an IVF or LSH-bucketed variant").
  *
  * Build: KMeans (seeded, deterministic) coarse-quantizes the corpus into
  * `nlist` cells; each vector is stored under its nearest centroid.
  * [[IvfIndex.persist]] writes that assignment through a cell-partitioned
  * [[ParquetTable]] — the FAISS inverted-list layout as a parquet
  * directory — so a probe scans only the `nprobe` probed cells' partitions
  * (PartitionFilters on `cell`), ~`nprobe / nlist` of the data.
  *
  * Search: score each query against the (tiny, broadcast-as-literal)
  * centroid table, take the `nprobe` nearest cells, then rank exact cosine
  * only within those cells. On a persisted index the probed cell set is
  * first resolved driver-side (a queries-only job — centroids are literals,
  * so it never touches the corpus) and pushed as a static partition filter;
  * this is FAISS's own probe order (pick lists, then scan lists) and keeps
  * the corpus scan pruned at plan time rather than relying on runtime DPP.
  */
final class IvfIndex private (val nlist: Int,
    val centroids: Array[(Int, Seq[Double])], val assigned: DataFrame,
    private val persisted: Boolean,
    private val tombstones: Option[DataFrame] = None) {

  /** Per-query distance to every centroid → the `nprobe` nearest cells,
    * exploded to one (query_id, __qv, cell) row per probed cell.
    */
  private def probeCells(queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int): DataFrame = {
    // Dimensionality guard: a query set whose vectors don't match the
    // index's centroid dims would otherwise fail deep inside the cosine
    // expression (or, worse, score wrong if the shorter prefix parses) —
    // surface it as a clear per-row error instead. One size() branch per
    // row, negligible next to the nlist cosine evaluations.
    val dims = centroids.headOption.map(_._2.length).getOrElse(0)
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.toDoubleVec(col(vecCol)).as("__qv"))
      .withColumn("__qv", VectorOps.dimsGuard(col("__qv"), dims, "IvfIndex"))
    // centroids ride along as literals (they are nlist × dims doubles)
    val cellScores = array(centroids.map { case (cell, c) =>
      struct((lit(-1.0) * GraftFunctions.cosine_sim(col("__qv"), typedLit(c)))
        .as("d"), lit(cell).as("cell"))
    }.toIndexedSeq: _*)
    q.withColumn("__cells",
        slice(array_sort(cellScores), 1, nprobe).getField("cell"))
      .select(col("query_id"), col("__qv"), explode(col("__cells")).as("cell"))
  }

  /** Per-query nprobe nearest cells → exact cosine rank within them. */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int): DataFrame = {
    val probedPlan = probeCells(queries, idCol, vecCol, nprobe)
    // On a persisted index, resolve the probed cells first and prune the
    // partitioned corpus statically. The probe job reads ONLY the query
    // set (cheap by definition); the collected set is ≤ queries × nprobe
    // rows — bounded by the serving contract. The SAME collected rows
    // then re-enter the join as a LOCAL relation instead of re-planning
    // the probe expression: the nlist × dims centroid-literal tree is
    // evaluated (and codegen'd) exactly once per search, and the join's
    // broadcast side is a plan-free LocalTableScan (doubles round-trip
    // the collect bit-exactly). The in-memory path skips all of this —
    // there is nothing to prune.
    val (corpus, probed) =
      if (persisted) {
        // the bounded-driver contract, ENFORCED rather than assumed: the
        // collected probe rows carry the dims-double __qv per row, so
        // driver memory is queries × nprobe × dims — a caller probing
        // with a corpus-sized "query set" would OOM the driver silently.
        // 1M rows ≈ 64 MB of vector payload at dims=64: far above any
        // serving batch, far below driver heap
        // (`-Dgraft.ivf.probeCollectCap=N` tunes it). The limit runs
        // DISTRIBUTED, so the driver never materializes past cap+1
        // rows; a probe set exceeding the cap degrades to the
        // distributed join path (slower planning, same results) with a
        // loud note, instead of failing a previously-working call.
        val cap = sys.props.get("graft.ivf.probeCollectCap")
          .flatMap(_.toIntOption).getOrElse(1000000)
        val rows = probedPlan.limit(cap + 1).collect()
        if (rows.length > cap) {
          System.err.println(s"[IvfIndex] probe set exceeds the " +
            s"$cap-row collect cap (queries × nprobe) — falling back " +
            "to the distributed probe join; split the query set or " +
            "raise -Dgraft.ivf.probeCollectCap for the pruned path")
          (assigned, probedPlan)
        } else {
          val cellIdx = probedPlan.schema.fieldIndex("cell")
          val cells = rows.map(_.getInt(cellIdx)).distinct.toIndexedSeq
          val local = queries.sparkSession.createDataFrame(
            java.util.Arrays.asList(rows: _*), probedPlan.schema)
          (assigned.filter(col("cell").isin(cells: _*)), local)
        }
      } else (assigned, probedPlan)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // deleted ids are masked AFTER cell pruning — broadcast anti-join over
    // the probed rows only (see [[AnnDeletes]]); a compacted index carries
    // no tombstones and pays nothing here
    AnnDeletes.alive(corpus, tombstones).join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        round(GraftFunctions.cosine_sim(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Write the inverted lists as a cell-partitioned versioned table and
    * return an index whose searches scan only probed partitions. Idempotent
    * layout (versioned dirs + atomic pointer) — safe to rebuild in place.
    * Superseded index versions are vacuumed by default (an index is derived
    * data — rebuildable, so history retention just multiplies storage);
    * pass `retainHistory = true` to keep them time-travelable.
    */
  def persist(spark: SparkSession, path: String,
      retainHistory: Boolean = false): IvfIndex = {
    val table = new ParquetTable(path, partitionColumns = Seq("cell"), captureStats = false)
    // cluster by cell before the partitioned write: without this every
    // upstream task fans out a file into every cell dir (tasks × nlist
    // small files); clustered, each inverted list is one contiguous file
    table.overwrite(assigned.repartition(col("cell")))
    if (!retainHistory) table.vacuum()
    // Quantizer sidecar: the centroids are the only state not already on
    // disk, so writing them (nlist × dims doubles — KBs) makes the index
    // RELOADABLE by a later session without refitting. Lives INSIDE the
    // live version dir (underscore-prefixed, so Spark's file index ignores
    // it): centroids and the inverted lists they quantized then live and
    // die together — a sidecar beside the v_* dirs could survive a rebuild
    // whose sidecar write crashed, silently pairing OLD centroids with NEW
    // lists. Atomicity mechanics live in [[graft.io.Sidecar]]; the header
    // records count AND dims so load can validate shape up front.
    val dims = centroids.headOption.map(_._2.length).getOrElse(0)
    val lines = s"nlist=${centroids.length};dims=$dims" +:
      centroids.map { case (i, c) => i + "," + c.mkString(",") }
    graft.io.Sidecar.write(java.nio.file.Paths.get(table.currentPath),
      IvfIndex.CentroidsFile, lines)
    // A full rebuild supersedes every prior delete: stale tombstones from
    // a previous index generation must not mask freshly re-ingested ids
    // (without this, the in-session index serves them but a cold load()
    // hides them — the two views disagree). Cleared AFTER the lists land:
    // a crash in between leaves ids masked (the conservative direction,
    // healed by the next compact/clear), never resurrects deleted rows.
    AnnDeletes.clear(spark, path)
    new IvfIndex(nlist, centroids, table.read(spark), persisted = true)
  }

  /** FAISS `add`: grow a [[persist]]ed index with `delta` vectors WITHOUT
    * refitting the quantizer — the coarse centroids are train-once state,
    * so new vectors are assigned to their nearest EXISTING cell (the same
    * [[IvfIndex.assignToCells]] kernel as build; a bulk rebuild with these
    * centroids assigns identically) and the inverted lists grow through
    * [[graft.io.ParquetTable.appendVersion]]: the new table version writes
    * only the delta's cells and hard-links every existing list file, so an
    * append costs O(|delta|) however large the corpus — the incremental
    * maintenance shape a 100 TB serving index needs (a nightly rebuild of
    * billion-scale lists is the alternative). The centroid sidecar rides
    * into the new version via the same link pass. Superseded versions are
    * vacuumed like [[persist]] does unless `retainHistory`.
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, vecCol: String,
      retainHistory: Boolean = false): IvfIndex = {
    require(persisted,
      "append grows a persisted index — call persist() first")
    val vecs = delta.select(col(idCol).as("neighbor_id"),
      Similarity.toDoubleVec(col(vecCol)).as("__cv"))
    // Delete-then-append: a re-added id must not stay masked by its old
    // tombstone, and its OLD physical row must not resurface either
    // (re-adds are UPDATES when payloads differ). When the delta
    // intersects the tombstone set, compact FIRST — the old rows leave
    // the lists physically and the tombstone table empties — then the
    // plain append lands the new rows. Crash between the two reads as
    // "still deleted" (the post-remove state), never as stale data.
    val readded = AnnDeletes.read(spark, path).exists(t =>
      !vecs.select(col("neighbor_id"))
        .join(t, Seq("neighbor_id"), "left_semi").isEmpty)
    val base = if (readded) compact(spark, path, retainHistory) else this
    val centers = base.centroids.sortBy(_._1).map(_._2.toArray)
    val assigned = IvfIndex.assignToCells(vecs, centers)
    val table = new ParquetTable(path, partitionColumns = Seq("cell"), captureStats = false)
    // cluster by cell for the same one-file-per-list layout as persist
    table.appendVersion(assigned.repartition(col("cell")))
    if (!retainHistory) table.vacuum()
    new IvfIndex(nlist, centroids, table.read(spark), persisted = true,
      tombstones = AnnDeletes.read(spark, path))
  }

  /** FAISS `remove_ids`, logical half: tombstone `ids` so no search can
    * surface them — O(|ids|), no inverted list rewritten (see
    * [[AnnDeletes]] for why eager per-delete list rewrites are the wrong
    * shape at 100 TB). [[compact]] folds the tombstones into the lists
    * physically when their count warrants the rewrite.
    */
  def remove(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String, retainHistory: Boolean = true): IvfIndex = {
    require(persisted,
      "remove tombstones a persisted index — call persist() first")
    AnnDeletes.add(spark, path, ids.select(col(idCol).as("neighbor_id")))
    // the enforced compaction policy: past the bound the mask's
    // broadcast would keep growing, so fold the tombstones into the
    // lists now ([[AnnDeletes.compactThreshold]]). retainHistory
    // defaults TRUE here (unlike explicit compact calls): whether a
    // logical delete trips the threshold is data-dependent, and a
    // time-traveling deployment must not lose versions to that side
    // effect — vacuum stays an explicit-compact decision
    if (AnnDeletes.overThreshold(spark, path))
      compact(spark, path, retainHistory)
    else new IvfIndex(nlist, centroids, assigned, persisted = true,
      tombstones = AnnDeletes.read(spark, path))
  }

  /** FAISS `remove_ids`, physical half: rewrite ONLY the inverted lists
    * that hold tombstoned ids ([[graft.io.ParquetTable.replacePartitions]]
    * — untouched lists ride along as hard links), then clear the
    * tombstone table. Lists first, tombstones second: a crash in between
    * leaves tombstones masking already-gone rows (harmless — the
    * anti-join no-ops and the next compact clears them); the reverse
    * order would resurrect deleted vectors. An inverted list that empties
    * COMPLETELY cannot be expressed through replacePartitions (no rows
    * carry its partition value), so that rare case takes the one full
    * rewrite via [[persist]] (which also re-writes the centroid sidecar).
    */
  def compact(spark: SparkSession, path: String,
      retainHistory: Boolean = false): IvfIndex = {
    require(persisted,
      "compact rewrites a persisted index — call persist() first")
    val table = new ParquetTable(path, partitionColumns = Seq("cell"), captureStats = false)
    AnnDeletes.read(spark, path).filter(!_.isEmpty).foreach { tombRaw =>
      val tomb = broadcast(tombRaw.select(col("neighbor_id")))
      val live = table.read(spark)
      val touched = live.join(tomb, Seq("neighbor_id"), "left_semi")
        .select(col("cell")).distinct().collect()
        .map(_.getInt(0)).toIndexedSeq // bounded: ≤ nlist ints
      if (touched.nonEmpty) {
        val survivors = live.filter(col("cell").isin(touched: _*))
          .join(tomb, Seq("neighbor_id"), "left_anti")
          .persist()
        val survivingCells = survivors.select(col("cell")).distinct()
          .collect().map(_.getInt(0)).toSet
        try {
          if (touched.forall(survivingCells)) {
            table.replacePartitions(survivors.repartition(col("cell")))
            if (!retainHistory) table.vacuum()
            ()
          } else {
            // an emptied list: full rewrite (persist re-writes lists AND
            // the centroid sidecar; a plain overwrite would drop the
            // sidecar from the new version and brick load())
            val all = live.join(tomb, Seq("neighbor_id"), "left_anti")
            new IvfIndex(nlist, centroids, all, persisted = false)
              .persist(spark, path, retainHistory)
            ()
          }
        } finally { survivors.unpersist(); () }
      }
    }
    AnnDeletes.clear(spark, path)
    new IvfIndex(nlist, centroids, table.read(spark), persisted = true)
  }
}

object IvfIndex {

  private[northstar] val CentroidsFile = "_centroids.csv"

  /** Reopen a [[persist]]ed index from disk — centroids from the sidecar,
    * inverted lists from the partitioned table — without refitting the
    * quantizer or rewriting anything. `None` when no complete index exists
    * at `path` (callers fall back to build+persist). This is the serving
    * path at scale: the index is built once per corpus version and probed
    * by many later jobs.
    */
  def load(spark: SparkSession, path: String): Option[IvfIndex] =
    // the sidecar resolves through the live-version pointer (it lives with
    // the lists it quantized); [[graft.io.Sidecar.read]] returns None on
    // any missing/broken state. The header declares centroid count AND
    // dims; any mismatch (torn write, a pre-header-format file, or a
    // centroid row whose dims disagree with the header) is treated as
    // no-index, not best-effort — the caller rebuilds from the corpus.
    graft.io.Sidecar.read(path, Seq("cell"), CentroidsFile).flatMap { all =>
      try {
        val HeaderRe = "nlist=(\\d+);dims=(\\d+)".r
        val declared = all.headOption.collect {
          case HeaderRe(n, d) => (n.toInt, d.toInt)
        }
        val body = all.drop(1)
        declared match {
          case Some((n, dims)) if n == body.length && body.nonEmpty =>
            val centroids = body.map { line =>
              val parts = line.split(',')
              (parts.head.toInt, parts.tail.map(_.toDouble).toSeq)
            }.toArray
            if (centroids.exists(_._2.length != dims)) None
            else {
              val table = new ParquetTable(path, partitionColumns = Seq("cell"), captureStats = false)
              // tombstoned deletes survive a cold reload — the mask is
              // part of the index state, not the session
              Some(new IvfIndex(centroids.length, centroids,
                table.read(spark), persisted = true,
                tombstones = AnnDeletes.read(spark, path)))
            }
          case _ => None
        }
      } catch { case _: Exception => None }
    }

  /** Fit the coarse quantizer and assign every corpus vector to its cell.
    * The quantizer trains on a bounded deterministic sample (~256 vectors
    * per cell, the FAISS heuristic) — and because the sample is bounded BY
    * DESIGN (nlist × 256 vectors, a few MB at any corpus size), training
    * runs driver-side: one collect of the sample, then seeded kmeans++ +
    * Lloyd locally. This is FAISS's own shape — the coarse quantizer is
    * always trained single-node on a subsample; only the cheap one-pass
    * assignment sees every vector. (The previous distributed MLlib fit
    * spent ~15 Spark jobs of pure scheduling overhead on a 4k-row sample.)
    *
    * Assignment is map-side Column algebra: argmin over cells of
    * ‖c‖² − 2·v·c (the ‖v‖² term is constant per row), with the dot
    * product on the native fused expression — no shuffle, no UDF, and at
    * 100 TB the assignment pass pipelines into the partitioned index write.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L): IvfIndex = {
    import graft.functions.GraftFunctions
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.toDoubleVec(col(vecCol)).as("__cv"))
    // deliberately NOT cached: the cache would pin the ENTIRE corpus
    // vector projection in executor storage for the session's lifetime to
    // save one extra (map-side) scan — at real corpus sizes that evicts
    // useful caches and spills, a bad trade for avoiding a linear re-read
    val trainTarget = nlist * 256
    // Bounded deterministic sample WITHOUT a count job: the first
    // trainTarget vectors by id (TakeOrdered — no full sort, no extra
    // corpus pass to size a Bernoulli fraction). Fraction sampling was
    // also only pseudo-deterministic: seeded Bernoulli membership is
    // per-partition, so a different scan layout changed the training
    // set; first-N-by-id cannot. FAISS likewise trains on whatever
    // bounded subset it is handed — ids carry no embedding information
    // here, so prefix-by-id is as unbiased as a random draw.
    val sample = vecs
      .orderBy(col("neighbor_id")).limit(trainTarget)
      .select(col("__cv")).collect().map(_.getSeq[Double](0).toArray)
    val centers = LocalKMeans.fit(sample, nlist, seed, maxIter = 10)
    val assigned = assignToCells(vecs, centers)
    val centroids = centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    new IvfIndex(nlist, centroids, assigned, persisted = false)
  }

  /** Nearest-centroid cell per (neighbor_id, __cv) row. Assignment IS
    * product quantization with m=1, ksub=|centers|: the native fused
    * kernel computes the same argmin over ‖c‖² − 2·v·c (same
    * ascending-index fold, same smallest-index tiebreak) as the previous
    * array_min-over-struct Column form — which measured ~0.5 ms/row, the
    * dominant cost of every IVF build action. Shared by [[build]] and
    * [[IvfIndex.append]] so a bulk build and an incremental append can
    * never disagree on a cell.
    */
  private[graft] def assignToCells(vecs: DataFrame,
      centers: Array[Array[Double]]): DataFrame = {
    val cellCb = new graft.functions.PqCodebook(
      centers.flatMap(_.toSeq), 1, centers.length)
    vecs.withColumn("cell",
      org.apache.spark.sql.GraftBridge.toColumn(graft.functions.PqEncode(
        org.apache.spark.sql.GraftBridge.toExpression(col("__cv")), cellCb))
        .getItem(0))
      .select(col("neighbor_id"), col("__cv"), col("cell"))
  }
}

/** Seeded, deterministic kmeans++ + Lloyd over a driver-resident sample.
  * Exists because the IVF coarse quantizer's training set is bounded by
  * design (nlist × 256 points) — distributing that fit buys nothing and
  * costs a Spark job per iteration. Determinism: the caller hands points
  * in a deterministic order and a fixed seed; every step below is
  * sequential arithmetic, so centers are bit-stable across runs, retries,
  * and cluster topologies.
  */
private[northstar] object LocalKMeans {

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** kmeans++ seeding (Arthur & Vassilvitskii, SODA 2007) then Lloyd
    * iterations with early exit on stable assignment. An empty cluster
    * keeps its previous center (FAISS does the same); k is clamped to the
    * number of points.
    */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot fit a quantizer on an empty sample")
    val kk = math.min(k, points.length)
    val rnd = new java.util.Random(seed)
    val n = points.length
    // ---- kmeans++ init ----
    val centers = new Array[Array[Double]](kk)
    centers(0) = points(rnd.nextInt(n))
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var total = 0.0
      var i = 0
      while (i < n) {
        val d = dist2(points(i), centers(c - 1))
        if (d < minD(i)) minD(i) = d
        total += minD(i)
        i += 1
      }
      var r = rnd.nextDouble() * total
      var pick = 0
      while (pick < n - 1 && r > minD(pick)) { r -= minD(pick); pick += 1 }
      centers(c) = points(pick)
      c += 1
    }
    // ---- Lloyd ----
    val assign = Array.fill(n)(-1)
    var iter = 0
    var changed = true
    while (iter < maxIter && changed) {
      changed = false
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          val d = dist2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        if (assign(i) != best) { assign(i) = best; changed = true }
        i += 1
      }
      if (changed) {
        val sums = Array.fill(kk)(new Array[Double](points(0).length))
        val counts = new Array[Int](kk)
        i = 0
        while (i < n) {
          val a = assign(i)
          counts(a) += 1
          val p = points(i)
          var d = 0
          while (d < p.length) { sums(a)(d) += p(d); d += 1 }
          i += 1
        }
        var j = 0
        while (j < kk) {
          if (counts(j) > 0) {
            var d = 0
            while (d < sums(j).length) { sums(j)(d) /= counts(j); d += 1 }
            centers(j) = sums(j)
          } // empty cluster: keep the previous center
          j += 1
        }
      }
      iter += 1
    }
    centers
  }
}
