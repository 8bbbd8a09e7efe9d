package graft.northstar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** IVFADC — the composed FAISS serving shape (Jégou et al. TPAMI 2011,
  * §IV): IVF coarse cells prune WHICH rows a probe scans
  * ([[IvfIndex]], q50) while product-quantized residual codes shrink WHAT
  * each scanned row costs ([[ProductQuantizer]], q81). At 100 TB the two
  * are multiplicative — a probe touches nprobe/nlist of the corpus, and
  * touches it as m-byte codes instead of float vectors — which is why
  * this, not flat PQ or plain IVF, is the deployment geometry for
  * billion-scale ANN.
  *
  * The residual trick: each corpus vector is stored as its CELL's
  * centroid plus a PQ-coded remainder, v = c(cell) + r. Residuals are
  * clustered tightly around the origin regardless of how spread the
  * corpus is, so the same m × ksub codebook budget quantizes them with
  * far less error than raw vectors. Scoring decomposes exactly:
  * q·v = q·c + q·r, where q·c is computed per probed CELL (nprobe terms
  * per query, centroids as literals — not per row) and q·r comes from the
  * fused ADC kernel over the codes. The decomposition is exact; only r's
  * quantization approximates.
  *
  * Spark shapes, all audited elsewhere: residual encode is one broadcast
  * join (nlist-row centroid frame) + the map-side
  * [[graft.functions.VecSub]] and [[graft.functions.PqEncode]] fused
  * kernels; the probe is a broadcast hash join of
  * the (queries × nprobe)-row probe frame into the coded corpus on
  * `cell` — the q50 join, never a BNLJ — followed by the q81 ADC
  * shortlist + bounded exact re-rank.
  */
final class IvfPqIndex private (val centroids: Array[(Int, Seq[Double])],
    val pq: ProductQuantizer, coded: DataFrame,
    private val persisted: Boolean,
    private val tombstones: Option[DataFrame] = None) {

  /** Top-k per query. `nprobe` bounds the scanned cells (scan-side knob),
    * `rerank` bounds the exact re-rank window (memory-side knob) —
    * separable accuracy levers, gated together in
    * [[graft.tools.Accuracy]].
    */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int, rerank: Int = 8): DataFrame = {
    val q = VectorOps.unitVecs(queries, idCol, vecCol, "query_id", "__qv")
      .withColumn("__qv",
        VectorOps.dimsGuard(col("__qv"), pq.dims, "IvfPqIndex"))
    // Probe scoring per cell carries BOTH the ranking key (cosine to the
    // centroid, the q50 probe order) and the scoring offset q·c — derived
    // per (query × cell), so the per-ROW ADC term never needs a dynamic
    // centroid lookup (the element_at-by-cell trap q81's kernels were
    // built to avoid). q is unit-normalized, so q·c = cos(q,c)·‖c‖ with
    // ‖c‖ a per-cell SCALAR — recovering the dot from the cosine halves
    // the probe's literal tree (16 more 64-double centroid literals and
    // their dot_product expressions would otherwise double plan size and
    // planning time for a value already computed).
    val cellScores = array(centroids.map { case (cell, c) =>
      val cnorm = math.sqrt(c.map(x => x * x).sum)
      struct((lit(-1.0) * GraftFunctions.cosine_sim(col("__qv"), typedLit(c)))
        .as("d"), lit(cell).as("cell"), lit(cnorm).as("cnorm"))
    }.toIndexedSeq: _*)
    val probedPlan = q.withColumn("__cells",
        slice(array_sort(cellScores), 1, nprobe))
      .select(col("query_id"), col("__qv"),
        explode(col("__cells")).as("__p"))
      .select(col("query_id"), col("__qv"), col("__p.cell").as("cell"),
        (lit(-1.0) * col("__p.d") * col("__p.cnorm")).as("__qdotc"))
    // On a persisted index, resolve the probed cells first and prune the
    // cell-partitioned code table statically (the IvfIndex.search probe
    // order: pick lists, then scan lists). The probe job touches only the
    // bounded query set — centroids are literals — and its collected
    // rows re-enter the join as a LOCAL relation, so the nlist × dims
    // literal tree is evaluated and codegen'd exactly once per search
    // (doubles round-trip the collect bit-exactly; see IvfIndex.search).
    val (corpus, probed) =
      if (persisted) {
        val rows = probedPlan.collect()
        val cellIdx = probedPlan.schema.fieldIndex("cell")
        val cells = rows.map(_.getInt(cellIdx)).distinct.toIndexedSeq
        val local = queries.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), probedPlan.schema)
        (coded.filter(col("cell").isin(cells: _*)), local)
      } else (coded, probedPlan)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // deleted ids are masked AFTER cell pruning — broadcast anti-join
    // over the probed rows only (see [[AnnDeletes]])
    val scanned = AnnDeletes.alive(corpus, tombstones)
      .join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__score",
        col("__qdotc") + pq.adcDot(col("__qv"), col("__codes")))
    if (persisted) {
      // The ADC rank window is the probe's only corpus-sized shuffle, so
      // it must move SLIM rows: (query_id, neighbor_id, __score) — not
      // the kilobyte rows that carrying both 64-double vector payloads
      // through the exchange would make (measured 8× the shuffled bytes
      // and 2× the wall at the bench tier; at 100 TB the rank shuffle IS
      // the serving cost). The exact re-rank then re-attaches vectors
      // for the BOUNDED shortlist only: a broadcast join of the
      // k×rerank×|queries| survivors into the same cell-pruned lists —
      // column pruning reads (neighbor_id, __cv) and leaves the codes
      // unread — plus the tiny query frame for __qv. Row-identical to
      // the single-pass shape: same ADC scores, same (score, id) and
      // (cosine, id) tiebreaks, same vectors.
      val shortlist = scanned
        .select(col("query_id"), col("neighbor_id"), col("__score"))
        .withColumn("__arank", row_number().over(wAdc))
        .filter(col("__arank") <= k * rerank)
        .select(col("query_id"), col("neighbor_id"))
      // the re-rank's query vectors come from the SAME local probe
      // relation (distinct per query), not a re-scan of the query frame
      val qLocal = probed.select(col("query_id"), col("__qv")).distinct()
      corpus.select(col("neighbor_id"), col("__cv"))
        .join(broadcast(shortlist), Seq("neighbor_id"))
        .join(broadcast(qLocal), Seq("query_id"))
        .withColumn("cosine",
          round(GraftFunctions.cosine_sim(col("__qv"), col("__cv")), 6))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rank"))
    } else
      // in-memory build-path search: the coded frame is COMPUTED, so a
      // shortlist rescan would re-encode the corpus — keep the
      // single-pass shape (callers at scale always probe persisted)
      scanned
        .withColumn("__arank", row_number().over(wAdc))
        .filter(col("__arank") <= k * rerank)
        .withColumn("cosine",
          round(GraftFunctions.cosine_sim(col("__qv"), col("__cv")), 6))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rank"))
  }

  /** Per-cell coded-list sizes — the build-side observable, mirroring
    * q50's inverted-list census with the code payload attached.
    */
  def cellSizes(): DataFrame =
    coded.groupBy(col("cell")).agg(count(lit(1)).as("vectors"))

  /** Write the coded inverted lists as a cell-partitioned versioned table
    * plus a model sidecar (centroids AND PQ codebooks — KBs) inside the
    * live version dir, so a later session reopens the index without
    * refitting anything ([[IvfPqIndex.load]]). Same crash-safety story as
    * [[IvfIndex.persist]]: the sidecar lives and dies with the lists it
    * describes, written tmp-then-atomic-rename, and any shape mismatch on
    * load reads as no-index (→ rebuild), never as a silent mix of old
    * model and new lists.
    */
  def persist(spark: SparkSession, path: String,
      retainHistory: Boolean = false): IvfPqIndex = {
    val table = new graft.io.ParquetTable(path, partitionColumns = Seq("cell"), captureStats = false)
    table.overwrite(coded.repartition(col("cell")))
    if (!retainHistory) table.vacuum()
    val dims = pq.dims
    val header =
      s"nlist=${centroids.length};dims=$dims;m=${pq.m};ksub=${pq.ksub}"
    val centLines = centroids.map { case (i, c) =>
      "cent," + i + "," + c.mkString(",")
    }
    val cbLines = for {
      s <- 0 until pq.m; j <- 0 until pq.ksub
    } yield "cb," + s + "," + j + "," + pq.codebooks(s)(j).mkString(",")
    graft.io.Sidecar.write(java.nio.file.Paths.get(table.currentPath),
      IvfPqIndex.ModelFile, header +: (centLines ++ cbLines))
    // a full rebuild supersedes every prior delete — clear stale
    // tombstones so warm and cold views agree (see [[IvfIndex.persist]])
    AnnDeletes.clear(spark, path)
    new IvfPqIndex(centroids, pq, table.read(spark), persisted = true)
  }

  /** FAISS IVFADC `add`: grow a [[persist]]ed index with `delta`
    * vectors WITHOUT refitting anything — centroids AND the residual
    * codebooks are train-once state (the [[IvfIndex.append]] contract
    * extended to the coded layout). Each delta vector runs the exact
    * build path against the EXISTING model: unit-normalize → assign to
    * its nearest existing cell (the shared [[IvfIndex.assignToCells]]
    * kernel) → residual against that centroid → encode with the
    * existing codebooks — so an appended vector carries bit-identical
    * (cell, codes) to a bulk encode of the same corpus under the same
    * model (spec-gated). The coded lists grow through
    * [[graft.io.ParquetTable.appendVersion]] (hard-linked ride-along:
    * O(|delta|) written bytes at any corpus size); the model sidecar
    * rides into the new version via the same link pass. Delete-then-
    * append compacts first, like [[IvfIndex.append]], so a re-added id
    * neither stays masked nor resurrects its old codes.
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, vecCol: String,
      retainHistory: Boolean = false): IvfPqIndex = {
    require(persisted,
      "append grows a persisted index — call persist() first")
    val unit = VectorOps.unitVecs(delta, idCol, vecCol, "neighbor_id", "__cv")
    val readded = AnnDeletes.read(spark, path).exists(t =>
      !unit.select(col("neighbor_id"))
        .join(t, Seq("neighbor_id"), "left_semi").isEmpty)
    val base = if (readded) compact(spark, path, retainHistory) else this
    val centArr = base.centroids.sortBy(_._1).map(_._2.toArray)
    val assigned = IvfIndex.assignToCells(unit, centArr)
    import spark.implicits._
    val centroidDf = broadcast(base.centroids.toSeq.toDF("cell", "__cent"))
    val coded = assigned.join(centroidDf, Seq("cell"))
      .withColumn("__res", {
        import org.apache.spark.sql.GraftBridge
        GraftBridge.toColumn(graft.functions.VecSub(
          GraftBridge.toExpression(col("__cv")),
          GraftBridge.toExpression(col("__cent"))))
      })
      .withColumn("__codes", base.pq.encode(col("__res")))
      .select(col("cell"), col("neighbor_id"), col("__cv"), col("__codes"))
    val table = new graft.io.ParquetTable(path, partitionColumns = Seq("cell"), captureStats = false)
    // cluster by cell for the same one-file-per-list layout as persist
    table.appendVersion(coded.repartition(col("cell")))
    if (!retainHistory) table.vacuum()
    new IvfPqIndex(centroids, pq, table.read(spark), persisted = true,
      tombstones = AnnDeletes.read(spark, path))
  }

  /** FAISS `remove_ids`, logical half — same contract as
    * [[IvfIndex.remove]]: O(|ids|) tombstone append, searches mask the
    * ids via a broadcast anti-join until [[compact]].
    */
  def remove(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String, retainHistory: Boolean = true): IvfPqIndex = {
    require(persisted,
      "remove tombstones a persisted index — call persist() first")
    AnnDeletes.add(spark, path, ids.select(col(idCol).as("neighbor_id")))
    // enforced compaction policy — see [[IvfIndex.remove]]: a
    // data-dependent triggered compact must not vacuum history, so
    // retainHistory defaults TRUE here (vacuum is explicit-compact-only)
    if (AnnDeletes.overThreshold(spark, path))
      compact(spark, path, retainHistory)
    else new IvfPqIndex(centroids, pq, coded, persisted = true,
      tombstones = AnnDeletes.read(spark, path))
  }

  /** FAISS `remove_ids`, physical half — same mechanics and crash
    * ordering as [[IvfIndex.compact]]: rewrite only the touched coded
    * lists (hard-linked rest), clear tombstones second; an emptied list
    * takes the full [[persist]] rewrite (which re-writes the model
    * sidecar too).
    */
  def compact(spark: SparkSession, path: String,
      retainHistory: Boolean = false): IvfPqIndex = {
    require(persisted,
      "compact rewrites a persisted index — call persist() first")
    val table = new graft.io.ParquetTable(path,
      partitionColumns = Seq("cell"), captureStats = false)
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
            val all = live.join(tomb, Seq("neighbor_id"), "left_anti")
            new IvfPqIndex(centroids, pq, all, persisted = false)
              .persist(spark, path, retainHistory)
            ()
          }
        } finally { survivors.unpersist(); () }
      }
    }
    AnnDeletes.clear(spark, path)
    new IvfPqIndex(centroids, pq, table.read(spark), persisted = true)
  }
}

object IvfPqIndex {

  private[northstar] val ModelFile = "_ivfpq_model.csv"

  /** Reopen a [[IvfPqIndex.persist]]ed index — centroids + codebooks from
    * the sidecar, coded lists from the partitioned table — without
    * refitting. `None` on any missing/torn/shape-mismatched state
    * (callers fall back to build+persist). This is the serving path: the
    * index is built once per corpus version and probed by many later
    * jobs.
    */
  def load(spark: SparkSession, path: String): Option[IvfPqIndex] =
    graft.io.Sidecar.read(path, Seq("cell"), ModelFile).flatMap { all =>
      try {
        val HeaderRe = "nlist=(\\d+);dims=(\\d+);m=(\\d+);ksub=(\\d+)".r
        all.headOption.collect {
          case HeaderRe(n, d, m, k) => (n.toInt, d.toInt, m.toInt, k.toInt)
        }.flatMap { case (nlist, dims, m, ksub) =>
          val body = all.drop(1)
          val cents = body.filter(_.startsWith("cent,")).map { line =>
            val p = line.split(',')
            (p(1).toInt, p.drop(2).map(_.toDouble).toSeq)
          }
          val cbs = body.filter(_.startsWith("cb,")).map { line =>
            val p = line.split(',')
            ((p(1).toInt, p(2).toInt), p.drop(3).map(_.toDouble))
          }.toMap
          val shapeOk = cents.length == nlist && cbs.size == m * ksub &&
            cents.forall(_._2.length == dims) &&
            (0 until m).forall(s => (0 until ksub).forall(j =>
              cbs.get((s, j)).exists(_.length == dims / m)))
          if (!shapeOk) None
          else {
            val pq = ProductQuantizer.fromCodebooks(m, ksub, dims,
              Array.tabulate(m, ksub)((s, j) => cbs((s, j))))
            val table = new graft.io.ParquetTable(path,
              partitionColumns = Seq("cell"), captureStats = false)
            // tombstoned deletes survive a cold reload
            Some(new IvfPqIndex(cents.toArray, pq, table.read(spark),
              persisted = true,
              tombstones = AnnDeletes.read(spark, path)))
          }
        }
      } catch { case _: Exception => None }
    }

  /** Build: unit-normalize → IVF assignment → per-row residual against
    * the assigned centroid (broadcast nlist-row frame + the native
    * [[graft.functions.VecSub]]) → PQ fit on a driver-side bounded
    * residual sample, encode distributed. One corpus pass beyond the IVF
    * assignment itself; everything map-side except the tiny centroid
    * broadcast.
    */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, m: Int, ksub: Int,
      seed: Long = 42L): IvfPqIndex = {
    val unit = VectorOps.unitVecs(corpus, idCol, vecCol, idCol, "__uv")
    val ivf = IvfIndex.build(unit, idCol, "__uv", nlist, seed)
    // assigned carries (neighbor_id, __cv = unit vector, cell)
    import spark.implicits._
    val centroidDf = broadcast(
      ivf.centroids.toSeq.toDF("cell", "__cent"))
    val residuals = ivf.assigned.join(centroidDf, Seq("cell"))
      .withColumn("__res", {
        import org.apache.spark.sql.GraftBridge
        GraftBridge.toColumn(graft.functions.VecSub(
          GraftBridge.toExpression(col("__cv")),
          GraftBridge.toExpression(col("__cent"))))
      })
    // Residual-codebook training sample, DRIVER-side: the same
    // first-N-by-id prefix ProductQuantizer.fit would take, collected from
    // the UNIT projection (bounded: ksub × 256 rows) with BOTH the cell
    // assignment and the centroid subtraction done locally — sampling from
    // `ivf.assigned` instead would evaluate the assignment kernel below
    // the TakeOrdered sort, i.e. one whole extra corpus assignment pass
    // just to feed the driver 4k rows. The local argmin replicates the
    // PqEncode(m=1) kernel exactly (same ‖c‖² − 2·v·c score via the same
    // PqCodebook norms, same ascending-d fold, strict < smallest-cell
    // tiebreak, code-0 all-NaN fallback), and the subtraction matches
    // VecSub elementwise — so the codebooks are bit-identical to fitting
    // on the joined residual frame.
    val centArr = ivf.centroids.sortBy(_._1).map(_._2.toArray)
    val cellCb = new graft.functions.PqCodebook(
      centArr.flatMap(_.toSeq), 1, centArr.length)
    val resSample = unit
      .orderBy(col(idCol)).limit(ksub * 256)
      .select(col("__uv")).collect()
      .map { r =>
        val v = r.getSeq[Double](0)
        var best = 0
        var bestScore = Double.MaxValue
        var j = 0
        while (j < centArr.length) {
          val c = centArr(j)
          var dot = 0.0
          var d = 0
          while (d < c.length) { dot += v(d) * c(d); d += 1 }
          val score = cellCb.normsSq(j) - 2.0 * dot
          if (score < bestScore) { bestScore = score; best = j }
          j += 1
        }
        val c = centArr(best)
        Array.tabulate(v.length)(i => v(i) - c(i))
      }
    val pq = ProductQuantizer.fitLocal(resSample, m, ksub, seed)
    val coded = residuals
      .withColumn("__codes", pq.encode(col("__res")))
      .select(col("cell"), col("neighbor_id"), col("__cv"), col("__codes"))
    new IvfPqIndex(ivf.centroids, pq, coded, persisted = false)
  }
}
