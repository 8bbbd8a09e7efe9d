package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.northstar.{CorpusClean, Dedup, IvfIndex, Similarity, TextAnalysis}

/** Quantitative accuracy gates for the approximation/sketch/index queries
  * (q27, q28, q37, q50, q72, q75, q76, q81, q82, q84, q86, q88, q92,
  * q110, q111, q112) —
  * emitted as one machine-readable artifact so a grader can judge the
  * approximate operators from numbers, not by reading specs.
  *
  * Each gate compares the approximate operator against the EXACT answer
  * computed independently at the audit scale factor (sf0.01 — small enough
  * that brute force is tractable, which is the whole point of an audit
  * tier). Guarantees that are structural (SimHash banding's pigeonhole,
  * the LSH exact-cosine verify, CMS one-sided error, Bloom no-false-
  * negative) gate at their exact value; tunable-recall paths (LSH tables,
  * IVF nprobe, SemDeDup quantizer splits) gate JUST below their measured
  * recall (within ~0.05) — the testdata is seed-pinned so measurements
  * reproduce across rounds, and tight bounds turn a silent quality
  * regression into a failing gate instead of hiding it under slack.
  *
  * Usage: `runMain graft.tools.Accuracy [outPath]` (default
  * `ACCURACY.json`); scale dir from SPARK_GRAFT_SF_DIR (default sf0.01).
  * Prints the JSON object as the final stdout line and writes it to
  * outPath.
  */
object Accuracy {

  final case class Gate(query: String, metric: String, value: Double,
      op: String, bound: Double) {
    def pass: Boolean = op match {
      case ">=" => value >= bound
      case "<=" => value <= bound
      case "==" => value == bound
    }
    def json: String = {
      // Locale.ROOT: a comma-decimal default locale would break the JSON
      val v = String.format(java.util.Locale.ROOT, "%.6f", Double.box(value))
      s""""$metric":{"value":$v,"op":"$op","bound":$bound,"pass":$pass}"""
    }
  }

  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0.0
    else BigDecimal(dot / d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  /** Driver-side exact cosine pair/vector table for the audit corpus —
    * bounded by design: the audit runs at sf0.01 (500 vectors). */
  private def vectors(spark: SparkSession, dir: String): Map[Long, Array[Double]] =
    Tables.read(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** q27 — SimHash banding is EXACT for its own criterion: 4 bands catch
    * every pair within 3 flipped bits (pigeonhole) and the popcount verify
    * re-checks candidates, so recall AND precision against the brute-force
    * Hamming≤3 pair set must both be 1.0.
    */
  def q27Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val sigs = Dedup.simhashSignatures(
        Tables.read(spark, dir, "documents"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val approx = pairSet(graft.SparkEntry.queries("q27_simhash_near_dups")(spark, dir))
    Seq(
      Gate("q27_simhash_near_dups", "recall_vs_exact_hamming3",
        if (exact.isEmpty) 1.0
        else (exact & approx).size.toDouble / exact.size, "==", 1.0),
      Gate("q27_simhash_near_dups", "precision",
        if (approx.isEmpty) 1.0
        else (exact & approx).size.toDouble / approx.size, "==", 1.0),
      Gate("q27_simhash_near_dups", "exact_pairs", exact.size.toDouble, ">=", 1.0))
  }

  /** q28 — the LSH bucket join only PROPOSES pairs; survivors are verified
    * with the same round-6 exact cosine the brute force uses, so precision
    * is structurally 1.0. Recall against the brute-force cos≥0.4 pair set
    * is the tunable (planes/tables): LSH's guarantee degrades smoothly
    * toward the threshold — a pair AT 0.4 collides each 4-plane table
    * w.p. ≈0.16 while one at 0.55 collides w.p. ≈0.22 — so the gate is
    * two-sided: strong recall (0.95) on comfortably-above-threshold pairs
    * (cos ≥ 0.55, the c-approximate contract; measured 1.0) and a floor
    * (0.68) on the whole set including the at-threshold tail (measured
    * 0.729 — the bounds sit just under measurement so a 10-point recall
    * regression fails instead of hiding under slack; the testdata is
    * seed-pinned, so measurements reproduce across rounds).
    */
  def q28Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val vecs = vectors(spark, dir)
    val ids = vecs.keys.toArray.sorted
    val exactAll = (for {
      ia <- ids; ib <- ids if ia < ib
      if cos6(vecs(ia), vecs(ib)) >= 0.4
    } yield (ia, ib, cos6(vecs(ia), vecs(ib))))
    val exact = exactAll.map(p => (p._1, p._2)).toSet
    val exactHigh = exactAll.filter(_._3 >= 0.55).map(p => (p._1, p._2)).toSet
    val approx = pairSet(graft.SparkEntry.queries("q28_embedding_near_dups")(spark, dir))
    Seq(
      Gate("q28_embedding_near_dups", "recall_vs_exact_cos04",
        if (exact.isEmpty) 1.0
        else (exact & approx).size.toDouble / exact.size, ">=", 0.68),
      Gate("q28_embedding_near_dups", "recall_cos055_and_up",
        if (exactHigh.isEmpty) 1.0
        else (exactHigh & approx).size.toDouble / exactHigh.size, ">=", 0.95),
      Gate("q28_embedding_near_dups", "precision",
        if (approx.isEmpty) 1.0
        else (exact & approx).size.toDouble / approx.size, "==", 1.0),
      Gate("q28_embedding_near_dups", "exact_pairs", exact.size.toDouble, ">=", 1.0))
  }

  /** q37 — approximate aggregates vs exact, reported as the worst group's
    * error. Gated just above measurement (distinct 0.0057 → 0.02; p50
    * 0.0002 → 0.005) rather than at the loose documented envelopes, so a
    * sketch-parameter regression is caught while seed-pinned reruns pass.
    */
  def q37Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val li = Tables.read(spark, dir, "lineitem")
    val exact = li.groupBy("l_returnflag").agg(
        countDistinct(col("l_orderkey")).as("orders"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = graft.SparkEntry.queries("q37_approx_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val distErr = approx.map { case (f, (a, _)) =>
      math.abs(a - exact(f)._1).toDouble / exact(f)._1 }.max
    val p50Err = approx.map { case (f, (_, a)) =>
      math.abs(a - exact(f)._2) / exact(f)._2 }.max
    Seq(
      Gate("q37_approx_stats", "max_distinct_rel_err", distErr, "<=", 0.02),
      Gate("q37_approx_stats", "max_p50_rel_err", p50Err, "<=", 0.005))
  }

  /** q50 — IVF recall@5 against the brute-force top-5, same parameters
    * as the bench query (nlist=32, nprobe=16: half the cells probed —
    * the synthetic embeddings are near-random, the quantizer's worst
    * case, so recall tracks the probed fraction plus the
    * centroid-ranking lift; the round-12 sweep in BASELINE.md records
    * the full curve). Gated just under the seed-pinned measurements of
    * THIS gate's 10-query protocol (0.80 audit / 0.86 sf0.1 — up from
    * 0.78/0.72 under the old nlist=16 geometry at the same scan
    * fraction) so a recall regression can't hide under slack.
    */
  def q50Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    // gate the path the q50_ivf_probe query actually serves: persist +
    // sidecar load + partition-pruned search, not an in-memory shortcut
    val path = java.nio.file.Files
      .createTempDirectory("graft_acc_ivf").toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding",
        graft.queries.NorthStarQueries.ServingIvfNlist)
      .persist(spark, path)
    val loaded = IvfIndex.load(spark, path).getOrElse(
      sys.error("persisted IVF index failed to load in the accuracy gate"))
    val approx = pairs(
      loaded.search(queries, "vec_id", "embedding", k = 5,
        nprobe = graft.queries.NorthStarQueries.ServingIvfNprobe))
    // BUILD-side parity (the probe recall above could stay green across a
    // build regression whenever the re-rank window still catches the true
    // neighbors): replay the cell assignment for EVERY corpus vector with
    // independent driver arithmetic over the RELOADED sidecar centroids —
    // same argmin formula contract (‖c‖² − 2·v·c, sequential ascending
    // fold, strict <, smallest-index tiebreak) as the fused engine
    // kernel, none of its code. Covers the quantizer fit determinism, the
    // native assignment kernel, the partitioned persist and the sidecar
    // round-trip in one exact gate.
    val centers = loaded.centroids.sortBy(_._1).map(_._2.toArray)
    val got = loaded.assigned.select("neighbor_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = vectors(spark, dir)
    val agree = vecs.toSeq.map { case (id, v) =>
      if (got.get(id).contains(assignReplay(v, centers))) 1 else 0
    }
    Seq(
      Gate("q50_ivf_probe", "recall_at_5_vs_brute_force",
        (exact & approx).size.toDouble / exact.size, ">=", 0.78),
      Gate("q50_ivf_build", "cell_assignment_agreement_vs_replay",
        agree.sum.toDouble / agree.size, "==", 1.0),
      Gate("q50_ivf_build", "assigned_rows_equal_corpus",
        if (got.size == vecs.size) 1.0 else 0.0, "==", 1.0))
  }

  /** The independent nearest-centroid replay shared by the build gates:
    * plain sequential loops mirroring the engine kernel's documented
    * score contract, sharing none of its implementation.
    */
  private def assignReplay(v: Array[Double],
      centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestScore = Double.MaxValue
    var j = 0
    while (j < centers.length) {
      val c = centers(j)
      var normSq = 0.0
      var dot = 0.0
      var d = 0
      while (d < c.length) {
        normSq += c(d) * c(d); dot += v(d) * c(d); d += 1
      }
      val score = normSq - 2.0 * dot
      if (score < bestScore) { bestScore = score; best = j }
      j += 1
    }
    best
  }

  /** q72 — two gates. (1) The within-cell drop rule must be implemented
    * EXACTLY: replaying "a lower id ≥ threshold exists in my cell" from
    * the raw vectors must reproduce every kept/dropped decision
    * (agreement == 1.0; with the default cell cap nothing sub-shards at
    * audit scale). (2) Recall of true duplicate mass: the fraction of
    * vectors with a lower-id corpus-mate at cos≥0.4 that the
    * cluster-scoped rule actually dropped — quantizer splits are the
    * documented miss. nClusters=8 mirrors q72 (the paper's k trades pair
    * cost against split-pair recall; the cell-size cap makes the larger
    * cells safe); measured 0.453 on the near-random embeddings (maximal
    * splitting, the operator's worst case), gated just under at 0.42.
    */
  def q72Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val emb = Tables.read(spark, dir, "embeddings")
    val res = Similarity
      .semanticDedup(emb, "vec_id", "embedding", nClusters = 8, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val vecs = vectors(spark, dir)
    val agree = res.groupBy(_._2).values.flatMap { members =>
      members.map { case (id, _, kept) =>
        val shouldDrop = members.exists { case (o, _, _) =>
          o < id && cos6(vecs(o), vecs(id)) >= 0.4 }
        if (kept == !shouldDrop) 1 else 0
      }
    }.toSeq
    val ids = vecs.keys.toArray.sorted
    val trueDups = ids.filter(id =>
      ids.exists(o => o < id && cos6(vecs(o), vecs(id)) >= 0.4)).toSet
    val dropped = res.filter(!_._3).map(_._1).toSet
    Seq(
      Gate("q72_semantic_dedup", "drop_rule_agreement",
        agree.sum.toDouble / agree.size, "==", 1.0),
      Gate("q72_semantic_dedup", "dup_recall_vs_brute_force",
        if (trueDups.isEmpty) 1.0
        else (trueDups & dropped).size.toDouble / trueDups.size, ">=", 0.42))
  }

  /** q75 — Bloom decontamination vs the exact 8-gram-overlap set (q58's
    * machinery): false negatives are structurally impossible (gate == 0);
    * the false-positive tail is bounded by fpp=0.001 per gram probe —
    * gate the observed doc-level FP rate at 0.5% (5× the per-probe rate;
    * a doc is flagged if ANY of its grams collides; measured 0.0).
    */
  def q75Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val docs = Tables.read(spark, dir, "documents")
    val training = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val benchmark = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val exact = CorpusClean.contaminatedIds(training, benchmark, "doc_id", "text", 8)
      .collect().map(_.getLong(0)).toSet
    val flagged = CorpusClean.bloomContaminatedFlags(training, benchmark,
        "doc_id", "text", n = 8, expectedGrams = 1L << 16, fpp = 0.001)
      .filter(col("__contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val nTrain = training.count()
    val clean = nTrain - exact.size
    Seq(
      Gate("q75_bloom_decontaminate", "false_negatives",
        (exact -- flagged).size.toDouble, "==", 0.0),
      Gate("q75_bloom_decontaminate", "doc_false_positive_rate",
        if (clean == 0) 0.0 else (flagged -- exact).size.toDouble / clean,
        "<=", 0.005))
  }

  /** q76 — CMS one-sided error audited over EVERY distinct token: zero
    * undercounts (structural), and the ε·N overcount bound holds for all
    * but the δ tail (≤0.5% of tokens; measured 0 violators).
    */
  def q76Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    import graft.functions.CmsFunctions
    val eps = 0.0005
    val toks = Tables.read(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val bytes = CmsFunctions.serialize(
      toks.stat.countMinSketch("tok", eps, 0.99, 42))
    val n = toks.count()
    val audited = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      .select(col("exact"), CmsFunctions.cms_estimate(col("tok"), bytes).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val under = audited.count { case (exact, est) => est < exact }
    val over = audited.count { case (exact, est) => est - exact > eps * n }
    Seq(
      Gate("q76_heavy_hitters", "undercounted_tokens", under.toDouble, "==", 0.0),
      Gate("q76_heavy_hitters", "epsN_overcount_violator_rate",
        over.toDouble / audited.length, "<=", 0.005))
  }

  /** q81 — PQ ANN audited on two axes. (1) recall@5 vs the brute-force
    * top-5: the end-to-end serving quality of ADC-shortlist + exact
    * re-rank, the number a user of the index experiences. (2) the raw ADC
    * approximation error — mean |adc_cos − exact_cos| over every
    * (query, corpus) pair — which isolates quantizer quality from
    * shortlist/re-rank mechanics: recall could mask a codebook regression
    * whenever the re-rank window still catches the true neighbors, but
    * the pairwise error cannot. Near-random 64-d embeddings are PQ's
    * worst case (no cluster structure for codebooks to exploit), so both
    * bounds are set just under the measured worst-case values and would
    * only improve on real, clusterable embedding corpora.
    */
  def q81Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    import graft.functions.GraftFunctions
    import graft.northstar.{ProductQuantizer, Similarity, VectorOps}
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val approx = pairs(graft.SparkEntry.queries("q81_pq_ann")(spark, dir))
    // pairwise ADC error, replayed through the same public fit/encode the
    // query uses (unit-normalized, m=8 × ksub=16)
    val unit = VectorOps.unitVecs(emb, "vec_id", "embedding", "vec_id", "__uv")
    val pq = ProductQuantizer.fit(unit, "vec_id", "__uv", m = 8, ksub = 16)
    val coded = unit.withColumn("__codes", pq.encode(col("__uv")))
    val q = unit.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("__uv").as("__qv"))
    val err = coded.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(abs(pq.adcDot(col("__qv"), col("__codes")) -
        GraftFunctions.dot_product(col("__qv"), col("__uv"))).as("e"))
      .agg(avg(col("e"))).collect()(0).getDouble(0)
    Seq(
      Gate("q81_pq_ann", "recall_at_5_vs_brute_force",
        (exact & approx).size.toDouble / exact.size, ">=", 0.70),
      Gate("q81_pq_ann", "mean_adc_cosine_error", err, "<=", 0.08))
  }

  /** q82 — IVFADC recall@5 against brute force, through the same
    * persist + sidecar-load + statically-pruned path the probe query
    * serves, at the q82 parameters (nlist=16, nprobe=8, m=8, ksub=16,
    * rerank=8). Both approximation sources are live here — cell pruning
    * (q50's) and the PQ shortlist (q81's) — so this bound sits at their
    * composition, just under the measured value.
    */
  def q82Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    import graft.northstar.IvfPqIndex
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val path = java.nio.file.Files
      .createTempDirectory("graft_acc_ivfpq").toString + "/idx"
    IvfPqIndex.build(spark, emb, "vec_id", "embedding",
      nlist = 16, m = 8, ksub = 16).persist(spark, path)
    val loaded = IvfPqIndex.load(spark, path).getOrElse(
      sys.error("persisted IVFPQ index failed to load in the accuracy gate"))
    val approx = pairs(loaded.search(queries, "vec_id", "embedding",
      k = 5, nprobe = 8, rerank = 8))
    // BUILD-side parity: replay the ENTIRE coded state — unit-normalize,
    // cell assignment, residual against the assigned centroid, and every
    // per-subspace PQ code — with independent driver arithmetic over the
    // RELOADED sidecar model, and demand exact agreement with the
    // PERSISTED inverted lists. A codebook or residual-encode regression
    // that still clears the probe's recall bound (re-rank can mask it)
    // fails here instead of riding in silently.
    val centers = loaded.centroids.sortBy(_._1).map(_._2.toArray)
    val cb = loaded.pq.codebooks
    val dsub = loaded.pq.dims / loaded.pq.m
    val persisted = new graft.io.ParquetTable(path).read(spark)
      .select(col("neighbor_id"), col("cell"), col("__codes")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2).toVector))
      .toMap
    val vecs = vectors(spark, dir)
    val codeAgree = vecs.toSeq.map { case (id, raw) =>
      val norm = math.sqrt(raw.map(x => x * x).sum)
      val u = raw.map(_ / norm)
      val cell = assignReplay(u, centers)
      val res = u.indices.map(i => u(i) - centers(cell)(i)).toArray
      val codes = (0 until loaded.pq.m).map { j =>
        val sub = java.util.Arrays.copyOfRange(res, j * dsub, (j + 1) * dsub)
        assignReplay(sub, cb(j))
      }.toVector
      if (persisted.get(id).contains((cell, codes))) 1 else 0
    }
    Seq(
      Gate("q82_ivfpq_probe", "recall_at_5_vs_brute_force",
        (exact & approx).size.toDouble / exact.size, ">=", 0.64),
      Gate("q82_ivfpq_build", "cell_and_code_agreement_vs_replay",
        codeAgree.sum.toDouble / codeAgree.size, "==", 1.0),
      Gate("q82_ivfpq_build", "coded_rows_equal_corpus",
        if (persisted.size == vecs.size) 1.0 else 0.0, "==", 1.0))
  }

  /** Incremental append is NOT an approximation — appending the delta to
    * a persisted 90% index must land every vector in exactly the cell a
    * bulk assignment with the same centroids picks, and the grown index's
    * search must match reloading it cold. Both gate at exactly 1.0.
    */
  def q84Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val emb = Tables.read(spark, dir, "embeddings")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_acc_ivfapp").toString + "/idx"
    val baseIdx = IvfIndex.build(base, "vec_id", "embedding", nlist = 16)
      .persist(spark, path)
    val appended = baseIdx.append(spark, path, delta, "vec_id", "embedding")
    val got = appended.assigned.select("neighbor_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val vecs = emb.select(col("vec_id").as("neighbor_id"),
      Similarity.toDoubleVec(col("embedding")).as("__cv"))
    val ref = IvfIndex.assignToCells(vecs,
      baseIdx.centroids.sortBy(_._1).map(_._2.toArray))
      .select("neighbor_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val agreement =
      if (ref.isEmpty) 0.0 else (got & ref).size.toDouble / (got | ref).size
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val appendedSearch = pairs(
      appended.search(queries, "vec_id", "embedding", k = 5, nprobe = 8))
    val reloadedSearch = pairs(IvfIndex.load(spark, path)
      .getOrElse(sys.error("appended IVF index failed to reload in the gate"))
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 8))
    val reloadAgree =
      if (appendedSearch.isEmpty) 0.0
      else (appendedSearch & reloadedSearch).size.toDouble /
        (appendedSearch | reloadedSearch).size
    Seq(
      Gate("q84_ivf_append", "append_vs_bulk_assign_agreement",
        agreement, "==", 1.0),
      Gate("q84_ivf_append", "reload_search_agreement",
        reloadAgree, "==", 1.0))
  }

  /** q88 — BPE merge learning is DETERMINISTIC, not approximate, so it
    * gates at exact agreement: an independently-coded in-memory reference
    * (java.util.regex pre-tokenization over the raw collected text,
    * immutable-list symbol rewriting, groupMapReduce pair counting — none
    * of [[graft.northstar.BpeLearn]]'s representations) must learn the
    * IDENTICAL merge sequence, rank by rank. The collect is the audit
    * tier's by-design bounded brute force, same as [[vectors]].
    */
  /** The independent reference pre-tokenizer shared by the q88/q92
    * gates: java.util.regex over ASCII-folded raw text, whitespace-run
    * pieces dropped — none of BpeLearn's Column algebra.
    */
  private def refPieces(text: String): Vector[String] = {
    import graft.queries.NorthStarQueries
    val piecePat =
      java.util.regex.Pattern.compile(NorthStarQueries.BpePiecePattern)
    val wsOnly = java.util.regex.Pattern.compile(TextAnalysis.WsClass + "+")
    val folded = text.map(ch =>
      if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)
    val out = Vector.newBuilder[String]
    val m = piecePat.matcher(folded)
    while (m.find()) {
      val p = m.group()
      if (!wsOnly.matcher(p).matches()) out += p
    }
    out.result()
  }

  /** Per-invocation memo for the expensive shared work q88 and q92 both
    * consume (the collected corpus text, the 64-round reference merge
    * learn). SCOPED to one [[allGates]] call — object-level process-
    * lifetime caches would retain the whole corpus text after the gates
    * finish and corrupt under concurrent gate runs.
    */
  final class RefMemo {
    private var texts: Option[Seq[String]] = None
    private var merges: Option[Vector[(String, String)]] = None
    private var unigram: Option[Map[String, Long]] = None
    private[Accuracy] def docTexts(spark: SparkSession,
        dir: String): Seq[String] = texts.getOrElse {
      val t = Tables.read(spark, dir, "documents")
        .select(col("text")).collect().map(_.getString(0)).toSeq
      texts = Some(t); t
    }
    private[Accuracy] def refUnigramFor(spark: SparkSession,
        dir: String): Map[String, Long] = unigram.getOrElse {
      val m = refUnigram(docTexts(spark, dir))
      unigram = Some(m); m
    }
    private[Accuracy] def refMergesFor(spark: SparkSession,
        dir: String): Vector[(String, String)] = merges.getOrElse {
      val m = refMerges(docTexts(spark, dir))
      merges = Some(m); m
    }
  }

  /** Cap tiebreak replicating the engine's orderBy: Spark compares
    * strings as UTF-8 BYTES, which diverges from Java's UTF-16 order for
    * supplementary-plane code points — so compare the encoded bytes.
    * Shared by the q88/q92 merge reference and the q113/q114 unigram
    * reference (both cap by (weight desc, piece asc) in this order).
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val (ba, bb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(ba.length, bb.length)
    var i = 0
    while (i < n) {
      if (ba(i) != bb(i)) return (ba(i) & 0xff) < (bb(i) & 0xff)
      i += 1
    }
    ba.length < bb.length
  }

  /** The independent reference merge LEARN shared by the q88/q92 gates
    * (immutable lists, groupMapReduce counting, explicit UTF-8-byte cap
    * tiebreak — none of BpeLearn's representations).
    */
  private def refMerges(texts: Seq[String]): Vector[(String, String)] = {
    import graft.queries.NorthStarQueries
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for (t <- texts; p <- refPieces(t))
      counts.update(p, counts.getOrElse(p, 0L) + 1L)
    val vocab = counts.toSeq
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else utf8Less(pa, pb)
      }
      .take(NorthStarQueries.BpeVocabCap)
    var words: Vector[(List[String], Long)] =
      vocab.map { case (p, c) =>
        (p.codePoints().toArray.toList
          .map(cp => new String(Character.toChars(cp))), c)
      }.toVector
    val ref = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < NorthStarQueries.BpeNumMerges && !exhausted) {
      val pairCounts = words.flatMap { case (syms, c) =>
        syms.zip(syms.drop(1)).map(p => p -> c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best =
          pairCounts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        ref += best
        // iterative, not recursive: a pathological single piece (one
        // unbroken 50k-char run) would blow the stack otherwise
        def rewrite(syms: List[String]): List[String] = {
          val out = List.newBuilder[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tail if (a, b) == best =>
              out += a + b; rest = tail
            case a :: tail => out += a; rest = tail
            case Nil =>
          }
          out.result()
        }
        words = words.map { case (syms, c) => (rewrite(syms), c) }
        k += 1
      }
    }
    ref.result()
  }

  /** The independent unigram-LM reference trainer for the q113/q114
    * gates: replays the WHOLE training schedule (cap → substring seed →
    * EM → loss-ranked prune → final EM) on the collected raw text with
    * none of [[graft.northstar.UnigramLm]]'s representations — plain
    * maps, Vector code points, while-loop lattices. The arithmetic
    * CONTRACT (ascending-span incremental log1p log-sum-exp over
    * StrictMath, round-quantized contributions, floor-quantized M-step)
    * is shared by spec — that is what makes exact equality gateable.
    * Returns piece → micro-nat log prob.
    */
  private def refUnigram(texts: Seq[String]): Map[String, Long] = {
    import graft.queries.NorthStarQueries._
    val Micro = 1000000L
    val Floor = -69L * Micro
    def cpSyms(s: String): Vector[String] =
      s.codePoints().toArray.toVector.map(cp =>
        new String(Character.toChars(cp)))
    def qLog(num: Long, den: Long): Long =
      if (num <= 0L) Floor
      else math.floor(Micro.toDouble *
        StrictMath.log(num.toDouble / den.toDouble)).toLong
    // word table: counts capped like the engine's topVocabPlan
    val wordCounts = scala.collection.mutable.HashMap.empty[String, Long]
    for (t <- texts; p <- refPieces(t))
      wordCounts.update(p, wordCounts.getOrElse(p, 0L) + 1L)
    val words = wordCounts.toVector
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else utf8Less(pa, pb)
      }
      .take(UnigramWordCap)
      .map { case (w, c) => (cpSyms(w), c) }
    // seed: occurrence-weighted substrings, top-S + the single floor
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    for ((cps, wt) <- words; i <- cps.indices;
         l <- 1 to math.min(UnigramMaxPieceLen, cps.length - i))
      sub.update(cps.slice(i, i + l).mkString,
        sub.getOrElse(cps.slice(i, i + l).mkString, 0L) + wt)
    val topSeed = sub.toVector
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else utf8Less(pa, pb)
      }
      .take(UnigramSeedSize)
    val singles = sub.toVector.filter(p => cpSyms(p._1).length == 1)
    val seed = (topSeed ++ singles).distinct
    val seedTotal = seed.map(_._2).sum
    var model: Map[String, Long] =
      seed.map { case (p, w) => p -> qLog(w, seedTotal) }.toMap
    var maxLenSeen = UnigramMaxPieceLen
    // per-word lattice E-step contribution, the spec'd fold order
    def lse(acc: Double, x: Double): Double =
      if (x.isNegInfinity) acc
      else if (acc.isNegInfinity) x
      else if (acc >= x) acc + StrictMath.log1p(StrictMath.exp(x - acc))
      else x + StrictMath.log1p(StrictMath.exp(acc - x))
    def eStepWord(cps: Vector[String], wt: Long,
        m: Map[String, Long],
        into: scala.collection.mutable.HashMap[String, Long]): Unit = {
      val n = cps.length
      if (n == 0) return
      val lp = (j: Int, i: Int) =>
        m.get(cps.slice(j, i).mkString)
          .fold(Double.NegativeInfinity)(_.toDouble / Micro.toDouble)
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0
      for (i <- 1 to n) {
        var a = Double.NegativeInfinity
        for (j <- math.max(0, i - maxLenSeen) until i)
          if (!alpha(j).isNegInfinity && !lp(j, i).isNegInfinity)
            a = lse(a, alpha(j) + lp(j, i))
        alpha(i) = a
      }
      if (alpha(n).isNegInfinity) return
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      beta(n) = 0.0
      for (j <- (n - 1) to 0 by -1) {
        var b = Double.NegativeInfinity
        for (i <- j + 1 to math.min(n, j + maxLenSeen))
          if (!beta(i).isNegInfinity && !lp(j, i).isNegInfinity)
            b = lse(b, lp(j, i) + beta(i))
        beta(j) = b
      }
      val z = alpha(n)
      for (j <- 0 until n; i <- j + 1 to math.min(n, j + maxLenSeen)) {
        val l = lp(j, i)
        if (!l.isNegInfinity && !alpha(j).isNegInfinity &&
            !beta(i).isNegInfinity) {
          val c = math.round(wt.toDouble *
            StrictMath.exp(alpha(j) + l + beta(i) - z) * Micro.toDouble)
          if (c > 0L) {
            val k = cps.slice(j, i).mkString
            into.update(k, into.getOrElse(k, 0L) + c)
          }
        }
      }
    }
    var lastCounts = Map.empty[String, Long]
    def emOnce(): Unit = {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((cps, wt) <- words) eStepWord(cps, wt, model, counts)
      val total = counts.valuesIterator.sum
      model = model.map { case (p, _) =>
        p -> qLog(counts.getOrElse(p, 0L), total)
      }
      lastCounts = counts.toMap
    }
    def em(): Unit = for (_ <- 1 to UnigramEmIters) emOnce()
    val nSingles = model.keysIterator.count(p => cpSyms(p).length == 1)
    val targetMulti = math.max(0, UnigramTargetVocab - nSingles)
    em()
    while (model.size - nSingles > targetMulti) {
      val multi = model.filter { case (p, _) => cpSyms(p).length > 1 }
      val keep = math.max(targetMulti, (multi.size * 3) / 4)
      val ranked = multi.toVector.map { case (p, lpM) =>
        val alt = refUniViterbi(cpSyms(p), model - p, maxLenSeen)._2
        (p, lastCounts.getOrElse(p, 0L).toDouble * (lpM - alt).toDouble)
      }.sortWith { case ((pa, la), (pb, lb)) =>
        // UTF-8 byte tiebreak — mirrors UnigramLm.prune's ordering
        // discipline (one order across all caps, Spark's string order)
        if (la != lb) la > lb else utf8Less(pa, pb)
      }
      val kept = ranked.take(keep).map(_._1).toSet
      model = model.filter { case (p, _) =>
        cpSyms(p).length == 1 || kept(p)
      }
      em()
    }
    model
  }

  /** Independent Viterbi for the unigram reference: descending-j scan
    * with >= keeps the smallest start on ties — the same longest-last-
    * piece total order as the engine, expressed the other way around.
    * Exact micro-nat LONG arithmetic; out-of-model singles take the
    * floor penalty.
    */
  private def refUniViterbi(cps: Vector[String], m: Map[String, Long],
      maxLen: Int): (Vector[String], Long) = {
    val Floor = -69L * 1000000L
    val n = cps.length
    if (n == 0) return (Vector.empty, 0L)
    val dp = Array.fill(n + 1)(Long.MinValue); dp(0) = 0L
    val back = Array.fill(n + 1)(-1)
    for (i <- 1 to n; j <- (i - 1) to math.max(0, i - maxLen) by -1)
      if (dp(j) != Long.MinValue) {
        val piece = cps.slice(j, i).mkString
        val lpOpt =
          if (i - j == 1) Some(m.getOrElse(piece, Floor)) else m.get(piece)
        lpOpt.foreach { lpM =>
          if (dp(j) + lpM >= dp(i)) { dp(i) = dp(j) + lpM; back(i) = j }
        }
      }
    val out = Vector.newBuilder[String]
    var i = n
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (i > 0) { val j = back(i); rev += cps.slice(j, i).mkString; i = j }
    rev.reverseIterator.foreach(out += _)
    (out.result(), dp(n))
  }

  /** q113 — unigram-LM training is exactly reproducible by construction
    * (integer micro-unit EM), so it gates at EXACT model agreement
    * against [[refUnigram]]: same pieces, same micro-nat log probs.
    */
  def q113Gates(spark: SparkSession, dir: String,
      memo: RefMemo = new RefMemo): Seq[Gate] = {
    val expected = memo.refUnigramFor(spark, dir)
    val got = graft.SparkEntry.queries("q113_unigram_learn")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val agree =
      if (expected.isEmpty && got.isEmpty) 1.0
      else (expected.toSet & got.toSet).size.toDouble /
        (expected.toSet | got.toSet).size
    Seq(
      Gate("q113_unigram_learn", "model_agreement_vs_reference",
        agree, "==", 1.0),
      Gate("q113_unigram_learn", "pieces_learned",
        got.size.toDouble, ">=", 1.0))
  }

  /** q114 — the reference tokenizes every document DIRECTLY (no
    * distinct-piece cache), so the query's cache + broadcast-join shape
    * is cross-checked, not just the segmenter — the q92 discipline.
    */
  def q114Gates(spark: SparkSession, dir: String,
      memo: RefMemo = new RefMemo): Seq[Gate] = {
    import graft.queries.NorthStarQueries._
    val model = memo.refUnigramFor(spark, dir)
    def cpSyms(s: String): Vector[String] =
      s.codePoints().toArray.toVector.map(cp =>
        new String(Character.toChars(cp)))
    val docs = Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val pieces = refPieces(text)
      if (pieces.isEmpty) None
      else {
        val segs = pieces.map(p =>
          refUniViterbi(cpSyms(p), model, UnigramMaxPieceLen))
        Some(id -> (pieces.size.toLong,
          segs.map(_._1.length.toLong).sum, segs.map(_._2).sum))
      }
    }.toMap
    val got = graft.SparkEntry.queries("q114_unigram_tokenize")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val agree =
      if (expected.isEmpty && got.isEmpty) 1.0
      else if (expected.keySet != got.keySet) 0.0
      else expected.count { case (k, v) => got(k) == v }.toDouble /
        expected.size
    Seq(
      Gate("q114_unigram_tokenize", "per_doc_agreement_vs_reference",
        agree, "==", 1.0),
      Gate("q114_unigram_tokenize", "docs_tokenized",
        got.size.toDouble, ">=", 1.0))
  }

  def q88Gates(spark: SparkSession, dir: String,
      memo: RefMemo = new RefMemo): Seq[Gate] = {
    val expected = memo.refMergesFor(spark, dir)
    val got = graft.SparkEntry.queries("q88_bpe_learn")(spark, dir)
      .orderBy(col("rank")).select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toVector
    val agree =
      if (expected.isEmpty && got.isEmpty) 1.0
      else if (expected.length != got.length) 0.0
      else expected.zip(got).count { case (a, b) => a == b }.toDouble /
        expected.length
    Seq(
      Gate("q88_bpe_learn", "merge_sequence_agreement", agree, "==", 1.0),
      Gate("q88_bpe_learn", "merges_learned", got.length.toDouble, ">=", 1.0))
  }

  /** q92 — tokenization is deterministic given the merges, so it gates
    * at exact agreement: an independent apply loop (recursive immutable
    * lists, lowest-rank-first) tokenizes every document DIRECTLY — no
    * distinct-piece cache — so the query's cache + broadcast-join shape
    * is cross-checked, not just the merge loop. Per-doc piece and token
    * counts must all match.
    */
  def q92Gates(spark: SparkSession, dir: String,
      memo: RefMemo = new RefMemo): Seq[Gate] = {
    val docs = Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ranks = memo.refMergesFor(spark, dir).zipWithIndex.toMap
    // iterative throughout — a pathological single-run piece must not
    // blow the stack (the engine side is array loops for the same reason)
    def applyRef(piece: String): List[String] = {
      var syms: List[String] = piece.codePoints().toArray.toList
        .map(cp => new String(Character.toChars(cp)))
      var done = false
      while (!done) {
        val known = syms.zip(syms.drop(1)).filter(ranks.contains)
        if (known.isEmpty) done = true
        else {
          val best = known.minBy(ranks)
          val out = List.newBuilder[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tail if (a, b) == best =>
              out += a + b; rest = tail
            case a :: tail => out += a; rest = tail
            case Nil =>
          }
          syms = out.result()
        }
      }
      syms
    }
    val expected = docs.flatMap { case (id, text) =>
      val pieces = refPieces(text)
      if (pieces.isEmpty) None
      else Some(id ->
        (pieces.size.toLong, pieces.map(p => applyRef(p).length.toLong).sum))
    }.toMap
    val got = graft.SparkEntry.queries("q92_bpe_tokenize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val agree =
      if (expected.isEmpty && got.isEmpty) 1.0
      else if (expected.keySet != got.keySet) 0.0
      else expected.count { case (k, v) => got(k) == v }.toDouble /
        expected.size
    Seq(
      Gate("q92_bpe_tokenize", "per_doc_count_agreement", agree, "==", 1.0),
      Gate("q92_bpe_tokenize", "docs_tokenized", got.size.toDouble,
        ">=", 1.0))
  }

  /** q86's two claims: (1) the per-day-partials-then-union estimate
    * agrees with a direct single-pass sketch — this is what makes the
    * persisted sketch table answer any slice without a raw rescan. At
    * the audit tier the cardinalities keep every sketch in the SPARSE
    * (coupon) regime, where the union is exactly lossless — gated at 0
    * relative error. At sf0.1 the per-type cardinality crosses into
    * dense-HLL mode, where the union gadget's register composition is no
    * longer bit-identical to single-pass updates (measured ≤0.4%
    * divergence, both sides within the sketch's configured error of
    * exact) — the tier override pins that divergence just above
    * measurement instead of pretending dense-mode exactness. And (2)
    * the estimate tracks the TRUE distinct count within HLL's error.
    */
  def q86Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val est = graft.SparkEntry.queries("q86_sketch_rollup")(spark, dir)
      .select("event_type", "est_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val events = Tables.read(spark, dir, "events")
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val unionVsDirect = direct.map { case (k, d) =>
      math.abs(est.getOrElse(k, 0L) - d).toDouble / math.max(d, 1L)
    }.max
    val maxRelErr = exact.map { case (k, n) =>
      math.abs(est.getOrElse(k, 0L) - n).toDouble / math.max(n, 1L)
    }.max
    Seq(
      Gate("q86_sketch_rollup", "daily_union_vs_direct_max_rel_err",
        unionVsDirect, "<=", 0.0),
      Gate("q86_sketch_rollup", "max_distinct_rel_err", maxRelErr,
        "<=", 0.02))
  }

  /** q110 — ANN deletion (FAISS `remove_ids` analog). Structural exact
    * gates, no measured slack: exhaustive probing (nprobe = nlist) makes
    * IVF search EXACT, so a tombstoned index must agree 1.0 with a FRESH
    * BUILD on the surviving set (different centroids, same exact top-k),
    * the mask must survive a cold reload, compaction must not change a
    * single answer, and the PQ variant must be bit-stable through
    * tombstone → compact → reload (same codes, same centroids). A
    * deleted id surfacing anywhere gates as leakage > 0.
    */
  def q110Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val emb = Tables.read(spark, dir, "embeddings")
    val drop = emb.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select(col("vec_id"))
    val dropSet = drop.collect().map(_.getLong(0)).toSet
    val survivors = emb.join(drop, Seq("vec_id"), "left_anti")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def agree(a: Set[(Long, Long)], b: Set[(Long, Long)]): Double =
      if ((a | b).isEmpty) 0.0 else (a & b).size.toDouble / (a | b).size
    val path = java.nio.file.Files
      .createTempDirectory("graft_acc_anndel").toString + "/idx"
    val removed = IvfIndex.build(emb, "vec_id", "embedding", nlist = 16)
      .persist(spark, path)
      .remove(spark, path, drop, "vec_id")
    val masked = pairs(removed.search(queries, "vec_id", "embedding",
      k = 5, nprobe = 16))
    val fresh = pairs(IvfIndex
      .build(survivors, "vec_id", "embedding", nlist = 16)
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 16))
    val reloaded = pairs(IvfIndex.load(spark, path)
      .getOrElse(sys.error("tombstoned IVF index failed to reload"))
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 16))
    val compacted = pairs(removed.compact(spark, path)
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 16))
    // PQ variant: tombstone → reload → compact must be answer-stable
    val pqPath = java.nio.file.Files
      .createTempDirectory("graft_acc_anndel_pq").toString + "/idx"
    val pqRemoved = graft.northstar.IvfPqIndex
      .build(spark, emb, "vec_id", "embedding", nlist = 16, m = 4,
        ksub = 16)
      .persist(spark, pqPath)
      .remove(spark, pqPath, drop, "vec_id")
    val pqMasked = pairs(pqRemoved.search(queries, "vec_id", "embedding",
      k = 5, nprobe = 16))
    val pqCompacted = pairs(pqRemoved.compact(spark, pqPath)
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 16))
    val leakage = (masked ++ reloaded ++ compacted ++ pqMasked ++
      pqCompacted).count(p => dropSet.contains(p._2)).toDouble
    Seq(
      Gate("q110_ann_delete", "delete_vs_fresh_build_agreement",
        agree(masked, fresh), "==", 1.0),
      Gate("q110_ann_delete", "tombstone_reload_agreement",
        agree(masked, reloaded), "==", 1.0),
      Gate("q110_ann_delete", "compact_vs_tombstone_agreement",
        agree(masked, compacted), "==", 1.0),
      Gate("q110_ann_delete", "pq_compact_vs_tombstone_agreement",
        agree(pqMasked, pqCompacted), "==", 1.0),
      Gate("q110_ann_delete", "deleted_id_leakage", leakage, "==", 0.0))
  }

  /** q111 — distinct-count gold IVM. The query's final gold state
    * reached its numbers through HLL-sketch folds (insert-only unions)
    * and pair-loss rescans over three commits; the gates recompute the
    * final silver J independently and pin (1) fold vs EXACT
    * count-distinct and (2) fold vs a DIRECT single-pass sketch (the
    * union-losslessness claim). Both are 0 at the audit tier (coupon
    * regime); sf0.1 crosses into SET/dense estimation where the bounds
    * pin the measured divergence.
    */
  def q111Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    val got = graft.SparkEntry.queries("q111_gold_distinct_ivm")(spark, dir)
      .select("city", "year", "distinct_customers").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // the final silver J, recomputed from the raw tables (the v3 state:
    // every 11th order deleted, every 6th city renamed)
    val nation = Tables.read(spark, dir, "nation")
    val addr = nation.select(col("n_nationkey").cast("long").as("address_id"),
      when(pmod(col("n_nationkey"), lit(6)) === 0,
        concat(lower(col("n_name")), lit("_x")))
        .otherwise(lower(col("n_name"))).as("city"))
    val j = Tables.read(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
      .select(col("o_custkey").as("customer_id"),
        pmod(col("o_custkey"), lit(25L)).as("address_id"),
        year(col("o_orderdate")).as("year"))
      .join(addr, Seq("address_id"), "left")
    val exact = j.groupBy(col("city"), col("year"))
      .agg(countDistinct(col("customer_id")).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val direct = j.groupBy(col("city"), col("year"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("customer_id")))
        .as("est")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    def maxRelErr(ref: Map[(String, Int), Long]): Double =
      ref.map { case (k, n) =>
        math.abs(got.getOrElse(k, 0L) - n).toDouble / math.max(n, 1L)
      }.max
    Seq(
      Gate("q111_gold_distinct_ivm", "fold_vs_exact_max_rel_err",
        maxRelErr(exact), "<=", 0.0),
      Gate("q111_gold_distinct_ivm", "fold_vs_direct_sketch_max_rel_err",
        maxRelErr(direct), "<=", 0.0),
      Gate("q111_gold_distinct_ivm", "groups_maintained",
        if (got.keySet == exact.keySet) 1.0 else 0.0, "==", 1.0))
  }

  /** q112 — the hybrid stack's serving-scale dense arm (persisted IVF,
    * nprobe 4/16). Gates: (1) the IVF dense arm's recall@k against the
    * brute arm q108 fuses; (2) fused top-k overlap against q108's exact
    * fusion (RRF dampens single-arm misses — the sparse arm is
    * identical); (3) bit-exact RRF integer arithmetic on the swap-in
    * path, replayed driver-side from the result's own rank columns.
    */
  def q112Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    import graft.northstar.{Bm25, HybridRetrieval}
    val emb = Tables.read(spark, dir, "embeddings")
    val probeIds = graft.queries.NorthStarQueries.DenseProbes
    val k = graft.queries.NorthStarQueries.Bm25TopK
    val probes = emb.filter(col("vec_id").isin(probeIds.map(_._2): _*))
    val exactDense = Similarity
      .bruteForceTopK(emb, probes, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fusedExact = graft.SparkEntry
      .queries("q108_hybrid_rrf")(spark, dir)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val ivfRows = graft.SparkEntry
      .queries("q112_hybrid_rrf_ivf")(spark, dir)
      .select("query_id", "doc_id", "rrf_micro", "sparse_rank",
        "dense_rank").collect()
    val fusedIvf = ivfRows.map(r => (r.getInt(0), r.getLong(1))).toSet
    // the dense arm's recall measured from the ARM ITSELF (the same
    // persisted load-or-build q112 serves from — since round 13 the
    // IVFADC coded index, not the uncompressed IVF) — NOT from the
    // fused result, whose top-k cut would let sparse-arm score shifts
    // displace dense pairs and corrupt the metric in either direction
    import graft.queries.NorthStarQueries.{Q112DenseNprobe, Q112Rerank,
      ServingIvfNlist, ServingPqKsub, ServingPqM}
    val idx = graft.northstar.IvfPqIndex.load(spark,
        graft.queries.NorthStarQueries.servingIvfPqPath(dir))
      .getOrElse(graft.northstar.IvfPqIndex
        .build(spark, emb, "vec_id", "embedding", nlist = ServingIvfNlist,
          m = ServingPqM, ksub = ServingPqKsub)
        .persist(spark,
          graft.queries.NorthStarQueries.servingIvfPqPath(dir)))
    val denseIvf = idx
      .search(probes, "vec_id", "embedding", k,
        nprobe = Q112DenseNprobe, rerank = Q112Rerank)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val denseRecall =
      if (exactDense.isEmpty) 0.0
      else (exactDense & denseIvf).size.toDouble / exactDense.size
    val fusedOverlap =
      if (fusedExact.isEmpty) 0.0
      else (fusedExact & fusedIvf).size.toDouble / fusedExact.size
    // A non-numeric rank is a SCHEMA DRIFT, not a harness bug: it must
    // fail THIS gate (agreement < 1), not abort the whole accuracy run
    // with a MatchError — so contrib is total over Any and reports the
    // drift as a non-matching row.
    def contrib(rank: Any): Option[Long] = rank match {
      case null => Some(0L)
      case n: java.lang.Number =>
        Some(1000000L / (HybridRetrieval.RrfK + n.longValue))
      case other =>
        System.err.println(s"q112: fused frame surfaced a non-numeric " +
          s"rank $other (${other.getClass.getName}) — failing the RRF " +
          "integer-replay gate")
        None
    }
    val rrfExact = ivfRows.forall { r =>
      val s = if (r.isNullAt(3)) null else r.get(3)
      val d = if (r.isNullAt(4)) null else r.get(4)
      (for { cs <- contrib(s); cd <- contrib(d) }
        yield r.getLong(2) == cs + cd).getOrElse(false)
    }
    // bounds just under the seed-pinned measurements at the round-13
    // operating point (IVFADC: nprobe=12/32, m=16, ksub=16, rerank=32 —
    // the coded sweep's knee, BASELINE.md round 13): dense arm 0.725
    // audit / 0.875 sf0.1 measured from the coded arm itself (bit-equal
    // to the uncompressed IVF it replaced), fused overlap re-measured on
    // the swap; worst-case random embeddings remain the constant-budget
    // recall regime q81/q82 document — the gate pins the FIXED-budget
    // contract at ≥ 0.70 recall for a recorded 37.5 % scan of 16-byte
    // codes
    Seq(
      Gate("q112_hybrid_rrf_ivf", "dense_recall_at_k_vs_brute",
        denseRecall, ">=", 0.70),
      Gate("q112_hybrid_rrf_ivf", "fused_topk_overlap_vs_exact",
        fusedOverlap, ">=", 0.85),
      Gate("q112_hybrid_rrf_ivf", "rrf_integer_replay_agreement",
        if (rrfExact) 1.0 else 0.0, "==", 1.0))
  }

  /** q116 — the histogram percentile's VALUE-error law, measured on the
    * real data at each tier: the reported representative is a LOWER
    * bound of the exact type-1 percentile, within the bucket's 2^-4
    * relative width. The q116 ORACLE already pins fold ≡ rebuild
    * hash-exactly (the IVM claim); these gates quantify how close the
    * bucketized answer sits to the un-bucketized truth — a structural
    * bound, so no tier override (it must hold at every scale).
    */
  def q116Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    import org.apache.spark.sql.expressions.Window
    val keys = Seq("o_orderstatus", "o_orderpriority")
    val got = graft.SparkEntry.queries("q116_gold_percentile")(spark, dir)
      .select((keys.map(col) :+ col("p50") :+ col("p95")): _*)
    // the final commit's closed form, exact (un-bucketized) percentiles
    // via rank windows — integer-rational ranks, the engine's definition
    val src = Tables.read(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        when(pmod(col("o_orderkey"), lit(13)) === 0, lit(null))
          .otherwise(round(col("o_totalprice") * 100, 0).cast("long") +
            when(pmod(col("o_orderkey"), lit(5)) === 0, 1000L)
              .otherwise(0L)).as("cents"))
      .filter(col("cents").isNotNull)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("cents"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    def rank(num: Int) = { // ceil(num·nn/100), exact integer arithmetic
      val a = col("nn") * num + 99
      ((a - pmod(a, lit(100L))) / 100).cast("long")
    }
    val exact = src.withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(wAll))
      .groupBy(keys.map(col): _*)
      .agg(max(when(col("rn") === rank(50), col("cents"))).as("e50"),
        max(when(col("rn") === rank(95), col("cents"))).as("e95"))
    val j = got.join(exact, keys, "inner")
      .select(col("p50"), col("p95"), col("e50"), col("e95"))
      .collect()
    require(j.nonEmpty, "q116 gate: no groups to compare")
    val errs = j.flatMap { r =>
      Seq((r.getLong(0), r.getLong(2)), (r.getLong(1), r.getLong(3)))
    }
    val lowerBoundFrac =
      errs.count { case (rep, ex) => rep <= ex }.toDouble / errs.length
    val maxRelErr = errs.map { case (rep, ex) =>
      if (ex == 0L) 0.0 else (ex - rep).toDouble / ex
    }.max
    Seq(
      Gate("q116_gold_percentile", "rep_is_lower_bound_frac",
        lowerBoundFrac, "==", 1.0),
      Gate("q116_gold_percentile", "max_rel_value_err_vs_exact",
        maxRelErr, "<=", 1.0 / 16))
  }

  def allGates(spark: SparkSession, dir: String): Seq[Gate] = {
    val memo = new RefMemo // scoped to this invocation, shared q88↔q92
    q27Gates(spark, dir) ++ q28Gates(spark, dir) ++ q37Gates(spark, dir) ++
      q50Gates(spark, dir) ++ q72Gates(spark, dir) ++ q76Gates(spark, dir) ++
      q75Gates(spark, dir) ++ q81Gates(spark, dir) ++ q82Gates(spark, dir) ++
      q84Gates(spark, dir) ++ q86Gates(spark, dir) ++
      q88Gates(spark, dir, memo) ++ q92Gates(spark, dir, memo) ++
      q110Gates(spark, dir) ++ q111Gates(spark, dir) ++
      q112Gates(spark, dir) ++
      q113Gates(spark, dir, memo) ++ q114Gates(spark, dir, memo) ++
      q116Gates(spark, dir)
  }

  /** SF1-ONLY gates (the synthetic ×10 tier `data/sf1` — ScaleUp's 10
    * key-shifted copies of sf0.1): scale behaviors that have no meaning
    * at the oracle tiers. Dispatched by tier name in [[main]]; run with
    * `SPARK_GRAFT_ACC_DIRS=data/sf1`.
    *
    * The df-cap saturation gate closes BASELINE.md's recorded q25/q48
    * finding: the ABSOLUTE `maxDocFrequency = 64` stop-shingle cap (an
    * oracle-determinism constant pinned at the 5,000-doc bench tier)
    * saturates at the 50,000-doc decade — repeated content pushes every
    * planted shingle's df past 64 and the operator silently returns
    * EMPTY. The df-FRACTION mode (same selectivity re-expressed as
    * 64/5,000 of the corpus) must re-find the PLANTED near-dups: ScaleUp
    * builds sf1 so each base doc has 9 key-shifted copies differing only
    * by a per-copy suffix token — genuine near-duplicates whose
    * reference Jaccard an independent in-driver trigram computation
    * pins, the Accuracy discipline.
    */
  def sf1Gates(spark: SparkSession, dir: String): Seq[Gate] = {
    import graft.northstar.Dedup
    val docs = Tables.read(spark, dir, "documents")
    val DfFraction = 64.0 / 5000.0
    val absPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.3, maxDocFrequency = Some(64)).count()
    val fracPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.3,
      maxDocFrequencyFraction = Some(DfFraction)).persist()
    try {
      val stride = ScaleUp.Stride
      // deterministic sample of base docs + ALL their copies
      val sample = docs
        .filter(col("doc_id") < stride &&
          pmod(col("doc_id"), lit(97)) === 3)
        .select(col("doc_id")).orderBy(col("doc_id")).limit(40)
        .collect().map(_.getLong(0)).toSeq
      val famDf = docs
        .filter(pmod(col("doc_id"), lit(stride)).isin(sample: _*))
        .select(col("doc_id"), col("text"))
      val fam = famDf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // independent reference: exact word-trigram Jaccard in the driver
      def shingles(t: String): Set[String] = {
        val toks = t.split("\\s+").filter(_.nonEmpty)
        if (toks.length < 3) Set.empty
        else toks.sliding(3).map(_.mkString("")).toSet
      }
      // MARGIN above the operator threshold (0.35 vs 0.3): the operator
      // shingles by HASH, this reference by exact strings, so a pair
      // sitting exactly at 0.3 can legitimately land on either side of
      // the two pipelines' thresholds — requiring recall only of
      // clearly-above-threshold pairs keeps the gate measuring the
      // inverted-index saturation fix, not boundary jitter
      val expected = (for {
        b <- sample; i <- 1 to 9
        a = b + i * stride
        sa <- fam.get(b).map(shingles)
        sb <- fam.get(a).map(shingles)
        union = (sa | sb).size if union > 0
        if (sa & sb).size.toDouble / union >= 0.35
      } yield (b, a)).toSet
      val famIds = fam.keySet.toSeq
      val got = fracPairs
        .filter(col("id_a").isin(famIds: _*) && col("id_b").isin(famIds: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (expected.isEmpty) 0.0
        else (expected & got).size.toDouble / expected.size
      Seq(
        Gate("q25_df_fraction", "absolute_cap64_pairs_at_sf1",
          absPairs.toDouble, "<=", 0.0),
        Gate("q25_df_fraction", "planted_pairs_expected",
          expected.size.toDouble, ">=", 100.0),
        Gate("q25_df_fraction", "planted_recall_fraction_mode",
          recall, ">=", 0.99),
        Gate("q25_df_fraction", "fraction_mode_pairs",
          fracPairs.count().toDouble, ">=", 1.0))
    } finally { fracPairs.unpersist(); () }
  }

  /** Per-tier overrides for the measurement-TUNED bounds (keyed
    * "query/metric"). The gate builders code the sf0.01 audit-tier
    * values; recall/error bounds are the scale-SENSITIVE kind (more
    * vectors per LSH bucket, more quantizer splits, a longer
    * at-threshold tail), so the sf0.1 tier pins its own bounds — each
    * set just under that tier's seed-pinned measurement, same
    * no-slack-for-regressions policy. Structural exact gates (== 1.0 /
    * == 0.0) carry no override: they must hold at EVERY scale.
    */
  val TierBounds: Map[String, Map[String, Double]] = Map(
    "sf0.01" -> Map.empty,
    "sf0.1" -> Map(
      // Every bound sits just under (over, for error metrics) its
      // sf0.1 seed-pinned measurement, r7:
      //   q28 recall_vs_exact_cos04 0.798 — the at-threshold tail THINS
      //     relative to comfortable pairs as the pair set grows;
      //   q37 distinct rel err 0.0329 — HLL++ at default rsd 0.05, the
      //     error is cardinality-dependent and sf0.01's 0.006 was the
      //     small-range lucky case;
      //   q50 probe recall re-pinned r12 for nlist=32 (0.86 at sf0.1);
      //   q72 dup recall 0.410 — denser dup graph, more quantizer-split
      //     misses at the same nClusters;
      //   q81 recall 0.38 / adc err 0.0757 and q82 probe 0.48 — the
      //     FIXED k·rerank=40 shortlist is 8% of a 500-vector corpus but
      //     0.8% of 5000: constant-budget PQ recall decays with corpus
      //     size on worst-case random embeddings by design (a deployment
      //     scales rerank with corpus; the gate pins the fixed-budget
      //     contract so a KERNEL regression still shows);
      //   q86 union-vs-direct 0.0073 — dense-HLL union divergence (see
      //     q86Gates), exact only in the audit tier's sparse regime.
      "q28_embedding_near_dups/recall_vs_exact_cos04" -> 0.75,
      "q37_approx_stats/max_distinct_rel_err" -> 0.04,
      "q37_approx_stats/max_p50_rel_err" -> 0.002,
      "q50_ivf_probe/recall_at_5_vs_brute_force" -> 0.84,
      "q72_semantic_dedup/dup_recall_vs_brute_force" -> 0.38,
      "q81_pq_ann/recall_at_5_vs_brute_force" -> 0.34,
      "q81_pq_ann/mean_adc_cosine_error" -> 0.09,
      "q82_ivfpq_probe/recall_at_5_vs_brute_force" -> 0.44,
      "q86_sketch_rollup/daily_union_vs_direct_max_rel_err" -> 0.01,
      "q86_sketch_rollup/max_distinct_rel_err" -> 0.01,
      //   q111 fold-vs-exact 0.0111 at sf0.1 — per-(city,year)
      //     cardinalities (≤ ~500) sit in the coupon-SET regime whose
      //     collision-corrected estimate is no longer exact (the audit
      //     tier's LIST regime is); fold-vs-direct stays 0 because
      //     SET-mode union IS lossless coupon-set union — no override;
      //   q112 fused overlap 0.825 at sf0.1 — the constant-budget
      //     decay shows in the fusion mix (the dense arm's own recall
      //     holds 0.60 at both tiers, no override).
      "q111_gold_distinct_ivm/fold_vs_exact_max_rel_err" -> 0.015,
      //   q112 pinned at the nlist=32/nprobe=12 knee (dense 0.725/0.875,
      //     fused 0.875/0.925 measured) — values UNCHANGED by the
      //     round-13 move to the IVFADC coded arm (m=16/ksub=16/
      //     rerank=32 re-measured bit-equal at both tiers)
      "q112_hybrid_rrf_ivf/dense_recall_at_k_vs_brute" -> 0.85,
      "q112_hybrid_rrf_ivf/fused_topk_overlap_vs_exact" -> 0.90))

  /** Re-pin measurement-tuned bounds for a tier (no-op where a gate has
    * no override — the structural gates and the audit tier).
    */
  def retier(gates: Seq[Gate], tier: String): Seq[Gate] = {
    val over = TierBounds.getOrElse(tier, Map.empty)
    gates.map(g =>
      over.get(s"${g.query}/${g.metric}")
        .map(b => g.copy(bound = b)).getOrElse(g))
  }

  private def tierName(dir: String): String =
    java.nio.file.Paths.get(dir).getFileName.toString

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("ACCURACY.json")
    // both tiers by default: the audit tier the bounds were tuned on AND
    // the bench tier, so scale-sensitive recall regressions gate too.
    // Override with SPARK_GRAFT_ACC_DIRS=dir[,dir...] for local iteration.
    val dirs = sys.env.get("SPARK_GRAFT_ACC_DIRS")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR").map(d => s"$d"))
      .getOrElse("/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq.filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-accuracy")
      .config("spark.sql.shuffle.partitions", "32")
      // events carries TIMESTAMP(NANOS) parquet in some vintages and the
      // ts normalization requires UTC — same session shape as Bench/Verify
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.log.level", "ERROR")
      .getOrCreate()
    val byTier = dirs.map { dir =>
      val gates =
        if (tierName(dir) == "sf1") sf1Gates(spark, dir)
        else retier(allGates(spark, dir), tierName(dir))
      spark.catalog.clearCache()
      (dir, gates)
    }
    spark.stop()
    def tierJson(dir: String, gates: Seq[Gate]): String = {
      val byQuery = gates.groupBy(_.query).toSeq.sortBy(_._1).map {
        case (q, gs) => s""""$q":{${gs.map(_.json).mkString(",")}}"""
      }
      s""""${tierName(dir)}":{"sf":"$dir","all_pass":${gates.forall(_.pass)},""" +
        byQuery.mkString(",") + "}"
    }
    val allPass = byTier.forall(_._2.forall(_.pass))
    val json = s"""{"all_pass":$allPass,"tiers":{""" +
      byTier.map { case (d, gs) => tierJson(d, gs) }.mkString(",") + "}}"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    Console.out.flush()
    if (!allPass) sys.exit(1)
  }
}
