package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-side scale path for
  * embedding search that IVF partition pruning (q50) does not cover: at
  * 100 TB a float32 embedding corpus cannot be scanned, cached, or
  * shuffled as vectors, but its PQ codes can. A d-dim float vector becomes
  * `m` small integer codes (one per d/m-dim subspace, each quantized
  * against its own `ksub`-codeword codebook), a 4·d/m-byte→byte-ish
  * compression (64-dim float32 → 8 codes = 32×), and asymmetric distance
  * computation (ADC) scores a full-precision query against codes WITHOUT
  * decompressing the corpus.
  *
  * Spark mapping, mirroring [[IvfIndex]]'s shapes:
  *   - '''fit''' is driver-side on a bounded deterministic sample
  *     (ksub × 256 vectors per subspace — the FAISS training heuristic;
  *     a few MB at any corpus size), reusing the seeded [[LocalKMeans]].
  *     Codebooks are m × ksub × (d/m) doubles — KBs, literal-friendly.
  *   - '''encode''' is map-side Column algebra over the codegen'd native
  *     dot product: per subspace, argmin over codewords of
  *     ‖c‖² − 2·v_sub·c (the ‖v_sub‖² term is constant per row). No
  *     shuffle; at scale the code table is what gets persisted/cached,
  *     never the vectors.
  *   - '''ADC''' is likewise map-side: Σ over subspaces of
  *     q_sub · codebook_s[code_s], with codebooks riding as literals —
  *     on unit-normalized inputs the ADC dot IS the approximate cosine.
  *
  * Exactness boundary: PQ is lossy by design. [[PqIndex.search]] therefore
  * uses ADC only to shortlist `k × rerank` candidates per query and
  * re-ranks that bounded set with exact cosine against the original
  * vectors (SDC-free re-rank, the standard IndexPQ serving shape) — so
  * output quality degrades only when the true neighbor falls outside the
  * ADC shortlist. [[graft.tools.Accuracy]] gates recall@5 and the ADC
  * approximation error per round.
  */
final class ProductQuantizer private (val m: Int, val ksub: Int,
    val dims: Int, val codebooks: Array[Array[Array[Double]]]) {

  private val dsub = dims / m

  /** The flat-layout codebook the native kernels index:
    * flat[(s·ksub + j)·dsub + d] = codebooks(s)(j)(d). ONE shared instance
    * per quantizer so the reference object (and its precomputed codeword
    * norms) is reused across every expression built from it.
    */
  private val flatCodebook = new graft.functions.PqCodebook(
    codebooks.flatMap(_.flatMap(_.toSeq)), m, ksub)

  /** Per-subspace nearest-codeword ids for one vector: array<int>, length
    * m. Map-side, ONE compiled pass per row
    * ([[graft.functions.PqEncode]]); the Column-algebra equivalent
    * ([[columnEncode]]) exists only as the parity reference.
    */
  def encode(vec: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toColumn(graft.functions.PqEncode(
      GraftBridge.toExpression(vec.cast("array<double>")), flatCodebook))
  }

  /** Asymmetric distance computation: the approximate inner product of a
    * full-precision query against a coded corpus row —
    * Σ_s q_sub(s) · codebook_s[code_s]. On unit-normalized vectors this is
    * the approximate cosine. One fused pass per row
    * ([[graft.functions.PqAdcDot]]) with the codebook as a shared
    * reference object — no decode, no join, no per-subspace
    * nested-literal indexing (the Column form's `element_at(<nested
    * literal>, <code>)` measured ~0.25 ms/row — 20× brute force).
    */
  def adcDot(queryVec: Column, codes: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toColumn(graft.functions.PqAdcDot(
      GraftBridge.toExpression(queryVec.cast("array<double>")),
      GraftBridge.toExpression(codes), flatCodebook))
  }

  /** The original Column-algebra encode — argmin over
    * `lit(‖c‖²) − 2·dot_product(slice(v), c)` sortable structs. Kept
    * (package-private) as the bit-parity reference PqSpec checks the
    * native kernel against.
    */
  private[graft] def columnEncode(vec: Column): Column =
    array((0 until m).map { s =>
      val sub = slice(vec, s * dsub + 1, dsub)
      val scored = array(codebooks(s).zipWithIndex.map { case (c, j) =>
        val normSq = c.map(x => x * x).sum
        struct((lit(normSq) - lit(2.0) *
          GraftFunctions.dot_product(sub, typedLit(c.toSeq))).as("d"),
          lit(j).as("j"))
      }.toIndexedSeq: _*)
      array_min(scored).getField("j")
    }.toIndexedSeq: _*)

  /** The original Column-algebra ADC — per-subspace
    * `dot_product(slice(q), element_at(<nested codebook literal>, code))`
    * summed by a left fold. Parity reference only (see [[adcDot]] for why
    * it is not the production path).
    */
  private[graft] def columnAdcDot(queryVec: Column, codes: Column): Column =
    (0 until m).map { s =>
      val qsub = slice(queryVec, s * dsub + 1, dsub)
      val cb = typedLit(codebooks(s).map(_.toIndexedSeq).toIndexedSeq)
      GraftFunctions.dot_product(qsub, element_at(cb, codes.getItem(s) + 1))
    }.reduce(_ + _)
}

object ProductQuantizer {

  /** Reconstruct a quantizer from stored codebooks (the sidecar-load path
    * of [[IvfPqIndex.load]]); shape-validates so a torn or stale sidecar
    * fails the load, not a later search.
    */
  private[northstar] def fromCodebooks(m: Int, ksub: Int, dims: Int,
      codebooks: Array[Array[Array[Double]]]): ProductQuantizer = {
    require(m > 0 && ksub > 0 && dims % m == 0 &&
      codebooks.length == m &&
      codebooks.forall(s => s.length == ksub &&
        s.forall(_.length == dims / m)),
      s"codebook shape does not match m=$m ksub=$ksub dims=$dims")
    new ProductQuantizer(m, ksub, dims, codebooks)
  }

  /** Fit per-subspace codebooks on a bounded deterministic sample — first
    * ksub×256 vectors by id, the same no-count-job prefix sampling as
    * [[IvfIndex.build]] (ids carry no embedding information, so the prefix
    * is as unbiased as a random draw, and unlike seeded Bernoulli it
    * cannot change with scan layout). Each subspace trains independently
    * (that independence is what makes the codebook product expressive:
    * ksub^m effective centroids from m × ksub stored ones).
    *
    * `vecCol` must already be array<double> (callers go through
    * [[Similarity.toDoubleVec]]); dims are read from the sample and must
    * divide evenly by `m`.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, seed: Long = 42L): ProductQuantizer = {
    val sample = corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .orderBy(col("__id")).limit(ksub * 256)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    fitLocal(sample, m, ksub, seed)
  }

  /** Fit from an already-collected (bounded) sample — the path
    * [[IvfPqIndex.build]] uses so the residual-codebook sample job never
    * has to run the residual join over the whole corpus just to feed the
    * driver 4k rows.
    */
  private[northstar] def fitLocal(sample: Array[Array[Double]], m: Int,
      ksub: Int, seed: Long): ProductQuantizer = {
    require(m > 0 && ksub > 1, s"need m>0, ksub>1; got m=$m ksub=$ksub")
    require(sample.nonEmpty, "cannot fit a product quantizer on no vectors")
    val dims = sample.head.length
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val dsub = dims / m
    val codebooks = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub,
        (s + 1) * dsub))
      // distinct seed per subspace: identically-seeded kmeans++ on
      // near-identical marginals would pick correlated codebooks
      LocalKMeans.fit(sub, ksub, seed + s, maxIter = 10)
    }
    new ProductQuantizer(m, ksub, dims, codebooks)
  }
}

/** A fitted quantizer plus the coded corpus — the serving-side pair. The
  * codes frame is the ONLY per-row state (id, m ints, plus the original
  * vector column retained solely for the bounded exact re-rank join); at
  * deployment scale the codes table is the thing persisted/cached while
  * vectors stay cold on disk.
  */
final class PqIndex private (val pq: ProductQuantizer,
    codes: DataFrame, idName: String) {

  /** Top-k per query: ADC shortlist of k×rerank candidates over the coded
    * corpus (map-side scoring; ONE shuffle for the per-query window),
    * then exact cosine re-rank of the bounded shortlist against the
    * retained vectors. Queries must be few enough to broadcast — the same
    * bounded-query contract as [[Similarity.bruteForceTopK]], and the
    * BroadcastNestedLoopJoin it plans is that same audited shape (the
    * broadcast side is the query set, never the corpus).
    */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      rerank: Int = 8): DataFrame = {
    val q = VectorOps.unitVecs(queries, idCol, vecCol, "query_id", "__qv")
      .withColumn("__qv",
        VectorOps.dimsGuard(col("__qv"), pq.dims, "PqIndex"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col(idName))
    val shortlist = codes.crossJoin(broadcast(q))
      .filter(col(idName) =!= col("query_id"))
      .withColumn("__adc", pq.adcDot(col("__qv"), col("__codes")))
      .withColumn("__arank", row_number().over(wAdc))
      .filter(col("__arank") <= k * rerank)
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idName))
    shortlist
      .withColumn("cosine",
        round(GraftFunctions.cosine_sim(col("__qv"), col("__uv")), 6))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idName).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Per-subspace codeword usage histogram — the build-side observable
    * (balanced codebooks ↔ well-spread quantization), analogous to q50's
    * inverted-list sizes.
    */
  def codeHistogram(): DataFrame =
    codes.select(posexplode(col("__codes")).as(Seq("subspace", "codeword")))
      .groupBy(col("subspace"), col("codeword"))
      .agg(count(lit(1)).as("vectors"))
}

object PqIndex {

  /** Fit + encode in one shot. Vectors are unit-normalized BEFORE fit and
    * encode so ADC dots are approximate cosines (the metric every other
    * similarity operator here uses); zero vectors stay zero and simply
    * rank last.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, seed: Long = 42L): PqIndex = {
    val unit = VectorOps.unitVecs(corpus, idCol, vecCol, idCol, "__uv")
    val pq = ProductQuantizer.fit(unit, idCol, "__uv", m, ksub, seed)
    val coded = unit.withColumn("__codes", pq.encode(col("__uv")))
    new PqIndex(pq, coded, idCol)
  }
}
