package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (BASELINE.json north-star). Random-hyperplane LSH per Charikar (STOC
  * 2002); the IVF companion ([[IvfIndex]]) follows the inverted-file
  * coarse-quantization scheme popularized by FAISS (Johnson et al., 2017).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set, one scan of
  *    the corpus, per-query top-k via window — the exactness baseline;
  *  - random-hyperplane LSH: deterministic ±1 hyperplanes → L bucket tables,
  *    candidates only within matching buckets, exact cosine verify. The
  *    scale path: candidate generation is L bucket-hash self-joins instead
  *    of the O(n²) cross join.
  *
  * All arithmetic in double with sequential index-order folds, so results
  * are bit-identical across engines computing the same formula.
  */
object Similarity {

  def toDoubleVec(vec: Column): Column = transform(vec, _.cast("double"))

  /** Sequential dot product (index-order fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Exact top-k cosine neighbors for each query row (excluding self).
    * Queries are broadcast; the corpus is scanned once; ranking shuffles on
    * query_id only.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      // native fused expression: stays inside whole-stage codegen on the
      // pair loop (the HOF fold would interpret per element)
      .withColumn("cosine", round(
        graft.functions.GraftFunctions.cosine_sim(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic ±1 hyperplane components for (table, plane, dim) —
    * seeded JVM RNG, same planes every run and every executor.
    */
  private def hyperplanes(tables: Int, planes: Int, dims: Int): Seq[Seq[Array[Double]]] = {
    val rng = new java.util.Random(42L)
    Seq.fill(tables)(Seq.fill(planes)(Array.fill(dims)(if (rng.nextBoolean()) 1.0 else -1.0)))
  }

  /** One bucket id per table: the sign-bit pattern of the vector against
    * each hyperplane. Map-side only.
    */
  /** Returns NULL (not an array) for unhashable vectors — NULL vector or
    * NULL element — so `explode` drops the row from candidate generation
    * instead of (a) crashing the query or (b) silently collapsing it into
    * bucket 0 with every other unhashable row, which would degenerate the
    * bucket join toward the O(n²) cross product.
    */
  def lshBuckets(vec: Column, tables: Int, planes: Int, dims: Int): Column = {
    // bucket bits live in one long: planes >= 64 would wrap 1L << p (shift
    // is mod 64) and silently alias plane tests onto reused bits — reject
    // loudly like the MinHash banding degenerate-parameter checks
    require(planes >= 1 && planes <= 63,
      s"planes=$planes: bucket bits must fit a long (1..63)")
    require(tables >= 1, s"tables=$tables must be positive")
    val hp = hyperplanes(tables, planes, dims)
    // the dims CONTRACT is still loud: a present, fully-non-NULL vector of
    // the wrong length is a caller bug (every plane test would go false) —
    // fail with the offending size in the message
    val checked = when(size(vec) === dims, vec).otherwise(
      raise_error(concat(lit(s"lshBuckets: expected $dims-dim vector, got "),
        coalesce(size(vec).cast("string"), lit("NULL")))))
    // native dot keeps all tables × planes sign tests inside one codegen
    // stage (the HOF fold would interpret per element, per plane)
    val buckets = array(hp.zipWithIndex.map { case (tablePlanes, t) =>
      val bucket = tablePlanes.zipWithIndex.map { case (plane, p) =>
        when(graft.functions.GraftFunctions.dot_product(
          checked, typedLit(plane.toSeq)) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
      struct(lit(t).as("table_id"), bucket.as("bucket"))
    }: _*)
    when(vec.isNull || exists(vec, x => x.isNull), lit(null)).otherwise(buckets)
  }

  /** All-pairs near-duplicates by cosine ≥ threshold: candidates collide in
    * at least one of the L bucket tables; verified with exact cosine.
    */
  def cosineNearDuplicates(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 12, tables: Int = 4,
      dims: Int = 64): DataFrame = {
    val base = embeddings.select(col(idCol).as("id"),
      toDoubleVec(col(vecCol)).as("__v"))
    // deliberately NOT cached (same call as IvfIndex.build): pinning the
    // full corpus vector projection for the session's lifetime to save
    // map-side re-derivation evicts useful caches at real corpus sizes,
    // and the returned DataFrame gives callers no unpersist handle
    val banded = base.select(col("id"),
      explode(lshBuckets(col("__v"), tables, planes, dims)).as("b"))
      .select(col("id"), col("b.table_id"), col("b.bucket"))
    val pairs = banded.as("x").join(banded.as("y"), Seq("table_id", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val va = base.select(col("id").as("id_a"), col("__v").as("__va"))
    val vb = base.select(col("id").as("id_b"), col("__v").as("__vb"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", round(
        graft.functions.GraftFunctions.cosine_sim(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Approximate top-k: rank only within LSH candidate sets. May return
    * fewer than k neighbors per query (documented approximation — recall is
    * tuned by planes/tables).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 10, tables: Int = 4,
      dims: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("__qv"))
    // candidate generation and dedup ride (id, id) rows ONLY — the fat
    // vector payloads rejoin by id afterwards, so the bucket join and the
    // distinct never shuffle or compare dims-length arrays (the same
    // ids-only-exchange rule semanticDedup documents)
    val cb = c.select(col("neighbor_id"),
      explode(lshBuckets(col("__cv"), tables, planes, dims)).as("b"))
      .select(col("neighbor_id"), col("b.table_id"), col("b.bucket"))
    val qb = q.select(col("query_id"),
      explode(lshBuckets(col("__qv"), tables, planes, dims)).as("b"))
      .select(col("query_id"), col("b.table_id"), col("b.bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cb.join(broadcast(qb), Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", round(
        graft.functions.GraftFunctions.cosine_sim(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Semantic deduplication (Abbas et al., "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", 2023): cluster
    * the embedding space with a k-means coarse quantizer, then compare
    * pairs ONLY within each cluster and drop every vector that has a
    * lower-id cluster-mate above the cosine threshold. The clustering
    * bounds the pairwise work at Σ|cellᵢ|² instead of n² — exactly the
    * paper's trick — at the cost of missing the (rare) near-pairs the
    * quantizer splits across cells.
    *
    * The hot-cell worst case is bounded EXPLICITLY, not by AQE luck: a
    * cell larger than `maxCellSize` is sub-sharded by a hash of the id
    * into ⌈|cell|/maxCellSize⌉ shards and the drop rule runs within each
    * shard, so pairwise work is ≤ Σshards·(≈maxCellSize)² even when the
    * quantizer degenerates to one giant cell. Sub-sharding misses
    * cross-shard pairs the same way the quantizer already misses
    * cross-cell pairs — SemDeDup's recall tolerates quantizer splits by
    * design (the paper's own k grows with corpus size for the same
    * reason). The candidate exchange carries (cell, shard, id) ONLY;
    * vectors join in by id afterwards, so the skewed shuffle key never
    * carries the fat payload.
    *
    * Deterministic end to end: the quantizer is the seeded driver-side
    * [[IvfIndex]] fit (bounded sample, bit-stable centers), assignment is
    * map-side argmin, sharding is a pure hash of the id, and the drop
    * rule ("a lower id ≥ threshold exists in my shard") depends on no
    * iteration order.
    *
    * Returns one row per vector: (id, cell, kept).
    */
  def semanticDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, threshold: Double, seed: Long = 42L,
      maxCellSize: Int = 8192): DataFrame = {
    val assigned = IvfIndex.build(embeddings, idCol, vecCol, nClusters, seed)
      .assigned  // (neighbor_id, __cv, cell) — map-side after the fit
    val cand = semanticDedupCandidates(assigned, maxCellSize)
    val va = assigned.select(col("neighbor_id").as("id_a"), col("__cv").as("__va"))
    val vb = assigned.select(col("neighbor_id").as("id_b"), col("__cv").as("__vb"))
    val dropped = cand
      .join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .filter(round(graft.functions.GraftFunctions
        .cosine_sim(col("__va"), col("__vb")), 6) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.select(col("neighbor_id").as("id"), col("cell"))
      .join(dropped.withColumn("__d", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cell"), col("__d").isNull.as("kept"))
  }

  /** Candidate (id_a < id_b) pairs for [[semanticDedup]]: the within-cell
    * self-join, sub-sharded so no shuffle key ever fans out more than
    * ≈maxCellSize rows. Ids only — the vector payload joins in later.
    * Exposed for the spec that proves the pair-work bound on an
    * adversarial all-one-cell corpus.
    */
  private[graft] def semanticDedupCandidates(assigned: DataFrame,
      maxCellSize: Int): DataFrame = {
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    // per-cell sizes are ≤ nClusters rows — broadcast back for the shard
    // count; `/` is fractional division in Spark SQL, so ceil is exact
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("__n"))
    val ids = assigned.join(broadcast(sizes), Seq("cell"))
      .withColumn("__shard", pmod(xxhash64(col("neighbor_id")),
        greatest(lit(1L), ceil(col("__n") / lit(maxCellSize)).cast("long"))))
      .select(col("cell"), col("__shard"), col("neighbor_id"))
    ids.as("x").join(ids.as("y"), Seq("cell", "__shard"))
      .filter(col("x.neighbor_id") < col("y.neighbor_id"))
      .select(col("x.neighbor_id").as("id_a"), col("y.neighbor_id").as("id_b"))
  }
}
