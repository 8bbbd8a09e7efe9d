package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale (BASELINE.json north-star).
  *
  * Algorithms are the published classics: MinHash resemblance sketches
  * (Broder, "On the resemblance and containment of documents", 1997),
  * banded LSH (Indyk & Motwani, 1998; banding analysis as in Mining of
  * Massive Datasets ch. 3), SimHash (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002).
  *
  * Four families, all built from Spark primitives so Catalyst plans the
  * shuffles:
  *
  *  - exact:    hash-groupBy on a canonical fingerprint (1 shuffle);
  *  - MinHash + LSH: shingle → k-permutation minhash → banded bucket join —
  *    candidate generation is a self-join on (band, bucket-hash), never the
  *    O(n²) cross join;
  *  - SimHash: 64-bit signature via HOF bit aggregation, near-dups through
  *    banded buckets + popcount verify;
  *  - embedding cosine: random-hyperplane LSH buckets + exact cosine verify.
  *
  * At 100 TB the only shuffles are the bucket joins, whose fan-in is
  * controlled by (bands × rows) resp. hyperplane count; everything else is
  * map-side.
  *
  * Caching contract (the GraphRank discipline): the pair-finding
  * operators cache an intermediate (shingle sets / signatures) that the
  * pair plan references from multiple branches — tokenize once, not per
  * branch. Each entry point MATERIALIZES its result eagerly, releases
  * those corpus-sized intermediates before returning, and returns the
  * result as the ONE cached relation that outlives the call — pair-sized
  * (duplicates, not corpus), released by `result.unpersist()` (or a
  * harness `clearCache()`). An embedding application can therefore call
  * these in a loop without accreting corpus-sized cache entries; a spec
  * asserts the cache manager is empty once the returned relation is
  * released.
  */
object Dedup {

  // ---- MinHash ----

  /** k-permutation MinHash signatures. Shingle strings are hashed ONCE
    * (native [[TextAnalysis.shingleHashes]] pass); the full signature is
    * then a single map-side expression over the hash array
    * ([[graft.functions.MinHashSignature]]) — NO explode, NO aggregate
    * exchange. Signature building shuffles nothing; the first exchange of
    * the MinHash pipeline is the LSH band join itself. (The previous
    * explode + groupBy + k·min() formulation kept partials map-side, but
    * the row expansion and the aggregate exchange were the dominant cost
    * of every MinHash query — and its per-permutation hash scheme is
    * replicated bit-for-bit here, pinned by MinhashParitySpec.)
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, shingleSize: Int): DataFrame =
    minhashSignaturesWith(docs, idCol, textCol, numPerm, shingleSize, Nil)

  /** [[minhashSignatures]] carrying extra columns through (the streaming
    * near-dup path needs the event-time column alongside the signature) —
    * same shingle/permutation scheme by construction.
    */
  def minhashSignaturesWith(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int, shingleSize: Int, carry: Seq[String]): DataFrame =
    signaturesFromShingles(
      docs.select(col(idCol) +: carry.map(col) :+
        array_distinct(TextAnalysis.shingleHashes(col(textCol), shingleSize))
          .as("__shingles"): _*),
      idCol, numPerm, carry)

  /** Signatures from a (id, __shingles) frame — shared by the standalone
    * signature op and the near-duplicate path so the permutation scheme
    * cannot drift between them. Documents with a NULL shingle array (NULL
    * text) get a NULL signature and are dropped. Token-LESS documents are
    * NOT dropped: they shingle to the one seed hash, so all empty docs are
    * mutual jaccard-1.0 duplicates — semantically correct, but m identical
    * docs (empty or not) always imply an m²/2 pair clique in ANY pairwise
    * dedup; run exact dedup (content-hash groupBy) first to collapse
    * identical docs, which the corpus-prep composite does.
    */
  private def signaturesFromShingles(shingleSets: DataFrame, idCol: String,
      numPerm: Int, carry: Seq[String] = Nil): DataFrame =
    shingleSets.select(col(idCol) +: carry.map(col) :+
        graft.functions.MinHashFunctions
          .minhash_signature(col("__shingles"), numPerm).as("__sig"): _*)
      .filter(col("__sig").isNotNull)

  /** LSH banding: explode the signature into (band_id, band_hash) rows.
    * Equal band hash in any band → candidate pair.
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    lshBandsWith(df, idCol, sigCol, bands, rowsPerBand, Nil)

  /** [[lshBands]] carrying extra columns through — same band-hash formula
    * by construction (the streaming path rides the event-time column
    * alongside each banded row).
    */
  def lshBandsWith(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int, carry: Seq[String]): DataFrame = {
    val bandHashes = transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band_id"),
        xxhash64(concat_ws(",",
          slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))).as("band_hash")))
    df.select(col(idCol) +: carry.map(col) :+ explode(bandHashes).as("b"): _*)
      .select(col(idCol) +: carry.map(col) :+
        col("b.band_id") :+ col("b.band_hash"): _*)
  }

  /** Candidate pairs from banded signatures: self-join on (band_id,
    * band_hash), deduplicated across bands. Pair order (a < b) keeps each
    * pair once.
    */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val left = bandsDf.withColumnRenamed(idCol, "id_a")
    val right = bandsDf.withColumnRenamed(idCol, "id_b")
    left.join(right, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** MinHash near-duplicate pairs with exact Jaccard verification over the
    * shingle sets (verification joins the two shingle arrays back in and
    * computes |∩|/|∪| with array ops).
    */
  def minhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      jaccardThreshold: Double = 0.5): DataFrame = {
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm) — a zero-width band " +
        "hashes every signature identically and degenerates to the full " +
        "cross product; a non-dividing count silently drops permutations")
    val rowsPerBand = numPerm / bands
    val shingleSets = docs.select(col(idCol),
      array_distinct(TextAnalysis.shingleHashes(col(textCol), shingleSize))
        .as("__shingles"))
    shingleSets.cache()
    // signatures derive from the cached shingle sets — tokenize once, not twice
    val withSig = signaturesFromShingles(shingleSets, idCol, numPerm)
    val pairs = candidatePairs(lshBands(withSig, idCol, "__sig", bands, rowsPerBand), idCol)
    val result =
      verifyJaccard(pairs, shingleSets, idCol, jaccardThreshold).persist()
    result.count() // materialize, then release the corpus-sized sets NOW
    shingleSets.unpersist(blocking = false)
    result
  }

  /** Exact-Jaccard verification of candidate pairs against shingle sets —
    * SINGLE-SOURCED for the batch, incremental and cross-corpus paths so
    * the formula (and its round-6 presentation) cannot drift between
    * them. `setsB` defaults to `setsA` (the self-join paths); the
    * cross-corpus path passes each corpus's own sets.
    */
  private def verifyJaccard(cand: DataFrame, setsA: DataFrame, idCol: String,
      threshold: Double, setsB: DataFrame = null): DataFrame = {
    val a = setsA.select(col(idCol).as("id_a"), col("__shingles").as("__sh_a"))
    val b = Option(setsB).getOrElse(setsA)
      .select(col(idCol).as("id_b"), col("__shingles").as("__sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-corpus near-duplicate pairs — FUZZY decontamination, the
    * Dolma/FineWeb-class train-vs-benchmark sweep that exact n-gram
    * overlap ([[CorpusClean.contaminatedIds]], q58/q75) cannot cover: a
    * lightly paraphrased or truncated benchmark document shares few
    * verbatim 8-grams but keeps high shingle Jaccard. Same scheme as
    * [[minhashNearDuplicates]] — per-side signatures, then the LSH band
    * join BETWEEN the corpora (never an all-pairs product; the benchmark
    * side is tiny, so its banded rows broadcast at deployment scale) and
    * the exact-Jaccard verify, which keeps precision structurally 1.0.
    * Returns (id_a = left/train id, id_b = right/benchmark id, jaccard).
    */
  def crossNearDuplicates(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, numPerm: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, jaccardThreshold: Double = 0.5): DataFrame = {
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val rowsPerBand = numPerm / bands
    def sets(df: DataFrame) = df.select(col(idCol),
      array_distinct(TextAnalysis.shingleHashes(col(textCol), shingleSize))
        .as("__shingles"))
    val ls = sets(left).cache()
    val rs = sets(right).cache()
    def banded(s: DataFrame, as: String) =
      lshBands(signaturesFromShingles(s, idCol, numPerm), idCol, "__sig",
        bands, rowsPerBand).withColumnRenamed(idCol, as)
    val cand = banded(ls, "id_a")
      .join(banded(rs, "id_b"), Seq("band_id", "band_hash"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val result =
      verifyJaccard(cand, ls, idCol, jaccardThreshold, setsB = rs).persist()
    result.count() // materialize, then release both corpora's sets NOW
    ls.unpersist(blocking = false)
    rs.unpersist(blocking = false)
    result
  }

  /** A persisted near-duplicate index: the banded LSH table plus the
    * shingle sets of the already-landed corpus. This is the production
    * shape at 100 TB — pairing is INCREMENTAL: each incoming batch is
    * banded and probed against the index instead of re-pairing the whole
    * corpus (which is quadratic in ingest count if done per batch).
    *
    * The index RECORDS its scheme parameters: probing with a different
    * numPerm/bands/shingleSize than the build would band different slices
    * of different signatures over different shingles — near-zero matches,
    * silently. [[incrementalNearDuplicates]] therefore takes its scheme
    * from the index, never from the caller.
    */
  final case class NearDupIndex(bands: DataFrame, sets: DataFrame,
      numPerm: Int = 64, numBands: Int = 16, shingleSize: Int = 3)

  /** Build the [[NearDupIndex]] frames for a corpus — same shingle and
    * permutation scheme as [[minhashNearDuplicates]], so incremental
    * results are identical to what a full-batch re-pairing would find.
    * Persist both frames through `ParquetTable` and read them back to get
    * a durable index.
    */
  def buildNearDupIndex(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int = 64, bands: Int = 16, shingleSize: Int = 3): NearDupIndex = {
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val sets = docs.select(col(idCol),
      array_distinct(TextAnalysis.shingleHashes(col(textCol), shingleSize))
        .as("__shingles"))
    NearDupIndex(
      lshBands(signaturesFromShingles(sets, idCol, numPerm),
        idCol, "__sig", bands, numPerm / bands),
      sets, numPerm, bands, shingleSize)
  }

  /** Near-duplicate pairs of an incoming batch against (and within)
    * a persisted index — the index side is only ever probed:
    * the batch's band table broadcasts into the (corpus-sized) index
    * join, so the index never shuffles; the exact-Jaccard verification
    * joins shingle sets for candidate ids only (candidate-sized, ≪
    * corpus). Pair ids are canonicalized (id_a < id_b) to match the
    * batch operators.
    */
  def incrementalNearDuplicates(index: NearDupIndex, newDocs: DataFrame,
      idCol: String, textCol: String,
      jaccardThreshold: Double = 0.5): DataFrame = {
    // the banding scheme comes from the index — a caller-supplied scheme
    // that differed from the build would probe near-nothing, silently
    val numPerm = index.numPerm
    val bands = index.numBands
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val newSets = newDocs.select(col(idCol),
      array_distinct(
        TextAnalysis.shingleHashes(col(textCol), index.shingleSize))
        .as("__shingles"))
    newSets.cache()
    val newBands = lshBands(signaturesFromShingles(newSets, idCol, numPerm),
      idCol, "__sig", bands, numPerm / bands)
    // batch vs corpus: broadcast the small batch into the big index
    val crossCand = index.bands
      .select(col(idCol).as("__ia"), col("band_id"), col("band_hash"))
      .join(broadcast(newBands
        .select(col(idCol).as("__ib"), col("band_id"), col("band_hash"))),
        Seq("band_id", "band_hash"))
      .filter(col("__ia") =!= col("__ib"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"))
      .distinct()
    // batch vs batch: the ordinary banded self-join, batch-sized
    val newCand = candidatePairs(newBands, idCol)
    val cand = crossCand.union(newCand).distinct()
    // An id present in BOTH the index and the batch (at-least-once
    // re-delivery, possibly with updated text) must resolve to ONE shingle
    // set — the batch's, the fresher observation. A plain union would keep
    // both rows and fan every (id, x) candidate out into duplicate,
    // conflicting pair rows.
    val all = index.sets
      .join(broadcast(newSets.select(col(idCol))), Seq(idCol), "left_anti")
      .union(newSets)
    val result = verifyJaccard(cand, all, idCol, jaccardThreshold).persist()
    result.count() // materialize, then release the batch's sets NOW
    newSets.unpersist(blocking = false)
    result
  }

  /** Canonical shared-shingle pair counts (id_a < id_b) via an INVERTED
    * INDEX: group occurrences by shingle into posting lists, drop lists
    * longer than `maxDf` (the stop-shingle cap, cf. Ed-Join's frequency
    * filtering, Xiao et al., VLDB 2008 — free here, where a join-shape
    * formulation would need a separate frequency aggregate plus an anti
    * join), then expand each list's pairs map-side with a double
    * explode. One exchange builds the index and one aggregates the pairs —
    * versus FOUR for the exploded self-join (df aggregate + two join
    * sides + pair aggregate), and the cap bounds both the per-key memory
    * (maxDf postings) and the pair fan-out (maxDf² rows) per shingle.
    *
    * `sets` must carry (id, sh: array, n = |sh|) with `sh` per-doc
    * distinct, so a list's length IS the shingle's document frequency.
    * Returns (id_a, id_b, n_a, n_b, inter) — enough to derive Jaccard
    * (symmetric) or containment in either direction without re-joining.
    */
  def sharedShinglePairs(sets: DataFrame,
      maxDf: Option[Int] = None,
      maxDfFraction: Option[Double] = None): DataFrame = {
    require(maxDf.isEmpty || maxDfFraction.isEmpty,
      "pass an ABSOLUTE df cap or a df FRACTION, not both")
    // the FRACTION mode is the corpus-decade form of the stop-shingle
    // cap: an absolute cap pinned at one tier SATURATES as the corpus
    // grows (content that repeats through a decade pushes every
    // planted shingle's df past it and the operator silently returns
    // empty — BASELINE.md's recorded q25/q48 finding at sf1), while
    // cap = max(2, ceil(f · |corpus|)) keeps the same stop-shingle
    // SELECTIVITY at every scale. Costs one O(1)-result count job;
    // per-shingle pair fan-out stays bounded at cap² by construction.
    val cap: Option[Int] =
      maxDfFraction.fold(maxDf) { f =>
        require(f > 0 && f <= 1, s"df fraction must be in (0, 1], got $f")
        Some(math.max(2L, math.ceil(f * sets.count()).toLong)
          .min(Int.MaxValue).toInt)
      }
    val postings = sets
      .select(explode(col("sh")).as("g"), struct(col("id"), col("n")).as("e"))
      .groupBy(col("g")).agg(collect_list(col("e")).as("lst"))
    val bounded = cap.fold(postings)(d => postings.filter(size(col("lst")) <= d))
    // group on the PAIR alone — the set sizes are functionally dependent
    // on their ids, so they ride as min() aggregates instead of widening
    // the exchange's sort/compare key
    bounded
      .select(explode(col("lst")).as("x"), col("lst"))
      .select(col("x"), explode(col("lst")).as("y"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"),
        min(col("x.n")).as("n_a"), min(col("y.n")).as("n_b"))
  }

  /** Exact n-gram Jaccard over all pairs sharing at least one shingle —
    * the no-approximation baseline, on the [[sharedShinglePairs]] inverted
    * index: only colliding pairs ever materialize, never the O(n²) cross
    * join.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDocFrequency: Option[Int] = None,
      maxDocFrequencyFraction: Option[Double] = None): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.shingleHashes(col(textCol), shingleSize)).as("sh"))
      .withColumn("n", size(col("sh")))
    // |∪| still uses the full per-doc set sizes, so Jaccard is only
    // *under*-estimated for pairs whose overlap was mostly stop-shingles.
    sharedShinglePairs(sets, maxDocFrequency, maxDocFrequencyFraction)
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- SimHash ----

  /** Bit masks 1L<<0 … 1L<<63 as an array literal (lambda variables cannot
    * be shift amounts in the Column API, so bits are tested by mask).
    */
  private val BitMasks: Seq[Long] = (0 until 64).map(1L << _)

  /** 64-bit SimHash over whitespace tokens: per token hash, each bit votes
    * ±1; the signature bit is 1 where the vote sum is positive. Pure HOF
    * fold — map-side only.
    */
  def simhash64(text: Column): Column = {
    val masks = typedLit(BitMasks)
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val votes = aggregate(hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        transform(masks, m => when(h.bitwiseAND(m) =!= 0, lit(1)).otherwise(lit(-1))),
        (a, v) => a + v))
    aggregate(zip_with(votes, masks,
      (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** DataFrame-level SimHash: ONE compiled pass per row over the raw
    * whitespace split (the native [[graft.functions.SimHash64]] expression
    * skips the split's empty-string artifacts itself) — NO explode, NO
    * 64-column vote aggregate, NO join-back. Same semantics as the
    * Column-level [[simhash64]], which NorthStarSpec pins bit-for-bit:
    * votes over ALL tokens (non-distinct), bit set where the vote sum is
    * positive, 0L for token-less docs, NULL for NULL text. (History: the
    * interpreted HOF fold was ~8× slower than the exploded vote aggregate;
    * the native pass beats both and shuffles nothing.)
    */
  def simhashSignatures(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
      graft.functions.SimHashFunctions.simhash64(
        split(col(textCol), TextAnalysis.WsClass + "+")).as("__sim"))

  /** SimHash near-duplicates: band the 64 bits into `bands` chunks (equal
    * chunk → candidate, guaranteed to catch any pair within bands-1 bit
    * flips), verify by popcount.
    */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(bands >= 2 && bands <= 64 && 64 % bands == 0,
      s"bands ($bands) must divide 64 with at least 2 bands — bands=1 has " +
        "no collision-filtering power and a non-divisor leaves top bits " +
        "outside every band")
    val bits = 64 / bands
    val withSig = simhashSignatures(docs, idCol, textCol)
    withSig.cache()
    // band chunks built with Scala-side shift amounts (plain Ints)
    val chunks = array((0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        shiftrightunsigned(col("__sim"), b * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("chunk"))
    }: _*)
    val banded = withSig.select(col(idCol), col("__sim"),
      explode(chunks).as("b"))
      .select(col(idCol), col("__sim"), col("b.band_id"), col("b.chunk"))
    val left = banded.select(col(idCol).as("id_a"), col("__sim").as("__sim_a"),
      col("band_id"), col("chunk"))
    val right = banded.select(col(idCol).as("id_b"), col("__sim").as("__sim_b"),
      col("band_id"), col("chunk"))
    val result = left.join(right, Seq("band_id", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("__sim_a"), col("__sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .persist()
    result.count() // materialize, then release the signature cache NOW
    withSig.unpersist(blocking = false)
    result
  }

  /** Embedding-cosine near-duplicates via Similarity's LSH machinery.
    * `planes` trades per-table selectivity against per-table recall;
    * `tables` buys recall back linearly in banding cost (recall per pair
    * at similarity s is 1-(1-p^planes)^tables with p = 1-θ(s)/π), so a
    * LOW threshold wants FEWER planes and MORE tables — see q28's 4×8 for
    * threshold 0.4 vs the 16-plane default for 0.95.
    */
  def embeddingNearDuplicates(embeddings: DataFrame, idCol: String,
      vecCol: String, threshold: Double = 0.95, planes: Int = 16,
      tables: Int = 4, dims: Int = 64): DataFrame =
    Similarity.cosineNearDuplicates(embeddings, idCol, vecCol, threshold,
      planes, tables, dims)

  // ---- duplicate-cluster resolution ----

  /** Connected components over a near-duplicate pair set by iterative
    * min-label propagation: every node's label converges to the smallest
    * id reachable from it, which doubles as the cluster's canonical id.
    * Pair-level dedup alone under-deletes — near-duplication is transitive
    * in practice (A≈B, B≈C ⇒ keep ONE of {A,B,C}), so production dedup
    * resolves clusters, not pairs.
    *
    * Scale shape: each round is one edge⨝label join + a min aggregate +
    * the label update join — all shuffles on the node id; the convergence
    * check rides the cached update (old label carried in-row), costing no
    * extra join. Rounds needed = cluster diameter, and
    * near-dup clusters are dense (quasi-cliques), so diameter is tiny;
    * for adversarial long-chain graphs the published fix is
    * large-star/small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC 2014) — same join primitive, O(log n)
    * rounds. Each round eagerly `localCheckpoint`s the new labels: caching
    * alone only truncates EXECUTION — the analyzed logical plan would
    * still nest the prior round's plan twice (join + convergence compare)
    * and grow exponentially with rounds, blowing analysis time and
    * eventually the stack on plan traversal. The checkpoint resets the
    * plan to a LogicalRDD, so per-round analysis cost is O(1). (On a real
    * cluster, swap in reliable `checkpoint()` with a checkpoint dir if
    * executor loss must not force a from-scratch re-run.) If maxIter
    * rounds don't converge — the graph's diameter exceeded the budget —
    * the call ESCALATES to [[connectedComponentsStar]] (O(log n) rounds
    * regardless of shape) instead of failing: callers shouldn't need to
    * know graph diameter, and a silent partial clustering would
    * under-delete quietly.
    */
  /** Scoped loop confs — the q93/GraphRank lesson applied to the CC
    * loops: they run EAGERLY (checkpoint + count per round), so AQE's
    * per-stage re-planning only adds driver round-trips to sub-second
    * fixed-shape jobs, and the label/edge frames are PAIR-GRAPH-sized
    * (duplicates, not corpus), so `roundPartitions` right-sizes their
    * exchanges. Both session confs are restored before returning; every
    * returned frame is checkpoint-materialized inside the window.
    */
  private def withLoopConfs[T](df: DataFrame,
      roundPartitions: Option[Int])(body: => T): T = {
    val spark = df.sparkSession
    val AqeKey = "spark.sql.adaptive.enabled"
    val PartKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(AqeKey)
    val prevParts = spark.conf.get(PartKey)
    spark.conf.set(AqeKey, "false")
    roundPartitions.foreach(p => spark.conf.set(PartKey, p.toString))
    try body finally {
      spark.conf.set(AqeKey, prevAqe)
      spark.conf.set(PartKey, prevParts)
    }
  }

  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 20,
      roundPartitions: Option[Int] = None): DataFrame =
      withLoopConfs(pairs, roundPartitions) {
    // eager localCheckpoint: materialized once, plan truncated to a
    // LogicalRDD — every round's plan then starts from O(1)-size leaves.
    // Pre-partitioned on the join key: the edge set is the loop
    // INVARIANT, so shuffling it into place once lets every round's join
    // reuse the materialized partitioning and move only the (smaller)
    // label side.
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .repartition(col("dst"))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // one round = ONE join + ONE aggregate: propagate each node's label
      // to its neighbors, then per node take the min over {own label} ∪
      // {neighbor labels}. Tagging the own-label row lets the same
      // aggregate carry the previous label out for the convergence test;
      // the join-shape update (propagate + groupBy + join-back) computes
      // the same answer with a third label-sized exchange per round.
      val prop = edges
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .select(col("src").as("id"), col("comp"), lit(false).as("__own"))
      val updated = labels.select(col("id"), col("comp"), lit(true).as("__own"))
        .union(prop)
        .groupBy("id")
        .agg(min(col("comp")).as("comp"),
          min(when(col("__own"), col("comp"))).as("__old"))
        .localCheckpoint()
      val changed = updated.filter(col("comp") =!= col("__old")).count()
      // the new checkpoint is self-contained — drop the superseded round's
      // blocks now instead of waiting for the RDD to be GC'd
      org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(labels)
      labels = updated
      converged = changed == 0L
      i += 1
    }
    org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(edges)
    if (!converged) {
      org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(labels)
      System.err.println(
        s"[graft] connectedComponents: diameter exceeded $maxIter " +
          "min-label rounds — escalating to large-star/small-star")
      connectedComponentsStar(pairs, aCol, bCol)
    } else labels.select(col("id"), col("comp"))
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the adversarial-graph companion to
    * [[connectedComponents]]: min-label propagation needs
    * cluster-DIAMETER rounds (unbounded on long chains), this variant
    * converges in logarithmically many rounds regardless of graph shape
    * (the paper's bound for the alternating algorithm), at the cost of a
    * distinct + set-equality check per round.
    *
    * Large-star hangs every node's larger neighbors onto the minimum of
    * its neighborhood; small-star re-hangs the smaller neighbors. Both
    * preserve connectivity and monotonically shrink the potential, and
    * the fixpoint is a star forest centered at each component's minimum
    * id — so the surviving edges ARE the (member → canonical) labels.
    * Every step is a groupBy/join on the node id; nothing is ever
    * driver-side.
    */
  def connectedComponentsStar(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 25,
      roundPartitions: Option[Int] = None): DataFrame =
      withLoopConfs(pairs, roundPartitions) {
    val nodes = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id"))).distinct()
    // canonical undirected edge (lo < hi); self-loops carry no information.
    // Eager localCheckpoint per round truncates the plan to a LogicalRDD —
    // without it the union re-references each round's plan twice and the
    // analyzed tree grows exponentially with rounds (see
    // [[connectedComponents]]).
    var edges = pairs
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint()
    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: from each endpoint u, hang every LARGER neighbor v
      // onto m = min(Γ(u) ∪ {u})
      val sym = edges.select(col("lo").as("u"), col("hi").as("v"))
        .union(edges.select(col("hi").as("u"), col("lo").as("v")))
      val nbrMin = sym.groupBy("u").agg(min(col("v")).as("mn"))
      val large = sym.join(nbrMin, "u")
        .filter(col("v") > col("u"))
        .select(least(col("u"), col("mn")).as("lo"), col("v").as("hi"))
        .filter(col("lo") =!= col("hi")).distinct()
      // small-star: per node u, re-hang its SMALLER neighbors (keyed by
      // hi in the canonical orientation) onto their collective minimum
      val smMin = large.groupBy(col("hi").as("u")).agg(min(col("lo")).as("mn"))
      val rehung = large.join(smMin, col("hi") === col("u"))
      val next = rehung.select(col("mn").as("lo"), col("hi"))
        .union(rehung.filter(col("lo") =!= col("mn"))
          .select(col("mn").as("lo"), col("lo").as("hi")))
        .distinct()
        .localCheckpoint()
      val nextCount = next.count()
      val stable = nextCount == edgeCount && next.except(edges).isEmpty
      // superseded round's blocks are dead once `next` is materialized and
      // the stability compare has read the old set
      org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(edges)
      edges = next
      edgeCount = nextCount
      converged = stable
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixpoint star forest: every child appears as hi exactly once
    nodes.join(edges.select(col("hi").as("id"), col("lo").as("comp")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Duplicate clusters from near-dup pairs: one row per multi-member
    * cluster with its canonical (smallest) id and member count.
    */
  def duplicateClusters(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b",
      roundPartitions: Option[Int] = None): DataFrame =
    connectedComponents(pairs, aCol, bCol,
        roundPartitions = roundPartitions)
      .groupBy(col("comp").as("canonical_id"))
      .agg(count(lit(1)).as("members"))
      .filter(col("members") >= 2)

  /** The deletion step: drop every non-canonical cluster member from the
    * corpus, keeping the smallest id of each near-dup cluster (and all
    * unclustered docs). The redundant-id set is cluster-members-sized
    * (duplicates only, ≪ corpus) → broadcast anti join, no corpus shuffle.
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame,
      idCol: String, roundPartitions: Option[Int] = None): DataFrame = {
    val redundant = connectedComponents(pairs,
        roundPartitions = roundPartitions)
      .filter(col("comp") =!= col("id"))
      .select(col("id").as(idCol))
    docs.join(broadcast(redundant), Seq(idCol), "left_anti")
  }

  /** Exact duplicate-SPAN removal (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022 — the span-level
    * complement of document dedup): cut every document into consecutive
    * non-overlapping `spanTokens`-token spans, drop every span whose exact
    * text already occurred earlier in the corpus (first occurrence by
    * (id, span position) wins, globally deterministic), and reassemble
    * each document from its surviving spans. Catches boilerplate and
    * quoted passages that document-level dedup can never see — a doc that
    * is 90% template and 10% novel keeps exactly its novel 10%.
    *
    * One corpus scan, two exchanges: the span-hash window (first-occurrence
    * ranking) and the per-doc regroup. Span construction is map-side
    * Column algebra — no explode-then-regroup for the spans themselves.
    * Span-hash keys are md5 over ~`spanTokens` words: effectively unique,
    * so the window carries no skew surface; documents with zero tokens
    * have no spans and are excluded by construction.
    *
    * Returns (id, clean_text, spans_dropped) — clean_text is "" for a doc
    * whose every span occurred earlier (a full duplicate).
    */
  def dropDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(spanTokens >= 1, s"spanTokens ($spanTokens) must be >= 1")
    val spans = docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("tk"))
      .withColumn("n_spans",
        ceil(size(col("tk")).cast("double") / spanTokens).cast("int"))
      .select(col("id"),
        posexplode(when(col("n_spans") >= 1,
          transform(sequence(lit(0), col("n_spans") - 1),
            i => concat_ws(" ",
              slice(col("tk"), i * spanTokens + 1, lit(spanTokens)))))
          .otherwise(array().cast("array<string>"))))
      .withColumnsRenamed(Map("pos" -> "span_idx", "col" -> "span"))
    val w = Window.partitionBy(md5(to_binary(col("span"), lit("utf-8"))))
      .orderBy(col("id"), col("span_idx"))
    spans.withColumn("__rn", row_number().over(w))
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col("__rn") === 1, struct(col("span_idx"), col("span"))))),
          x => x.getField("span")), " ").as("clean_text"),
        (count(lit(1)) - sum(when(col("__rn") === 1, 1).otherwise(0)))
          .cast("int").as("spans_dropped"))
  }
}
