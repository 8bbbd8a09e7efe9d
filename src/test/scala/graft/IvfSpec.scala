package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.northstar.{IvfIndex, Similarity}

/** IVF ANN: deterministic build, and recall@5 against the brute-force
  * baseline on the real embeddings.
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("IVF search recall@5 vs brute force is high with nprobe=half the cells") {
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val index = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)

    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = index.search(queries, "vec_id", "embedding", k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 too low: $recall")
    // every returned neighbor must be a real corpus vector, ranked within k
    assert(approx.forall(_._2 >= 0))
  }

  test("persisted index reloads from the centroid sidecar and reproduces search") {
    val emb = Tables.read(spark, dir, "embeddings")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_load").toString + "/idx"
    val built = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
      .persist(spark, path)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.isDefined, "sidecar-backed load must succeed after persist")
    val q = emb.filter(col("vec_id") < 10)
    val a = built.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
    val b = loaded.get.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
    assert(TestSpark.rows(a) == TestSpark.rows(b))
    // a dir with no index yields None (callers fall back to build), not a throw
    assert(IvfIndex.load(spark, java.nio.file.Files
      .createTempDirectory("graft_ivf_none").toString).isEmpty)
    // a probe set past the collect cap DEGRADES to the distributed
    // join path with identical results — never a hard failure of a
    // previously-working search (the cap is a driver-memory guard,
    // not a semantics bound)
    sys.props("graft.ivf.probeCollectCap") = "3"
    try {
      val capped = loaded.get.search(q, "vec_id", "embedding",
        k = 5, nprobe = 4)
      assert(TestSpark.rows(capped) == TestSpark.rows(a),
        "over-cap probe must fall back with identical results")
    } finally sys.props.remove("graft.ivf.probeCollectCap")
  }

  test("append assigns the delta to existing centroids and grows the " +
      "persisted lists without a rewrite") {
    val emb = Tables.read(spark, dir, "embeddings")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_app").toString + "/idx"
    val baseIdx = IvfIndex.build(base, "vec_id", "embedding", nlist = 8)
      .persist(spark, path)
    val appended = baseIdx.append(spark, path, delta, "vec_id", "embedding")
    // every corpus vector present exactly once after the append
    assert(appended.assigned.count() == emb.count())
    // append ≡ bulk assignment with the SAME centroids — exact cell parity
    // (the quantizer is train-once state; only the lists grow)
    val vecs = emb.select(col("vec_id").as("neighbor_id"),
      Similarity.toDoubleVec(col("embedding")).as("__cv"))
    val ref = IvfIndex.assignToCells(vecs,
      baseIdx.centroids.sortBy(_._1).map(_._2.toArray))
    assert(TestSpark.rows(appended.assigned.select("neighbor_id", "cell")) ==
      TestSpark.rows(ref.select("neighbor_id", "cell")))
    // the centroid sidecar rode the hard-link pass into the new version:
    // a cold reload reproduces search over the grown index
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.isDefined, "append must keep the index reloadable")
    val q = emb.filter(col("vec_id") < 10)
    assert(TestSpark.rows(
      appended.search(q, "vec_id", "embedding", k = 5, nprobe = 4)) ==
      TestSpark.rows(
        loaded.get.search(q, "vec_id", "embedding", k = 5, nprobe = 4)))
  }

  test("sidecar shape validation: dims mismatch rejects load; mismatched " +
    "query dims raise a clear error in search") {
    val spark2 = spark
    import spark2.implicits._
    val emb = Tables.read(spark, dir, "embeddings")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_dims").toString + "/idx"
    val built = IvfIndex.build(emb, "vec_id", "embedding", nlist = 4)
      .persist(spark, path)
    // corrupt the sidecar: declare the wrong dims in the header
    val sidecar = java.nio.file.Paths.get(
      new graft.io.ParquetTable(path, partitionColumns = Seq("cell"))
        .currentPath, "_centroids.csv")
    val lines = java.nio.file.Files.readAllLines(sidecar)
    val dims = lines.get(0).split(";dims=")(1).toInt
    lines.set(0, lines.get(0).replace(s";dims=$dims", s";dims=${dims + 1}"))
    java.nio.file.Files.write(sidecar, lines)
    assert(IvfIndex.load(spark, path).isEmpty,
      "a header whose dims disagree with the centroid rows must read as no-index")
    // search with wrong-dims query vectors fails with the clear message
    val badQ = Seq((1L, Seq.fill(dims + 3)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      built.search(badQ, "vec_id", "embedding", k = 3, nprobe = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("do not match index dims")),
      s"expected the dims-mismatch message, got: ${e.getMessage}")
  }

  test("IVF build is deterministic for a fixed seed") {
    val emb = Tables.read(spark, dir, "embeddings").limit(200)
    val a = IvfIndex.build(emb, "vec_id", "embedding", 4).assigned
      .select("neighbor_id", "cell")
    val b = IvfIndex.build(emb, "vec_id", "embedding", 4).assigned
      .select("neighbor_id", "cell")
    assert(TestSpark.rows(a) == TestSpark.rows(b))
  }

  test("semantic dedup: dropped iff a lower-id cluster-mate is >= threshold") {
    val emb = Tables.read(spark, dir, "embeddings")
    val threshold = 0.4
    val res = Similarity
      .semanticDedup(emb, "vec_id", "embedding", nClusters = 4, threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(res.length == emb.count())
    // replay the drop rule driver-side from the raw vectors (same round-6
    // cosine the engine applies)
    val vecs = emb.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0.0
      else BigDecimal(dot / d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((_, members) <- res.groupBy(_._2); (id, _, kept) <- members) {
      val hasLowerMate = members.exists { case (o, _, _) =>
        o < id && cos6(vecs(o), vecs(id)) >= threshold }
      assert(kept == !hasLowerMate,
        s"vec $id kept=$kept but lower-mate-above-threshold=$hasLowerMate")
    }
    // and something must actually be dropped on this corpus, or the
    // threshold is vacuous
    assert(res.exists(!_._3))
  }

  test("semantic dedup pair work is bounded on an adversarial all-one-cell corpus") {
    import spark.implicits._
    val n = 120
    val cap = 16
    // the quantizer's worst case, handed in directly: every vector in ONE cell
    val assigned = (0L until n.toLong).map(i => (i, Seq.fill(8)(1.0), 0))
      .toDF("neighbor_id", "__cv", "cell")
    val pairs = Similarity.semanticDedupCandidates(assigned, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val unsharded = n * (n - 1) / 2
    assert(pairs.length < unsharded / 3,
      s"sub-sharding did not cut pair work: ${pairs.length} vs $unsharded unsharded")
    // replay the bound from the candidate set itself: an id's pair degree is
    // its shard size - 1, so max degree + 1 bounds the largest shard
    val degrees = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map(_._2.length)
    val maxShard = degrees.max + 1
    val nShards = math.ceil(n.toDouble / cap).toInt
    assert(maxShard <= 3 * cap, s"hash sharding left a $maxShard-row shard (cap $cap)")
    assert(pairs.length <= nShards * maxShard * (maxShard - 1) / 2)

    // the full operator on identical vectors: within each shard everything
    // but the lowest id is dropped, so survivors = non-empty shards
    val emb = (0L until n.toLong).map(i => (i, Seq.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val res = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nClusters = 4, threshold = 0.9, maxCellSize = cap)
    val kept = res.filter(col("kept")).count()
    assert(kept >= 2 && kept <= nShards,
      s"expected one survivor per non-empty shard (<= $nShards), got $kept")
    // with the default cap no sharding kicks in: exactly one survivor
    val res0 = Similarity.semanticDedup(emb, "vec_id", "embedding", 4, 0.9)
    assert(res0.filter(col("kept")).count() == 1)
  }

  test("semantic dedup is deterministic across runs") {
    val emb = Tables.read(spark, dir, "embeddings")
    val a = Similarity.semanticDedup(emb, "vec_id", "embedding", 4, 0.4)
    val b = Similarity.semanticDedup(emb, "vec_id", "embedding", 4, 0.4)
    assert(TestSpark.rows(a) == TestSpark.rows(b))
  }
}
