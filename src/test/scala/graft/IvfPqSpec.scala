package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.northstar.{IvfPqIndex, Similarity}

/** IVFADC (IVF cells × PQ residual codes): exact recovery when both
  * approximation knobs are opened, persist/load round-trip fidelity,
  * recall floor at serving parameters, and sidecar corruption safety.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("all cells probed + corpus-covering rerank equals brute force exactly") {
    val emb = Tables.read(spark, dir, "embeddings")
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 5)
    // nprobe = nlist removes the cell pruning; rerank ≥ corpus makes the
    // exact re-rank see every candidate — with both knobs open, PQ's
    // lossiness cannot change the answer
    val viaIdx = IvfPqIndex
      .build(spark, emb, "vec_id", "embedding", nlist = 8, m = 8, ksub = 16)
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 8, rerank = n)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    assert(TestSpark.rows(viaIdx.select("query_id", "neighbor_id", "rank")) ==
      TestSpark.rows(brute.select("query_id", "neighbor_id", "rank")))
  }

  test("append grows a persisted IVFADC index without refit: appended " +
      "vectors carry bit-identical (cell, codes) to their build-time " +
      "twins, a cold reload serves them, and existing lists ride as " +
      "hard links") {
    val emb = Tables.read(spark, dir, "embeddings")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_append").toString + "/idx"
    val idx = IvfPqIndex
      .build(spark, emb, "vec_id", "embedding", nlist = 4, m = 4, ksub = 8)
      .persist(spark, path)
    val table = new graft.io.ParquetTable(path,
      partitionColumns = Seq("cell"))
    val before = table.read(spark).count()
    // twins: the same vectors re-added under shifted ids — the model is
    // train-once and per-vector deterministic, so a twin MUST land in
    // the same cell with the same codes its original got at build time
    val twins = emb.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val grown = idx.append(spark, path, twins, "vec_id", "embedding")
    val coded = table.read(spark)
    assert(coded.count() == before + 20)
    val byId = coded.select("neighbor_id", "cell", "__codes").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    (0L until 20L).foreach { id =>
      assert(byId(id + 1000L) == byId(id),
        s"twin $id must carry its original's exact (cell, codes)")
    }
    // the appended vector is findable at serving parameters — its own
    // direction must return either itself or its exact twin at rank 1
    val q = emb.filter(col("vec_id") === 7L)
      .withColumn("vec_id", lit(5000L))
    val top = grown.search(q, "vec_id", "embedding", k = 2, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(top.contains(1007L) || top.contains(7L))
    // cold reload parity over the grown index
    val reloaded = IvfPqIndex.load(spark, path).get
    val probe = emb.filter(col("vec_id") < 3)
    assert(pairs(reloaded.search(probe, "vec_id", "embedding", 3, 2)) ==
      pairs(grown.search(probe, "vec_id", "embedding", 3, 2)))
  }

  test("persisted index reloads and reproduces the in-memory search exactly") {
    val emb = Tables.read(spark, dir, "embeddings")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_load").toString + "/idx"
    val built = IvfPqIndex
      .build(spark, emb, "vec_id", "embedding", nlist = 8, m = 8, ksub = 16)
    val persisted = built.persist(spark, path)
    val loaded = IvfPqIndex.load(spark, path)
    assert(loaded.isDefined, "sidecar-backed load must succeed after persist")
    val q = emb.filter(col("vec_id") < 10)
    val a = built.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
    val b = persisted.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
    val c = loaded.get.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
    assert(TestSpark.rows(a) == TestSpark.rows(b))
    assert(TestSpark.rows(b) == TestSpark.rows(c))
    // loaded model state matches what was persisted, bit for bit
    assert(loaded.get.centroids.toSeq == built.centroids.toSeq)
    assert(loaded.get.pq.codebooks.flatten.flatten.toSeq ==
      built.pq.codebooks.flatten.flatten.toSeq)
  }

  test("recall@5 at serving parameters beats the probed-fraction floor") {
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val approx = pairs(IvfPqIndex
      .build(spark, emb, "vec_id", "embedding", nlist = 8, m = 8, ksub = 16)
      .search(queries, "vec_id", "embedding", k = 5, nprobe = 4, rerank = 8))
    val recall = (exact intersect approx).size.toDouble / exact.size
    // nprobe=4 of 8 cells scans ~half the corpus; a no-better-than-random
    // index would land recall ≈ 0.5 — require clear lift from the
    // centroid ranking + ADC shortlist
    assert(recall >= 0.5, s"recall@5 too low: $recall")
  }

  test("a torn or shape-mismatched sidecar reads as no-index, not a throw") {
    val emb = Tables.read(spark, dir, "embeddings")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_torn").toString + "/idx"
    IvfPqIndex.build(spark, emb, "vec_id", "embedding",
      nlist = 4, m = 8, ksub = 8).persist(spark, path)
    val table = new graft.io.ParquetTable(path, partitionColumns = Seq("cell"))
    val sidecar = java.nio.file.Paths.get(table.currentPath, "_ivfpq_model.csv")
    // truncate the codebook section: header now over-declares
    val lines = java.nio.file.Files.readAllLines(sidecar)
    java.nio.file.Files.write(sidecar,
      String.join("\n", lines.subList(0, lines.size - 3))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(IvfPqIndex.load(spark, path).isEmpty)
    // no index at all → None (callers fall back to build)
    assert(IvfPqIndex.load(spark, java.nio.file.Files
      .createTempDirectory("graft_ivfpq_none").toString).isEmpty)
  }
}
