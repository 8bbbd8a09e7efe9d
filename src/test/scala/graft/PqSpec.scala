package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.io.Tables
import graft.northstar.{PqIndex, ProductQuantizer, Similarity, VectorOps}

/** Product-quantized ANN: code shape and determinism, ADC approximation
  * quality on structured (clusterable) data, exact recovery when the
  * shortlist covers the corpus, and end-to-end recall on the real
  * embeddings.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def unitVecs(d: org.apache.spark.sql.DataFrame) =
    d.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("__raw"))
      .withColumn("__n", VectorOps.l2Norm(col("__raw")))
      .select(col("vec_id"),
        VectorOps.l2Normalize(col("__raw"), col("__n")).as("__uv"))

  test("encode emits m codes in [0, ksub) and is deterministic") {
    val unit = unitVecs(Tables.read(spark, dir, "embeddings"))
    val pq = ProductQuantizer.fit(unit, "vec_id", "__uv", m = 8, ksub = 16)
    assert(pq.dims == 64 && pq.codebooks.length == 8 &&
      pq.codebooks.forall(_.length == 16))
    val codes = unit.select(col("vec_id"), pq.encode(col("__uv")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 &&
      c.forall(j => j >= 0 && j < 16)))
    // refit with the same seed must reproduce codes bit-for-bit
    val pq2 = ProductQuantizer.fit(unit, "vec_id", "__uv", m = 8, ksub = 16)
    val codes2 = unit.select(col("vec_id"), pq2.encode(col("__uv")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes == codes2)
  }

  test("ADC dot approximates the exact cosine tightly on clusterable data") {
    val spark2 = spark
    import spark2.implicits._
    // 4 well-separated axis clusters in 8-dim space with small jitter —
    // structure a codebook CAN capture, unlike the near-random corpus
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val axis = i % 4
      val v = Array.tabulate(8)(d =>
        (if (d == axis * 2) 1.0 else 0.0) + rnd.nextGaussian() * 0.05)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val unit = unitVecs(df.select(col("vec_id"),
      col("embedding").cast("array<float>").as("embedding")))
    val pq = ProductQuantizer.fit(unit, "vec_id", "__uv", m = 4, ksub = 8)
    val coded = unit.withColumn("__codes", pq.encode(col("__uv")))
    val q = unit.limit(10)
      .select(col("vec_id").as("query_id"), col("__uv").as("__qv"))
    val maxErr = coded.crossJoin(broadcast(q))
      .select(abs(pq.adcDot(col("__qv"), col("__codes")) -
        GraftFunctions.dot_product(col("__qv"), col("__uv"))).as("e"))
      .agg(max(col("e"))).collect()(0).getDouble(0)
    assert(maxErr <= 0.15, s"ADC error too large on clusterable data: $maxErr")
  }

  test("search with a corpus-covering shortlist equals brute force exactly") {
    val emb = Tables.read(spark, dir, "embeddings")
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 5)
    // rerank window ≥ corpus size ⇒ the exact re-rank sees every vector,
    // so PQ's lossiness cannot change the answer — output must be
    // bit-identical to brute force
    val viaPq = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
      .search(queries, "vec_id", "embedding", k = 5, rerank = n)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    assert(TestSpark.rows(viaPq.select("query_id", "neighbor_id", "rank")) ==
      TestSpark.rows(brute.select("query_id", "neighbor_id", "rank")))
  }

  test("end-to-end recall@5 on real embeddings beats the shortlist floor") {
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
      .search(queries, "vec_id", "embedding", k = 5, rerank = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // the 40-candidate shortlist is 40% of this corpus; a shortlist no
    // better than random would land recall ≈ 0.4 — require clear lift
    assert(recall >= 0.6, s"recall@5 too low: $recall")
  }

  test("native encode/ADC kernels are bit-parity with the Column formulation") {
    val unit = unitVecs(Tables.read(spark, dir, "embeddings"))
    val pq = ProductQuantizer.fit(unit, "vec_id", "__uv", m = 8, ksub = 16)
    // encode: native one-pass vs argmin-over-sortable-structs
    val both = unit
      .withColumn("__native", pq.encode(col("__uv")))
      .withColumn("__column", pq.columnEncode(col("__uv")))
    assert(both.filter(col("__native") =!= col("__column")).count() == 0)
    // ADC: native fused loop vs slice/element_at/dot-product fold, over
    // every (query, corpus) pair — exact equality, not tolerance: both
    // sides accumulate in the same ascending-d, ascending-s order
    val coded = unit.withColumn("__codes", pq.encode(col("__uv")))
    val q = unit.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("__uv").as("__qv"))
    val mismatches = coded.crossJoin(broadcast(q))
      .select(pq.adcDot(col("__qv"), col("__codes")).as("n"),
        pq.columnAdcDot(col("__qv"), col("__codes")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(mismatches == 0)
  }

  test("encode keeps the [0, ksub) contract on NaN vectors (code-0 fallback)") {
    val spark2 = spark
    import spark2.implicits._
    val unit = unitVecs(Tables.read(spark, dir, "embeddings"))
    val pq = ProductQuantizer.fit(unit, "vec_id", "__uv", m = 8, ksub = 16)
    // a NaN component makes every codeword score NaN in its subspace —
    // the kernel must fall back to code 0 (the Column array_min pick for
    // an all-NaN struct array), never leak the internal -1 sentinel: a
    // -1 cell would silently drop the row from every IVF probe
    val nanVec = Seq.tabulate(64)(i => if (i == 3) Double.NaN else 0.5)
    val df = Seq((0L, nanVec)).toDF("vec_id", "__uv")
    val codes = df.select(pq.encode(col("__uv")).as("c"))
      .collect().head.getSeq[Int](0)
    assert(codes.length == 8 && codes.forall(j => j >= 0 && j < 16),
      s"NaN-subspace codes must stay in [0, ksub): $codes")
    assert(codes.head == 0, s"all-NaN subspace must pick code 0: $codes")
    // and the fallback matches the Column formulation's pick
    val parity = df.select(pq.encode(col("__uv")).as("n"),
      pq.columnEncode(col("__uv")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(parity == 0, "NaN fallback must be bit-parity with columnEncode")
  }

  test("dims mismatch between query and index raises a clear error") {
    val spark2 = spark
    import spark2.implicits._
    val emb = Tables.read(spark, dir, "embeddings")
    val idx = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val bad = Seq((0L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      idx.search(bad, "vec_id", "embedding", k = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("do not match index dims")))
  }

  test("fit rejects dims not divisible by m") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((0L, Seq.fill(10)(1.0))).toDF("vec_id", "__uv")
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.fit(df, "vec_id", "__uv", m = 3, ksub = 4)
    }
    assert(e.getMessage.contains("not divisible"))
  }
}
