package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.{CorpusClean, Sampling}

/** Deterministic-sampling and corpus-cleaning operators. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids = (1L to 1000L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")

  test("bernoulli sample is deterministic and roughly sized") {
    val key = Sampling.modKey($"id")
    val a = Sampling.bernoulli(ids, key, 0.2).collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(ids, key, 0.2).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size > 120 && a.size < 280, s"20% of 1000 ids, got ${a.size}")
  }

  test("bernoulli samples are nested: fraction 0.1 ⊆ fraction 0.3") {
    val key = Sampling.modKey($"id")
    val small = Sampling.bernoulli(ids, key, 0.1).collect().map(_.getLong(0)).toSet
    val large = Sampling.bernoulli(ids, key, 0.3).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("bernoulli edge fractions keep none / all") {
    val key = Sampling.modKey($"id")
    assert(Sampling.bernoulli(ids, key, 0.0).count() == 0)
    assert(Sampling.bernoulli(ids, key, 1.0).count() == 1000)
    intercept[IllegalArgumentException](Sampling.bernoulli(ids, key, 1.5))
  }

  test("stratifiedTopK takes exactly k per stratum, all when short") {
    val got = Sampling.stratifiedTopK(ids, Seq("grp"), 10,
      Sampling.modKey($"id"), Seq($"id"))
    val perGrp = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGrp.values.forall(_ == 10) && perGrp.size == 4)
    // stratum smaller than k keeps everything
    val small = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(Sampling.stratifiedTopK(small, Seq("grp"), 10,
      Sampling.modKey($"id"), Seq($"id")).count() == 2)
  }

  test("splitLabel covers every row with the expected proportions") {
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = ids.withColumn("s",
      Sampling.splitLabel(Sampling.modKey($"id", seed = 7L), weights))
    val counts = labeled.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts.keySet == Set("train", "val", "test"))
    intercept[IllegalArgumentException](
      Sampling.splitLabel($"id", Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("hashKey stays in [0, Modulus) including negative xxhash values") {
    val got = ids.select(Sampling.hashKey($"id", $"grp").as("k"))
      .agg(min("k"), max("k")).head
    assert(got.getLong(0) >= 0 && got.getLong(1) < Sampling.Modulus)
  }

  test("mixtureSample applies per-source rates and stays nested-monotone") {
    val docs = (1L to 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val key = Sampling.modKey($"id", seed = 7L)
    val rates = Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.3)
    val kept = Sampling.mixtureSample(docs, "source", rates, 0.6, key)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") == 250)            // rate 1.0 keeps everything
    assert(!kept.contains("src1"))         // rate 0.0 keeps nothing
    assert(kept("src2") > 40 && kept("src2") < 110)  // ~30% of 250
    assert(kept("src3") > 110 && kept("src3") < 190) // default ~60% of 250
    // raising src2's rate only ADDS rows (nested keys, no churn)
    val low = Sampling.mixtureSample(docs, "source", rates, 0.6, key)
      .filter($"source" === "src2").collect().map(_.getLong(0)).toSet
    val high = Sampling.mixtureSample(docs, "source",
      rates.updated("src2", 0.8), 0.6, key)
      .filter($"source" === "src2").collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
  }

  test("prepareTrainingCorpus: gate → dedup → decontaminate → chunk composes") {
    // 30 stopword-bearing tokens pass the default quality gate (20..90)
    def body(tag: String) = (1 to 15).map(i => s"the w$tag$i").mkString(" ")
    val run8 = "the q1 the q2 the q3 the q4" // an 8-token run for the bench
    val training = Seq(
      (1L, body("a")),                  // clean survivor
      (2L, body("a")),                  // exact dup of 1 → deduped
      (3L, s"$run8 ${body("b")}"),      // contaminated (shares the 8-gram)
      (4L, "too short"),                // fails the quality gate
      (5L, body("c")))                  // clean survivor
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$run8 tail words")).toDF("doc_id", "text")
    val chunks = CorpusClean.prepareTrainingCorpus(training, bench,
      "doc_id", "text", CorpusClean.Config(), chunkSize = 16, stride = 16)
    val byDoc = chunks.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only docs 1 and 5 survive; 30 tokens at 16/16 → 2 chunks each
    assert(byDoc == Map(1L -> 2L, 5L -> 2L), s"got $byDoc")
  }

  test("corpus clean: quality gate + exact dedup keeps the canonical doc") {
    val docs = Seq(
      (1L, "en", ("the cat sat on the mat and looked for a value " * 3).trim),
      (2L, "en", ("the cat sat on the mat and looked for a value " * 3).trim), // exact dup
      (3L, "en", "too short"),
      (4L, "de", ("word " * 50).trim), // no stopwords → fails quality
      (5L, "fr", ("of and to in is on for with the a an value table " * 3).trim))
      .toDF("doc_id", "lang", "text")
    val cfg = CorpusClean.Config(minTokens = 20, maxTokens = 90,
      maxPunctRatio = 0.3, minStopwordRatio = 0.02)
    val kept = CorpusClean.clean(docs, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L))
  }

  test("q94's leakage guarantee holds end-to-end: near-dup pairs never " +
      "straddle splits, and totals reconcile with q41's per-doc split") {
    import org.apache.spark.sql.functions._
    import graft.queries.NorthStarQueries
    import graft.northstar.{Dedup, Sampling}
    val spark2 = TestSpark.spark
    val dir = "/root/testdata/sf0.01"
    val pairs = NorthStarQueries.q24MinhashNearDups(spark2, dir)
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("comp"))
    val assigned = graft.io.Tables.read(spark2, dir, "documents")
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cl", coalesce(col("comp"), col("doc_id")))
      .withColumn("split", Sampling.splitLabel(
        Sampling.modKey(col("cl"), seed = 7L),
        NorthStarQueries.SplitWeights))
      .select(col("doc_id"), col("split"))
    // every near-dup pair lands in ONE split — the guarantee per-doc
    // hashing can't give
    val straddling = pairs
      .join(assigned.select(col("doc_id").as("id_a"),
        col("split").as("sa")), "id_a")
      .join(assigned.select(col("doc_id").as("id_b"),
        col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling === 0L)
    assert(pairs.count() > 0, "vacuous without near-dup pairs")
    // and the q94 rollup's doc totals cover the whole corpus exactly
    val rolled = NorthStarQueries.q94LeakageFreeSplit(spark2, dir)
      .agg(sum("docs")).collect()(0).getLong(0)
    assert(rolled ===
      graft.io.Tables.read(spark2, dir, "documents").count())
  }
}
