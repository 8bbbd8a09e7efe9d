package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.{Dedup, EventOps, Similarity, TextAnalysis}

/** Known-answer tests for the LLM-pipeline operators. */
class NorthStarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "completely different words entirely unrelated here"),
    (4L, "the quick brown fox jumps over the lazy dog"))  // exact dup of 1
    .toDF("doc_id", "text")

  test("funnel counts only strictly-ordered stage sequences, lag summed exactly") {
    // ns timestamps (µs multiples, per the events contract)
    val ev = Seq(
      (1L, "view", 10000L), (1L, "click", 20000L), (1L, "purchase", 30000L),
      (2L, "click", 5000L), (2L, "view", 10000L), (2L, "purchase", 50000L),
      (3L, "click", 10000L), (3L, "purchase", 20000L), // no view at all
      (4L, "view", 10000L))
      .toDF("user_id", "event_type", "ts")
    val res = EventOps.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    // u2's click precedes their first view → not stage 2; with no
    // qualifying click their purchase can't count either. u3 never viewed.
    TestSpark.assertSameRows(res, Seq(
      Seq("1_view", 3L, 0L),
      Seq("2_click", 1L, 10L),      // (20000-10000) ns = 10 µs
      Seq("3_purchase", 1L, 10L)))
  }

  test("retention cohorts bucket users by first-event week, year-aware") {
    def ns(daysFromJan1_2024: Int): Long =
      (1704067200L + daysFromJan1_2024 * 86400L) * 1000000000L
    val ev = Seq(
      (1L, ns(0)), (1L, ns(7)),    // first 2024-01-01 (Mon), active 2 weeks
      (2L, ns(7)), (2L, ns(8)),    // first 2024-01-08, active that week
      (3L, ns(0)), (3L, ns(364)))  // active again 2024-12-30 — the ISO week
      .toDF("user_id", "ts")       //   numbered 1 of 2025; a bare week-of-
                                   //   year bucket would alias it to Jan
    val d = java.sql.Date.valueOf(_: String)
    TestSpark.assertSameRows(
      EventOps.retentionCohorts(ev, "user_id", "ts"), Seq(
        Seq(d("2024-01-01"), d("2024-01-01"), 2L),
        Seq(d("2024-01-01"), d("2024-01-08"), 1L),
        Seq(d("2024-01-08"), d("2024-01-08"), 1L),
        Seq(d("2024-01-01"), d("2024-12-30"), 1L)))
  }

  test("tokenCount / quality signals") {
    val got = docs.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.stopwordRatio($"text").as("sr"))
      .orderBy("doc_id").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(9, 9, 6, 9))
    assert(got(0).getDouble(2) == 2.0 / 9) // "the" twice
    assert(got(2).getDouble(2) == 0.0)
  }

  test("langId is deterministic and total") {
    val got = docs.select(TextAnalysis.langId($"text")).collect().map(_.getString(0))
    assert(got.forall(TextAnalysis.LangProfiles.map(_._1).contains))
    // "the" hits only the en profile → doc 1 must be en
    assert(got(0) == "en")
  }

  test("exact fingerprint collapses exact duplicates only") {
    val fp = docs.groupBy(TextAnalysis.fingerprint($"text").as("f"))
      .agg(min("doc_id").as("c"), count(lit(1)).as("n"))
    val rows = fp.collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == 2)   // docs 1+4 collapse
    assert(rows(2L) == 1)
    assert(rows(3L) == 1)
  }

  test("minhash LSH finds the near-dup and exact-dup pairs") {
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      numPerm = 64, bands = 16, shingleSize = 3, jaccardThreshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))  // exact dup, jaccard 1.0
    assert(pairs.contains((1L, 2L)))  // near dup (6/8 shared trigrams = 0.6)
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard exact pairs match expected values") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((1L, 4L)) == 1.0)
    assert(math.abs(got((1L, 2L)) - 6.0 / 8.0) < 1e-9)
  }

  test("minhash rejects band counts that do not divide the permutations") {
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDuplicates(docs, "doc_id", "text", numPerm = 64, bands = 100)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDuplicates(docs, "doc_id", "text", numPerm = 64, bands = 24)
    }
  }

  test("ngram jaccard stop-shingle cap: lenient cap keeps results identical") {
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3,
      maxDocFrequency = Some(10))
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
    assert(TestSpark.rows(capped) == TestSpark.rows(uncapped))
  }

  test("df-FRACTION cap scales with the corpus where the absolute cap " +
      "saturates: a grown corpus re-finds the planted near-dup pair") {
    import spark.implicits._
    // 30 docs share the core trigram run ("alpha beta gamma delta") —
    // df 30 on the shared shingles — and overlap on NOTHING else, so
    // every true pair's overlap consists entirely of high-df shingles
    // (the corpus-decade repeated-content shape)
    val grown = ((1 to 30).map { i =>
      (i.toLong, s"alpha beta gamma delta x$i")
    }).toDF("doc_id", "text")
    // an absolute cap pinned for a small corpus (df ≤ 8) suppresses
    // EVERY shared shingle once the corpus outgrows it — zero pairs
    val saturated = Dedup.ngramJaccardPairs(grown, "doc_id", "text", 3,
      0.3, maxDocFrequency = Some(8))
    assert(saturated.count() === 0L, "absolute cap must saturate")
    // the SAME selectivity expressed as a fraction keeps pruning power
    // proportional: cap = ceil(1.0 × 30) = 30 here admits the shared
    // run and the planted pair resurfaces with its exact jaccard
    val fraction = Dedup.ngramJaccardPairs(grown, "doc_id", "text", 3,
      0.3, maxDocFrequencyFraction = Some(1.0))
    val pairs = fraction.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)),
      s"fraction mode must re-find the planted pair, got ${pairs.keySet}")
    // both modes at once is a caller error, not a silent precedence
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(grown, "doc_id", "text", 3, 0.3,
        maxDocFrequency = Some(8), maxDocFrequencyFraction = Some(0.5))
    }
    // degenerate fractions refuse loudly
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(grown, "doc_id", "text", 3, 0.3,
        maxDocFrequencyFraction = Some(0.0)).count()
    }
  }

  test("duplicate-span removal keeps first occurrence, rebuilds docs in order") {
    // spans of 2 tokens: doc 1 = [ab, cd], doc 2 = [ab, ef] (ab repeats),
    // doc 3 = [ab, cd] (everything repeats), doc 4 is span-less
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b c d"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.dropDuplicateSpans(d, "doc_id", "text", spanTokens = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq(
      (1L, "a b c d", 0),   // first occurrence of both spans
      (2L, "e f", 1),       // "a b" already seen in doc 1
      (3L, "", 2)))         // full duplicate → everything dropped
    // doc 4 has no spans → excluded by construction
  }

  test("duplicate-span removal keeps the short tail span and dedups it too") {
    val d = Seq((1L, "a b c"), (2L, "x y c")).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateSpans(d, "doc_id", "text", spanTokens = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // tail spans are the single token "c": doc 1 keeps it, doc 2 drops it
    assert(got.toSeq == Seq((1L, "a b c", 0), (2L, "x y", 1)))
  }

  test("bigram fluency: exact rational scores on a hand-computed corpus") {
    // corpus: "a b a b" + "a b" → bigrams ab:3 (2 from doc1's "a b a b"?
    // no — doc1 bigrams: (a,b),(b,a),(a,b) → ab:2, ba:1; doc2: ab:1.
    // c(ab)=3, c(ba)=1, c_w1(a·)=3, c_w1(b·)=1, V=2 distinct tokens.
    val d = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramFluency(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // term(ab) = floor((3+1)e9 / (3+2)) = 8e8 → p=0.8
    // term(ba) = floor((1+1)e9 / (1+2)) = 666666666 → p≈0.666666666
    // doc1: (0.8 + 0.666666666 + 0.8)/3 = 0.755556 (round 6)
    // doc2: 0.8
    assert(got.length == 2)
    assert(got(0) == ((1L, 3L, 0.755556)))
    assert(got(1) == ((2L, 1L, 0.8)))
  }

  test("simhashSignatures (DataFrame) equals simhash64 (Column) exactly") {
    val viaDf = Dedup.simhashSignatures(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val viaCol = docs.select($"doc_id", Dedup.simhash64($"text").as("s"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(viaDf == viaCol)
  }

  test("PII redaction replaces emails/phones with typed tags and counts them") {
    val df = Seq(
      (1L, "mail me at bob.smith+x@corp.example.org or call 555-123-4567 now"),
      (2L, "two mails a@b.co c@d.io and 555-000-1111 555-222-3333"),
      (3L, "no pii here at all"))
      .toDF("id", "s")
      .select($"id", TextAnalysis.redactPii($"s").as("r"),
        TextAnalysis.emailCount($"s").as("e"), TextAnalysis.phoneCount($"s").as("p"))
      .orderBy("id").collect()
    assert(df(0).getString(1) == "mail me at <EMAIL> or call <PHONE> now")
    assert((df(0).getInt(2), df(0).getInt(3)) == (1, 1))
    assert((df(1).getInt(2), df(1).getInt(3)) == (2, 2))
    assert(df(2).getString(1) == "no pii here at all")
    assert((df(2).getInt(2), df(2).getInt(3)) == (0, 0))
  }

  test("wordNGrams emits verbatim n-grams and an EMPTY array for short docs") {
    val got = Seq((1L, "a b c d"), (2L, "a b"), (3L, ""), (4L, "x y z"))
      .toDF("id", "s")
      .select($"id",
        TextAnalysis.wordNGrams(TextAnalysis.tokens($"s"), 3).as("g"))
      .orderBy("id").collect()
      .map(_.getSeq[String](1).toList)
    assert(got(0) == List("a b c", "b c d"))
    assert(got(1) == Nil) // shorter than n: no phantom grams from sequence(1,0)
    assert(got(2) == Nil)
    assert(got(3) == List("x y z"))
  }

  test("chunk windows overlap by chunkSize-stride and the tail is short") {
    val got = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, ""))
      .toDF("id", "s")
      .select($"id", explode_outer(
        TextAnalysis.chunk(TextAnalysis.tokens($"s"), chunkSize = 4, stride = 3))
        .as("c"))
      .orderBy($"id", $"c.chunk_start").collect()
    val chunks = got.filter(!_.isNullAt(1)).map { r =>
      val c = r.getStruct(1); (c.getInt(0), c.getInt(1), c.getString(2))
    }
    assert(chunks.toSeq == Seq(
      (1, 4, "t1 t2 t3 t4"), (4, 4, "t4 t5 t6 t7"),
      (7, 4, "t7 t8 t9 t10"), (10, 1, "t10")))
    // empty doc → no chunks (explode_outer kept the row as NULL)
    assert(got.count(_.isNullAt(1)) == 1)
  }

  test("decontamination flags exactly the docs sharing an 8-gram with the benchmark") {
    val run = "one two three four five six seven eight"
    val training = Seq(
      (1L, s"prefix words $run trailing text"),     // contains the bench 8-gram
      (2L, "totally unrelated content with many distinct words here"),
      (3L, s"$run"),                                // the 8-gram exactly
      (4L, "one two three four five six seven"))    // only a 7-gram prefix
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$run and more")).toDF("doc_id", "text")
    val flagged = graft.northstar.CorpusClean
      .contaminatedIds(training, bench, "doc_id", "text", n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 3L))
  }

  test("collisionStats: native pass ≡ HOF fold ≡ explode+groupBy") {
    val d = Seq(
      (1L, "a a a b b c"),          // counts 3,2,1 → s2=14, d=3, n=6
      (2L, "same same same same"),  // 4² = 16, d=1
      (3L, "all distinct words here now"),
      (4L, "  "),                   // whitespace-only → (0, 0)
      (5L, "z"))
      .toDF("doc_id", "text")
    def stats(c: org.apache.spark.sql.Column) =
      d.select($"doc_id", c.as("f"))
        .collect().map(r => r.getLong(0) ->
          (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toMap
    val got = stats(TextAnalysis.collisionStats($"text"))
    assert(got(1L) == ((14L, 3L)))
    assert(got(2L) == ((16L, 1L)))
    assert(got(3L) == ((5L, 5L)))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((1L, 1L)))
    // the interpreted HOF reference form must agree bit-for-bit
    assert(stats(TextAnalysis.collisionStatsHof($"text")) == got)
    // and so must the shuffle formulation on the same rows
    val exploded = d
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c" * $"c").as("s2"), count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    exploded.foreach { case (id, v) => assert(got(id) == v, s"doc $id") }
    // corpus-scale parity: native vs HOF across every sf0.001 document
    val docs = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val native = docs.select($"doc_id", TextAnalysis.collisionStats($"text").as("f"))
    val hof = docs.select($"doc_id", TextAnalysis.collisionStatsHof($"text").as("f"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("bloom decontamination flags a superset of the exact ids, never misses") {
    val run = "one two three four five six seven eight"
    val training = Seq(
      (1L, s"prefix words $run trailing text"),
      (2L, "totally unrelated content with many distinct words here"),
      (3L, s"$run"),
      (4L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$run and more")).toDF("doc_id", "text")
    val exact = graft.northstar.CorpusClean
      .contaminatedIds(training, bench, "doc_id", "text", n = 8)
      .collect().map(_.getLong(0)).toSet
    val flagged = graft.northstar.CorpusClean
      .bloomContaminatedFlags(training, bench, "doc_id", "text", n = 8,
        expectedGrams = 1024, fpp = 0.001)
      .filter($"__contaminated")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged), s"false negatives: ${exact -- flagged}")
    // at fpp=0.001 over a handful of grams, expect zero false positives
    assert(flagged == exact, s"unexpected FPs at tiny scale: ${flagged -- exact}")
  }

  test("bloom decontamination at sf0.001 is a superset of exact with a bounded FP tail") {
    val docs = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val train = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
    val bench = docs.filter(pmod($"doc_id", lit(10)) === 0)
    val exact = graft.northstar.CorpusClean
      .contaminatedIds(train, bench, "doc_id", "text", n = 8)
      .collect().map(_.getLong(0)).toSet
    val flagged = graft.northstar.CorpusClean
      .bloomContaminatedFlags(train, bench, "doc_id", "text", n = 8,
        expectedGrams = 1L << 16, fpp = 0.001)
      .filter($"__contaminated")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged), s"false negatives: ${exact -- flagged}")
    val clean = train.count() - exact.size
    // ~90 grams/doc × fpp 0.001 ⇒ per-doc FP odds ≲ 9%; allow 3× slack
    assert(flagged.size - exact.size <= math.max(5L, clean * 3 / 10),
      s"FP tail too fat: ${flagged.size - exact.size} of $clean clean docs")
  }

  test("temperature mixture: weights normalize, targets respect the budget") {
    val rows = graft.queries.NorthStarQueries
      .q73TemperatureMixture(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length >= 2)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    assert(rows.map(_.getAs[Long]("target_tokens")).sum <= 50000L)
    rows.foreach { r =>
      val rate = r.getAs[Double]("keep_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      // flattening: every source's weight exceeds half its natural share
      val natural = r.getAs[Long]("n_tokens").toDouble /
        rows.map(_.getAs[Long]("n_tokens")).sum
      assert(r.getAs[Double]("weight") >= natural / 2 - 1e-9,
        s"source ${r.getAs[String]("source")} under-weighted")
    }
  }

  test("incremental near-dup against an index equals full-batch pairs touching the batch") {
    // index = docs {1,3}, incoming batch = {2,4}: the incremental result
    // must be exactly the full-batch pair set restricted to pairs with at
    // least one batch member — batch-vs-corpus AND batch-vs-batch
    val full = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      numPerm = 64, bands = 16, shingleSize = 3, jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batchIds = Set(2L, 4L)
    val want = full.filter { case ((a, b), _) =>
      batchIds.contains(a) || batchIds.contains(b) }
    val idx = Dedup.buildNearDupIndex(
      docs.filter(!$"doc_id".isin(batchIds.toSeq: _*)), "doc_id", "text")
    val got = Dedup.incrementalNearDuplicates(
      idx, docs.filter($"doc_id".isin(batchIds.toSeq: _*)), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == want, s"got=$got\nwant=$want")
    assert(want.nonEmpty) // the fixture must actually exercise both shapes
  }

  test("connectedComponents resolves transitive clusters, chains, and isolates") {
    // {1-2-3 via pairs (1,2),(2,3)}, {5,6}, long chain 10..15, pair (20,21)
    val chain = (10L to 14L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (5L, 6L), (20L, 21L)) ++ chain)
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(comps(_) == 1L))   // transitive via 2
    assert(Seq(5L, 6L).forall(comps(_) == 5L))
    assert((10L to 15L).forall(comps(_) == 10L))     // 6-node chain converges
    assert(comps(20L) == 20L && comps(21L) == 20L)
    val clusters = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 3L, 5L -> 2L, 10L -> 6L, 20L -> 2L))
    // diameter exhaustion escalates to star contraction instead of
    // failing or returning a partial clustering — same answer
    val escalated = Dedup.connectedComponents(pairs, maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(escalated == comps)
  }

  test("duplicateClusters survives a chain deeper than the min-label budget") {
    // diameter 30 exceeds connectedComponents' default 20-round budget;
    // the auto-escalation to large-star/small-star must make the caller
    // whole with no manual variant selection
    val chain = (100L until 130L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(100L -> 31L))
  }

  test("winnowing: guarantee, short-doc floor, and density bound") {
    val k = 4; val w = 4
    // docs 1 and 2 share a 12-char substring ("shared middle"-ish) —
    // length ≥ w+k-1 = 7, so the winnowing guarantee forces ≥1 common fp
    val wdocs = Seq(
      (1L, "aaaa shared middle part zzzz"),
      (2L, "qqqq shared middle part rrrr"),
      (3L, "totally unrelated body text"),
      (4L, "abc"),                       // 3 chars < k → no grams at all
      (5L, "abcde"))                     // 2 grams < w → single clipped window
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowedFingerprints(wdocs, "doc_id", "text", k, w)
    val byDoc = fps.select($"doc_id", $"fp").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(!byDoc.contains(4L))                         // too short: absent
    assert(byDoc(5L).size == 1)                         // floor: exactly 1 fp
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)            // winnowing guarantee
    assert((byDoc(1L) & byDoc(3L)).isEmpty)             // no spurious overlap
    // every fingerprint is the md5 of a real k-gram of its own doc
    val grams1 = "aaaa shared middle part zzzz".sliding(k).map { g =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toSet
    assert(byDoc(1L).subsetOf(grams1))
    // density ≈ 2/(w+1), never above 1 window per position
    val n1 = fps.filter($"doc_id" === 1L).count()
    assert(n1 == ("aaaa shared middle part zzzz".length - k + 1) - (w - 1))
  }

  test("BPE pre-tokenizer splits contractions, digit runs, and punct runs") {
    val pat = graft.queries.NorthStarQueries.BpePiecePattern
    val got = Seq(Tuple1("Customer#000000042's order, it'll ship!"))
      .toDF("s")
      .select(regexp_extract_all(lower($"s"), lit(pat), lit(0)).as("ps"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("customer", "#", "000000042", "'s", " order", ",",
      " it", "'ll", " ship", "!"))
  }

  test("simhashSignatures matches simhash64 on token-less and NULL docs") {
    val edge = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]),
      (4L, "real words here"))
      .toDF("doc_id", "text")
    val viaDf = Dedup.simhashSignatures(edge, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq
    val viaCol = edge.select($"doc_id", Dedup.simhash64($"text").as("s"))
      .orderBy("doc_id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq
    assert(viaDf == viaCol)
    // empty and whitespace-only docs share signature 0 → they can pair
    assert(viaDf(0).contains(0L) && viaDf(1).contains(0L) && viaDf(2).isEmpty)
    val pairs = Dedup.simhashNearDuplicates(edge, "doc_id", "text",
      bands = 4, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "identical token-less docs must pair with hamming 0")
  }

  test("simhash: identical docs have hamming 0, near-dups small") {
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text",
      bands = 4, maxHamming = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 4L)) == 0)
    assert(pairs.get((1L, 2L)).forall(_ <= 10))
  }

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L))
    assert(got(0).getDouble(2) > 0.99)       // 1~2 nearly parallel
    assert(got(1).getDouble(2) == 0.0)       // orthogonal
    assert(got(2).getDouble(2) == -1.0)      // opposite
  }

  test("simhash rejects degenerate band configurations") {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDuplicates(docs, "doc_id", "text", bands = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDuplicates(docs, "doc_id", "text", bands = 5)
    }
  }

  test("cosine LSH drops NULL-vector and NULL-element rows instead of crashing or collapsing") {
    val withNulls = Seq(
      (1L, Some(Seq(Option(1.0), Option(0.0), Option(0.0), Option(0.0)))),
      (2L, Some(Seq(Option(1.0), Option(0.0), Option(0.0), Option(0.0)))),
      (3L, Option.empty[Seq[Option[Double]]]),                          // NULL vector
      (4L, Some(Seq(Option(1.0), Option.empty[Double], Option(0.0), Option(0.0)))))  // NULL element
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDuplicates(withNulls, "vec_id", "embedding",
      threshold = 0.9, planes = 4, tables = 8, dims = 4).collect()
    // the parallel pair (1,2) is found; rows 3 and 4 are silently excluded
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("cosine LSH fails loudly on a dims mismatch instead of bucket-collapsing") {
    val bad = intercept[Exception] {
      Similarity.cosineNearDuplicates(vecs, "vec_id", "embedding",
        threshold = 0.9, planes = 4, tables = 2, dims = 8) // vectors are 4-dim
        .count()
    }
    assert(bad.getMessage.contains("lshBuckets") ||
      Option(bad.getCause).exists(_.getMessage.contains("lshBuckets")))
  }

  test("cosine LSH near-duplicates finds the parallel pair") {
    val pairs = Similarity.cosineNearDuplicates(vecs, "vec_id", "embedding",
      threshold = 0.9, planes = 4, tables = 8, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("cross-corpus near-dups equal the self-join pair set restricted " +
      "to cross pairs (fuzzy decontamination subset law)") {
    import org.apache.spark.sql.functions._
    import graft.northstar.Dedup
    val docs = graft.io.Tables.read(spark, "/root/testdata/sf0.001",
      "documents")
    val full = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
        numPerm = 64, bands = 16, shingleSize = 3, jaccardThreshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // self-join pairs carry id_a < id_b; orient them train-first
    val expected = full.flatMap { case (a, b, j) =>
      (a % 10 == 0, b % 10 == 0) match {
        case (false, true) => Some((a, b, j))
        case (true, false) => Some((b, a, j))
        case _ => None // within-train or within-bench: not a cross pair
      }
    }.toSet
    val got = Dedup.crossNearDuplicates(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text",
        numPerm = 64, bands = 16, shingleSize = 3, jaccardThreshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }
}
