package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.BpeLearn

/** BPE merge learning against the literature's known answers and the
  * algorithm's edge laws (Sennrich et al. 2016 §3.2's worked example
  * shape: weighted word vocabulary, greedy max-pair merges).
  */
class BpeSpec extends AnyFunSuite {

  test("learns the textbook merge sequence on a Sennrich-style vocabulary") {
    // pairs: (e,s)=9 (newest 6 + widest 3), (s,t)=9, (w,e)=8 (newest 6 +
    // lower 2), (l,o)=7, (o,w)=7 — ties break lexicographically, so
    // (e,s) beats (s,t) at rank 1, then (es,t)=9 merges at rank 2, then
    // (l,o) beats (o,w) at 7.
    val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val merges = BpeLearn.learnMerges(vocab, 4)
    assert(merges.map(m => (m.left, m.right, m.weight)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    assert(merges.map(_.token) === Seq("es", "est", "lo", "low"))
    assert(merges.map(_.rank) === Seq(1, 2, 3, 4))
  }

  test("repeated symbols: counted per overlapping occurrence, merged " +
      "greedily non-overlapping") {
    // "aaa" has two (a,a) occurrences (weight 1 each) but one merge
    // application: ["aa","a"], the subword-nmt behavior
    val merges = BpeLearn.learnMerges(Seq("aaa" -> 1L), 1)
    assert(merges.head.weight === 2L)
    assert(BpeLearn.mergePair(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    assert(BpeLearn.mergePair(Array("a", "a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "aa"))
  }

  test("stops early when every piece is fully merged") {
    val merges = BpeLearn.learnMerges(Seq("ab" -> 3L, "c" -> 9L), 10)
    assert(merges.map(_.token) === Seq("ab"))
  }

  test("single-character and empty vocabularies learn nothing") {
    assert(BpeLearn.learnMerges(Seq("a" -> 5L, "b" -> 2L), 8).isEmpty)
    assert(BpeLearn.learnMerges(Nil, 8).isEmpty)
  }

  test("deterministic total order: weight desc, then (left, right) asc") {
    // all pairs tie at weight 1 → lexicographically least pair first
    val merges = BpeLearn.learnMerges(Seq("zy" -> 1L, "ba" -> 1L), 1)
    assert((merges.head.left, merges.head.right) === ("b", "a"))
  }

  test("supplementary-plane characters stay whole symbols (code points, " +
      "not UTF-16 units)") {
    // an emoji is one symbol; String#map would have split it into two
    // lone surrogates and learned an unencodable merge
    val syms = BpeLearn.initialSymbols("a😀b")
    assert(syms.toSeq === Seq("a", "😀", "b"))
    val merges = BpeLearn.learnMerges(Seq("a😀" -> 2L), 1)
    assert(merges.head.left === "a")
    assert(merges.head.right === "😀")
    assert(merges.head.token === "a😀")
  }

  test("asciiFold folds only A-Z, in any JVM locale") {
    assert(BpeLearn.asciiFold("AbC 9!") === "abc 9!")
    // the Turkish-locale trap chars and non-ASCII uppercase pass through
    assert(BpeLearn.asciiFold("IİÉ") === "iİÉ")
  }

  test("applyMerges tokenizes with lowest-rank-first semantics: the " +
      "textbook 'lowest' → [low, est]") {
    val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val ranks = BpeLearn.learnMerges(vocab, 4)
      .map(m => ((m.left, m.right), m.rank)).toMap
    // es(1), est(2), lo(3), low(4): "lowest" merges e+s first, then
    // es+t, then l+o, then lo+w — never the (o,w) pair rank order forbids
    assert(BpeLearn.applyMerges("lowest", ranks).toSeq ===
      Seq("low", "est"))
    // unseen pieces fall through to finer symbols, fully or partially
    assert(BpeLearn.applyMerges("xyz", ranks).toSeq === Seq("x", "y", "z"))
    assert(BpeLearn.applyMerges("blest", ranks).toSeq ===
      Seq("b", "l", "est"))
    assert(BpeLearn.applyMerges("", ranks).toSeq === Seq())
  }

  test("merge weights are non-increasing over ranks (the BPE frequency " +
      "lemma) on randomized vocabularies") {
    // any pair created by a merge occurs only where (b, c) occurred
    // before it, so each round's max pair frequency can never exceed the
    // previous round's — a classic BPE invariant worth pinning across
    // random inputs, not one example
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val alphabet = "abcde"
      val vocab = (1 to (2 + rnd.nextInt(8))).map { _ =>
        val len = 1 + rnd.nextInt(7)
        val piece = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        piece -> (1L + rnd.nextInt(9))
      }.groupMapReduce(_._1)(_._2)(_ + _).toSeq
      val merges = BpeLearn.learnMerges(vocab, 12)
      merges.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.weight >= b.weight,
            s"rank ${a.rank} weight ${a.weight} < rank ${b.rank} ${b.weight} on $vocab")
        case _ =>
      }
      // and the chain invariant holds for every random input too
      val seen = scala.collection.mutable.Set.empty[String]
      merges.foreach { m =>
        assert(m.left.length == 1 || seen.contains(m.left))
        assert(m.right.length == 1 || seen.contains(m.right))
        seen += m.token
      }
    }
  }

  test("q88 runs end-to-end: full merge budget on the sf0.001 corpus, " +
      "deterministic across invocations") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val run1 = SparkEntry.queries("q88_bpe_learn")(spark, dir).collect()
    val run2 = SparkEntry.queries("q88_bpe_learn")(spark, dir).collect()
    assert(run1.length === graft.queries.NorthStarQueries.BpeNumMerges)
    assert(run1.map(_.toSeq).toSeq === run2.map(_.toSeq).toSeq)
    // merges must chain: every non-initial token's left side is a
    // character or a previously learned token
    val seen = scala.collection.mutable.Set.empty[String]
    run1.sortBy(_.getAs[Int]("rank")).foreach { r =>
      val (l, rt) = (r.getAs[String]("left"), r.getAs[String]("right"))
      assert(l.length == 1 || seen.contains(l), s"unchained left $l")
      assert(rt.length == 1 || seen.contains(rt), s"unchained right $rt")
      seen += l + rt
    }
  }
}
