package graft.io

import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualTo, GreaterThan, GreaterThanOrEqual,
  In, InSet, IsNull, LessThan, LessThanOrEqual, Literal, Or, StartsWith}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Catalyst-filter → [[ColumnBound]] translation behind
  * planner-automatic data skipping, and the survive laws of the bound
  * forms ([[ColumnBound.survives]]): conservative on everything it
  * cannot prove, sharp on what it can. Expressions are built RESOLVED
  * (AttributeReference + Literal) — the shape the scan's listFiles
  * actually receives. In-package for the private[io] surfaces.
  */
class StatsPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val id = AttributeReference("id", LongType)()
  private val s = AttributeReference("s", StringType)()
  private def b(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    StatsPruning.bounds(Seq(e))
  private def str(x: String) = Literal(UTF8String.fromString(x), StringType)

  test("translation: ranges (both operand orders), equality, conjuncts") {
    assert(b(GreaterThanOrEqual(id, Literal(5L))) ==
      Seq(ColumnBound("id", lower = Some(5L))))
    // literal-first flips the comparison direction
    assert(b(LessThanOrEqual(Literal(5L), id)) ==
      Seq(ColumnBound("id", lower = Some(5L))))
    assert(b(GreaterThan(Literal(5L), id)) ==
      Seq(ColumnBound("id", upper = Some(5L))))
    // strict > relaxes to >= — superset, never a filter
    assert(b(GreaterThan(id, Literal(5L))) ==
      Seq(ColumnBound("id", lower = Some(5L))))
    assert(b(EqualTo(id, Literal(7L))) ==
      Seq(ColumnBound("id", Some(7L), Some(7L))))
    assert(b(And(GreaterThanOrEqual(id, Literal(1L)),
        LessThanOrEqual(id, Literal(9L)))).toSet ==
      Set(ColumnBound("id", lower = Some(1L)),
        ColumnBound("id", upper = Some(9L))))
  }

  test("translation: IN/InSet are discrete, IS NULL requires nulls, " +
      "LIKE-prefix becomes a range, disjunctions translate to nothing") {
    assert(b(In(id, Seq(Literal(5L), Literal(7L)))) ==
      Seq(ColumnBound("id", anyOf = Some(Seq(5L, 7L)))))
    assert(b(InSet(id, Set(5L, 7L))).headOption.flatMap(_.anyOf)
      .map(_.toSet).contains(Set[Any](5L, 7L)))
    assert(b(IsNull(id)) == Seq(ColumnBound("id", requireNulls = true)))
    assert(b(StartsWith(s, str("ab"))) ==
      Seq(ColumnBound("s", lower = Some("ab"), upper = Some("ac"))))
    // a non-ASCII final char keeps only the sound lower bound
    assert(b(StartsWith(s, str("aé"))) ==
      Seq(ColumnBound("s", lower = Some("aé"))))
    // OR cannot be expressed as conjunctive bounds — nothing, not wrong
    assert(b(Or(EqualTo(id, Literal(1L)), EqualTo(id, Literal(2L)))).isEmpty)
    // a NULL literal compare can never match rows; proving emptiness is
    // the optimizer's job, not the pruner's
    assert(b(EqualTo(id, Literal(null, LongType))).isEmpty)
    // string literals arrive as UTF8String internals — translated to
    // the String bound domain
    assert(b(EqualTo(s, str("x"))) ==
      Seq(ColumnBound("s", Some("x"), Some("x"))))
  }

  test("survive laws: discrete membership, null form, absent stats") {
    def stats(min: String, max: String, nulls: Boolean) =
      Map("id" -> VersionLog.ColStat("long", min, max, nulls))
    val s = stats("10", "20", nulls = false)
    assert(ColumnBound.survives(s,
      Seq(ColumnBound("id", anyOf = Some(Seq(15L))))))
    assert(!ColumnBound.survives(s,
      Seq(ColumnBound("id", anyOf = Some(Seq(5L, 25L))))),
      "no member in [10,20] -> pruned (envelope would have kept it)")
    assert(!ColumnBound.survives(s,
      Seq(ColumnBound("id", requireNulls = true))),
      "IS NULL prunes a no-null file")
    assert(ColumnBound.survives(stats("10", "20", nulls = true),
      Seq(ColumnBound("id", requireNulls = true))))
    // absent stats always survive — skipping is an optimization
    assert(ColumnBound.survives(Map.empty,
      Seq(ColumnBound("id", Some(0L), Some(1L), Some(Seq(5L)), true))))
  }

  test("string compare is UTF-8 byte order (the parquet UTF8 stats " +
      "ordering), not UTF-16 code units") {
    // U+10000 (4-byte UTF-8, surrogate pair in UTF-16) vs U+E000:
    // UTF-8 byte order puts U+E000 < U+10000; UTF-16 compareTo reverses
    val supp = new String(Character.toChars(0x10000))
    val priv = ""
    assert(supp.compareTo(priv) < 0, "UTF-16 order (the trap)")
    val s = Map("s" -> VersionLog.ColStat("string", priv, priv, false))
    // filter s >= U+10000: the file's max (U+E000) is BELOW the lower
    // bound in UTF-8 order -> prune. UTF-16 compareTo would keep it —
    // harmless — but the mirror case (min read as too small) mis-prunes
    assert(!ColumnBound.survives(s,
      Seq(ColumnBound("s", lower = Some(supp)))))
    val s2 = Map("s" -> VersionLog.ColStat("string", supp, supp, false))
    assert(ColumnBound.survives(s2,
      Seq(ColumnBound("s", lower = Some(priv)))),
      "file holding U+10000 must survive a >= U+E000 filter")
  }

  test("disjunction tree: an OR prunes per branch; an unknowable " +
      "disjunct poisons exactly its OR, never a sibling conjunct") {
    import StatsPruning.{predicate, True}
    def stats(min: Long, max: Long) =
      Map("id" -> VersionLog.ColStat("long", min.toString, max.toString,
        hasNulls = false))
    // id = 5 OR id = 900: the flat-conjunction form translates to
    // nothing; the tree prunes any file covering NEITHER point
    val or = predicate(Seq(
      org.apache.spark.sql.catalyst.expressions.Or(
        EqualTo(id, Literal(5L)), EqualTo(id, Literal(900L)))))
    assert(or != True)
    assert(or.survives(stats(0, 10)), "covers 5")
    assert(or.survives(stats(850, 950)), "covers 900")
    assert(!or.survives(stats(100, 200)), "covers neither -> pruned")
    // one untranslatable disjunct (id = id) makes the OR unknowable…
    val poisoned = predicate(Seq(
      org.apache.spark.sql.catalyst.expressions.Or(
        EqualTo(id, Literal(5L)), EqualTo(id, id))))
    assert(poisoned == True)
    // …but a SIBLING conjunct still prunes: (unknowable-OR) AND id<=50
    val mixed = predicate(Seq(
      org.apache.spark.sql.catalyst.expressions.Or(
        EqualTo(id, Literal(5L)), EqualTo(id, id)),
      LessThanOrEqual(id, Literal(50L))))
    assert(mixed.survives(stats(0, 10)))
    assert(!mixed.survives(stats(100, 200)),
      "the conjunct's upper bound must still prune")
  }

  test("end-to-end: IS NULL and LIKE-prefix filters prune files via " +
      "the planner-automatic read") {
    import org.apache.spark.sql.GraftScanBridge.scannedFileCount
    val base = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val t = new ParquetTable(s"$base/t")
    // two files via two single-partition appends: one all-null batch,
    // one fully-populated batch with a disjoint tag prefix
    t.overwrite(Seq((1L, None: Option[String], "aa1"),
      (2L, None, "aa2")).toDF("id", "v", "tag").coalesce(1))
    t.appendVersion(Seq((3L, Some("x"), "zz1"),
      (4L, Some("y"), "zz2")).toDF("id", "v", "tag").coalesce(1))
    val nullRead = t.read(spark).filter(col("v").isNull)
    assert(nullRead.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(scannedFileCount(nullRead) == 1,
      "IS NULL must scan only the null-bearing file")
    val prefixRead = t.read(spark).filter(col("tag").startsWith("zz"))
    assert(prefixRead.collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    assert(scannedFileCount(prefixRead) == 1,
      "LIKE 'zz%' must scan only the zz-prefixed file")
  }

  test("IN-list sorted-bounds merge: binary-search survive equals the " +
      "brute-force scan on randomized lists and ranges, at every type") {
    val rnd = new scala.util.Random(20260816L)
    def brute(vs: Seq[Long], mn: Long, mx: Long): Boolean =
      vs.exists(v => v >= mn && v <= mx)
    (1 to 200).foreach { _ =>
      val vs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(200).toLong)
      val mn = rnd.nextInt(200).toLong
      val mx = mn + rnd.nextInt(40)
      val stats = Map("id" -> VersionLog.ColStat(
        "long", mn.toString, mx.toString, hasNulls = false))
      val b = ColumnBound("id", anyOf = Some(vs))
      assert(ColumnBound.survives(stats, Seq(b)) == brute(vs, mn, mx),
        s"long merge != scan for vs=$vs range=[$mn,$mx]")
    }
    // doubles and UTF-8-ordered strings take the same merged path
    val dStats = Map("x" -> VersionLog.ColStat("double", "1.5", "2.5", false))
    assert(ColumnBound.survives(dStats,
      Seq(ColumnBound("x", anyOf = Some(Seq(0.5, 2.0))))))
    assert(!ColumnBound.survives(dStats,
      Seq(ColumnBound("x", anyOf = Some(Seq(0.5, 3.0))))))
    val sStats = Map("s" -> VersionLog.ColStat("string", "bb", "cc", false))
    assert(ColumnBound.survives(sStats,
      Seq(ColumnBound("s", anyOf = Some(Seq("aa", "bz"))))))
    assert(!ColumnBound.survives(sStats,
      Seq(ColumnBound("s", anyOf = Some(Seq("aa", "dd"))))))
    // conservative degradations preserved: a list with an incomparable
    // member never prunes; an empty list prunes everything
    val lStats = Map("id" -> VersionLog.ColStat("long", "10", "20", false))
    assert(ColumnBound.survives(lStats,
      Seq(ColumnBound("id", anyOf = Some(Seq(500L, "not-a-long"))))))
    assert(!ColumnBound.survives(lStats,
      Seq(ColumnBound("id", anyOf = Some(Nil)))))
    // the scale shape the merge exists for: a million-value IN against
    // many files stays driver-cheap (one sort, then log-V per file)
    val big = ColumnBound("id",
      anyOf = Some((0 until 1000000).map(i => (i * 7L) % 999983L)))
    val t0 = System.nanoTime()
    val survivors = (0 until 256).count { f =>
      val lo = f * 4000L
      ColumnBound.survives(Map("id" -> VersionLog.ColStat(
        "long", lo.toString, (lo + 3999).toString, false)), Seq(big))
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // values are residues mod 999983, so ranges past that are PRUNED —
    // exactly the sharpness the per-value form exists for
    assert(survivors == 250,
      "the dense list intersects every range below the modulus and " +
        "none above it")
    assert(sec < 5.0,
      s"million-value IN over 256 files took $sec s — the sorted merge " +
        "must keep this driver-cheap")
  }
}
