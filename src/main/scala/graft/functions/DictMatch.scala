package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975, "Efficient
  * string matching: an aid to bibliographic search") over UTF-8 BYTES —
  * the dictionary-scale matching stage a training-data pipeline needs
  * where a regex alternation dies: benchmark-phrase blocklists, PII
  * dictionaries and compliance term lists run to 10³–10⁶ patterns, and
  * `text rlike (p1|p2|…|pN)` is O(text × N) with a compiled-pattern blow
  * up, while the automaton matches ALL patterns in ONE pass per byte —
  * O(text + matches), independent of dictionary size.
  *
  * Byte-domain matching is exact for any UTF-8 input: a pattern can
  * never match starting inside a multi-byte character, because every
  * UTF-8 continuation byte has the high bit set and so differs from
  * every byte of a pattern's first character at a char boundary.
  * Overlapping and nested occurrences all count (the exit-link chain),
  * the textbook semantics.
  *
  * Layout: per-node sorted edge arrays (binary-searched) keep memory
  * O(total pattern bytes) — a dense 256-way goto table would cost
  * 1 KB/node and rule out million-pattern dictionaries; a production
  * double-array trie is a drop-in behind this same interface. The
  * automaton is immutable, thread-safe and Serializable: it ships to
  * executors INSIDE the expression (built once on the driver, a
  * reference object in generated code — the broadcast-small-dimension
  * discipline applied to an automaton instead of a join side).
  */
final class AhoCorasick private (
    edgeKeys: Array[Array[Byte]], // per node, sorted edge labels
    edgeTo: Array[Array[Int]], // per node, edge targets (parallel)
    fail: Array[Int],
    exit: Array[Int], // nearest suffix node ending a phrase, -1
    phraseAt: Array[Int], // phrase id ending EXACTLY here, -1
    phraseLen: Array[Int], // UTF-8 byte length per phrase id
    val numPhrases: Int) extends Serializable {

  private def step(stateIn: Int, b: Byte): Int = {
    var state = stateIn
    while (true) {
      val keys = edgeKeys(state)
      var lo = 0
      var hi = keys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys(mid)
        if (k == b) return edgeTo(state)(mid)
        else if (k < b) lo = mid + 1
        else hi = mid - 1
      }
      if (state == 0) return 0
      state = fail(state)
    }
    0 // unreachable
  }

  /** Per-phrase OVERLAPPING occurrence counts over the text's UTF-8
    * bytes, one automaton pass — the method the generated code calls.
    */
  def countAll(text: UTF8String): Array[Long] = {
    val counts = new Array[Long](numPhrases)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    var state = 0
    var i = 0
    while (i < n) {
      state = step(state, Platform.getByte(base, off + i))
      var e = if (phraseAt(state) >= 0) state else exit(state)
      while (e >= 0) {
        counts(phraseAt(e)) += 1L
        e = exit(e)
      }
      i += 1
    }
    counts
  }

  /** LEFTMOST-LONGEST non-overlapping replacement — the redaction
    * semantics (flex/lex and RE2's alternation rule): scan left to
    * right; at the earliest position where any phrase starts, replace
    * the LONGEST phrase starting there, then continue AFTER it (matches
    * beginning inside a replaced span are consumed — `{ab, bcd}` on
    * `abcd` yields `<r>cd`, never `a<r>`). One automaton pass collects
    * every occurrence endpoint; the greedy resolution is a sort over
    * the match list — O(text + matches·log matches), independent of
    * dictionary size. Byte-domain, multi-byte safe (class header).
    */
  def replaceLeftmostLongest(text: UTF8String,
      replacement: Array[Byte]): UTF8String = {
    val bytes = text.getBytes
    val n = bytes.length
    // packed matches: start in the high 32 bits, (MaxValue − len) low —
    // a plain long sort is then (start asc, len desc), the greedy order.
    // ArrayBuilder.ofLong keeps the hot path primitive (countAll's
    // discipline): an ArrayBuffer[Long] would box every occurrence.
    val ms = new scala.collection.mutable.ArrayBuilder.ofLong
    var state = 0
    var i = 0
    while (i < n) {
      state = step(state, bytes(i))
      var e = if (phraseAt(state) >= 0) state else exit(state)
      while (e >= 0) {
        val l = phraseLen(phraseAt(e))
        ms += ((i + 1 - l).toLong << 32) | (Int.MaxValue - l).toLong
        e = exit(e)
      }
      i += 1
    }
    val sorted = ms.result()
    if (sorted.isEmpty) return UTF8String.fromBytes(bytes)
    java.util.Arrays.sort(sorted)
    val out = new java.io.ByteArrayOutputStream(n)
    var cursor = 0
    var k = 0
    while (k < sorted.length) {
      val s = (sorted(k) >>> 32).toInt
      val l = Int.MaxValue - (sorted(k) & 0xffffffffL).toInt
      if (s >= cursor) {
        out.write(bytes, cursor, s - cursor)
        out.write(replacement, 0, replacement.length)
        cursor = s + l
      }
      k += 1
    }
    out.write(bytes, cursor, n - cursor)
    UTF8String.fromBytes(out.toByteArray)
  }
}

object AhoCorasick {

  /** Build from distinct non-empty phrases; phrase id = position in the
    * input list (the contract every consumer and oracle shares).
    */
  def build(phrases: Seq[String]): AhoCorasick = {
    require(phrases.nonEmpty, "dictionary must be non-empty")
    require(phrases.forall(_.nonEmpty), "phrases must be non-empty")
    require(phrases.distinct.length == phrases.length,
      "phrases must be distinct (ids are positional)")
    // trie with temporary per-node hash edges
    val edges = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val phraseAtB = mutable.ArrayBuffer(-1)
    for ((p, pid) <- phrases.zipWithIndex) {
      var node = 0
      for (b <- p.getBytes("UTF-8")) {
        val key = (b & 0xffL)
        node = edges(node).getOrElse(key, {
          edges += mutable.LongMap.empty[Int]
          phraseAtB += -1
          val fresh = edges.length - 1
          edges(node).update(key, fresh)
          fresh
        })
      }
      phraseAtB(node) = pid
    }
    val n = edges.length
    val fail = new Array[Int](n)
    val exit = Array.fill(n)(-1)
    // BFS fail links (root's children fail to root)
    val queue = mutable.Queue.empty[Int]
    for ((_, child) <- edges(0)) { fail(child) = 0; queue += child }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      exit(u) =
        if (phraseAtB(fail(u)) >= 0) fail(u) else exit(fail(u))
      for ((keyL, v) <- edges(u)) {
        // fail(v): deepest proper suffix with this edge
        var f = fail(u)
        var resolved = -1
        while (resolved < 0) {
          edges(f).get(keyL) match {
            case Some(t) => resolved = t
            case None if f == 0 => resolved = 0
            case None => f = fail(f)
          }
        }
        fail(v) = resolved
        queue += v
      }
    }
    // freeze per-node edges sorted by SIGNED byte — the order the
    // binary search in step() compares in
    val keysArr = new Array[Array[Byte]](n)
    val toArr = new Array[Array[Int]](n)
    for (i <- 0 until n) {
      val sorted = edges(i).toArray
        .map { case (k, t) => ((k & 0xff).toByte, t) }
        .sortBy(_._1)
      keysArr(i) = sorted.map(_._1)
      toArr(i) = sorted.map(_._2)
    }
    new AhoCorasick(keysArr, toArr, fail, exit, phraseAtB.toArray,
      phrases.map(_.getBytes("UTF-8").length).toArray, phrases.length)
  }
}

/** Native Catalyst expression: per-phrase overlapping match counts of a
  * fixed dictionary against a text column — `array<long>` of length
  * |phrases|, index = positional phrase id. The automaton builds ONCE
  * per task deserialization (@transient lazy) and rides into generated
  * code as a reference object, so the match loop stays inside the
  * whole-stage-codegen span: the scan stage does the entire dictionary
  * sweep, zero shuffles, at any corpus size.
  */
case class DictMatchCounts(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType || phrases.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"dict_match_counts expects (string, non-empty dictionary), got " +
          s"${child.dataType.simpleString}, ${phrases.length} phrases")
    // mirror AhoCorasick.build's requires HERE so a malformed dictionary
    // fails at ANALYSIS time with a typed error — the automaton is
    // @transient lazy and would otherwise first force (and throw) at
    // codegen or executor eval, after the plan was accepted
    else if (phrases.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "dict_match_counts: dictionary phrases must be non-empty strings")
    else if (phrases.distinct.length != phrases.length)
      TypeCheckResult.TypeCheckFailure(
        "dict_match_counts: dictionary phrases must be distinct " +
          "(match-count ids are positional)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dict_match_counts"

  @transient private lazy val ac = AhoCorasick.build(phrases)

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ac.countAll(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("dictAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray($acRef.countAll($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: dictionary-scale REDACTION — rewrite the
  * text with every leftmost-longest non-overlapping dictionary
  * occurrence replaced by `replacement`
  * ([[AhoCorasick.replaceLeftmostLongest]]). This is q56's `redactPii`
  * at blocklist scale: where two regexes suffice for emails/phones, a
  * compliance term list or benchmark-contamination blocklist runs to
  * 10³–10⁶ phrases and a regex alternation is O(text × N) — the
  * automaton rewrites in one pass per byte, scan-stage, zero shuffles.
  * Same codegen shape as [[DictMatchCounts]]: the automaton and the
  * replacement bytes ride into generated code as reference objects.
  */
case class DictReplace(child: Expression, phrases: Seq[String],
    replacement: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType || phrases.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"dict_replace expects (string, non-empty dictionary, " +
          s"replacement), got ${child.dataType.simpleString}, " +
          s"${phrases.length} phrases")
    else if (phrases.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "dict_replace: dictionary phrases must be non-empty strings")
    else if (phrases.distinct.length != phrases.length)
      TypeCheckResult.TypeCheckFailure(
        "dict_replace: dictionary phrases must be distinct")
    else if (replacement == null)
      TypeCheckResult.TypeCheckFailure(
        "dict_replace: replacement must be a non-null string literal " +
          "(empty = deletion)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "dict_replace"

  @transient private lazy val ac = AhoCorasick.build(phrases)
  @transient private lazy val replBytes = replacement.getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    ac.replaceLeftmostLongest(input.asInstanceOf[UTF8String], replBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("dictAc", ac,
      classOf[AhoCorasick].getName)
    val replRef = ctx.addReferenceObj("dictRepl", replBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"$acRef.replaceLeftmostLongest($c, $replRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
