package graft.functions

/** Serialized-sketch holder with CONTENT-based equality.
  *
  * A bare `Array[Byte]` field on a Catalyst expression case class gets
  * reference `equals`/`hashCode`, so `semanticEquals`/canonicalization
  * never recognizes two structurally identical probes as equal — plan-level
  * reuse and common-subexpression elimination silently miss, and every
  * expression copy looks distinct. Wrapping the bytes restores value
  * semantics without copying the payload.
  */
final class SketchBytes(val bytes: Array[Byte]) extends Serializable {
  // Catalyst canonicalization / expression maps call hashCode & equals
  // repeatedly per plan; for a multi-MB Bloom payload an uncached
  // Arrays.hashCode is O(n) EVERY call. Cache the hash and use it (plus
  // eq/length) to short-circuit equals before any byte comparison.
  @transient private lazy val hash: Int = java.util.Arrays.hashCode(bytes)
  override def equals(o: Any): Boolean = o match {
    case s: SketchBytes =>
      (this eq s) || (bytes.length == s.bytes.length &&
        hash == s.hash && java.util.Arrays.equals(bytes, s.bytes))
    case _ => false
  }
  override def hashCode(): Int = hash
  override def toString: String = s"SketchBytes(${bytes.length} bytes)"
}
