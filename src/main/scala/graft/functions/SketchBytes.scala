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
  override def equals(o: Any): Boolean = o match {
    case s: SketchBytes => java.util.Arrays.equals(bytes, s.bytes)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
  override def toString: String = s"SketchBytes(${bytes.length} bytes)"
}
