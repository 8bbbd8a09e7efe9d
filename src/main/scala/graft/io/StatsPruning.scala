package graft.io

import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, InSet, IsNull, LessThan, LessThanOrEqual,
  Literal, StartsWith}
import org.apache.spark.sql.types.{
  ByteType, DateType, DoubleType, FloatType, IntegerType, LongType,
  ShortType, StringType, TimestampNTZType, TimestampType}

/** Conversion from Catalyst's pushed-down data filters to the commit
  * log's [[ColumnBound]]s — the seam that makes data skipping
  * PLANNER-AUTOMATIC: `StatsPrunedFileIndex` hands the filters Catalyst
  * pushed into the scan to [[bounds]] at listing time, and any file the
  * commit-metadata stats prove disjoint never becomes a split.
  *
  * Deliberately conservative: only shapes whose bound semantics are a
  * strict SUPERSET of the filter survive the translation —
  * `attr (=|>|>=|<|<=) literal`, `literal (op) attr`, `attr IN (...)`,
  * and conjunctions thereof. A strict `>` relaxes to `>=` (the file
  * holding only the boundary value survives, its rows then drop in the
  * real filter), disjunctions and casts translate to nothing, and
  * literal types beyond long/double/string comparability translate to
  * nothing — pruning is an optimization, never a filter.
  */
private[graft] object StatsPruning {

  /** Skipping predicate over one file's stats — the tree form
    * disjunctions need (Delta's data-skipping expression shape): a flat
    * bound list can only AND, so `id = 5 OR id = 900` would translate
    * to nothing; as a tree each disjunct prunes independently and the
    * file survives iff ANY branch admits it. `True` is the
    * cannot-translate leaf — it poisons exactly its own OR branch
    * (keeping the superset guarantee) and is identity under AND.
    */
  sealed trait FilePredicate {
    def survives(stats: Map[String, VersionLog.ColStat]): Boolean
    /** True when no subtree can ever prune — callers skip the walk. */
    def trivial: Boolean
  }
  case object True extends FilePredicate {
    def survives(stats: Map[String, VersionLog.ColStat]): Boolean = true
    def trivial: Boolean = true
  }
  final case class Leaf(bound: ColumnBound) extends FilePredicate {
    def survives(stats: Map[String, VersionLog.ColStat]): Boolean =
      ColumnBound.survives(stats, Seq(bound))
    def trivial: Boolean = false
  }
  final case class AllOf(children: Seq[FilePredicate])
      extends FilePredicate {
    def survives(stats: Map[String, VersionLog.ColStat]): Boolean =
      children.forall(_.survives(stats))
    def trivial: Boolean = children.forall(_.trivial)
  }
  final case class AnyOf(children: Seq[FilePredicate])
      extends FilePredicate {
    def survives(stats: Map[String, VersionLog.ColStat]): Boolean =
      children.exists(_.survives(stats))
    def trivial: Boolean = children.exists(_.trivial)
  }

  /** The pushed-down data filters (an implicit conjunction) as one
    * skipping predicate.
    */
  def predicate(filters: Seq[Expression]): FilePredicate = {
    val t = AllOf(filters.map(treeOf))
    if (t.trivial) True else t
  }

  private def treeOf(e: Expression): FilePredicate = e match {
    case And(l, r) => AllOf(Seq(treeOf(l), treeOf(r)))
    case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
      val (tl, tr) = (treeOf(l), treeOf(r))
      // one unknowable disjunct makes the whole OR unknowable — rows
      // could satisfy that side in any file
      if (tl.trivial || tr.trivial) True else AnyOf(Seq(tl, tr))
    case other => boundOf(other).fold[FilePredicate](True)(Leaf)
  }

  def bounds(filters: Seq[Expression]): Seq[ColumnBound] =
    filters.flatMap(conjuncts).flatMap(boundOf)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def boundOf(e: Expression): Option[ColumnBound] = e match {
    case EqualTo(a: Attribute, l: Literal) => eq(a, l)
    case EqualTo(l: Literal, a: Attribute) => eq(a, l)
    case EqualNullSafe(a: Attribute, l: Literal) => eq(a, l)
    case EqualNullSafe(l: Literal, a: Attribute) => eq(a, l)
    case GreaterThan(a: Attribute, l: Literal) => lower(a, l)
    case GreaterThanOrEqual(a: Attribute, l: Literal) => lower(a, l)
    case LessThan(a: Attribute, l: Literal) => upper(a, l)
    case LessThanOrEqual(a: Attribute, l: Literal) => upper(a, l)
    case GreaterThan(l: Literal, a: Attribute) => upper(a, l)
    case GreaterThanOrEqual(l: Literal, a: Attribute) => upper(a, l)
    case LessThan(l: Literal, a: Attribute) => lower(a, l)
    case LessThanOrEqual(l: Literal, a: Attribute) => lower(a, l)
    case In(a: Attribute, list) if list.nonEmpty &&
        list.forall(_.isInstanceOf[Literal]) =>
      anyOfBound(a, list.map(l => value(l.asInstanceOf[Literal])))
    case InSet(a: Attribute, hset) if hset.nonEmpty =>
      // the optimizer's large-IN form: raw internal values, typed by
      // the child attribute
      anyOfBound(a, hset.toSeq.map(internal(_, a.dataType)))
    case IsNull(a: Attribute) =>
      // null-count skipping: IS NULL can only match in files whose
      // stats admit a NULL (hasNulls captured conservatively)
      Some(ColumnBound(a.name, requireNulls = true))
    case StartsWith(a: Attribute, Literal(v, StringType)) if v != null =>
      // LIKE 'p%' → the [p, p+ε) range under UTF-8 byte order. The
      // sound inclusive upper needs p's last char bumped WITHOUT
      // changing its UTF-8 byte length class — only attempted for an
      // ASCII final char (< 0x7f); otherwise the lower bound alone
      // still prunes everything below the prefix
      val p = v.toString
      if (p.isEmpty) None
      else {
        val last = p.charAt(p.length - 1)
        val upper =
          if (last < 0x7f) Some(p.substring(0, p.length - 1) + (last + 1).toChar)
          else None
        Some(ColumnBound(a.name, lower = Some(p), upper = upper))
      }
    case _ => None
  }

  /** The DISCRETE bound for an IN-list: the file survives iff ANY value
    * lands inside its [min, max] — sharper than a min..max envelope for
    * sparse lists. A NULL/untranslatable member degrades to nothing
    * (never a bound that could over-prune).
    */
  private def anyOfBound(a: Attribute,
      vs: Seq[Option[Any]]): Option[ColumnBound] =
    if (vs.isEmpty || vs.exists(_.isEmpty)) None
    else Some(ColumnBound(a.name, anyOf = Some(vs.flatten)))

  private def eq(a: Attribute, l: Literal): Option[ColumnBound] =
    value(l).map(v => ColumnBound(a.name, Some(v), Some(v)))
  private def lower(a: Attribute, l: Literal): Option[ColumnBound] =
    value(l).map(v => ColumnBound(a.name, lower = Some(v)))
  private def upper(a: Attribute, l: Literal): Option[ColumnBound] =
    value(l).map(v => ColumnBound(a.name, upper = Some(v)))

  /** Literal → the bound-value domain [[ColumnBound.survives]] compares
    * (Long / Double / String). Date and timestamp literals ride as their
    * epoch integers, matching the footer capture's encoding
    * ([[VersionLog]] stores date32 as epoch days, timestamp64 as epoch
    * micros — both compare correctly as signed longs). NULL literals
    * (value == null) translate to nothing: a NULL-compare filter is
    * never true, but proving emptiness is the optimizer's job, not the
    * file pruner's.
    */
  private def value(l: Literal): Option[Any] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType | TimestampNTZType =>
        Some(l.value.asInstanceOf[Number].longValue)
      case FloatType | DoubleType =>
        Some(l.value.asInstanceOf[Number].doubleValue)
      case StringType => Some(l.value.toString)
      case _ => None
    }

  /** RAW internal value (InSet members carry no Literal wrapper) → the
    * bound-value domain, typed by the attribute. Same translation rules
    * as [[value]].
    */
  private def internal(v: Any, dt: org.apache.spark.sql.types.DataType)
      : Option[Any] =
    if (v == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType | TimestampNTZType =>
        Some(v.asInstanceOf[Number].longValue)
      case FloatType | DoubleType =>
        Some(v.asInstanceOf[Number].doubleValue)
      case StringType => Some(v.toString)
      case _ => None
    }
}
