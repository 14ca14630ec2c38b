package graft.sources

import org.apache.spark.sql.sources._

import graft.ops.TableStore
import graft.ops.TableStore.FileEntry

/** Log-stats file skipping for the SQL surface: decide, from the
  * commit log's per-file bounds ALONE (zero data IO), whether a file
  * can possibly hold a row satisfying a pushed-down filter. This is
  * the same evidence [[TableStore.readRange]]/`readPrefix` consult —
  * re-expressed over Spark's `sources.Filter` ADT so one evaluator
  * serves both the DSv2 pushdown path and the [[GraftFileIndex]]
  * native-scan path (which translates its Catalyst filters to the
  * same ADT).
  *
  * Soundness contract: `mayContain` returns false ONLY when the
  * logged bounds PROVE no row matches — unknown filter shapes,
  * columns without logged stats, and null-related predicates (the log
  * carries no null counts) all answer true. Truncated string bounds
  * (the log's 64-char cap) only ever WIDEN a file's range, so every
  * comparison stays conservative. The residual row filter is always
  * re-applied by the scan, so a too-wide answer costs IO, never
  * correctness.
  */
object StatsSkipping {

  private def asLong(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long    => Some(l.longValue)
    case s: java.lang.Short   => Some(s.longValue)
    case b: java.lang.Byte    => Some(b.longValue)
    case _                    => None
  }

  private def asString(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case _ => None
  }

  import TableStore.strLe

  // per-file bound tests; None bounds (column not in the file's logged
  // stats) always answer true — pruning needs proof, absence isn't it
  private def longOverlap(e: FileEntry, col: String,
                          lo: Option[Long], hi: Option[Long]): Boolean =
    (e.mins.get(col), e.maxs.get(col)) match {
      case (Some(mn), Some(mx)) =>
        lo.forall(l => mx >= l) && hi.forall(h => mn <= h)
      case _ => true
    }

  private def strOverlap(e: FileEntry, col: String,
                         lo: Option[String], hi: Option[String]): Boolean =
    (e.smins.get(col), e.smaxs.get(col)) match {
      case (Some(mn), Some(mx)) =>
        lo.forall(l => strLe(l, mx)) && hi.forall(h => strLe(mn, h))
      case _ => true
    }

  // strict variants: max > v / min < v (exact for the long maps; the
  // string maps are truncated, so strict degrades to non-strict there
  // — truncation widened the bound, and widening must stay sound)
  private def longGt(e: FileEntry, col: String, v: Long): Boolean =
    e.maxs.get(col).forall(_ > v)
  private def longLt(e: FileEntry, col: String, v: Long): Boolean =
    e.mins.get(col).forall(_ < v)

  /** Can `e` possibly hold a row satisfying `f`? Conservative. */
  def mayContain(e: FileEntry, f: Filter): Boolean = f match {
    case And(l, r) => mayContain(e, l) && mayContain(e, r)
    case Or(l, r)  => mayContain(e, l) || mayContain(e, r)
    case EqualTo(a, v) => eqTest(e, a, v)
    case EqualNullSafe(a, v) if v != null => eqTest(e, a, v)
    case In(a, vs) =>
      // null elements never equal anything; an all-null or unknown-
      // typed list can't prune
      val known = vs.filter(_ != null)
      known.isEmpty || known.exists(v => eqTest(e, a, v))
    case GreaterThan(a, v) =>
      asLong(v).map(longGt(e, a, _))
        .orElse(asString(v).map(s => strOverlap(e, a, Some(s), None)))
        .getOrElse(true)
    case GreaterThanOrEqual(a, v) =>
      asLong(v).map(l => longOverlap(e, a, Some(l), None))
        .orElse(asString(v).map(s => strOverlap(e, a, Some(s), None)))
        .getOrElse(true)
    case LessThan(a, v) =>
      asLong(v).map(longLt(e, a, _))
        .orElse(asString(v).map(s => strOverlap(e, a, None, Some(s))))
        .getOrElse(true)
    case LessThanOrEqual(a, v) =>
      asLong(v).map(l => longOverlap(e, a, None, Some(l)))
        .orElse(asString(v).map(s => strOverlap(e, a, None, Some(s))))
        .getOrElse(true)
    case StringStartsWith(a, p) if p.nonEmpty =>
      // [p, successor(p)): the readPrefix window; a successor-less
      // prefix (all chars >= 0x7f) prunes on the lower side only
      strOverlap(e, a, Some(p), TableStore.prefixSuccessor(p))
    case _ => true // IsNull/IsNotNull/Not/unknown: no null counts, no proof
  }

  private def eqTest(e: FileEntry, a: String, v: Any): Boolean =
    asLong(v).map(l => longOverlap(e, a, Some(l), Some(l)))
      .orElse(asString(v).map(s => strOverlap(e, a, Some(s), Some(s))))
      .getOrElse(true)

  /** Filters this evaluator can use for skipping — what the scan
    * reports as `pushedFilters` (advisory; every filter is also kept
    * as a residual, so reporting is never a correctness claim). */
  def usable(f: Filter): Boolean = f match {
    case And(l, r) => usable(l) || usable(r)
    case Or(l, r)  => usable(l) && usable(r)
    case EqualTo(_, v) => asLong(v).orElse(asString(v)).isDefined
    case EqualNullSafe(_, v) =>
      v != null && asLong(v).orElse(asString(v)).isDefined
    case In(_, vs) =>
      vs.exists(v => v != null && asLong(v).orElse(asString(v)).isDefined)
    case GreaterThan(_, v) => asLong(v).orElse(asString(v)).isDefined
    case GreaterThanOrEqual(_, v) => asLong(v).orElse(asString(v)).isDefined
    case LessThan(_, v) => asLong(v).orElse(asString(v)).isDefined
    case LessThanOrEqual(_, v) => asLong(v).orElse(asString(v)).isDefined
    case StringStartsWith(_, p) => p.nonEmpty
    case _ => false
  }

  /** The live files that survive every filter. */
  def prune(live: Seq[FileEntry], filters: Seq[Filter]): Seq[FileEntry] =
    live.filter(e => filters.forall(f => mayContain(e, f)))
}
