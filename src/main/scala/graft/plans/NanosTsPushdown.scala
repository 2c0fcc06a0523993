package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: recover parquet predicate pushdown through
  * the TIMESTAMP(NANOS)-as-long conversion.
  *
  * `Tables.events` surfaces the raw nanosecond long as
  * `timestamp_micros(ts div 1000)` (Spark's parquet reader rejects
  * NANOS natively). Any time-window filter downstream then compares a
  * DERIVED expression, so nothing reaches the scan as a pushable
  * filter — at 100 TB the trailing-window re-extract would read every
  * row group of a years-deep table. The conversion is monotone
  * non-decreasing, so each comparison against a timestamp literal
  * implies an exact raw-long bound:
  *
  *   micros(a div 1000) >= T  ⟺  a >= micros(T)·1000
  *   micros(a div 1000) >  T  ⟺  a >= (micros(T)+1)·1000
  *   micros(a div 1000) <  T  ⟺  a <  micros(T)·1000
  *   micros(a div 1000) <= T  ⟺  a <  (micros(T)+1)·1000
  *
  * (exact for non-negative nanos since `div` truncates; for negative
  * nanos both sides are false together for T > epoch, the only
  * literals the rule touches). The rule AND-adds the raw bound next to
  * the original conjunct — FileSourceStrategy then pushes the plain
  * attribute comparison into PushedFilters for row-group pruning while
  * the original predicate stays for exactness. Idempotent: a bound
  * already present (semantically) is not re-added.
  */
case class NanosTsPushdown(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  /** Under a UTC session, TIMESTAMP ↔ TIMESTAMP_NTZ casts preserve the
    * underlying micros value exactly, so they are transparent to the
    * bound algebra. Any other session TZ makes the cast a shift — then
    * nothing unwraps and the rule simply never fires on those chains.
    */
  private def utcSession: Boolean =
    spark.sessionState.conf.sessionLocalTimeZone == "UTC"

  private def stripTsCasts(e: Expression): Expression = e match {
    case c: Cast if utcSession &&
        (c.dataType == TimestampType || c.dataType == TimestampNTZType) &&
        (c.child.dataType == TimestampType || c.child.dataType == TimestampNTZType) =>
      stripTsCasts(c.child)
    case other => other
  }

  /** The raw long child of a micros(x div 1000) conversion — including
    * the NTZ-wrapped chains the encoding seam produces for UNADJUSTED
    * TIMESTAMP(NANOS) files (`cast(cast(timestamp_micros(x div 1000)
    * as timestamp_ntz) as timestamp)`).
    */
  private def rawNanos(e: Expression): Option[Expression] = stripTsCasts(e) match {
    case MicrosToTimestamp(d: IntegralDivide) => d.right match {
      case Literal(1000L, LongType) => Some(d.left)
      case _ => None
    }
    case _ => None
  }

  /** Post-epoch timestamp literals only (keeps the truncation algebra
    * exact without reasoning about negative division). NTZ literals
    * carry the same micros under the UTC session.
    */
  private def micros(e: Expression): Option[Long] = e match {
    case Literal(v: Long, TimestampType) if v > 0 => Some(v)
    case Literal(v: Long, TimestampNTZType) if v > 0 && utcSession => Some(v)
    case _ => None
  }

  private def nanos(m: Long): Option[Long] =
    try Some(Math.multiplyExact(m, 1000L)) catch { case _: ArithmeticException => None }

  private def bound(cmp: Expression): Option[Expression] = cmp match {
    case GreaterThanOrEqual(l, r) if rawNanos(l).isDefined =>
      for { a <- rawNanos(l); m <- micros(r); n <- nanos(m) }
        yield GreaterThanOrEqual(a, Literal(n, LongType))
    case GreaterThan(l, r) if rawNanos(l).isDefined =>
      for { a <- rawNanos(l); m <- micros(r); n <- nanos(m + 1) }
        yield GreaterThanOrEqual(a, Literal(n, LongType))
    case LessThan(l, r) if rawNanos(l).isDefined =>
      for { a <- rawNanos(l); m <- micros(r); n <- nanos(m) }
        yield LessThan(a, Literal(n, LongType))
    case LessThanOrEqual(l, r) if rawNanos(l).isDefined =>
      for { a <- rawNanos(l); m <- micros(r); n <- nanos(m + 1) }
        yield LessThan(a, Literal(n, LongType))
    // literal-first spellings mirror to the forms above
    case LessThanOrEqual(l, r) if rawNanos(r).isDefined => bound(GreaterThanOrEqual(r, l))
    case LessThan(l, r) if rawNanos(r).isDefined        => bound(GreaterThan(r, l))
    case GreaterThanOrEqual(l, r) if rawNanos(r).isDefined => bound(LessThanOrEqual(r, l))
    case GreaterThan(l, r) if rawNanos(r).isDefined     => bound(LessThan(r, l))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val added = conjuncts.flatMap(bound)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (added.isEmpty) f
      else Filter((conjuncts ++ added).reduce(And), child)
  }
}
