package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.internal.{Cast, ColumnNode, Literal, SqlExpression, UnresolvedAttribute, UnresolvedFunction}

/** Bridge into Spark 4's `private[sql]` Column internals. Spark 4 made
  * `Column` API-agnostic: it wraps an `org.apache.spark.sql.internal
  * .ColumnNode` tree (function name + args), not a Catalyst Expression
  * — the Expression materializes only at analysis. A library that needs
  * to REASON about a user-supplied predicate before analysis (here,
  * [[graft.operators.SnapshotStats]]'s manifest file pruner) must walk
  * that node tree. This shim translates it into a neutral mini-AST so
  * engine code stays free of `private[sql]` imports; placing it inside
  * the `org.apache.spark.sql` package tree is the established extension
  * pattern for such seams.
  */
object ColumnBridge {

  /** Structure-only view of a predicate Column: function applications
    * over attributes and literals; anything else is opaque (and a
    * conservative consumer treats it as unknowable).
    */
  sealed trait PredNode
  final case class FnNode(name: String, args: Seq[PredNode]) extends PredNode
  final case class AttrNode(name: String) extends PredNode
  /** `value` is the literal re-wrapped as a Column (for building
    * comparisons with identical semantics); `raw` its Scala value.
    */
  final case class LitNode(value: Column, raw: Any) extends PredNode
  /** An attribute-free computation over literals (e.g. the idiomatic
    * `lit("1996-01-01").cast("timestamp")`): usable as a comparison
    * value, but carrying no inspectable raw value.
    */
  final case class ValueNode(value: Column) extends PredNode
  case object OpaqueNode extends PredNode

  def pred(c: Column): PredNode = walk(c.node)

  /** Wrap a Catalyst expression (e.g. one the session parser produced
    * from SQL text) as a user-facing Column; unresolved attributes
    * resolve at analysis against whatever Dataset it is applied to.
    */
  def column(e: ce.Expression): Column = ExpressionUtils.column(e)

  /** Apply a Catalyst-expression constructor over a Column's own
    * expression tree, yielding a plain Column — the way to surface a
    * native expression (e.g. [[graft.expressions.DetLn]]) WITHOUT a
    * function-registry round trip: the result is a pure tree that
    * resolves in any session, needs no registration side effect, and
    * can be built before any session exists (conversion of ordinary
    * column nodes is session-free; only `expr("...")` inputs consult
    * the active session's parser, as they always have).
    */
  def wrap(c: Column)(f: ce.Expression => ce.Expression): Column =
    ExpressionUtils.column(f(ExpressionUtils.expression(c)))

  private def walk(n: ColumnNode): PredNode = n match {
    case f: UnresolvedFunction if !f.isDistinct && !f.isUserDefinedFunction =>
      FnNode(f.functionName, f.arguments.map(walk))
    case c: Cast =>
      // only cast-of-literal folds to a value: a general
      // function-of-literals could hide non-determinism (rand(seed))
      // and silently unsound the consumer's skipping decisions
      walk(c.child) match {
        case _: LitNode | _: ValueNode => ValueNode(Column(n))
        case _                         => OpaqueNode
      }
    case a: UnresolvedAttribute if !a.isMetadataColumn =>
      AttrNode(a.nameParts.mkString("."))
    case l: Literal =>
      LitNode(Column(l), l.value)
    case s: SqlExpression =>
      // expr("...") predicates: parse with the session parser and walk
      // the (unresolved) Catalyst tree instead
      SparkSession.getActiveSession
        .map(sp => walkCatalyst(sp.sessionState.sqlParser.parseExpression(s.expression)))
        .getOrElse(OpaqueNode)
    case _ => OpaqueNode
  }

  /** The same translation for an unresolved Catalyst tree (the form
    * `expr("...")` parses to). Function names mirror the ColumnNode
    * spellings the consumer already matches.
    */
  private def walkCatalyst(e: ce.Expression): PredNode = e match {
    case ce.And(l, r) => FnNode("and", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.Or(l, r)  => FnNode("or", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.Not(c)    => FnNode("!", Seq(walkCatalyst(c)))
    case ce.EqualTo(l, r)            => FnNode("=", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.EqualNullSafe(l, r)      => FnNode("<=>", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.GreaterThan(l, r)        => FnNode(">", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.GreaterThanOrEqual(l, r) => FnNode(">=", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.LessThan(l, r)           => FnNode("<", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.LessThanOrEqual(l, r)    => FnNode("<=", Seq(walkCatalyst(l), walkCatalyst(r)))
    case ce.In(v, list)              => FnNode("in", (v +: list).map(walkCatalyst))
    case ce.IsNull(c)                => FnNode("isNull", Seq(walkCatalyst(c)))
    case ce.IsNotNull(c)             => FnNode("isNotNull", Seq(walkCatalyst(c)))
    case ce.StartsWith(l, r)         => FnNode("startswith", Seq(walkCatalyst(l), walkCatalyst(r)))
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => AttrNode(a.name)
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
      if !f.isDistinct && f.filter.isEmpty =>
      // the parser leaves some operators as named functions (BETWEEN, …)
      FnNode(f.nameParts.last.toLowerCase(java.util.Locale.ROOT), f.arguments.map(walkCatalyst))
    case l: ce.Literal =>
      // surface the EXTERNAL value (catalyst literals hold UTF8String &
      // friends internally), matching LitNode's contract
      val ext = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType)
      LitNode(ExpressionUtils.column(l), ext)
    case c: ce.Cast =>
      walkCatalyst(c.child) match {
        case _: LitNode | _: ValueNode => ValueNode(ExpressionUtils.column(c))
        case _                         => OpaqueNode
      }
    case _ => OpaqueNode
  }
}
