package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{Cast, ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

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
    case _ => OpaqueNode
  }
}
