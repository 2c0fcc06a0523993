package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Index into a broadcast `Array[Long]` — the probe half of the
  * broadcast-backed bloom filter (operators.Bloom). The word array rides
  * a Spark broadcast variable (the expression serializes only the
  * broadcast HANDLE with the plan; executors fetch blocks once), where a
  * `typedLit` of the same array would bake megabytes into the expression
  * tree and blow up analysis/codegen at large build-side cardinalities.
  *
  * Codegen caches `bc.value()` in a per-operator mutable field so the
  * per-row work is one primitive array index — same cost as the literal
  * `element_at` path it replaces.
  */
case class BroadcastWordAt(bc: Broadcast[Array[Long]], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_word"

  override def nullSafeEval(i: Any): Any = bc.value(i.asInstanceOf[Long].toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bc,
      classOf[Broadcast[Array[Long]]].getName)
    val words = ctx.addMutableState("long[]", "graftBloomWords",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, i => s"${ev.value} = $words[(int) $i];")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastWordAt =
    copy(child = newChild)
}
