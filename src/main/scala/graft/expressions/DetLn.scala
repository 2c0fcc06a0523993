package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Deterministic ln as ONE compact native expression.
  *
  * [[graft.functions.DetMath.detLn]] originally built the arithmetic
  * as a Column tree; Columns have no subexpression sharing, so every
  * reuse of an intermediate (m, m2, z, z2 …) DUPLICATES its whole
  * subtree and the expansion is exponential in the nesting depth. One
  * call still codegens, but a projection with several calls (q100's
  * per-type entropy terms: six) overflows Janino's 64 KB method limit
  * inside the fused aggregate-output function and silently drops the
  * whole stage to interpreted mode — correct, and a large hidden
  * slowdown on a 100 TB scan.
  *
  * This expression evaluates the SAME IEEE-754 op sequence (see
  * [[DetLnMath.detLn]] — integer range reduction, 1.5-fold, atanh
  * Horner series to z^13, ln2 as the same decimal literal) in a few
  * Java locals: eval and codegen call one static method, so the two
  * paths are bit-identical to each other and to the retired Column
  * tree — every DuckDB oracle built on `detLnSql` keeps hashing.
  */
case class DetLn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_detln"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_detln needs a DOUBLE argument (cast first), got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    DetLnMath.detLn(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DetLnMath.detLn($c)")

  override protected def withNewChildInternal(newChild: Expression): DetLn =
    copy(child = newChild)
}

object DetLnMath {
  /** ln 2 as the decimal literal every engine parses to the same
    * double (mirrors DetMath.Ln2).
    */
  final val Ln2: Double = 0.6931471805599453

  /** Op-for-op port of the retired Column tree — each step mirrors one
    * Spark/DuckDB arithmetic node, so results stay bitwise identical
    * across all three forms.
    */
  def detLn(x: Double): Double = {
    // e = length(bin(CAST(floor(x) AS BIGINT))) - 1: bit length minus
    // one for positive v, 0 for v == 0 ("0"), 63 for negative v
    // (64-char two's complement) — x >= 1 in every caller, the other
    // branches only pin the out-of-contract bit pattern
    val v = math.floor(x).toLong
    val e = if (v == 0L) 0 else if (v < 0L) 63 else 63 - java.lang.Long.numberOfLeadingZeros(v)
    val m = x / (1L << e).toDouble
    val eAdj = (if (m >= 1.5) e + 1 else e).toDouble
    val m2 = if (m >= 1.5) m / 2.0 else m
    val z = (m2 - 1.0) / (m2 + 1.0)
    val z2 = z * z
    val series = 2.0 * z * (1.0 + z2 * (1.0 / 3.0 + z2 * (1.0 / 5.0 +
      z2 * (1.0 / 7.0 + z2 * (1.0 / 9.0 + z2 * (1.0 / 11.0 + z2 * (1.0 / 13.0)))))))
    eAdj * Ln2 + series
  }
}
