package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding hot path.
  *
  * `aggregate(zip_with(...))` keeps dot products semantically correct but
  * falls out of whole-stage codegen (higher-order functions evaluate
  * interpreted, allocating a lambda frame per element). At sf0.1 the
  * all-pairs cosine query spends >70 s there; this expression generates
  * a primitive fused multiply-add loop instead — same left-fold double
  * semantics, bitwise-identical results, ~40× less per-pair cost.
  *
  * Registered as SQL function `graft_dot` (GraftFunctions.register) so
  * plans stay buildable from any session.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0; var i = 0
    while (i < n) { sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature in one pass: element i of the output is
  * min over hashes h of (a_i * (h % P) + b_i) % P, for i < n — the
  * universal-hash family of TextFns.minhashA/B. One primitive loop
  * instead of n interpreted array traversals.
  */
case class MinhashSig(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import graft.functions.TextFns.{minhashA, minhashB, MinhashP}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private lazy val as: Array[Long] = (0 until n).map(minhashA).toArray
  private lazy val bs: Array[Long] = (0 until n).map(minhashB).toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val out = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < hs.numElements()) {
      val h = hs.getLong(j) % MinhashP
      var i = 0
      while (i < n) {
        val v = (as(i) * h + bs(i)) % MinhashP
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$n];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $hs.numElements(); $j++) {
         |  long $h = $hs.getLong($j) % ${MinhashP}L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${MinhashP}L;
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** 32-bit SimHash over an array of 32-bit hashes (as longs): bit j of
  * the result is set iff more hashes have bit j set than clear.
  */
case class SimHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    var j = 0
    while (j < hs.numElements()) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 32) {
        if (((h >> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sim = 0L; var i = 0
    while (i < 32) { if (votes(i) > 0) sim |= (1L << i); i += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val votes = ctx.freshName("votes"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h"); val sim = ctx.freshName("sim")
      s"""
         |int[] $votes = new int[32];
         |for (int $j = 0; $j < $hs.numElements(); $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < 32; $i++) {
         |    if ((($h >> $i) & 1L) != 0L) $votes[$i]++; else $votes[$i]--;
         |  }
         |}
         |long $sim = 0L;
         |for (int $i = 0; $i < 32; $i++) { if ($votes[$i] > 0) $sim |= (1L << $i); }
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Sign-of-projection LSH bucket id in one pass: bit p is set iff
  * dot(plane_p, vec) > 0. The hyperplane weights derive from the same
  * md5 formula as Similarity.planeWeight but are computed ONCE per
  * (planes, dims) per executor — the composed higher-order-function
  * formula re-derives every weight with an md5 PER ROW (planes × dims
  * md5 calls per vector), which dominates bucket assignment cost.
  * Fold order matches aggregate(zip_with(...)) exactly → bitwise-equal
  * buckets, so the DuckDB oracle mirror is unchanged.
  *
  * CodegenFallback: all projection work happens inside one eval.
  */
case class LshBucket(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_bucket expects array<float>, got $other")
    }

  // the expression instance is shared across task THREADS in an
  // executor; a volatile (dims, matrix) pair publishes the computed
  // weights safely (recomputation on a race is idempotent and rare)
  @transient @volatile private var cachedW: (Int, Array[Array[Double]]) = _

  /** hash32("p:d") % 1e6 / 1e6 - 0.5 — Similarity.planeWeight verbatim. */
  private def weights(dims: Int): Array[Array[Double]] = {
    val c = cachedW
    if (c != null && c._1 == dims) c._2
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = Array.tabulate(planes, dims) { (p, d) =>
        md.reset()
        val dig = md.digest(s"$p:$d".getBytes("UTF-8"))
        var v = 0L; var b = 0
        while (b < 4) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
        (v % 1000000L).toDouble / 1000000.0 - 0.5
      }
      cachedW = (dims, w)
      w
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val ws = weights(dims)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val wp = ws(p)
      var proj = 0.0
      var d = 0
      while (d < dims) { proj += arr.getFloat(d).toDouble * wp(d); d += 1 }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object GraftFunctions {
  /** Idempotent registration of the native functions on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash32",
      exprs => SimHash32(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinhashSig(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => ShingleHashes(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_bottomk",
      exprs => BottomK(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_lsh_bucket",
      exprs => LshBucket(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_token_hashes",
      exprs => ShingleHashes(exprs(0), 1, 8, distinct = false), "built-in")
    reg.createOrReplaceTempFunction("graft_topk_pairs",
      exprs => TopKPairs(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_detln",
      exprs => DetLn(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_tokens",
      exprs => BpeTokens(exprs(0)), "built-in")
    // merge table as a foldable array<string> literal (the learned
    // table, vocab-sized) — evaluated once at plan build. Guarded: a
    // column reference or NULL as the merge table would otherwise die
    // with an opaque analyzer exception deep in eval.
    reg.createOrReplaceTempFunction("graft_bpe_tokens_with",
      exprs => {
        require(exprs.length == 2,
          "graft_bpe_tokens_with(text, merges) takes exactly 2 arguments")
        val m = exprs(1)
        require(m.foldable && (m.dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _) => true
          case _ => false
        }), "graft_bpe_tokens_with: the merge table (2nd argument) must " +
          "be a foldable array<string> literal, not a column reference")
        val v = m.eval(null)
        require(v != null,
          "graft_bpe_tokens_with: the merge table (2nd argument) must not be NULL")
        BpeTokensWith(exprs(0),
          v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toObjectArray(org.apache.spark.sql.types.StringType)
            .map(_.toString).toSeq)
      }, "built-in")
  }
}
