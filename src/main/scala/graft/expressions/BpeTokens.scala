package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy byte-pair-encoding tokenizer as ONE native expression —
  * the REAL budgeting unit of an LLM data pipeline (whitespace token
  * counts under-charge long words and miss subword structure; training
  * budgets, packing tiles and context windows are all denominated in
  * tokenizer tokens).
  *
  * Semantics (the classic BPE apply, deterministic): each whitespace
  * word starts as its character sequence; repeatedly find the
  * LOWEST-RANK adjacent symbol pair present in the merge table and
  * merge its LEFTMOST occurrence; stop when no adjacent pair is in the
  * table. Merging one occurrence at a time is equivalent to the usual
  * all-occurrences-per-round formulation because a merge can only
  * CREATE pairs of strictly higher rank (a pair containing a merged
  * symbol was learned later than the merge that built the symbol).
  *
  * The merge table is fixture-pinned ([[Bpe.Merges]]) and exposed as a
  * SQL list literal ([[Bpe.mergesSqlList]]) so an external engine
  * replays the exact same greedy merges (the DuckDB oracles do, via a
  * recursive CTE). Plan shape: a scalar expression inside whole-stage
  * codegen — eval and codegen call the same static method, no UDF, no
  * per-row boxing beyond the output array.
  */
case class BpeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens needs a STRING argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    BpeFns.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.BpeFns.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** [[BpeTokens]] with the merge table passed IN instead of pinned —
  * the train→apply closure: `BpeTrain.train` learns the table (one
  * corpus pass + vocabulary-sized rounds), the caller collects it
  * (vocab-sized, nMerges rows) and tokenizes the corpus under the
  * LEARNED tokenizer with the same greedy lowest-rank/leftmost apply.
  * Same static body for eval and codegen (the rank map rides the
  * generated class as a referenced object) — bit-identical paths,
  * no UDF.
  */
case class BpeTokensWith(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens_with"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens_with needs a STRING argument, got ${child.dataType.simpleString}")

  @transient private lazy val rankMap: java.util.HashMap[String, Integer] =
    BpeFns.rankOf(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeFns.tokensWith(input.asInstanceOf[UTF8String], rankMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("bpeRanks", rankMap, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BpeFns.tokensWith($c, $mapRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokensWith =
    copy(child = newChild)
}

object Bpe {
  /** The pinned merge table, rank = position (1-based). Entries are
    * "left right" symbol pairs; later entries may merge symbols built
    * by earlier ones (e.g. rank 18 merges "ta"+"ble"). Chosen for the
    * synthetic corpus vocabulary; the VALUE of the table is irrelevant
    * to correctness — both engines replay whatever is listed here.
    */
  val Merges: IndexedSeq[String] = IndexedSeq(
    "t a", "e r", "a r", "i n", "s t", "a l", "o w", "s c",
    "h a", "b a", "q u", "k e", "g r", "b i", "t h", "l e",
    "b le", "ta ble", "in e", "o r", "u e", "er y", "o l", "s m")

  /** The merge table as a DuckDB list literal, for oracle SQL. */
  def mergesSqlList: String =
    Merges.map(m => s"'$m'").mkString("[", ", ", "]")
}

object BpeFns {
  private val rank: java.util.HashMap[String, Integer] = rankOf(Bpe.Merges)

  /** "left right" pairs in learning order → rank lookup (1-based). */
  def rankOf(merges: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, i + 1) }
    m
  }

  /** Static entry shared by eval and codegen — bit-identical paths. */
  def tokens(text: UTF8String): ArrayData = tokensWith(text, rank)

  /** [[tokens]] under an arbitrary merge table. */
  def tokensWith(text: UTF8String,
                 rank: java.util.HashMap[String, Integer]): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val syms = new java.util.ArrayList[String](w.length)
        var ci = 0
        while (ci < w.length) { syms.add(String.valueOf(w.charAt(ci))); ci += 1 }
        var done = false
        while (!done) {
          var bestRank = Integer.MAX_VALUE
          var bestI = -1
          var i = 0
          while (i < syms.size - 1) {
            val r = rank.get(syms.get(i) + " " + syms.get(i + 1))
            if (r != null && r < bestRank) { bestRank = r; bestI = i }
            i += 1
          }
          if (bestI < 0) done = true
          else {
            syms.set(bestI, syms.get(bestI) + syms.get(bestI + 1))
            syms.remove(bestI + 1)
          }
        }
        var si = 0
        while (si < syms.size) {
          out.add(UTF8String.fromString(syms.get(si))); si += 1
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}
