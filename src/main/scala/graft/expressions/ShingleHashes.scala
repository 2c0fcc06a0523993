package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-word shingle hashes of a text column in one pass: tokenize on ' ',
  * form k-grams (first-occurrence distinct when `distinct`, full
  * multiset in token order otherwise), md5 each, take the first
  * `hexChars` hex digits as a BIGINT.
  *
  * Value-identical to
  * `transform(array_distinct(shingles), s -> CAST('0x'||substr(md5(s),1,hexChars) AS BIGINT))`
  * (resp. without the array_distinct) but skips materializing shingle
  * strings through the plan — the dedup hot path's dominant cost.
  * hexChars=8 matches TextFns.hash32; hexChars=14 gives a 56-bit key
  * for collision-free-in-practice posting joins. With k=1 and
  * distinct=false this is the fused tokenize+hash pass the SimHash
  * query needs (one eval instead of an interpreted per-token
  * transform(md5...) chain).
  *
  * CodegenFallback: the per-row call does all k-gram + md5 work inside
  * one eval, so losing whole-stage fusion costs nothing measurable.
  */
case class ShingleHashes(child: Expression, k: Int, hexChars: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  require(hexChars % 2 == 0 && hexChars <= 14, "hexChars must be even, <= 14")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (distinct) "graft_shingle_hashes" else "graft_token_hashes"

  private val nBytes = hexChars / 2

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String](toks.length)
    if (toks.length >= k) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
    } else {
      seen.add(text)
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var i = 0
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes("UTF-8"))
      var v = 0L; var b = 0
      while (b < nBytes) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v; i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
