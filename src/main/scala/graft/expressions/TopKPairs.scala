package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k (score desc, id asc) pairs as a constant-space aggregate:
  * `graft_topk_pairs(id, score, k)` → array<struct<match_id, score>>
  * sorted best-first.
  *
  * This is the scale-path replacement for `row_number() OVER
  * (PARTITION BY query ORDER BY score DESC) <= k` in ANN queries: the
  * window plan shuffles EVERY candidate pair to the query's reducer and
  * sorts there, while a TypedImperativeAggregate gets partial (map-side)
  * aggregation for free — each upstream partition forwards at most k
  * pairs per query, so the shuffle is O(queries × k) instead of
  * O(candidate pairs). Deterministic: ties break on the smaller id, same
  * as the window's (score DESC, id) ordering.
  *
  * Set semantics: an exactly duplicated (id, score) input contributes
  * once (TreeSet buffer) — candidate generation upstream must emit each
  * (query, match) pair once, which every ANN path here guarantees by
  * construction (a pair meets on at most one probe/cell).
  */
case class TopKPairs(
    idChild: Expression,
    scoreChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(idChild, scoreChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("match_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk_pairs"

  // orders best-first: higher score first, then smaller id
  private val ord: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] with Serializable {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def add(buf: java.util.TreeSet[(Double, Long)], s: Double, id: Long): Unit = {
    buf.add((s, id))
    if (buf.size > k) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)], input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val id = idChild.eval(input)
    val s = scoreChild.eval(input)
    if (id != null && s != null)
      add(buf, s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[(Double, Long)], b: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) { val e = it.next(); add(a, e._1, e._2) }
    a
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator(); var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e._2, e._1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e._1); bb.putLong(e._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(idChild = newChildren(0), scoreChild = newChildren(1))
}
