package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** BPE tokenizer training: the distributed trainer must match a plain
  * in-memory reference (word-type counting, frequency-weighted pair
  * argmax with lexicographic tie-break, left-to-right non-overlapping
  * merge application, incremental state across rounds).
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference trainer: naive maps and vectors.
    *
    * Tie-break caveat: this reference breaks count ties with Java
    * String ordering (UTF-16 code units) while Spark's orderBy and
    * DuckDB compare UTF-8 bytes — the orders differ only for
    * SUPPLEMENTARY-PLANE characters (surrogate code units sort below
    * U+E000..U+FFFF, UTF-8 bytes sort them above). The fixtures here
    * and the synthetic corpus are ASCII, where all three orders agree;
    * a non-BMP corpus would need this reference to compare
    * `getBytes(UTF_8)` lexicographically instead.
    */
  private def reference(texts: Seq[String], nMerges: Int): Seq[(Long, String)] = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var done = false
    while (out.size < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((syms, cnt) <- vocab; i <- 0 until syms.size - 1)
        counts.updateWith(syms(i) + " " + syms(i + 1))(c => Some(c.getOrElse(0L) + cnt))
      if (counts.isEmpty) done = true
      else {
        val (pair, _) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        out += (((out.size + 1).toLong, pair))
        val Array(a, b) = pair.split(" ", 2)
        vocab = vocab.toSeq.map { case (syms, cnt) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms)
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.size - 1) = acc.last + s
            else acc += s
          acc.toVector -> cnt
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  private def trained(texts: Seq[String], n: Int): Seq[(Long, String)] =
    BpeTrain.train(texts.toDF("text"), "text", n)
      .orderBy("rank").as[(Long, String)].collect().toSeq

  test("learned merges match the reference on a crafted corpus") {
    // overlaps (aaa), ties (ab vs cd equal counts -> lexicographic),
    // merge composition (learned symbol participates in later pairs),
    // single-char words (no pairs)
    val texts = Seq(
      "aaa aaa ab ab cd cd",
      "table table table stable",
      "x y z ab cd")
    val got = trained(texts, 8)
    val want = reference(texts, 8)
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("pair exhaustion stops early; rank order is learning order") {
    val texts = Seq("ab ab", "c d")
    val got = trained(texts, 10)
    val want = reference(texts, 10)
    assert(got == want)
    assert(got.size < 10, "tiny corpus must exhaust before 10 merges")
    assert(got.map(_._1) == (1L to got.size).toSeq)
  }

  test("vocab-state accounting agrees with the greedy-apply expression path") {
    // q185 counts corpus tokens by joining words against the trainer's
    // FINAL VOCABULARY STATE (incremental splits); q189 applies the
    // learned table with the greedy expression. On a training corpus
    // the two can differ in principle (greedy re-apply can merge an
    // earlier-ranked pair a later merge makes adjacent — the BpeTrain
    // scaladoc case); this pins that BOTH paths are internally
    // consistent and agree on the real corpus, so a divergence after a
    // trainer/expression change is a regression, not noise.
    import graft.expressions.BpeTokensWith
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val docs = sf().documents.limit(200).select("doc_id", "text")
    val (merges, vocab) = BpeTrain.trainState(docs, "text", 8)
    val table = merges.orderBy("rank").as[(Long, String)].collect().map(_._2).toSeq
    // path 1: q185's word-level join against the vocab state
    val viaVocab = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .join(vocab.select(col("w"), size(col("syms")).cast("long").as("n_sub")), "w")
      .groupBy("doc_id").agg(sum("n_sub").as("n"))
    // path 2: q189's greedy native expression under the same table
    val expr = ColumnBridge.wrap(col("text"))(e => BpeTokensWith(e, table))
    val viaExpr = docs.select(col("doc_id"), size(expr).cast("long").as("n"))
    val joined = viaVocab.alias("a").join(viaExpr.alias("b"), "doc_id")
      .select(col("doc_id"), col("a.n").as("nv"), col("b.n").as("ne"))
      .collect()
    assert(joined.nonEmpty)
    val diff = joined.filter(r => r.getLong(1) != r.getLong(2))
    assert(diff.isEmpty,
      s"vocab-state vs greedy-apply token counts diverge on ${diff.length} docs: " +
        diff.take(3).mkString(", "))
  }

  test("distributed training matches the reference on the real corpus") {
    val docs = sf().documents.limit(120).select("text")
    val texts = docs.as[String].collect().toSeq
    val got = BpeTrain.train(docs, "text", 6)
      .orderBy("rank").as[(Long, String)].collect().toSeq
    assert(got == reference(texts, 6), got.toString)
  }
}
