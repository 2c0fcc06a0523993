package graft

import org.apache.spark.sql.functions._

import graft.expressions.{Bpe, GraftFunctions}

/** Greedy BPE tokenizer (graft_bpe_tokens): classic apply semantics —
  * per whitespace word, repeatedly merge the LEFTMOST occurrence of
  * the LOWEST-RANK adjacent pair from the pinned merge table
  * ([[Bpe.Merges]]) until none applies.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def bpe(texts: String*): Seq[Seq[String]] = {
    GraftFunctions.register(spark)
    texts.toDF("text")
      .select(call_function("graft_bpe_tokens", $"text"))
      .as[Seq[String]].collect().toSeq
  }

  test("multi-level merges compose: 'table' collapses through ta+b+le -> ta+ble -> table") {
    // ranks: "t a"=1 -> [ta,b,l,e]; "l e"=16 -> [ta,b,le];
    // "b le"=17 -> [ta,ble]; "ta ble"=18 -> [table]
    assert(bpe("table") == Seq(Seq("table")))
  }

  test("lowest rank wins over leftmost position") {
    // "star": pairs (s,t)=rank5, (t,a)=rank1, (a,r)=rank3 — "t a"
    // merges FIRST though "s t" sits further left: [s,ta,r]; then
    // no pair of the remaining ("s ta", "ta r") is in the table
    assert(bpe("star") == Seq(Seq("s", "ta", "r")))
  }

  test("leftmost occurrence of the best pair merges first") {
    // "tata": (t,a)@1 and (t,a)@3 both rank 1 — leftmost merges first:
    // [ta,t,a] -> remaining (ta,t)? no; (t,a) rank 1 -> [ta,ta];
    // ("ta ta") not in table
    assert(bpe("tata") == Seq(Seq("ta", "ta")))
  }

  test("words split independently; repeated/empty separators contribute nothing") {
    assert(bpe("the  table") == Seq(Seq("th", "e", "table")))
    assert(bpe("") == Seq(Seq.empty))
  }

  test("counts match a reference reimplementation on the real corpus") {
    // an independent Scala reimplementation of the same contract,
    // applied to the corpus — guards the native expression's codegen
    // path against drift (Verify's DuckDB oracle guards eval)
    def ref(text: String): Int = text.split(" ", -1).filter(_.nonEmpty).map { w =>
      var syms = w.toCharArray.map(String.valueOf(_)).toVector
      val rank = Bpe.Merges.zipWithIndex.toMap
      var go = true
      while (go) {
        val cands = syms.indices.dropRight(1)
          .flatMap(i => rank.get(s"${syms(i)} ${syms(i + 1)}").map(r => (r, i)))
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.minBy(c => (c._1, c._2))
          syms = syms.patch(i, Seq(syms(i) + syms(i + 1)), 2)
        }
      }
      syms.size
    }.sum
    val docs = sf().documents.limit(100).select("doc_id", "text")
      .as[(Long, String)].collect()
    GraftFunctions.register(spark)
    val got = sf().documents.limit(100)
      .select($"doc_id", size(call_function("graft_bpe_tokens", $"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == ref(text), s"doc $id: native ${got(id)} vs reference ${ref(text)}")
    }
  }
}
