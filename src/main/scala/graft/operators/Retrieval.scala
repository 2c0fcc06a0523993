package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Positional-index retrieval: exact phrase search as aligned-position
  * equi-joins over a (doc, position, term) posting table.
  *
  * Plan shape: posexplode → a narrow `isin` filter to the phrase's own
  * vocabulary BEFORE any shuffle (so the posting table is O(occurrences
  * of the phrase's words), never the corpus token count), then one
  * equi-join per additional phrase word on (doc, aligned start
  * position). A k-word phrase is k-1 hash joins whose keys are already
  * co-partitioned after the first shuffle — Catalyst reuses the
  * exchange. No window, no sort, no cross join; the same inverted-index
  * altitude as the jaccard/minhash pair joins.
  */
object Retrieval {

  /** Documents containing `phrase` as consecutive tokens: (id, n_hits,
    * first_pos), positions 1-based. Multi-occurrence and overlapping
    * matches count individually.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val toks = docs
      .select(col(idCol), posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct: _*))
    val aligned: Seq[DataFrame] = phrase.zipWithIndex.map { case (w, i) =>
      toks.where(col("term") === w).select(col(idCol), (col("pos") - i).as("p0"))
    }
    aligned.reduceLeft((a, b) => a.join(b, Seq(idCol, "p0")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"), (min(col("p0")) + 1).cast("long").as("first_pos"))
  }
}
