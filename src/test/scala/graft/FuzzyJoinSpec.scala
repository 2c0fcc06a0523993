package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq(
    "spark", "spork", "sprk", "sparkk", "shark", "park", "qpark",
    "a", "b", "ab", "ba", "", "xyz", "xyw", "wxyz", "spark")

  test("join1 equals the naive levenshtein<=1 cross join, incl. edge lengths") {
    val left = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("lid", "lw")
    val right = words.zipWithIndex.map { case (w, i) => (i.toLong + 100, w) }.toDF("rid", "rw")
    val blocked = FuzzyJoin.join1(left, right, "lw", "rw")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.crossJoin(right)
      .where(levenshtein($"lw", $"rw") <= 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(blocked == naive)
    assert(naive.nonEmpty)
  }

  test("join1 preserves multiplicity of duplicate input rows (multiset equality)") {
    // duplicate rows on BOTH sides: each (left row, right row) pair must
    // appear exactly as often as in the naive join — a whole-row
    // distinct() would collapse them
    val left = Seq("spark", "spark", "park", "spork").toDF("lw")
    val right = Seq("spark", "spark", "shark").toDF("rw")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("lw", "rw").count().as[(String, String, Long)].collect()
        .map { case (l, r, n) => ((l, r), n) }.toMap
    val blocked = counts(FuzzyJoin.join1(left, right, "lw", "rw"))
    val naive = counts(left.crossJoin(right).where(levenshtein($"lw", $"rw") <= 1))
    assert(blocked == naive)
    assert(naive.values.exists(_ > 1), "fixture must exercise multiplicity > 1")
  }

  test("del1 neighborhood is the string plus its distinct single deletions") {
    val out = Seq("abca").toDF("s")
      .select(FuzzyJoin.del1($"s").as("n")).as[Seq[String]].head().toSet
    assert(out == Set("abca", "bca", "aca", "aba", "abc"))
  }
}
