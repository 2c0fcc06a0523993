package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.FuzzyJoinRewrite

/** The levenshtein-join auto-rewrite: a raw `levenshtein(a,b) <= 1`
  * join becomes the symmetric-deletion blocked equi-join, result
  * identical INCLUDING duplicate input rows (dedup is by construction,
  * not Distinct), and the physical plan gains a real shuffle key.
  */
class FuzzyRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val enabled: Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuzzyJoinRewrite(spark)
  }

  private def sideDf(words: Seq[String], prefix: String, path: String): DataFrame = {
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF(s"${prefix}id", s"${prefix}w")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  test("rewrite fires above the broadcast threshold and matches the naive join") {
    enabled
    val dir = Files.createTempDirectory("graft-fzrw").toString
    // duplicate rows on purpose: "spark" appears twice on the left
    val leftWords = Seq("spark", "spork", "sprk", "shark", "park", "a", "", "spark")
    val rightWords = Seq("spark", "stark", "sparks", "par", "b", "")
    val l = sideDf(leftWords, "l", s"$dir/l")
    val r = sideDf(rightWords, "r", s"$dir/r")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = l.join(r, levenshtein($"lw", $"rw") <= 1)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("__graft_blk"), s"expected block keys in plan:\n$plan")

      val got = joined.select("lid", "rid").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      val naive = l.join(r, levenshtein($"lw", $"rw") <= 1)
        .select("lid", "rid").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      // multiset equality: the duplicate left row must yield TWO copies
      assert(got == naive)
      assert(got((0L, 0L)) == 1 && got((7L, 0L)) == 1) // both 'spark' copies
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("rewrite leaves broadcastable joins and equi-joins alone") {
    enabled
    val dir = Files.createTempDirectory("graft-fzrw2").toString
    val l = sideDf(Seq("spark", "spork"), "l", s"$dir/l")
    val r = sideDf(Seq("spark", "stark"), "r", s"$dir/r")
    // small sides: BNLJ is the right plan, rule must not fire
    val p1 = l.join(r, levenshtein($"lw", $"rw") <= 1)
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastNestedLoop") && !p1.contains("__graft_blk"))
    // an equi-conjunct already gives a shuffle key, rule must not fire
    val p2 = l.join(r, $"lw" === $"rw" && levenshtein($"lw", $"rw") <= 1)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("__graft_blk"))
  }
}
