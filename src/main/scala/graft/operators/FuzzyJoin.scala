package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string matching (record linkage / entity resolution) as a
  * blocked equi-join — never a cross join.
  *
  * Blocking uses the symmetric-deletion trick: two strings are within
  * Levenshtein distance 1 **iff** their deletion-1 neighborhoods
  * ({s} ∪ every single-character deletion of s) intersect — substitution
  * at p meets at "both deleted p", pure deletion/insertion meets at the
  * shorter string itself. So an equi-join on exploded neighborhood keys
  * finds EVERY candidate (lossless, unlike prefix/length blocking, which
  * degenerates when keys share long prefixes), and an exact
  * `levenshtein` check on the deduplicated candidates removes the few
  * pairs that met on a key but still differ by more than one edit.
  *
  * Scale: |s|+1 posting rows per string, keys are near-full strings so
  * the block-key space is as spread as the data itself; candidate
  * verification touches only pairs that share a key. This is the same
  * inverted-index shape as the n-gram jaccard pair join (Dedup.scala) —
  * the right 100 TB plan for fuzzy matching.
  */
object FuzzyJoin {

  /** Distinct deletion-1 neighborhood of a string column. The empty
    * string is its own whole neighborhood (spark's sequence(1, 0) would
    * count DOWN, not produce an empty list).
    */
  def del1(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(
      array_distinct(concat(array(s),
        transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i))))))

  /** All (left, right) row pairs with levenshtein(leftCol, rightCol) <= 1.
    * Column names of the two sides must be disjoint.
    *
    * Candidate pairs meeting on several shared block keys are deduped BY
    * CONSTRUCTION, not `distinct()` (which would also collapse
    * legitimately duplicate input rows): a pair is kept only in the
    * lexicographically smallest element of the two neighborhoods'
    * intersection, so output multiplicity is exactly that of the naive
    * `levenshtein <= 1` join — the same move as plans.FuzzyJoinRewrite.
    */
  def join1(left: DataFrame, right: DataFrame, leftCol: String, rightCol: String): DataFrame = {
    val lk = left.select(col("*"), explode(del1(col(leftCol))).as("graft_blk"))
    val rk = right.select(col("*"), explode(del1(col(rightCol))).as("graft_blk"))
    lk.join(rk, "graft_blk")
      .where(col("graft_blk") ===
        array_min(array_intersect(del1(col(leftCol)), del1(col(rightCol)))))
      .drop("graft_blk")
      .where(levenshtein(col(leftCol), col(rightCol)) <= 1)
  }
}
