package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4.3: "salt if a
  * user_id is hot" — the audience self-join J7 concentrates on heavy
  * listeners at 100 TB).
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; the
  * explicit salt is for the cases AQE can't fix (aggregation skew, and
  * broadcast-ineligible joins where one key dominates a partition).
  */
object Skew {

  /** Salted two-phase aggregation: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. `partials` must be re-aggregable
    * (sum/count/min/max — not countDistinct). Spreads a hot group over
    * `buckets` reducers in phase one.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int)(
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join of a skewed LEFT side against a smaller-but-not-
    * broadcastable RIGHT side: left rows get a random salt in
    * [0, buckets), the right side is replicated once per salt value, and
    * the join key becomes (key, salt) — a hot key now lands on `buckets`
    * different reducers.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
