package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: attach to each left row the right row with the greatest
  * `rightTs <= leftTs` for the same key (inclusive — DuckDB ASOF
  * semantics).
  *
  * Physical shape: ONE shuffle on the key. Both sides union into a
  * single (key, ts)-sorted stream (right rows sort before left rows at
  * equal ts), and a last-non-null window carries the most recent right
  * payload forward onto every left row. This is the scale-correct plan —
  * a per-row range join would either nested-loop or re-shuffle per
  * bucket; here Spark sorts each key partition once.
  *
  * `right` must be unique per (key, ts) — pre-aggregate if needed
  * (duplicate right timestamps make "the" as-of row ambiguous in any
  * engine).
  */
object AsOfJoin {

  def latestPriorTo(left: DataFrame, right: DataFrame,
                    key: String, leftTs: String, rightTs: String,
                    payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .select((leftCols.map(col) :+ col("__ts") :+ col("__tag")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) :+
        lit(null).cast("timestamp").as("__rts"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .select(leftCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__tag")) ++
        payload.map(c => col(c).as(s"__p_$c")) :+ col(rightTs).as("__rts"): _*)

    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select((leftCols.map(col) :+ col("__tag") :+
        last(col("__rts"), ignoreNulls = true).over(w).as("asof_ts")) ++
        payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    carried.where(col("__tag") === 1).drop("__tag")
  }
}
