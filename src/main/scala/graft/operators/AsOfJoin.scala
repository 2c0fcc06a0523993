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
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    // Timestamp and payload travel as ONE struct through ONE
    // last(ignoreNulls) window, so both always come from the same matched
    // right row — a NULL payload value on the matched row stays NULL
    // instead of falling back to an older row's value (DuckDB ASOF
    // semantics).
    val carryType = StructType(
      StructField("__rts", right.schema(rightTs).dataType) +:
        payload.map(c => right.schema(c)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .select(leftCols.map(col) ++
        Seq(col("__ts"), col("__tag"), lit(null).cast(carryType).as("__carry")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .select(leftCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__tag"),
          struct(col(rightTs).as("__rts") +: payload.map(col): _*).as("__carry")): _*)

    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__c", last(col("__carry"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        (col("__c.__rts").as("asof_ts") +:
          payload.map(c => col(s"__c.$c").as(s"asof_$c"))): _*)
  }
}
