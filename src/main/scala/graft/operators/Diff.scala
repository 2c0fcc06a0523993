package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data capture between two versions of a keyed
  * table: which rows were added, removed, or changed — and WHICH
  * columns changed — in one full-outer join on the key. The reference
  * pays BigQuery to answer this implicitly (MERGE … WHEN MATCHED /
  * NOT MATCHED); as a standalone operator it is the audit face of the
  * same comparison: the thing you run BEFORE trusting an incremental
  * load, and the input to a minimal-update MERGE (ship only `changed`).
  *
  * Scale: one shuffle on the key (or none, if both snapshots are
  * bucketed on it — `Layout.bucketedWrite`); comparisons are
  * null-safe (`<=>`) codegen'd expressions; output is diff-sized, not
  * table-sized, because identical rows are dropped before anything
  * else happens to them.
  */
object Diff {

  /** Diff `b` (new) against `a` (old) on `keys`, comparing `cols`.
    * Returns keys ++ (status, changed_cols) ++ old_/new_ pairs for each
    * compared column, one row per non-identical key, status in
    * {added, removed, changed}. Presence is tracked with explicit
    * markers, so all-null compared columns never masquerade as a
    * missing row.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
                   cols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && cols.nonEmpty, "keys and compare columns required")
    val aSel = a.select((keys ++ cols).map(col): _*)
      .withColumnsRenamed(cols.map(c => c -> s"__a_$c").toMap)
      .withColumn("__in_a", lit(true))
    val bSel = b.select((keys ++ cols).map(col): _*)
      .withColumnsRenamed(cols.map(c => c -> s"__b_$c").toMap)
      .withColumn("__in_b", lit(true))
    val differs: Column = cols.map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
      .reduce(_ || _)
    val status = when(col("__in_b").isNull, "removed")
      .when(col("__in_a").isNull, "added")
      .when(differs, "changed")
    val changedCols = concat_ws(",",
      cols.map(c => when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))): _*)
    aSel.join(bSel, keys, "full_outer")
      .withColumn("status", status)
      .where(col("status").isNotNull)
      .select(keys.map(col) ++ Seq(
        col("status"),
        when(col("status") === "changed", changedCols).as("changed_cols")) ++
        cols.flatMap(c => Seq(col(s"__a_$c").as(s"old_$c"), col(s"__b_$c").as(s"new_$c"))): _*)
  }
}
