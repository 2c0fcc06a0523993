package graft

import org.apache.spark.sql.functions._
import graft.operators.{Diff, Writers}

/** The CDC loop closed: snapshotDiff's output is sufficient to carry an
  * old snapshot to the new one with diff-sized work — upsert
  * added+changed through the K3 merge, anti-join the removed keys —
  * which is the minimal-update incremental load the operator's scaladoc
  * promises. Also pins that an all-null compare column is a 'changed'
  * transition, not a phantom add/remove.
  */
class DiffApplySpec extends SparkSpec {
  import spark.implicits._

  test("diff -> merge upserts + anti-join deletes == new snapshot") {
    val a = Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z"), (5L, 50.0, "w"))
      .toDF("id", "v", "s")
    val b = Seq((1L, 10.0, "x"), (2L, 21.0, "y"), (4L, 40.0, "q"), (5L, 50.0, "W"))
      .toDF("id", "v", "s")

    val d = Diff.snapshotDiff(a, b, Seq("id"), Seq("v", "s"))
    // the diff is diff-sized: identical row 1 never appears
    assert(d.where(col("id") === 1L).isEmpty)

    val upserts = d.where(col("status").isin("added", "changed"))
      .select(col("id"), col("new_v").as("v"), col("new_s").as("s"))
    val deletes = d.where(col("status") === "removed").select("id")
    val applied = Writers.mergeById(a, upserts, "id")
      .join(deletes, Seq("id"), "left_anti")

    assert(applied.as[(Long, Double, String)].collect().toSet ==
      b.as[(Long, Double, String)].collect().toSet)
  }

  test("null transitions are changes, not phantom adds/removes") {
    val a = Seq((1L, Some(1.0)), (2L, None: Option[Double]), (3L, None: Option[Double]))
      .toDF("id", "v")
    val b = Seq((1L, None: Option[Double]), (2L, Some(2.0)), (3L, None: Option[Double]))
      .toDF("id", "v")
    val d = Diff.snapshotDiff(a, b, Seq("id"), Seq("v"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "changed", 2L -> "changed")) // id 3 (null == null) is absent
  }
}
