package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** CHECK constraints: table-level predicates every write must satisfy
  * — the snapshot form of load-time validation (the reference trusts
  * BigQuery schema checks on every load; Expectations covers batch
  * scoring, this covers REFUSAL). Pins: violating batches refuse
  * before any file lands, NULL passes (SQL CHECK semantics), existing
  * data is validated at ADD time, constraints ride the delta log,
  * DML's update tiers enforce, and rename/drop of a referenced column
  * refuses instead of silently breaking the predicate text.
  */
class SnapshotConstraintSpec extends SparkSpec {
  import spark.implicits._

  test("writes refuse violating batches before any file lands; NULL passes") {
    val dir = Files.createTempDirectory("graft-constraint").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    Snapshot.addConstraint(spark, t, "x_pos", "x > 0")
    val filesBefore = Snapshot.latestManifest(spark, t).get.files
    // violating append refuses atomically
    val ex = intercept[IllegalArgumentException] {
      Snapshot.append(spark, t, Seq((3L, -1.0)).toDF("id", "x"))
    }
    assert(ex.getMessage.contains("x_pos"))
    assert(Snapshot.latestManifest(spark, t).get.files == filesBefore,
      "refused batch must land no files in the manifest")
    // valid and NULL rows pass (SQL CHECK: only FALSE violates)
    Snapshot.append(spark, t,
      Seq((3L, Some(3.0)), (4L, None)).toDF("id", "x"))
    assert(Snapshot.read(spark, t).count() == 4)
    // overwrite enforces too
    intercept[IllegalArgumentException] {
      Snapshot.overwrite(spark, t, Seq((9L, 0.0)).toDF("id", "x"))
    }
    // dropping the constraint opens the gate
    Snapshot.dropConstraint(spark, t, "x_pos")
    Snapshot.append(spark, t, Seq((5L, -5.0)).toDF("id", "x"))
    assert(Snapshot.read(spark, t).count() == 5)
  }

  test("ADD validates existing data; UPDATE tiers enforce; delta log carries the set") {
    val dir = Files.createTempDirectory("graft-constraint-dml").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      (1L to 10L).map(i => i -> i * 10.0).toDF("id", "x").repartition(1))
    // a constraint the data already violates refuses at ADD
    intercept[IllegalArgumentException](
      Snapshot.addConstraint(spark, t, "x_small", "x < 50"))
    Snapshot.addConstraint(spark, t, "x_pos", "x > 0")
    // the DV-tier UPDATE (1 of 10 rows) validates its appended rows
    intercept[IllegalArgumentException] {
      Snapshot.update(spark, t, col("id") === 3L, Map("x" -> lit(-1.0)))
    }
    // rewrite-tier UPDATE (every row) validates too
    intercept[IllegalArgumentException] {
      Snapshot.update(spark, t, lit(true), Map("x" -> (col("x") * -1)))
    }
    // a legal update flows
    Snapshot.update(spark, t, col("id") === 3L, Map("x" -> lit(7.0)))
    assert(Snapshot.readWhere(spark, t, col("id") === 3L)
      .select("x").as[Double].head() == 7.0)
    // the constraint survives the delta log across many commits
    (1 to 10).foreach(i => Snapshot.append(spark, t,
      Seq((100L + i) -> 1.0).toDF("id", "x").repartition(1)))
    assert(Snapshot.latestManifest(spark, t).get.constraints == Map("x_pos" -> "x > 0"))
  }

  test("a constraint added mid-append revalidates on rebase; mid-rewrite it conflicts") {
    val dir = Files.createTempDirectory("graft-constraint-race").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, 10.0)).toDF("id", "x").repartition(1))
    // inject a concurrent ADD CONSTRAINT after the append's txn files
    // land but before its commit — the rebase must revalidate the batch
    @volatile var fired = false
    Snapshot.faultHook = { label =>
      if (label == "data-files-written" && !fired) {
        fired = true
        Snapshot.addConstraint(spark, t, "x_pos", "x > 0")
      }
    }
    try {
      val ex = intercept[IllegalArgumentException] {
        Snapshot.append(spark, t, Seq((2L, -2.0)).toDF("id", "x").repartition(1))
      }
      assert(ex.getMessage.contains("x_pos"),
        s"rebase must revalidate against the new constraint, got: ${ex.getMessage}")
    } finally Snapshot.faultHook = _ => ()
    assert(Snapshot.read(spark, t).count() == 1, "violating batch must not be live")
    // and a VALID batch under the same race lands fine
    fired = false
    Snapshot.dropConstraint(spark, t, "x_pos")
    Snapshot.faultHook = { label =>
      if (label == "data-files-written" && !fired) {
        fired = true
        Snapshot.addConstraint(spark, t, "x_pos2", "x > 0")
      }
    }
    try Snapshot.append(spark, t, Seq((3L, 3.0)).toDF("id", "x").repartition(1))
    finally Snapshot.faultHook = _ => ()
    assert(Snapshot.read(spark, t).count() == 2)
    // a file-precise rewrite (compact) derived before the constraint
    // change refuses instead of committing rows validated against a
    // stale set
    Snapshot.append(spark, t, Seq((4L, 4.0)).toDF("id", "x").repartition(1))
    Snapshot.append(spark, t, Seq((5L, 5.0)).toDF("id", "x").repartition(1))
    fired = false
    Snapshot.faultHook = { label =>
      if (label == "data-files-written" && !fired) {
        fired = true
        Snapshot.addConstraint(spark, t, "x_cap", "x < 100")
      }
    }
    try {
      intercept[Snapshot.CommitConflictException] {
        Snapshot.compact(spark, t, minFiles = 2)
      }
    } finally Snapshot.faultHook = _ => ()
  }

  test("SQL front end: ADD/DROP CONSTRAINT CHECK; referenced-column DDL refuses") {
    val dir = Files.createTempDirectory("graft-constraint-sql").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, 5.0, "a")).toDF("id", "x", "v"))
    val reg = Map("tc" -> t)
    Snapshot.sql(spark, "ALTER TABLE tc ADD CONSTRAINT x_pos CHECK (x > 0)", reg)
    assert(Snapshot.latestManifest(spark, t).get.constraints.keySet == Set("x_pos"))
    intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "INSERT INTO tc SELECT 2 AS id, -1.0 AS x, 'b' AS v", reg)
    }
    // a rename or drop of the referenced column would break the text
    intercept[IllegalArgumentException](Snapshot.renameColumn(spark, t, "x", "y"))
    intercept[IllegalArgumentException](Snapshot.dropColumn(spark, t, "x"))
    // unreferenced columns still rename freely
    Snapshot.renameColumn(spark, t, "v", "w")
    Snapshot.sql(spark, "ALTER TABLE tc DROP CONSTRAINT x_pos", reg)
    Snapshot.sql(spark, "INSERT INTO tc SELECT 2 AS id, -1.0 AS x, 'b' AS w", reg)
    assert(Snapshot.read(spark, t).count() == 2)
    // duplicate add and unknown drop refuse; IF EXISTS is a no-op
    Snapshot.sql(spark, "ALTER TABLE tc ADD CONSTRAINT id_pos CHECK (id > 0)", reg)
    intercept[IllegalArgumentException](
      Snapshot.sql(spark, "ALTER TABLE tc ADD CONSTRAINT id_pos CHECK (id > 1)", reg))
    intercept[IllegalArgumentException](
      Snapshot.sql(spark, "ALTER TABLE tc DROP CONSTRAINT nope", reg))
    Snapshot.sql(spark, "ALTER TABLE tc DROP CONSTRAINT IF EXISTS nope", reg)
  }

  test("a user CHECK named not_null_<col> is not shadowed by the implicit NOT NULL") {
    // the implicit IS NOT NULL checks for non-nullable fields merge
    // into the validation set under a RESERVED key prefix — a user
    // constraint literally named not_null_id must keep its own
    // predicate on every write
    val dir = Files.createTempDirectory("graft-constraint-nn").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      spark.range(3).select(col("id"), (col("id") * 10).as("v")),
      constraints = Map("not_null_id" -> "id > -100"),
      keepNullability = true) // id from range() is non-nullable: both checks active
    // a batch violating the USER predicate (but not null) refuses with
    // the user's constraint named — before the fix the implicit check
    // silently replaced it and this batch landed
    val e = intercept[IllegalArgumentException] {
      Snapshot.append(spark, t,
        spark.range(1).select((col("id") - 500).as("id"), col("id").as("v")))
    }
    assert(e.getMessage.contains("not_null_id") && e.getMessage.contains("id > -100"),
      e.getMessage)
    // engine-reserved names refuse at declaration time on both routes
    intercept[IllegalArgumentException](
      Snapshot.addConstraint(spark, t, "__graft_not_null_v", "v > 0"))
    intercept[IllegalArgumentException](
      Snapshot.create(spark, s"$dir/t2", spark.range(1).toDF("id"),
        constraints = Map("__graft_x" -> "id > 0")))
  }
}
