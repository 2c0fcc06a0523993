package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** RESTORE (metadata-only undo, history append-only), DESCRIBE DETAIL
  * (one-row manifest math), and partition-scoped OPTIMIZE … WHERE
  * (maintenance touches yesterday's partition, never the history).
  */
class SnapshotRestoreSpec extends SparkSpec {
  import spark.implicits._

  test("restore makes an old version the new latest; history stays append-only") {
    val dir = Files.createTempDirectory("graft-restore").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1))
    Snapshot.append(spark, t, Seq((3L, "c")).toDF("id", "v").repartition(1))
    val good = Snapshot.latestManifest(spark, t).get.version
    // the "bad" commits: a wrong delete and a wrong append
    Snapshot.delete(spark, t, col("id") === 1L)
    Snapshot.append(spark, t, Seq((99L, "oops")).toDF("id", "v").repartition(1))
    val bad = Snapshot.latestManifest(spark, t).get.version

    val restored = Snapshot.restore(spark, t, good)
    assert(restored == bad + 1, "restore is a FORWARD commit")
    assert(Snapshot.read(spark, t).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // the bad versions stay time-travelable (append-only history)
    assert(Snapshot.readVersion(spark, t, bad).as[(Long, String)].collect().toSet ==
      Set(2L -> "b", 3L -> "c", 99L -> "oops"))
    // restoring to the current version is a no-op
    assert(Snapshot.restore(spark, t, restored) == restored)
    // SQL form, via timestamp routing too
    Snapshot.sql(spark, s"RESTORE TABLE tr TO VERSION AS OF $bad", Map("tr" -> t))
    assert(Snapshot.read(spark, t).as[(Long, String)].collect().toSet ==
      Set(2L -> "b", 3L -> "c", 99L -> "oops"))
  }

  test("restore refuses when vacuum reclaimed the target's files") {
    val dir = Files.createTempDirectory("graft-restore-vac").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a")).toDF("id", "v").repartition(1))
    val v1 = Snapshot.latestManifest(spark, t).get.version
    Snapshot.overwrite(spark, t, Seq((2L, "b")).toDF("id", "v").repartition(1))
    Snapshot.append(spark, t, Seq((3L, "c")).toDF("id", "v").repartition(1))
    Snapshot.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    val ex = intercept[IllegalArgumentException](Snapshot.restore(spark, t, v1))
    assert(ex.getMessage.contains("vacuum"))
  }

  test("restore keeps exactly-once sink watermarks moving forward") {
    val dir = Files.createTempDirectory("graft-restore-wm").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a")).toDF("id", "v").repartition(1))
    val good = Snapshot.latestManifest(spark, t).get.version
    assert(Snapshot.appendBatch(spark, t, Seq((2L, "b")).toDF("id", "v"), "app", 7L))
    Snapshot.restore(spark, t, good)
    // the redelivered batch must still be recognized as a duplicate
    assert(!Snapshot.appendBatch(spark, t, Seq((2L, "b")).toDF("id", "v"), "app", 7L))
    assert(Snapshot.read(spark, t).count() == 1)
  }

  test("DESCRIBE DETAIL reports manifest math, DV-exact row counts included") {
    val dir = Files.createTempDirectory("graft-detail").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      (1L to 10L).map(i => i -> s"r$i").toDF("id", "v").repartition(1), Nil)
    Snapshot.delete(spark, t, col("id") === 2L) // DV tier (10%)
    Snapshot.addConstraint(spark, t, "id_pos", "id > 0")
    Snapshot.renameColumn(spark, t, "v", "w")
    val d = Snapshot.sqlQuery(spark, "DESCRIBE DETAIL td", Map("td" -> t)).head()
    assert(d.getAs[Long]("num_files") == 1L)
    assert(d.getAs[Long]("num_rows") == 9L, "row count must subtract DV positions")
    assert(d.getAs[Long]("num_deletion_vectors") == 1L)
    assert(d.getAs[Long]("deletion_vector_rows") == 1L)
    assert(d.getAs[String]("column_mapping") == "w->v")
    assert(d.getAs[String]("constraints") == "id_pos: id > 0")
  }

  test("OPTIMIZE … WHERE compacts only the matching partitions") {
    val dir = Files.createTempDirectory("graft-optwhere").toString
    val t = s"$dir/t"
    def batch(p: String, ids: Seq[Long]) =
      ids.map(i => (i, s"r$i", p)).toDF("id", "v", "p").repartition(1)
    Snapshot.create(spark, t, batch("a", Seq(1L)), Seq("p"))
    Snapshot.append(spark, t, batch("a", Seq(2L)))
    Snapshot.append(spark, t, batch("b", Seq(3L)))
    Snapshot.append(spark, t, batch("b", Seq(4L)))
    // both partitions are fragmented (2 files each, minFiles=2)
    val touched = Snapshot.sql(spark,
      "OPTIMIZE topt WHERE p = 'a'", Map("topt" -> t))
    val m = Snapshot.latestManifest(spark, t).get
    val byPart = m.files.groupBy(_.split('/').find(_.startsWith("p=")).getOrElse(""))
    // default minFiles=4: scoped compact with default marks nothing —
    // run with the engine API at minFiles=2 for partition a only
    Snapshot.compact(spark, t, minFiles = 2, where = Some(col("p") === "a"))
    val m2 = Snapshot.latestManifest(spark, t).get
    val aFiles = m2.files.filter(_.contains("p=a"))
    val bFiles = m2.files.filter(_.contains("p=b"))
    assert(aFiles.size == 1, s"partition a should compact to one file: $aFiles")
    assert(bFiles.size == 2, s"partition b must be untouched: $bFiles")
    assert(Snapshot.read(spark, t).as[(Long, String, String)].collect().toSet ==
      Set((1L, "r1", "a"), (2L, "r2", "a"), (3L, "r3", "b"), (4L, "r4", "b")))
    // a WHERE referencing a data column refuses
    intercept[IllegalArgumentException](
      Snapshot.compact(spark, t, minFiles = 2, where = Some(col("id") === 1L)))
  }
}
