package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import graft.operators.Snapshot

/** Column mapping: RENAME / DROP COLUMN as metadata-only commits over
  * immutable files (physical names never change; the manifest carries
  * the logical relabeling). Pins: reads/DML/pruning speak the new
  * names, time travel keeps the old ones, a dropped column can never
  * resurrect into a re-added namesake, appends after a rename write
  * the stable physical name, and a full overwrite resets the map so
  * the SQL source returns to the native scan.
  */
class SnapshotColumnMapSpec extends SparkSpec {
  import spark.implicits._

  test("rename is metadata-only: reads, filters, stats pruning and appends follow") {
    val dir = Files.createTempDirectory("graft-colmap").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1))
    Snapshot.append(spark, t, Seq((3L, "c"), (4L, "d")).toDF("id", "v").repartition(1))
    val files = Snapshot.latestManifest(spark, t).get.files
    val preVersion = Snapshot.latestManifest(spark, t).get.version

    Snapshot.renameColumn(spark, t, "v", "w")
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.files == files, "rename must move no data")
    assert(m.colMap == Map("w" -> "v"))
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("id", "w"))
    assert(Snapshot.read(spark, t).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    // filter by the NEW name; stats (keyed physical) still prune
    assert(Snapshot.readWhere(spark, t, col("w") === "c")
      .as[(Long, String)].collect().toSeq == Seq(3L -> "c"))
    val (kept, total) = Snapshot.pruneFiles(spark, t, col("id") >= 3L)
    assert(total == 2 && kept.size == 1, s"stats pruning broke under mapping: $kept/$total")
    // time travel: the pre-rename version keeps its old schema
    assert(Snapshot.readVersion(spark, t, preVersion).columns.toSeq == Seq("id", "v"))
    // appends use the new logical name but store the stable physical
    Snapshot.append(spark, t, Seq((5L, "e")).toDF("id", "w").repartition(1))
    assert(Snapshot.read(spark, t).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
    // rename BACK to the physical name drops the mapping entirely
    Snapshot.renameColumn(spark, t, "w", "v")
    assert(Snapshot.latestManifest(spark, t).get.colMap.isEmpty)
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("id", "v"))
  }

  test("DML speaks the renamed name; DVs and rewrites keep physical files consistent") {
    val dir = Files.createTempDirectory("graft-colmap-dml").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      (1L to 10L).map(i => i -> s"r$i").toDF("id", "v").repartition(1))
    Snapshot.renameColumn(spark, t, "v", "label")
    // point delete takes the DV tier (10% of rows), predicate on the new name
    Snapshot.delete(spark, t, col("label") === "r2")
    assert(Snapshot.latestManifest(spark, t).get.dvs.nonEmpty)
    // update through the new name rewrites/appends under physical names
    Snapshot.update(spark, t, col("id") === 3L, Map("label" -> lit("R3")))
    assert(Snapshot.read(spark, t).as[(Long, String)].collect().toSet ==
      ((1L to 10L).filter(i => i != 2 && i != 3).map(i => i -> s"r$i").toSet + (3L -> "R3")))
  }

  test("a dropped column never resurrects into a re-added namesake") {
    val dir = Files.createTempDirectory("graft-colmap-drop").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      Seq((1L, "x1", 10L), (2L, "x2", 20L)).toDF("id", "v", "score").repartition(1))
    Snapshot.dropColumn(spark, t, "score")
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("id", "v"))
    assert(Snapshot.latestManifest(spark, t).get.retired == Seq("score"))
    // re-add the same logical name: fresh physical, old values invisible
    Snapshot.addColumns(spark, t, Seq(StructField("score", LongType)))
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.colMap.contains("score") && m.colMap("score") != "score",
      s"re-added column must mint a fresh physical name, got ${m.colMap}")
    assert(Snapshot.read(spark, t).select("score").as[Option[Long]].collect().toSeq ==
      Seq(None, None), "old files leaked dropped values into the new column")
    // new data lands in the new column; old rows stay null
    Snapshot.append(spark, t, Seq((3L, "x3", 30L)).toDF("id", "v", "score").repartition(1))
    assert(Snapshot.read(spark, t).as[(Long, String, Option[Long])].collect().toSet ==
      Set((1L, "x1", None), (2L, "x2", None), (3L, "x3", Some(30L))))
    // the data-ful evolution path refuses the colliding name outright
    Snapshot.dropColumn(spark, t, "v")
    intercept[IllegalArgumentException] {
      Snapshot.append(spark, t,
        Seq((4L, 40L, "boom")).toDF("id", "score", "v"), mergeSchema = true)
    }
  }

  test("SQL front end: RENAME COLUMN / DROP COLUMN; SELECT through the mapped source") {
    val dir = Files.createTempDirectory("graft-colmap-sql").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "v", "x"))
    val reg = Map("tcm" -> t)
    Snapshot.sql(spark, "ALTER TABLE tcm RENAME COLUMN v TO w", reg)
    Snapshot.sql(spark, "ALTER TABLE tcm DROP COLUMN x", reg)
    val got = Snapshot.sqlQuery(spark, "SELECT id, w FROM tcm WHERE w = 'b'", reg)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(2L -> "b"))
    assert(Snapshot.sqlQuery(spark, "SELECT * FROM tcm", reg).columns.toSeq == Seq("id", "w"))
    // DROP COLUMN IF EXISTS on a missing column is a no-op
    Snapshot.sql(spark, "ALTER TABLE tcm DROP COLUMN IF EXISTS nope", reg)
    intercept[IllegalArgumentException](
      Snapshot.sql(spark, "ALTER TABLE tcm DROP COLUMN nope", reg))
  }

  test("bloom sidecars survive a rename: probes translate to the physical name") {
    val dir = Files.createTempDirectory("graft-colmap-bloom").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a"), (101L, "b")).toDF("id", "v").repartition(1))
    Snapshot.append(spark, t, Seq((2L, "c"), (102L, "d")).toDF("id", "v").repartition(1))
    Snapshot.bloomIndex(spark, t, Seq("id"))
    Snapshot.renameColumn(spark, t, "id", "doc_id")
    val (kept, total) = Snapshot.pruneFiles(spark, t, col("doc_id") === 102L)
    assert(total == 2 && kept.size == 1, s"bloom probe lost across rename: $kept/$total")
    assert(Snapshot.readWhere(spark, t, col("doc_id") === 102L)
      .as[(Long, String)].collect().toSeq == Seq(102L -> "d"))
    // indexing by the NEW name is recognized as already-current
    val v = Snapshot.latestManifest(spark, t).get.version
    assert(Snapshot.bloomIndex(spark, t, Seq("doc_id")) == v)
  }

  test("refusals: partition columns, clashes, last column") {
    val dir = Files.createTempDirectory("graft-colmap-refuse").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a", "p1")).toDF("id", "v", "p"), Seq("p"))
    intercept[IllegalArgumentException](Snapshot.renameColumn(spark, t, "p", "q"))
    intercept[IllegalArgumentException](Snapshot.renameColumn(spark, t, "v", "id"))
    intercept[IllegalArgumentException](Snapshot.renameColumn(spark, t, "nope", "x"))
    intercept[IllegalArgumentException](Snapshot.dropColumn(spark, t, "p"))
    val t2 = s"$dir/t2"
    Snapshot.create(spark, t2, Seq(Tuple1(1L)).toDF("only"))
    intercept[IllegalArgumentException](Snapshot.dropColumn(spark, t2, "only"))
  }

  test("type widening is metadata-only; narrowings and cross-family casts refuse") {
    val dir = Files.createTempDirectory("graft-colmap-widen").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      Seq((1, 1.5f, "a"), (2, 2.5f, "b")).toDF("n", "x", "v").repartition(1))
    val files = Snapshot.latestManifest(spark, t).get.files
    Snapshot.sql(spark, "ALTER TABLE tw ALTER COLUMN n TYPE BIGINT", Map("tw" -> t))
    Snapshot.widenColumnType(spark, t, "x", org.apache.spark.sql.types.DoubleType)
    assert(Snapshot.latestManifest(spark, t).get.files == files, "widening must move no data")
    // engine read: old int32/float files answer as long/double exactly
    assert(Snapshot.read(spark, t).schema.map(_.dataType.simpleString).toSeq ==
      Seq("bigint", "double", "string"))
    assert(Snapshot.read(spark, t).as[(Long, Double, String)].collect().toSet ==
      Set((1L, 1.5, "a"), (2L, 2.5, "b")))
    // the native SQL-source path promotes in the parquet reader itself
    assert(Snapshot.sqlQuery(spark, "SELECT n, x FROM tw WHERE n = 2", Map("tw" -> t))
      .as[(Long, Double)].collect().toSeq == Seq(2L -> 2.5))
    // stats canonicals decode under the wider type: pruning still exact
    Snapshot.append(spark, t, Seq((10L, 10.5, "c")).toDF("n", "x", "v").repartition(1))
    val (kept, total) = Snapshot.pruneFiles(spark, t, col("n") >= 10L)
    assert(total == 2 && kept.size == 1, s"stats pruning broke after widening: $kept/$total")
    // refusals: narrowing, cross-family, unknown
    intercept[IllegalArgumentException](
      Snapshot.widenColumnType(spark, t, "n", org.apache.spark.sql.types.IntegerType))
    intercept[IllegalArgumentException](
      Snapshot.widenColumnType(spark, t, "v", org.apache.spark.sql.types.LongType))
    intercept[IllegalArgumentException](
      Snapshot.widenColumnType(spark, t, "nope", org.apache.spark.sql.types.LongType))
  }

  test("overwrite resets the map: physical == logical again, native SQL scan returns") {
    val dir = Files.createTempDirectory("graft-colmap-reset").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t, Seq((1L, "a")).toDF("id", "v"))
    Snapshot.renameColumn(spark, t, "v", "w")
    assert(Snapshot.latestManifest(spark, t).get.colMap.nonEmpty)
    Snapshot.overwrite(spark, t, Snapshot.read(spark, t))
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.colMap.isEmpty && m.retired.isEmpty)
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("id", "w"))
    // a mapped manifest round-trips the delta log; after ten more
    // commits the checkpoint replays it identically
    Snapshot.renameColumn(spark, t, "w", "u")
    (1 to 10).foreach(i => Snapshot.append(spark, t,
      Seq((100L + i, s"z$i")).toDF("id", "u").repartition(1)))
    val mm = Snapshot.latestManifest(spark, t).get
    assert(mm.colMap == Map("u" -> "w"))
    assert(Snapshot.read(spark, t).as[(Long, String)].collect().toSet ==
      (Set(1L -> "a") ++ (1 to 10).map(i => (100L + i) -> s"z$i")))
  }
}
