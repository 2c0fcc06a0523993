package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Named TAGS: immutable, vacuum-protected version pins
  * ([[Snapshot.createTag]]) — the reproducible-dataset contract. A tag
  * resolves wherever a version does (`VERSION AS OF 'name'` on both
  * SQL routes, RESTORE, SHALLOW CLONE), and the tagged version's whole
  * state (manifest chain, data files, deletion vectors) survives every
  * vacuum retention rule until the tag is dropped.
  */
class TagSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-tag-wh").toString
    spark.conf.set("spark.sql.catalog.gt", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gt.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db")
    dir
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  private def mkTable(name: String): String = {
    val path = s"$warehouse/db/$name"
    sql(s"CREATE TABLE gt.db.$name (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    sql(s"INSERT INTO gt.db.$name SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id FROM range(100)")
    path
  }

  test("create, resolve through both routes, replace, drop") {
    val path = mkTable("t1")
    val v = Snapshot.latestVersion(spark, path).get
    Snapshot.createTag(spark, path, "run-2026.08", Some(v))
    // churn past the tag
    sql("INSERT INTO gt.db.t1 VALUES (1000, 'even', -1)")
    sql("DELETE FROM gt.db.t1 WHERE id % 10 = 0")

    // catalog route: VERSION AS OF 'tag' through the vanilla analyzer
    assert(sql("SELECT count(*) AS n FROM gt.db.t1 VERSION AS OF 'run-2026.08'")
      .as[Long].head() == 100L)
    // option route (and with it the registry route's time travel)
    val byOpt = spark.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", "run-2026.08").load(path)
    assert(byOpt.count() == 100L)
    // integer specs still resolve as plain versions
    assert(Snapshot.resolveVersionSpec(spark, path, s"$v") == v)

    // duplicate refuses; OR REPLACE re-points
    intercept[IllegalArgumentException] {
      Snapshot.createTag(spark, path, "run-2026.08")
    }
    val v2 = Snapshot.latestVersion(spark, path).get
    sql("ALTER TABLE gt.db.t1 CREATE OR REPLACE TAG `run-2026.08` AS OF VERSION " + v2)
    assert(Snapshot.resolveVersionSpec(spark, path, "run-2026.08") == v2)

    // DESCRIBE DETAIL surfaces the map; DROP TAG removes it
    assert(sql("DESCRIBE DETAIL gt.db.t1").select("tags").as[String].head()
      .contains(s"run-2026.08=v$v2"))
    sql("ALTER TABLE gt.db.t1 DROP TAG `run-2026.08`")
    intercept[IllegalArgumentException] {
      Snapshot.resolveVersionSpec(spark, path, "run-2026.08")
    }
    // unknown drop refuses without IF EXISTS, no-ops with it
    intercept[Exception] { sql("ALTER TABLE gt.db.t1 DROP TAG nope") }
    sql("ALTER TABLE gt.db.t1 DROP TAG IF EXISTS nope")
  }

  test("validation: numeric names, future versions, reclaimed versions refuse") {
    val path = mkTable("t2")
    intercept[IllegalArgumentException] { Snapshot.createTag(spark, path, "123") }
    intercept[IllegalArgumentException] { Snapshot.createTag(spark, path, "x y") }
    intercept[IllegalArgumentException] {
      Snapshot.createTag(spark, path, "future", Some(999L))
    }
    // a version vacuum already reclaimed cannot be pinned after the fact
    sql("INSERT INTO gt.db.t2 VALUES (200, 'even', 200)")
    sql("INSERT INTO gt.db.t2 VALUES (201, 'odd', 201)")
    Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    intercept[IllegalArgumentException] {
      Snapshot.createTag(spark, path, "gone", Some(1L))
    }
  }

  test("a tagged version survives vacuum as an island and reads back exactly") {
    val path = mkTable("t3")
    val taggedRows = Snapshot.read(spark, path).select("id", "p", "v")
      .as[(Long, String, Long)].collect().toSet
    sql("ALTER TABLE gt.db.t3 CREATE TAG pinned")
    val pinnedV = Snapshot.latestVersion(spark, path).get // tag commit itself
    val taggedV = Snapshot.resolveVersionSpec(spark, path, "pinned")
    // heavy churn: overwrite every partition twice, DV-delete, compact —
    // the tagged version's files all leave the live set
    (1 to 2).foreach { i =>
      sql(s"INSERT OVERWRITE gt.db.t3 SELECT id + ${i * 1000}, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id FROM range(50)")
    }
    sql("DELETE FROM gt.db.t3 WHERE id % 7 = 0")
    Snapshot.compact(spark, path, minFiles = 1)

    // retention that would reclaim everything but the latest
    Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    // untagged history is gone...
    intercept[Exception] { Snapshot.readVersion(spark, path, pinnedV).collect() }
    // ...but the tagged version still reads back bit-exactly, through
    // its island checkpoint (its delta chain crossed reclaimed versions)
    val back = sql("SELECT id, p, v FROM gt.db.t3 VERSION AS OF 'pinned'")
      .as[(Long, String, Long)].collect().toSet
    assert(back == taggedRows, "tagged version must survive vacuum bit-exactly")
    val m = Snapshot.manifest(spark, path, taggedV)
    assert(m.version == taggedV)

    // DROP TAG releases the pin: the next vacuum reclaims the island
    sql("ALTER TABLE gt.db.t3 DROP TAG pinned")
    Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    intercept[Exception] { Snapshot.readVersion(spark, path, taggedV).collect() }
    // the latest version still reads (no collateral damage)
    assert(Snapshot.read(spark, path).count() > 0)
  }

  test("vacuum publishes a floor; createTag and restore refuse below it") {
    val path = mkTable("t6")
    sql("INSERT INTO gt.db.t6 VALUES (300, 'even', 300)")
    sql("INSERT INTO gt.db.t6 VALUES (301, 'odd', 301)")
    sql("ALTER TABLE gt.db.t6 CREATE TAG island AS OF VERSION 2")
    val reclaimed = Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    assert(reclaimed.nonEmpty, "fixture: the vacuum must reclaim something")
    val m = Snapshot.latestManifest(spark, path).get
    val floor = m.properties("graft.vacuum.floor").toLong
    assert(floor > 2L, s"floor must sit above the reclaimed range, got $floor")
    assert(m.operation.startsWith("VACUUM floor"),
      "the floor must be committed through the protocol BEFORE deletion")
    // an untagged version below the floor may be mid-reclaim by a
    // concurrent vacuum: pinning or restoring it must refuse loudly...
    intercept[IllegalArgumentException] {
      Snapshot.createTag(spark, path, "late-pin", Some(1L))
    }
    intercept[IllegalArgumentException] { Snapshot.restore(spark, path, 1L) }
    // ...but the ALREADY-TAGGED island below the floor stays pinnable
    // (it is retained) and restorable
    Snapshot.createTag(spark, path, "island-alias", Some(2L))
    Snapshot.restore(spark, path, 2L)
    // v2 is the base 100-row insert (v1 = the empty CREATE)
    assert(Snapshot.read(spark, path).count() == 100L)
  }

  test("a tag racing the floor commit wins the version: vacuum retries and retains the island") {
    val path = mkTable("t7")
    sql("INSERT INTO gt.db.t7 VALUES (400, 'even', 400)") // v3
    // inject at the floor commit's staging point: a createTag pinning
    // v2 commits FIRST (wins the version), the floor publish conflicts,
    // and vacuum's retry must re-read the tag map and spare v2
    var fired = false
    Snapshot.faultHook = {
      case "manifest-staged" if !fired =>
        fired = true
        Snapshot.createTag(spark, path, "sniped", Some(2L))
      case _ => ()
    }
    try Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    finally Snapshot.faultHook = _ => ()
    assert(fired, "fixture: the injection must have run")
    assert(Snapshot.resolveVersionSpec(spark, path, "sniped") == 2L)
    assert(Snapshot.readVersion(spark, path, 2L).count() == 100L,
      "the raced tag's version must survive the vacuum that was mid-flight")
    // untagged v1 was still reclaimed
    intercept[Exception] { Snapshot.readVersion(spark, path, 1L).collect() }
  }

  test("a tag attempted inside the deletion window refuses instead of dangling") {
    val path = mkTable("t8")
    sql("INSERT INTO gt.db.t8 VALUES (500, 'even', 500)") // v3
    // inject AFTER the floor commit, BEFORE any deletion: the createTag
    // must see the floor and refuse — never pin a version mid-reclaim
    var refused = false
    Snapshot.faultHook = {
      case "vacuum-floor-committed" =>
        try Snapshot.createTag(spark, path, "late-pin", Some(2L))
        catch { case e: IllegalArgumentException =>
          refused = e.getMessage.contains("vacuum floor") }
      case _ => ()
    }
    try Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    finally Snapshot.faultHook = _ => ()
    assert(refused, "createTag inside the deletion window must refuse on the floor")
    assert(!Snapshot.latestManifest(spark, path).get.tags.contains("late-pin"))
  }

  test("a tagged version's deletion vectors survive vacuum with it") {
    val path = s"$warehouse/db/t4"
    // one big file so a point delete takes the DV tier
    Snapshot.create(spark, path,
      spark.range(2000).select(col("id"), lit("a").as("p"), col("id").as("v"))
        .repartition(1), partitionCols = Seq("p"))
    Snapshot.delete(spark, path, col("id") === 5L, dvMaxFraction = 0.5)
    val mDv = Snapshot.latestManifest(spark, path).get
    assert(mDv.dvs.nonEmpty, "fixture: the delete must land as a deletion vector")
    Snapshot.createTag(spark, path, "dvpin")
    // churn: full overwrite drops the DV'd file from the live set
    Snapshot.overwrite(spark, path,
      spark.range(10).select(col("id"), lit("a").as("p"), col("id").as("v")))
    Snapshot.vacuum(spark, path, keepVersions = 1, orphanGraceMs = 0L)
    val back = spark.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", "dvpin").load(path)
    assert(back.count() == 1999L, "tagged DV'd state must read back post-vacuum")
    assert(!back.select("id").as[Long].collect().contains(5L))
  }

  test("RESTORE and SHALLOW CLONE accept tags; restore preserves the tag map; a clone drops it") {
    val path = mkTable("t5")
    sql("ALTER TABLE gt.db.t5 CREATE TAG before-churn")
    val want = Snapshot.read(spark, path).select("id").as[Long].collect().toSet
    sql("DELETE FROM gt.db.t5 WHERE id < 50")
    sql("RESTORE TABLE gt.db.t5 TO VERSION AS OF 'before-churn'")
    assert(Snapshot.read(spark, path).select("id").as[Long].collect().toSet == want)
    // the restore commit carries the CURRENT tag map, not the target's
    assert(Snapshot.latestManifest(spark, path).get.tags.contains("before-churn"))

    sql("CREATE TABLE gt.db.t5c SHALLOW CLONE gt.db.t5 VERSION AS OF 'before-churn'")
    val clone = Snapshot.latestManifest(spark, s"$warehouse/db/t5c").get
    assert(clone.tags.isEmpty, "a clone's history starts fresh: source tags must not carry")
    assert(Snapshot.read(spark, s"$warehouse/db/t5c").count() == want.size.toLong)
  }

  test("the vacuum floor is engine-managed: SET/UNSET refuse; restore carries it forward") {
    val path = mkTable("t9")
    sql("INSERT INTO gt.db.t9 VALUES (400, 'even', 400)")
    sql("INSERT INTO gt.db.t9 VALUES (401, 'odd', 401)")
    // target: a pre-vacuum version that stays retained (inside the keep
    // window) — its own property map predates the floor commit, so a
    // restore that resurrected it verbatim would DISARM the guard
    val target = Snapshot.latestVersion(spark, path).get
    Snapshot.vacuum(spark, path, keepVersions = 2, orphanGraceMs = 0L)
    val floor = Snapshot.latestManifest(spark, path).get.properties("graft.vacuum.floor")
    // by-name writes refuse loudly on BOTH mutation surfaces
    val e1 = intercept[Exception](
      sql("ALTER TABLE gt.db.t9 SET TBLPROPERTIES ('graft.vacuum.floor' = '0')"))
    assert(e1.getMessage.contains("engine-managed"), e1.getMessage)
    val e2 = intercept[Exception](
      sql("ALTER TABLE gt.db.t9 UNSET TBLPROPERTIES ('graft.vacuum.floor')"))
    assert(e2.getMessage.contains("engine-managed"), e2.getMessage)
    intercept[Exception](Snapshot.setProperties(spark, path,
      Map("graft.vacuum.floor" -> "0")))
    // an unset SWEEP (the CTAS-REPLACE property redefinition) silently
    // preserves the guard instead of disarming it
    Snapshot.setProperties(spark, path, Map("owner.team" -> "corp"),
      unset = Seq("graft.vacuum.floor"))
    assert(Snapshot.latestManifest(spark, path).get
      .properties("graft.vacuum.floor") == floor,
      "an unset sweep must not drop the floor")
    // restore to the pre-vacuum-floor version must carry the CURRENT
    // floor, not resurrect the target's stale (absent) one — otherwise
    // the next createTag would trust a disarmed guard
    assert(Snapshot.manifest(spark, path, target)
      .properties.get("graft.vacuum.floor").isEmpty,
      "fixture: the restore target must predate the floor commit")
    Snapshot.restore(spark, path, target)
    assert(Snapshot.latestManifest(spark, path).get
      .properties("graft.vacuum.floor") == floor,
      "restore must carry the current floor through")
  }

  test("registry route: tag DDL and resolution as SQL text") {
    val root = Files.createTempDirectory("graft-tag-reg").toString
    val path = s"$root/t"
    Snapshot.create(spark, path,
      spark.range(20).select(col("id"), (col("id") % 4).as("p")),
      partitionCols = Seq("p"))
    val t = Map("t" -> path)
    Snapshot.sql(spark, "ALTER TABLE t CREATE TAG reg1", t)
    Snapshot.sql(spark, "INSERT INTO t VALUES (100, 0)", t)
    assert(Snapshot.sqlQuery(spark,
      "SELECT count(*) AS n FROM t VERSION AS OF 'reg1'", t).as[Long].head() == 20L)
    Snapshot.sql(spark, "ALTER TABLE t DROP TAG IF EXISTS reg1", t)
    assert(Snapshot.latestManifest(spark, path).get.tags.isEmpty)
  }
}
