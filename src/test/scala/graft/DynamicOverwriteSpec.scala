package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic` on the
  * CATALOG route: Spark's V2Writes has no V1 fallback for
  * OverwritePartitionsDynamic, so GraftDmlCapture lifts the analyzed
  * plan into [[Snapshot.replacePartitions]] — one atomic commit that
  * replaces exactly the partitions the query writes. The reference's
  * K2 delete-and-replace idiom as vanilla SQL text.
  */
class DynamicOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"p${i % 4}", i.toLong * 10)).toDF("id", "p", "v")

  test("dynamic overwrite replaces only written partitions; untouched files carry over byte-identical") {
    val wh = Files.createTempDirectory("graft-dynover").toString
    spark.conf.set("spark.sql.catalog.gdo", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdo.db")
    val path = s"$wh/db/t"
    Snapshot.create(spark, path, fixture(0 until 40), partitionCols = Seq("p"))
    val before = Snapshot.latestManifest(spark, path).get
    val vBefore = before.version
    def filesOf(m: Snapshot.Manifest, part: String): Set[String] =
      m.files.filter(_.contains(s"p=$part")).toSet
    // dynamic mode: the query writes partitions p0 and p2 only
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(
      """INSERT OVERWRITE gdo.db.t
        |SELECT id + 1000 AS id, p, v + 5 AS v FROM gdo.db.t
        |WHERE p IN ('p0', 'p2')""".stripMargin)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val after = Snapshot.latestManifest(spark, path).get
    assert(after.version == vBefore + 1, "one atomic commit")
    // UNTOUCHED partitions: the exact same file entries (no rewrite,
    // no byte movement — the 100 TB contract)
    assert(filesOf(after, "p1") == filesOf(before, "p1"))
    assert(filesOf(after, "p3") == filesOf(before, "p3"))
    // TOUCHED partitions: fully replaced (no old file survives)
    assert(filesOf(after, "p0").intersect(filesOf(before, "p0")).isEmpty)
    assert(filesOf(after, "p2").intersect(filesOf(before, "p2")).isEmpty)
    // row-level contract: p0/p2 hold ONLY the new rows, p1/p3 exactly the old
    val got = spark.table("gdo.db.t").select("id", "p", "v")
      .as[(Long, String, Long)].collect().toSet
    val want = fixture(0 until 40).as[(Long, String, Long)].collect().toSet
      .flatMap { r: (Long, String, Long) =>
        if (r._2 == "p0" || r._2 == "p2") Some((r._1 + 1000, r._2, r._3 + 5))
        else Some(r)
      }
    assert(got == want)
  }

  test("static mode is untouched: INSERT OVERWRITE without dynamic conf truncates the table") {
    val wh = Files.createTempDirectory("graft-dynover-static").toString
    spark.conf.set("spark.sql.catalog.gds", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gds.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gds.db")
    Snapshot.create(spark, s"$wh/db/t", fixture(0 until 20), partitionCols = Seq("p"))
    spark.sql("INSERT OVERWRITE gds.db.t SELECT 999 AS id, 'p9' AS p, 1 AS v")
    assert(spark.table("gds.db.t").count() == 1L,
      "default (static) mode replaces the whole table, per Spark semantics")
  }

  test("dynamic mode with a static PARTITION clause still routes the static path") {
    val wh = Files.createTempDirectory("graft-dynover-mixed").toString
    spark.conf.set("spark.sql.catalog.gdm", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdm.db")
    val path = s"$wh/db/t"
    Snapshot.create(spark, path, fixture(0 until 20), partitionCols = Seq("p"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // ALL partition columns pinned static → OverwriteByExpression, the
    // existing by-filter route — only p1 is replaced
    try spark.sql(
      "INSERT OVERWRITE gdm.db.t PARTITION (p = 'p1') SELECT 777 AS id, 7 AS v")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val got = spark.table("gdm.db.t").select("id", "p", "v")
      .as[(Long, String, Long)].collect().toSet
    val want = fixture(0 until 20).as[(Long, String, Long)].collect().toSet
      .filterNot(_._2 == "p1") + ((777L, "p1", 7L))
    assert(got == want)
  }

  test("dynamic overwrite re-derives generated partition columns and enforces constraints") {
    val wh = Files.createTempDirectory("graft-dynover-gen").toString
    spark.conf.set("spark.sql.catalog.gdg", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdg.db")
    val path = s"$wh/db/t"
    Snapshot.create(spark, path,
      (0L until 30L).map(i => (i, i * 2)).toDF("id", "v"),
      partitionCols = Seq("bucket"),
      generatedCols = Map("bucket" -> "CAST(id % 3 AS STRING)"))
    Snapshot.addConstraint(spark, path, "v_pos", "v >= 0")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the INSERT carries only the DECLARED columns; the generated
      // partition column re-derives inside the write (bucket 0 only).
      // (Source is a view, not the target itself: reading the target in
      // the same statement would share the analyzer's relation cache
      // with the write-privilege load and see the hidden column.)
      (0L until 30L).filter(_ % 3 == 0).map(i => (i, i * 2 + 100))
        .toDF("id", "v").createOrReplaceTempView("gdg_new")
      spark.sql("INSERT OVERWRITE gdg.db.t SELECT id, v FROM gdg_new")
      val got = spark.table("gdg.db.t").select("id", "v")
        .as[(Long, Long)].collect().toSet
      val want = (0L until 30L).map(i =>
        if (i % 3 == 0) (i, i * 2 + 100) else (i, i * 2)).toSet
      assert(got == want)
      // the carried constraint refuses bad dynamic loads atomically
      intercept[Exception](spark.sql(
        "INSERT OVERWRITE gdg.db.t SELECT 1 AS id, -5 AS v"))
      assert(spark.table("gdg.db.t").select("id", "v")
        .as[(Long, Long)].collect().toSet == want, "refused load left no trace")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }
}
