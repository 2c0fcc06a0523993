package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** `ANALYZE TABLE` → manifest NDV estimates → catalog statistics for
  * Catalyst's cost-based optimizer ([[Snapshot.analyze]],
  * `GraftAnalyzeCapture`, `GraftNativeReads.cboCatalogTable`). Row
  * counts and byte totals are metadata-exact on every manifest and flow
  * to the planner unconditionally; NDVs come from the one-pass HLL job
  * and follow RENAME/DROP COLUMN.
  */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-analyze-wh").toString
    spark.conf.set("spark.sql.catalog.ga", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ga.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ga.db")
    dir
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  test("ANALYZE computes NDVs in one pass; DESCRIBE DETAIL and the manifest carry them") {
    val path = s"$warehouse/db/t1"
    sql("CREATE TABLE ga.db.t1 (id BIGINT, grp STRING, v BIGINT) PARTITIONED BY (grp)")
    sql("INSERT INTO ga.db.t1 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id % 10 FROM range(1000)")

    // COMPUTE STATISTICS alone: rows/bytes are already manifest-exact —
    // verifies and commits nothing
    val vBefore = Snapshot.latestVersion(spark, path).get
    sql("ANALYZE TABLE ga.db.t1 COMPUTE STATISTICS")
    assert(Snapshot.latestVersion(spark, path).get == vBefore)

    sql("ANALYZE TABLE ga.db.t1 COMPUTE STATISTICS FOR ALL COLUMNS")
    val ndv = Snapshot.latestManifest(spark, path).get.colNdv
    assert(ndv.keySet == Set("id", "grp", "v"))
    // HLL estimates: exact for tiny cardinalities, ±5% at 1000
    assert(ndv("grp") == 2L && ndv("v") == 10L)
    assert(math.abs(ndv("id") - 1000L) <= 50L, s"id ndv ${ndv("id")}")
    assert(sql("DESCRIBE DETAIL ga.db.t1").select("column_ndv").as[String].head()
      .contains("grp=2"))

    // FOR COLUMNS subset only refreshes those keys
    sql("ANALYZE TABLE ga.db.t1 COMPUTE STATISTICS FOR COLUMNS v")
    assert(Snapshot.latestManifest(spark, path).get.colNdv.keySet == Set("id", "grp", "v"))
  }

  test("catalog reads surface exact row counts and analyzed NDVs to the CBO") {
    sql("CREATE TABLE ga.db.fact (id BIGINT, k BIGINT) PARTITIONED BY (k)")
    sql("INSERT INTO ga.db.fact SELECT id, id % 5 FROM range(400)")
    sql("DELETE FROM ga.db.fact WHERE id % 4 = 0") // DV/rewrite: live rows != raw rows
    sql("ANALYZE TABLE ga.db.fact COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = sql("SELECT id, k FROM ga.db.fact").queryExecution.optimizedPlan
      val stats = plan.stats
      assert(stats.rowCount.contains(BigInt(300)),
        s"CBO must see the exact LIVE row count, got ${stats.rowCount}")
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.get("k").flatMap(_.distinctCount).contains(BigInt(5)),
        s"analyzed NDV must reach the plan stats, got $byName")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("NDVs follow RENAME and DROP COLUMN; registry route as SQL text") {
    val root = Files.createTempDirectory("graft-analyze-reg").toString
    val path = s"$root/t"
    Snapshot.create(spark, path,
      spark.range(100).select(col("id"), (col("id") % 7).as("a"), (col("id") % 3).as("b")))
    val t = Map("t" -> path)
    Snapshot.sql(spark, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS a, b", t)
    assert(Snapshot.latestManifest(spark, path).get.colNdv == Map("a" -> 7L, "b" -> 3L))
    Snapshot.renameColumn(spark, path, "a", "a2")
    assert(Snapshot.latestManifest(spark, path).get.colNdv == Map("a2" -> 7L, "b" -> 3L))
    Snapshot.dropColumn(spark, path, "b")
    assert(Snapshot.latestManifest(spark, path).get.colNdv == Map("a2" -> 7L))
    // non-atomic / unknown columns refuse loudly
    intercept[IllegalArgumentException] { Snapshot.analyze(spark, path, Seq("nope")) }
  }
}
