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

  test("histograms: equi-height bins under the vanilla conf, math pinned") {
    val root = Files.createTempDirectory("graft-analyze-hist").toString
    val path = s"$root/t"
    // 1000 rows: 900 zeros + 100 spread over [1, 100] — the skew shape
    // NDV+uniformity mis-estimates and a histogram nails
    Snapshot.create(spark, path,
      spark.range(1000).select(col("id"),
        when(col("id") < 900, 0L).otherwise(col("id") - 899).as("sk"),
        concat(lit("s"), col("id")).as("s")))
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    spark.conf.set("spark.sql.statistics.histogram.numBins", "10")
    try Snapshot.analyze(spark, path, Seq("sk", "s"))
    finally {
      spark.conf.unset("spark.sql.statistics.histogram.enabled")
      spark.conf.unset("spark.sql.statistics.histogram.numBins")
    }
    val m = Snapshot.latestManifest(spark, path).get
    // numeric columns get histograms; strings get NDVs only
    assert(m.colHist.keySet == Set("sk") && m.colNdv.keySet == Set("sk", "s"))
    val h = m.colHist("sk")
    assert(h.bins.size == 10 && h.height == 100.0, s"height ${h.height}")
    // percentile endpoints are the true min/max
    assert(h.bins.head.lo == 0.0 && h.bins.last.hi == 100.0, h.bins.toString)
    // 90% zeros: the first NINE bins collapse onto the zero value
    // (lo = hi = 0, ndv <= 1); the last bin carries the spread
    assert(h.bins.take(8).forall(b => b.lo == 0.0 && b.hi == 0.0 && b.ndv <= 1L),
      h.bins.toString)
    assert(h.bins.last.ndv >= 80L, s"tail-bin ndv ${h.bins.last.ndv}")
    // bins follow rename/drop like NDVs
    Snapshot.renameColumn(spark, path, "sk", "sk2")
    assert(Snapshot.latestManifest(spark, path).get.colHist.keySet == Set("sk2"))
    Snapshot.dropColumn(spark, path, "sk2")
    assert(Snapshot.latestManifest(spark, path).get.colHist.isEmpty)
  }

  test("BIGINT endpoints beyond 2^53 survive ANALYZE exactly (no double round-trip)") {
    val root = Files.createTempDirectory("graft-analyze-big").toString
    val path = s"$root/t"
    // endpoints that a double CANNOT represent: 2^60 ± odd offsets —
    // percentile bins round-trip through doubles and land on the
    // nearest representable value, so only the exact min/max aggregate
    // can give the CBO the true endpoints
    val lo = -(1L << 60) - 1L
    val hi = (1L << 60) + 3L
    Snapshot.create(spark, path,
      spark.range(100).select(col("id"),
        when(col("id") === 0, lo).when(col("id") === 99, hi)
          .otherwise(col("id")).as("big")))
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    spark.conf.set("spark.sql.statistics.histogram.numBins", "4")
    try Snapshot.analyze(spark, path, Seq("big"))
    finally {
      spark.conf.unset("spark.sql.statistics.histogram.enabled")
      spark.conf.unset("spark.sql.statistics.histogram.numBins")
    }
    val h = Snapshot.latestManifest(spark, path).get.colHist("big")
    assert(h.exactMin.contains(lo.toString) && h.exactMax.contains(hi.toString),
      s"exact endpoints: ${h.exactMin}/${h.exactMax}")
    // and the doubles in the bins really are lossy here — the exact
    // fields are not redundant
    assert(h.bins.head.lo.toLong != lo || h.bins.last.hi.toLong != hi,
      "test premise: the double endpoints must be unable to carry these values")
  }

  test("a histogram flips a skewed range-join's build side; the answer is identical") {
    val wh = warehouse
    sql("CREATE TABLE ga.db.skf (id BIGINT, sk BIGINT, v BIGINT)")
    // 4000 rows: 3960 at sk=0, 40 spread over (0, 1000000] — a range
    // probe into the sparse tail holds ~1% of rows; min/max uniformity
    // says ~half
    sql("""INSERT INTO ga.db.skf SELECT id,
          |CASE WHEN id % 100 = 0 THEN (id % 40 + 1) * 25000 ELSE 0 END, id
          |FROM range(4000)""".stripMargin)
    sql("CREATE TABLE ga.db.skd (id BIGINT, w BIGINT)")
    sql("INSERT INTO ga.db.skd SELECT id, id * 2 FROM range(4000)")
    def planOf(histogram: Boolean): (String, Set[(Long, Long)]) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.ga", "graft.catalog.GraftCatalog")
      s2.conf.set("spark.sql.catalog.ga.warehouse", wh)
      s2.conf.set("spark.sql.cbo.enabled", "true")
      s2.conf.set("spark.sql.shuffle.partitions", "8")
      // the threshold sits BETWEEN the two estimates of the filtered
      // fact: uniformity (~thousands of rows) stays above it, the
      // histogram's (~tens of rows) drops below it
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", (8 * 1024).toString)
      if (histogram) {
        s2.conf.set("spark.sql.statistics.histogram.enabled", "true")
        s2.conf.set("spark.sql.statistics.histogram.numBins", "50")
      }
      s2.sql("ANALYZE TABLE ga.db.skf COMPUTE STATISTICS FOR ALL COLUMNS")
      s2.sql("ANALYZE TABLE ga.db.skd COMPUTE STATISTICS FOR ALL COLUMNS")
      val df = s2.sql(
        """SELECT f.id, d.w FROM ga.db.skf f JOIN ga.db.skd d ON f.id = d.id
          |WHERE f.sk BETWEEN 500000 AND 1000000""".stripMargin)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    val (without, a1) = planOf(histogram = false)
    val (withH, a2) = planOf(histogram = true)
    assert(a1 == a2 && a1.size == 20, s"answers must agree, got ${a1.size}/${a2.size}")
    assert(!without.contains("BroadcastHashJoin"),
      s"without histograms the filtered fact must look too big to broadcast:\n$without")
    assert(withH.contains("BroadcastHashJoin"),
      s"with histograms the range selectivity must flip the join to broadcast:\n$withH")
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
