package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{MatView, Snapshot}

/** Materialized views as first-class objects: defining SQL + source
  * watermark in the view's own manifest, `REFRESH` advancing it —
  * incrementally (change-feed fold) for additive rollups, by full
  * pinned recompute otherwise — with the FeedConsumer exactly-once
  * contract on the publish.
  */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def rollup(df: DataFrame): Set[(String, Long, java.math.BigDecimal)] =
    df.select(col("k"), col("n"), col("total"))
      .as[(String, Long, java.math.BigDecimal)].collect().toSet

  test("incremental refresh across churn is bitwise-identical to a full recompute") {
    val wh = Files.createTempDirectory("graft-mv").toString
    spark.conf.set("spark.sql.catalog.gmv", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmv.db")
    val srcPath = s"$wh/db/src"
    Snapshot.create(spark, srcPath,
      (0L until 300L).map(i => (i, s"k${i % 7}", i % 50)).toDF("id", "k", "v"))
    val defining =
      """SELECT k, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,2))) AS total
        |FROM gmv.db.src WHERE v >= 5 GROUP BY k""".stripMargin
    spark.sql(s"CREATE MATERIALIZED VIEW gmv.db.mv AS $defining")
    val mvPath = s"$wh/db/mv"
    def recompute(): Set[(String, Long, java.math.BigDecimal)] =
      rollup(spark.sql(defining))
    assert(rollup(spark.table("gmv.db.mv")) == recompute(), "initial state")
    // the defining SQL and the watermark ride the manifest
    val m0 = Snapshot.latestManifest(spark, mvPath).get
    assert(m0.properties(MatView.SqlProp) == defining)
    assert(m0.streamBatch.contains(MatView.ConsumerId))

    // churn window 1: inserts (some below the WHERE bar), a delete, an update
    Snapshot.append(spark, srcPath,
      (1000L until 1040L).map(i => (i, s"k${i % 7}", i % 9)).toDF("id", "k", "v"))
    Snapshot.delete(spark, srcPath, col("id") < 20)
    Snapshot.update(spark, srcPath, col("id") === 50, Map("v" -> lit(49L)))
    spark.sql("REFRESH MATERIALIZED VIEW gmv.db.mv")
    assert(rollup(spark.table("gmv.db.mv")) == recompute(), "refresh 1")
    val m1 = Snapshot.latestManifest(spark, mvPath).get
    assert(m1.operation.contains("(incremental)"),
      s"additive rollup must take the change-feed path, got '${m1.operation}'")

    // churn window 2: a whole group drops below the bar and must vanish
    Snapshot.delete(spark, srcPath, col("k") === "k3" && col("v") >= 5)
    spark.sql("REFRESH MATERIALIZED VIEW gmv.db.mv")
    assert(rollup(spark.table("gmv.db.mv")) == recompute(), "refresh 2")
    assert(!rollup(spark.table("gmv.db.mv")).exists(_._1 == "k3"),
      "a group emptied by deletes must drop, exactly like the recompute")

    // already-current refresh is a no-op (no new version)
    val vBefore = Snapshot.latestVersion(spark, mvPath).get
    spark.sql("REFRESH MATERIALIZED VIEW gmv.db.mv")
    assert(Snapshot.latestVersion(spark, mvPath).get == vBefore)
  }

  test("a crash between the feed read and the publish re-runs exactly-once") {
    val root = Files.createTempDirectory("graft-mv-crash").toString
    val srcPath = s"$root/src"
    val mvPath = s"$root/mv"
    Snapshot.create(spark, srcPath,
      (0L until 100L).map(i => (i, s"k${i % 3}", i)).toDF("id", "k", "v"))
    val reg = Map("src" -> srcPath, "mv" -> mvPath)
    Snapshot.sql(spark,
      """CREATE MATERIALIZED VIEW mv AS
        |SELECT k, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,2))) AS total
        |FROM src GROUP BY k""".stripMargin, reg)
    Snapshot.append(spark, srcPath, Seq((500L, "k1", 500L)).toDF("id", "k", "v"))
    // kill the refresh AFTER the fold's files are written, BEFORE the
    // manifest publish: nothing commits, the watermark still names the
    // old version
    var killed = false
    Snapshot.faultHook = stage => if (stage == "manifest-staged" && !killed) {
      killed = true; throw new RuntimeException("injected crash")
    }
    val e = try intercept[RuntimeException](
      Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg))
    finally Snapshot.faultHook = _ => ()
    assert(killed && e.getMessage == "injected crash")
    val expected = Set(("k0", 34L), ("k1", 34L), ("k2", 33L))
    assert(rollup(Snapshot.read(spark, mvPath)).map(r => (r._1, r._2)) ==
      Set(("k0", 34L), ("k1", 33L), ("k2", 33L)), "crashed refresh left the OLD state")
    // the re-run folds the SAME window once — no double counting
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg)
    assert(rollup(Snapshot.read(spark, mvPath)).map(r => (r._1, r._2)) == expected)
    // and a redelivered refresh no-ops
    val v = Snapshot.latestVersion(spark, mvPath).get
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg)
    assert(Snapshot.latestVersion(spark, mvPath).get == v)
  }

  test("non-rollup defining SQL falls back to a full pinned recompute") {
    val root = Files.createTempDirectory("graft-mv-full").toString
    val srcPath = s"$root/src"
    Snapshot.create(spark, srcPath,
      (0L until 60L).map(i => (i, s"k${i % 4}", i)).toDF("id", "k", "v"))
    val reg = Map("src" -> srcPath, "mv" -> s"$root/mv")
    // DISTINCT count is not an additive fold — the declared fallback
    Snapshot.sql(spark,
      """CREATE MATERIALIZED VIEW mv AS
        |SELECT k, COUNT(DISTINCT v) AS ndv FROM src GROUP BY k""".stripMargin, reg)
    Snapshot.append(spark, srcPath, Seq((100L, "k0", 0L), (101L, "k0", 999L))
      .toDF("id", "k", "v"))
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg)
    val m = Snapshot.latestManifest(spark, s"$root/mv").get
    assert(m.operation.contains("(full recompute)"), m.operation)
    assert(Snapshot.read(spark, s"$root/mv").select("k", "ndv")
      .as[(String, Long)].collect().toSet ==
      Snapshot.read(spark, srcPath).groupBy("k").agg(countDistinct("v").as("ndv"))
        .as[(String, Long)].collect().toSet)
  }

  test("a compaction-only window advances the watermark without rewriting the view") {
    val root = Files.createTempDirectory("graft-mv-noop").toString
    val srcPath = s"$root/src"
    val mvPath = s"$root/mv"
    Snapshot.create(spark, srcPath,
      (0L until 40L).map(i => (i, s"k${i % 2}", i)).toDF("id", "k", "v"))
    Snapshot.append(spark, srcPath, Seq((40L, "k0", 40L)).toDF("id", "k", "v"))
    val reg = Map("src" -> srcPath, "mv" -> mvPath)
    Snapshot.sql(spark,
      """CREATE MATERIALIZED VIEW mv AS
        |SELECT k, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,2))) AS total
        |FROM src GROUP BY k""".stripMargin, reg)
    val filesBefore = Snapshot.latestManifest(spark, mvPath).get.files
    Snapshot.compact(spark, srcPath, minFiles = 1) // net-zero change window
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg)
    val m = Snapshot.latestManifest(spark, mvPath).get
    assert(m.files == filesBefore, "no-op window must not rewrite the view's files")
    assert(m.streamBatch(MatView.ConsumerId) ==
      Snapshot.latestVersion(spark, srcPath).get, "watermark still advances")
  }

  test("a source schema change inside the window demotes the refresh to a full recompute") {
    val root = Files.createTempDirectory("graft-mv-evolve").toString
    val srcPath = s"$root/src"
    Snapshot.create(spark, srcPath,
      (0L until 50L).map(i => (i, s"k${i % 3}", i)).toDF("id", "k", "v"))
    val reg = Map("src" -> srcPath, "mv" -> s"$root/mv")
    Snapshot.sql(spark,
      """CREATE MATERIALIZED VIEW mv AS
        |SELECT k, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,2))) AS total
        |FROM src GROUP BY k""".stripMargin, reg)
    // churn + a schema evolution inside the same window
    Snapshot.append(spark, srcPath, Seq((100L, "k0", 7L)).toDF("id", "k", "v"))
    Snapshot.addColumns(spark, srcPath,
      Seq(org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg)
    val m = Snapshot.latestManifest(spark, s"$root/mv").get
    assert(m.operation.contains("(full recompute)"),
      s"schema-changed window must take the full path, got '${m.operation}'")
    assert(rollup(Snapshot.read(spark, s"$root/mv")).map(r => (r._1, r._2)) ==
      Set(("k0", 18L), ("k1", 17L), ("k2", 16L)))
    // the NEXT window (schema stable again) goes back to incremental
    Snapshot.append(spark, srcPath,
      Seq((101L, "k1", 9L, "x")).toDF("id", "k", "v", "note"))
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg)
    assert(Snapshot.latestManifest(spark, s"$root/mv").get
      .operation.contains("(incremental)"))
    assert(rollup(Snapshot.read(spark, s"$root/mv")).map(r => (r._1, r._2)) ==
      Set(("k0", 18L), ("k1", 18L), ("k2", 16L)))
  }

  test("an MV over an MV refreshes through the chain, each tier incremental") {
    val root = Files.createTempDirectory("graft-mv-chain").toString
    val srcPath = s"$root/src"
    Snapshot.create(spark, srcPath,
      (0L until 200L).map(i => (i, s"k${i % 10}", s"g${i % 3}", i % 20))
        .toDF("id", "k", "g", "v"))
    val reg = Map("src" -> srcPath, "mv1" -> s"$root/mv1", "mv2" -> s"$root/mv2")
    // tier 1: fine-grained rollup; tier 2: coarser rollup OVER tier 1
    Snapshot.sql(spark,
      """CREATE MATERIALIZED VIEW mv1 AS
        |SELECT k, g, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,2))) AS total
        |FROM src GROUP BY k, g""".stripMargin, reg)
    Snapshot.sql(spark,
      """CREATE MATERIALIZED VIEW mv2 AS
        |SELECT g, COUNT(*) AS n, SUM(CAST(total AS DECIMAL(18,2))) AS total
        |FROM mv1 GROUP BY g""".stripMargin, reg)
    def mv2(): Set[(String, Long, java.math.BigDecimal)] =
      Snapshot.read(spark, s"$root/mv2").select(col("g"), col("n"), col("total"))
        .as[(String, Long, java.math.BigDecimal)].collect().toSet
    def recompute(): Set[(String, Long, java.math.BigDecimal)] =
      Snapshot.read(spark, s"$root/mv1").groupBy("g")
        .agg(count(lit(1)).as("n"),
          sum(col("total").cast("decimal(18,2)")).cast("decimal(28,2)").as("total"))
        .select(col("g"), col("n"), col("total"))
        .as[(String, Long, java.math.BigDecimal)].collect().toSet
    assert(mv2() == recompute())
    // churn the base, refresh the chain in dependency order
    Snapshot.append(spark, srcPath,
      (1000L until 1050L).map(i => (i, s"k${i % 10}", s"g${i % 3}", 19L))
        .toDF("id", "k", "g", "v"))
    Snapshot.delete(spark, srcPath, col("id") < 30)
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv1", reg)
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv2", reg)
    assert(mv2() == recompute(), "tier 2 must track tier 1 through the feed")
    assert(Snapshot.latestManifest(spark, s"$root/mv1").get
      .operation.contains("(incremental)"))
    assert(Snapshot.latestManifest(spark, s"$root/mv2").get
      .operation.contains("(incremental)"),
      "tier 2 over a rewritten tier 1 still folds the NET row diff")
  }

  test("a GROUP BY key missing from the SELECT list demotes to full recompute") {
    val root = Files.createTempDirectory("graft-mv-nokey").toString
    val srcPath = s"$root/src"
    Snapshot.create(spark, srcPath,
      (0L until 60L).map(i => (i, s"k${i % 4}", i)).toDF("id", "k", "v"))
    val reg = Map("src" -> srcPath, "mv" -> s"$root/mv")
    // the MV state has no `k` column, so the incremental fold's join on
    // the key is impossible — the shape test must refuse it UP FRONT
    // (full recompute), not fail at refresh time
    Snapshot.sql(spark,
      "CREATE MATERIALIZED VIEW mv AS SELECT COUNT(*) AS n FROM src GROUP BY k", reg)
    Snapshot.append(spark, srcPath, Seq((100L, "k0", 7L)).toDF("id", "k", "v"))
    Snapshot.sql(spark, "REFRESH MATERIALIZED VIEW mv", reg)
    val m = Snapshot.latestManifest(spark, s"$root/mv").get
    assert(m.operation.contains("(full recompute)"),
      s"keyless-SELECT rollup must take the full path, got '${m.operation}'")
    assert(Snapshot.read(spark, s"$root/mv").select("n")
      .as[Long].collect().sorted.toSeq == Seq(15L, 15L, 15L, 16L))
  }

  test("multi-source defining SQL refuses at CREATE, loudly") {
    val root = Files.createTempDirectory("graft-mv-multi").toString
    Snapshot.create(spark, s"$root/a", Seq((1L, 2L)).toDF("x", "y"))
    Snapshot.create(spark, s"$root/b", Seq((1L, 3L)).toDF("x", "z"))
    val reg = Map("a" -> s"$root/a", "b" -> s"$root/b", "mv" -> s"$root/mv")
    val e = intercept[IllegalArgumentException](Snapshot.sql(spark,
      "CREATE MATERIALIZED VIEW mv AS SELECT a.x FROM a JOIN b ON a.x = b.x", reg))
    assert(e.getMessage.contains("MULTIPLE source tables"), e.getMessage)
  }
}
