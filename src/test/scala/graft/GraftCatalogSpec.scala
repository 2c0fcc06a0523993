package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** The DSv2 catalog: snapshot tables resolved BY NAME through the
  * vanilla parser/analyzer — DDL, reads (native scan via the extension
  * rule), writes, DML, time travel and the maintenance dialect, all as
  * plain `spark.sql` text with zero registry plumbing.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-catalog-wh").toString
    spark.conf.set("spark.sql.catalog.g", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    dir
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "p", "v").as[(Long, String, Long)].collect().toSet

  private def fixture(ids: Range, tag: Long): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", tag * 1000 + i))
      .toDF("id", "p", "v")

  test("CREATE TABLE / INSERT / SELECT / SHOW / DESCRIBE resolve by name") {
    sql("CREATE TABLE g.db.t1 (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    assert(Snapshot.isSnapshotTable(spark, s"$warehouse/db/t1"))
    sql("INSERT INTO g.db.t1 VALUES (1, 'even', 10), (2, 'odd', 20)")
    sql("INSERT INTO g.db.t1 SELECT 3, 'even', 30")
    assert(rows(sql("SELECT id, p, v FROM g.db.t1")) ==
      Set((1L, "even", 10L), (2L, "odd", 20L), (3L, "even", 30L)))
    // SHOW TABLES / DESCRIBE / SHOW CREATE TABLE flow through the catalog
    assert(sql("SHOW TABLES IN g.db").select("tableName")
      .as[String].collect().contains("t1"))
    val desc = sql("DESCRIBE TABLE g.db.t1").select("col_name", "data_type")
      .as[(String, String)].collect().toMap
    assert(desc.get("id").contains("bigint") && desc.get("p").contains("string"))
    val ddl = sql("SHOW CREATE TABLE g.db.t1").as[String].head()
    assert(ddl.contains("USING graft-snapshot") && ddl.contains("PARTITIONED BY (p)"),
      s"SHOW CREATE TABLE must round-trip the declaration: $ddl")
  }

  test("reads plan the NATIVE manifest scan with pushdown, not a row fallback") {
    sql("CREATE TABLE g.db.scan (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.scan SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 FROM range(100)")
    val df = sql("SELECT id, v FROM g.db.scan WHERE p = 'even' AND v > 100")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("FileScan parquet"),
      s"catalog read must plan the native vectorized parquet scan, got:\n$physical")
    assert(physical.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,100)]") ||
      physical.contains("GreaterThan(v,100)"),
      s"data filter must reach the scan:\n$physical")
    assert(df.count() == 44) // even ids 12..98
    // partition pruning: only the p=even files are listed
    val scanned = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("p=odd"))
  }

  test("CTAS, REPLACE TABLE AS SELECT and time travel are one history") {
    sql("CREATE TABLE g.db.src (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    fixture(0 until 20, 1).createOrReplaceTempView("ctas_src")
    sql("INSERT INTO g.db.src SELECT * FROM ctas_src")
    sql("CREATE TABLE g.db.mat PARTITIONED BY (p) AS SELECT id, p, v FROM g.db.src WHERE id < 10")
    assert(rows(sql("SELECT * FROM g.db.mat")) == rows(fixture(0 until 10, 1)))
    // REPLACE is an atomic overwrite commit — history stays walkable
    sql("CREATE OR REPLACE TABLE g.db.mat AS SELECT id, p, v FROM g.db.src WHERE id >= 10")
    assert(rows(sql("SELECT * FROM g.db.mat")) == rows(fixture(10 until 20, 1)))
    assert(rows(sql("SELECT * FROM g.db.mat VERSION AS OF 1")) == rows(fixture(0 until 10, 1)))
    // CTAS against an existing table refuses; IF NOT EXISTS no-ops
    intercept[Exception](sql("CREATE TABLE g.db.mat AS SELECT * FROM g.db.src"))
    sql("CREATE TABLE IF NOT EXISTS g.db.mat AS SELECT * FROM g.db.src")
    assert(rows(sql("SELECT * FROM g.db.mat")) == rows(fixture(10 until 20, 1)))
  }

  test("INSERT OVERWRITE: full truncate and static partition replace") {
    sql("CREATE TABLE g.db.ow (id BIGINT, v BIGINT, p STRING) PARTITIONED BY (p)")
    fixture(0 until 10, 1).createOrReplaceTempView("ow_base")
    sql("INSERT INTO g.db.ow SELECT id, v, p FROM ow_base")
    // full overwrite: the whole table is replaced in one commit
    fixture(10 until 14, 2).createOrReplaceTempView("ow_next")
    sql("INSERT OVERWRITE g.db.ow SELECT id, v, p FROM ow_next")
    assert(rows(sql("SELECT id, p, v FROM g.db.ow")) == rows(fixture(10 until 14, 2)))
    // static partition overwrite: only the named tuple is replaced
    sql("INSERT OVERWRITE g.db.ow PARTITION (p = 'even') SELECT 100, 7")
    val got = rows(sql("SELECT id, p, v FROM g.db.ow"))
    assert(got == rows(fixture(10 until 14, 2)).filter(_._2 == "odd") + ((100L, "even", 7L)),
      s"partition overwrite must keep untouched partitions, got $got")
  }

  test("DELETE / UPDATE / MERGE are plain SQL against catalog names") {
    sql("CREATE TABLE g.db.dml (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    fixture(0 until 30, 1).createOrReplaceTempView("dml_base")
    sql("INSERT INTO g.db.dml SELECT * FROM dml_base")

    sql("DELETE FROM g.db.dml WHERE id >= 20 AND p = 'even'")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.dml").as[Long].head() == 25L)

    sql("UPDATE g.db.dml SET v = v + 100000 WHERE p = 'odd' AND id < 4")
    assert(sql("SELECT v FROM g.db.dml WHERE id = 1").as[Long].head() == 101001L)
    assert(sql("SELECT v FROM g.db.dml WHERE id = 5").as[Long].head() == 1005L)

    fixture(28 until 34, 9).createOrReplaceTempView("dml_updates")
    sql("""MERGE INTO g.db.dml t USING dml_updates u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // 29 odd survived the delete and matched; 28/30/32 (even, >= 20) were
    // deleted, so they insert; 31/33 insert
    assert(sql("SELECT v FROM g.db.dml WHERE id = 29").as[Long].head() == 9029L)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.dml").as[Long].head() == 30L)

    // explicit arms with per-column assignments
    sql("""MERGE INTO g.db.dml t USING dml_updates u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET v = u.v + 7""".stripMargin)
    assert(sql("SELECT v FROM g.db.dml WHERE id = 29").as[Long].head() == 9036L)
  }

  test("ALTER TABLE evolves schema through the catalog") {
    sql("CREATE TABLE g.db.alt (id INT, p STRING, v BIGINT) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.alt VALUES (1, 'even', 10)")
    sql("ALTER TABLE g.db.alt ADD COLUMNS (w STRING)")
    assert(sql("SELECT * FROM g.db.alt").columns.toSeq == Seq("id", "p", "v", "w"))
    sql("ALTER TABLE g.db.alt RENAME COLUMN v TO vv")
    assert(sql("SELECT vv FROM g.db.alt").as[Long].head() == 10L)
    sql("ALTER TABLE g.db.alt DROP COLUMN w")
    assert(sql("SELECT * FROM g.db.alt").columns.toSeq == Seq("id", "p", "vv"))
    sql("ALTER TABLE g.db.alt ALTER COLUMN id TYPE BIGINT")
    assert(sql("SELECT id FROM g.db.alt").schema.head.dataType.typeName == "long")
  }

  test("maintenance dialect: VACUUM / OPTIMIZE / DESCRIBE HISTORY / RESTORE by name") {
    sql("CREATE TABLE g.db.mx (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    fixture(0 until 8, 1).createOrReplaceTempView("mx_base")
    sql("INSERT INTO g.db.mx SELECT * FROM mx_base")
    sql("INSERT INTO g.db.mx SELECT id + 100, p, v FROM mx_base")
    val hist = sql("DESCRIBE HISTORY g.db.mx")
    assert(hist.select("version").as[Long].collect().toSeq.sorted == Seq(1L, 2L, 3L))
    val detail = sql("DESCRIBE DETAIL g.db.mx")
    assert(detail.select("num_rows").as[Long].head() == 16L)

    sql("OPTIMIZE g.db.mx")
    assert(rows(sql("SELECT id, p, v FROM g.db.mx")).size == 16)
    // a keyword inside a string literal must not confuse clause slicing
    sql("OPTIMIZE g.db.mx WHERE p = 'ZORDER BY (zorder)'")
    assert(rows(sql("SELECT id, p, v FROM g.db.mx")).size == 16)

    sql("RESTORE TABLE g.db.mx TO VERSION AS OF 2")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.mx").as[Long].head() == 8L)

    sql("VACUUM g.db.mx RETAIN 1 VERSIONS")
    val path = s"$warehouse/db/mx"
    // the survivor plus the floor commit (published before deletion)
    assert(Snapshot.versions(spark, path).size == 2)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.mx").as[Long].head() == 8L)
    // age-based retention parses and keeps everything younger than 7 days
    sql("INSERT INTO g.db.mx SELECT * FROM mx_base")
    sql("VACUUM g.db.mx RETAIN 7 DAYS")
    assert(Snapshot.versions(spark, path).size == 3)
  }

  test("DataFrameWriterV2: writeTo(...).create/append/replace by name") {
    warehouse
    import org.apache.spark.sql.functions.days
    val df = (1L to 6L).map(i => (i, java.sql.Timestamp.valueOf(s"2026-08-0$i 10:00:00")))
      .toDF("id", "ts")
    // create with a partition transform — the staged-commit protocol
    df.writeTo("g.db.w2").partitionedBy(days(col("ts"))).create()
    val m = Snapshot.latestManifest(spark, s"$warehouse/db/w2").get
    assert(m.partitionCols == Seq("ts_day") && m.generatedCols.contains("ts_day"))
    assert(sql("SELECT COUNT(*) AS n FROM g.db.w2").as[Long].head() == 6L)
    // append + createOrReplace ride the same writers
    df.select(col("id") + 10, col("ts")).toDF("id", "ts").writeTo("g.db.w2").append()
    assert(sql("SELECT COUNT(*) AS n FROM g.db.w2").as[Long].head() == 12L)
    df.writeTo("g.db.w2").createOrReplace()
    assert(sql("SELECT COUNT(*) AS n FROM g.db.w2").as[Long].head() == 6L)
    // history survives the replace
    assert(sql("SELECT COUNT(*) AS n FROM g.db.w2 VERSION AS OF 2").as[Long].head() == 12L)
  }

  test("CHECK constraints flow through ALTER TABLE by name") {
    sql("CREATE TABLE g.db.cons (id BIGINT, v BIGINT)")
    sql("INSERT INTO g.db.cons VALUES (1, 10)")
    sql("ALTER TABLE g.db.cons ADD CONSTRAINT pos CHECK (v > 0)")
    // every write path enforces it before any file lands
    val e = intercept[Exception](sql("INSERT INTO g.db.cons VALUES (2, -5)"))
    assert(e.getMessage.contains("pos"), s"violation must name the constraint: ${e.getMessage}")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.cons").as[Long].head() == 1L)
    // a constraint existing rows violate refuses at ADD time
    intercept[Exception](sql("ALTER TABLE g.db.cons ADD CONSTRAINT big CHECK (v > 100)"))
    sql("ALTER TABLE g.db.cons DROP CONSTRAINT pos")
    sql("INSERT INTO g.db.cons VALUES (2, -5)")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.cons").as[Long].head() == 2L)
  }

  test("DROP TABLE, RENAME TABLE and namespace listing") {
    sql("CREATE TABLE g.db.tmp1 (id BIGINT) ")
    sql("INSERT INTO g.db.tmp1 VALUES (5)")
    sql("ALTER TABLE g.db.tmp1 RENAME TO g.db.tmp2")
    assert(sql("SELECT id FROM g.db.tmp2").as[Long].head() == 5L)
    intercept[Exception](sql("SELECT * FROM g.db.tmp1"))
    sql("DROP TABLE g.db.tmp2")
    assert(!sql("SHOW TABLES IN g.db").select("tableName")
      .as[String].collect().contains("tmp2"))
    intercept[Exception](sql("DROP TABLE g.db.tmp2"))
    sql("DROP TABLE IF EXISTS g.db.tmp2")
    assert(sql("SHOW NAMESPACES IN g").select("namespace")
      .as[String].collect().contains("db"))
  }

  test("reader options pin versions; USE makes names current; ZORDER by name") {
    sql("CREATE TABLE g.db.vop (id BIGINT, v STRING)")
    sql("INSERT INTO g.db.vop VALUES (1, 'a')")
    sql("INSERT INTO g.db.vop VALUES (2, 'b')")
    // option-based time travel: Spark turns the reader option into
    // loadTable(ident, version), so the pinned manifest rides our
    // native rewrite — including the pinned version's OWN schema
    assert(spark.read.option("versionAsOf", "2").table("g.db.vop").count() == 1)
    assert(spark.read.table("g.db.vop").count() == 2)
    sql("ALTER TABLE g.db.vop ADD COLUMNS (w BIGINT)")
    assert(spark.read.option("versionAsOf", "2").table("g.db.vop")
      .columns.toSeq == Seq("id", "v"), "a pinned version keeps its own schema")
    assert(spark.read.table("g.db.vop").columns.toSeq == Seq("id", "v", "w"))

    // USE: unqualified names resolve via current catalog + namespace
    val before = spark.catalog.currentCatalog()
    try {
      sql("USE g.db")
      assert(spark.sql("SELECT COUNT(*) AS n FROM vop").as[Long].head() == 2L)
      spark.sql("OPTIMIZE vop ZORDER BY (id)")
      assert(spark.sql("SELECT COUNT(*) AS n FROM vop").as[Long].head() == 2L)
      spark.sql("DESCRIBE HISTORY vop").collect() // maintenance verbs too
    } finally spark.sql(s"USE $before.default") // restore for other tests
  }

  test("streaming reads resolve by name: readStream.table + change feed") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-cat-stream").toString
    sql("CREATE TABLE g.db.str (id BIGINT, v STRING)")
    sql("INSERT INTO g.db.str VALUES (1, 'a'), (2, 'b')")
    // appends-only stream by CATALOG NAME — the commit-log source
    // through the analyzer's V1 fallback
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    def drain(): Unit = {
      val q = spark.readStream.table("g.db.str")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b"))
    sql("INSERT INTO g.db.str VALUES (3, 'c')")
    drain()
    assert(spark.read.parquet(out).count() == 3)

    // the change feed by name: meta columns ride the relation output
    val out2 = s"$dir/out2"; val ckpt2 = s"$dir/ckpt2"
    val q2 = spark.readStream.option("readChangeFeed", "true")
      .option("startingVersion", "0").table("g.db.str")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt2)
      .format("parquet").option("path", out2).start()
    q2.awaitTermination()
    val cdc = spark.read.parquet(out2)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(cdc == Set((1L, "insert", 2L), (2L, "insert", 2L), (3L, "insert", 3L)),
      s"CDC by name must stamp every commit: $cdc")
  }

  test("streaming writes resolve by name: the sink's table option, exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-cat-sink").toString
    sql("CREATE TABLE g.db.up (id BIGINT, v STRING)")
    sql("INSERT INTO g.db.up VALUES (1, 'a'), (2, 'b')")
    sql("CREATE TABLE g.db.down (id BIGINT, v STRING)")
    // source AND sink by catalog name: up streams into down through
    // the exactly-once snapshot sink (manifest-watermarked batches)
    def pump(): Unit = {
      val q = spark.readStream.table("g.db.up")
        .writeStream.format("graft-snapshot")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .option("table", "g.db.down")
        .start()
      q.awaitTermination()
    }
    pump()
    assert(sql("SELECT id, v FROM g.db.down").as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b"))
    sql("INSERT INTO g.db.up VALUES (3, 'c')")
    pump()
    pump() // an extra tick with nothing new must not duplicate
    assert(sql("SELECT id, v FROM g.db.down").as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // the sink's commits are ordinary snapshot versions: history walks
    assert(sql("DESCRIBE HISTORY g.db.down").count() >= 2)
  }

  test("table_changes() resolves catalog-qualified names in plain SQL") {
    sql("CREATE TABLE g.db.tc (id BIGINT, v STRING)")
    sql("INSERT INTO g.db.tc VALUES (1, 'a'), (2, 'b')")
    sql("UPDATE g.db.tc SET v = 'B' WHERE id = 2")
    val changes = sql(
      "SELECT id, v, _change_type, _commit_version FROM table_changes('g.db.tc', 2) ORDER BY _commit_version, id, _change_type")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(changes == Seq((1L, "a", "insert", 2L), (2L, "b", "insert", 2L),
      (2L, "b", "delete", 3L), (2L, "B", "insert", 3L)), s"got $changes")
  }

  test("MERGE into an UNPARTITIONED catalog table takes the whole-table tier") {
    sql("CREATE TABLE g.db.dim (id BIGINT, v BIGINT)")
    sql("INSERT INTO g.db.dim VALUES (1, 10), (2, 20), (3, 30)")
    Seq((2L, 200L), (4L, 400L)).toDF("id", "v").createOrReplaceTempView("dim_updates")
    sql("""MERGE INTO g.db.dim t USING dim_updates u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT id, v FROM g.db.dim").as[(Long, Long)].collect().toSet ==
      Set(1L -> 10L, 2L -> 200L, 3L -> 30L, 4L -> 400L))
    // explicit arms on the same unpartitioned table
    sql("""MERGE INTO g.db.dim t USING dim_updates u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET v = u.v + 1""".stripMargin)
    assert(sql("SELECT v FROM g.db.dim WHERE id = 2").as[Long].head() == 201L)
  }

  test("partition evolution: CREATE OR REPLACE ... PARTITIONED BY (new) is atomic") {
    sql("CREATE TABLE g.db.pe (id BIGINT, p STRING, q BIGINT) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.pe SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id % 3 FROM range(12)")
    val path = s"$warehouse/db/pe"
    assert(Snapshot.latestManifest(spark, path).get.partitionCols == Seq("p"))
    // evolve the layout in one history-preserving commit
    sql("CREATE OR REPLACE TABLE g.db.pe PARTITIONED BY (q) AS SELECT id, p, q FROM g.db.pe")
    val m = Snapshot.latestManifest(spark, path).get
    assert(m.partitionCols == Seq("q"),
      s"layout must evolve with the replace, got ${m.partitionCols}")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.pe").as[Long].head() == 12L)
    // pruning follows the NEW scheme; time travel keeps the OLD one
    val pruned = sql("SELECT id FROM g.db.pe WHERE q = 1")
    assert(!pruned.queryExecution.executedPlan.collectLeaves().head.toString.contains("q=2"))
    assert(pruned.count() == 4)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.pe VERSION AS OF 2 WHERE p = 'even'")
      .as[Long].head() == 6L)
    // appends land under the new layout; merges restrict on new tuples
    sql("INSERT INTO g.db.pe VALUES (100, 'odd', 1)")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.pe WHERE q = 1").as[Long].head() == 5L)
    // a REPLACE without PARTITIONED BY keeps the evolved layout
    sql("CREATE OR REPLACE TABLE g.db.pe AS SELECT id, p, q FROM g.db.pe WHERE id < 100")
    assert(Snapshot.latestManifest(spark, path).get.partitionCols == Seq("q"))
  }

  test("a CTAS crashing mid-write leaves NO table; the rerun lands cleanly") {
    warehouse
    fixture(0 until 8, 1).createOrReplaceTempView("ctas_crash_src")
    // crash AFTER the data files but BEFORE the manifest commit: the
    // staged-CTAS publication point IS the manifest, so no version
    // exists, the table does not resolve, and the orphaned txn files
    // are vacuum fodder — exactly the snapshot-protocol contract,
    // now reached through the catalog's staged-write path
    Snapshot.faultHook = p =>
      if (p == "manifest-staged") throw new RuntimeException("injected crash at manifest-staged")
    try intercept[Exception](
      sql("CREATE TABLE g.db.ctas_crash AS SELECT * FROM ctas_crash_src"))
    finally Snapshot.faultHook = _ => ()
    assert(!Snapshot.isSnapshotTable(spark, s"$warehouse/db/ctas_crash"),
      "a crashed CTAS must not publish a table")
    intercept[Exception](sql("SELECT * FROM g.db.ctas_crash"))
    // the rerun (same statement) succeeds — nothing half-created blocks it
    sql("CREATE TABLE g.db.ctas_crash AS SELECT * FROM ctas_crash_src")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.ctas_crash").as[Long].head() == 8L)
  }

  test("generated partition transforms: PARTITIONED BY (days(ts)) through the catalog") {
    sql("CREATE TABLE g.db.gen (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    val m = Snapshot.latestManifest(spark, s"$warehouse/db/gen").get
    assert(m.partitionCols == Seq("ts_day") && m.generatedCols.contains("ts_day"))
    // INSERT omits the generated column — the write path derives it,
    // and reads (incl. partition pruning) see it
    sql("INSERT INTO g.db.gen VALUES (1, TIMESTAMP '2026-08-01 10:00:00')," +
      " (2, TIMESTAMP '2026-08-02 11:00:00')")
    assert(sql("SELECT id, CAST(ts_day AS STRING) AS d FROM g.db.gen ORDER BY id")
      .as[(Long, String)].collect().toSeq ==
      Seq(1L -> "2026-08-01", 2L -> "2026-08-02"))
    val pruned = sql("SELECT id FROM g.db.gen WHERE ts_day = DATE '2026-08-01'")
    assert(pruned.as[Long].collect().toSeq == Seq(1L))
    assert(!pruned.queryExecution.executedPlan.collectLeaves().head.toString
      .contains("2026-08-02"), "generated partition pruning must skip the other day")
  }

  test("CHECK constraints declared AT CREATE TIME are kept, not dropped") {
    // CreateTableExec routes constraints through the TableInfo
    // overload, whose interface default silently forwards everything
    // EXCEPT the constraints — the catalog must override it
    sql("CREATE TABLE g.db.consc (id BIGINT, v BIGINT, CONSTRAINT pos CHECK (v > 0))")
    val m0 = Snapshot.latestManifest(spark, s"$warehouse/db/consc").get
    assert(m0.constraints.get("pos").exists(_.contains("v")),
      "the create-time constraint must land in the manifest")
    assert(m0.version == 1L,
      "constraints ride the create commit itself — one atomic version")
    val e = intercept[Exception](sql("INSERT INTO g.db.consc VALUES (1, -5)"))
    assert(e.getMessage.contains("pos"), s"violation must name the constraint: ${e.getMessage}")
    sql("INSERT INTO g.db.consc VALUES (1, 5)")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.consc").as[Long].head() == 1L)
  }

  test("INSERT OVERWRITE omits the generated partition column, like INSERT") {
    // overwrite requests {INSERT, DELETE} write privileges — the
    // generated-column hiding must cover that shape or every
    // positional overwrite fails on the phantom column
    sql("CREATE TABLE g.db.genow (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    sql("INSERT INTO g.db.genow VALUES (1, TIMESTAMP '2026-08-01 10:00:00')")
    sql("INSERT OVERWRITE g.db.genow VALUES (2, TIMESTAMP '2026-08-03 09:00:00')")
    assert(sql("SELECT id, CAST(ts_day AS STRING) AS d FROM g.db.genow")
      .as[(Long, String)].collect().toSeq == Seq(2L -> "2026-08-03"),
      "overwrite must replace the table and re-derive the generated column")
  }

  test("DESCRIBE of tables named history/detail delegates to the session parser") {
    sql("CREATE TABLE g.db.history (id BIGINT, note STRING)")
    sql("CREATE NAMESPACE IF NOT EXISTS g.history")
    sql("CREATE TABLE g.history.orders (oid BIGINT)")
    val before = spark.catalog.currentCatalog()
    try {
      sql("USE g.db")
      // `DESCRIBE history` = vanilla DESCRIBE of the table `history`,
      // NOT a truncated maintenance statement — the dialect must
      // delegate anything that is not exactly DESCRIBE HISTORY <ident>
      val cols = spark.sql("DESCRIBE history").select("col_name")
        .as[String].collect().toSet
      assert(cols.contains("id") && cols.contains("note"))
      spark.sql("USE g.history")
      val cols2 = spark.sql("DESCRIBE history.orders").select("col_name")
        .as[String].collect().toSet
      assert(cols2.contains("oid"))
      // and the genuine maintenance form still parses beside them
      assert(spark.sql("DESCRIBE HISTORY g.db.history").count() >= 1L)
    } finally spark.sql(s"USE $before.default")
  }

  test("DELETE WHERE id IN (SELECT ...) resolves both tables by name") {
    sql("CREATE TABLE g.db.dsub (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.dsub SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 FROM range(50)")
    sql("CREATE TABLE g.db.quarantine (bad BIGINT)")
    sql("INSERT INTO g.db.quarantine VALUES (3), (3), (17), (999)")
    sql("DELETE FROM g.db.dsub WHERE id IN (SELECT bad FROM g.db.quarantine)")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.dsub").as[Long].head() == 48L)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.dsub WHERE id IN (3, 17)")
      .as[Long].head() == 0L)
    // and the audit trail shows a DELETE commit
    assert(Snapshot.latestManifest(spark, s"$warehouse/db/dsub").get.operation == "DELETE")
    // a type-widened key (INT target, BIGINT subquery — the analyzer
    // wraps the column in IN's coercion Cast) takes the same route
    sql("CREATE TABLE g.db.dw (id INT)")
    sql("INSERT INTO g.db.dw VALUES (5), (6)")
    sql("CREATE TABLE g.db.dwk (b BIGINT)")
    sql("INSERT INTO g.db.dwk VALUES (4294967301), (6)") // 2^32+5 must NOT wrap to 5
    sql("DELETE FROM g.db.dw WHERE id IN (SELECT b FROM g.db.dwk)")
    assert(sql("SELECT id FROM g.db.dw").as[Int].collect().toSeq == Seq(5))
  }

  test("MERGE by name: conditional arms and NOT MATCHED BY SOURCE") {
    sql("CREATE TABLE g.db.marm (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.marm VALUES (1, 'odd', 10), (2, 'even', 20), (3, 'odd', 30), (4, 'even', 40)")
    Seq((1L, "odd", 500L), (2L, "even", 5L), (9L, "odd", 90L), (8L, "even", 80L))
      .toDF("id", "p", "v").createOrReplaceTempView("marm_src")
    sql("""MERGE INTO g.db.marm t USING marm_src u ON t.id = u.id
          |WHEN MATCHED AND u.v > 100 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = u.v + t.v
          |WHEN NOT MATCHED AND u.id > 8 THEN INSERT (id, p, v) VALUES (u.id, u.p, -u.v)
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE AND t.id = 3 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v * 10""".stripMargin)
    // 1 deleted (u.v > 100); 2 updated to 25; 9 inserts negated; 8
    // inserts verbatim; 3 deleted by source-absence; 4 scaled 10x
    assert(rows(sql("SELECT id, p, v FROM g.db.marm")) ==
      Set((2L, "even", 25L), (9L, "odd", -90L), (8L, "even", 80L), (4L, "even", 400L)))
  }

  test("MERGE WITH SCHEMA EVOLUTION evolves a catalog table by name") {
    sql("CREATE TABLE g.db.sev (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.sev VALUES (1, 'odd', 10), (2, 'even', 20), (4, 'even', 40)")
    // the source carries a column the target has never seen — the
    // autodetect-load + MERGE maintenance combo, as one statement
    Seq((2L, "even", 99L, "late"), (3L, "odd", 30L, "late"))
      .toDF("id", "p", "v", "tag").createOrReplaceTempView("sev_src")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO g.db.sev t USING sev_src u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the evolution is a metadata-only ADD COLUMNS commit: the evolved
    // column reads across PRE-EVOLUTION files as null, the merged rows
    // carry the source values
    assert(sql("SELECT id, p, v, tag FROM g.db.sev")
      .as[(Long, String, Long, Option[String])].collect().toSet ==
      Set((1L, "odd", 10L, None), (2L, "even", 99L, Some("late")),
        (3L, "odd", 30L, Some("late")), (4L, "even", 40L, None)))
    val m = Snapshot.latestManifest(spark, s"$warehouse/db/sev").get
    assert(m.operation == "MERGE")
    // ...and the commit before the merge was the evolution, no rewrite
    val evo = Snapshot.manifest(spark, s"$warehouse/db/sev", m.version - 1)
    assert(evo.operation == "ADD COLUMNS", evo.operation)
  }

  test("schema evolution racing a concurrent append: both commits survive") {
    sql("CREATE TABLE g.db.sevrace (id BIGINT, v BIGINT)")
    sql("INSERT INTO g.db.sevrace VALUES (1, 10)")
    Seq((2L, 20L, "x")).toDF("id", "v", "tag").createOrReplaceTempView("sevrace_src")
    // inject at the evolution commit's staging point: an append lands
    // FIRST (wins the version), the ADD COLUMNS publish conflicts, and
    // addColumns' rebase-and-retry must carry BOTH — the appended row
    // and the evolved column
    var fired = false
    Snapshot.faultHook = {
      case "manifest-staged" if !fired =>
        fired = true
        Snapshot.append(spark, s"$warehouse/db/sevrace",
          Seq((7L, 70L)).toDF("id", "v"))
      case _ => ()
    }
    try sql("""MERGE WITH SCHEMA EVOLUTION INTO g.db.sevrace t USING sevrace_src u ON t.id = u.id
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    finally Snapshot.faultHook = _ => ()
    assert(fired, "fixture: the race hook must have fired")
    assert(sql("SELECT id, v, tag FROM g.db.sevrace")
      .as[(Long, Long, Option[String])].collect().toSet ==
      Set((1L, 10L, None), (2L, 20L, Some("x")), (7L, 70L, None)))
  }

  test("a USER-written narrowing cast on the IN key refuses instead of joining raw") {
    // `CAST(id AS INT) IN (SELECT …)` is NOT the analyzer's widening
    // coercion — a BIGINT that wraps under the narrow cast matches
    // different rows than the raw column, so silently stripping it
    // would delete the wrong rows. It must fall through to the generic
    // predicate path, whose subquery refusal is loud.
    sql("CREATE TABLE g.db.ncast (id BIGINT, v BIGINT)")
    sql("INSERT INTO g.db.ncast VALUES (5, 50), (4294967301, 51)") // 2^32+5 narrows to 5
    sql("CREATE TABLE g.db.ncastk (k INT)")
    sql("INSERT INTO g.db.ncastk VALUES (5)")
    val e = intercept[Exception](
      sql("DELETE FROM g.db.ncast WHERE CAST(id AS INT) IN (SELECT k FROM g.db.ncastk)"))
    assert(e.getMessage.contains("subquer"), e.getMessage)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.ncast").as[Long].head() == 2L,
      "the refused statement must not have deleted anything")
  }

  test("SQL MERGE refuses a source row whose partition tuple moved") {
    // the whole-row SQL route has NOT opted into the Scala API's
    // id-embeds-partition contract: a source row re-homing id=2 from
    // 'even' to 'odd' would insert the new row while the old one
    // survives in its unaffected partition — silent id duplication.
    // The route probes unaffected partitions for the source ids and
    // refuses loudly.
    sql("CREATE TABLE g.db.mvt (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.mvt VALUES (1, 'odd', 10), (2, 'even', 20), (4, 'even', 40)")
    Seq((2L, "odd", 99L)).toDF("id", "p", "v").createOrReplaceTempView("mvt_moved")
    val e = intercept[Exception](
      sql("""MERGE INTO g.db.mvt t USING mvt_moved u ON t.id = u.id
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("unaffected partitions"), e.getMessage)
    // no half-applied state: the target is untouched
    assert(rows(sql("SELECT id, p, v FROM g.db.mvt")) ==
      Set((1L, "odd", 10L), (2L, "even", 20L), (4L, "even", 40L)))
    // the same statement with the tuple at home still merges
    Seq((2L, "even", 99L), (5L, "odd", 50L)).toDF("id", "p", "v")
      .createOrReplaceTempView("mvt_home")
    sql("""MERGE INTO g.db.mvt t USING mvt_home u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(sql("SELECT id, p, v FROM g.db.mvt")) ==
      Set((1L, "odd", 10L), (2L, "even", 99L), (4L, "even", 40L), (5L, "odd", 50L)))
  }

  test("UPDATE ... IN (SELECT) and equality-correlated EXISTS delete by name") {
    sql("CREATE TABLE g.db.usub (id BIGINT, v BIGINT)")
    sql("INSERT INTO g.db.usub SELECT id, id * 10 FROM range(20)")
    sql("CREATE TABLE g.db.ukeys (k BIGINT)")
    sql("INSERT INTO g.db.ukeys VALUES (4), (9)")
    sql("UPDATE g.db.usub SET v = v + 1000 WHERE id IN (SELECT k FROM g.db.ukeys)")
    assert(sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM g.db.usub WHERE id IN (4, 9)")
      .as[Long].head() == 40L + 90L + 2000L)
    // EXISTS with the equality as its only correlation normalizes to
    // the same distributed IN route
    sql("DELETE FROM g.db.usub WHERE EXISTS (SELECT 1 FROM g.db.ukeys WHERE k = id)")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.usub").as[Long].head() == 18L)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.usub WHERE id IN (4, 9)")
      .as[Long].head() == 0L)
  }

  test("VACUUM ... DRY RUN returns the reclaim plan and mutates nothing") {
    sql("CREATE TABLE g.db.vdry (id BIGINT)")
    sql("INSERT INTO g.db.vdry VALUES (1)")
    sql("INSERT INTO g.db.vdry VALUES (2)")
    val planned = spark.sql("VACUUM g.db.vdry RETAIN 1 VERSIONS DRY RUN")
      .as[String].collect().toSeq
    assert(planned.exists(_.contains("_graft_log")),
      s"dead manifests must appear in the plan: $planned")
    // nothing reclaimed: time travel to the oldest version still works
    assert(sql("SELECT COUNT(*) AS n FROM g.db.vdry VERSION AS OF 1").as[Long].head() == 0L)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.vdry").as[Long].head() == 2L)
  }

  test("sqlScript: a final DESCRIBE HISTORY returns its rows") {
    sql("CREATE TABLE g.db.hist (id BIGINT)")
    val out = Snapshot.sqlScript(spark,
      """INSERT INTO g.db.hist VALUES (1);
        |INSERT INTO g.db.hist VALUES (2);
        |DESCRIBE HISTORY g.db.hist""".stripMargin)
    assert(out.isDefined, "a script closing on DESCRIBE HISTORY must return the history")
    assert(out.get.count() == 3L) // create + two inserts
    assert(out.get.columns.contains("version"))
  }

  test("CLUSTER BY is the table's layout policy: plain OPTIMIZE z-orders by it") {
    // declared at CREATE, carried in the manifest, applied by an
    // OPTIMIZE that names no columns — the nightly job needs no
    // per-table knowledge
    sql("CREATE TABLE g.db.clus (id BIGINT, x BIGINT, y BIGINT) CLUSTER BY (x, y)")
    val dir = s"$warehouse/db/clus"
    assert(Snapshot.latestManifest(spark, dir).get.clusterBy == Seq("x", "y"))
    assert(sql("DESCRIBE DETAIL g.db.clus").select("cluster_by").as[String].head() == "x,y")
    // interleaved appends: every file covers the whole (x, y) space
    (0 until 6).foreach { s =>
      sql(s"INSERT INTO g.db.clus SELECT id + ${s * 500}, (id * 37 + $s * 131) % 1000, " +
        s"(id * 91 + $s * 17) % 1000 FROM range(500)")
    }
    val box = col("x").between(100L, 200L) && col("y").between(100L, 200L)
    val before = Snapshot.pruneFiles(spark, dir, box)
    // (the CREATE's zero-row schema stub is always prunable)
    assert(before._1.size >= before._2 - 1, "interleaved appends: nothing skippable")
    // plain OPTIMIZE — no ZORDER BY — picks up the declared clustering
    Snapshot.compact(spark, dir, targetBytes = 24L << 10, minFiles = 2)
    val (kept, total) = Snapshot.pruneFiles(spark, dir, box)
    assert(total > 1 && kept.size < total,
      s"declared clustering must make the box skippable: ${kept.size} of $total")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.clus").as[Long].head() == 3000L)
    // ALTER re-points the policy; CLUSTER BY NONE clears it
    sql("ALTER TABLE g.db.clus CLUSTER BY (id)")
    assert(Snapshot.latestManifest(spark, dir).get.clusterBy == Seq("id"))
    assert(Snapshot.latestManifest(spark, dir).get.operation == "CLUSTER BY")
    sql("ALTER TABLE g.db.clus CLUSTER BY NONE")
    assert(Snapshot.latestManifest(spark, dir).get.clusterBy.isEmpty)
  }

  test("SHOW PARTITIONS and DROP PARTITION through DSv2 partition management") {
    // listing is metadata-only (manifest paths + stats, no data scan);
    // DROP PARTITION routes through the row-level DELETE engine
    sql("CREATE TABLE g.db.parts (id BIGINT, p STRING, d DATE) PARTITIONED BY (p, d)")
    sql("INSERT INTO g.db.parts VALUES " +
      "(1, 'a', DATE'2024-01-01'), (2, 'a', DATE'2024-01-02'), " +
      "(3, 'b', DATE'2024-01-01'), (4, NULL, DATE'2024-01-02')")
    val parts = sql("SHOW PARTITIONS g.db.parts").as[String].collect().sorted
    assert(parts.length == 4, parts.mkString("; "))
    assert(parts.contains("p=a/d=2024-01-01") && parts.contains("p=b/d=2024-01-01"))
    assert(parts.exists(s => s.startsWith("p=null") || s.contains("DEFAULT")),
      s"null partition must list: ${parts.mkString("; ")}")
    // a PARTITION spec filters server-side (typed compare, not strings)
    val onlyA = sql("SHOW PARTITIONS g.db.parts PARTITION (p='a')").as[String].collect()
    assert(onlyA.length == 2 && onlyA.forall(_.startsWith("p=a/")), onlyA.mkString("; "))
    // DROP PARTITION deletes the rows as one snapshot commit
    sql("ALTER TABLE g.db.parts DROP PARTITION (p='b', d='2024-01-01')")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.parts").as[Long].head() == 3L)
    assert(sql("SHOW PARTITIONS g.db.parts").count() == 3L)
    // IF EXISTS on a missing partition is a no-op, not an error
    sql("ALTER TABLE g.db.parts DROP IF EXISTS PARTITION (p='zzz', d='2024-01-01')")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.parts").as[Long].head() == 3L)
  }

  test("TBLPROPERTIES: declared, altered, shown, and read as the vacuum policy") {
    sql("CREATE TABLE g.db.props (id BIGINT) TBLPROPERTIES " +
      "('team'='data', 'graft.vacuum.retainVersions'='3')")
    val dir = s"$warehouse/db/props"
    assert(Snapshot.latestManifest(spark, dir).get.properties ==
      Map("team" -> "data", "graft.vacuum.retainVersions" -> "3"))
    // SHOW TBLPROPERTIES reads loadTable().properties() — stock Spark
    val shown = sql("SHOW TBLPROPERTIES g.db.props").as[(String, String)].collect().toMap
    assert(shown.get("team").contains("data"), shown.toString)
    // SET upserts, UNSET drops (absent-key UNSET is a no-op)
    sql("ALTER TABLE g.db.props SET TBLPROPERTIES ('team'='ml', 'tier'='gold')")
    sql("ALTER TABLE g.db.props UNSET TBLPROPERTIES ('tier', 'never_was')")
    val m1 = Snapshot.latestManifest(spark, dir).get
    assert(m1.properties("team") == "ml" && !m1.properties.contains("tier"))
    assert(m1.operation == "UNSET TBLPROPERTIES")
    // properties are table metadata: they survive data overwrites
    sql("INSERT INTO g.db.props VALUES (1)")
    sql("INSERT OVERWRITE g.db.props VALUES (2)")
    assert(Snapshot.latestManifest(spark, dir).get.properties("team") == "ml")
    assert(sql("DESCRIBE DETAIL g.db.props").select("properties").as[String].head()
      .contains("team=ml"))
    // ≥5 versions exist (each ALTER is ONE commit); a BARE vacuum
    // honours the table's own graft.vacuum.retainVersions=3 policy —
    // no per-statement RETAIN
    assert(sql("DESCRIBE HISTORY g.db.props").count() >= 5L)
    sql("VACUUM g.db.props")
    // retainVersions=3 plus the floor commit
    assert(sql("DESCRIBE HISTORY g.db.props").count() == 4L)
    assert(sql("SELECT id FROM g.db.props").as[Long].collect().toSeq == Seq(2L))
  }

  test("SHALLOW CLONE through SQL: zero-copy fork, reads by name, diverges") {
    sql("CREATE TABLE g.db.csrc (id BIGINT, p STRING) PARTITIONED BY (p)")
    sql("INSERT INTO g.db.csrc SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END FROM range(1000)")
    sql("INSERT INTO g.db.csrc SELECT id + 1000, 'e' FROM range(100)")
    sql("CREATE TABLE g.db.cdst SHALLOW CLONE g.db.csrc")
    // the SELECT resolves by name and rides the NATIVE pruned scan
    // over the clone's external refs
    assert(sql("SELECT COUNT(*) AS n FROM g.db.cdst").as[Long].head() == 1100L)
    val dstDir = s"$warehouse/db/cdst"
    val fs = new org.apache.hadoop.fs.Path(dstDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dstDir), true)
    var parquetBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) parquetBytes += f.getLen
    }
    assert(parquetBytes == 0L, "shallow clone must copy no data")
    // metadata-only catalog surfaces work on the clone too
    assert(sql("SHOW PARTITIONS g.db.cdst").count() == 2L)
    // a version-pinned clone forks the PAST
    sql("CREATE TABLE g.db.cdst1 SHALLOW CLONE g.db.csrc VERSION AS OF 2")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.cdst1").as[Long].head() == 1000L)
    // and TIMESTAMP AS OF pins by commit time (same free-text tail as
    // RESTORE — any timestamp expression the session evaluates)
    val v2micros = Snapshot.manifest(spark, s"$warehouse/db/csrc", 2L).committedAtMicros
    sql("CREATE TABLE g.db.cdst2 SHALLOW CLONE g.db.csrc " +
      s"TIMESTAMP AS OF timestamp_micros(${v2micros}L)")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.cdst2").as[Long].head() == 1000L)
    // divergence: writes to the clone never touch the source
    sql("INSERT INTO g.db.cdst VALUES (9999, 'x')")
    sql("DELETE FROM g.db.cdst WHERE id = 0")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.cdst").as[Long].head() == 1100L)
    assert(sql("SELECT COUNT(*) AS n FROM g.db.csrc").as[Long].head() == 1100L)
  }

  test("OPTIMIZE honours the table's graft.optimize.targetBytes property") {
    sql("CREATE TABLE g.db.otb (id BIGINT) TBLPROPERTIES " +
      "('graft.optimize.targetBytes'='4096')")
    // xxhash64 values defeat parquet's delta/RLE encodings, so the
    // four input files carry real bytes for the size-based packing
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO g.db.otb SELECT xxhash64(id + ${i * 2000}) FROM range(2000)"))
    val dir = s"$warehouse/db/otb"
    // a bare OPTIMIZE (no explicit size) packs to the TABLE's declared
    // 4 KiB target — several output files, where the 128 MiB default
    // would fold everything into one
    sql("OPTIMIZE g.db.otb")
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.files.count(f => m.stats.get(f).forall(_.rows > 0)) > 1,
      s"4 KiB policy target must yield several files, got ${m.files.size}")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.otb").as[Long].head() == 8000L)
  }

  test("CREATE TABLE ... FROM PARQUET imports an existing dir by name") {
    val dir = Files.createTempDirectory("graft-cat-import").toString + "/landing"
    fixture(0 until 200, 1).write.partitionBy("p").parquet(dir)
    sql(s"CREATE TABLE g.db.imp FROM PARQUET '$dir' PARTITIONED BY (p)")
    assert(rows(sql("SELECT id, p, v FROM g.db.imp")) == rows(fixture(0 until 200, 1)))
    assert(sql("SHOW PARTITIONS g.db.imp").count() == 2L)
    // the catalog table root holds only the log; data stayed in place
    val m = Snapshot.latestManifest(spark, s"$warehouse/db/imp").get
    assert(m.operation == "IMPORT" && m.files.forall(_.startsWith("@")))
    sql("DELETE FROM g.db.imp WHERE id = 7")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.imp").as[Long].head() == 199L)
  }

  test("vanilla CREATE statements delegate untouched past the dialect hook") {
    // comments with apostrophes, and dialect hint words inside string
    // literals, must reach the session parser — never crash in (or be
    // eaten by) the dialect lexer
    sql("CREATE TABLE g.db.cmt (id BIGINT) -- don't forget\n")
    sql("INSERT INTO g.db.cmt VALUES (1)")
    sql("CREATE TABLE g.db.lit AS SELECT 'shallow clone from parquet' AS s, 2 AS id")
    assert(sql("SELECT id FROM g.db.lit").as[Long].head() == 2L)
    // multi-key ALTER SET TBLPROPERTIES is ONE commit
    val before = sql("DESCRIBE HISTORY g.db.cmt").count()
    sql("ALTER TABLE g.db.cmt SET TBLPROPERTIES ('a'='1', 'b'='2', 'c'='3')")
    assert(sql("DESCRIBE HISTORY g.db.cmt").count() == before + 1,
      "a multi-key SET TBLPROPERTIES must be one atomic manifest commit")
    // reserved + option keys refuse loudly on both routes
    intercept[Exception](sql("ALTER TABLE g.db.cmt SET TBLPROPERTIES ('version'='9')"))
    intercept[Exception](sql("ALTER TABLE g.db.cmt SET TBLPROPERTIES ('option.paths'='/x')"))
    intercept[Exception](sql("CREATE TABLE g.db.vz (id INT) TBLPROPERTIES ('version'='9')"))
  }

  test("OPTIMIZE maintains the bloom index when graft.bloom.columns is declared") {
    sql("CREATE TABLE g.db.blm (id BIGINT, w STRING) TBLPROPERTIES " +
      "('graft.bloom.columns'='id')")
    // overlapping id ranges in every file: min/max can't prune
    (0 until 4).foreach(k =>
      sql(s"INSERT INTO g.db.blm SELECT id * 4 + $k, CONCAT('w', id * 4 + $k) " +
        "FROM range(500)"))
    val dir = s"$warehouse/db/blm"
    assert(Snapshot.latestManifest(spark, dir).get.blooms.isEmpty)
    // the nightly statement — no per-table knowledge — builds sidecars
    sql("OPTIMIZE g.db.blm")
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.blooms.nonEmpty, "policy bloom refresh must have indexed the files")
    assert(m.files.filter(f => m.stats.get(f).forall(_.rows > 0))
      .forall(m.blooms.contains))
    assert(sql("SELECT w FROM g.db.blm WHERE id = 1337").as[String].head() == "w1337")
    // a later append + OPTIMIZE refreshes ONLY the new files
    sql("INSERT INTO g.db.blm VALUES (99999, 'tail')")
    sql("OPTIMIZE g.db.blm")
    val m2 = Snapshot.latestManifest(spark, dir).get
    assert(m2.files.filter(f => m2.stats.get(f).forall(_.rows > 0))
      .forall(m2.blooms.contains))
    assert(sql("SELECT w FROM g.db.blm WHERE id = 99999").as[String].head() == "tail")
  }

  test("OPTIMIZE FULL localizes a clone so its source can retire") {
    sql("CREATE TABLE g.db.fsrc (id BIGINT, w STRING)")
    sql("INSERT INTO g.db.fsrc SELECT /*+ REPARTITION(1) */ id, CONCAT('w', id) " +
      "FROM range(500)")
    sql("CREATE TABLE g.db.ffork SHALLOW CLONE g.db.fsrc")
    val dir = s"$warehouse/db/ffork"
    // below the compaction threshold: a bare OPTIMIZE leaves the
    // external refs in place …
    sql("OPTIMIZE g.db.ffork")
    assert(Snapshot.latestManifest(spark, dir).get.files.exists(_.startsWith("@")))
    val detail = sql("DESCRIBE DETAIL g.db.ffork")
    assert(detail.select("num_external_files").as[Long].head() > 0L)
    assert(detail.select("external_roots").as[String].head().nonEmpty)
    // … OPTIMIZE FULL marks every partition regardless of file count:
    // the localize-before-retiring-the-source statement
    sql("OPTIMIZE g.db.ffork FULL")
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.files.nonEmpty && m.files.forall(!_.startsWith("@")),
      s"FULL must localize everything: ${m.files.take(3)}")
    val d2 = sql("DESCRIBE DETAIL g.db.ffork")
    assert(d2.select("num_external_files").as[Long].head() == 0L)
    // honesty: RETAINED manifests still reference the source (time
    // travel to pre-FULL versions reads source files) — external_roots
    // stays non-empty until a vacuum drops those versions
    assert(d2.select("external_roots").as[String].head().nonEmpty,
      "retained pre-FULL versions still depend on the source")
    sql("VACUUM g.db.ffork RETAIN 1 VERSIONS")
    assert(sql("DESCRIBE DETAIL g.db.ffork")
      .select("external_roots").as[String].head().isEmpty,
      "after the vacuum severs old versions the table is self-contained")
    assert(sql("SELECT COUNT(*) AS n FROM g.db.ffork").as[Long].head() == 500L)
  }

  test("RENAME into a namespace named like the catalog itself") {
    sql("CREATE NAMESPACE IF NOT EXISTS g.g")
    sql("CREATE TABLE g.g.a (id BIGINT)")
    sql("INSERT INTO g.g.a VALUES (7)")
    sql("ALTER TABLE g.g.a RENAME TO g.g.b")
    // the catalog-segment strip must not ALSO strip the real namespace
    // `g` — the table stays inside it, never at the warehouse root
    assert(Snapshot.isSnapshotTable(spark, s"$warehouse/g/b"),
      "renamed table must live under its namespace directory")
    assert(sql("SELECT id FROM g.g.b").as[Long].head() == 7L)
  }
}
