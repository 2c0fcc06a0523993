package graft

import java.nio.file.Files
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** SQL-text materialization and DDL — the half of the reference's SQL
  * surface beyond row-level DML: `QueryJobConfig(destination=…)` with
  * WRITE_TRUNCATE is literally `CREATE OR REPLACE TABLE … AS SELECT`
  * (liveod_editorial.py:282-359), appends into an existing destination
  * are `INSERT INTO … SELECT`, and autodetect schema growth is
  * `ALTER TABLE … ADD COLUMNS`. Also the SELECT query path with
  * registered snapshot scans and time travel (`VERSION AS OF`,
  * `FOR SYSTEM_TIME AS OF`).
  */
class SnapshotSqlDdlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-sqlddl-$tag").toString + "/t"

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "p", "v").as[(Long, String, Long)].collect().toSet

  private def fixture(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", i.toLong * 10))
      .toDF("id", "p", "v")

  test("CTAS creates a partitioned snapshot table from registered scans") {
    val src = tmp("ctas-src"); val dest = tmp("ctas-dest")
    Snapshot.create(spark, src, fixture(0 until 100), Seq("p"))
    val reg = Map("src" -> src, "dest" -> dest)
    val v = Snapshot.sql(spark,
      "CREATE TABLE dest PARTITIONED BY (p) AS SELECT id, p, v FROM src WHERE id < 50",
      reg)
    assert(v == 1L)
    val m = Snapshot.latestManifest(spark, dest).get
    assert(m.partitionCols == Seq("p"))
    assert(rows(Snapshot.read(spark, dest)) == rows(fixture(0 until 50)))
    // plain CREATE refuses a second time; IF NOT EXISTS is a no-op
    val dup = intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "CREATE TABLE dest AS SELECT * FROM src", reg)
    }
    assert(dup.getMessage.contains("already exists"))
    assert(Snapshot.sql(spark,
      "CREATE TABLE IF NOT EXISTS dest AS SELECT * FROM src", reg) == 1L)
    assert(Snapshot.read(spark, dest).count() == 50L)
  }

  test("TBLPROPERTIES ride CREATE/CTAS through the registry route") {
    val src = tmp("props-src"); val dest = tmp("props-dest"); val ddl = tmp("props-ddl")
    Snapshot.create(spark, src, fixture(0 until 10), Seq("p"))
    val reg = Map("src" -> src, "dest" -> dest, "ddl" -> ddl)
    Snapshot.sql(spark,
      "CREATE TABLE dest TBLPROPERTIES ('owner_team'='etl') AS SELECT * FROM src", reg)
    assert(Snapshot.latestManifest(spark, dest).get.properties == Map("owner_team" -> "etl"))
    // plain DDL create too, and a REPLACE upserts new declarations in
    Snapshot.sql(spark,
      "CREATE TABLE ddl (id BIGINT) TBLPROPERTIES ('graft.vacuum.retainDays'='7')", reg)
    assert(Snapshot.latestManifest(spark, ddl).get
      .properties("graft.vacuum.retainDays") == "7")
    Snapshot.sql(spark,
      "CREATE OR REPLACE TABLE dest TBLPROPERTIES ('tier'='gold') AS SELECT * FROM src", reg)
    // REPLACE REDEFINES: the declared set replaces the old one whole
    val m = Snapshot.latestManifest(spark, dest).get
    assert(m.properties == Map("tier" -> "gold"))
    // … while a REPLACE that declares NO properties keeps the set
    Snapshot.sql(spark, "CREATE OR REPLACE TABLE dest AS SELECT * FROM src", reg)
    assert(Snapshot.latestManifest(spark, dest).get.properties == Map("tier" -> "gold"))
  }

  test("FROM PARQUET import through the registry route") {
    val data = java.nio.file.Files.createTempDirectory("graft-reg-import").toString + "/d"
    val table = tmp("imp-reg")
    fixture(0 until 60).write.partitionBy("p").parquet(data)
    val reg = Map("t" -> table)
    Snapshot.sql(spark, s"CREATE TABLE t FROM PARQUET '$data' PARTITIONED BY (p)", reg)
    assert(rows(Snapshot.read(spark, table)) == rows(fixture(0 until 60)))
    assert(Snapshot.latestManifest(spark, table).get.partitionCols == Seq("p"))
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target, then upserts") {
    val dir = tmp("mse"); val src = tmp("mse-src")
    Snapshot.create(spark, dir, fixture(0 until 10), Seq("p"))
    // source carries an EXTRA column w the target lacks
    Snapshot.create(spark, src,
      (8 until 14).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd",
        i.toLong * 10 + 5, s"w$i")).toDF("id", "p", "v", "w"))
    val reg = Map("t" -> dir, "s" -> src)
    Snapshot.sql(spark,
      """MERGE WITH SCHEMA EVOLUTION INTO t USING s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, reg)
    val out = Snapshot.read(spark, dir)
    assert(out.columns.toSeq == Seq("id", "p", "v", "w"))
    assert(out.count() == 14L)
    // matched rows took the source values incl. the new column …
    assert(out.where(col("id") === 9L).select("v", "w")
      .as[(Long, String)].head() == ((95L, "w9")))
    // … untouched pre-evolution rows read the new column as null
    assert(out.where(col("id") === 3L).select("w").as[String].head() == null)
    assert(out.where(col("id") === 13L).select("w").as[String].head() == "w13")
  }

  test("SHALLOW CLONE through the registry route") {
    val src = tmp("clone-src"); val dst = tmp("clone-dst"); val dts = tmp("clone-dts")
    Snapshot.create(spark, src, fixture(0 until 100), Seq("p"))
    val reg = Map("src" -> src, "dst" -> dst, "dts" -> dts)
    Snapshot.sql(spark, "CREATE TABLE dst SHALLOW CLONE src", reg)
    assert(rows(Snapshot.read(spark, dst)) == rows(fixture(0 until 100)))
    assert(Snapshot.latestManifest(spark, dst).get.files.forall(_.startsWith("@")))
    // TIMESTAMP AS OF pins the fork to the version live at that time
    val v1micros = Snapshot.latestManifest(spark, src).get.committedAtMicros
    Snapshot.append(spark, src, fixture(100 until 120))
    Snapshot.sql(spark,
      s"CREATE TABLE dts SHALLOW CLONE src TIMESTAMP AS OF timestamp_micros(${v1micros}L)",
      reg)
    assert(rows(Snapshot.read(spark, dts)) == rows(fixture(0 until 100)))
  }

  test("CREATE OR REPLACE is the WRITE_TRUNCATE materialization, history kept") {
    // the liveod_editorial.py:282-359 shape: a UNION ALL over sources
    // materialized into a destination table, truncate semantics
    val a = tmp("cor-a"); val b = tmp("cor-b"); val dest = tmp("cor-dest")
    Snapshot.create(spark, a, fixture(0 until 10), Seq("p"))
    Snapshot.create(spark, b, fixture(100 until 110), Seq("p"))
    val reg = Map("ta" -> a, "tb" -> b, "dest" -> dest)
    val sql =
      """CREATE OR REPLACE TABLE dest AS
        |SELECT id, p, v FROM ta WHERE p = 'even'
        |UNION ALL
        |SELECT id, p, v FROM tb WHERE p = 'odd'
        |""".stripMargin
    assert(Snapshot.sql(spark, sql, reg) == 1L)
    val expect1 = rows(fixture(0 until 10)).filter(_._2 == "even") ++
      rows(fixture(100 until 110)).filter(_._2 == "odd")
    assert(rows(Snapshot.read(spark, dest)) == expect1)
    // second run replaces atomically: version 2, version 1 still reads
    Snapshot.append(spark, a, fixture(10 until 12))
    assert(Snapshot.sql(spark, sql, reg) == 2L)
    val expect2 = rows(fixture(0 until 12)).filter(_._2 == "even") ++
      rows(fixture(100 until 110)).filter(_._2 == "odd")
    assert(rows(Snapshot.read(spark, dest)) == expect2)
    assert(rows(Snapshot.readVersion(spark, dest, 1)) == expect1)
    // REPLACE of a missing table refuses; OR CREATE creates
    val missing = tmp("cor-miss")
    val norepl = intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "REPLACE TABLE missing AS SELECT * FROM ta",
        reg + ("missing" -> missing))
    }
    assert(norepl.getMessage.contains("no table"))
  }

  test("INSERT INTO appends positionally; a column list null-fills the rest") {
    val dir = tmp("ins"); val src = tmp("ins-src")
    Snapshot.create(spark, dir, fixture(0 until 10), Seq("p"))
    Snapshot.create(spark, src, fixture(100 until 105), Seq("p"))
    val reg = Map("t" -> dir, "s" -> src)
    assert(Snapshot.sql(spark, "INSERT INTO t SELECT id, p, v FROM s", reg) == 2L)
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 10)) ++ rows(fixture(100 until 105)))
    // explicit column list: unlisted v inserts as null
    Snapshot.sql(spark, "INSERT INTO t (id, p) SELECT id + 1000, p FROM s", reg)
    assert(Snapshot.read(spark, dir).where(col("id") >= 1100 && col("v").isNull)
      .count() == 5L)
    // arity mismatch refuses, nothing committed
    val v0 = Snapshot.latestVersion(spark, dir).get
    val bad = intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "INSERT INTO t (id, p) SELECT id FROM s", reg)
    }
    assert(bad.getMessage.contains("target list"))
    assert(Snapshot.latestVersion(spark, dir).contains(v0))
    // INSERT OVERWRITE is the truncate-and-load twin
    Snapshot.sql(spark, "INSERT OVERWRITE t SELECT id, p, v FROM s", reg)
    assert(rows(Snapshot.read(spark, dir)) == rows(fixture(100 until 105)))
  }

  test("ALTER TABLE ADD COLUMNS is a metadata-only schema commit") {
    val dir = tmp("addcol")
    Snapshot.create(spark, dir, fixture(0 until 10), Seq("p"))
    val filesBefore = Snapshot.latestManifest(spark, dir).get.files
    val reg = Map("t" -> dir)
    val v = Snapshot.sql(spark, "ALTER TABLE t ADD COLUMNS (tag STRING, score BIGINT)", reg)
    assert(v == 2L)
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.files == filesBefore, "schema evolution must write no data files")
    val df = Snapshot.read(spark, dir)
    assert(df.columns.toSeq == Seq("id", "p", "v", "tag", "score"))
    assert(df.where(col("tag").isNull && col("score").isNull).count() == 10L)
    // the evolved column is insertable from SQL text
    fixture(100 until 101).withColumn("tag", lit("new")).withColumn("score", lit(7L))
      .createOrReplaceTempView("addcol_src")
    Snapshot.sql(spark, "INSERT INTO t SELECT id, p, v, tag, score FROM addcol_src", reg)
    assert(Snapshot.read(spark, dir).where(col("tag") === "new").count() == 1L)
    // duplicate and clashing names refuse
    val clash = intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "ALTER TABLE t ADD COLUMNS (TAG STRING)", reg)
    }
    assert(clash.getMessage.contains("already exist"))
  }

  test("SELECT with VERSION AS OF / FOR SYSTEM_TIME AS OF reads pinned versions") {
    val dir = tmp("tt")
    Snapshot.create(spark, dir, fixture(0 until 5), Seq("p"))
    val t1 = System.currentTimeMillis() * 1000L
    Thread.sleep(5)
    Snapshot.append(spark, dir, fixture(5 until 10))
    val reg = Map("t" -> dir)
    assert(Snapshot.sqlQuery(spark,
      "SELECT id, p, v FROM t VERSION AS OF 1", reg).count() == 5L)
    assert(rows(Snapshot.sqlQuery(spark, "SELECT id, p, v FROM t", reg)) ==
      rows(fixture(0 until 10)))
    // SYSTEM_TIME pins the newest commit at-or-before the instant;
    // the literal goes through parser-grade timestamp evaluation
    val iso = java.time.Instant.ofEpochMilli(t1 / 1000L).toString
    assert(Snapshot.sqlQuery(spark,
      s"SELECT id, p, v FROM t FOR SYSTEM_TIME AS OF '$iso'", reg).count() == 5L)
    // joins between a pinned and a live read of the SAME table work
    val joined = Snapshot.sqlQuery(spark,
      "SELECT cur.id FROM t cur LEFT ANTI JOIN (SELECT id FROM t VERSION AS OF 1) old " +
        "ON cur.id = old.id", reg)
    assert(joined.as[Long].collect().toSet == (5L until 10L).toSet)
    // time travel over an UNREGISTERED name refuses in Spark's analyzer
    intercept[Exception] {
      Snapshot.sqlQuery(spark, "SELECT * FROM nope VERSION AS OF 1", reg).collect()
    }
  }

  test("sqlQuery plans the native pruned scan, and mixes with temp views") {
    val dir = tmp("scan")
    Snapshot.create(spark, dir, fixture(0 until 100), Seq("p"))
    val reg = Map("t" -> dir)
    val df = Snapshot.sqlQuery(spark,
      "SELECT id, v FROM t WHERE id >= 90", reg)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SnapshotFileIndex") &&
      plan.contains("GreaterThanOrEqual(id,90)") && plan.contains("PushedFilters: ["),
      plan.take(800))
    fixture(0 until 3).createOrReplaceTempView("ddl_view")
    val mixed = Snapshot.sqlQuery(spark,
      "SELECT t.id FROM t JOIN ddl_view w ON t.id = w.id", reg)
    assert(mixed.as[Long].collect().toSet == Set(0L, 1L, 2L))
  }

  test("CTAS refuses unknown targets and non-identity partitioning") {
    val src = tmp("ref-src")
    Snapshot.create(spark, src, fixture(0 until 5), Seq("p"))
    val reg = Map("src" -> src)
    val unknown = intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "CREATE TABLE nowhere AS SELECT * FROM src", reg)
    }
    assert(unknown.getMessage.contains("unknown table 'nowhere'"))
    val dest = tmp("ref-dest")
    val bucket = intercept[IllegalArgumentException] {
      Snapshot.sql(spark,
        "CREATE TABLE dest PARTITIONED BY (bucket(4, id)) AS SELECT * FROM src",
        reg + ("dest" -> dest))
    }
    assert(bucket.getMessage.contains("identity"))
  }

  test("VACUUM / OPTIMIZE / DESCRIBE HISTORY route maintenance through SQL text") {
    val dir = tmp("maint")
    // three commits of deliberately small files so OPTIMIZE has work
    Snapshot.create(spark, dir, fixture(0 until 40).repartition(4), Seq("p"))
    Snapshot.append(spark, dir, fixture(100 until 140).repartition(4))
    Snapshot.append(spark, dir, fixture(200 until 240).repartition(4))
    val reg = Map("t" -> dir)
    val want = rows(Snapshot.read(spark, dir))

    // DESCRIBE HISTORY: one row per version, live row counts included
    val hist = Snapshot.sqlQuery(spark, "DESCRIBE HISTORY t", reg)
    assert(hist.select("version").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(hist.where(col("version") === 3).select("num_rows").as[Long].head() == 120L)

    // OPTIMIZE (with a ZORDER clause): files pack, content identical
    val filesBefore = Snapshot.latestManifest(spark, dir).get.files.size
    val vOpt = Snapshot.sql(spark, "OPTIMIZE t ZORDER BY (id)", reg)
    assert(vOpt == 4L)
    val mOpt = Snapshot.latestManifest(spark, dir).get
    assert(mOpt.files.size < filesBefore)
    assert(rows(Snapshot.read(spark, dir)) == want)

    // VACUUM RETAIN 1 VERSIONS: old manifests drop, latest still reads
    Snapshot.sql(spark, "VACUUM t RETAIN 1 VERSIONS", reg)
    assert(Snapshot.versions(spark, dir) == Seq(4L, 5L)) // v5 = the floor commit
    assert(rows(Snapshot.read(spark, dir)) == want)

    // unknown table refuses with the registry message
    val unknown = intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "VACUUM nope", reg)
    }
    assert(unknown.getMessage.contains("unknown table"))
  }

  test("sqlScript runs a whole statement sequence; final SELECT is the result") {
    val src = tmp("script-src"); val dest = tmp("script-dest")
    Snapshot.create(spark, src, fixture(0 until 60), Seq("p"))
    val reg = Map("src" -> src, "dest" -> dest)
    val out = Snapshot.sqlScript(spark,
      """-- materialize the evens; a ';' in this comment must not split
        |CREATE OR REPLACE TABLE dest PARTITIONED BY (p) AS
        |SELECT id, p, v FROM src WHERE p = 'even';
        |
        |INSERT INTO dest SELECT id, p, v FROM src WHERE p = 'odd' AND id < 10;
        |DELETE FROM dest WHERE id = 0;
        |UPDATE dest SET v = v + 1 WHERE id = 2;
        |/* block comment; also unsplit */
        |SELECT p, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv
        |FROM dest GROUP BY p ORDER BY p;
        |""".stripMargin, reg).get
    val got = out.as[(String, Long, Long)].collect().toSeq
    // evens 2..58 (0 deleted) + odds 1..9; v = 10*id except id=2 -> 21
    val evens = (2 to 58 by 2).map(_.toLong)
    val odds = (1 to 9 by 2).map(_.toLong)
    assert(got == Seq(
      ("even", evens.size.toLong, evens.map(_ * 10).sum + 1),
      ("odd", odds.size.toLong, odds.map(_ * 10).sum)))

    // a SELECT that is not last refuses (its result set would drop)
    val mid = intercept[IllegalArgumentException] {
      Snapshot.sqlScript(spark,
        "SELECT * FROM src; DELETE FROM dest WHERE id = 4", reg)
    }
    assert(mid.getMessage.contains("final statement"))

    // a script of pure statements returns None and still commits
    assert(Snapshot.sqlScript(spark, "DELETE FROM dest WHERE id = 4;", reg).isEmpty)
    assert(Snapshot.read(spark, dest).where(col("id") === 4).count() == 0)
  }

  test("TRUNCATE TABLE empties atomically with time travel intact; DROP TABLE removes") {
    val dir = tmp("trunc")
    Snapshot.create(spark, dir, fixture(0 until 30), Seq("p"))
    val reg = Map("t" -> dir)
    val v = Snapshot.sql(spark, "TRUNCATE TABLE t", reg)
    assert(v == 2L)
    val after = Snapshot.read(spark, dir)
    assert(after.count() == 0 && after.columns.toSeq == Seq("id", "p", "v"))
    assert(rows(Snapshot.readVersion(spark, dir, 1)) == rows(fixture(0 until 30)))
    // refill works against the preserved schema + partitioning
    Snapshot.sql(spark, "INSERT INTO t SELECT id, p, v FROM t VERSION AS OF 1", reg)
    assert(rows(Snapshot.read(spark, dir)) == rows(fixture(0 until 30)))

    Snapshot.sql(spark, "DROP TABLE t", reg)
    assert(Snapshot.latestVersion(spark, dir).isEmpty)
    // IF EXISTS tolerates the gone table; bare DROP refuses
    Snapshot.sql(spark, "DROP TABLE IF EXISTS t", reg)
    assert(intercept[IllegalArgumentException] {
      Snapshot.sql(spark, "DROP TABLE t", reg)
    }.getMessage.contains("no snapshot table"))
  }

  test("table_changes TVF serves the change feed from plain SQL") {
    val dir = tmp("tvf")
    Snapshot.create(spark, dir, fixture(0 until 40), Seq("p"))
    // touch only the evens: merge doubles v for even ids < 10
    graft.operators.Writers.mergeByIdWritePartitioned(spark, dir,
      (0 until 10 by 2).map(i => (i.toLong, "even", i.toLong * 20)).toDF("id", "p", "v"),
      "id", "p")
    val reg = Map("t" -> dir)
    // versions are INCLUSIVE and rows arrive per-commit reconciled and
    // stamped — the standard CDC TVF contract (same as the streaming
    // feed): version 2 alone is the merge's net changes
    val got = Snapshot.sqlQuery(spark,
      """SELECT _change_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM table_changes('t', 2, 2) GROUP BY 1 ORDER BY 1""".stripMargin, reg)
      .as[(String, Long)].collect().toSeq
    val want = Snapshot.readChanges(spark, dir, 1L, 2L, net = true)
      .groupBy("_change_type").count()
      .orderBy("_change_type").as[(String, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // from-INCLUSIVE with no end: the create commit's inserts plus the
    // merge's changes, each stamped with its own commit version
    val byVersion = Snapshot.sqlQuery(spark,
      """SELECT _commit_version, CAST(COUNT(*) AS BIGINT) AS n
        |FROM table_changes('t', 1) GROUP BY 1 ORDER BY 1""".stripMargin, reg)
      .as[(Long, Long)].collect().toSeq
    assert(byVersion == Seq(1L -> 40L, 2L -> want.map(_._2).sum))
    // refusals: unknown table, non-literal version
    assert(intercept[IllegalArgumentException] {
      Snapshot.sqlQuery(spark, "SELECT * FROM table_changes('nope', 1, 2)", reg)
    }.getMessage.toLowerCase.contains("table"))
    assert(intercept[IllegalArgumentException] {
      Snapshot.sqlQuery(spark, "SELECT * FROM table_changes('t', 1 + 1, 3)", reg)
    }.getMessage.contains("integer literal"))
  }

  test("splitStatements respects quotes, escapes and comments") {
    import graft.operators.SnapshotSql.splitStatements
    assert(splitStatements("a;b;;c;") == Seq("a", "b", "c"))
    assert(splitStatements("SELECT ';' AS x; SELECT 2") ==
      Seq("SELECT ';' AS x", "SELECT 2"))
    assert(splitStatements("SELECT 'it''s; fine'; SELECT 2") ==
      Seq("SELECT 'it''s; fine'", "SELECT 2"))
    assert(splitStatements("SELECT \"a;b\" FROM t; DELETE FROM t") ==
      Seq("SELECT \"a;b\" FROM t", "DELETE FROM t"))
    assert(splitStatements("SELECT `odd;name` FROM t") ==
      Seq("SELECT `odd;name` FROM t"))
    assert(splitStatements("SELECT '\\';' AS x; SELECT 2") ==
      Seq("SELECT '\\';' AS x", "SELECT 2"))
    assert(splitStatements("-- c1; still comment\nSELECT 1; /* c2; */ SELECT 2") ==
      Seq("-- c1; still comment\nSELECT 1", "/* c2; */ SELECT 2"))
  }

  test("DROP COLUMN IF EXISTS tolerates a repeated name (the set shrinks as it drops)") {
    val t = tmp("dropdup")
    val reg = Map("t" -> t)
    Snapshot.create(spark, t, fixture(0 until 4))
    // the second `a` must see the first drop, not the pre-statement
    // schema — IF EXISTS means the statement succeeds either way
    Snapshot.sql(spark, "ALTER TABLE t DROP COLUMN IF EXISTS v, v", reg)
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("id", "p"))
    // without IF EXISTS a repeated name still refuses on the second drop
    intercept[IllegalArgumentException](
      Snapshot.sql(spark, "ALTER TABLE t DROP COLUMN p, p", reg))
  }

  test("CREATE TABLE (column list) declares an empty table; INSERT VALUES fills it") {
    val t = tmp("create")
    val reg = Map("tnew" -> t)
    Snapshot.sql(spark,
      "CREATE TABLE tnew (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)", reg)
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.partitionCols == Seq("p"))
    assert(Snapshot.read(spark, t).columns.toSeq == Seq("id", "p", "v"))
    assert(Snapshot.read(spark, t).count() == 0)
    // literal VALUES ride the existing INSERT routing
    Snapshot.sql(spark, "INSERT INTO tnew VALUES (1, 'even', 10), (2, 'odd', 20)", reg)
    assert(rows(Snapshot.read(spark, t)) == Set((1L, "even", 10L), (2L, "odd", 20L)))
    // IF NOT EXISTS is a no-op; a bare re-create refuses
    Snapshot.sql(spark, "CREATE TABLE IF NOT EXISTS tnew (id BIGINT)", reg)
    assert(Snapshot.read(spark, t).count() == 2)
    intercept[IllegalArgumentException](
      Snapshot.sql(spark, "CREATE TABLE tnew (id BIGINT)", reg))
    // a whole declare-then-load script, the ported-job shape
    val t2 = tmp("create2")
    val out = Snapshot.sqlScript(spark,
      """CREATE TABLE t2 (k BIGINT, w STRING);
        |INSERT INTO t2 VALUES (7, 'x');
        |INSERT INTO t2 VALUES (8, 'y');
        |SELECT k, w FROM t2 ORDER BY k""".stripMargin, Map("t2" -> t2))
    assert(out.get.as[(Long, String)].collect().toSeq == Seq(7L -> "x", 8L -> "y"))
  }
}
