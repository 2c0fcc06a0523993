package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** DEFAULT column values: CREATE-time and ALTER-time declarations,
  * honored by column-list INSERTs (the unlisted column fills with the
  * default, not null — the reference's constant-filled wide load
  * schemas, consumo_bloques_hora.py:132) and by ADD COLUMN backfill
  * (pre-evolution rows READ the default with zero rewrite — the
  * existence-default contract, frozen at add time). Both SQL front
  * ends: the registry route and the DSv2 catalog route.
  */
class SnapshotDefaultSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-default-wh").toString
    spark.conf.set("spark.sql.catalog.gd", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gd.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gd.db")
    dir
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  test("registry route: CREATE-time DEFAULT fills column-list INSERTs") {
    val root = Files.createTempDirectory("graft-default-reg").toString
    val t = Map("t" -> s"$root/t")
    Snapshot.sql(spark,
      "CREATE TABLE t (id BIGINT, status STRING DEFAULT 'pending', score BIGINT DEFAULT 100)", t)
    Snapshot.sql(spark, "INSERT INTO t (id) SELECT 1", t)
    Snapshot.sql(spark, "INSERT INTO t (id, status) VALUES (2, 'done')", t)
    Snapshot.sql(spark, "INSERT INTO t VALUES (3, NULL, 7)", t) // explicit NULL stays NULL
    assert(Snapshot.read(spark, s"$root/t")
      .as[(Long, Option[String], Option[Long])].collect().toSet ==
      Set((1L, Some("pending"), Some(100L)), (2L, Some("done"), Some(100L)),
        (3L, None, Some(7L))))
  }

  test("ADD COLUMN DEFAULT: pre-evolution rows read the default, later nulls stay null") {
    val root = Files.createTempDirectory("graft-default-add").toString
    val path = s"$root/t"
    val t = Map("t" -> path)
    Snapshot.create(spark, path, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    Snapshot.sql(spark, "ALTER TABLE t ADD COLUMNS (lang STRING DEFAULT 'es')", t)
    // metadata only: the evolution rewrote no file
    val m = Snapshot.latestManifest(spark, path).get
    assert(m.operation == "ADD COLUMNS" && m.colExistsDefault == Map("lang" -> "'es'"))
    // a post-evolution batch with an EXPLICIT null — physically stored,
    // so it must stay null (only missing-in-file backfills)
    Snapshot.append(spark, path,
      Seq((3L, 30L, Some("en")), (4L, 40L, None)).toDF("id", "v", "lang"))
    val want = Set((1L, 10L, Some("es")), (2L, 20L, Some("es")),
      (3L, 30L, Some("en")), (4L, 40L, None))
    // NATIVE path (HadoopFsRelation + parquet reader existence defaults)
    assert(Snapshot.read(spark, path).as[(Long, Long, Option[String])].collect().toSet == want)
    // registry SQL front end reads the same
    assert(Snapshot.sqlQuery(spark, "SELECT id, v, lang FROM t", t)
      .as[(Long, Long, Option[String])].collect().toSet == want)
    // MERGE-ON-READ fallback (active column mapping forces it): the
    // per-group fill must agree with the native readers
    Snapshot.renameColumn(spark, path, "v", "val")
    assert(Snapshot.read(spark, path).as[(Long, Long, Option[String])].collect().toSet == want)
    // and per-file pruning semantics survive: filtering ON the
    // defaulted column finds the backfilled rows
    assert(Snapshot.read(spark, path).where(col("lang") === "es")
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("SET/DROP DEFAULT changes the write default only; the existence default is frozen") {
    val root = Files.createTempDirectory("graft-default-set").toString
    val path = s"$root/t"
    val t = Map("t" -> path)
    Snapshot.create(spark, path, Seq((1L, 10L)).toDF("id", "v"))
    Snapshot.sql(spark, "ALTER TABLE t ADD COLUMNS (tier STRING DEFAULT 'bronze')", t)
    Snapshot.sql(spark, "ALTER TABLE t ALTER COLUMN tier SET DEFAULT 'silver'", t)
    Snapshot.sql(spark, "INSERT INTO t (id, v) VALUES (2, 20)", t)
    // row 1 predates the column: reads the FROZEN add-time default;
    // row 2 was written under the NEW write default
    assert(Snapshot.read(spark, path).as[(Long, Long, String)].collect().toSet ==
      Set((1L, 10L, "bronze"), (2L, 20L, "silver")))
    Snapshot.sql(spark, "ALTER TABLE t ALTER COLUMN tier DROP DEFAULT", t)
    Snapshot.sql(spark, "INSERT INTO t (id, v) VALUES (3, 30)", t)
    assert(Snapshot.read(spark, path).where(col("id") === 3)
      .select("tier").as[Option[String]].head().isEmpty)
    // history still reads the frozen value after the churn
    assert(Snapshot.read(spark, path).where(col("id") === 1)
      .select("tier").as[String].head() == "bronze")
  }

  test("catalog route: DEFAULT through the vanilla analyzer end to end") {
    sql("""CREATE TABLE gd.db.t (id BIGINT, status STRING DEFAULT 'pending',
          |score BIGINT DEFAULT 100) PARTITIONED BY (status)""".stripMargin)
    sql("INSERT INTO gd.db.t (id) VALUES (1)")
    sql("INSERT INTO gd.db.t (id, status) VALUES (2, 'done')")
    assert(sql("SELECT id, status, score FROM gd.db.t")
      .as[(Long, String, Long)].collect().toSet ==
      Set((1L, "pending", 100L), (2L, "done", 100L)))
    // evolve with a default; pre-evolution rows read it by name
    sql("ALTER TABLE gd.db.t ADD COLUMNS (lang STRING DEFAULT 'es')")
    sql("INSERT INTO gd.db.t (id, lang) VALUES (3, 'en')")
    assert(sql("SELECT id, lang FROM gd.db.t").as[(Long, String)].collect().toSet ==
      Set((1L, "es"), (2L, "es"), (3L, "en")))
    // SET DEFAULT via catalog ALTER; DROP DEFAULT reverts to null-fill
    sql("ALTER TABLE gd.db.t ALTER COLUMN lang SET DEFAULT 'pt'")
    sql("INSERT INTO gd.db.t (id) VALUES (4)")
    sql("ALTER TABLE gd.db.t ALTER COLUMN lang DROP DEFAULT")
    sql("INSERT INTO gd.db.t (id) VALUES (5)")
    assert(sql("SELECT lang FROM gd.db.t WHERE id = 4").as[String].head() == "pt")
    assert(sql("SELECT lang FROM gd.db.t WHERE id = 5")
      .as[Option[String]].head().isEmpty)
  }

  test("MERGE INSERT arm fills unlisted columns with their default") {
    val root = Files.createTempDirectory("graft-default-merge").toString
    val path = s"$root/t"
    val t = Map("t" -> path)
    Snapshot.sql(spark,
      "CREATE TABLE t (id BIGINT, v BIGINT, src STRING DEFAULT 'merge')", t)
    Snapshot.sql(spark, "INSERT INTO t VALUES (1, 10, 'seed')", t)
    Seq((1L, 11L), (2L, 22L)).toDF("id", "v").createOrReplaceTempView("dflt_updates")
    Snapshot.sql(spark,
      """MERGE INTO t USING dflt_updates u ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET v = u.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (u.id, u.v)""".stripMargin, t)
    assert(Snapshot.read(spark, path).as[(Long, Long, String)].collect().toSet ==
      Set((1L, 11L, "seed"), (2L, 22L, "merge")))
  }

  test("validation: non-constant, non-deterministic and subquery defaults refuse") {
    val root = Files.createTempDirectory("graft-default-bad").toString
    val path = s"$root/t"
    Snapshot.create(spark, path, Seq((1L, 10L)).toDF("id", "v"))
    intercept[IllegalArgumentException](
      Snapshot.addColumns(spark, path, Seq(org.apache.spark.sql.types.StructField(
        "w", org.apache.spark.sql.types.LongType)), Map("w" -> "v + 1"))) // column ref
    intercept[IllegalArgumentException](
      Snapshot.setColumnDefault(spark, path, "v", Some("rand()")))
    intercept[IllegalArgumentException](
      Snapshot.setColumnDefault(spark, path, "v", Some("(SELECT 1)")))
    // constant EXPRESSIONS are fine and fold once (1 + 2 -> 3)
    Snapshot.addColumns(spark, path, Seq(org.apache.spark.sql.types.StructField(
      "w", org.apache.spark.sql.types.LongType)), Map("w" -> "1 + 2"))
    val m = Snapshot.latestManifest(spark, path).get
    assert(m.colExistsDefault("w") == "3L" || m.colExistsDefault("w") == "3",
      m.colExistsDefault("w"))
    assert(Snapshot.read(spark, path).select("w").as[Long].head() == 3L)
  }
}
