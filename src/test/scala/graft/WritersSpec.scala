package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Writers

class WritersSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-writers").toString

  test("K2 replaceWindow rewrites only the partitions present in the new data, idempotently") {
    val path = tmp() + "/t"
    val day1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0)).toDF("fecha", "id", "v")
    val day2 = Seq(("2024-01-02", 3L, 30.0)).toDF("fecha", "id", "v")
    Writers.appendPartitioned(day1.unionByName(day2), path, "fecha")
    // re-ingest day2 with corrected values — day1 must survive untouched
    val fixed = Seq(("2024-01-02", 3L, 99.0), ("2024-01-02", 4L, 1.0)).toDF("fecha", "id", "v")
    Writers.replaceWindow(fixed, path, "fecha")
    Writers.replaceWindow(fixed, path, "fecha") // rerun = idempotent
    val out = spark.read.parquet(path)
    assert(out.count() == 4)
    assert(out.where($"fecha" === "2024-01-01").count() == 2)
    assert(out.where($"fecha" === "2024-01-02").as[(Long, Double, String)].collect().map(_._2).sorted.toSeq == Seq(1.0, 99.0))
  }

  test("K2 per-periodo dual window: daily replaced from cutoff, mensual from month start, idempotently") {
    val path = tmp() + "/t"
    def ts(s: String) = s"$s 00:00:00"
    // existing table: dailies across two months + the two month rows
    val existing = Seq(
      ("diario", ts("2024-05-30"), 1.0), ("diario", ts("2024-06-10"), 2.0),
      ("diario", ts("2024-06-20"), 3.0), ("mensual", ts("2024-05-01"), 50.0),
      ("mensual", ts("2024-06-01"), 60.0)
    ).toDF("periodo", "fecha", "v").withColumn("fecha", $"fecha".cast("timestamp"))
    existing.write.parquet(path)
    // re-ingest with cutoff 2024-06-15: dailies >= 06-15 replaced,
    // mensual June recomputed WHOLE (from 06-01) — the asymmetry
    val replacement = Seq(
      ("diario", ts("2024-06-20"), 33.0), ("mensual", ts("2024-06-01"), 66.0)
    ).toDF("periodo", "fecha", "v").withColumn("fecha", $"fecha".cast("timestamp"))
    val cutoff = lit("2024-06-15").cast("timestamp")
    Writers.replacePeriodWindowWrite(spark, path, replacement, "fecha", "periodo", cutoff)
    Writers.replacePeriodWindowWrite(spark, path, replacement, "fecha", "periodo", cutoff) // rerun
    val out = spark.read.parquet(path).select("periodo", "fecha", "v")
      .as[(String, java.sql.Timestamp, Double)].collect()
      .map { case (p, f, v) => (p, f.toString.take(10), v) }.toSet
    assert(out == Set(
      ("diario", "2024-05-30", 1.0),   // before cutoff: kept
      ("diario", "2024-06-10", 2.0),   // before cutoff, same month: kept
      ("diario", "2024-06-20", 33.0),  // inside window: replaced
      ("mensual", "2024-05-01", 50.0), // prior month: kept
      ("mensual", "2024-06-01", 66.0)  // cutoff month: replaced whole
    ))
  }

  test("K2 dual-window publication is physically partitioned on (periodo, fecha)") {
    val path = tmp() + "/t"
    def ts(s: String) = s"$s 00:00:00"
    val rows = Seq(("diario", ts("2024-06-10"), 1.0), ("mensual", ts("2024-06-01"), 2.0))
      .toDF("periodo", "fecha", "v").withColumn("fecha", $"fecha".cast("timestamp"))
    Writers.replacePeriodWindowWrite(spark, path, rows, "fecha", "periodo",
      lit("2024-06-01").cast("timestamp"))
    // partition pruning at 100 TB needs REAL hive-layout directories
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("periodo=diario", "periodo=mensual"))
    assert(new java.io.File(path + "/periodo=diario").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("fecha=")))
    // read-back recovers values and types through partition inference
    val back = spark.read.parquet(path).select("periodo", "fecha", "v")
      .as[(String, java.sql.Timestamp, Double)].collect()
      .map { case (p, f, v) => (p, f.toString.take(10), v) }.toSet
    assert(back == Set(("diario", "2024-06-10", 1.0), ("mensual", "2024-06-01", 2.0)))
  }

  test("K2 dual-window rerun preserves a STRING fecha through partition-type inference") {
    // partition read-back infers 'yyyy-MM-dd' strings as DATE; the
    // writer must cast the read-back columns to the replacement's
    // declared types or the rerun's doomed-filter/union see drifted ones
    val path = tmp() + "/t"
    val rows = Seq(("diario", "2024-06-10", 1.0), ("diario", "2024-06-20", 2.0))
      .toDF("periodo", "fecha", "v")
    Writers.replacePeriodWindowWrite(spark, path, rows, "fecha", "periodo", lit("2024-06-01"))
    val fixed = Seq(("diario", "2024-06-20", 22.0)).toDF("periodo", "fecha", "v")
    Writers.replacePeriodWindowWrite(spark, path, fixed, "fecha", "periodo", lit("2024-06-15"))
    val back = spark.read.parquet(path)
    // values correct AND the data round-trips usably as strings
    assert(back.select($"fecha".cast("string"), $"v").as[(String, Double)].collect().toSet ==
      Set(("2024-06-10", 1.0), ("2024-06-20", 22.0)))
  }

  test("K3 partition-restricted merge: assertIdsLocal detects an id that moved partitions") {
    val path = tmp() + "/t"
    val base = Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b")).toDF("fecha", "id", "v")
    Writers.mergeByIdWritePartitioned(spark, path, base, "id", "fecha")
    // id 2 arrives under a DIFFERENT fecha: the contract is violated
    val moved = Seq(("2024-01-03", 2L, "B")).toDF("fecha", "id", "v")
    intercept[IllegalArgumentException] {
      Writers.mergeByIdWritePartitioned(spark, path, moved, "id", "fecha", assertIdsLocal = true)
    }
    // without the (full-scan) assertion the documented failure mode is
    // a duplicate id — the old partition is never opened
    Writers.mergeByIdWritePartitioned(spark, path, moved, "id", "fecha")
    assert(spark.read.parquet(path).where($"id" === 2L).count() == 2)
  }

  test("K3 partition-restricted merge into the NULL partition keeps its untouched rows") {
    // three-valued isin: with a naive affected-read, a merge touching
    // the null partition reads an EMPTY affected slice and the dynamic
    // overwrite then deletes the partition's kept rows
    val path = tmp() + "/t"
    val base = Seq((null.asInstanceOf[String], 1L, "a"), (null.asInstanceOf[String], 2L, "b"),
      ("2024-01-02", 3L, "c")).toDF("fecha", "id", "v")
    Writers.mergeByIdWritePartitioned(spark, path, base, "id", "fecha")
    val updates = Seq((null.asInstanceOf[String], 2L, "B")).toDF("fecha", "id", "v")
    Writers.mergeByIdWritePartitioned(spark, path, updates, "id", "fecha", assertIdsLocal = true)
    val out = spark.read.parquet(path).select("id", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c")) // id 1 survived the null-partition rewrite
  }

  test("K3 mergeById: updates win on collision, unmatched target rows survive") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "B"), (3L, "C")).toDF("id", "v")
    val merged = Writers.mergeById(target, updates, "id")
      .as[(Long, String)].collect().toMap
    assert(merged == Map(1L -> "a", 2L -> "B", 3L -> "C"))
  }

  test("K3 mergeByIdWrite persists through the staging swap and is rerunnable") {
    val path = tmp() + "/t"
    Writers.mergeByIdWrite(spark, path, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
    Writers.mergeByIdWrite(spark, path, Seq((2L, "B"), (3L, "C")).toDF("id", "v"), "id")
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "C"))
  }

  test("K3 partition-restricted merge rewrites only touched partitions") {
    val path = tmp() + "/t"
    val base = Seq(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"), ("2024-01-02", 3L, "c"))
      .toDF("fecha", "id", "v")
    Writers.mergeByIdWritePartitioned(spark, path, base, "id", "fecha")
    val untouchedFiles = new java.io.File(path + "/fecha=2024-01-02").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    // updates touch only the 2024-01-01 partition
    val updates = Seq(("2024-01-01", 2L, "B"), ("2024-01-01", 4L, "d")).toDF("fecha", "id", "v")
    Writers.mergeByIdWritePartitioned(spark, path, updates, "id", "fecha")
    val out = spark.read.parquet(path).select("id", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
    val after = new java.io.File(path + "/fecha=2024-01-02").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(after == untouchedFiles, "untouched partition was rewritten")
  }

  test("K1 appendPartitioned clusters within partitions without changing content") {
    val path = tmp() + "/t"
    val df = Seq(("2024-01-01", 3L), ("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("fecha", "id")
    Writers.appendPartitioned(df, path, "fecha", clusterBy = Seq("id"))
    val out = spark.read.parquet(path)
    assert(out.count() == 3)
    assert(out.select(sum($"id")).as[Long].head() == 6L)
  }
}
