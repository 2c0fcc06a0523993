package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Partition transforms as GENERATED columns: `PARTITIONED BY
  * (days(ts))` yields a visible `ts_day` DATE column every write
  * derives — the reference's DAY-partitioned BigQuery landing tables
  * (consumo_detalle partitions start_date by DAY). Pins: CTAS and
  * plain CREATE declare the transform, appends/INSERTs omit the
  * column and it derives, caller-supplied values are overridden (the
  * invariant holds by construction), an UPDATE of the source column
  * re-derives the partition value, partition pruning is exact on the
  * generated column, and DDL that would break the generator refuses.
  */
class SnapshotGeneratedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("CTAS with days(ts): the generated DATE column derives, partitions, prunes") {
    val dir = Files.createTempDirectory("graft-gen").toString
    val t = s"$dir/t"
    val reg = Map("ev" -> t)
    Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 23:59:59")))
      .toDF("id", "etime").createOrReplaceTempView("gen_src")
    Snapshot.sql(spark,
      "CREATE TABLE ev PARTITIONED BY (days(etime)) AS SELECT id, etime FROM gen_src", reg)
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.partitionCols == Seq("etime_day"))
    assert(m.generatedCols.keySet == Set("etime_day"))
    assert(Snapshot.read(spark, t).select("id", "etime_day").as[(Long, Date)].collect().toSet ==
      Set(1L -> Date.valueOf("2024-01-01"), 2L -> Date.valueOf("2024-01-02")))
    // files land under the generated partition dirs
    assert(m.files.forall(_.contains("etime_day=")), m.files.mkString(", "))
    // an append WITHOUT the column derives it; WITH a wrong value it
    // is overridden — the invariant can never depend on the caller
    Snapshot.append(spark, t, Seq((3L, ts("2024-01-03 01:00:00"))).toDF("id", "etime"))
    Snapshot.append(spark, t,
      Seq((4L, ts("2024-01-04 01:00:00"), Date.valueOf("1999-01-01")))
        .toDF("id", "etime", "etime_day"))
    assert(Snapshot.read(spark, t).where(col("id") >= 3L)
      .select("id", "etime_day").as[(Long, Date)].collect().toSet ==
      Set(3L -> Date.valueOf("2024-01-03"), 4L -> Date.valueOf("2024-01-04")))
    // exact partition pruning on the generated column
    val (kept, total) = Snapshot.pruneFiles(spark, t,
      col("etime_day") === Date.valueOf("2024-01-02"))
    assert(kept.size == 1, s"generated-column prune kept $kept of $total")
    // SQL INSERT omitting the generated column
    Snapshot.sql(spark,
      "INSERT INTO ev SELECT 5 AS id, TIMESTAMP '2024-01-05 12:00:00' AS etime", reg)
    assert(Snapshot.sqlQuery(spark,
      "SELECT CAST(etime_day AS STRING) FROM ev WHERE id = 5", reg)
      .as[String].head() == "2024-01-05")
  }

  test("UPDATE of the source column re-derives the partition value") {
    val dir = Files.createTempDirectory("graft-gen-upd").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      (1L to 10L).map(i => i -> ts(f"2024-01-01 $i%02d:00:00")).toDF("id", "etime"),
      Seq("etime_day"),
      Map("etime_day" -> "CAST(date_trunc('DAY', etime) AS DATE)"))
    Snapshot.update(spark, t, col("id") === 3L,
      Map("etime" -> lit(ts("2024-02-20 05:00:00"))))
    val got = Snapshot.read(spark, t).where(col("id") === 3L)
      .select("etime_day").as[Date].head()
    assert(got == Date.valueOf("2024-02-20"), s"stale generated value after UPDATE: $got")
    // the moved row lives under the NEW partition dir
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.files.exists(_.contains("etime_day=2024-02-20")))
  }

  test("plain CREATE TABLE with a transform; DDL breaking the generator refuses") {
    val dir = Files.createTempDirectory("graft-gen-ddl").toString
    val t = s"$dir/t"
    val reg = Map("tg" -> t)
    Snapshot.sql(spark,
      "CREATE TABLE tg (id BIGINT, etime TIMESTAMP) PARTITIONED BY (days(etime))", reg)
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.partitionCols == Seq("etime_day") && m.generatedCols.contains("etime_day"))
    assert(Snapshot.read(spark, t).schema("etime_day").dataType ==
      org.apache.spark.sql.types.DateType)
    Snapshot.sql(spark, "INSERT INTO tg VALUES (1, TIMESTAMP '2024-03-01 08:00:00')", reg)
    assert(Snapshot.sqlQuery(spark, "SELECT CAST(etime_day AS STRING) FROM tg", reg)
      .as[String].head() == "2024-03-01")
    // renaming or dropping the SOURCE column would orphan the generator
    intercept[IllegalArgumentException](Snapshot.renameColumn(spark, t, "etime", "e2"))
    intercept[IllegalArgumentException](Snapshot.dropColumn(spark, t, "etime"))
    // the generated column itself is a partition column: already refused
    intercept[IllegalArgumentException](Snapshot.dropColumn(spark, t, "etime_day"))
    // unsupported transforms refuse loudly
    intercept[IllegalArgumentException](Snapshot.sql(spark,
      "CREATE TABLE tg2 (id BIGINT, e TIMESTAMP) PARTITIONED BY (bucket(4, id))",
      Map("tg2" -> s"$dir/t2")))
  }
}
