package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Partition-restricted small-file compaction: fragmented partitions
  * collapse toward the target file size, healthy partitions keep their
  * files byte-identical, and the data never changes.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def filesOf(dir: String, part: String): Map[String, Long] = {
    val d = new java.io.File(s"$dir/event_type=$part")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("compaction merges fragmented partitions only; data identical") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val events = sf().events.select("event_id", "user_id", "event_type", "value")
    // fragment two partitions into ~12 files each
    events.where(col("event_type").isin("click", "view"))
      .repartition(12)
      .write.partitionBy("event_type").parquet(dir)
    // land one healthy partition as a single file
    events.where(col("event_type") === "error").coalesce(1)
      .write.mode("append").partitionBy("event_type").parquet(dir)

    val before = spark.read.parquet(dir)
    val beforeRows = before.count()
    val beforeSum = before.agg(sum(col("value").cast("decimal(18,2)"))).head().getDecimal(0)
    val healthyBefore = filesOf(dir, "error")
    assert(filesOf(dir, "click").size >= 10)

    val rewritten = Layout.compactPartitions(spark, dir, "event_type",
      targetBytes = 1L << 30, minFiles = 4)
    assert(rewritten.toSet == Set("click", "view"), s"rewrote: $rewritten")

    // fragmented partitions collapsed to one file (everything fits the target)
    assert(filesOf(dir, "click").size == 1)
    assert(filesOf(dir, "view").size == 1)
    // the healthy partition was not rewritten: same files, same mtimes
    assert(filesOf(dir, "error") == healthyBefore)
    // data unchanged
    val after = spark.read.parquet(dir)
    assert(after.count() == beforeRows)
    assert(after.agg(sum(col("value").cast("decimal(18,2)"))).head().getDecimal(0) == beforeSum)

    // idempotent: nothing left to compact at this threshold
    assert(Layout.compactPartitions(spark, dir, "event_type", 1L << 30, 4).isEmpty)
  }

  test("hive-escaped and null partition values compact, and only real rewrites are reported") {
    val dir = Files.createTempDirectory("graft-compact-esc").toString + "/t"
    // partition values needing hive escaping (':') plus a null partition
    val df = spark.range(0, 400).select(
      col("id").as("v"),
      when(col("id") % 3 === 0, lit("a:b"))
        .when(col("id") % 3 === 1, lit(null: String))
        .otherwise(lit("plain")).as("p"))
    df.repartition(8).write.partitionBy("p").parquet(dir)
    assert(new java.io.File(s"$dir/p=a%3Ab").exists(), "fixture must produce an escaped dirname")
    assert(new java.io.File(s"$dir/p=__HIVE_DEFAULT_PARTITION__").exists())

    val before = spark.read.parquet(dir)
    val beforeSum = before.agg(sum("v")).head().getLong(0)
    val beforeNulls = before.where(col("p").isNull).count()
    val rewritten = Layout.compactPartitions(spark, dir, "p", targetBytes = 1L << 30, minFiles = 4)
    assert(rewritten.toSet == Set("a:b", "plain", "__HIVE_DEFAULT_PARTITION__"),
      s"rewrote: $rewritten")

    def parquetFiles(sub: String) =
      new java.io.File(s"$dir/$sub").listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles("p=a%3Ab") == 1)
    assert(parquetFiles("p=__HIVE_DEFAULT_PARTITION__") == 1)
    val after = spark.read.parquet(dir)
    assert(after.count() == 400)
    assert(after.agg(sum("v")).head().getLong(0) == beforeSum)
    assert(after.where(col("p").isNull).count() == beforeNulls)
  }
}
