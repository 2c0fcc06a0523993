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
}
