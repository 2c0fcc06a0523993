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

  test("snapshot compaction: unpartitioned table bin-packs to the target") {
    import graft.operators.Snapshot
    val dir = Files.createTempDirectory("graft-compact-np").toString + "/t"
    Snapshot.create(spark, dir,
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(6))
    (1 to 3).foreach(k => Snapshot.append(spark, dir,
      (k * 100 until k * 100 + 50).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4)))
    val before = Snapshot.read(spark, dir).as[(Long, String)].collect().toSet
    assert(Snapshot.latestManifest(spark, dir).get.files.size >= 18)
    val rewritten = Snapshot.compact(spark, dir, targetBytes = 1L << 30, minFiles = 2)
    assert(rewritten == Seq(""), s"unpartitioned group tag: $rewritten")
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.files.size == 1, s"expected one packed file, got ${m.files.size}")
    assert(Snapshot.read(spark, dir).as[(Long, String)].collect().toSet == before)
    // idempotent: a second pass has nothing >= minFiles to do
    assert(Snapshot.compact(spark, dir, targetBytes = 1L << 30, minFiles = 2).isEmpty)
  }

  test("snapshot compaction: two-level partitioning rewrites only fragmented leaves") {
    import graft.operators.Snapshot
    val dir = Files.createTempDirectory("graft-compact-2l").toString + "/t"
    val mk = (n: Int, reg: String, yr: Int, parts: Int) =>
      (0 until n).map(i => (i.toLong, reg, yr, i.toDouble)).toDF("id", "region", "yr", "v")
        .repartition(parts)
    Snapshot.create(spark, dir, mk(40, "na", 2024, 5), Seq("region", "yr"))
    Snapshot.append(spark, dir, mk(40, "na", 2025, 5))
    Snapshot.append(spark, dir, mk(40, "eu", 2024, 1).coalesce(1)) // healthy leaf
    val before = Snapshot.read(spark, dir).as[(Long, String, Int, Double)].collect().toSet
    val m0 = Snapshot.latestManifest(spark, dir).get
    val healthy = m0.files.filter(_.contains("region=eu"))
    assert(healthy.size == 1)

    val rewritten = Snapshot.compact(spark, dir, targetBytes = 1L << 30, minFiles = 2)
    assert(rewritten == Seq("region=na/yr=2024", "region=na/yr=2025"), s"got $rewritten")
    val m1 = Snapshot.latestManifest(spark, dir).get
    // the healthy leaf's file is untouched (same manifest entry)
    assert(m1.files.filter(_.contains("region=eu")) == healthy)
    // fragmented leaves collapsed; values identical
    assert(m1.files.count(_.contains("region=na/yr=2024")) == 1)
    assert(m1.files.count(_.contains("region=na/yr=2025")) == 1)
    assert(Snapshot.read(spark, dir).as[(Long, String, Int, Double)].collect().toSet == before)
    // partition predicates still prune through the rewritten layout
    val (kept, total) = Snapshot.pruneFiles(spark, dir,
      col("region") === "na" && col("yr") === 2024)
    assert(kept.size == 1 && total == 3)
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
