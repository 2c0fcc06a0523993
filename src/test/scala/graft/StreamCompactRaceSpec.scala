package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Concurrent OPTIMIZE vs chunked stream consumers — the race a
  * standing 100 TB pipeline actually runs: a compaction commits while
  * a rate-limited consumer is mid-drain. Pins:
  *
  *  - a CDC consumer that has drained part of its backlog when a
  *    row-preserving compaction lands NEVER sees the rewritten rows
  *    again (per-commit reconciliation nets the rewrite to zero) and
  *    never a half-compacted version (offsets are whole manifests);
  *  - a rate-limited BOOTSTRAP consumer keeps reading its PINNED
  *    snapshot across the compaction — chunks after the commit return
  *    the same bytes as chunks before it — and then skips the rewrite
  *    commit under `skipChangeCommits` while still streaming a later
  *    append exactly once.
  */
class StreamCompactRaceSpec extends SparkSpec {
  import spark.implicits._

  /** One AvailableNow tick: the DSv1 wrapper captures getOffset ONCE
    * per run, so each call drains exactly one admitted batch — the
    * deterministic "chunk" the race interleaves around.
    */
  private def tick(src: String, out: String, ckpt: String,
                   opts: Map[String, String]): Unit = {
    val reader = spark.readStream.format("graft.sources.SnapshotSource")
    opts.foreach { case (k, w) => reader.option(k, w) }
    val q = reader.load(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
  }

  test("compaction between CDC chunks: no re-emits, no half-compacted version") {
    val dir = Files.createTempDirectory("graft-cdcrace").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src,
      (1L to 6L).map(i => i -> s"r$i").toDF("id", "v").repartition(1))     // v1
    Snapshot.append(spark, src,
      (7L to 9L).map(i => i -> s"r$i").toDF("id", "v").repartition(1))     // v2
    Snapshot.append(spark, src,
      (10L to 12L).map(i => i -> s"r$i").toDF("id", "v").repartition(1))   // v3
    Snapshot.delete(spark, src, col("id") === 7L)                          // v4 (DV delete)

    // chunk 1: cap admits a strict prefix of the four-commit backlog
    val cdc = Map("readChangeFeed" -> "true", "startingVersion" -> "0",
      "maxFilesPerTrigger" -> "1")
    tick(src, out, ckpt, cdc)
    val afterChunk1 = spark.read.parquet(out).count()
    assert(afterChunk1 > 0 && afterChunk1 < 14,
      s"cap must split the backlog across ticks, first tick got $afterChunk1 rows")

    // THE RACE: a row-preserving compaction commits mid-drain
    Snapshot.compact(spark, src, targetBytes = 1L << 30, minFiles = 2)
    val vCompact = Snapshot.latestVersion(spark, src).get

    // drain the rest, chunk by chunk, across the compaction commit
    (1 to 8).foreach(_ => tick(src, out, ckpt, cdc))

    val got = spark.read.parquet(out)
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq
    val expected =
      (1L to 6L).map(i => (i, s"r$i", "insert", 1L)) ++
        (7L to 9L).map(i => (i, s"r$i", "insert", 2L)) ++
        (10L to 12L).map(i => (i, s"r$i", "insert", 3L)) :+
        ((7L, "r7", "delete", 4L))
    assert(got.size == expected.size, s"no row may emit twice: got ${got.size}")
    assert(got.toSet == expected.toSet, s"unexpected change set: $got")
    assert(!got.exists(_._4 == vCompact),
      "a row-preserving compaction must net to zero in the change feed")
  }

  test("compaction mid-bootstrap: pinned chunks stay byte-stable, rewrite skipped") {
    val dir = Files.createTempDirectory("graft-bootrace").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    // several small files so the bootstrap splits into chunks
    Snapshot.create(spark, src,
      (1L to 4L).map(i => i -> s"r$i").toDF("id", "v").repartition(1))
    (1 to 3).foreach { k =>
      Snapshot.append(spark, src,
        (k * 4L + 1 to k * 4L + 4).map(i => i -> s"r$i").toDF("id", "v").repartition(1))
    }
    val pinned = Snapshot.latestVersion(spark, src).get

    val opts = Map("maxFilesPerTrigger" -> "1", "skipChangeCommits" -> "true")
    tick(src, out, ckpt, opts) // chunk 1 of the pinned bootstrap
    assert(spark.read.parquet(out).count() < 16, "bootstrap must be chunked")

    // compaction lands while the bootstrap is mid-drain (the old files
    // stay on disk until vacuum, so the pinned manifest keeps reading)
    Snapshot.compact(spark, src, targetBytes = 1L << 30, minFiles = 2)
    // and a genuine append after it
    Snapshot.append(spark, src,
      Seq(100L -> "r100").toDF("id", "v").repartition(1))

    (1 to 10).foreach(_ => tick(src, out, ckpt, opts))
    val got = spark.read.parquet(out).select("id", "v")
      .as[(Long, String)].collect().toSeq
    val expected = ((1L to 16L) :+ 100L).map(i => i -> s"r$i").toSet
    assert(got.size == expected.size,
      s"bootstrap + append must emit exactly once each: ${got.sorted}")
    assert(got.toSet == expected,
      s"pinned bootstrap must be byte-stable across the compaction: ${got.sorted}")
  }
}
