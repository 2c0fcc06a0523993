package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** The change feed as a STREAMING source (`readChangeFeed = true`):
  * row-exact inserts/deletes per commit with version/timestamp stamps.
  * Pins: appends stream as inserts, a DV point delete streams exactly
  * its rows as deletes, an update streams delete+insert, a pure
  * compaction (rows unchanged) emits NOTHING, metadata-only commits
  * are transparent, restarts resume from the offset log, and
  * maxFilesPerTrigger bounds a batch's commit admission.
  */
class StreamCdfSpec extends SparkSpec {
  import spark.implicits._

  private def drain(src: String, out: String, ckpt: String,
                    opts: Map[String, String]): Unit = {
    val reader = spark.readStream.format("graft.sources.SnapshotSource")
      .option("readChangeFeed", "true")
    opts.foreach { case (k, w) => reader.option(k, w) }
    val q = reader.load(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
  }

  private def got(out: String): Seq[(Long, String, String, Long)] =
    spark.read.parquet(out)
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq

  test("appends, DV deletes, updates and compactions stream as row-exact changes") {
    val dir = Files.createTempDirectory("graft-cdf").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src,
      (1L to 10L).map(i => i -> s"r$i").toDF("id", "v").repartition(1))
    // stream from the beginning of history
    drain(src, out, ckpt, Map("startingVersion" -> "0"))
    assert(got(out).toSet == (1L to 10L).map(i => (i, s"r$i", "insert", 1L)).toSet)

    // a DV point delete: exactly one delete row
    Snapshot.delete(spark, src, col("id") === 2L)
    val vDel = Snapshot.latestVersion(spark, src).get
    drain(src, out, ckpt, Map("startingVersion" -> "0"))
    assert(got(out).filter(_._4 == vDel).toSet == Set((2L, "r2", "delete", vDel)))

    // an update: one delete of the old row, one insert of the new
    Snapshot.update(spark, src, col("id") === 3L, Map("v" -> lit("R3")))
    val vUpd = Snapshot.latestVersion(spark, src).get
    drain(src, out, ckpt, Map("startingVersion" -> "0"))
    assert(got(out).filter(_._4 == vUpd).toSet ==
      Set((3L, "r3", "delete", vUpd), (3L, "R3", "insert", vUpd)))

    // metadata-only commits are transparent; a pure compaction that
    // folds the DV emits exactly the NET nothing (the deleted row was
    // already emitted; folding moves no live row)
    Snapshot.addConstraint(spark, src, "id_pos", "id > 0")
    Snapshot.bloomIndex(spark, src, Seq("id"))
    val before = got(out).size
    Snapshot.compact(spark, src, minFiles = 1)
    drain(src, out, ckpt, Map("startingVersion" -> "0"))
    assert(got(out).size == before,
      s"metadata commits and row-preserving compaction must emit nothing, got ${got(out).size - before} extra")
  }

  test("no startingVersion: only future commits stream; restart resumes") {
    val dir = Files.createTempDirectory("graft-cdf-future").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, Seq(1L -> "a").toDF("id", "v").repartition(1))
    drain(src, out, ckpt, Map.empty)
    assert(!new java.io.File(out).exists() || spark.read.parquet(out).isEmpty,
      "history before the stream started must not flow")
    Snapshot.append(spark, src, Seq(2L -> "b").toDF("id", "v").repartition(1))
    drain(src, out, ckpt, Map.empty)
    assert(got(out).map(t => (t._1, t._3)).toSet == Set(2L -> "insert"))
    // an idle tick emits nothing new
    drain(src, out, ckpt, Map.empty)
    assert(got(out).size == 1)
  }

  test("maxFilesPerTrigger admits bounded commit ranges per batch") {
    val dir = Files.createTempDirectory("graft-cdf-cap").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, Seq(1L -> "a").toDF("id", "v").repartition(1))
    (2L to 5L).foreach(i => Snapshot.append(spark, src,
      Seq(i -> s"v$i").toDF("id", "v").repartition(1)))
    val reader = spark.readStream.format("graft.sources.SnapshotSource")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "1")
    val q = reader.load(src).writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(got(out).map(t => (t._1, t._3)).toSet ==
      (1L to 5L).map(i => i -> "insert").toSet)
    assert(got(out).size == 5, "chunked CDF drain must not duplicate")
    val batchSizes = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(batchSizes.size >= 5, s"expected one commit per batch, saw $batchSizes")
  }

  test("readChangeFeed with skipChangeCommits refuses (contradictory)") {
    val dir = Files.createTempDirectory("graft-cdf-refuse").toString
    val src = s"$dir/src"
    Snapshot.create(spark, src, Seq(1L -> "a").toDF("id", "v"))
    val ex = intercept[Exception] {
      spark.readStream.format("graft.sources.SnapshotSource")
        .option("readChangeFeed", "true")
        .option("skipChangeCommits", "true")
        .load(src)
        .writeStream.format("console")
        .option("checkpointLocation", s"$dir/ckpt").start()
        .processAllAvailable()
    }
    def all(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: all(x.getCause))
    assert(all(ex).exists(m => m != null && m.contains("skipChangeCommits")))
  }

  test("startingTimestamp resolves to the first version at or after the moment") {
    val dir = Files.createTempDirectory("graft-cdf-ts").toString
    val src = s"$dir/src"
    Snapshot.create(spark, src, Seq(1L -> "a").toDF("id", "v")) // v1
    Thread.sleep(60) // separate the commit stamps
    Snapshot.append(spark, src, Seq(2L -> "b").toDF("id", "v")) // v2
    val cut = Snapshot.latestManifest(spark, src).get.committedAtMicros
    Thread.sleep(60)
    Snapshot.append(spark, src, Seq(3L -> "c").toDF("id", "v")) // v3

    // from v2's own stamp: v2 and v3 stream, v1 does not (the
    // time-travel at-or-BEFORE rule would wrongly replay v1)
    drain(src, s"$dir/out1", s"$dir/c1", Map("startingTimestamp" -> cut.toString))
    assert(got(s"$dir/out1").map(t => (t._1, t._4)).toSet == Set(2L -> 2L, 3L -> 3L))

    // the plain (non-CDF) source takes the same option
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingTimestamp", cut.toString).load(src)
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/c2")
      .format("parquet").option("path", s"$dir/out2").start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$dir/out2").select("id").as[Long].collect().toSet ==
      Set(2L, 3L))

    // both specs at once refuse; a future-only timestamp refuses loudly
    intercept[Exception] {
      drain(src, s"$dir/out3", s"$dir/c3",
        Map("startingTimestamp" -> cut.toString, "startingVersion" -> "0"))
    }
    intercept[Exception] {
      drain(src, s"$dir/out4", s"$dir/c4",
        Map("startingTimestamp" -> (cut + 3600L * 1000000L).toString))
    }

    // a timestamp AT OR BEFORE the first retained commit: the genesis
    // version has no parent to diff against — its whole state streams
    // as the first batch (the plain source, the harder route)
    val q2 = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingTimestamp", "0").load(src)
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/c5")
      .format("parquet").option("path", s"$dir/out5").start()
    q2.awaitTermination()
    assert(spark.read.parquet(s"$dir/out5").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L), "a genesis-covering timestamp must stream every version")
  }
}
