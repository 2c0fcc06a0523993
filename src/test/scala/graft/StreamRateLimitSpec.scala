package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.operators.Snapshot

/** Admission control for the snapshot streaming source:
  * `maxFilesPerTrigger` / `maxBytesPerTrigger` drain a backlog —
  * including the BOOTSTRAP snapshot, the batch that is the whole table
  * and therefore the 100 TB cliff — in bounded, checkpointed chunks.
  * Pins: chunking never changes WHAT is emitted (set-equal to the
  * unlimited stream, no duplicates), a restart resumes mid-backlog
  * from the offset log, deletion vectors still apply to bootstrap
  * chunks, and a legacy whole-version checkpoint (taken before the
  * option existed) upgrades in place.
  */
class StreamRateLimitSpec extends SparkSpec {
  import spark.implicits._

  /** One data file per commit, so file counts are deterministic. */
  private def oneFile(rows: (Long, String)*) =
    rows.toDF("id", "v").repartition(1)

  private def drain(src: String, out: String, ckpt: String,
                    opts: Map[String, String]): Seq[Long] = {
    val reader = spark.readStream.format("graft.sources.SnapshotSource")
    opts.foreach { case (k, w) => reader.option(k, w) }
    val q = reader.load(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
    // per-batch input sizes, newest-last (recentProgress keeps <=100)
    q.recentProgress.toSeq.map(_.numInputRows)
  }

  private def got(out: String): Seq[(Long, String)] =
    spark.read.parquet(out).as[(Long, String)].collect().toSeq

  test("maxFilesPerTrigger drains bootstrap and catch-up in single-file batches") {
    val dir = Files.createTempDirectory("graft-ratelimit").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, oneFile(1L -> "a"))
    (2L to 5L).foreach(i => Snapshot.append(spark, src, oneFile(i -> s"v$i")))
    // 5 commits x 1 file; cap = 1 file per micro-batch
    val sizes = drain(src, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got(out).toSet == (1L to 5L).map(i => i -> (if (i == 1) "a" else s"v$i")).toSet)
    assert(got(out).size == 5, "chunked drain must not duplicate rows")
    assert(sizes.count(_ > 0) >= 5, s"expected >=5 one-file batches, saw $sizes")
    assert(sizes.forall(_ <= 1), s"a batch exceeded the one-file cap: $sizes")
  }

  test("maxBytesPerTrigger admits at least one file and never two under a tiny cap") {
    val dir = Files.createTempDirectory("graft-ratelimit-bytes").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, oneFile(1L -> "a"))
    Snapshot.append(spark, src, oneFile(2L -> "b"))
    Snapshot.append(spark, src, oneFile(3L -> "c"))
    // every parquet file is bigger than 1 byte: the >=1-file progress
    // guarantee admits exactly one per batch
    val sizes = drain(src, out, ckpt, Map("maxBytesPerTrigger" -> "1"))
    assert(got(out).toSet == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(sizes.forall(_ <= 1), s"byte cap admitted more than one single-row file: $sizes")
  }

  test("restart resumes a chunked backlog from the offset log without re-emitting") {
    val dir = Files.createTempDirectory("graft-ratelimit-restart").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, oneFile(1L -> "a"))
    (2L to 8L).foreach(i => Snapshot.append(spark, src, oneFile(i -> s"v$i")))
    // first run, throttled to one chunk per second: stop after the
    // first committed chunk lands, well before the 8-chunk backlog
    // could drain
    val q1 = spark.readStream.format("graft.sources.SnapshotSource")
      .option("maxFilesPerTrigger", "1").load(src)
      .writeStream
      .trigger(Trigger.ProcessingTime("1 second"))
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q1.recentProgress.count(_.numInputRows > 0) < 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally q1.stop()
    val mid = got(out).size
    assert(mid < 8, s"stop landed after the whole backlog ($mid rows) — nothing left to resume")
    // second run: same checkpoint drains the rest exactly once
    drain(src, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got(out).toSet == (1L to 8L).map(i => i -> (if (i == 1) "a" else s"v$i")).toSet)
    assert(got(out).size == 8, "restart re-emitted or dropped rows")
  }

  test("bootstrap chunks of a DV'd table exclude vectored rows") {
    val dir = Files.createTempDirectory("graft-ratelimit-dv").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    // 10-row file: deleting one row is a 10% matched fraction — inside
    // the DV tier AND below the 20% density-fold trigger, so the vector
    // survives for the stream to apply
    Snapshot.create(spark, src, oneFile((1L to 10L).map(i => i -> s"r$i"): _*))
    Snapshot.append(spark, src, oneFile(11L -> "c", 12L -> "d"))
    Snapshot.delete(spark, src, org.apache.spark.sql.functions.col("id") === 2L)
    assert(Snapshot.latestManifest(spark, src).get.dvs.nonEmpty,
      "fixture must take the deletion-vector tier")
    val sizes = drain(src, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got(out).toSet ==
      ((1L to 10L).filter(_ != 2L).map(i => i -> s"r$i") ++ Seq(11L -> "c", 12L -> "d")).toSet)
    assert(sizes.count(_ > 0) >= 2, s"bootstrap was not chunked: $sizes")
  }

  test("a legacy whole-version checkpoint upgrades to chunked offsets in place") {
    val dir = Files.createTempDirectory("graft-ratelimit-legacy").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, oneFile(1L -> "a"))
    Snapshot.append(spark, src, oneFile(2L -> "b"))
    // run once WITHOUT rate limiting: offset log holds a plain version
    val q = spark.readStream.format("graft.sources.SnapshotSource").load(src)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
    assert(got(out).toSet == Set(1L -> "a", 2L -> "b"))
    // new commits land; the restart turns the cap ON against the old log
    (3L to 5L).foreach(i => Snapshot.append(spark, src, oneFile(i -> s"v$i")))
    val sizes = drain(src, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(got(out).toSet == Set(1L -> "a", 2L -> "b", 3L -> "v3", 4L -> "v4", 5L -> "v5"))
    assert(got(out).size == 5, "legacy-offset upgrade re-emitted rows")
    assert(sizes.forall(_ <= 1), s"upgraded stream ignored the cap: $sizes")
  }

  test("Trigger.AvailableNow processes ONE capped chunk per run (bounded increments)") {
    // the DSv1 AvailableNow wrapper captures getOffset once per run, so
    // a rate-limited stream advances by exactly one admission window
    // per tick — the bounded-nightly-increment pattern. Pinned so the
    // behavior is a documented contract, not a surprise.
    val dir = Files.createTempDirectory("graft-ratelimit-an").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, oneFile(1L -> "a"))
    (2L to 4L).foreach(i => Snapshot.append(spark, src, oneFile(i -> s"v$i")))
    def tick(): Int = {
      val q = spark.readStream.format("graft.sources.SnapshotSource")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      q.awaitTermination()
      got(out).size
    }
    val sizes = (1 to 4).map(_ => tick())
    assert(sizes == Seq(1, 2, 3, 4),
      s"each AvailableNow run should admit exactly one file, saw $sizes")
    assert(got(out).toSet ==
      Set(1L -> "a", 2L -> "v2", 3L -> "v3", 4L -> "v4"))
  }

  test("rate-limited stream still refuses a rewrite commit unless skipChangeCommits") {
    val dir = Files.createTempDirectory("graft-ratelimit-rewrite").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Snapshot.create(spark, src, oneFile(1L -> "a"))
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("maxFilesPerTrigger", "1").load(src)
      .writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).start()
    try q.processAllAvailable() finally q.stop()
    // a rewrite-tier delete (100% matched fraction), then an append
    Snapshot.delete(spark, src, org.apache.spark.sql.functions.col("id") === 1L)
    Snapshot.append(spark, src, oneFile(6L -> "f"))
    val ex = intercept[Exception] {
      drain(src, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    }
    assert(ex.getMessage.contains("rewrites") || ex.getCause != null &&
      ex.getCause.getMessage.contains("rewrites"))
    // with skipChangeCommits the append after the rewrite still flows
    drain(src, out, ckpt,
      Map("maxFilesPerTrigger" -> "1", "skipChangeCommits" -> "true"))
    assert(got(out).toSet == Set(1L -> "a", 6L -> "f"))
  }
}
