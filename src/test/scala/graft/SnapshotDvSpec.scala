package graft

import java.nio.file.Files
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** Deletion vectors — the merge-on-read tier of row-level DELETE: a
  * point delete records positions in a sidecar vector instead of
  * rewriting the file (at 100 TB a GDPR-style 1-row delete must not
  * rewrite a 1-GB file), readers anti-join the vector, compaction
  * folds vectors back into plain files, and vacuum reclaims superseded
  * vectors. Pins: zero data files rewritten on the DV tier, exact
  * reads through every path (plain, predicate, SQL source, change
  * feed, time travel), fold-away on compact, tier selection by matched
  * fraction.
  */
class SnapshotDvSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-dv-$tag").toString + "/t"

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "p", "v").as[(Long, String, Long)].collect().toSet

  private def fixture(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", i.toLong * 10))
      .toDF("id", "p", "v")

  private def fileIdentity(dir: String): Map[String, (Long, Long)] = {
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshot.latestManifest(spark, dir).get.files.map { f =>
      val st = fs.getFileStatus(new HPath(s"$dir/$f"))
      f -> (st.getLen, st.getModificationTime)
    }.toMap
  }

  test("a point delete rewrites ZERO data files and reads exactly") {
    val dir = tmp("point")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
    Snapshot.append(spark, dir, fixture(1000 until 2000).repartition(1))
    val before = fileIdentity(dir)

    val v = Snapshot.delete(spark, dir, col("id") === 1500L)
    assert(v == 3L)
    // every data file byte-identical; exactly one vector, one position
    assert(fileIdentity(dir) == before, "a DV delete must rewrite nothing")
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.dvs.size == 1 && m.dvs.values.head.rows == 1L)
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 2000)).filterNot(_._1 == 1500L))
    // predicate reads and counts agree
    assert(Snapshot.read(spark, dir).count() == 1999L)
    assert(Snapshot.readWhere(spark, dir, col("id") >= 1490 && col("id") < 1510)
      .count() == 19L)
    // time travel: the pre-delete version still sees the row
    assert(Snapshot.readVersion(spark, dir, 2).count() == 2000L)
    // history reports live rows, vector subtracted
    val h = Snapshot.history(spark, dir)
      .select("version", "num_rows").as[(Long, Long)].collect().toMap
    assert(h(2L) == 2000L && h(3L) == 1999L)
  }

  test("a second delete on a DV'd file supersedes the vector (old ∪ new)") {
    val dir = tmp("merge")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
    Snapshot.delete(spark, dir, col("id") === 7L)
    val ref1 = Snapshot.latestManifest(spark, dir).get.dvs.values.head
    Snapshot.delete(spark, dir, col("id").isin(13L, 21L))
    val m = Snapshot.latestManifest(spark, dir).get
    val ref2 = m.dvs.values.head
    assert(m.dvs.size == 1 && ref2.rows == 3L && ref2.file != ref1.file,
      "replacement vector must carry old and new positions under a new file")
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 1000)).filterNot(r => Set(7L, 13L, 21L)(r._1)))
    // both versions time-travel exactly
    assert(Snapshot.readVersion(spark, dir, 2).count() == 999L)
    assert(Snapshot.readVersion(spark, dir, 3).count() == 997L)
  }

  test("tier selection: fraction above the cap rewrites, whole files drop") {
    val dir = tmp("tier")
    Snapshot.create(spark, dir, fixture(0 until 100).repartition(1))
    Snapshot.append(spark, dir, fixture(100 until 200).repartition(1))
    val before = fileIdentity(dir)
    // 50% of file 1 matches → rewrite that file; file 2 untouched
    Snapshot.delete(spark, dir, col("id") < 50)
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.dvs.isEmpty, "bulk deletes must not take the DV tier")
    val after = fileIdentity(dir)
    val kept = before.keySet.intersect(after.keySet)
    assert(kept.size == 1 && before(kept.head) == after(kept.head))
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(50 until 200)))
  }

  test("update on a DV'd file folds its vector into the rewrite") {
    val dir = tmp("upd")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
    Snapshot.delete(spark, dir, col("id") === 4L)
    Snapshot.update(spark, dir, col("id") === 10L, Map("v" -> lit(-1L)),
      dvMaxFraction = 0.0)
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.dvs.isEmpty, "rewrite reads live rows; vector must fold away")
    val expect = rows(fixture(0 until 1000)).filterNot(_._1 == 4L)
      .map { case (id, p, v) => if (id == 10L) (id, p, -1L) else (id, p, v) }
    assert(rows(Snapshot.read(spark, dir)) == expect)
  }

  test("a point UPDATE takes the DV tier: vector + appended row, zero rewrites") {
    val dir = tmp("dv-upd")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
    Snapshot.append(spark, dir, fixture(1000 until 2000).repartition(1))
    val before = fileIdentity(dir)
    val v = Snapshot.update(spark, dir, col("id") === 700L,
      Map("v" -> (col("v") + 5L)))
    assert(v == 3L)
    val after = fileIdentity(dir)
    // both original files byte-identical; ONE new small file appended
    before.foreach { case (f, ident) =>
      assert(after.get(f).contains(ident), s"$f was rewritten") }
    assert(after.size == before.size + 1)
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.dvs.size == 1 && m.dvs.values.head.rows == 1L)
    val expect = rows(fixture(0 until 2000))
      .map { case (id, p, vv) => if (id == 700L) (id, p, vv + 5L) else (id, p, vv) }
    assert(rows(Snapshot.read(spark, dir)) == expect)
    // updated-value queries see exactly one row 700, with the new value
    assert(Snapshot.readWhere(spark, dir, col("id") === 700L)
      .select("v").as[Long].collect().toSeq == Seq(7005L))
    // time travel pre-update
    assert(Snapshot.readVersion(spark, dir, 2)
      .where(col("id") === 700L).select("v").as[Long].head() == 7000L)
    // a later point DELETE of an UPDATED row must hit the appended
    // copy, not resurrect the DV'd original
    Snapshot.delete(spark, dir, col("id") === 700L)
    assert(Snapshot.read(spark, dir).where(col("id") === 700L).count() == 0L)
    assert(Snapshot.read(spark, dir).count() == 1999L)
    // compact folds everything back to plain files
    Snapshot.compact(spark, dir, minFiles = 99)
    assert(Snapshot.latestManifest(spark, dir).get.dvs.isEmpty)
    assert(Snapshot.read(spark, dir).count() == 1999L)
  }

  test("concurrent point deletes on the same file converge via statement retry") {
    val dir = tmp("race")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
    // a second delete lands between this delete's staging and rename:
    // the loser's derivation is stale (the file's vector changed), so
    // the STATEMENT re-derives against the new latest and commits the
    // union — neither delete lost, no rows double-deleted
    var injected = false
    Snapshot.faultHook = stage => if (stage == "manifest-staged" && !injected) {
      injected = true
      Snapshot.delete(spark, dir, col("id") === 11L)
    }
    try Snapshot.delete(spark, dir, col("id") === 22L)
    finally Snapshot.faultHook = _ => ()
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 1000)).filterNot(r => Set(11L, 22L)(r._1)))
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.version == 3L && m.dvs.size == 1 && m.dvs.values.head.rows == 2L)
    // the loser's first-attempt vector is an orphan; vacuum reclaims it
    Snapshot.vacuum(spark, dir, keepVersions = 1, orphanGraceMs = 0L)
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new HPath(dir, "_dv")).count(_.isDirectory) == 1)
  }

  test("compact folds vectors in and restores the native SQL scan") {
    val dir = tmp("fold")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1), Seq("p"))
    Snapshot.delete(spark, dir, col("id").isin(2L, 3L, 5L))
    assert(Snapshot.latestManifest(spark, dir).get.dvs.nonEmpty)

    // DV'd table through the SQL source: correct, via the fallback
    val live = rows(fixture(0 until 1000)).filterNot(r => Set(2L, 3L, 5L)(r._1))
    val viaSql = spark.read.format("graft.sources.SnapshotSource").load(dir)
    assert(rows(viaSql) == live)
    assert(viaSql.where(col("id") < 10).count() == 7L)
    // per-column metadata answers refuse while vectors are live…
    intercept[IllegalArgumentException] {
      Snapshot.metadataAgg(spark, dir, Seq("v"))
    }
    // …but count-only stays exact: vector sizes are manifest metadata
    assert(Snapshot.metadataAgg(spark, dir, Nil)
      .select("n").as[Long].head() == 997L)

    // compact: single live file per partition would normally not mark,
    // but DV'd files always fold
    val packed = Snapshot.compact(spark, dir, minFiles = 99)
    assert(packed.nonEmpty)
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.dvs.isEmpty)
    assert(rows(Snapshot.read(spark, dir)) == live)
    // native scan back: plan is a parquet file scan with pushed filters
    val plan = spark.read.format("graft.sources.SnapshotSource").load(dir)
      .where(col("id") >= 10).queryExecution.executedPlan.toString
    // (an IsNotNull conjunct may precede it — nullable-relaxed schemas
    // make Catalyst push one alongside the comparison)
    assert(plan.contains("GreaterThanOrEqual(id,10)") && plan.contains("PushedFilters: [") &&
      plan.contains("SnapshotFileIndex"), plan.take(800))
    // and metadata answers work again
    assert(Snapshot.metadataAgg(spark, dir, Seq("v")).select("n").as[Long].head() == 997L)
  }

  test("change feed emits DV deletes; vacuum reclaims superseded vectors") {
    val dir = tmp("feed")
    Snapshot.create(spark, dir, fixture(0 until 500).repartition(1))
    val v1 = Snapshot.latestVersion(spark, dir).get
    Snapshot.delete(spark, dir, col("id") === 123L)
    val v2 = Snapshot.latestVersion(spark, dir).get
    val changes = Snapshot.readChanges(spark, dir, v1, v2, net = true)
    val dels = changes.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSeq
    assert(dels == Seq(123L) && changes.count() == 1L,
      "net change between the two versions is exactly the deleted row")

    // supersede the vector, then fold it; vacuum past grace reclaims all
    Snapshot.delete(spark, dir, col("id") === 124L)
    Snapshot.compact(spark, dir, minFiles = 99)
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new HPath(dir, "_dv")).count(_.isDirectory) == 2)
    Snapshot.vacuum(spark, dir, keepVersions = 1, orphanGraceMs = 0L)
    assert(!fs.exists(new HPath(dir, "_dv")) ||
      fs.listStatus(new HPath(dir, "_dv")).isEmpty,
      "no retained manifest references a vector; all must reclaim")
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 500)).filterNot(r => Set(123L, 124L)(r._1)))
  }

  test("schema evolution over a DV'd table; the anti-join stays broadcast") {
    val dir = tmp("evolve")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1), Seq("p"))
    Snapshot.delete(spark, dir, col("id").isin(3L, 8L))
    // evolve: the appended batch carries a new column; the DV'd
    // pre-evolution files must read it as null AND keep their vector
    Snapshot.append(spark, dir,
      Seq((2000L, "even", 1L, "x")).toDF("id", "p", "v", "tag"),
      mergeSchema = true)
    val df = Snapshot.read(spark, dir)
    assert(df.count() == 999L)
    assert(df.where(col("id").isin(3L, 8L)).count() == 0L)
    assert(df.where(col("id") === 2000L).select("tag").as[String].head() == "x")
    assert(df.where(col("tag").isNull).count() == 998L)
    // merge-on-read must never degrade to a shuffle join: the vector
    // side is driver-small by the fraction cap, so the anti-join plans
    // as a BroadcastHashJoin/BroadcastNestedLoopJoin LeftAnti
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"),
      "DV anti-join fell back to a sort-merge join:\n" + plan.take(800))
  }

  test("past the broadcast gate the DV anti-join plans shuffled, not broadcast") {
    val dir = tmp("gate")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
    Snapshot.delete(spark, dir, col("id").isin(5L, 6L, 7L))
    // the gate reads the manifest's DvRef.rows (3 here): below it the
    // vector broadcasts; above it the anti-join must shuffle — a 100 TB
    // table's accreted vectors have no per-table bound, and broadcast()
    // is a hint Spark OBEYS, so past the gate it would OOM, not degrade
    spark.conf.set(Snapshot.DvBroadcastMaxRowsKey, "2")
    try {
      val df = Snapshot.read(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftAnti"), plan.take(600))
      assert(!plan.contains("Broadcast"),
        "gate must drop the broadcast hint:\n" + plan.take(800))
      assert(rows(df) ==
        rows(fixture(0 until 1000)).filterNot(r => Set(5L, 6L, 7L)(r._1)))
    } finally spark.conf.unset(Snapshot.DvBroadcastMaxRowsKey)
    // back under the gate: broadcast again
    val plan2 = Snapshot.read(spark, dir).queryExecution.executedPlan.toString
    assert(plan2.contains("Broadcast"), plan2.take(800))
  }

  test("accreted vectors past the density threshold auto-fold on the next DML") {
    val dir = tmp("dense")
    Snapshot.create(spark, dir, fixture(0 until 100).repartition(1))
    // each delete is capped against LIVE rows (10%), which shrink as
    // the vector grows — the PHYSICAL fraction compounds: 8/100, then
    // 16/100, and the third commit reaches 24/100 ≥ the 20% default,
    // so the density trigger folds the file within the same statement
    Snapshot.delete(spark, dir, col("id").between(0L, 7L))
    Snapshot.delete(spark, dir, col("id").between(10L, 17L))
    assert(Snapshot.latestManifest(spark, dir).get.dvs.values.map(_.rows).sum == 16L)
    val v = Snapshot.delete(spark, dir, col("id").between(20L, 27L))
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.dvs.isEmpty, "density trigger must fold the dense file's vector")
    assert(m.version == v, "the DML statement returns the fold's version")
    val gone = (0L to 7L).toSet ++ (10L to 17L) ++ (20L to 27L)
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 100)).filterNot(r => gone(r._1)))
    // the read tax is gone: native file scan, no anti-join
    assert(!Snapshot.read(spark, dir).queryExecution.executedPlan.toString
      .contains("LeftAnti"))
  }

  test("foldDvs rewrites only DV'd files; the rest stay byte-identical") {
    val dir = tmp("foldapi")
    Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
    Snapshot.append(spark, dir, fixture(1000 until 2000).repartition(1))
    Snapshot.delete(spark, dir, col("id") === 3L)
    val before = fileIdentity(dir)
    val dvd = Snapshot.latestManifest(spark, dir).get.dvs.keySet
    assert(dvd.size == 1)
    val folded = Snapshot.foldDvs(spark, dir)
    assert(folded.toSet == dvd)
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.dvs.isEmpty)
    val after = fileIdentity(dir)
    before.filterNot(kv => dvd(kv._1)).foreach { case (f, ident) =>
      assert(after.get(f).contains(ident), s"non-DV'd $f was rewritten") }
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 2000)).filterNot(_._1 == 3L))
    // idempotent: nothing left to fold
    assert(Snapshot.foldDvs(spark, dir).isEmpty)
  }

  test("streaming source treats a DV commit as a change commit") {
    val dir = tmp("stream")
    Snapshot.create(spark, dir, fixture(0 until 100).repartition(1))
    Snapshot.delete(spark, dir, col("id") === 42L)
    Snapshot.append(spark, dir, fixture(100 until 110).repartition(1))
    val out = Files.createTempDirectory("graft-dv-stream-out").toString
    // skipChangeCommits: the DV commit is skipped, the append streams
    val q = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingVersion", "1")
      .option("skipChangeCommits", "true")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$out/data").select("id").as[Long].collect().toSet
    assert(streamed == (100L until 110L).toSet)
    // without the flag, the DV commit refuses
    val out2 = Files.createTempDirectory("graft-dv-stream-out2").toString
    val q2 = spark.readStream.format("graft.sources.SnapshotSource")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out2/data").option("checkpointLocation", s"$out2/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    assert(err.getMessage.contains("deletion vectors") ||
      Option(err.getCause).exists(_.getMessage.contains("deletion vectors")))
  }
  test("fused single-scan delete == two-scan delete, both tiers") {
    // the fused path (matched positions cached from one scan) must
    // produce the exact state the classic two-scan path does — same
    // survivors, same tiering, same vector rows; and a gate of 0
    // forces the fallback so both paths stay exercised
    def runDelete(gate: String): (Set[(Long, String, Long)], Map[String, Long], String) = {
      val dir = tmp(s"fused$gate")
      Snapshot.create(spark, dir, fixture(0 until 1000).repartition(1))
      Snapshot.append(spark, dir, fixture(1000 until 2000).repartition(1))
      spark.conf.set(Snapshot.DmlFusedScanMaxRowsKey, gate)
      try Snapshot.delete(spark, dir, col("id") % 100 === 7L)
      finally spark.conf.unset(Snapshot.DmlFusedScanMaxRowsKey)
      val m = Snapshot.latestManifest(spark, dir).get
      (rows(Snapshot.read(spark, dir)),
        m.dvs.map { case (f, r) => f -> r.rows },
        m.operation)
    }
    val (fusedRows, fusedDvs, fusedOp) = runDelete(gate = "10000000")
    val (plainRows, plainDvs, plainOp) = runDelete(gate = "0")
    assert(fusedRows == plainRows)
    assert(fusedDvs.values.toSeq.sorted == plainDvs.values.toSeq.sorted)
    assert(fusedOp == plainOp)
    assert(fusedRows == rows(fixture(0 until 2000)).filterNot(_._1 % 100 == 7))
    // rewrite-tier (band) delete through the fused count path: the
    // matched cache is NOT reused for vectors there, results identical
    def runBand(gate: String): Set[(Long, String, Long)] = {
      val dir = tmp(s"band$gate")
      Snapshot.create(spark, dir, fixture(0 until 2000).repartition(1))
      spark.conf.set(Snapshot.DmlFusedScanMaxRowsKey, gate)
      try Snapshot.delete(spark, dir, col("p") === "odd")
      finally spark.conf.unset(Snapshot.DmlFusedScanMaxRowsKey)
      rows(Snapshot.read(spark, dir))
    }
    assert(runBand("10000000") == runBand("0"))
  }
}
