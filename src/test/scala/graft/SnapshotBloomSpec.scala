package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Snapshot, SnapshotStats}

/** Bloom-filter sidecar index: point lookups skip files that manifest
  * min/max stats can never skip (high-cardinality ids scattered across
  * every file, so every file's range covers every probe). Pins: the
  * index prunes to the one matching file, results stay exactly equal
  * to the unindexed scan (present AND absent probes), the SQL source
  * path prunes too, indexing is incremental and idempotent, refs drop
  * with rewritten files, and vacuum reclaims orphaned sidecar dirs.
  */
class SnapshotBloomSpec extends SparkSpec {
  import spark.implicits._

  /** Four files whose id ranges ALL overlap: file k holds
    * {k, k+100, k+200}, so min/max keeps everything for any probe in
    * [1, 204] — only a bloom can tell the files apart.
    */
  private def fixture(dir: String): String = {
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      Seq((1L, "w1"), (101L, "w101"), (201L, "w201")).toDF("id", "w").repartition(1))
    (2 to 4).foreach { k =>
      Snapshot.append(spark, t,
        Seq((k.toLong, s"w$k"), (k + 100L, s"w${k + 100}"), (k + 200L, s"w${k + 200}"))
          .toDF("id", "w").repartition(1))
    }
    t
  }

  test("point lookup prunes to the matching file; results unchanged either way") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    val t = fixture(dir)
    // before indexing: stats keep all 4 files (ranges all overlap)
    val (keptBefore, total) = Snapshot.pruneFiles(spark, t, col("id") === 103L)
    assert(total == 4 && keptBefore.size == 4,
      s"fixture must be min/max-unprunable, got ${keptBefore.size}/$total")
    val before = Snapshot.readWhere(spark, t, col("id") === 103L).collect().toSeq

    Snapshot.bloomIndex(spark, t, Seq("id"))
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.blooms.keySet == m.files.toSet, "every live file indexes")

    val (keptAfter, _) = Snapshot.pruneFiles(spark, t, col("id") === 103L)
    assert(keptAfter.size == 1, s"bloom should prune 4 -> 1, kept $keptAfter")
    assert(Snapshot.readWhere(spark, t, col("id") === 103L).collect().toSeq == before)
    // absent value: bloom proves no file can match
    val (keptAbsent, _) = Snapshot.pruneFiles(spark, t, col("id") === 77L)
    assert(keptAbsent.isEmpty, s"absent probe kept $keptAbsent")
    assert(Snapshot.readWhere(spark, t, col("id") === 77L).isEmpty)
    // IN probes OR within the list: ids 103 and 204 live in files 3 and 4
    val (keptIn, _) = Snapshot.pruneFiles(spark, t, col("id").isin(103L, 204L))
    assert(keptIn.size == 2, s"IN probe should keep 2 files, kept $keptIn")
    assert(Snapshot.readWhere(spark, t, col("id").isin(103L, 204L))
      .as[(Long, String)].collect().toSet == Set(103L -> "w103", 204L -> "w204"))
  }

  test("the SQL source path bloom-prunes the same point lookup") {
    val dir = Files.createTempDirectory("graft-bloom-sql").toString
    val t = fixture(dir)
    Snapshot.bloomIndex(spark, t, Seq("id"))
    val df = spark.read.format("graft.sources.SnapshotSource").load(t)
    df.createOrReplaceTempView("bloom_t")
    val got = spark.sql("SELECT id, w FROM bloom_t WHERE id = 202")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(202L -> "w202"))
    assert(SnapshotStats.lastPrune == ((1, 4)),
      s"SQL scan should bloom-prune 4 -> 1, saw ${SnapshotStats.lastPrune}")
  }

  test("the DV'd/mapped SQL fallback relation prunes by stats and blooms too") {
    val dir = Files.createTempDirectory("graft-bloom-fallback").toString
    val t = fixture(dir)
    Snapshot.bloomIndex(spark, t, Seq("id"))
    // a point delete below the fold threshold leaves a live DV, so the
    // SQL source plans through the row-based fallback relation
    Snapshot.append(spark, t,
      (300L to 309L).map(i => i -> s"w$i").toDF("id", "w").repartition(1))
    Snapshot.delete(spark, t, col("id") === 300L)
    assert(Snapshot.latestManifest(spark, t).get.dvs.nonEmpty)
    val df = spark.read.format("graft.sources.SnapshotSource").load(t)
    df.createOrReplaceTempView("bloom_dv_t")
    import spark.implicits._
    val got = spark.sql("SELECT id, w FROM bloom_dv_t WHERE id = 103")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(103L -> "w103"))
    val (kept, total) = graft.operators.SnapshotStats.lastPrune
    assert(total == 5 && kept <= 2,
      s"fallback scan must prune by bloom sidecars: kept $kept of $total")
    // and the deleted row is gone through the same path
    assert(spark.sql("SELECT * FROM bloom_dv_t WHERE id = 300").isEmpty)
  }

  test("bloom pruning survives RENAME + type widen on the indexed column, both paths") {
    val dir = Files.createTempDirectory("graft-bloom-colmap").toString
    val t = s"$dir/t"
    // INT ids (so the widen below is a real storage/probe-type change),
    // four files with fully-overlapping ranges — only blooms can prune
    Snapshot.create(spark, t,
      Seq((1, "w1"), (101, "w101"), (201, "w201")).toDF("id", "w").repartition(1))
    (2 to 4).foreach { k =>
      Snapshot.append(spark, t,
        Seq((k, s"w$k"), (k + 100, s"w${k + 100}"), (k + 200, s"w${k + 200}"))
          .toDF("id", "w").repartition(1))
    }
    Snapshot.bloomIndex(spark, t, Seq("id"))
    // metadata-only evolution AFTER indexing: sidecars key on the
    // PHYSICAL name and hash integrals canonically as longs, so both
    // must keep pruning
    Snapshot.renameColumn(spark, t, "id", "doc_id")
    Snapshot.widenColumnType(spark, t, "doc_id", org.apache.spark.sql.types.LongType)

    // engine path: the new name + a LONG literal still prune 4 -> 1
    val (kept, total) = Snapshot.pruneFiles(spark, t, col("doc_id") === 103L)
    assert(total == 4 && kept.size == 1,
      s"bloom must prune under the renamed+widened column: kept $kept of $total")
    assert(Snapshot.readWhere(spark, t, col("doc_id") === 103L)
      .as[(Long, String)].collect().toSeq == Seq(103L -> "w103"))
    // an absent probe is still a provable miss — and still SOUND (the
    // pre-widen bloom hashed ints as longs, so no real row is skipped)
    val (keptAbsent, _) = Snapshot.pruneFiles(spark, t, col("doc_id") === 777L)
    assert(keptAbsent.isEmpty && Snapshot.readWhere(spark, t, col("doc_id") === 777L).isEmpty)

    // SQL path: active column mapping forces the row-based fallback
    // relation — its pushed-filter pruning must consult the sidecars
    // under the rename too
    val df = spark.read.format("graft.sources.SnapshotSource").load(t)
    df.createOrReplaceTempView("bloom_cm_t")
    val got = spark.sql("SELECT doc_id, w FROM bloom_cm_t WHERE doc_id = 202")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(202L -> "w202"))
    assert(SnapshotStats.lastPrune == ((1, 4)),
      s"fallback scan must bloom-prune 4 -> 1 after the rename, saw ${SnapshotStats.lastPrune}")

    // appends after the rename store the stable physical name;
    // re-indexing covers the new file while old sidecars stay valid
    Snapshot.append(spark, t, Seq(301L -> "w301").toDF("doc_id", "w").repartition(1))
    Snapshot.bloomIndex(spark, t, Seq("doc_id"))
    val (k2, t2) = Snapshot.pruneFiles(spark, t, col("doc_id") === 301L)
    assert(t2 == 5 && k2.size == 1, s"post-rename append must index: kept $k2 of $t2")
  }

  test("indexing is incremental over appends and idempotent when current") {
    val dir = Files.createTempDirectory("graft-bloom-incr").toString
    val t = fixture(dir)
    val v1 = Snapshot.bloomIndex(spark, t, Seq("id"))
    Snapshot.append(spark, t,
      Seq((5L, "w5"), (105L, "w105")).toDF("id", "w").repartition(1))
    val v2 = Snapshot.bloomIndex(spark, t, Seq("id"))
    assert(v2 > v1)
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.blooms.size == 5, "append's file joins the index")
    // two sidecar commit dirs: the initial index and the top-up
    assert(m.blooms.values.map(_.file.split('/')(1)).toSet.size == 2)
    // nothing left to do: no new commit
    assert(Snapshot.bloomIndex(spark, t, Seq("id")) == m.version)
    val (kept, total) = Snapshot.pruneFiles(spark, t, col("id") === 105L)
    assert(total == 5 && kept.size == 1)
  }

  test("string columns index; multi-column sidecars probe per conjunct") {
    val dir = Files.createTempDirectory("graft-bloom-str").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      Seq((1L, "ana"), (2L, "bob")).toDF("id", "w").repartition(1))
    Snapshot.append(spark, t,
      Seq((3L, "cid"), (4L, "dee")).toDF("id", "w").repartition(1))
    Snapshot.bloomIndex(spark, t, Seq("id", "w"))
    val (kept, total) = Snapshot.pruneFiles(spark, t, col("w") === "cid")
    assert(total == 2 && kept.size == 1, s"string probe kept $kept")
    assert(Snapshot.readWhere(spark, t, col("w") === "cid")
      .as[(Long, String)].collect().toSeq == Seq(3L -> "cid"))
    // both conjuncts probe: id=1 lives in file 1, w="cid" in file 2 — no file has both
    val (keptBoth, _) = Snapshot.pruneFiles(spark, t, col("id") === 1L && col("w") === "cid")
    assert(keptBoth.isEmpty)
  }

  test("refusals: unknown, unsupported-type and partition columns") {
    val dir = Files.createTempDirectory("graft-bloom-refuse").toString
    val t = s"$dir/t"
    Snapshot.create(spark, t,
      Seq((1L, 0.5, "a"), (2L, 1.5, "b")).toDF("id", "x", "p"), Seq("p"))
    intercept[IllegalArgumentException](Snapshot.bloomIndex(spark, t, Seq("nope")))
    intercept[IllegalArgumentException](Snapshot.bloomIndex(spark, t, Seq("x")))
    intercept[IllegalArgumentException](Snapshot.bloomIndex(spark, t, Seq("p")))
  }

  test("a rewrite drops its file's ref; vacuum reclaims orphaned sidecar dirs") {
    val dir = Files.createTempDirectory("graft-bloom-vacuum").toString
    val t = fixture(dir)
    Snapshot.bloomIndex(spark, t, Seq("id"))
    // rewrite-tier delete (1 of 3 rows = 33% > 10%) removes file 2
    Snapshot.delete(spark, t, col("id") === 2L)
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.blooms.size == 3, "rewritten file's bloom ref must drop")
    // sound after the rewrite: the replacement file has no bloom, keeps
    assert(Snapshot.readWhere(spark, t, col("id") === 102L)
      .as[(Long, String)].collect().toSeq == Seq(102L -> "w102"))
    // re-index the replacement, superseding nothing; then rewrite ALL
    // files via compact and vacuum — every sidecar dir is orphaned
    Snapshot.bloomIndex(spark, t, Seq("id"))
    Snapshot.compact(spark, t, targetBytes = Long.MaxValue)
    Snapshot.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val bloomRoot = new org.apache.hadoop.fs.Path(s"$t/_bloom")
    val left =
      if (!fs.exists(bloomRoot)) Seq.empty
      else fs.listStatus(bloomRoot).toSeq.map(_.getPath.getName)
    assert(left.isEmpty, s"orphaned sidecar dirs survived vacuum: $left")
    assert(Snapshot.latestManifest(spark, t).get.blooms.isEmpty)
    // and the table still answers
    assert(Snapshot.readWhere(spark, t, col("id") === 103L)
      .as[(Long, String)].collect().toSeq == Seq(103L -> "w103"))
  }

  test("bloom refs round-trip the delta log and survive checkpoint replay") {
    val dir = Files.createTempDirectory("graft-bloom-delta").toString
    val t = fixture(dir)
    Snapshot.bloomIndex(spark, t, Seq("id"))
    val v = Snapshot.latestManifest(spark, t).get.version
    // the index commit staged as a delta (v > 1, default interval 10):
    // re-reading replays it over the parent chain
    val reread = Snapshot.manifest(spark, t, v)
    assert(reread.blooms.size == 4)
    // more commits force the next full checkpoint; refs must persist
    (1 to 10).foreach(i => Snapshot.append(spark, t,
      Seq((1000L + i, s"x$i")).toDF("id", "w").repartition(1)))
    val m = Snapshot.latestManifest(spark, t).get
    assert(m.blooms.size == 4, "refs lost across checkpoint replay")
    val (kept, total) = Snapshot.pruneFiles(spark, t, col("id") === 103L)
    assert(kept.size == 1 && total == 14)
  }
}
