package graft

import java.nio.file.Files
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** SHALLOW CLONE — the zero-copy table fork. Pins: the clone commit
  * copies NO data bytes (destination holds only a manifest log), reads
  * agree exactly with the source (through deletion vectors and column
  * mapping), the two tables diverge independently after the fork,
  * version-pinned clones see the pinned content, OPTIMIZE localizes
  * external refs so the clone can outlive its source, VACUUM on the
  * clone never reclaims source bytes, and chained clones flatten their
  * root table instead of chaining resolution.
  */
class SnapshotCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-clone-$tag").toString + "/t"

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select("id", "p", "v").as[(Long, String, Long)].collect().toSet

  private def fixture(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "even" else "odd", i.toLong * 10))
      .toDF("id", "p", "v")

  /** Parquet bytes living under a table root (manifest log excluded). */
  private def dataBytes(dir: String): Long = {
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new HPath(dir))) return 0L
    val it = fs.listFiles(new HPath(dir), true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) n += f.getLen
    }
    n
  }

  test("clone copies no bytes, reads exactly, and the tables diverge") {
    val src = tmp("src"); val dst = tmp("dst")
    Snapshot.create(spark, src, fixture(0 until 1000).repartition(1), Seq("p"))
    Snapshot.append(spark, src, fixture(1000 until 2000).repartition(1))
    // a DV-tier point delete: the clone must inherit the vector, not
    // the deleted rows
    Snapshot.delete(spark, src, col("id").isin(3L, 7L, 1005L))
    assert(Snapshot.latestManifest(spark, src).get.dvs.nonEmpty, "fixture must take the DV tier")
    val expected = rows(Snapshot.read(spark, src))

    Snapshot.shallowClone(spark, src, dst)
    val m = Snapshot.latestManifest(spark, dst).get
    assert(m.operation.startsWith("CLONE"))
    assert(m.externalRoots.nonEmpty && m.files.forall(_.startsWith("@")))
    assert(dataBytes(dst) == 0L, "a shallow clone must copy no data bytes")
    assert(rows(Snapshot.read(spark, dst)) == expected)
    // prune path sees cloned stats: a point predicate still skips
    val (kept, total) = Snapshot.pruneFiles(spark, dst, col("p") === "even")
    assert(kept.size < total)

    // divergence: clone-side append + delete leave the source alone …
    Snapshot.append(spark, dst, fixture(5000 until 5100).repartition(1))
    Snapshot.delete(spark, dst, col("id") === 0L)
    assert(rows(Snapshot.read(spark, src)) == expected)
    // … and source-side DML leaves the clone alone
    Snapshot.delete(spark, src, col("id") === 42L)
    assert(rows(Snapshot.read(spark, dst)) ==
      expected - ((0L, "even", 0L)) ++ rows(fixture(5000 until 5100)))
  }

  test("version-pinned clone forks history; OPTIMIZE localizes; vacuum is root-scoped") {
    val src = tmp("vsrc"); val dst = tmp("vdst")
    Snapshot.create(spark, src, fixture(0 until 500).repartition(1), Seq("p"))
    val v1 = Snapshot.latestVersion(spark, src).get
    Snapshot.append(spark, src, fixture(500 until 1000).repartition(1))
    Snapshot.shallowClone(spark, src, dst, version = Some(v1))
    assert(rows(Snapshot.read(spark, dst)) == rows(fixture(0 until 500)))

    // OPTIMIZE rewrites external refs into clone-local files
    Snapshot.compact(spark, dst, targetBytes = 1L << 30, minFiles = 1)
    val m = Snapshot.latestManifest(spark, dst).get
    assert(m.files.nonEmpty && m.files.forall(!_.startsWith("@")),
      s"compact must localize: ${m.files.take(3).mkString(", ")}")
    assert(dataBytes(dst) > 0L)
    assert(rows(Snapshot.read(spark, dst)) == rows(fixture(0 until 500)))

    // vacuum the clone to its latest only: source bytes must survive
    val srcBytesBefore = dataBytes(src)
    Snapshot.vacuum(spark, dst, keepVersions = 1, orphanGraceMs = 0L)
    assert(dataBytes(src) == srcBytesBefore, "clone vacuum must never touch source bytes")
    assert(rows(Snapshot.read(spark, dst)) == rows(fixture(0 until 500)))
    assert(rows(Snapshot.read(spark, src)) == rows(fixture(0 until 1000)))
  }

  test("a clone of a clone flattens to direct roots") {
    val a = tmp("a"); val b = tmp("b"); val c = tmp("c")
    Snapshot.create(spark, a, fixture(0 until 300).repartition(1), Seq("p"))
    Snapshot.shallowClone(spark, a, b)
    // b writes one local txn of its own, so c must reference TWO roots
    Snapshot.append(spark, b, fixture(300 until 400).repartition(1))
    Snapshot.shallowClone(spark, b, c)
    val m = Snapshot.latestManifest(spark, c).get
    assert(m.externalRoots.size == 2, m.externalRoots.toString)
    // flattened: no alias value may itself be an @ref, and resolution
    // reads exactly
    assert(m.externalRoots.values.forall(!_.startsWith("@")))
    assert(rows(Snapshot.read(spark, c)) == rows(fixture(0 until 400)))
  }

  test("a clone is instantly streamable: bootstrap reads external refs") {
    // the 100 TB use: fork prod, point a streaming job at the fork —
    // the rate-limited bootstrap chunks the clone's (external) file
    // list without any copy step first
    val src = tmp("ssrc"); val dst = tmp("sdst")
    val out = Files.createTempDirectory("graft-clone-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-clone-stream-ckpt").toString
    Snapshot.create(spark, src, fixture(0 until 400).repartition(2), Seq("p"))
    Snapshot.append(spark, src, fixture(400 until 600).repartition(2))
    Snapshot.shallowClone(spark, src, dst)
    val q = spark.readStream.format("graft.sources.SnapshotSource").load(dst)
      .writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(rows(spark.read.parquet(out)) == rows(fixture(0 until 600)))
  }

  test("importParquet converts a plain parquet dir in place: zero rewrite") {
    // the onboarding move: an existing hive-partitioned landing becomes
    // a snapshot table without copying a byte — files enter as external
    // refs rooted at the dir's parent, so the dir name plays the
    // txn-segment role and every resolution path just works
    val dir = Files.createTempDirectory("graft-import").toString + "/landing"
    fixture(0 until 1000).write.partitionBy("p").parquet(dir)
    val before = dataBytes(dir)
    Snapshot.importParquet(spark, dir, dir, Seq("p"))
    val m = Snapshot.latestManifest(spark, dir).get
    assert(m.operation == "IMPORT" && m.files.forall(_.startsWith("@imp0/")))
    assert(dataBytes(dir) == before, "import must not write data bytes")
    assert(rows(Snapshot.read(spark, dir)) == rows(fixture(0 until 1000)))
    // footer stats landed at import: pruning works from query one
    val (kept, total) = Snapshot.pruneFiles(spark, dir, col("p") === "even")
    assert(kept.size < total)
    // the converted table is a FULL table: append, DV delete, compact
    Snapshot.append(spark, dir, fixture(1000 until 1100).repartition(1))
    Snapshot.delete(spark, dir, col("id").isin(1L, 1001L))
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 1100)).filterNot(r => r._1 == 1L || r._1 == 1001L))
    Snapshot.compact(spark, dir, targetBytes = 1L << 30, minFiles = 1)
    val m2 = Snapshot.latestManifest(spark, dir).get
    assert(m2.files.forall(!_.startsWith("@")), "compact must localize imported refs")
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 1100)).filterNot(r => r._1 == 1L || r._1 == 1001L))
    // vacuum now reclaims nothing it shouldn't: original bytes live
    // OUTSIDE txn dirs and the sweep is txn-scoped by construction
    Snapshot.vacuum(spark, dir, keepVersions = 1, orphanGraceMs = 0L)
    assert(rows(Snapshot.read(spark, dir)) ==
      rows(fixture(0 until 1100)).filterNot(r => r._1 == 1L || r._1 == 1001L))
  }

  test("importParquet into a separate table root (external data location)") {
    val data = Files.createTempDirectory("graft-import-ext").toString + "/files"
    val table = tmp("imp-table")
    fixture(0 until 300).write.parquet(data) // unpartitioned
    Snapshot.importParquet(spark, data, table)
    assert(dataBytes(table) == 0L)
    assert(rows(Snapshot.read(spark, table)) == rows(fixture(0 until 300)))
    // a shallow clone OF an imported table flattens to the data root
    val fork = tmp("imp-fork")
    Snapshot.shallowClone(spark, table, fork)
    assert(rows(Snapshot.read(spark, fork)) == rows(fixture(0 until 300)))
  }

  test("a clone of a bloom-indexed table prunes through external sidecars") {
    val src = tmp("bsrc"); val dst = tmp("bdst")
    // four files whose id ranges all overlap — min/max can't prune, so
    // any skipping below must come from the (cloned) bloom sidecars
    Snapshot.create(spark, src,
      Seq((1L, "w1"), (101L, "w101"), (201L, "w201")).toDF("id", "w").repartition(1))
    (2 to 4).foreach { k =>
      Snapshot.append(spark, src,
        Seq((k.toLong, s"w$k"), (k + 100L, s"w${k + 100}"), (k + 200L, s"w${k + 200}"))
          .toDF("id", "w").repartition(1))
    }
    Snapshot.bloomIndex(spark, src, Seq("id"))
    Snapshot.shallowClone(spark, src, dst)
    val m = Snapshot.latestManifest(spark, dst).get
    assert(m.blooms.nonEmpty && m.blooms.values.forall(_.file.startsWith("@")),
      s"clone must carry the sidecar refs externally: ${m.blooms.values.take(2)}")
    // bloom false positives legitimately KEEP extra files — assert
    // real skipping happened, never an exact count
    val (kept, total) = Snapshot.pruneFiles(spark, dst, col("id") === 103L)
    assert(total == 4 && kept.size < total,
      s"cloned bloom must still prune: kept ${kept.size} of $total")
    assert(Snapshot.readWhere(spark, dst, col("id") === 103L)
      .select("w").as[String].collect().toSeq == Seq("w103"))
    // and building a FRESH index on the clone (external data files)
    // writes sidecars under the CLONE's root
    Snapshot.append(spark, dst, Seq((777L, "w777")).toDF("id", "w").repartition(1))
    Snapshot.bloomIndex(spark, dst, Seq("id"))
    val m2 = Snapshot.latestManifest(spark, dst).get
    assert(m2.blooms.size == 5)
    assert(Snapshot.readWhere(spark, dst, col("id") === 777L).count() == 1L)
  }

  test("clone carries schema metadata: rename + constraints + clustering") {
    val src = tmp("msrc"); val dst = tmp("mdst")
    Snapshot.create(spark, src, fixture(0 until 200).repartition(1), Seq("p"),
      clusterBy = Seq("id"))
    Snapshot.addConstraint(spark, src, "id_pos", "id >= 0")
    Snapshot.renameColumn(spark, src, "v", "val")
    Snapshot.shallowClone(spark, src, dst)
    val m = Snapshot.latestManifest(spark, dst).get
    assert(m.colMap == Map("val" -> "v") && m.constraints.contains("id_pos") &&
      m.clusterBy == Seq("id"))
    // the col-mapped read path resolves the physical name through the
    // external ref
    assert(Snapshot.read(spark, dst).select(sum(col("val"))).as[Long].head() ==
      (0 until 200).map(_ * 10L).sum)
    // and the clone's own constraint still enforces
    val bad = intercept[Exception] {
      Snapshot.append(spark, dst, Seq((-9999L, "odd", 5L)).toDF("id", "p", "val"))
    }
    assert(bad.getMessage.toLowerCase.contains("constraint") ||
      bad.getMessage.contains("id_pos"))
  }

  test("DEEP CLONE materializes a pinned version and survives source vacuum") {
    val src = tmp("deep-src")
    Snapshot.create(spark, src, fixture(0 until 40), partitionCols = Seq("p"))
    // a deletion vector + a pinned version: the deep clone must carry
    // the DV semantics (reads minus deleted rows) and the pin
    Snapshot.delete(spark, src, col("id") % 5 === 0 && col("p") === "even",
      dvMaxFraction = 0.9)
    val pinned = Snapshot.latestVersion(spark, src).get
    val want = rows(Snapshot.read(spark, src))
    // churn past the pin
    Snapshot.overwrite(spark, src, fixture(100 until 110))

    val shallow = tmp("deep-shallow")
    val deep = tmp("deep-deep")
    Snapshot.shallowClone(spark, src, shallow, Some(pinned))
    Snapshot.deepClone(spark, src, deep, Some(pinned))
    assert(rows(Snapshot.read(spark, deep)) == want)
    // local refs only: nothing in the deep clone's manifest points out
    val dm = Snapshot.latestManifest(spark, deep).get
    assert(dm.externalRoots.isEmpty &&
      (dm.files ++ dm.dvs.values.map(_.file)).forall(!_.startsWith("@")),
      s"deep clone must hold local refs, got ${dm.files.take(3)}")
    // byte-copy carries stats verbatim: pruning works without recompute
    assert(dm.stats.nonEmpty && dm.files.forall(dm.stats.contains))
    val (kept, total) = Snapshot.pruneFiles(spark, deep, col("p") === "even")
    assert(kept.size < total, "partition pruning must work on the deep clone")

    // the source vacuums its pre-overwrite history away: the SHALLOW
    // clone's refs dangle (the documented shallow contract)...
    Snapshot.vacuum(spark, src, keepVersions = 1, orphanGraceMs = 0L)
    intercept[Exception] { Snapshot.read(spark, shallow).collect() }
    // ...the DEEP clone owns its bytes and still reads exactly
    assert(rows(Snapshot.read(spark, deep)) == want)
    // and diverges freely
    Snapshot.append(spark, deep, fixture(200 until 202))
    assert(Snapshot.read(spark, deep).count() == want.size + 2L)
  }

  test("DEEP CLONE of a SHALLOW clone collapses external roots and outlives both sources") {
    val a = tmp("deep-chain-a")
    Snapshot.create(spark, a, fixture(0 until 24), partitionCols = Seq("p"))
    val b = tmp("deep-chain-b")
    Snapshot.shallowClone(spark, a, b) // b: all refs external into a
    Snapshot.append(spark, b, fixture(100 until 106)) // plus b-local files
    val want = rows(Snapshot.read(spark, b))
    val c = tmp("deep-chain-c")
    Snapshot.deepClone(spark, b, c)
    val cm = Snapshot.latestManifest(spark, c).get
    assert(cm.externalRoots.isEmpty && cm.files.forall(!_.startsWith("@")),
      s"chained deep clone must own every byte, got ${cm.files.filter(_.startsWith("@")).take(3)}")
    // retire BOTH upstream tables entirely
    Snapshot.overwrite(spark, a, fixture(0 until 1))
    Snapshot.vacuum(spark, a, keepVersions = 1, orphanGraceMs = 0L)
    Snapshot.overwrite(spark, b, fixture(0 until 1))
    Snapshot.vacuum(spark, b, keepVersions = 1, orphanGraceMs = 0L)
    assert(rows(Snapshot.read(spark, c)) == want)
  }

  test("DEEP CLONE as SQL text on both front ends") {
    // registry route
    val root = Files.createTempDirectory("graft-clone-deepsql").toString
    val t = Map("s" -> s"$root/s", "d" -> s"$root/d")
    Snapshot.create(spark, s"$root/s", fixture(0 until 12), partitionCols = Seq("p"))
    Snapshot.sql(spark, "ALTER TABLE s CREATE TAG pin", t)
    Snapshot.sql(spark, "INSERT INTO s VALUES (500, 'even', 0)", t)
    Snapshot.sql(spark, "CREATE TABLE d DEEP CLONE s VERSION AS OF 'pin'", t)
    assert(rows(Snapshot.read(spark, s"$root/d")) == rows(fixture(0 until 12)))
    // catalog route (dialect parser)
    val wh = Files.createTempDirectory("graft-clone-deepwh").toString
    spark.conf.set("spark.sql.catalog.gdc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdc.db")
    spark.sql("CREATE TABLE gdc.db.src (id BIGINT, p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gdc.db.src VALUES (1, 'even', 10), (2, 'odd', 20)")
    spark.sql("CREATE TABLE gdc.db.dst DEEP CLONE gdc.db.src")
    assert(spark.sql("SELECT id, p, v FROM gdc.db.dst")
      .as[(Long, String, Long)].collect().toSet == Set((1L, "even", 10L), (2L, "odd", 20L)))
    val dm = Snapshot.latestManifest(spark, s"$wh/db/dst").get
    assert(dm.externalRoots.isEmpty)
  }
}
