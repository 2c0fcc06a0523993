package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Write-time clustering (`graft.write.sorted` table policy over the
  * declared CLUSTER BY keys): appends land sorted, so files carry tight
  * min/max from their FIRST write and point/range predicates prune
  * without waiting for a maintenance OPTIMIZE … ZORDER. `local` is a
  * task-local sort (zero shuffle); `range` adds a range exchange for
  * globally disjoint files. File-level bounds only tighten when sorted
  * task output SPLITS into consecutive files, so the specs drive the
  * split with spark.sql.files.maxRecordsPerFile — exactly how a real
  * landing's size target interacts with the sort.
  */
class WriteSortSpec extends SparkSpec {
  import spark.implicits._

  private def scrambled(n: Int): DataFrame =
    spark.range(n).select(col("id"), (col("id") % 100).as("v"))
      .orderBy(xxhash64(col("id"))) // deterministic full scramble

  private def withSplit[A](recs: Int)(body: => A): A = {
    val key = "spark.sql.files.maxRecordsPerFile"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, recs.toString)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("range policy: disjoint file ranges from the first write; point lookup prunes to one file") {
    val t = Files.createTempDirectory("graft-wsort-range").toString + "/t"
    withSplit(500) {
      Snapshot.create(spark, t, scrambled(4000),
        clusterBy = Seq("id"), properties = Map("graft.write.sorted" -> "range"))
    }
    val total = Snapshot.latestManifest(spark, t).get.files.size
    assert(total >= 4, s"fixture: the split must produce several files, got $total")
    val (kept, _) = Snapshot.pruneFiles(spark, t, col("id") === 1234L)
    assert(kept.size == 1,
      s"range-sorted write must prune $total -> 1 on a point lookup, kept ${kept.size}")
    assert(Snapshot.readWhere(spark, t, col("id") === 1234L).count() == 1L)
    // and the same lookup against an UNSORTED twin keeps everything —
    // the contrast that proves the policy (not the data) did the work
    val u = Files.createTempDirectory("graft-wsort-none").toString + "/t"
    withSplit(500) { Snapshot.create(spark, u, scrambled(4000), clusterBy = Seq("id")) }
    val (keptU, totalU) = Snapshot.pruneFiles(spark, u, col("id") === 1234L)
    assert(keptU.size == totalU && totalU >= 4,
      s"unsorted scrambled files must all overlap the probe, kept ${keptU.size}/$totalU")
  }

  test("local policy: task-local sort + file splits tighten ranges with zero shuffle") {
    val t = Files.createTempDirectory("graft-wsort-local").toString + "/t"
    Snapshot.create(spark, t, scrambled(0).limit(0), clusterBy = Seq("id"),
      properties = Map("graft.write.sorted" -> "local"))
    withSplit(500) {
      // ONE input task of scrambled rows: the local sort makes its 8
      // split files consecutive, so each carries a tight 500-row range
      Snapshot.append(spark, t, scrambled(4000).coalesce(1))
    }
    val total = Snapshot.latestManifest(spark, t).get.files.size
    assert(total >= 4, s"fixture: expected several split files, got $total")
    val (kept, _) = Snapshot.pruneFiles(spark, t, col("id") === 99L)
    assert(kept.size == 1, s"local-sorted split files must prune $total -> 1, kept ${kept.size}")
    // rows survive the sort bit-exactly
    assert(Snapshot.read(spark, t).as[(Long, Long)].collect().toSet ==
      (0L until 4000L).map(i => i -> i % 100).toSet)
  }

  test("DML rewrites keep the clustering: a delete's survivor files still prune") {
    val t = Files.createTempDirectory("graft-wsort-dml").toString + "/t"
    withSplit(500) {
      Snapshot.create(spark, t, scrambled(4000),
        clusterBy = Seq("id"), properties = Map("graft.write.sorted" -> "range"))
      // a rewrite-tier delete (well above the DV fraction cap): the
      // survivors of every touched file must land SORTED again, or
      // routine DML erodes the disjoint-range invariant until the next
      // OPTIMIZE — the window the policy exists to close
      Snapshot.delete(spark, t, col("id") % 2 === 0L, dvMaxFraction = 0.01)
    }
    val total = Snapshot.latestManifest(spark, t).get.files.size
    assert(total >= 4, s"fixture: expected several files post-delete, got $total")
    val (kept, _) = Snapshot.pruneFiles(spark, t, col("id") === 1235L)
    assert(kept.size == 1,
      s"post-DML files must stay range-clustered: pruned to ${kept.size} of $total")
    assert(Snapshot.read(spark, t).count() == 2000L)
  }

  test("policy validates where it is set; no CLUSTER BY means a validated no-op") {
    val t = Files.createTempDirectory("graft-wsort-val").toString + "/t"
    intercept[IllegalArgumentException] {
      Snapshot.create(spark, t, scrambled(10), clusterBy = Seq("id"),
        properties = Map("graft.write.sorted" -> "zorderish"))
    }
    Snapshot.create(spark, t, scrambled(10)) // no clusterBy
    intercept[IllegalArgumentException] {
      Snapshot.setProperties(spark, t, Map("graft.write.sorted" -> "bogus"))
    }
    // a valid value with no clusterBy declared is accepted and inert
    Snapshot.setProperties(spark, t, Map("graft.write.sorted" -> "range"))
    Snapshot.append(spark, t, scrambled(10))
    assert(Snapshot.read(spark, t).count() == 20L)
  }
}
