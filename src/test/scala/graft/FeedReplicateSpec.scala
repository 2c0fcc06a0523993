package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Snapshot
import graft.streaming.FeedConsumer

/** [[FeedConsumer.replicate]]: row-level CDC replication of a snapshot
  * table into a downstream replica — bootstrap, incremental windows over
  * merge/delete/append commits, partition-restricted rewrites, keyed and
  * multiset application, empty-window watermark commits, idempotence.
  */
class FeedReplicateSpec extends SparkSpec {

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def filesByPartition(dir: String): Map[String, Set[String]] = {
    val m = Snapshot.latestManifest(spark, dir).get
    m.files.groupBy(f =>
      Snapshot.partitionValues(m.partitionCols, f).values.mkString("/"))
      .view.mapValues(_.toSet).toMap
  }

  private def fixture(tag: String): (String, String, DataFrame) = {
    val root = Files.createTempDirectory(s"graft-replicate-$tag").toString
    val base = sf().orders
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    Snapshot.create(spark, s"$root/src", base.repartition(2),
      partitionCols = Seq("o_orderpriority"))
    Snapshot.create(spark, s"$root/dst", base.limit(0),
      partitionCols = Seq("o_orderpriority"))
    (s"$root/src", s"$root/dst", base)
  }

  test("bootstrap then incremental windows converge; untouched partitions keep their files") {
    val (src, dst, base) = fixture("inc")
    // bootstrap: full copy + watermark in one commit
    assert(FeedConsumer.replicate(spark, src, dst, "rep").isDefined)
    assert(same(Snapshot.read(spark, dst), Snapshot.read(spark, src)))
    val before = filesByPartition(dst)

    // a window of real churn: update rows inside 1-URGENT, delete rows
    // from 5-LOW, append fresh rows into 2-HIGH
    val upd = base.where(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    Snapshot.mergeById(spark, src, upd, "o_orderkey", "o_orderpriority")
    Snapshot.delete(spark, src,
      col("o_orderpriority") === "5-LOW" && col("o_orderkey") % 5 === 0)
    Snapshot.append(spark, src,
      base.where(col("o_orderpriority") === "2-HIGH").limit(40)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))

    assert(FeedConsumer.replicate(spark, src, dst, "rep").isDefined)
    assert(same(Snapshot.read(spark, dst), Snapshot.read(spark, src)),
      "replica must equal the source state after the churn window")
    val after = filesByPartition(dst)
    Seq("3-MEDIUM", "4-NOT SPECIFIED").foreach { p =>
      assert(after(p) == before(p), s"untouched partition $p was rewritten")
    }
    Seq("1-URGENT", "5-LOW", "2-HIGH").foreach { p =>
      assert(after(p) != before(p), s"churned partition $p kept stale files")
    }
    // up to date: no-op
    assert(FeedConsumer.replicate(spark, src, dst, "rep").isEmpty)
  }

  test("a window whose partitions are all NEW to the replica still applies") {
    // the nightly fresh-date append: the replica has no files in the
    // incoming partition, so the partition restriction is empty — the
    // window must still apply the inserts (regression: an empty
    // affected set used to be mistaken for a no-data window and only
    // the watermark committed, silently losing the partition forever)
    val root = Files.createTempDirectory("graft-replicate-newpart").toString
    val base = sf().orders
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    Snapshot.create(spark, s"$root/src",
      base.where(col("o_orderpriority") =!= "5-LOW").repartition(2),
      partitionCols = Seq("o_orderpriority"))
    Snapshot.create(spark, s"$root/dst", base.limit(0),
      partitionCols = Seq("o_orderpriority"))
    assert(FeedConsumer.replicate(spark, s"$root/src", s"$root/dst", "rep").isDefined)
    val before = filesByPartition(s"$root/dst")

    // the churn window touches ONLY a partition the replica lacks
    Snapshot.append(spark, s"$root/src", base.where(col("o_orderpriority") === "5-LOW"))
    assert(FeedConsumer.replicate(spark, s"$root/src", s"$root/dst", "rep").isDefined)
    assert(same(Snapshot.read(spark, s"$root/dst"), Snapshot.read(spark, s"$root/src")),
      "a new-partition window must apply, not be mistaken for a no-op")
    val after = filesByPartition(s"$root/dst")
    before.keys.foreach { p =>
      assert(after(p) == before(p), s"pre-existing partition $p must keep its files")
    }
    assert(after.contains("5-LOW"), "the new partition must exist downstream")
  }

  test("a compaction-only window commits the watermark alone") {
    val (src, dst, _) = fixture("compact")
    assert(FeedConsumer.replicate(spark, src, dst, "rep").isDefined)
    val filesBefore = Snapshot.latestManifest(spark, dst).get.files.toSet
    val vBefore = Snapshot.latestVersion(spark, dst).get

    Snapshot.compact(spark, src, minFiles = 2) // moves rows, changes nothing
    assert(Snapshot.latestVersion(spark, src).get >
      Snapshot.latestManifest(spark, dst).get.streamBatch("rep"),
      "fixture: the compaction must commit a new source version")
    assert(FeedConsumer.replicate(spark, src, dst, "rep").isDefined)
    val m = Snapshot.latestManifest(spark, dst).get
    assert(m.files.toSet == filesBefore, "a net-empty window must not rewrite the replica")
    assert(m.version > vBefore && m.streamBatch("rep") ==
      Snapshot.latestVersion(spark, src).get)
    assert(FeedConsumer.replicate(spark, src, dst, "rep").isEmpty)
  }

  test("a concurrent replica commit mid-window: replicate retries and converges") {
    val (src, dst, base) = fixture("race")
    assert(FeedConsumer.replicate(spark, src, dst, "rep").isDefined)
    Snapshot.delete(spark, src, col("o_orderkey") % 9 === 0)
    // inject at the replicate commit's staging point: an unrelated
    // replica commit (a property change) wins the version, the
    // replicate publish conflicts, and the retry must re-derive the
    // window against the new replica state instead of surfacing the
    // conflict
    var fired = false
    Snapshot.faultHook = {
      case "manifest-staged" if !fired =>
        fired = true
        Snapshot.setProperties(spark, dst, Map("team" -> "ml"))
      case _ => ()
    }
    try assert(FeedConsumer.replicate(spark, src, dst, "rep").isDefined)
    finally Snapshot.faultHook = _ => ()
    assert(fired, "fixture: the injection must have run")
    assert(same(Snapshot.read(spark, dst), Snapshot.read(spark, src)),
      "the retried window must converge on the source state")
    val m = Snapshot.latestManifest(spark, dst).get
    assert(m.properties.get("team").contains("ml"),
      "the racing commit must survive the retry")
    assert(m.streamBatch("rep") == Snapshot.latestVersion(spark, src).get)
  }

  test("keyed application converges identically") {
    val (src, dst, base) = fixture("keyed")
    assert(FeedConsumer.replicate(spark, src, dst, "rep", keyCols = Seq("o_orderkey")).isDefined)
    val upd = base.where(col("o_orderkey") % 11 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
    Snapshot.mergeById(spark, src, upd, "o_orderkey", "o_orderpriority")
    Snapshot.delete(spark, src, col("o_orderkey") % 13 === 0)
    assert(FeedConsumer.replicate(spark, src, dst, "rep", keyCols = Seq("o_orderkey")).isDefined)
    assert(same(Snapshot.read(spark, dst), Snapshot.read(spark, src)))
  }

  test("unpartitioned replica takes the whole-table tier") {
    val root = Files.createTempDirectory("graft-replicate-dim").toString
    val dim = sf().nation.select(col("n_nationkey"), col("n_name"))
    Snapshot.create(spark, s"$root/src", dim)
    Snapshot.create(spark, s"$root/dst", dim.limit(0))
    assert(FeedConsumer.replicate(spark, s"$root/src", s"$root/dst", "rep").isDefined)
    Snapshot.delete(spark, s"$root/src", col("n_nationkey") % 2 === 0)
    assert(FeedConsumer.replicate(spark, s"$root/src", s"$root/dst", "rep").isDefined)
    assert(same(Snapshot.read(spark, s"$root/dst"), Snapshot.read(spark, s"$root/src")))
  }
}
