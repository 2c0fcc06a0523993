package graft

import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** The delta commit log: commits stage only what changed (adds/removes/
  * vector puts/schema growth) against their parent, full checkpoints
  * land on the [[Snapshot.LogCheckpointIntervalKey]] cadence, reads
  * replay the bounded chain, and vacuum writes a boundary checkpoint
  * before reclaiming the chain behind the retention horizon. The
  * full-manifest-per-commit layout was the one remaining per-commit
  * cost proportional to table size — an hourly append to a
  * million-file table must commit O(batch) bytes.
  */
class SnapshotDeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-dlog-$tag").toString + "/t"

  private def fixture(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toLong * 7)).toDF("id", "p", "v")

  private def ids(df: DataFrame): Set[Long] = df.select("id").as[Long].collect().toSet

  private def manifestJson(dir: String, v: Long): com.fasterxml.jackson.databind.JsonNode = {
    val f = new java.io.File(s"$dir/_graft_log/" + f"v$v%08d.json")
    new ObjectMapper().readTree(f)
  }

  test("checkpoint cadence: fulls at v1/v11/v21, deltas between; every version reads exactly") {
    val dir = tmp("cadence")
    Snapshot.create(spark, dir, fixture(0 until 10).repartition(1), Seq("p"))
    (1 until 25).foreach { k =>
      Snapshot.append(spark, dir, fixture(k * 100 until k * 100 + 10).repartition(1))
    }
    (1L to 25L).foreach { v =>
      val root = manifestJson(dir, v)
      val isDelta = root.has("base")
      val expectFull = v == 1L || (v - 1) % 10 == 0
      assert(isDelta == !expectFull, s"v$v: delta=$isDelta, expected full=$expectFull")
      if (isDelta) {
        // the O(Δ) claim: an append's delta mentions ONLY its own files
        assert(!root.has("files"))
        assert(root.get("addFiles").size() <= 4, s"v$v addFiles: ${root.get("addFiles")}")
        assert(!root.has("removeFiles"), s"an append delta removes nothing: $root")
        assert(root.get("base").asLong() == v - 1)
      }
      // reconstruction at every version equals the logical expectation
      val want = (0L until 10L).toSet ++
        (1 until v.toInt).flatMap(k => (k * 100L) until (k * 100L + 10L))
      assert(ids(Snapshot.readVersion(spark, dir, v)) == want, s"v$v content")
    }
  }

  test("delta commits carry DML vector puts and compaction removes; self-check replay is lossless") {
    val dir = tmp("dml")
    Snapshot.create(spark, dir, fixture(0 until 40).repartition(1), Seq("p"))
    Snapshot.append(spark, dir, fixture(100 until 140).repartition(1))
    // point delete -> deletion vector put rides a delta
    Snapshot.delete(spark, dir, col("id") === 4L)
    val vDv = Snapshot.latestVersion(spark, dir).get
    val dvNode = manifestJson(dir, vDv)
    assert(dvNode.has("base") && dvNode.has("dvsPut"), s"expected delta with dvsPut: $dvNode")
    assert(ids(Snapshot.read(spark, dir)) ==
      ((0L until 40L).toSet ++ (100L until 140L)) - 4L)
    // compaction rewrites marked files: removes + adds in one delta,
    // and the folded vector disappears from the reconstruction
    Snapshot.compact(spark, dir, minFiles = 1)
    val vC = Snapshot.latestVersion(spark, dir).get
    val cNode = manifestJson(dir, vC)
    assert(cNode.has("base") && cNode.has("removeFiles") && cNode.has("addFiles"))
    val mC = Snapshot.latestManifest(spark, dir).get
    assert(mC.dvs.isEmpty, "compaction must fold vectors out of the reconstructed manifest")
    assert(ids(Snapshot.read(spark, dir)) ==
      ((0L until 40L).toSet ++ (100L until 140L)) - 4L)
    // schema evolution in a delta: only the changed DDL is carried
    Snapshot.append(spark, dir,
      fixture(500 until 505).repartition(1).withColumn("extra", lit(9L)), mergeSchema = true)
    val vS = Snapshot.latestVersion(spark, dir).get
    val sNode = manifestJson(dir, vS)
    assert(sNode.has("base") && sNode.has("schemaDdl"))
    val back = Snapshot.read(spark, dir)
    assert(back.columns.contains("extra"))
    assert(back.where(col("id") === 0L).select("extra").head().isNullAt(0))
  }

  test("vacuum writes the boundary checkpoint before reclaiming the chain behind it") {
    val dir = tmp("vac")
    Snapshot.create(spark, dir, fixture(0 until 10).repartition(1), Seq("p"))
    (1 until 8).foreach { k =>
      Snapshot.append(spark, dir, fixture(k * 100 until k * 100 + 10).repartition(1))
    }
    // keep 3: boundary v6 is a delta whose parents v1..v5 will drop
    Snapshot.vacuum(spark, dir, keepVersions = 3, orphanGraceMs = 0L)
    // v9 = the floor commit a reclaiming vacuum publishes before deleting
    assert(Snapshot.versions(spark, dir) == Seq(6L, 7L, 8L, 9L))
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new HPath(s"$dir/_graft_log/v00000006.ckpt.json")),
      "vacuum must checkpoint the oldest kept version")
    // every kept version still reads exactly, through the checkpoint
    (6L to 8L).foreach { v =>
      val want = (0L until 10L).toSet ++
        (1 until v.toInt).flatMap(k => (k * 100L) until (k * 100L + 10L))
      assert(ids(Snapshot.readVersion(spark, dir, v)) == want, s"v$v after vacuum")
    }
    // and the table keeps accepting commits whose deltas chain onto the
    // checkpointed boundary
    Snapshot.append(spark, dir, fixture(900 until 910).repartition(1))
    assert(ids(Snapshot.read(spark, dir)).contains(905L))
  }

  test("checkpointInterval=1 writes every manifest full (pre-delta layout)") {
    val dir = tmp("legacy")
    spark.conf.set(Snapshot.LogCheckpointIntervalKey, "1")
    try {
      Snapshot.create(spark, dir, fixture(0 until 10).repartition(1), Seq("p"))
      Snapshot.append(spark, dir, fixture(100 until 110).repartition(1))
      Snapshot.append(spark, dir, fixture(200 until 210).repartition(1))
      (1L to 3L).foreach { v =>
        assert(!manifestJson(dir, v).has("base"), s"v$v must be full under interval=1")
      }
      assert(ids(Snapshot.read(spark, dir)) ==
        (0L until 10L).toSet ++ (100L until 110L) ++ (200L until 210L))
    } finally spark.conf.unset(Snapshot.LogCheckpointIntervalKey)
  }
}
