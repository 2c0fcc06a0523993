package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{TextFns, TimeFns}
import graft.operators._

/** Empty-input propagation battery (SURVEY.md §7 "hard parts": the
  * reference passes empty frames through untouched, e.g.
  * audio_digital.py:208-209). A replacement window with no new data, a
  * corpus slice with no documents, a schedule with no programs — every
  * operator must return an empty, correctly-schema'd result, not throw.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEvents =
    Seq.empty[(java.sql.Timestamp, java.sql.Timestamp, Long)].toDF("s", "e", "user_id")

  test("overlap joins: empty fact side yields empty, both paths") {
    val spine = TimeFns.spine(spark, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "1 hour")
    assert(OverlapJoin.broadcastOverlap(noEvents, spine, $"s", $"e", $"p_start", $"p_end").isEmpty)
    assert(OverlapJoin.bucketedOverlap(noEvents, spine, "s", "e", "p_start", "p_end").isEmpty)
  }

  test("dedup stack: empty corpus yields empty pairs and labels") {
    assert(Dedup.exact(noDocs, "text", "doc_id").isEmpty)
    assert(Dedup.jaccardPairs(noDocs, "doc_id", "text", 3, 0.5).isEmpty)
    assert(Dedup.minhashLshPairs(noDocs, "doc_id", "text", 3, 4, 4, 0.8).isEmpty)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text", 3).isEmpty)
    val somePairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // empty edge set: every id is its own canonical id
    val labels = Dedup.canonicalize(Seq(1L, 2L).toDF("doc_id"), "doc_id", somePairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 2L))
    assert(Dedup.jaccardPairsAcross(noDocs, noDocs, "doc_id", "text", 3, 0.5).isEmpty)
  }

  test("similarity stack: empty corpus yields empty top-k and pairs") {
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(noVecs, noVecs, "vec_id", "embedding", 3).isEmpty)
    assert(Similarity.lshTopK(noVecs, "vec_id", "embedding", 4, 3).isEmpty)
    assert(Similarity.ivfTopK(noVecs, noVecs, "vec_id", "embedding", 3).isEmpty)
    assert(Similarity.cosineNearDupPairs(noVecs, "vec_id", "embedding", 0.5).isEmpty)
  }

  test("as-of join: empty right side keeps every left row with null payload") {
    val clicks = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val noRight = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("user_id", "ts", "v")
    val out = AsOfJoin.latestPriorTo(clicks, noRight, "user_id", "ts", "ts", Seq("v"))
    assert(out.count() == 1)
    assert(out.where($"asof_ts".isNull && $"asof_v".isNull).count() == 1)
  }

  test("writers: empty replacement leaves the dual-window table intact") {
    val existing = Seq(("diario", ts("2024-06-10 00:00:00"), 1.0))
      .toDF("periodo", "fecha", "v")
    val empty = Seq.empty[(String, java.sql.Timestamp, Double)].toDF("periodo", "fecha", "v")
    val out = Writers.replacePeriodWindow(existing, empty, "fecha", "periodo",
      lit("2024-06-15 00:00:00").cast("timestamp"))
    assert(out.count() == 1) // nothing doomed, nothing added
    assert(Writers.mergeById(existing, empty, "fecha").count() == 1)
  }

  test("segmentation and banding: empty data yields empty memberships") {
    val noCust = Seq.empty[(Long, String)].toDF("id", "seg")
    assert(Segmentation.applyRules(noCust,
      Seq(Segmentation.Rule("t", "seg", "eq", "X")), "id").isEmpty)
    val vips = Seq(0L, 5L).toDF("vip")
    assert(BandJoin.thresholdBands(
      Seq.empty[(Long, Double)].toDF("id", "minutes"), vips, $"minutes", $"vip").isEmpty)
  }

  test("round-3 surface: empty spans, corpora and DAGs propagate cleanly") {
    // windowed ingest over an empty span: zero windows, sink untouched
    var sank = 0
    val n = graft.sources.Fetch.windowedIngest(spark,
      StructType(Seq(StructField("x", LongType))),
      java.time.LocalDateTime.parse("2024-01-01T00:00"),
      java.time.LocalDateTime.parse("2024-01-01T00:00"),
      java.time.Duration.ofHours(1))((_, _) => Seq.empty)((_, _, _) => sank += 1)
    assert(n == 0 && sank == 0)
    // k-means over an empty corpus: seeds come back unchanged
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val seeds = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val refined = Similarity.kmeansRefine(noVecs, seeds, "vec_id", "embedding", iters = 2)
      .as[(Long, Seq[Float])].collect().toMap
    assert(refined == Map(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)))
    // an empty DAG runs to an empty report
    val flags = java.nio.file.Files.createTempDirectory("graft-empty-dag").toString
    assert(graft.pipelines.Runner.run(spark, Seq.empty, flags).isEmpty)
  }

  test("round-5 operators: empty sides propagate empty, never throw") {
    // bloom: an empty build side must prune EVERYTHING (no key was added)
    val noKeys = Seq.empty[Long].toDF("k")
    val probe = (1L to 100L).toDF("k")
    assert(Bloom.prunedJoin(probe, noKeys, "k").isEmpty)
    assert(Bloom.prunedJoin(noKeys, probe, "k").isEmpty)
    // fuzzy join: either side empty
    val noNames = Seq.empty[(Long, String)].toDF("lid", "lw")
    val names = Seq((1L, "abc")).toDF("rid", "rw")
    assert(FuzzyJoin.join1(noNames, names, "lw", "rw").isEmpty)
    // phrase search over an empty corpus
    assert(Retrieval.phraseSearch(noDocs, "doc_id", "text", Seq("a", "b")).isEmpty)
    // snapshot diff of two empty snapshots
    assert(Diff.snapshotDiff(
      Seq.empty[(Long, Double)].toDF("id", "v"),
      Seq.empty[(Long, Double)].toDF("id", "v"),
      Seq("id"), Seq("v")).isEmpty)
  }

  test("round-6 surface: empty snapshot tables and corpora propagate cleanly") {
    // containment over an empty corpus
    assert(Dedup.containmentPairs(noDocs, "doc_id", "text", k = 3, minContainment = 0.5).isEmpty)
    // a snapshot table CREATED from an empty frame: zero data files,
    // schema preserved, every read/stat/changes path defined
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-snap").toString + "/t"
    Snapshot.create(spark, dir, noDocs)
    assert(Snapshot.read(spark, dir).isEmpty)
    assert(Snapshot.read(spark, dir).columns.toSeq == Seq("doc_id", "text"))
    assert(Snapshot.readWhere(spark, dir, col("doc_id") > 5L).isEmpty)
    // the empty write leaves one zero-row schema-stub file; its rows=0
    // stat proves it unmatchable, so pruning drops it
    val (kept, total) = Snapshot.pruneFiles(spark, dir, col("doc_id") > 5L)
    assert(kept.isEmpty && total == 1)
    Snapshot.append(spark, dir, Seq((1L, "a")).toDF("doc_id", "text"))
    assert(Snapshot.readChanges(spark, dir, 1L, 2L)
      .where(col("_change_type") === "insert").count() == 1)
    // metadataAgg over the empty v1: count 0, min/max null
    val r = Snapshot.metadataAgg(spark, dir, Seq("doc_id"), version = Some(1L)).head()
    assert(r.getLong(r.fieldIndex("n")) == 0L && r.isNullAt(r.fieldIndex("min_doc_id")))
    assert(r.getLong(r.fieldIndex("cnt_doc_id")) == 0L)
    // appendBatch with an empty batch still advances the watermark
    assert(Snapshot.appendBatch(spark, dir, noDocs, "app", 0L))
    assert(!Snapshot.appendBatch(spark, dir, noDocs, "app", 0L))
  }

  test("text functions: empty and whitespace-only documents score without throwing") {
    val edge = Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val out = edge.select(
        $"doc_id",
        TextFns.qualityScore($"text", TextFns.tokens($"text")).as("q"),
        TextFns.langId(TextFns.tokens($"text")).as("lang"),
        TextFns.simhashText($"text").as("sim"))
      .as[(Long, Double, String, Long)].collect()
    assert(out.length == 3)
    assert(out.forall { case (_, q, lang, _) => !q.isNaN && lang.nonEmpty })
  }
}
