package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.CorpusPack

/** Operator-level properties for the corpus-construction layer
  * (CorpusPack / Dedup.minhashLshPairsAcross) beyond the DuckDB oracle
  * gate: completeness of the cross-corpus LSH screen, the pipeline's
  * defining no-near-dups-among-survivors invariant, mixture-epoch
  * monotonicity, and quantized-search recall vs the exact ranking.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("minhashLshPairsAcross: subset of the exhaustive cross-corpus jaccard, identical values") {
    val t = sf("sf0.001")
    val bucket = graft.functions.TextFns.hash32(
      concat(lit("split:"), $"doc_id".cast("string"))) % 100
    val wb = t.documents.withColumn("bucket", bucket)
    val left = wb.where($"bucket" >= 80).select("doc_id", "text")
    val right = wb.where($"bucket" < 80).select("doc_id", "text")
    val lsh = Dedup.minhashLshPairsAcross(left, right, "doc_id", "text",
      k = 3, bands = 4, rowsPerBand = 4, minJaccard = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.jaccardPairsAcross(left, right, "doc_id", "text",
      k = 3, minJaccard = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    // LSH can only LOSE pairs (band collisions missed), never invent or
    // re-score them — and on the planted >= 0.9 near-dups the 4x4
    // banding is expected to find at least one cross-split pair
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty)
  }

  test("q70 survivors carry no residual near-dup pair at the pipeline threshold") {
    val t = sf("sf0.001")
    val manifest = CorpusPack.q70.build(t).select("doc_id")
    val survDocs = t.documents.join(manifest, "doc_id")
    // the pipeline's contract: after canonicalization, no two emitted
    // docs are near-dups at the threshold the clustering used
    assert(Dedup.jaccardPairs(survDocs, "doc_id", "text", k = 3, minJaccard = 0.5).isEmpty)
    // and every survivor passed the quality gate
    val q = graft.functions.TextFns.qualityScore($"text",
      graft.functions.TextFns.tokens($"text"))
    assert(survDocs.where(q < 0.5).isEmpty)
  }

  test("q71 epoch counts are monotone non-increasing per source and conserve copies") {
    val t = sf("sf0.001")
    val rows = CorpusPack.q71.build(t)
      .select($"source", $"epoch", $"docs".cast("long"))
      .as[(String, Long, Long)].collect()
    // epoch e+1 is a subset of epoch e's docs (a doc with c copies
    // appears in epochs 1..c), so per-source doc counts never increase
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byEpoch = rs.sortBy(_._2).map(_._3)
      assert(byEpoch.zip(byEpoch.tail).forall { case (a, b) => b <= a })
    }
    // epoch-1 count = every doc with >= 1 copy; sources with whole
    // weight >= 1 keep ALL their docs in epoch 1
    val perSource = t.documents.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    rows.filter(r => r._2 == 1L).foreach { case (src, _, docs) =>
      val rh = (src.drop(3).toInt % 4) + 1
      if (rh >= 2) assert(docs == perSource(src))
    }
  }

  test("screenStream verdicts equal the batch cross-corpus screen over the same files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-screen").toString
    val landing = s"$dir/landing"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val t = sf("sf0.001")
    val bucket = graft.functions.TextFns.hash32(
      concat(lit("split:"), $"doc_id".cast("string"))) % 100
    val wb = t.documents.withColumn("bucket", bucket)
    val corpus = wb.where($"bucket" < 80).select("doc_id", "text")
    val batchDocs = wb.where($"bucket" >= 80).select("doc_id", "text")
    // two ticks: half the batch lands, is screened, then the rest
    batchDocs.where($"doc_id" % 2 === 0).write.parquet(landing)
    val schema = spark.read.parquet(landing).schema
    def tick(): Unit = graft.streaming.EventStream.screenStream(
      graft.streaming.EventStream.read(spark, landing, schema), corpus, out, ckpt)
    tick()
    batchDocs.where($"doc_id" % 2 === 1).write.mode("append").parquet(landing)
    tick()
    val streamed = spark.read.parquet(out)
      .as[(Long, Double, Boolean)].collect().toSet
    val batchNear = Dedup.minhashLshPairsAcross(batchDocs, corpus, "doc_id", "text",
        k = 3, bands = 4, rowsPerBand = 4, minJaccard = 0.8)
      .groupBy($"id_a".as("doc_id")).agg(max($"jaccard").as("bj"))
    val expected = batchDocs.select("doc_id").join(batchNear, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"bj", lit(0.0)), $"bj".isNotNull)
      .as[(Long, Double, Boolean)].collect().toSet
    // every landed doc screened exactly once, verdicts identical to the
    // batch operator (micro-batching is invisible: the corpus is static)
    assert(streamed == expected)
    assert(streamed.exists(_._3), "planted cross-split near-dup should be flagged")
  }

  test("q74 quantized ranking recovers the exact dot-product top-1 for most queries") {
    val t = sf("sf0.001")
    graft.expressions.GraftFunctions.register(spark)
    val quant = CorpusPack.q74.build(t)
      .where($"rank" === 1).select($"query_id", $"match_id")
      .as[(Long, Long)].collect().toMap
    // exact raw-dot ranking (the quantity q74's rescaled score approximates)
    val q = t.embeddings.where($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = t.embeddings.where($"vec_id" % 50 =!= 0)
      .select($"vec_id".as("match_id"), $"embedding".as("cv"))
    val exact = operators.Similarity.topKAgg(
        q.crossJoin(c).select($"query_id", $"match_id",
          operators.Similarity.dot($"qv", $"cv").as("cos")), 1)
      .select($"query_id", $"match_id").as[(Long, Long)].collect().toMap
    assert(quant.keySet == exact.keySet)
    val agree = quant.count { case (qid, m) => exact(qid) == m }
    // int8 symmetric quantization keeps relative dot error ~1%; top-1
    // flips only on near-ties — demand 80% agreement as the floor
    assert(agree.toDouble / quant.size >= 0.8,
      s"top-1 agreement $agree/${quant.size}")
  }
}
