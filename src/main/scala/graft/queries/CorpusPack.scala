package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Dedup, Similarity}

/** Corpus-construction operators a large-scale training-data pipeline
  * runs AFTER the per-document layers (TextPack) and pair-finding layers
  * (DedupPack) exist: the composed clean→dedup→redact→split pipeline as
  * ONE artifact, deterministic mixture resampling, stratified sampling,
  * incremental batch-vs-corpus screening, and int8-quantized similarity
  * search.
  *
  * Determinism: every sampling/splitting decision is an md5-derived hash
  * on a stable id (never rand()), so membership is identical across
  * engines, reruns and partitionings.
  */
object CorpusPack extends QueryPack {

  import DedupPack.{toksSql, hash32Sql, shingles3Sql, Bands, Rows, minhashSql, bandKeySql}

  private val bucketSql =
    s"${hash32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100"
  private def bucketCol = TextFns.hash32(concat(lit("split:"), col("doc_id").cast("string"))) % 100

  val q70 = QueryDef(
    "q70_pipeline_survivors",
    // the full recipe composed: quality gate → exact dedup → near-dup
    // connected components (recursive CTE) → PII redaction → hash split
    Some(s"""WITH RECURSIVE scored AS (
            |  SELECT doc_id, lang, source, text, ${TextPack.qualitySql} AS quality FROM documents
            |), q AS (SELECT * FROM scored WHERE quality >= 0.5),
            |ex AS (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM q),
            |s AS (SELECT doc_id, lang, source, text, quality FROM ex WHERE doc_id = keeper),
            |sh AS (SELECT doc_id, $shingles3Sql AS shingles FROM s),
            |pairs AS (
            |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
            |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
            |),
            |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
            |reach(src, dst) AS (
            |  SELECT src, src FROM edges
            |  UNION
            |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            |),
            |canon AS (SELECT src AS id, min(dst) AS canonical_id FROM reach GROUP BY 1),
            |surv AS (
            |  SELECT s.* FROM s LEFT JOIN canon c ON s.doc_id = c.id
            |  WHERE coalesce(c.canonical_id, s.doc_id) = s.doc_id
            |)
            |SELECT doc_id, lang, source,
            |  CASE WHEN $bucketSql < 80 THEN 'train'
            |       WHEN $bucketSql < 90 THEN 'val' ELSE 'test' END AS split,
            |  quality,
            |  len(string_split(regexp_replace(regexp_replace(text, '${TrainPack.emailRe}', '<EMAIL>', 'g'),
            |                                  '${TrainPack.phoneRe}', '<PHONE>', 'g'), ' ')) AS n_tokens
            |FROM surv ORDER BY doc_id""".stripMargin)) { t =>
    // The training-data pipeline END-TO-END as one artifact (the same
    // compose-the-ingredients move as q62/q66/q67 for the reference's
    // pipelines): quality gate (q23) → exact dedup (q26) → near-dup
    // cluster canonicalization keeping min-id survivors (q27+q44) →
    // PII redaction (q45) → deterministic split (q46), emitting the
    // per-document training manifest. The quality+exact stage is
    // localCheckpoint'ed ONCE: three downstream consumers (pair
    // finding, the id spine, the final manifest join) would otherwise
    // each recompute the scan; at 100 TB each stage boundary would be a
    // persisted table instead, with identical semantics.
    val quality = TextFns.qualityScore(col("text"), TextFns.tokens(col("text")))
    val q = t.documents
      .select(col("doc_id"), col("lang"), col("source"), col("text"), quality.as("quality"))
      .where(col("quality") >= 0.5)
    val s = Dedup.exact(q, "text", "doc_id").localCheckpoint(true)
    val pairs = Dedup.jaccardPairs(s, "doc_id", "text", k = 3, minJaccard = 0.5)
    val survivors = Dedup.canonicalize(s.select("doc_id"), "doc_id", pairs)
      .where(col("id") === col("canonical_id"))
      .select(col("id").as("doc_id"))
    val redacted = regexp_replace(
      regexp_replace(col("text"), TrainPack.emailRe, "<EMAIL>"), TrainPack.phoneRe, "<PHONE>")
    s.join(survivors, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"),
        when(bucketCol < 80, "train").when(bucketCol < 90, "val").otherwise("test").as("split"),
        col("quality"),
        size(TextFns.tokens(redacted)).as("n_tokens"))
      .orderBy("doc_id")
  }

  val q71 = QueryDef(
    "q71_mixture_epochs",
    // per-source half-epoch weights 0.5..2.0; fractional epochs keep a
    // deterministic hash-chosen half of the source's docs
    Some(s"""WITH m AS (
            |  SELECT source, len($toksSql) AS n_tokens,
            |    ((CAST(substr(source, 4) AS INT) % 4 + 1) >> 1)
            |    + CASE WHEN (CAST(substr(source, 4) AS INT) % 4 + 1) % 2 = 1
            |                AND ${hash32Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000 < 500
            |           THEN 1 ELSE 0 END AS copies
            |  FROM documents
            |)
            |SELECT source, CAST(t.epoch AS BIGINT) AS epoch, COUNT(*) AS docs,
            |       CAST(SUM(n_tokens) AS BIGINT) AS tokens
            |FROM m, UNNEST(generate_series(1, copies)) AS t(epoch)
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // Domain-mixture resampling: each source gets a target weight in
    // half-epochs (derived from its id: 0.5x..2.0x); a doc is emitted
    // `floor(w)` times plus once more for a deterministic hash-chosen
    // fraction — the up/down-sampling step that turns corpus weights
    // into an epoch-expanded training mix. The expansion is a per-row
    // generator (explode of a sequence), shuffle-free until the final
    // rollup; integer half-epoch arithmetic end to end, so both engines
    // pick the same copies.
    val srcnum = expr("CAST(substring(source, 4) AS INT)")
    val rh = (srcnum % 4) + 1 // half-epochs: 1..4
    val extra = (rh % 2) === 1 &&
      TextFns.hash32(concat(lit("mix:"), col("doc_id").cast("string"))) % 1000 < 500
    val copies = shiftright(rh, 1) + when(extra, 1).otherwise(0)
    t.documents
      .select(col("source"), size(TextFns.tokens(col("text"))).as("n_tokens"), copies.as("copies"))
      .select(col("source"), col("n_tokens"),
        explode(when(col("copies") >= 1, sequence(lit(1), col("copies")))
          .otherwise(lit(Array.empty[Int]))).as("epoch"))
      .groupBy(col("source"), col("epoch").cast("long").as("epoch"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"))
      .orderBy("source", "epoch")
  }

  val q72 = QueryDef(
    "q72_stratified_sample",
    Some(s"""WITH s AS (
            |  SELECT source,
            |    ((CAST(substr(source, 4) AS INT) % 5) + 1) * 1000 AS rate_bp,
            |    CASE WHEN ${hash32Sql("'samp:' || CAST(doc_id AS VARCHAR)")} % 10000
            |              < ((CAST(substr(source, 4) AS INT) % 5) + 1) * 1000
            |         THEN 1 ELSE 0 END AS kept
            |  FROM documents
            |)
            |SELECT source, CAST(rate_bp AS DOUBLE) / 10000.0 AS target_rate,
            |       COUNT(*) AS docs, CAST(SUM(kept) AS BIGINT) AS sampled,
            |       CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS achieved_rate
            |FROM s GROUP BY 1, 2 ORDER BY 1""".stripMargin)) { t =>
    // Stratified sampling with per-stratum target rates (10%..50% by
    // source), membership by stable hash in basis points — join-free,
    // rerunnable, and auditable: the output reports achieved vs target
    // rate per stratum. The scan emits a 0/1 kept flag so counting all
    // docs and counting sampled docs is ONE pass, not two.
    val srcnum = expr("CAST(substring(source, 4) AS INT)")
    val rateBp = ((srcnum % 5) + 1) * 1000
    val kept = when(
      TextFns.hash32(concat(lit("samp:"), col("doc_id").cast("string"))) % 10000 < rateBp, 1)
      .otherwise(0)
    t.documents
      .select(col("source"), rateBp.as("rate_bp"), kept.as("kept"))
      .groupBy(col("source"), (col("rate_bp").cast("double") / 10000.0).as("target_rate"))
      .agg(count(lit(1)).as("docs"), sum(col("kept")).as("sampled"))
      .withColumn("achieved_rate", col("sampled").cast("double") / col("docs"))
      .orderBy("source")
  }

  val q73 = QueryDef(
    "q73_incremental_dedup", {
      def sigSql(src: String) =
        s"""SELECT doc_id, shingles,
           |  ${(0 until Bands * Rows).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
           |  FROM (SELECT doc_id, $shingles3Sql AS shingles FROM $src)""".stripMargin
      def bandedSql(sig: String) =
        (0 until Bands).map(b =>
          s"SELECT doc_id, shingles, $b AS band, ${bandKeySql(b)} AS key FROM $sig")
          .mkString(" UNION ALL ")
      Some(s"""WITH b AS (
              |  SELECT doc_id, text, $bucketSql AS bucket FROM documents
              |), batch AS (SELECT doc_id, text FROM b WHERE bucket >= 80),
              |corpus AS (SELECT doc_id, text FROM b WHERE bucket < 80),
              |exacts AS (SELECT DISTINCT ba.doc_id FROM batch ba JOIN corpus c ON md5(ba.text) = md5(c.text)),
              |sigb AS (${sigSql("batch")}),
              |sigc AS (${sigSql("corpus")}),
              |bb AS (${bandedSql("sigb")}),
              |bc AS (${bandedSql("sigc")}),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS id_a, a.shingles AS sa, c.shingles AS sb
              |  FROM bb a JOIN bc c ON a.band = c.band AND a.key = c.key
              |),
              |near AS (
              |  SELECT DISTINCT id_a AS doc_id FROM cand
              |  WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE) /
              |        len(list_distinct(list_concat(sa, sb))) >= 0.8
              |)
              |SELECT ba.doc_id,
              |  CASE WHEN e.doc_id IS NOT NULL THEN 'dup_exact'
              |       WHEN n.doc_id IS NOT NULL THEN 'dup_near' ELSE 'new' END AS verdict
              |FROM batch ba LEFT JOIN exacts e ON ba.doc_id = e.doc_id
              |LEFT JOIN near n ON ba.doc_id = n.doc_id
              |ORDER BY ba.doc_id""".stripMargin)
    }) { t =>
    // Incremental ingestion screening: the day's new batch (hash bucket
    // >= 80, ~20%) against the standing corpus — a doc is rejected as an
    // exact dup (content hash seen) or a near dup (MinHash+LSH band
    // collision verifying at Jaccard >= 0.8, Dedup.minhashLshPairsAcross),
    // else admitted. The synthetic corpus has no exact cross-split dups
    // (q26 keeps all 500 docs), so 'dup_exact' is empty here by
    // construction — the branch is exercised, not populated. Both checks
    // are equi-joins on small keys; at 100 TB the corpus's content
    // hashes and band keys would be precomputed tables, making a batch
    // screen o(batch) new work.
    val wb = t.documents.withColumn("bucket", bucketCol)
    val batch = wb.where(col("bucket") >= 80).select("doc_id", "text")
    val corpus = wb.where(col("bucket") < 80).select("doc_id", "text")
    val exacts = batch.withColumn("__k", md5(col("text")))
      .join(corpus.select(md5(col("text")).as("__k")), Seq("__k"), "left_semi")
      .select("doc_id")
    val near = Dedup.minhashLshPairsAcross(batch, corpus, "doc_id", "text",
        k = 3, bands = Bands, rowsPerBand = Rows, minJaccard = 0.8)
      .select(col("id_a").as("doc_id")).distinct()
    batch.join(exacts.withColumn("__e", lit(1)), Seq("doc_id"), "left")
      .join(near.withColumn("__n", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__e").isNotNull, "dup_exact")
          .when(col("__n").isNotNull, "dup_near").otherwise("new").as("verdict"))
      .orderBy("doc_id")
  }

  val q74 = QueryDef(
    "q74_quantized_topk",
    Some("""WITH p AS (
           |  SELECT vec_id, embedding AS v,
           |    greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-30) AS scale
           |  FROM embeddings
           |), qz AS (
           |  SELECT vec_id, scale,
           |    list_transform(v, x -> floor(CAST(x AS DOUBLE) / scale + 0.5)) AS qv
           |  FROM p
           |), q AS (SELECT vec_id AS query_id, scale AS qs, qv AS qqv FROM qz WHERE vec_id % 50 = 0),
           |c AS (SELECT vec_id AS match_id, scale AS cs, qv AS cqv FROM qz WHERE vec_id % 50 != 0),
           |scored AS (
           |  SELECT query_id, match_id,
           |    list_sum(list_transform(range(1, len(qqv) + 1), i -> qqv[i] * cqv[i])) * qs * cs AS score
           |  FROM q, c
           |), ranked AS (
           |  SELECT query_id, match_id, score,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, match_id) AS rank
           |  FROM scored
           |)
           |SELECT query_id, match_id, rank, score FROM ranked WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin)) { t =>
    // Int8 scalar-quantized similarity search: per-vector symmetric
    // quantization (scale = max|x|/127, codes = round-half-up(x/scale))
    // shrinks the corpus 4x — at 100 TB the difference between an
    // in-memory and a spilling index. Scoring is the integer-code dot
    // product rescaled by the two scales; 64-dim int8 products sum to
    // < 2^21, so the double fold is EXACT on both engines and the
    // approximate scores hash-match bitwise. Brute-force baseline shape
    // as q30 (small query side); the IVF/LSH bucketing composes in
    // front unchanged since codes are just a narrower vector column.
    graft.expressions.GraftFunctions.register(t.spark)
    def prep(df: org.apache.spark.sql.DataFrame, idOut: String, pre: String) = df
      .select(col("vec_id").as(idOut), col("embedding").as("v"))
      .withColumn(s"${pre}s",
        greatest(array_max(transform(col("v"), x => abs(x.cast("double")))) / 127.0, lit(1e-30)))
      .select(col(idOut), col(s"${pre}s"),
        transform(col("v"), x => floor(x.cast("double") / col(s"${pre}s") + 0.5).cast("float"))
          .as(s"${pre}qv"))
    val q = prep(t.embeddings.where(col("vec_id") % 50 === 0), "query_id", "q")
    val c = prep(t.embeddings.where(col("vec_id") % 50 =!= 0), "match_id", "c")
    val scored = q.crossJoin(c)
      .select(col("query_id"), col("match_id"),
        (Similarity.dot(col("qqv"), col("cqv")) * col("qs") * col("cs")).as("cos"))
    Similarity.topKAgg(scored, 5)
      .withColumnRenamed("cos", "score")
      .orderBy("query_id", "rank")
  }

  val q75 = QueryDef(
    "q75_sequence_packing",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, source, len($toksSql) AS n_tokens FROM documents
            |), cum AS (
            |  SELECT doc_id, source, n_tokens,
            |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            |                        ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
            |  FROM toks
            |), placed AS (
            |  SELECT source, n_tokens,
            |    cum_before // 256 AS pack_id,
            |    (cum_before + n_tokens - 1) // 256 != cum_before // 256 AS straddles
            |  FROM cum
            |)
            |SELECT source, CAST(pack_id AS BIGINT) AS pack_id, COUNT(*) AS docs,
            |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
            |       CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
            |FROM placed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // Sequence packing for pretraining batches: docs stream onto a
    // per-source token tape in stable id order and 256-token tiles are
    // the packs — the concatenate-and-slice packing LLM training uses
    // (a doc straddling a tile boundary is split across two contexts;
    // the straddle count sizes that loss). One cumulative window per
    // source (the same prefix-sum shape as q47's token budget — packing
    // is inherently sequential, the partition key is what distributes
    // it), then one rollup.
    val toks = t.documents.select(col("doc_id"), col("source"),
      size(TextFns.tokens(col("text"))).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    toks.withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("source"), col("n_tokens"),
        expr("cum_before div 256").as("pack_id"),
        (expr("(cum_before + n_tokens - 1) div 256") =!= expr("cum_before div 256")).as("straddles"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"),
        sum(when(col("straddles"), 1).otherwise(0)).as("n_straddle"))
      .orderBy("source", "pack_id")
  }

  val q76 = QueryDef(
    "q76_ngram_containment",
    Some(s"""WITH b AS (
            |  SELECT doc_id, text, $bucketSql AS bucket FROM documents
            |), train_sh AS (SELECT doc_id, ${TextPack.shinglesSql(5)} AS shingles FROM b WHERE bucket < 80),
            |test_sh AS (SELECT doc_id, ${TextPack.shinglesSql(5)} AS shingles FROM b WHERE bucket >= 90),
            |train_grams AS (SELECT DISTINCT unnest(shingles) AS g FROM train_sh),
            |t_post AS (SELECT doc_id, unnest(shingles) AS g FROM test_sh),
            |hits AS (SELECT doc_id, COUNT(*) AS n_hit FROM t_post JOIN train_grams USING (g) GROUP BY 1)
            |SELECT s.doc_id, len(s.shingles) AS n_grams,
            |       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
            |       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(s.shingles) AS hit_frac,
            |       coalesce(h.n_hit, 0) > 0 AS contaminated
            |FROM test_sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
            |ORDER BY s.doc_id""".stripMargin)) { t =>
    // Membership-based decontamination (the published n-gram overlap
    // check): a held-out doc is contaminated if ANY of its 5-grams
    // appears anywhere in the training split — subset containment, not
    // q57's pairwise similarity, so one distinct-gram table stands in
    // for the whole training corpus and the test side probes it with an
    // equi-join: no pair enumeration at all, and at 100 TB the train
    // gram table is a precomputed, bucketed artifact. Counting is on
    // 56-bit gram hashes (the q27 move): same distinct counts, far
    // cheaper to shuffle than gram strings.
    graft.expressions.GraftFunctions.register(t.spark)
    val wb = t.documents.withColumn("bucket", bucketCol)
    def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      call_function("graft_shingle_hashes", col("text"), lit(5), lit(14)).as("shingles"))
    val trainGrams = sh(wb.where(col("bucket") < 80))
      .select(explode(col("shingles")).as("g")).distinct()
    val testSh = sh(wb.where(col("bucket") >= 90))
    val hits = testSh.select(col("doc_id"), explode(col("shingles")).as("g"))
      .join(trainGrams, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    testSh.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("shingles")).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / size(col("shingles"))).as("hit_frac"),
        (coalesce(col("n_hit"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  val q81 = QueryDef(
    "q81_context_chunks",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, $toksSql AS tk, len($toksSql) AS n FROM documents
            |), nch AS (
            |  SELECT doc_id, tk, (greatest(n - 64, 0) + 47) // 48 + 1 AS m FROM toks
            |), ch AS (
            |  SELECT doc_id, tk, unnest(range(0, m)) AS chunk_id FROM nch
            |)
            |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
            |  CAST(chunk_id * 48 AS BIGINT) AS start,
            |  CAST(len(list_slice(tk, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS BIGINT) AS n_tok,
            |  ${hash32Sql("array_to_string(list_slice(tk, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')")} AS h
            |FROM ch ORDER BY doc_id, chunk_id""".stripMargin)) { t =>
    // Context-window chunking: every doc becomes ceil((n-W)/S)+1
    // overlapping W-token windows at stride S (overlap W-S = 16 tokens
    // carries context across boundaries) — the chunk step between
    // cleaning and packing in an LLM data pipeline. One generator
    // explode per doc, no shuffle at all until the final presentation
    // sort: chunk count is derived arithmetically, the slice is a
    // built-in, and the chunk fingerprint reuses the md5-derived
    // hash32 both engines rebuild bit-identically. The LAST window is
    // short (slice clamps at the doc end) rather than re-anchored
    // backwards, so token offsets stay aligned to the stride grid and
    // a chunk's provenance is (doc_id, start) alone.
    val W = 64
    val S = 48
    val toks = t.documents.select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .withColumn("m", expr(s"(greatest(size(tk) - $W, 0) + ${S - 1}) div $S + 1"))
    toks.select(col("doc_id"), col("tk"),
        explode(sequence(lit(0L), col("m") - 1)).as("chunk_id"))
      .withColumn("start", col("chunk_id") * S)
      .withColumn("piece", slice(col("tk"), col("start") + lit(1), lit(W)))
      .select(col("doc_id"), col("chunk_id"), col("start"),
        size(col("piece")).cast("long").as("n_tok"),
        TextFns.hash32(concat_ws(" ", col("piece"))).as("h"))
      .orderBy("doc_id", "chunk_id")
  }

  val q83 = QueryDef(
    "q83_source_cap",
    Some(s"""WITH scored AS (
            |  SELECT source, doc_id, ${TextPack.qualitySql} AS quality FROM documents
            |), r AS (
            |  SELECT source, doc_id, quality,
            |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk
            |  FROM scored
            |)
            |SELECT source, doc_id, CAST(rnk AS BIGINT) AS rnk, quality
            |FROM r WHERE rnk <= 10 ORDER BY source, rnk""".stripMargin)) { t =>
    // Per-source document cap — keep only the 10 best-quality docs per
    // source (the per-domain cap a crawl corpus applies so boilerplate
    // farms can't dominate the mixture). The ranking is the
    // graft_topk_pairs partial aggregate, NOT a window: map-side
    // partials forward at most K pairs per source per upstream
    // partition, so the shuffle carries O(sources x K) rows and
    // nothing ever sorts the fact — the row_number() plan would
    // exchange and sort every document. Ties (quality desc, doc_id
    // asc) match the window exactly, which is what the oracle runs.
    graft.expressions.GraftFunctions.register(t.spark)
    val scored = t.documents.select(col("source"), col("doc_id"),
      TextFns.qualityScore(col("text"), TextFns.tokens(col("text"))).as("quality"))
    scored.groupBy("source")
      .agg(call_function("graft_topk_pairs", col("doc_id"), col("quality"), lit(10)).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("pos", "m")))
      .select(col("source"), col("m.match_id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rnk"), col("m.score").as("quality"))
      .orderBy("source", "rnk")
  }

  val q177 = QueryDef(
    "q177_bpe_packing",
    // q75's concatenate-and-slice packing, denominated in REAL (greedy
    // BPE) tokenizer tokens — the unit context windows are sized in.
    // The recursive-CTE tokenizer replay comes from TrainPack.bpeCte.
    Some(s"""${TrainPack.bpeCte},
            |toks AS (
            |  SELECT d.doc_id, d.source, b.n_bpe AS n_tokens
            |  FROM documents d JOIN bpe b ON d.doc_id = b.doc_id
            |), cum AS (
            |  SELECT doc_id, source, n_tokens,
            |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            |                        ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
            |  FROM toks
            |), placed AS (
            |  SELECT source, n_tokens,
            |    cum_before // 512 AS pack_id,
            |    (cum_before + n_tokens - 1) // 512 != cum_before // 512 AS straddles
            |  FROM cum
            |)
            |SELECT source, CAST(pack_id AS BIGINT) AS pack_id, COUNT(*) AS docs,
            |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
            |       CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
            |FROM placed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // Same single-window-per-source prefix-sum plan as q75; only the
    // token unit changes — one native codegen'd BPE expression inside
    // the scan, no UDF, no per-word explode.
    graft.expressions.GraftFunctions.register(t.spark)
    val toks = t.documents.select(col("doc_id"), col("source"),
      size(call_function("graft_bpe_tokens", col("text"))).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    toks.withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("source"), col("n_tokens"),
        expr("cum_before div 512").as("pack_id"),
        (expr("(cum_before + n_tokens - 1) div 512") =!= expr("cum_before div 512")).as("straddles"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"),
        sum(when(col("straddles"), 1).otherwise(0)).as("n_straddle"))
      .orderBy("source", "pack_id")
  }

  /** TEMPERATURE-BALANCED mixture sampling — the standard multi-domain
    * LLM recipe (sample domain i with probability ∝ n_i^α, α < 1, so
    * small domains are up-weighted relative to their share): unlike
    * q72's FIXED per-stratum rates, the rates here are DERIVED from
    * corpus statistics in the same query. α = 1/2 keeps every engine
    * bitwise-identical: sqrt is IEEE-correctly-rounded everywhere, and
    * the weight is floored into integer space immediately
    * (w = ⌊√n·1000⌋), so the rate arithmetic — basis points
    * r = min(10000, ⌊10⁷·w / (Σw·n)⌋) for a 1000-doc budget — is
    * integer end-to-end. Membership is the stable per-doc hash against
    * r, so the sample is rerunnable and partition-independent. One
    * fact scan + a broadcast of the domain-cardinality rate table.
    */
  val q182 = QueryDef(
    "q182_temperature_mixture",
    Some(s"""WITH s AS (
            |  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
            |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT) AS w
            |  FROM documents GROUP BY 1
            |), r AS (
            |  SELECT source, docs, w,
            |    least(CAST(10000 AS BIGINT),
            |          (10000000 * w) // (SUM(w) OVER () * docs)) AS rate_bp
            |  FROM s
            |), k AS (
            |  SELECT d.source,
            |    CASE WHEN ${hash32Sql("'tmix:' || CAST(d.doc_id AS VARCHAR)")} % 10000
            |              < r.rate_bp THEN 1 ELSE 0 END AS kept
            |  FROM documents d JOIN r ON d.source = r.source
            |)
            |SELECT r.source, r.docs, CAST(r.rate_bp AS DOUBLE) / 10000.0 AS target_rate,
            |  CAST(SUM(k.kept) AS BIGINT) AS sampled,
            |  CAST(SUM(k.kept) AS DOUBLE) / r.docs AS achieved_rate
            |FROM k JOIN r ON k.source = r.source
            |GROUP BY 1, 2, r.rate_bp ORDER BY 1""".stripMargin)) { t =>
    val stats = t.documents.groupBy("source")
      .agg(count(lit(1)).as("docs"))
      .withColumn("w", floor(sqrt(col("docs").cast("double")) * 1000).cast("long"))
      .withColumn("rate_bp",
        least(lit(10000L),
          expr("(10000000 * w) DIV ((SUM(w) OVER ()) * docs)")))
    val kept = when(
      TextFns.hash32(concat(lit("tmix:"), col("doc_id").cast("string"))) % 10000
        < col("rate_bp"), 1L).otherwise(0L)
    t.documents
      .join(broadcast(stats), "source")
      .select(col("source"), col("docs"), col("rate_bp"), kept.as("kept"))
      .groupBy(col("source"), col("docs"),
        (col("rate_bp").cast("double") / 10000.0).as("target_rate"))
      .agg(sum(col("kept")).as("sampled"))
      .withColumn("achieved_rate", col("sampled").cast("double") / col("docs"))
      .select("source", "docs", "target_rate", "sampled", "achieved_rate")
      .orderBy("source")
  }

  override def queries: Seq[QueryDef] = Seq(q70, q71, q72, q73, q74, q75, q76, q81, q83, q177, q182)
}
