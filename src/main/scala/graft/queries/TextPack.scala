package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{DetMath, TextFns}
import graft.operators.Dedup

/** Text-analysis operators over the `documents` corpus: token stats,
  * quality scoring, language ID, fingerprinting, exact dedup — the
  * heuristic-filter layer of a training-data pipeline.
  *
  * Oracle strategy: every scalar is either integer-derived or a fixed
  * op-order double expression, so DuckDB computes bitwise-identical
  * values (see TextFns scaladoc).
  */
object TextPack extends QueryPack {

  /** DuckDB fragments mirroring TextFns exactly. */
  private val toksSql = "string_split(text, ' ')"
  private def hash32Sql(s: String) = s"CAST('0x' || substr(md5($s), 1, 8) AS BIGINT)"
  private[queries] def shinglesSql(k: Int) =
    s"""list_distinct(CASE WHEN len($toksSql) >= $k
       | THEN [array_to_string($toksSql[i:i+${k - 1}], ' ') for i in range(1, len($toksSql) - ${k - 2})]
       | ELSE [text] END)""".stripMargin
  private val stopsIn = TextFns.StopWords.map(w => s"'$w'").mkString(", ")

  val q22 = QueryDef(
    "q22_text_stats",
    Some(s"""SELECT doc_id, lang,
            |  len($toksSql) AS n_tokens,
            |  len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'), t -> t != '')) AS n_regex_tokens,
            |  CAST(list_sum(list_transform($toksSql, t -> len(t))) AS DOUBLE) / len($toksSql) AS mean_token_len,
            |  CAST(length(text) - length(regexp_replace(text, '[^0-9A-Za-z ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
            |  CAST(len(list_filter($toksSql, t -> t IN ($stopsIn))) AS DOUBLE) / len($toksSql) AS stopword_ratio
            |FROM documents ORDER BY doc_id""".stripMargin)) { t =>
    // Token counting (whitespace + BPE-ish regex) and corpus text stats —
    // the per-doc feature layer every quality filter builds on.
    val toks = TextFns.tokens(col("text"))
    t.documents.select(
        col("doc_id"), col("lang"),
        size(toks).as("n_tokens"),
        size(TextFns.regexTokens(col("text"))).as("n_regex_tokens"),
        TextFns.meanTokenLen(toks).as("mean_token_len"),
        TextFns.punctRatio(col("text")).as("punct_ratio"),
        TextFns.stopwordRatio(toks).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  private[queries] val qualitySql =
    s"""(least(CAST(len($toksSql) AS DOUBLE) / 50.0, CAST(1.0 AS DOUBLE))
       | + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^0-9A-Za-z ]', '', 'g')) AS DOUBLE) / length(text) * 5.0, CAST(1.0 AS DOUBLE)))
       | + (1.0 - abs(CAST(len(list_filter($toksSql, t -> t IN ($stopsIn))) AS DOUBLE) / len($toksSql) - 0.3))
       |) / 3.0""".stripMargin

  val q23 = QueryDef(
    "q23_quality_filter",
    Some(s"""WITH scored AS (SELECT doc_id, lang, $qualitySql AS quality FROM documents)
            |SELECT doc_id, lang, quality FROM scored WHERE quality >= 0.5
            |ORDER BY doc_id""".stripMargin)) { t =>
    // Heuristic quality filter: keep docs scoring >= 0.5 on the
    // length/punctuation/stopword composite.
    t.documents.select(
        col("doc_id"), col("lang"),
        TextFns.qualityScore(col("text"), TextFns.tokens(col("text"))).as("quality"))
      .where(col("quality") >= 0.5)
      .orderBy("doc_id")
  }

  val q24 = QueryDef(
    "q24_lang_id", {
      val scores = TextFns.LangMarkers.map { case (lang, ms) =>
        lang -> s"len(list_filter($toksSql, t -> t IN (${ms.map(m => s"'$m'").mkString(", ")})))"
      }
      val best = s"greatest(${scores.map(_._2).mkString(", ")})"
      val cases = scores.map { case (lang, s) => s"WHEN $s = best AND best > 0 THEN '$lang'" }
      Some(s"""WITH s AS (SELECT doc_id, lang, $best AS best, $toksSql AS toks FROM documents)
              |SELECT lang, CASE ${cases.map(_.replace(toksSql, "toks")).mkString(" ")} ELSE 'und' END AS predicted,
              |       COUNT(*) AS n
              |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    }) { t =>
    // n-gram/frequent-word language ID vs the ground-truth lang column —
    // output is the confusion matrix. (The synthetic corpus shares one
    // vocabulary across langs, so the heuristic mostly says en/und — the
    // operator and its determinism are what's under test.)
    t.documents.select(col("lang"), TextFns.langId(TextFns.tokens(col("text"))).as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  val q25 = QueryDef(
    "q25_fingerprint_clusters",
    Some(s"""WITH fp AS (
            |  SELECT doc_id, list_min(list_transform(${shinglesSql(3)},
            |    s -> (${TextFns.minhashA(0)} * (${hash32Sql("s")} % ${TextFns.MinhashP}) + ${TextFns.minhashB(0)}) % ${TextFns.MinhashP})) AS fingerprint
            |  FROM documents
            |)
            |SELECT doc_id, fingerprint,
            |       COUNT(*) OVER (PARTITION BY fingerprint) AS cluster_size
            |FROM fp ORDER BY doc_id""".stripMargin)) { t =>
    // Rolling-hash document fingerprint (min shingle hash) + cluster
    // size: docs sharing a fingerprint are near-dup candidates.
    graft.expressions.GraftFunctions.register(t.spark)
    val fp = t.documents.select(col("doc_id"), TextFns.fingerprint(col("text"), 3).as("fingerprint"))
    val sizes = fp.groupBy("fingerprint").agg(count(lit(1)).as("cluster_size"))
    fp.join(sizes, "fingerprint")
      .select("doc_id", "fingerprint", "cluster_size")
      .orderBy("doc_id")
  }

  val q26 = QueryDef(
    "q26_exact_dedup",
    Some("""SELECT d.doc_id, d.source, md5(d.text) AS content_key FROM documents d
           |JOIN (SELECT md5(text) AS content_key, min(doc_id) AS doc_id FROM documents GROUP BY 1) k
           |  ON md5(d.text) = k.content_key AND d.doc_id = k.doc_id
           |ORDER BY d.doc_id""".stripMargin)) { t =>
    // Exact dedup: canonical (min-id) row per content hash — one shuffle,
    // the 100 TB-safe baseline dedup.
    Dedup.exact(t.documents, "text", "doc_id")
      .select(col("doc_id"), col("source"), md5(col("text")).as("content_key"))
      .orderBy("doc_id")
  }

  val q63 = QueryDef(
    "q63_repetition_filter",
    Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS toks FROM documents),
            |base AS (
            |  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct
            |  FROM toks),
            |uni AS (
            |  SELECT doc_id, MAX(c) AS top_unigram_n FROM (
            |    SELECT doc_id, COUNT(*) AS c
            |    FROM (SELECT doc_id, unnest(toks) AS tok FROM toks) GROUP BY doc_id, tok)
            |  GROUP BY doc_id),
            |bi AS (
            |  SELECT doc_id, MAX(c) AS top_bigram_n FROM (
            |    SELECT doc_id, COUNT(*) AS c
            |    FROM (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg
            |          FROM toks WHERE len(toks) >= 2)
            |    GROUP BY doc_id, bg)
            |  GROUP BY doc_id)
            |SELECT b.doc_id, b.n_tokens,
            |  CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
            |  CAST(top_unigram_n AS DOUBLE) / n_tokens AS top_unigram_frac,
            |  CAST(coalesce(top_bigram_n, 0) AS DOUBLE) / greatest(n_tokens - 1, 1) AS top_bigram_frac,
            |  (CAST(coalesce(top_bigram_n, 0) AS DOUBLE) / greatest(n_tokens - 1, 1) > 0.18
            |   OR CAST(n_distinct AS DOUBLE) / n_tokens < 0.5) AS repetitive
            |FROM base b JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
            |ORDER BY doc_id""".stripMargin)) { t =>
    // Gopher-style repetition filters — the standard quality signals the
    // length/punct/stopword composite (q23) does not cover: distinct-
    // token ratio, top-unigram fraction, top-bigram fraction, and the
    // keep/drop flag. Distributed as explode → two-phase (doc, gram)
    // count → per-doc max: partial aggregation keeps the shuffle at one
    // row per distinct (doc, gram), never a collected token list. All
    // ratios are one double division of two exact counts.
    val toks = t.documents.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val base = toks.select(col("doc_id"), size(col("toks")).as("n_tokens"),
      size(array_distinct(col("toks"))).as("n_distinct"))
    val uni = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_unigram_n"))
    val bi = toks.where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_bigram_n"))
    val topBigramFrac = coalesce(col("top_bigram_n"), lit(0L)).cast("double") /
      greatest(col("n_tokens") - 1, lit(1))
    val distinctRatio = col("n_distinct").cast("double") / col("n_tokens")
    base.join(uni, "doc_id").join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        distinctRatio.as("distinct_ratio"),
        (col("top_unigram_n").cast("double") / col("n_tokens")).as("top_unigram_frac"),
        topBigramFrac.as("top_bigram_frac"),
        (topBigramFrac > 0.18 || distinctRatio < 0.5).as("repetitive"))
      .orderBy("doc_id")
  }

  val q65 = QueryDef(
    "q65_token_histogram",
    Some(s"""WITH d AS (
            |  SELECT source, len($toksSql) AS n_tokens FROM documents),
            |b AS (
            |  SELECT source, length(bin(n_tokens)) - 1 AS bucket, n_tokens FROM d),
            |tot AS (SELECT source, COUNT(*) AS src_docs FROM d GROUP BY 1)
            |SELECT b.source, b.bucket,
            |  COUNT(*) AS n_docs,
            |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
            |  CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(src_docs) AS share
            |FROM b JOIN tot ON b.source = tot.source
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // Token-length histogram per source — the mixture-analysis view a
    // training pipeline reads before weighting sources. Buckets are
    // floor(log2(n_tokens)) computed in INTEGER space (length of the
    // binary representation) — a floating log2 can disagree between
    // engines at exact powers of two. Two tiny aggregates; at 100 TB
    // both are partial-aggregated on (source, bucket) / (source).
    val toks = t.documents.select(col("source"),
      size(TextFns.tokens(col("text"))).cast("bigint").as("n_tokens"))
    val b = toks.withColumn("bucket", length(bin(col("n_tokens"))) - 1)
    val tot = toks.groupBy("source").agg(count(lit(1)).as("src_docs"))
    b.join(broadcast(tot), "source")
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (count(lit(1)).cast("double") / first(col("src_docs"))).as("share"))
      .orderBy("source", "bucket")
  }

  /** Fixed keyword query for q91 — literal on both engines so the
    * conditional-aggregation sum has one fixed term order.
    */
  private val BmTerms = Seq("vector", "merge", "window")

  val q91 = QueryDef(
    "q91_bm25_topk", {
      val x = "((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)"
      val inList = BmTerms.map(t => s"'$t'").mkString(", ")
      val caseCols = BmTerms.map(t =>
        s"max(CASE WHEN term = '$t' THEN contrib END) AS c_$t").mkString(",\n        ")
      val nTerms = BmTerms.map(t => s"CASE WHEN c_$t IS NOT NULL THEN 1 ELSE 0 END")
        .reduceLeft((a, b) => s"($a + $b)")
      val score = BmTerms.map(t => s"coalesce(c_$t, 0.0)").reduceLeft((a, b) => s"($a + $b)")
      Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
              |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, SUM(dl) AS sum_dl FROM dl),
              |p AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf FROM
              |        (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term FROM toks)
              |      WHERE term IN ($inList) GROUP BY 1, 2, 3),
              |tdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY 1),
              |sc AS (SELECT p.doc_id, p.term,
              |        ${DetMath.detLnSql(x)}
              |        * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
              |           (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS contrib
              |       FROM p JOIN tdf USING (term) CROSS JOIN stats),
              |w AS (SELECT doc_id, $caseCols FROM sc GROUP BY 1)
              |SELECT doc_id, $nTerms AS n_terms, $score AS score
              |FROM w ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)
    }) { t =>
    // BM25 keyword retrieval, top-20 — the lexical-search face of the
    // corpus next to the embedding ANN (q30/q31/q51). Plan: the posting
    // build filters to the query's terms BEFORE any shuffle (explode →
    // narrow isin filter), so the grouped state is O(matching docs × |Q|),
    // never the corpus vocabulary; doc length rides the posting key
    // instead of joining the corpus back; df and the one-row corpus
    // stats broadcast; the final top-k is TakeOrderedAndProject (partial
    // per-partition top-k, no global sort). idf uses DetMath.detLn —
    // library ln is not bitwise-reproducible across engines (see DetMath)
    // — and the over-terms sum is conditional aggregation in literal term
    // order, so every double op has one fixed order on both engines.
    val k1 = lit(1.2)
    val toks = t.documents.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"), sum("dl").as("sum_dl"))
    val postings = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(BmTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).cast("long").as("tf"))
    val tdf = postings.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val x = (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0
    val tfD = col("tf").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val contrib = DetMath.detLn(x) * ((tfD * lit(1.2 + 1.0)) /
      (tfD + k1 * (lit(1.0 - 0.75) + lit(0.75) * (col("dl").cast("double") / avgdl))))
    val aggs = BmTerms.map(q => max(when(col("term") === q, col("contrib"))).as(s"c_$q"))
    val wide = postings.join(broadcast(tdf), "term").crossJoin(broadcast(stats))
      .withColumn("contrib", contrib)
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val nTerms = BmTerms.map(q => when(col(s"c_$q").isNotNull, 1).otherwise(0)).reduceLeft(_ + _)
    val score = BmTerms.map(q => coalesce(col(s"c_$q"), lit(0.0))).reduceLeft(_ + _)
    wide.select(col("doc_id"), nTerms.as("n_terms"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  val q97 = QueryDef(
    "q97_phrase_search",
    Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS toks FROM documents),
            |h AS (SELECT doc_id,
            |        [i for i in range(1, len(toks)) if toks[i] = 'hash' AND toks[i + 1] = 'join'] AS hits
            |      FROM toks)
            |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits, CAST(list_min(hits) AS BIGINT) AS first_pos
            |FROM h WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin)) { t =>
    // Exact phrase search ('hash join') from a positional index —
    // aligned-position equi-joins, the lexical complement of BM25 (q91):
    // postings are filtered to the phrase's own vocabulary before any
    // shuffle, each extra phrase word is one co-partitioned hash join,
    // and multi-occurrence/overlapping matches count individually
    // (RetrievalSpec pins overlap semantics on 'a a a').
    graft.operators.Retrieval.phraseSearch(t.documents, "doc_id", "text", Seq("hash", "join"))
      .orderBy("doc_id")
  }

  val q104 = QueryDef(
    "q104_distinctive_terms", {
      val lnArg = "CAST(ns AS DOUBLE) / CAST(df AS DOUBLE)"
      Some(s"""WITH terms AS (SELECT source, unnest($toksSql) AS term FROM documents),
              |cnt AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c FROM terms GROUP BY 1, 2),
              |sdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM cnt GROUP BY 1),
              |nsrc AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS ns FROM documents),
              |sc AS (SELECT cnt.source, cnt.term, c,
              |         CAST(c AS DOUBLE) * ${graft.functions.DetMath.detLnSql(lnArg)} AS score
              |       FROM cnt JOIN sdf USING (term) CROSS JOIN nsrc),
              |r AS (SELECT source, term, c, score,
              |        row_number() OVER (PARTITION BY source ORDER BY score DESC, term) AS rnk
              |      FROM sc)
              |SELECT source, term, c, score, CAST(rnk AS INTEGER) AS rnk
              |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin)
    }) { t =>
    // Distinctive vocabulary per source — tf·idf over SOURCES (score =
    // count × ln(n_sources/source_df), the ln a DetMath.detLn): the
    // per-source fingerprint a mixture report prints next to q65's
    // length histograms. Ranking runs on the vocab-sized (source, term)
    // count table — already partial-aggregated, orders of magnitude
    // smaller than the corpus — with the source-df side joined
    // broadcast-style; terms appearing in every source score exactly
    // zero and fall out of the top-5 naturally.
    import graft.functions.DetMath
    import org.apache.spark.sql.expressions.Window
    val terms = t.documents.select(col("source"), explode(TextFns.tokens(col("text"))).as("term"))
    val cnt = terms.groupBy("source", "term").agg(count(lit(1)).as("c"))
    val sdf = cnt.groupBy("term").agg(count(lit(1)).as("df"))
    val nsrc = t.documents.agg(countDistinct(col("source")).as("ns"))
    val score = col("c").cast("double") *
      DetMath.detLn(col("ns").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy("source").orderBy(col("score").desc, col("term"))
    cnt.join(sdf, "term").crossJoin(broadcast(nsrc))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select(col("source"), col("term"), col("c"), col("score"), col("rnk"))
      .orderBy("source", "rnk")
  }

  val q124 = QueryDef(
    "q124_unigram_nll", {
      val lnArg = "CAST(total AS DOUBLE) / CAST(c AS DOUBLE)"
      Some(s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
              |freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
              |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks),
              |sc AS (SELECT doc_id,
              |         CAST(floor(${graft.functions.DetMath.detLnSql(lnArg)} * 1000000.0) AS BIGINT) AS mn
              |       FROM toks JOIN freq USING (tok) CROSS JOIN tot)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
              |  CAST(SUM(mn) AS BIGINT) AS nll_micro,
              |  (CAST(SUM(mn) AS DOUBLE) / 1000000.0) / COUNT(*) AS avg_nll
              |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin)
    }) { t =>
    // Unigram-LM negative log likelihood per document — the classic
    // perplexity-proxy quality filter (the publicly documented CCNet
    // recipe scores docs with a language model and keeps the
    // low-perplexity tail; the unigram form is its first rung): one
    // corpus pass builds token frequencies, a posting join prices each
    // token at -ln p(tok) = detLn(total/c), and per-doc totals
    // accumulate in INTEGER micro-nats (floor is IEEE-exact in every
    // engine; a double sum over shuffled postings would be
    // order-sensitive). Two shuffles (freq groupBy, doc groupBy) — the
    // frequency table is vocab-sized and AQE broadcasts it onto the
    // posting join at any corpus scale.
    import graft.functions.DetMath
    val toks = t.documents.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("total"))
    toks.join(freq, "tok").crossJoin(broadcast(tot))
      .withColumn("mn",
        floor(DetMath.detLn(col("total").cast("double") / col("c").cast("double")) * 1000000.0)
          .cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("mn")).as("nll_micro"))
      .withColumn("avg_nll",
        (col("nll_micro").cast("double") / 1000000.0) / col("n_toks"))
      .select("doc_id", "n_toks", "nll_micro", "avg_nll")
      .orderBy("doc_id")
  }

  val q162 = QueryDef(
    "q162_linear_quality_classifier",
    // oracle: the same hashed-linear score recomputed token by token —
    // the fasttext/CCNet-style quality classifier applied at corpus
    // scale: each token hashes into a 4096-bucket weight table (weights
    // a fixed integer function of the bucket, standing in for trained
    // parameters shipped as a broadcast array), the document score is
    // the INTEGER weight sum (order-free, engine-exact), and the gate
    // keeps positive-scoring docs. A hash off by one bucket, a token
    // split drift, or a lossy sum shifts a group and fails.
    Some(s"""WITH scored AS (
            |  SELECT source, lang,
            |    CAST(COALESCE(list_sum(
            |      [((${hash32Sql("'qw:' || t")} % 4096) * 2654435761) % 1021 - 510
            |       for t in $toksSql]), 0) AS BIGINT) AS score
            |  FROM documents)
            |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            |  CAST(SUM(score) AS BIGINT) AS total_score
            |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // Hashed linear scorer as PURE Column expressions (no UDF): one
    // md5-derived bucket per token, an affine integer weight per
    // bucket, an integer fold — whole-stage-codegen'd end to end. At
    // 100 TB this is one scan, no shuffle before the final rollup; a
    // trained model swaps the affine weight for element_at(broadcast
    // weight array, bucket) with the same plan shape.
    val toks = TextFns.tokens(col("text"))
    val score = coalesce(
      aggregate(
        transform(toks, tok =>
          (TextFns.hash32(concat(lit("qw:"), tok)) % 4096L) * 2654435761L % 1021L - 510L),
        lit(0L), (acc, x) => acc + x),
      lit(0L)).as("score")
    t.documents.select(col("source"), score)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_kept"),
        sum(col("score")).as("total_score"))
      .orderBy("source")
  }

  override def queries: Seq[QueryDef] =
    Seq(q22, q23, q24, q25, q26, q63, q65, q91, q97, q104, q124, q162)
}
