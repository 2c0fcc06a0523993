package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Dedup, FuzzyJoin}

/** Near-duplicate detection over `documents` — n-gram Jaccard, MinHash+
  * LSH, SimHash (see operators.Dedup for the scale design; none of these
  * plans contains a document cross join).
  *
  * The testdata plants ~25 near-dup pairs at Jaccard >= 0.9 against a
  * ~0.1 background — thresholds sit in that gap.
  */
object DedupPack extends QueryPack {

  private[queries] val toksSql = "string_split(text, ' ')"
  private[queries] def hash32Sql(s: String) = s"CAST('0x' || substr(md5($s), 1, 8) AS BIGINT)"
  private[queries] def shingles3SqlOf(c: String) = {
    val ts = s"string_split($c, ' ')"
    s"""list_distinct(CASE WHEN len($ts) >= 3
       | THEN [array_to_string($ts[i:i+2], ' ') for i in range(1, len($ts) - 1)]
       | ELSE [$c] END)""".stripMargin
  }
  private[queries] val shingles3Sql = shingles3SqlOf("text")

  val q27 = QueryDef(
    "q27_jaccard_pairs",
    Some(s"""WITH sh AS (SELECT doc_id, $shingles3Sql AS shingles FROM documents)
            |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
            |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
            |ORDER BY id_a, id_b""".stripMargin)) { t =>
    // 3-gram Jaccard near-dup pairs via the shingle inverted-index join —
    // the oracle cross-joins (fine at 500 docs); the engine never does.
    Dedup.jaccardPairs(t.documents, "doc_id", "text", k = 3, minJaccard = 0.5)
      .orderBy("id_a", "id_b")
  }

  val q123 = QueryDef(
    "q123_containment_pairs",
    Some(s"""WITH sh AS (SELECT doc_id, $shingles3Sql AS shingles FROM documents)
            |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            |    least(len(a.shingles), len(b.shingles)) AS containment
            |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            |    least(len(a.shingles), len(b.shingles)) >= 0.4
            |ORDER BY id_a, id_b""".stripMargin)) { t =>
    // Containment dedup — the asymmetric case Jaccard misses: a short
    // doc quoted whole inside a long one has Jaccard ≈ |short|/|long|
    // (arbitrarily small) but containment ≈ 1, so the subsumed fragment
    // survives a Jaccard-only pass. Same postings plan as q27; the
    // ratio divides the intersection by the SMALLER set instead of the
    // union. The 0.4 threshold sits below the planted-pair band so both
    // planted near-dups and genuinely subsumed fragments surface.
    Dedup.containmentPairs(t.documents, "doc_id", "text", k = 3, minContainment = 0.4)
      .orderBy("id_a", "id_b")
  }

  // 16 minhashes = 4 bands x 4 rows; verification threshold 0.8.
  private[queries] val Bands = 4; private[queries] val Rows = 4
  private[queries] def minhashSql(i: Int) = {
    import graft.functions.TextFns.{minhashA, minhashB, MinhashP}
    s"list_min(list_transform(shingles, s -> (${minhashA(i)} * (${hash32Sql("s")} % $MinhashP) + ${minhashB(i)}) % $MinhashP))"
  }
  private[queries] def bandKeySql(b: Int) =
    s"md5(concat_ws(',', '$b', ${(b * Rows until b * Rows + Rows).map(i => s"m$i").mkString(", ")}))"

  val q28 = QueryDef(
    "q28_minhash_lsh",
    Some(s"""WITH sh AS (SELECT doc_id, $shingles3Sql AS shingles FROM documents),
            |sig AS (SELECT doc_id, shingles,
            |  ${(0 until Bands * Rows).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
            |  FROM sh),
            |banded AS (
            |  ${(0 until Bands).map(b =>
                 s"SELECT doc_id, shingles, $b AS band, ${bandKeySql(b)} AS key FROM sig")
                 .mkString(" UNION ALL ")}
            |),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            |    a.shingles AS sa, b.shingles AS sb
            |  FROM banded a JOIN banded b
            |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            |)
            |SELECT id_a, id_b,
            |  CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(list_distinct(list_concat(sa, sb))) AS jaccard
            |FROM cand
            |WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(list_distinct(list_concat(sa, sb))) >= 0.8
            |ORDER BY id_a, id_b""".stripMargin)) { t =>
    // MinHash(16) + LSH(4x4) banding, candidates verified at Jaccard
    // >= 0.8 — the sub-quadratic scale path for corpus dedup.
    Dedup.minhashLshPairs(t.documents, "doc_id", "text", k = 3,
        bands = Bands, rowsPerBand = Rows, minJaccard = 0.8)
      .orderBy("id_a", "id_b")
  }

  val q29 = QueryDef(
    "q29_simhash_neardup",
    Some(s"""WITH h AS (
            |  SELECT doc_id, list_transform($toksSql, t -> ${hash32Sql("t")}) AS hs FROM documents
            |), sig AS (
            |  SELECT doc_id, CAST(list_sum(
            |    [CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN (x & (1::BIGINT << j)) != 0 THEN 1 ELSE -1 END)) > 0
            |          THEN (1::BIGINT << j) ELSE 0 END for j in range(0, 32)]) AS BIGINT) AS sim
            |  FROM h
            |)
            |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |       bit_count(xor(a.sim, b.sim)) AS hamming
            |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            |WHERE bit_count(xor(a.sim, b.sim)) <= 3
            |ORDER BY id_a, id_b""".stripMargin)) { t =>
    // 32-bit SimHash near-dups at hamming <= 3 via exact byte banding
    // (pigeonhole: 4 disjoint bytes, <= 3 flips leave one equal).
    Dedup.simhashPairs(t.documents, "doc_id", "text", maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  val q57 = QueryDef(
    "q57_contamination",
    Some(s"""WITH b AS (
            |  SELECT doc_id, text,
            |    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
            |  FROM documents
            |), train AS (SELECT doc_id, $shingles3Sql AS shingles FROM b WHERE bucket < 80),
            |tst AS (SELECT doc_id, $shingles3Sql AS shingles FROM b WHERE bucket >= 90)
            |SELECT a.doc_id AS id_a, t.doc_id AS id_b,
            |  CAST(len(list_intersect(a.shingles, t.shingles)) AS DOUBLE) /
            |    (len(a.shingles) + len(t.shingles) - len(list_intersect(a.shingles, t.shingles))) AS jaccard
            |FROM train a JOIN tst t
            |  ON CAST(len(list_intersect(a.shingles, t.shingles)) AS DOUBLE) /
            |    (len(a.shingles) + len(t.shingles) - len(list_intersect(a.shingles, t.shingles))) >= 0.5
            |ORDER BY id_a, id_b""".stripMargin)) { t =>
    // Train/test decontamination: deterministic q46 split, then
    // cross-corpus near-dup detection — an eval doc whose 3-gram overlap
    // with any training doc clears the threshold is contaminated. Same
    // inverted-index plan as q27, restricted to cross-split pairs.
    import graft.functions.TextFns
    val bucket = TextFns.hash32(concat(lit("split:"), col("doc_id").cast("string"))) % 100
    val withBucket = t.documents.withColumn("bucket", bucket)
    graft.operators.Dedup.jaccardPairsAcross(
        withBucket.where(col("bucket") < 80), withBucket.where(col("bucket") >= 90),
        "doc_id", "text", k = 3, minJaccard = 0.5)
      .orderBy("id_a", "id_b")
  }

  val q44 = QueryDef(
    "q44_dedup_survivors",
    // connected components ARE SQL-expressible: transitive closure as a
    // recursive CTE (tiny here — clusters are shallow), canonical id =
    // min over the reachable set. The engine's label propagation must
    // agree exactly.
    Some(s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles3Sql AS shingles FROM documents),
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
            |canon AS (SELECT src AS id, min(dst) AS canonical_id FROM reach GROUP BY 1)
            |SELECT d.doc_id AS id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
            |FROM documents d LEFT JOIN canon c ON d.doc_id = c.id
            |ORDER BY id""".stripMargin)) { t =>
    // The full dedup flow: near-dup pairs → connected components →
    // min-id survivor per cluster (iterative min-label propagation;
    // also golden-tested in DstCanonSpec).
    val pairs = Dedup.jaccardPairs(t.documents, "doc_id", "text", k = 3, minJaccard = 0.5)
    Dedup.canonicalize(t.documents.select("doc_id"), "doc_id", pairs)
      .orderBy("id")
  }

  val q94 = QueryDef(
    "q94_fuzzy_join", {
      val h = hash32Sql("'fz:' || s_name")
      Some(s"""WITH src AS (
              |  SELECT s_suppkey, s_name,
              |    CAST(${hash32Sql("'fp:' || s_name")} % length(s_name) + 1 AS INTEGER) AS p
              |  FROM supplier),
              |dirty AS (
              |  SELECT s_suppkey AS d_key,
              |    CASE WHEN $h % 3 = 0
              |           THEN substr(s_name, 1, p - 1) || substr(s_name, p + 1, length(s_name) - p)
              |         WHEN $h % 3 = 1
              |           THEN substr(s_name, 1, p - 1) || 'x' || substr(s_name, p + 1, length(s_name) - p)
              |         ELSE s_name END AS d_name
              |  FROM src),
              |canon AS (SELECT s_suppkey AS c_key, s_name AS c_name FROM supplier)
              |SELECT d_key, c_key, CAST(levenshtein(d_name, c_name) AS INTEGER) AS dist
              |FROM dirty JOIN canon ON levenshtein(d_name, c_name) <= 1
              |ORDER BY 1, 2""".stripMargin)
    }) { t =>
    // Record linkage: match deterministically-corrupted supplier names
    // (hash-chosen delete / substitute / keep) back to the canonical
    // list at edit distance <= 1. The oracle is the naive predicate
    // join; the engine runs FuzzyJoin.join1 — symmetric-deletion
    // blocking, an equi-join on exploded deletion-1 neighborhood keys
    // with exact verification on candidates only. Lossless (the del-1
    // neighborhoods of any two strings within one edit must intersect)
    // where prefix blocking would put every 'Supplier#...' name in one
    // block; FuzzyJoinSpec pins block-join == naive-join equality.
    val s = col("s_name")
    val p = (TextFns.hash32(concat(lit("fp:"), s)) % length(s)).cast("int") + 1
    val h = TextFns.hash32(concat(lit("fz:"), s))
    val corrupted = when(h % 3 === 0,
        concat(s.substr(lit(1), p - 1), s.substr(p + 1, length(s) - p)))
      .when(h % 3 === 1,
        concat(s.substr(lit(1), p - 1), lit("x"), s.substr(p + 1, length(s) - p)))
      .otherwise(s)
    val dirty = t.supplier.select(col("s_suppkey").as("d_key"), corrupted.as("d_name"))
    val canon = t.supplier.select(col("s_suppkey").as("c_key"), col("s_name").as("c_name"))
    FuzzyJoin.join1(dirty, canon, "d_name", "c_name")
      .select(col("d_key"), col("c_key"),
        levenshtein(col("d_name"), col("c_name")).as("dist"))
      .orderBy("d_key", "c_key")
  }

  val q95 = QueryDef(
    "q95_quality_survivorship",
    Some(s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles3Sql AS shingles FROM documents),
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
            |comp AS (SELECT d.doc_id AS id, coalesce(c.canonical_id, d.doc_id) AS component_id
            |         FROM documents d LEFT JOIN canon c ON d.doc_id = c.id),
            |q AS (SELECT doc_id, ${TextPack.qualitySql} AS quality FROM documents),
            |j AS (SELECT comp.id, comp.component_id, q.quality FROM comp JOIN q ON comp.id = q.doc_id),
            |s AS (SELECT id, component_id, quality,
            |  first_value(id) OVER (PARTITION BY component_id ORDER BY quality DESC, id) AS survivor_id
            |  FROM j)
            |SELECT id AS doc_id, component_id, survivor_id, (id = survivor_id) AS keep, quality
            |FROM s ORDER BY doc_id""".stripMargin)) { t =>
    // Survivorship POLICY on top of near-dup components: instead of
    // q44's min-id canonical, each cluster keeps its best-quality member
    // (argmax quality, ties to the lower id) — what a curation pipeline
    // actually wants when one near-duplicate is the cleaner copy. The
    // survivor election is an AGGREGATE (max_by over a (quality, -id)
    // struct key), not a per-cluster window sort: one partial-aggregated
    // shuffle row per component, joined back broadcast-style — the same
    // plan shape at 100 TB.
    val pairs = Dedup.jaccardPairs(t.documents, "doc_id", "text", k = 3, minJaccard = 0.5)
    val comp = Dedup.canonicalize(t.documents.select("doc_id"), "doc_id", pairs)
      .withColumnRenamed("canonical_id", "component_id")
    val q = t.documents.select(col("doc_id"),
      TextFns.qualityScore(col("text"), TextFns.tokens(col("text"))).as("quality"))
    // TWO consumers read j (the survivor election aggregate and the
    // final output join) and its quality column is the expensive text
    // scoring pass — materialize once; at 100 TB this is the persisted
    // stage boundary between scoring and election
    val j = comp.join(q, comp("id") === q("doc_id"))
      .select(col("id"), col("component_id"), col("quality"))
      .localCheckpoint()
    val surv = j.groupBy("component_id")
      .agg(max_by(col("id"), struct(col("quality"), -col("id"))).as("survivor_id"))
    j.join(surv, "component_id")
      .select(col("id").as("doc_id"), col("component_id"), col("survivor_id"),
        (col("id") === col("survivor_id")).as("keep"), col("quality"))
      .orderBy("doc_id")
  }

  val q101 = QueryDef(
    "q101_source_overlap_matrix", {
      val sigCols = (0 until 16).map(i => s"MIN(${minhashSql(i)}) AS m_$i").mkString(",\n        ")
      val matches = (0 until 16).map(i => s"CASE WHEN a.m_$i = b.m_$i THEN 1 ELSE 0 END")
        .reduceLeft((x, y) => s"($x + $y)")
      Some(s"""WITH sh AS (SELECT source, $shingles3Sql AS shingles FROM documents),
              |sig AS (
              |  SELECT source,
              |        $sigCols
              |  FROM sh GROUP BY 1)
              |SELECT a.source AS src_a, b.source AS src_b,
              |  $matches AS seed_matches,
              |  CAST($matches AS DOUBLE) / 16.0 AS jaccard_est
              |FROM sig a JOIN sig b ON a.source < b.source
              |ORDER BY 1, 2""".stripMargin)
    }) { t =>
    // Corpus-LEVEL overlap screening: one MinHash signature per SOURCE
    // (the min of each seed over the union of the source's shingles —
    // min is associative, so the per-source signature partial-aggregates
    // like any min) and a pairwise seed-match count estimating the
    // Jaccard overlap of the sources' shingle sets. The matrix costs
    // sources² signature comparisons — never a document pair — which is
    // how you screen "does crawl B substantially duplicate crawl A?"
    // before committing to the doc-level dedup. Pure integer minima:
    // bitwise-deterministic in any engine.
    import graft.functions.TextFns
    val sh = t.documents.select(col("source"),
        explode(TextFns.wordShingles(TextFns.tokens(col("text")), 3)).as("s"))
      .select(col("source"), (TextFns.hash32(col("s")) % TextFns.MinhashP).as("hs"))
    val aggs = (0 until 16).map(i =>
      min((lit(TextFns.minhashA(i)) * col("hs") + lit(TextFns.minhashB(i))) % TextFns.MinhashP)
        .as(s"m_$i"))
    val sig = sh.groupBy("source").agg(aggs.head, aggs.tail: _*)
    val a = sig.select(col("source").as("src_a") +: (0 until 16).map(i => col(s"m_$i").as(s"a_$i")): _*)
    val b = sig.select(col("source").as("src_b") +: (0 until 16).map(i => col(s"m_$i").as(s"b_$i")): _*)
    val matches = (0 until 16).map(i => when(col(s"a_$i") === col(s"b_$i"), 1).otherwise(0))
      .reduceLeft(_ + _)
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), matches.as("seed_matches"),
        (matches.cast("double") / 16.0).as("jaccard_est"))
      .orderBy("src_a", "src_b")
  }

  val q109 = QueryDef.staged(
    "q109_incremental_components",
    // q44's oracle VERBATIM: the incremental path must reproduce the
    // full-recompute labeling exactly
    Some(s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles3Sql AS shingles FROM documents),
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
            |canon AS (SELECT src AS id, min(dst) AS canonical_id FROM reach GROUP BY 1)
            |SELECT d.doc_id AS id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
            |FROM documents d LEFT JOIN canon c ON d.doc_id = c.id
            |ORDER BY id""".stripMargin)) { t =>
    // FIXTURE (untimed): "yesterday's state" — the labeled old corpus
    // and tonight's new pair batch. Building it runs the FULL
    // jaccardPairs + canonicalize over the sub-corpus, which is
    // scaffolding for the operator under test, not the operator: at
    // 100 TB yesterday's labels exist on disk, tonight's pairs come
    // from the landing batch. Staged so Bench times only the
    // incremental fold; localCheckpoint pins both inputs so the timed
    // region re-reads materialized partitions, not the pair join.
    //
    // Yesterday's corpus is docs < 400 (labeled by the standard
    // propagation), tonight's batch adds the rest — only the NEW pairs
    // (those touching a new doc) feed the incremental fold. The pair
    // table feeds four consumers (old split, lift, new-id derivation,
    // seed anti-join) — materialize the inverted-index join once.
    val pairs = Dedup.jaccardPairs(t.documents, "doc_id", "text", k = 3, minJaccard = 0.5)
      .localCheckpoint()
    val oldPairs = pairs.where(col("id_a") < 400 && col("id_b") < 400)
    val newPairs = pairs.where(col("id_a") >= 400 || col("id_b") >= 400)
      .localCheckpoint()
    val oldLabels = Dedup.canonicalize(
      t.documents.where(col("doc_id") < 400).select("doc_id"), "doc_id", oldPairs)
    val allIds = t.documents.select(col("doc_id").as("id"))
    // new docs with no pairs at all still need self-labels
    val seeded = allIds.join(oldLabels.select("id"), Seq("id"), "left_anti")
      .join(newPairs.select(col("id_a").as("id"))
        .unionByName(newPairs.select(col("id_b").as("id"))).distinct(),
        Seq("id"), "left_anti")
      .withColumn("canonical_id", col("id"))
      .unionByName(oldLabels)
      .localCheckpoint()
    (seeded, newPairs)
  } { (t, fixture: (DataFrame, DataFrame)) =>
    // MEASURED: the incremental fold only — contract the new pairs
    // onto the canonical-label graph (components-touched-sized) and
    // remap. The oracle is q44's full-closure CTE verbatim: the
    // incremental path must reproduce the full recompute bit for bit.
    val (seeded, newPairs) = fixture
    Dedup.canonicalizeIncremental(seeded, newPairs)
      .orderBy("id")
  }

  val q170 = QueryDef(
    "q170_chunk_dedup",
    // oracle: the sub-document dedup recomputed from first principles —
    // 10-token chunk windows, each distinct chunk text keeping its
    // first corpus-wide occurrence (smallest (doc_id, chunk_no));
    // per-doc totals of chunks/kept-chunks/kept-tokens. max tokens per
    // doc is 100 → chunk_no < 16, so doc_id*16+chunk_no is the
    // lexicographic keeper key in integer form.
    Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |ch AS (
           |  SELECT doc_id, i.range AS chunk_no,
           |    array_to_string(ts[CAST(i.range*10+1 AS BIGINT):CAST(i.range*10+10 AS BIGINT)], ' ') AS chunk
           |  FROM tok, range(0, 16) i(range)
           |  WHERE i.range * 10 < len(ts)
           |),
           |kp AS (SELECT md5(chunk) AS h, min(doc_id * 16 + chunk_no) AS kk FROM ch GROUP BY 1)
           |SELECT c.doc_id,
           |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
           |  CAST(SUM(CASE WHEN c.doc_id*16 + c.chunk_no = k.kk THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           |  CAST(SUM(CASE WHEN c.doc_id*16 + c.chunk_no = k.kk
           |           THEN len(string_split(c.chunk, ' ')) ELSE 0 END) AS BIGINT) AS kept_tokens
           |FROM ch c JOIN kp k ON md5(c.chunk) = k.h
           |GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // SUB-DOCUMENT exact dedup (the C4/CCNet boilerplate pass): fixed
    // 10-token windows, first corpus-wide occurrence wins, per-doc
    // survival stats — the granularity document-level dedup (q26)
    // cannot reach. One scan, keeper by one window rank over the
    // chunk hash; see operators.Dedup.chunkDedup.
    Dedup.chunkDedup(t.documents, "doc_id", "text", chunkTokens = 10)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_chunks"),
        sum(when(col("keep"), col("n_tokens").cast("long")).otherwise(0L)).as("kept_tokens"))
      .orderBy("doc_id")
  }

  val q174 = QueryDef(
    "q174_cdc_chunk_dedup",
    // oracle: content-defined chunking recomputed from first
    // principles — a boundary falls between adjacent tokens whenever
    // hash32 of the 2-gram ≡ 0 (mod 16); each distinct chunk keeps its
    // first corpus-wide occurrence (smallest (doc_id, chunk_no);
    // chunk_no < 128 since docs have ≤ 100 tokens, so doc_id*128 +
    // chunk_no is the lexicographic keeper key in integer form).
    Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |cut AS (
           |  SELECT doc_id, ts,
           |    [CAST(0 AS BIGINT)] ||
           |    [CAST(b AS BIGINT) for b in range(1, len(ts))
           |       if CAST('0x' || substr(md5(ts[b] || ' ' || ts[b+1]), 1, 8) AS BIGINT) % 16 = 0] ||
           |    [CAST(len(ts) AS BIGINT)] AS cuts
           |  FROM tok
           |),
           |ch AS (
           |  SELECT doc_id, i.j AS chunk_no,
           |    array_to_string(ts[CAST(cuts[CAST(i.j+1 AS BIGINT)]+1 AS BIGINT):CAST(cuts[CAST(i.j+2 AS BIGINT)] AS BIGINT)], ' ') AS chunk
           |  FROM cut, range(0, 128) i(j)
           |  WHERE i.j < len(cuts) - 1
           |),
           |kp AS (SELECT md5(chunk) AS h, min(doc_id * 128 + chunk_no) AS kk FROM ch GROUP BY 1)
           |SELECT c.doc_id,
           |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
           |  CAST(SUM(CASE WHEN c.doc_id*128 + c.chunk_no = k.kk THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           |  CAST(SUM(CASE WHEN c.doc_id*128 + c.chunk_no = k.kk
           |           THEN len(string_split(c.chunk, ' ')) ELSE 0 END) AS BIGINT) AS kept_tokens
           |FROM ch c JOIN kp k ON md5(c.chunk) = k.h
           |GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // CONTENT-DEFINED chunk dedup: boundaries from local 2-gram hashes
    // (≡ 0 mod 16 → ~16-token chunks), so an identical passage chunks
    // identically at ANY offset — the boilerplate q170's fixed windows
    // miss when a banner shifts it. Same one-scan, light-shuffle plan
    // as q170; see operators.Dedup.cdcChunkDedup.
    Dedup.cdcChunkDedup(t.documents, "doc_id", "text", divisor = 16)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_chunks"),
        sum(when(col("keep"), col("n_tokens").cast("long")).otherwise(0L)).as("kept_tokens"))
      .orderBy("doc_id")
  }

  val q181 = QueryDef(
    "q181_chunk_neardup",
    // oracle: CDC chunking + keeper (q174's CTEs), survivors (kept,
    // >= 5 tokens) re-identified as doc*128+chunk_no, then the q28
    // MinHash(16)/LSH(4x4) machinery over the CHUNK text, verified at
    // Jaccard >= 0.5
    Some(s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |cut AS (
            |  SELECT doc_id, ts,
            |    [CAST(0 AS BIGINT)] ||
            |    [CAST(b AS BIGINT) for b in range(1, len(ts))
            |       if CAST('0x' || substr(md5(ts[b] || ' ' || ts[b+1]), 1, 8) AS BIGINT) % 16 = 0] ||
            |    [CAST(len(ts) AS BIGINT)] AS cuts
            |  FROM tok
            |),
            |ch AS (
            |  SELECT doc_id, i.j AS chunk_no,
            |    array_to_string(ts[CAST(cuts[CAST(i.j+1 AS BIGINT)]+1 AS BIGINT):CAST(cuts[CAST(i.j+2 AS BIGINT)] AS BIGINT)], ' ') AS chunk
            |  FROM cut, range(0, 128) i(j)
            |  WHERE i.j < len(cuts) - 1
            |),
            |kp AS (SELECT md5(chunk) AS h, min(doc_id * 128 + chunk_no) AS kk FROM ch GROUP BY 1),
            |surv AS (
            |  SELECT c.doc_id * 128 + c.chunk_no AS cid, c.chunk
            |  FROM ch c JOIN kp k ON md5(c.chunk) = k.h
            |  WHERE c.doc_id * 128 + c.chunk_no = k.kk
            |    AND len(string_split(c.chunk, ' ')) >= 5
            |),
            |sh AS (SELECT cid, ${shingles3SqlOf("chunk")} AS shingles FROM surv),
            |sig AS (SELECT cid, shingles,
            |  ${(0 until Bands * Rows).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
            |  FROM sh),
            |banded AS (
            |  ${(0 until Bands).map(b =>
                 s"SELECT cid, shingles, $b AS band, ${bandKeySql(b)} AS key FROM sig")
                 .mkString(" UNION ALL ")}
            |),
            |cand AS (
            |  SELECT DISTINCT a.cid AS id_a, b.cid AS id_b,
            |    a.shingles AS sa, b.shingles AS sb
            |  FROM banded a JOIN banded b
            |    ON a.band = b.band AND a.key = b.key AND a.cid < b.cid
            |)
            |SELECT CAST(id_a // 128 AS BIGINT) AS doc_a, CAST(id_a % 128 AS BIGINT) AS chunk_a,
            |  CAST(id_b // 128 AS BIGINT) AS doc_b, CAST(id_b % 128 AS BIGINT) AS chunk_b,
            |  CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(list_distinct(list_concat(sa, sb))) AS jaccard
            |FROM cand
            |WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE) / len(list_distinct(list_concat(sa, sb))) >= 0.5
            |ORDER BY doc_a, chunk_a, doc_b, chunk_b""".stripMargin)) { t =>
    // NEAR-duplicate passages (the fuzzy tier q174's exact chunk dedup
    // cannot reach — an edited banner, a reflowed paragraph): content-
    // defined chunks, exact-dup screening, then MinHash+LSH banding
    // over the surviving chunk corpus with candidates verified at
    // Jaccard >= 0.5. One chunk scan; candidates are O(band
    // collisions), never chunk-pairs. See Dedup.cdcChunkNearDupPairs.
    Dedup.cdcChunkNearDupPairs(t.documents, "doc_id", "text", divisor = 16,
        minTokens = 5, k = 3, bands = Bands, rowsPerBand = Rows,
        minJaccard = 0.5)
      .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b")
  }

  val q184 = QueryDef(
    "q184_passage_clean",
    // oracle: the full passage-cleaning pipeline replayed — CDC chunks
    // + keeper (q174), near-dup pairs over survivors (q181), then the
    // REBUILD: keep a chunk iff it is its text's first corpus-wide
    // occurrence AND not the larger side of a near-dup pair; documents
    // reassemble from their kept chunks in order
    Some(s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |cut AS (
            |  SELECT doc_id, ts,
            |    [CAST(0 AS BIGINT)] ||
            |    [CAST(b AS BIGINT) for b in range(1, len(ts))
            |       if CAST('0x' || substr(md5(ts[b] || ' ' || ts[b+1]), 1, 8) AS BIGINT) % 16 = 0] ||
            |    [CAST(len(ts) AS BIGINT)] AS cuts
            |  FROM tok
            |),
            |ch AS (
            |  SELECT doc_id, i.j AS chunk_no,
            |    array_to_string(ts[CAST(cuts[CAST(i.j+1 AS BIGINT)]+1 AS BIGINT):CAST(cuts[CAST(i.j+2 AS BIGINT)] AS BIGINT)], ' ') AS chunk
            |  FROM cut, range(0, 128) i(j)
            |  WHERE i.j < len(cuts) - 1
            |),
            |kp AS (SELECT md5(chunk) AS h, min(doc_id * 128 + chunk_no) AS kk FROM ch GROUP BY 1),
            |chk AS (
            |  SELECT c.doc_id, c.chunk_no, c.chunk, c.doc_id * 128 + c.chunk_no AS cid,
            |    (c.doc_id * 128 + c.chunk_no = k.kk) AS keep
            |  FROM ch c JOIN kp k ON md5(c.chunk) = k.h
            |),
            |surv AS (
            |  SELECT cid, chunk FROM chk
            |  WHERE keep AND len(string_split(chunk, ' ')) >= 5
            |),
            |sh AS (SELECT cid, ${shingles3SqlOf("chunk")} AS shingles FROM surv),
            |sig AS (SELECT cid, shingles,
            |  ${(0 until Bands * Rows).map(i => s"${minhashSql(i)} AS m$i").mkString(", ")}
            |  FROM sh),
            |banded AS (
            |  ${(0 until Bands).map(b =>
                 s"SELECT cid, shingles, $b AS band, ${bandKeySql(b)} AS key FROM sig")
                 .mkString(" UNION ALL ")}
            |),
            |drops AS (
            |  SELECT DISTINCT b.cid
            |  FROM banded a JOIN banded b
            |    ON a.band = b.band AND a.key = b.key AND a.cid < b.cid
            |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            |        / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
            |)
            |SELECT doc_id,
            |  string_agg(chunk, ' ' ORDER BY chunk_no) AS cleaned,
            |  CAST(SUM(len(string_split(chunk, ' '))) AS BIGINT) AS kept_tokens
            |FROM chk
            |WHERE keep AND cid NOT IN (SELECT cid FROM drops)
            |GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // END-TO-END passage cleaning — the C4-style rebuild: exact-dup
    // chunks keep their first corpus-wide occurrence (q174), fuzzy
    // near-dups drop the LATER side of each verified pair (q181), and
    // documents reassemble from the surviving chunks in order. Tiny
    // chunks below the near-dup minTokens remain (they were never
    // candidates). At 100 TB both decision streams are chunk-hash /
    // band-collision shuffles; the rebuild is one groupBy over kept
    // chunks.
    val chunks = Dedup.cdcChunkDedup(t.documents, "doc_id", "text", divisor = 16)
    val drops = Dedup.cdcChunkNearDupPairs(t.documents, "doc_id", "text",
        divisor = 16, minTokens = 5, k = 3, bands = Bands, rowsPerBand = Rows,
        minJaccard = 0.5)
      .select((col("doc_b") * 128 + col("chunk_b")).as("__cid")).distinct()
    chunks.where(col("keep"))
      .withColumn("__cid", col("id") * 128 + col("chunk_no"))
      .join(drops, Seq("__cid"), "left_anti")
      .groupBy(col("id").as("doc_id"))
      .agg(
        concat_ws(" ",
          array_sort(collect_list(struct(col("chunk_no"), col("chunk"))))
            .getField("chunk")).as("cleaned"),
        sum(col("n_tokens").cast("long")).as("kept_tokens"))
      .orderBy("doc_id")
  }

  override def queries: Seq[QueryDef] =
    Seq(q27, q28, q29, q44, q57, q94, q95, q101, q109, q123, q170, q174, q181, q184)
}
