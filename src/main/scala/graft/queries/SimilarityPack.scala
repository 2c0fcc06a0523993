package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors): brute-force cosine top-k as the correctness
  * baseline, random-hyperplane LSH bucketing as the scale path, and
  * threshold near-dup pairs.
  *
  * Determinism: cosine = fold-left double dot in array-index order on
  * both engines → bitwise-equal doubles; ranks tie-break on match_id.
  */
object SimilarityPack extends QueryPack {

  /** Fold-left double dot product in DuckDB (list_sum evaluates the
    * transformed list in order — verified bitwise vs a Python fold).
    */
  private def dotSql(a: String, b: String) =
    s"""list_sum(list_transform(range(1, len($a) + 1),
       | i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
  private def cosSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  val q30 = QueryDef(
    "q30_topk_bruteforce",
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
            |scored AS (
            |  SELECT query_id, c.vec_id AS match_id, ${cosSql("qv", "c.embedding")} AS cos
            |  FROM q JOIN embeddings c ON c.vec_id != query_id
            |), ranked AS (
            |  SELECT query_id, match_id, cos,
            |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, cos FROM ranked WHERE rank <= 5
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    // Exact cosine top-5: small query set (1/50th of ids) against the
    // full corpus — one scan, ranked per query.
    Similarity.bruteForceTopK(
        t.embeddings.where(col("vec_id") % 50 === 0), t.embeddings,
        "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  /** The correctness gate runs at sf0.01, where embeddings has exactly
    * 500 rows; the oracle constants below are GENERATED from the same
    * planesFor/centroidsFor formulas the Spark side applies to the live
    * corpus count, so a formula change cannot silently desync the two
    * (at any other scale factor the counts differ by design — the
    * Spark side keeps growing: planesFor(2000) = 6 at sf0.1, ~25 at
    * 1e9).
    */
  private val Sf001Corpus = 500L
  private val Planes = Similarity.planesFor(Sf001Corpus)
  private val Centroids = Similarity.centroidsFor(Sf001Corpus)
  /** DuckDB mirror of Similarity.planeWeight/lshBucket. */
  private def planeWeightSql(p: Int, d: String) =
    s"(CAST(CAST('0x' || substr(md5('$p:' || CAST($d AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 - 0.5)"
  private def projSql(p: Int, v: String) =
    s"""list_sum(list_transform(range(1, len($v) + 1),
       | i -> CAST($v[i] AS DOUBLE) * ${planeWeightSql(p, "i - 1")}))""".stripMargin
  private def bucketSql(v: String) =
    (0 until Planes).map(p => s"(CASE WHEN ${projSql(p, v)} > 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
  private val probesSql =
    ("bucket" +: (0 until Planes).map(p => s"xor(bucket, ${1L << p})")).mkString("[", ", ", "]")

  val q31 = QueryDef(
    "q31_topk_lsh",
    Some(s"""WITH b AS (SELECT vec_id AS id, embedding AS v, ${bucketSql("embedding")} AS bucket FROM embeddings),
            |q AS (SELECT id, v, probe FROM b, UNNEST($probesSql) AS t(probe)),
            |scored AS (
            |  SELECT q.id AS query_id, c.id AS match_id, ${cosSql("q.v", "c.v")} AS cos
            |  FROM q JOIN b c ON q.probe = c.bucket AND q.id != c.id
            |), ranked AS (
            |  SELECT query_id, match_id, cos,
            |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, cos FROM ranked WHERE rank <= 3
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    // LSH-bucketed ANN top-3 with hamming-1 multiprobe: candidates come
    // from the query's sign bucket plus its `planes` one-bit-flip
    // neighbors — equi-join instead of cross product, plane count scaled
    // to the corpus, rank via map-side partial top-k aggregate.
    Similarity.lshTopK(t.embeddings, "vec_id", "embedding",
        planes = Similarity.planesFor(t.embeddings.count()), k = 3)
      .orderBy("query_id", "rank")
  }

  val q32 = QueryDef(
    "q32_cosine_neardup",
    Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.embedding", "b.embedding")} AS cos
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.48
            |ORDER BY id_a, id_b""".stripMargin)) { t =>
    // Embedding-cosine near-dup pairs at threshold 0.48 (sits in a gap
    // of the pair distribution). planes=0 keeps it exact — the
    // LSH-bucketed variant is the recall-trading scale path.
    Similarity.cosineNearDupPairs(t.embeddings, "vec_id", "embedding",
        threshold = 0.48, planes = 0)
      .orderBy("id_a", "id_b")
  }

  val q33b = QueryDef(
    "q51_ivf_topk",
    // the oracle's centroid count comes from the same centroidsFor
    // formula at the sf0.01 corpus size; the Spark side scales with the
    // live corpus count
    Some(s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < $Centroids),
            |v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
            |asg AS (
            |  SELECT id, v, centroid_id AS cell,
            |    row_number() OVER (PARTITION BY id
            |      ORDER BY ${cosSql("v", "cv")} DESC, centroid_id) AS rn
            |  FROM v CROSS JOIN c
            |), home AS (SELECT id, v, cell FROM asg WHERE rn = 1),
            |probes AS (SELECT id, v, cell FROM asg WHERE rn <= 2),
            |scored AS (
            |  SELECT q.id AS query_id, m.id AS match_id, ${cosSql("q.v", "m.v")} AS cos
            |  FROM probes q JOIN home m ON q.cell = m.cell AND q.id != m.id
            |), ranked AS (
            |  SELECT query_id, match_id, cos,
            |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, cos FROM ranked WHERE rank <= 3
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    // IVF-style ANN: corpus-scaled centroid count, nprobe=2 nearest
    // cells searched per query, in-cell top-3 via partial aggregate —
    // the inverted-file scale path next to q31's LSH.
    val nc = Similarity.centroidsFor(t.embeddings.count())
    Similarity.ivfTopK(t.embeddings, t.embeddings.where(col("vec_id") < nc),
        "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  val q115 = QueryDef(
    "q115_quantized_ivf",
    // q51's inverted file × q74's int8 quantization: assignment at full
    // precision, in-cell scoring on rescaled integer dot products —
    // candidates stay o(n·nprobe), never the corpus pair set
    Some(s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < $Centroids),
            |v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
            |qz AS (
            |  SELECT id, v,
            |    greatest(list_max(list_transform(v, x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-30) AS scale
            |  FROM v
            |), qc AS (
            |  SELECT id, v, scale,
            |    list_transform(v, x -> floor(CAST(x AS DOUBLE) / scale + 0.5)) AS qv
            |  FROM qz
            |), asg AS (
            |  SELECT qc.id, qc.qv, qc.scale, centroid_id AS cell,
            |    row_number() OVER (PARTITION BY qc.id
            |      ORDER BY ${cosSql("qc.v", "cv")} DESC, centroid_id) AS rn
            |  FROM qc CROSS JOIN c
            |), home AS (SELECT id, qv, scale, cell FROM asg WHERE rn = 1),
            |probes AS (SELECT id, qv, scale, cell FROM asg WHERE rn <= 2),
            |scored AS (
            |  SELECT q.id AS query_id, m.id AS match_id,
            |    list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * m.qv[i]))
            |      * q.scale * m.scale AS score
            |  FROM probes q JOIN home m ON q.cell = m.cell AND q.id != m.id
            |), ranked AS (
            |  SELECT query_id, match_id, score,
            |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, score FROM ranked WHERE rank <= 3
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    val nc = Similarity.centroidsFor(t.embeddings.count())
    val index = Similarity.ivfIndex(t.embeddings, t.embeddings.where(col("vec_id") < nc),
      "vec_id", "embedding", nprobe = 2)
    Similarity.ivfTopKQuantized(index, k = 3)
      .orderBy("query_id", "rank")
  }

  val q69 = QueryDef(
    "q69_ivf_multiassign",
    // q51's plan with the recall levers engaged: every corpus vector is
    // LISTED in its 2 nearest cells (multi-assignment) and each query
    // probes its 3 nearest — a pair can meet in up to 2 cells, so the
    // oracle DISTINCTs the scored pairs exactly as graft_topk_pairs's
    // set semantics collapse duplicate meetings
    Some(s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < $Centroids),
            |v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
            |asg AS (
            |  SELECT id, v, centroid_id AS cell,
            |    row_number() OVER (PARTITION BY id
            |      ORDER BY ${cosSql("v", "cv")} DESC, centroid_id) AS rn
            |  FROM v CROSS JOIN c
            |), home AS (SELECT id, v, cell FROM asg WHERE rn <= 2),
            |probes AS (SELECT id, v, cell FROM asg WHERE rn <= 3),
            |scored AS (
            |  SELECT DISTINCT q.id AS query_id, m.id AS match_id, ${cosSql("q.v", "m.v")} AS cos
            |  FROM probes q JOIN home m ON q.cell = m.cell AND q.id != m.id
            |), ranked AS (
            |  SELECT query_id, match_id, cos,
            |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, cos FROM ranked WHERE rank <= 3
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    val nc = Similarity.centroidsFor(t.embeddings.count())
    Similarity.ivfTopK(t.embeddings, t.embeddings.where(col("vec_id") < nc),
        "vec_id", "embedding", k = 3, nprobe = 3, homeCells = 2)
      .orderBy("query_id", "rank")
  }

  val q79 = QueryDef(
    "q79_semantic_dedup",
    // SemDeDup: IVF home-cell assignment → within-cell pairs above the
    // threshold → connected components (recursive CTE, the q44 oracle
    // pattern) → min-id survivor. Centroid count from the same
    // centroidsFor formula at the pinned sf0.01 corpus size.
    Some(s"""WITH RECURSIVE c AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < $Centroids),
            |v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
            |asg AS (
            |  SELECT id, v, centroid_id AS cell,
            |    row_number() OVER (PARTITION BY id
            |      ORDER BY ${cosSql("v", "cv")} DESC, centroid_id) AS rn
            |  FROM v CROSS JOIN c
            |), home AS (SELECT id, v, cell FROM asg WHERE rn = 1),
            |pairs AS (
            |  SELECT a.id AS id_a, b.id AS id_b
            |  FROM home a JOIN home b ON a.cell = b.cell AND a.id < b.id
            |  WHERE ${cosSql("a.v", "b.v")} >= 0.35
            |),
            |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
            |reach(src, dst) AS (
            |  SELECT src, src FROM edges
            |  UNION
            |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            |),
            |canon AS (SELECT src AS id, min(dst) AS canonical_id FROM reach GROUP BY 1)
            |SELECT e.vec_id AS id, coalesce(c.canonical_id, e.vec_id) AS canonical_id,
            |  coalesce(c.canonical_id, e.vec_id) = e.vec_id AS survivor
            |FROM embeddings e LEFT JOIN canon c ON e.vec_id = c.id
            |ORDER BY id""".stripMargin)) { t =>
    // Semantic dedup over the embedding corpus: cell-bucketed pair
    // enumeration (never O(n²)), components via min-label propagation,
    // min-id survivor per component.
    val nc = Similarity.centroidsFor(t.embeddings.count())
    Similarity.semanticDedup(t.embeddings,
        t.embeddings.where(col("vec_id") < nc), "vec_id", "embedding",
        threshold = 0.35)
      .orderBy("id")
  }

  val q64 = QueryDef(
    "q64_embedding_contamination",
    Some(s"""WITH q AS (
            |  SELECT vec_id AS query_id, embedding AS v, ${bucketSql("embedding")} AS bucket
            |  FROM embeddings WHERE vec_id % 50 = 0),
            |qp AS (SELECT query_id, v, probe FROM q, UNNEST($probesSql) AS t(probe)),
            |c AS (
            |  SELECT vec_id AS match_id, embedding AS v, ${bucketSql("embedding")} AS cb
            |  FROM embeddings WHERE vec_id % 50 != 0)
            |SELECT qp.query_id, c.match_id, ${cosSql("qp.v", "c.v")} AS cos
            |FROM qp JOIN c ON qp.probe = c.cb
            |WHERE ${cosSql("qp.v", "c.v")} >= 0.4
            |ORDER BY query_id, match_id""".stripMargin)) { t =>
    // Train/test contamination in EMBEDDING space (the cosine analog of
    // q57's n-gram scan): the held-out set probes its LSH bucket plus
    // hamming-1 neighbors against the bucketed training corpus — an
    // equi-join, never test × train. Same deterministic split family as
    // q46/q30 (hash-derived, here vec_id % 50).
    val test = t.embeddings.where(col("vec_id") % 50 === 0)
    val train = t.embeddings.where(col("vec_id") % 50 =!= 0)
    graft.operators.Similarity.crossNearDup(test, train, "vec_id", "embedding",
        threshold = 0.4, planes = Similarity.planesFor(t.embeddings.count()))
      .orderBy("query_id", "match_id")
  }

  val q85 = QueryDef(
    "q85_contrastive_negatives",
    Some(s"""WITH n AS (SELECT COUNT(*) AS cnt FROM embeddings),
            |a AS (
            |  SELECT vec_id AS anchor_id, embedding AS av, unnest(range(1, 5)) AS j
            |  FROM embeddings
            |), pick AS (
            |  SELECT anchor_id, av, j,
            |    ${DedupPack.hash32Sql("'neg:' || CAST(anchor_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")} % cnt AS raw,
            |    cnt
            |  FROM a, n
            |), chosen AS (
            |  SELECT anchor_id, av, CAST(j AS BIGINT) AS j,
            |    CASE WHEN raw = anchor_id THEN (raw + 1) % cnt ELSE raw END AS neg_id
            |  FROM pick
            |)
            |SELECT c.anchor_id, c.j, c.neg_id, ${cosSql("c.av", "e.embedding")} AS cos,
            |  ${cosSql("c.av", "e.embedding")} >= 0.3 AS hard
            |FROM chosen c JOIN embeddings e ON e.vec_id = c.neg_id
            |ORDER BY anchor_id, j""".stripMargin)) { t =>
    // Contrastive negative mining: K=4 negatives per anchor chosen by a
    // deterministic hash over (anchor, slot) — never rand(), so the
    // pairing is identical across engines, reruns and partitionings; a
    // self-hit re-rolls to the next id. The pairing is a plain equi-join
    // on the synthesized neg_id (one shuffle, broadcastable corpus-side
    // at dim scale) — NO cross join, which is what makes per-anchor
    // negative sampling viable when the corpus is 10^9 vectors. The
    // `hard` flag (cos >= 0.3) is the usual hard-negative marker for
    // curriculum reweighting.
    graft.expressions.GraftFunctions.register(t.spark)
    val n = t.embeddings.count()
    val anchors = t.embeddings
      .select(col("vec_id").as("anchor_id"), col("embedding").as("av"),
        explode(sequence(lit(1L), lit(4L))).as("j"))
    val raw = graft.functions.TextFns.hash32(
      concat(lit("neg:"), col("anchor_id").cast("string"), lit(":"), col("j").cast("string"))) % n
    val cos = Similarity.dot(col("av"), col("nv")) /
      (sqrt(Similarity.dot(col("av"), col("av"))) * sqrt(Similarity.dot(col("nv"), col("nv"))))
    anchors
      .withColumn("neg_id", when(raw === col("anchor_id"), (raw + 1) % n).otherwise(raw))
      .join(t.embeddings.select(col("vec_id").as("neg_id"), col("embedding").as("nv")), "neg_id")
      .select(col("anchor_id"), col("j"), col("neg_id"),
        cos.as("cos"), (cos >= 0.3).as("hard"))
      .orderBy("anchor_id", "j")
  }

  val q102 = QueryDef(
    "q102_label_centroid_outliers", {
      val S = "1048576.0" // 2^20 fixed-point scale
      Some(s"""WITH q AS (
              |  SELECT vec_id, label, i AS pos,
              |    CAST(floor(CAST(embedding[i] AS DOUBLE) * $S) AS BIGINT) AS qv
              |  FROM (SELECT vec_id, label, embedding, unnest(range(1, len(embedding) + 1)) AS i
              |        FROM embeddings)),
              |cstat AS (
              |  SELECT label, pos,
              |    CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / $S AS c
              |  FROM q GROUP BY 1, 2),
              |cen AS (SELECT label, list(c ORDER BY pos) AS cen FROM cstat GROUP BY 1),
              |xq AS (
              |  SELECT vec_id, label,
              |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $S) AS DOUBLE) / $S) AS v
              |  FROM embeddings),
              |d AS (
              |  SELECT xq.vec_id, xq.label,
              |    list_sum(list_transform(range(1, len(v) + 1),
              |      i -> (v[i] - cen[i]) * (v[i] - cen[i]))) AS dist2
              |  FROM xq JOIN cen ON xq.label = cen.label)
              |SELECT vec_id, label, dist2,
              |  CAST(row_number() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id) AS BIGINT) AS rnk,
              |  (row_number() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id) <= 3) AS is_outlier
              |FROM d ORDER BY vec_id""".stripMargin)
    }) { t =>
    // Embedding hygiene: per-label centroids and distance outliers —
    // the mislabeled-example screen run before contrastive training.
    // Mean-pooling sums doubles across rows, which is order-sensitive,
    // so values are quantized onto a 2^20 fixed-point grid first: the
    // per-(label, dim) sums become exact integers (partial-aggregated,
    // shuffle rows = labels × dims, the posexplode is CPU-narrow), the
    // centroid is two divisions, and each vector's squared distance is
    // the fold-left zip the cosine oracle already proves bitwise. The
    // top-3 rank per label is a window over label partitions (rows per
    // label are bounded); at corpus scale the same rank comes from the
    // graft_topk_pairs aggregate.
    val S = lit(1048576.0)
    val q = t.embeddings.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos0", "x")))
      .select(col("vec_id"), col("label"), (col("pos0") + 1).as("pos"),
        floor(col("x").cast("double") * S).as("qv"))
    val cstat = q.groupBy("label", "pos")
      .agg((sum("qv").cast("double") / count(lit(1)).cast("double") / S).as("c"))
    val cen = cstat.groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cen"))
    val xq = t.embeddings.select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * S).cast("double") / S).as("v"))
    val d = xq.join(broadcast(cen), "label")
      .select(col("vec_id"), col("label"),
        aggregate(zip_with(col("v"), col("cen"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, e) => acc + e).as("dist2"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("label").orderBy(col("dist2").desc, col("vec_id"))
    d.select(col("vec_id"), col("label"), col("dist2"),
        row_number().over(w).cast("long").as("rnk"),
        (row_number().over(w) <= 3).as("is_outlier"))
      .orderBy("vec_id")
  }

  val q107 = QueryDef(
    "q107_ivf_append_search",
    // same oracle text as q51: an appended index must be
    // indistinguishable from a full rebuild on the frozen centroids
    Some(s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < $Centroids),
            |v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
            |asg AS (
            |  SELECT id, v, centroid_id AS cell,
            |    row_number() OVER (PARTITION BY id
            |      ORDER BY ${cosSql("v", "cv")} DESC, centroid_id) AS rn
            |  FROM v CROSS JOIN c
            |), home AS (SELECT id, v, cell FROM asg WHERE rn = 1),
            |probes AS (SELECT id, v, cell FROM asg WHERE rn <= 2),
            |scored AS (
            |  SELECT q.id AS query_id, m.id AS match_id, ${cosSql("q.v", "m.v")} AS cos
            |  FROM probes q JOIN home m ON q.cell = m.cell AND q.id != m.id
            |), ranked AS (
            |  SELECT query_id, match_id, cos,
            |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, cos FROM ranked WHERE rank <= 3
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    // The INCREMENTAL index path under the oracle gate: build the IVF
    // index on the first 80% of the corpus, ivfAppend the remaining
    // batch onto the frozen centroids (o(batch · nlist) new work — the
    // standing assignment is reused from cache), and search. The oracle
    // is q51's full-corpus SQL verbatim: an appended index must be
    // bitwise indistinguishable from a full rebuild, because cell
    // assignment is per-vector (IvfAppendSpec pins the same equality
    // engine-side).
    val n = t.embeddings.count()
    val nc = Similarity.centroidsFor(n)
    val cents = t.embeddings.where(col("vec_id") < nc)
    val cut = (n * 4) / 5
    val base = t.embeddings.where(col("vec_id") < cut)
    val batch = t.embeddings.where(col("vec_id") >= cut)
    val idx = Similarity.ivfIndex(base, cents, "vec_id", "embedding", nprobe = 2)
    val appended = Similarity.ivfAppend(idx, batch, "vec_id", "embedding", nprobe = 2)
    Similarity.ivfTopK(appended, k = 3)
      .orderBy("query_id", "rank")
  }

  override def queries: Seq[QueryDef] = Seq(q30, q31, q32, q33b, q64, q69, q79, q85, q102, q107, q115)
}
