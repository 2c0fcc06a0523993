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

  private val Planes = 4
  /** DuckDB mirror of Similarity.planeWeight/lshBucket. */
  private def planeWeightSql(p: Int, d: String) =
    s"(CAST(CAST('0x' || substr(md5('$p:' || CAST($d AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 - 0.5)"
  private def projSql(p: Int, v: String) =
    s"""list_sum(list_transform(range(1, len($v) + 1),
       | i -> CAST($v[i] AS DOUBLE) * ${planeWeightSql(p, "i - 1")}))""".stripMargin
  private def bucketSql(v: String) =
    (0 until Planes).map(p => s"(CASE WHEN ${projSql(p, v)} > 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")

  val q31 = QueryDef(
    "q31_topk_lsh",
    Some(s"""WITH b AS (SELECT vec_id AS id, embedding AS v, ${bucketSql("embedding")} AS bucket FROM embeddings),
            |scored AS (
            |  SELECT q.id AS query_id, c.id AS match_id, ${cosSql("q.v", "c.v")} AS cos
            |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.id != c.id
            |), ranked AS (
            |  SELECT query_id, match_id, cos,
            |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, cos FROM ranked WHERE rank <= 3
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    // LSH-bucketed ANN top-3: candidates restricted to the query's
    // 4-hyperplane sign bucket — equi-join instead of cross product.
    Similarity.lshTopK(t.embeddings, "vec_id", "embedding", planes = Planes, k = 3)
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
    Some(s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16),
            |v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
            |asg AS (
            |  SELECT id, v, centroid_id AS cell,
            |    row_number() OVER (PARTITION BY id
            |      ORDER BY ${cosSql("v", "cv")} DESC, centroid_id) AS rn
            |  FROM v CROSS JOIN c
            |), cells AS (SELECT id, v, cell FROM asg WHERE rn = 1),
            |scored AS (
            |  SELECT q.id AS query_id, m.id AS match_id, ${cosSql("q.v", "m.v")} AS cos
            |  FROM cells q JOIN cells m ON q.cell = m.cell AND q.id != m.id
            |), ranked AS (
            |  SELECT query_id, match_id, cos,
            |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, match_id) AS rank
            |  FROM scored
            |)
            |SELECT query_id, match_id, rank, cos FROM ranked WHERE rank <= 3
            |ORDER BY query_id, rank""".stripMargin)) { t =>
    // IVF-style ANN: nearest-centroid cells (16 fixed centroids) then
    // in-cell top-3 — the inverted-file scale path next to q31's LSH.
    Similarity.ivfTopK(t.embeddings, t.embeddings.where(col("vec_id") < 16),
        "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank")
  }

  override def queries: Seq[QueryDef] = Seq(q30, q31, q32, q33b)
}
