package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Incremental IVF maintenance: appending a batch to a frozen-centroid
  * index must search identically to rebuilding the whole index on the
  * same centroids — cell assignment is per-vector, so the only thing a
  * rebuild could change is the centroids, which ivfAppend freezes.
  */
class IvfAppendSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "match_id", "rank", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("append == full rebuild on frozen centroids; centroid cache is shared") {
    val emb = sf().embeddings.select("vec_id", "embedding")
    val base = emb.where(col("vec_id") < 400)
    val batch = emb.where(col("vec_id") >= 400)
    val cents = Similarity.hashSeeds(base, "vec_id", "embedding", 16)

    val idx = Similarity.ivfIndex(base, cents, "vec_id", "embedding", nprobe = 2)
    val appended = Similarity.ivfAppend(idx, batch, "vec_id", "embedding", nprobe = 2)
    val rebuilt = Similarity.ivfIndex(emb, cents, "vec_id", "embedding", nprobe = 2)

    // the appended index shares the frozen centroid cache
    assert(appended.centroids eq idx.centroids)

    val a = rows(Similarity.ivfTopK(appended, k = 5))
    val b = rows(Similarity.ivfTopK(rebuilt, k = 5))
    assert(a == b, s"appended vs rebuilt differ: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
    assert(a.nonEmpty)
    // batch vectors are searchable (appear as queries)
    assert(a.exists(_._1 >= 400L))

    appended.release()
    rebuilt.release()
  }
}
