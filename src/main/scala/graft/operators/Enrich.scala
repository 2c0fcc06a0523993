package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's dictionary-enrichment pattern (SURVEY.md §2.12): an
  * expensive per-value lookup (user-agent parser, GeoIP mmdb — both
  * opaque libraries, consumo_detalle.py:145-254) is run over DISTINCT
  * values only, then broadcast-joined back onto the fact.
  *
  * This is the one optimization Catalyst will not invent on its own: a
  * naive UDF would run the parser once per fact row; this runs it once
  * per distinct key (the reference's `unique()` trick) and keeps the hot
  * path join-only. At 100 TB the distinct() is a shuffle over the key
  * column alone; the enriched dictionary stays dimension-sized.
  */
object Enrich {

  /** Broadcast hint gated on the session threshold vs the plan's
    * statistics: above the threshold (or with broadcast disabled via
    * -1) the hint is dropped and Catalyst/AQE picks the join strategy —
    * the pattern every dictionary-sized-but-unbounded relation in this
    * engine shares (the UA/GeoIP dictionary here, the IVF centroid
    * table, the k-means iteration). Call on a MATERIALIZED relation
    * (persisted+counted, checkpointed, or a real source) so the stats
    * are bytes, not schema-default guesses.
    */
  def sizeGatedBroadcast(df: DataFrame): DataFrame = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold >= 0 && estBytes <= threshold) broadcast(df) else df
  }

  /** Enrich `df` by `keyCol`: `fn` maps each distinct key to derived
    * values matching `outSchema` (a Row of extra columns). `fn` runs
    * distributed via mapPartitions — one call per distinct key, never
    * per fact row. Left join preserves unmatched facts.
    *
    * The broadcast hint is size-gated: UA/IP dictionaries are
    * dimension-sized, but a high-cardinality key column would OOM the
    * driver if hinted unconditionally — above the session's
    * autoBroadcastJoinThreshold the hint is dropped and Catalyst/AQE
    * picks the join strategy. (The count() this needs is not extra work:
    * the persisted dictionary must be materialized for the join anyway.)
    */
  def viaDistinct(df: DataFrame, keyCol: String, outSchema: StructType)
                 (fn: String => Row): DataFrame = {
    val spark = df.sparkSession
    val keyed = StructType(df.schema(keyCol) +: outSchema.fields)
    val dictRdd = df.select(keyCol).distinct().rdd
      .mapPartitions(_.map { r =>
        val k = r.getString(0)
        Row.fromSeq(k +: fn(k).toSeq)
      })
    // persist: the lookup must run once per key total, not once per
    // downstream action — same reason the reference caches its parsed
    // UA/IP dictionaries in driver frames. The cache lives for the
    // session (it IS the parsed dictionary); repeated enrichments with
    // different lookups should share one enriched dict or clear the
    // cache between runs.
    val dict = spark.createDataFrame(dictRdd, keyed).persist()
    dict.count() // materialize so the cached-plan statistics are REAL bytes
    // stats come from the materialized cache, not schema defaultSize
    // (which prices every string at 20 bytes and would wave a multi-GB
    // dictionary of long UA strings through the gate)
    df.join(sizeGatedBroadcast(dict), Seq(keyCol), "left")
  }
}
