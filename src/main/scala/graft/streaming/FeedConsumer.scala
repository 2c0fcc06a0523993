package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Incremental consumer of a snapshot table's change feed: the running
  * form of the q119 story, closing the loop with the reference's hourly
  * DAG cadence (descarga_hora.py:17-60 re-extracts a window every hour;
  * here the downstream rollup CATCHES UP from the commit log instead of
  * recomputing).
  *
  * One [[drain]] call advances the consumer from its last consumed
  * source version to the source's current version: it reads the NET
  * change feed for that window ([[Snapshot.readChanges]] — O(changed
  * files), the unchanged 100 TB is never touched), folds it into the
  * current rollup with the caller's `apply`, and publishes rollup +
  * watermark in ONE atomic commit ([[Snapshot.overwriteBatch]] keyed by
  * the source version). Exactly-once end to end:
  *
  *  - crash BEFORE the publish commit (during feed read, apply, or the
  *    rewrite's file writes): nothing committed, the watermark still
  *    names the old version — the rerun re-drains the same window;
  *  - crash AFTER the commit: watermark = new version in the same
  *    manifest — the rerun sees an empty window and no-ops;
  *  - a Structured Streaming redelivery of the same tick hits the
  *    version-keyed watermark and is skipped.
  *
  * The watermark lives in the DOWNSTREAM table's own manifest, not in a
  * streaming checkpoint — wipe the checkpoint, redeploy the job, run it
  * from a plain scheduler: the consumer still knows exactly where it
  * stopped. A first drain with no watermark bootstraps from a full read
  * of the source (all rows as inserts over the empty rollup).
  */
object FeedConsumer {

  /** Advance `consumerId`'s rollup at `dstPath` to `srcPath`'s latest
    * version. `apply(netFeed, currentRollup)` returns the new rollup;
    * `netFeed` carries the source schema plus `_change_type`
    * (insert/delete). Returns Some(fromVersion -> toVersion) when the
    * consumer advanced, None when already up to date.
    */
  def drain(spark: SparkSession, srcPath: String, dstPath: String, consumerId: String)
           (apply: (DataFrame, DataFrame) => DataFrame): Option[(Long, Long)] = {
    val vNow = Snapshot.latestVersion(spark, srcPath).getOrElse(
      throw new IllegalArgumentException(s"not a snapshot table: $srcPath"))
    val dstM = Snapshot.latestManifest(spark, dstPath).getOrElse(
      throw new IllegalArgumentException(
        s"downstream rollup must be a snapshot table (create it first): $dstPath"))
    val vFrom = dstM.streamBatch.get(consumerId)
    if (vFrom.exists(_ >= vNow)) return None
    val feed = vFrom match {
      case Some(v) => Snapshot.readChanges(spark, srcPath, v, vNow, net = true)
      case None    => Snapshot.readVersion(spark, srcPath, vNow)
        .withColumn("_change_type", lit("insert"))
    }
    val next = apply(feed, Snapshot.read(spark, dstPath))
    // reads above are pinned to immutable files; the publish writes a
    // fresh txn and commits rollup + watermark in one manifest
    Snapshot.overwriteBatch(spark, dstPath, next, consumerId, vNow)
    Some(vFrom.getOrElse(0L) -> vNow)
  }

  /** Standard delta-fold for additive rollups `GROUP BY keys: COUNT(*),
    * SUM(valueCol as decimal)` — the common case, so callers don't each
    * re-derive the sign algebra. Inserts add, deletes subtract; groups
    * whose count reaches zero drop out. Decimal state keeps the fold
    * exact and order-independent. Output: keys, `n`, `total`.
    */
  def additiveRollup(keys: Seq[String], valueCol: String)
                    (feed: DataFrame, current: DataFrame): DataFrame = {
    val sgn = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = feed.groupBy(keys.map(col): _*)
      .agg(sum(sgn).as("__dn"),
        sum((col(valueCol).cast("decimal(18,2)") * sgn).cast("decimal(28,2)")).as("__dt"))
    current.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("__dt"), lit(0).cast("decimal(28,2)")))
          .cast("decimal(28,2)").as("total")): _*)
      .where(col("n") > 0)
  }

  /** The empty state [[additiveRollup]] folds into — create the
    * downstream table from this before the first drain.
    */
  def emptyRollup(spark: SparkSession, src: DataFrame, keys: Seq[String]): DataFrame =
    src.select(keys.map(col): _*).limit(0)
      .withColumn("n", lit(0L))
      .withColumn("total", lit(0).cast("decimal(28,2)"))
}
