package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.Offset
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.BaseRelation

/** Bridge for [[graft.sources.SnapshotStreamSource]]: a DSv1 streaming
  * `Source.getBatch` must return a DataFrame whose logical plan is
  * MARKED streaming (`LogicalRelation(isStreaming = true)`) — the same
  * construction Spark's own FileStreamSource uses — and offsets arrive
  * re-serialized after a restart. Both seams are `private[sql]`, so
  * they live here, in the established extension package pattern.
  */
object StreamBridge {

  /** `relation` planned as a STREAMING scan: the micro-batch keeps the
    * native file-scan path (pushdown, columnar) instead of an RDD
    * round-trip.
    */
  def streamingScan(spark: SparkSession, relation: BaseRelation): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(cs,
      LogicalRelation(relation, isStreaming = true))
  }

  def longOffset(v: Long): Offset = LongOffset(v)

  /** Re-root a SINK's micro-batch onto a plain (non-streaming) plan:
    * the Dataset handed to `Sink.addBatch` wraps the incremental
    * execution — re-planning it (`.rdd`, a write) trips the
    * streaming-source guard. `toRdd` reuses the ALREADY-PLANNED
    * physical execution, so the batch computes once and writes like
    * any batch frame (the same construction Delta's v1 sink uses).
    */
  def rebatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Offset → version, tolerant of the engine handing back a
    * [[SerializedOffset]] on restart.
    */
  def offsetVersion(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other               => other.json().trim.toLong
  }
}
