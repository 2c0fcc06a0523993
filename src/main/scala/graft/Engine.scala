package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog.
  *
  * The reference (alopezgo/ETL-Python-Airflow-Bigquery) resolves logical
  * table names to BigQuery datasets (e.g. consumo_detalle.py:257-310);
  * here a [[Tables]] catalog resolves names to parquet paths under a
  * scale-factor directory. All engine code takes a `Tables` so the same
  * query runs on sf0.001 / sf0.01 / sf0.1 / a production lake unchanged.
  */
object Engine {

  /** Local session tuned for the test harness; on a real cluster the
    * builder config comes from spark-submit instead. Shuffle partitions
    * default to 32 (matches local[32]); AQE handles coalesce/skew at
    * scale (SURVEY.md §4.2).
    */
  def session(appName: String = "graft", master: String = "local[32]"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    spark
  }
}

/** Resolves logical table names to DataFrames over `$dir/<name>.parquet`. */
final case class Tables(spark: SparkSession, dir: String) {
  def apply(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** Read `name` and normalize its event-time column to session-TZ
    * TimestampType whatever the ingest's physical encoding — see
    * [[Tables.normalizeTs]]. `nanosAsLong` is set first so a
    * TIMESTAMP(NANOS) file reads (as long) instead of erroring.
    */
  private def withEventTs(name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(apply(name))
  }

  def lineitem: DataFrame   = apply("lineitem")
  def orders: DataFrame     = apply("orders")
  def customer: DataFrame   = apply("customer")
  def supplier: DataFrame   = apply("supplier")
  def part: DataFrame       = apply("part")
  def nation: DataFrame     = apply("nation")
  def region: DataFrame     = apply("region")
  def events: DataFrame     = withEventTs("events")
  def documents: DataFrame  = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}

object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize an event-time column to TimestampType regardless of how the
    * producer encoded it. The reference never sees this problem — its
    * engine ingests timestamps from CSV/API text and BigQuery TIMESTAMP
    * (UTC instants, consumo_detalle.py:127-143, 272-273) and the warehouse
    * owns the physical encoding; a lake engine instead meets whatever the
    * writer produced, so the seam must absorb all of:
    *
    *  - `LongType` — epoch NANOS read under `nanosAsLong` (the source
    *    values are µs-precision, so `div 1000` is exact);
    *  - `TIMESTAMP_NTZ` — parquet timestamp with isAdjustedToUTC=false;
    *    under the engine's UTC session the cast is value-exact;
    *  - `TimestampType` — already the canonical type, untouched.
    *
    * Every reader of an event-time column (batch [[Tables.events]], every
    * streaming watermark in [[graft.streaming.EventStream]]) goes through
    * here, so a fixture/ingest encoding change can never again break
    * queries downstream of the seam.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    if (!df.columns.contains(colName)) df
    else df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
}
