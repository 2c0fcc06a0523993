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

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects by default; read nanos as long and surface a microsecond
    * TimestampType `ts` (the source values are µs-precision, so exact).
    */
  private def withNanosTs(name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(name)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }

  def lineitem: DataFrame   = apply("lineitem")
  def orders: DataFrame     = apply("orders")
  def customer: DataFrame   = apply("customer")
  def supplier: DataFrame   = apply("supplier")
  def part: DataFrame       = apply("part")
  def nation: DataFrame     = apply("nation")
  def region: DataFrame     = apply("region")
  def events: DataFrame     = withNanosTs("events")
  def documents: DataFrame  = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}
