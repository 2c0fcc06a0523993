package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY.md §2.1).
  *
  * The reference ingests from: the Mediastream metrics API (S1 JSON
  * rows / S2 CSV-export URLs, consumo_detalle.py:108-143), BigQuery SQL
  * (S3), Google Analytics (S4/S5), a holidays REST API (S6), local CSVs
  * (S7), Postgres (S8) and JSON config files (S9). In this engine every
  * external fetch lands as either a file the schema'd readers below
  * consume, or as already-fetched rows (`fromRows`) — the query payload
  * the reference ships to the API is a real DataFrame query here.
  */
object Readers {

  /** S2/S7: schema'd CSV with header, timestamps parsed on read — the
    * shape of the reference's `pd.read_csv(url)` + `to_datetime` casts.
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .schema(schema)
      .csv(path)

  /** S9: JSON config-as-table (`dicc_programas.json`,
    * programas_live.py:26). multiLine handles pretty-printed configs.
    */
  def json(spark: SparkSession, path: String, schema: StructType,
           multiLine: Boolean = true): DataFrame =
    spark.read.option("multiLine", multiLine.toString).schema(schema).json(path)

  /** Malformed-row quarantine for JSON-lines feeds: PERMISSIVE parse
    * with a corrupt-record capture column, split into (good rows,
    * quarantined raw lines). An upstream producer shipping one broken
    * line then costs a triage row, not the whole load (the reference's
    * fetch would crash its DAG tick). The parsed frame is cached before
    * the split — Spark refuses to filter on only the internal corrupt
    * column of an uncached scan, and the cache also keeps the two
    * branches to one parse. Sized for landing batches (one tick's
    * fetch), not for re-reading a 100 TB lake: quarantine belongs at
    * the ingest edge, where batches are bounded.
    */
  def jsonWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.StringType
    require(!schema.fieldNames.contains("_corrupt_record"), "reserved column name")
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record", StringType, nullable = true))
    val df = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val good = df.where(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = df.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (good, bad)
  }

  /** S8: JDBC source (Cloud SQL Postgres in the reference). Partitioned
    * read when bounds are given — a single-connection scan does not
    * survive 100 TB-era table sizes.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties(),
           partitionColumn: Option[String] = None,
           lowerBound: Long = 0, upperBound: Long = 0, numPartitions: Int = 8): DataFrame = {
    val base = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    val withProps = props.stringPropertyNames().toArray(Array.empty[String])
      .foldLeft(base)((b, k) => b.option(k, props.getProperty(k)))
    partitionColumn match {
      case Some(c) => withProps
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions).load()
      case None => withProps.load()
    }
  }

  /** S1/S4-S6: already-fetched API rows → DataFrame (the ingestion-side
    * boundary; fetching itself is a job-runner concern, not an engine
    * operator).
    */
  def fromRows(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  /** K5: truncate+append to a JDBC table (reference
    * Encuestas_etl_Bigquery_SQL.ipynb:268-276 — `TRUNCATE TABLE` then
    * chunked `to_sql`). `truncate=true` keeps the table's DDL (indexes,
    * grants) instead of drop/recreate, exactly the reference's contract;
    * `batchsize` mirrors its chunking, `numPartitions` caps concurrent
    * connections.
    */
  def jdbcTruncateAppend(df: DataFrame, url: String, table: String,
                         props: java.util.Properties = new java.util.Properties(),
                         batchSize: Int = 10000, numPartitions: Int = 8): Unit = {
    // repartition, NOT coalesce: coalesce propagates upstream and would
    // throttle the whole producing job to numPartitions tasks; one extra
    // shuffle of the (dimension-sized) output only caps connections
    val base = df.repartition(numPartitions).write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("truncate", "true")
      .option("batchsize", batchSize.toString)
      .mode("overwrite")
    props.stringPropertyNames().toArray(Array.empty[String])
      .foldLeft(base)((b, k) => b.option(k, props.getProperty(k)))
      .save()
  }
}
