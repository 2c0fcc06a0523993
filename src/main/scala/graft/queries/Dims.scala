package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Tiny inline dimensions mirroring the reference's dictionary tables
  * (SURVEY.md §1.4). These are config-as-data (like the reference's
  * dicc_vips / dicc_programas JSON, programas_live.py:26), not testdata —
  * each oracle SQL carries the same rows as an inline VALUES CTE.
  */
object Dims {

  /** dicc_vips thresholds {0,1,5,20,40} (reference audio_digital.py:395,
    * README.md:10).
    */
  def vips(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(Seq(0L, 1L, 5L, 20L, 40L).map(Row(_)): _*),
      StructType(Seq(StructField("vip", LongType, nullable = false))))

  /** dicc_programas-style schedule: program + weekday array (1=Sunday..7,
    * Spark dayofweek numbering; reference dias ARRAY,
    * Complex_user_superposition_by_program_etl.ipynb:48-52).
    */
  def programas(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row("matinal", Seq(2L, 3L, 4L, 5L, 6L)),   // weekdays
      Row("finde", Seq(1L, 7L)),                 // weekend
      Row("diario", Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("programa", StringType, nullable = false),
        StructField("dias", ArrayType(LongType, containsNull = false), nullable = false))))
  }

  /** Same rows as an inline DuckDB CTE body. */
  val vipsSql = "(VALUES (0),(1),(5),(20),(40)) AS vips(vip)"
  val programasSql =
    """(VALUES ('matinal', [2,3,4,5,6]), ('finde', [1,7]),
      |        ('diario', [1,2,3,4,5,6,7])) AS programas(programa, dias)""".stripMargin
}
