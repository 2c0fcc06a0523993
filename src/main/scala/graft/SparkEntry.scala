package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All verified query packs; each QueryDef carries its Spark build and
    * (when SQL-expressible) a DuckDB oracle.
    */
  def packs: Seq[QueryPack] =
    Seq(Relational, Relational2, TextPack, DedupPack, SimilarityPack, EnrichPack, SqlPack, TrainPack, PipelinePack, ConsumoBloquesPack, IndicadoresPack, TraficoPack, CorpusPack, StatsPack, LayoutPack)

  private lazy val all: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05.build(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> ((s: SparkSession, dir: String) => q.build(Tables(s, dir)))).toMap

  /** The defs themselves — Bench stages `setup` outside its timed
    * window; `queries` (the driver's correctness surface) runs
    * setup + build as one call.
    */
  def queryDefs: Map[String, QueryDef] = all.map(q => q.name -> q).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
