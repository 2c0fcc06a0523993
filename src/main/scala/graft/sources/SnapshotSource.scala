package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions.col

import graft.operators.{Snapshot, SnapshotStats}

/** Data-source registration for snapshot tables, so the commit-log layer
  * is reachable from the STANDARD read path — including pure SQL:
  *
  * {{{
  *   spark.read.format("graft.sources.SnapshotSource").load(path)
  *   // or, after createOrReplaceTempView:
  *   spark.sql("SELECT ... FROM t WHERE d BETWEEN ... ")   // skips files
  * }}}
  *
  * Implemented against the stable DSv1 `PrunedFilteredScan` contract:
  * Catalyst pushes the query's column list and conjunctive filters into
  * `buildScan`, which uses them for MANIFEST file skipping
  * ([[SnapshotStats]]) and column pruning. Every filter is declared
  * unhandled, so Spark re-applies the full predicate above the scan —
  * the same pruning-is-only-an-optimization contract as
  * `Snapshot.readWhere`, enforced by the engine rather than promised by
  * this source. The `sources.Filter` ADT is already attribute/value
  * normalized, so translation to the pruner's mini-AST is direct.
  */
class SnapshotSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot needs a path"))
    val version = parameters.get("versionAsOf").map(_.toLong)
    SnapshotRelation(sqlContext.sparkSession, path, version)
  }
}

final case class SnapshotRelation(spark: SparkSession, path: String,
                                  version: Option[Long]) extends BaseRelation
    with PrunedFilteredScan {

  // pin the manifest at relation creation — the DSv1 form of reader
  // isolation: one relation, one version, repeatable scans
  private val m: Snapshot.Manifest =
    version.map(Snapshot.manifest(spark, path, _))
      .orElse(Snapshot.latestManifest(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"not a snapshot table: $path"))

  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = StructType.fromDDL(m.schemaDdl)

  // declare everything unhandled: Spark evaluates the full predicate
  // above this scan, so skipping below can never change results
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val pruned = SnapshotStats.pruneByFilters(spark, m, filters)
    val df = Snapshot.readManifestFiles(spark, path, m, pruned)
    val projected: DataFrame =
      if (requiredColumns.isEmpty) df else df.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }
}
