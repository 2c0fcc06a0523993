package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftbridge.ScanBridge
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * The relation is a plain [[HadoopFsRelation]] over a MANIFEST-backed
  * [[FileIndex]] — the architecture every serious lakehouse reader uses,
  * because it inherits Spark's whole native parquet scan: filter
  * pushdown into the file scan (`PushedFilters`, row-group pruning),
  * column pruning at the reader, vectorized columnar batches and
  * whole-stage codegen. This source only decides WHICH files exist
  * ([[SnapshotFileIndex.listFiles]]): manifest-stats skipping for data
  * filters (conservative, pruning-is-only-an-optimization — Spark
  * re-applies data filters above the scan) and exact partition pruning
  * (required: Spark does NOT re-apply partition filters). Everything
  * after file selection is stock Spark, so a 100 TB scan through SQL
  * pays exactly what `spark.read.parquet` would — minus the files the
  * manifest proves irrelevant.
  */
class SnapshotSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot needs a path"))
    // pin the manifest at relation creation — reader isolation: one
    // relation, one version, repeatable scans
    val m = parameters.get("versionAsOf").map(_.toLong)
      .map(Snapshot.manifest(spark, path, _))
      .orElse(Snapshot.latestManifest(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"not a snapshot table: $path"))
    val tableSchema = StructType.fromDDL(m.schemaDdl)
    val index = new SnapshotFileIndex(spark, path, m, tableSchema)
    // dataSchema = the FULL table schema: partition columns keep their
    // declared position (HadoopFsRelation dedups the overlap), and the
    // file-source strategy reads them from partition values, never from
    // the data files
    HadoopFsRelation(index, index.partitionSchema, tableSchema, None,
      new ParquetFileFormat, Map.empty)(spark)
  }
}

/** [[FileIndex]] over one pinned snapshot manifest. File "listing" is a
  * pure metadata operation — the manifest already knows the live files,
  * their partition values, byte sizes and per-column stats — so
  * planning a scan costs zero filesystem listings.
  */
final class SnapshotFileIndex(spark: SparkSession, tablePath: String,
                              m: Snapshot.Manifest, tableSchema: StructType)
    extends FileIndex {

  override val partitionSchema: StructType =
    StructType(m.partitionCols.map(c => tableSchema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"partition column $c not in table schema"))))

  partitionSchema.fields.foreach { f =>
    require(canRepresent(f.dataType),
      s"unsupported partition column type for the SQL source: ${f.dataType}")
  }

  private def canRepresent(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         DateType | BooleanType | DoubleType | FloatType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  private val fs = new HPath(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val qualifiedRoot = fs.makeQualified(new HPath(tablePath))

  /** Hive partition-dir string → catalyst partition value. */
  private def partitionValue(dt: DataType, raw: String): Any =
    if (raw == null || raw == Snapshot.NullPartition) null
    else dt match {
      case StringType  => UTF8String.fromString(raw)
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case ShortType   => raw.toShort
      case ByteType    => raw.toByte
      case DateType    => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case BooleanType => raw.toBoolean
      case DoubleType  => raw.toDouble
      case FloatType   => raw.toFloat
      case TimestampType => ScanBridge.timestampValue(raw, spark).getOrElse(
        throw new IllegalArgumentException(s"unparseable timestamp partition value: $raw"))
      case TimestampNTZType => ScanBridge.timestampNtzValue(raw).getOrElse(
        throw new IllegalArgumentException(s"unparseable ntz partition value: $raw"))
      case other       => throw new IllegalArgumentException(s"unsupported partition type $other")
    }

  private def status(rel: String): FileStatus = {
    val p = new HPath(qualifiedRoot, rel)
    val len = m.stats.get(rel).map(_.bytes).filter(_ > 0L)
      .getOrElse(fs.getFileStatus(p).getLen)
    new FileStatus(len, false, 1, fs.getDefaultBlockSize(p), 0L, p)
  }

  override def rootPaths: Seq[HPath] = Seq(qualifiedRoot)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // manifest-stats skipping: every translatable conjunct votes; an
    // untranslatable one just doesn't prune (Spark re-applies data
    // filters above the scan, so this can only be an optimization)
    val pushed = (partitionFilters ++ dataFilters).flatMap(ScanBridge.translate).toArray
    val kept = SnapshotStats.pruneByFilters(spark, m, pushed)
    val byPart = kept.groupBy(f => Snapshot.partitionValues(m.partitionCols, f))
    // exact partition pruning — required, not an optimization: Spark
    // trusts the index and never re-evaluates partition filters
    val keepPart = ScanBridge.partitionPredicate(partitionFilters, partitionSchema)
    byPart.toSeq
      .map { case (pv, files) =>
        val row = InternalRow.fromSeq(partitionSchema.fields.toSeq.map(f =>
          partitionValue(f.dataType, pv.getOrElse(f.name, null))))
        (row, files)
      }
      .filter { case (row, _) => keepPart(row) }
      .map { case (row, files) => PartitionDirectory(row, files.sorted.map(status).toArray) }
  }

  override def inputFiles: Array[String] =
    m.files.map(f => new HPath(qualifiedRoot, f).toString).toArray

  override def refresh(): Unit = () // pinned manifest: nothing to refresh

  override lazy val sizeInBytes: Long =
    m.files.map(f => m.stats.get(f).map(_.bytes).filter(_ > 0L)
      .getOrElse(fs.getFileStatus(new HPath(qualifiedRoot, f)).getLen)).sum
}
