package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** Dynamic partition pruning through the NATIVE snapshot read path.
  *
  * The 100 TB star-join shape: a fact snapshot table partitioned on the
  * join key, joined to a small filtered dimension. The dim-side filter
  * values are only known at RUNTIME (after the broadcast), so static
  * partition pruning cannot help — Spark's DPP inserts a runtime
  * partition filter on the fact scan, and [[graft.sources.SnapshotFileIndex]]
  * serves it like any other partition predicate (listFiles is called
  * again with the dynamic filter; the manifest prunes exactly). This
  * spec pins that the stock optimizer actually WIRES the runtime filter
  * through our FileIndex — the difference between scanning one
  * partition and all of them on every star join.
  */
class DppSpec extends SparkSpec {

  /** AQE wraps materialized stages in leaf QueryStageExec nodes, so a
    * plain collect never sees inside — recurse through stages and
    * subqueries explicitly.
    */
  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("a filtered-dim star join dynamically prunes fact partitions in the manifest index") {
    val t = sf()
    val dir = Files.createTempDirectory("graft-dpp").toString + "/fact"
    // fact: orders partitioned by priority (5 partitions, several files each)
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .repartition(4),
      partitionCols = Seq("o_orderpriority"))
    val fact = spark.read.format("graft.sources.SnapshotSource").load(dir)
    val totalFiles = Snapshot.latestManifest(spark, dir).get.files.size
    val totalParts = Snapshot.latestManifest(spark, dir).get.files
      .map(f => Snapshot.partitionValues(Seq("o_orderpriority"), f)).distinct.size
    assert(totalParts >= 3, s"fixture needs several partitions, got $totalParts")

    // dim: priority -> tag, filtered to ONE priority by an attribute the
    // fact table does not know statically. The dim must be a FILE-backed
    // table: a literal Seq constant-folds its filter into the local
    // relation and DPP never sees a selective predicate to derive from.
    import spark.implicits._
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"),
      ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop"))
      .toDF("prio", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val joined = fact.join(dim.where(col("tag") === "keep"),
        fact("o_orderpriority") === dim("prio"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))

    val expected = Snapshot.read(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)),
        sum(col("o_totalprice").cast("decimal(18,2)"))).collect()(0)
    assert(joined.collect()(0) == expected)

    // the fact scan must carry a runtime (dynamicpruning) partition filter
    val factScans = scans(joined).filter(_.relation.location.isInstanceOf[graft.sources.SnapshotFileIndex])
    assert(factScans.nonEmpty, "expected the native snapshot scan in the physical plan")
    val scan = factScans.head
    assert(scan.partitionFilters.exists(_.find(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]).isDefined),
      s"no dynamic pruning filter on the fact scan:\n$scan")
    // and after execution the scan must have opened ONLY the surviving
    // partition's files (metrics are post-pruning)
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles > 0 && numFiles < totalFiles,
      s"dynamic pruning did not reduce the file set: $numFiles of $totalFiles")
  }

  test("static partition pruning still serves equality predicates exactly") {
    val t = sf()
    val dir = Files.createTempDirectory("graft-dpp-static").toString + "/fact"
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_orderpriority")).repartition(2),
      partitionCols = Seq("o_orderpriority"))
    val fact = spark.read.format("graft.sources.SnapshotSource").load(dir)
    val q = fact.where(col("o_orderpriority") === "5-LOW").agg(count(lit(1)).as("n"))
    assert(q.collect()(0).getLong(0) ==
      Snapshot.read(spark, dir).where(col("o_orderpriority") === "5-LOW").count())
    val scan = scans(q).head
    val m = Snapshot.latestManifest(spark, dir).get
    val lowFiles = m.files.count(f =>
      Snapshot.partitionValues(Seq("o_orderpriority"), f).get("o_orderpriority").contains("5-LOW"))
    assert(scan.metrics("numFiles").value == lowFiles,
      s"static prune expected $lowFiles files, scanned ${scan.metrics("numFiles").value}")
  }
}
