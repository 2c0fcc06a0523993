package graft

import org.apache.spark.sql.functions._

/** ORC round-trip fidelity: schema, values, partition layout, and that
  * the read side keeps its pushdown (the q96 scale story).
  */
class FormatsSpec extends SparkSpec {

  test("orc round-trip preserves schema and values; scan pushes the filter") {
    val t = sf()
    val src = t.lineitem
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString + "/li_orc"
    src.write.mode("overwrite").partitionBy("l_returnflag").orc(dir)
    val back = spark.read.orc(dir)

    // same columns/types (partitionBy moves the partition column last)
    assert(back.schema.fields.map(f => f.name -> f.dataType).toSet ==
      src.schema.fields.map(f => f.name -> f.dataType).toSet)

    // value-identical
    val a = src.orderBy("l_orderkey", "l_returnflag", "l_quantity").collect()
    val b = back.select("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
      .orderBy("l_orderkey", "l_returnflag", "l_quantity").collect()
    assert(a.sameElements(b))

    // partition pruning: only the matching l_returnflag directory is read
    val pruned = back.where(col("l_returnflag") === "R")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("l_returnflag"),
      s"expected partition filter in scan:\n$scan")

    // data-filter pushdown reaches the ORC reader
    val filtered = back.where(col("l_quantity") > 30.0)
    val scan2 = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan2.contains("PushedFilters: [") && scan2.contains("l_quantity"),
      s"expected pushed data filter in scan:\n$scan2")
  }
}
