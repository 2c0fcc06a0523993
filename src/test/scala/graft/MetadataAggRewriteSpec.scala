package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** [[graft.plans.MetadataAggRewrite]]: whole-table count/min/max/count(col)
  * over a snapshot relation folds to a one-row LocalRelation from manifest
  * stats — zero files scanned — and NEVER fires when the fold could
  * disagree with a real scan (filters, grouping, DISTINCT, truncated
  * string stats, deletion vectors under per-column aggregates).
  */
class MetadataAggRewriteSpec extends SparkSpec {

  private def nativeDf(dir: String): DataFrame =
    spark.read.format("graft.sources.SnapshotSource").load(dir)

  /** Rewrite fired: the whole plan is the one-row local relation, no
    * scan node of any kind left.
    */
  private def metadataOnly(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collectFirst { case l: LocalRelation => l }.isDefined &&
      p.collectFirst { case r: LogicalRelation => r }.isEmpty
  }

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-metaagg-$tag").toString + "/t"

  test("count/min/max/count(col) fold from the manifest, values scan-exact") {
    val t = sf()
    val dir = freshDir("basic")
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate")).repartition(3))

    val agg = nativeDf(dir).agg(
      count(lit(1)).as("n"),
      min(col("o_totalprice")).as("mn_price"),
      max(col("o_totalprice")).as("mx_price"),
      min(col("o_orderdate")).as("mn_date"),
      max(col("o_orderdate")).as("mx_date"),
      count(col("o_orderstatus")).as("cnt_status"))
    assert(metadataOnly(agg), s"expected metadata-only plan:\n${agg.queryExecution.optimizedPlan}")

    val got = agg.collect()(0)
    val want = Snapshot.read(spark, dir).agg(
      count(lit(1)), min(col("o_totalprice")), max(col("o_totalprice")),
      min(col("o_orderdate")), max(col("o_orderdate")),
      count(col("o_orderstatus"))).collect()(0)
    assert(got == want, s"metadata fold $got != scan $want")
  }

  test("SQL route: count(*) through the registry resolver is metadata-only") {
    val t = sf()
    val dir = freshDir("sql")
    Snapshot.create(spark, dir, t.orders.select(col("o_orderkey"), col("o_totalprice")))
    val df = Snapshot.sqlQuery(spark,
      "SELECT COUNT(*) AS n, MIN(o_totalprice) AS mn, 7 AS tag FROM t", Map("t" -> dir))
    assert(metadataOnly(df))
    val r = df.collect()(0)
    assert(r.getLong(0) == Snapshot.read(spark, dir).count())
    assert(r.getInt(2) == 7)
  }

  test("count(col) counts non-nulls exactly under appended null rows") {
    val t = sf()
    val dir = freshDir("nulls")
    val base = t.orders.select(col("o_orderkey"), col("o_orderstatus"))
    Snapshot.create(spark, dir, base.limit(50))
    Snapshot.append(spark, dir,
      base.limit(20).withColumn("o_orderstatus", lit(null).cast("string")))
    val agg = nativeDf(dir).agg(count(col("o_orderstatus")).as("c"), count(lit(1)).as("n"))
    assert(metadataOnly(agg))
    val r = agg.collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 70L, s"got $r")
  }

  test("no rewrite under a filter, non-partition grouping, or DISTINCT — and answers still correct") {
    val t = sf()
    val dir = freshDir("guards")
    Snapshot.create(spark, dir, t.orders.select(col("o_orderkey"), col("o_orderstatus")))
    val filtered = nativeDf(dir).where(col("o_orderkey") > 100).agg(count(lit(1)).as("n"))
    assert(!metadataOnly(filtered), "a filtered count must scan")
    val grouped = nativeDf(dir).groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(!metadataOnly(grouped), "a grouped count must scan")
    val distinct = nativeDf(dir).agg(countDistinct(col("o_orderstatus")).as("n"))
    assert(!metadataOnly(distinct), "count(DISTINCT) must scan")
    assert(filtered.collect()(0).getLong(0) ==
      Snapshot.read(spark, dir).where(col("o_orderkey") > 100).count())
  }

  test("truncated string stats refuse min/max (fallback scan, still exact)") {
    val t = sf()
    val dir = freshDir("trunc")
    // 100-char strings exceed the 64-byte manifest stat cap -> trunc-marked
    Snapshot.create(spark, dir, t.orders.select(col("o_orderkey"))
      .withColumn("blob", concat(lit("x" * 90), col("o_orderkey").cast("string"))))
    val mm = nativeDf(dir).agg(min(col("blob")).as("mn"), max(col("blob")).as("mx"))
    assert(!metadataOnly(mm), "truncated bounds must not answer min/max")
    // count(*) needs no column stats: still metadata-only on the same table
    val cnt = nativeDf(dir).agg(count(lit(1)).as("n"))
    assert(metadataOnly(cnt))
    assert(mm.collect()(0) ==
      Snapshot.read(spark, dir).agg(min(col("blob")), max(col("blob"))).collect()(0))
  }

  test("deletion vectors: count(*) stays metadata-exact, min/max falls back") {
    val t = sf()
    val dir = freshDir("dv")
    Snapshot.create(spark, dir, t.orders.select(col("o_orderkey"), col("o_totalprice")))
    val total = Snapshot.read(spark, dir).count()
    // a sub-1% point delete takes the DV tier (no file rewrite)
    Snapshot.delete(spark, dir, col("o_orderkey") === 1L, dvMaxFraction = 0.5)
    val m = Snapshot.latestManifest(spark, dir).get
    assume(m.dvs.nonEmpty, "fixture must land in the DV tier")

    val cnt = nativeDf(dir).agg(count(lit(1)).as("n"))
    assert(metadataOnly(cnt), "count(*) is exact under vectors: rows - dv.rows")
    assert(cnt.collect()(0).getLong(0) == total - 1)

    val mm = nativeDf(dir).agg(min(col("o_orderkey")).as("mn"))
    assert(!metadataOnly(mm), "a deleted row may carry a file's min/max")
    assert(mm.collect()(0).getLong(0) ==
      Snapshot.read(spark, dir).agg(min(col("o_orderkey"))).collect()(0).getLong(0))
  }

  test("column mapping: per-column fold translates to physical names") {
    val t = sf()
    val dir = freshDir("colmap")
    Snapshot.create(spark, dir, t.orders.select(col("o_orderkey"), col("o_totalprice")))
    Snapshot.renameColumn(spark, dir, "o_totalprice", "price")
    val agg = nativeDf(dir).agg(
      count(lit(1)).as("n"), min(col("price")).as("mn"), max(col("price")).as("mx"))
    assert(metadataOnly(agg), "colMap-active fallback still folds from stats")
    assert(agg.collect()(0) == Snapshot.read(spark, dir).agg(
      count(lit(1)), min(col("price")), max(col("price"))).collect()(0))
  }

  test("time travel: the fold answers for the pinned version") {
    val t = sf()
    val dir = freshDir("tt")
    Snapshot.create(spark, dir, t.orders.select(col("o_orderkey")).limit(30))
    val v0 = Snapshot.latestVersion(spark, dir).get
    Snapshot.append(spark, dir, t.orders.select(col("o_orderkey")).limit(25))
    val pinned = spark.read.format("graft.sources.SnapshotSource")
      .option("versionAsOf", v0).load(dir).agg(count(lit(1)).as("n"))
    assert(metadataOnly(pinned))
    assert(pinned.collect()(0).getLong(0) == 30L)
    val latest = nativeDf(dir).agg(count(lit(1)).as("n"))
    assert(latest.collect()(0).getLong(0) == 55L)
  }

  test("casts around aggregates fold over the computed value") {
    val t = sf()
    val dir = freshDir("cast")
    Snapshot.create(spark, dir, t.orders.select(col("o_orderkey"), col("o_orderdate")))
    val agg = nativeDf(dir).agg(
      max(col("o_orderdate")).cast("date").as("last_day"),
      min(col("o_orderkey")).cast("int").as("mn_i"),
      count(lit(1)).cast("double").as("n_d"))
    assert(metadataOnly(agg), s"cast-wrapped aggregates must still fold:\n${agg.queryExecution.optimizedPlan}")
    assert(agg.collect()(0) == Snapshot.read(spark, dir).agg(
      max(col("o_orderdate")).cast("date"), min(col("o_orderkey")).cast("int"),
      count(lit(1)).cast("double")).collect()(0))
  }

  test("partition-grouped rollup folds from partition values + per-file stats") {
    val t = sf()
    val dir = freshDir("grouped")
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .repartition(3),
      partitionCols = Seq("o_orderpriority"))
    val agg = nativeDf(dir).groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_totalprice")).as("mx"))
    assert(metadataOnly(agg), s"grouped fold must fire:\n${agg.queryExecution.optimizedPlan}")
    val got = agg.orderBy("o_orderpriority").collect().toSeq
    val want = Snapshot.read(spark, dir).groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_totalprice")).as("mx"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(got == want, s"grouped fold mismatch:\n$got\n$want")
  }

  test("SELECT DISTINCT partition_col answers from the manifest; grouped counts stay live-exact under DVs") {
    val t = sf()
    val dir = freshDir("distinct")
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_orderpriority"))
        .repartition(1),
      partitionCols = Seq("o_orderpriority"))
    val d0 = nativeDf(dir).select(col("o_orderpriority")).distinct()
    assert(metadataOnly(d0), s"DISTINCT must fold:\n${d0.queryExecution.optimizedPlan}")
    assert(d0.collect().map(_.getString(0)).sorted.toSeq ==
      Snapshot.read(spark, dir).select("o_orderpriority").distinct()
        .collect().map(_.getString(0)).sorted.toSeq)

    // a sub-threshold point delete lands as a deletion vector; the
    // grouped count(*) must subtract exactly the vectored rows
    val before = Snapshot.read(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT").count()
    Snapshot.delete(spark, dir,
      col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 37 === 0,
      dvMaxFraction = 0.5)
    val m = Snapshot.latestManifest(spark, dir).get
    assume(m.dvs.nonEmpty, "fixture must land in the DV tier")
    val g = nativeDf(dir).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(metadataOnly(g), "grouped count(*) stays exact under vectors")
    val urg = g.collect().find(_.getString(0) == "1-URGENT").get.getLong(1)
    val scan = Snapshot.read(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT").count()
    assert(urg == scan && urg < before, s"live count $urg != scan $scan (before $before)")
  }

  test("min/max of a partition column: the watermark probe steps down when a partition drops") {
    val t = sf()
    val dir = freshDir("wm")
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_orderpriority")).repartition(1),
      partitionCols = Seq("o_orderpriority"))
    val wm = nativeDf(dir).agg(max(col("o_orderpriority")).as("hi"),
      min(col("o_orderpriority")).as("lo"), count(col("o_orderpriority")).as("c"))
    assert(metadataOnly(wm), s"partition min/max must fold:\n${wm.queryExecution.optimizedPlan}")
    assert(wm.collect()(0) == Snapshot.read(spark, dir).agg(
      max(col("o_orderpriority")), min(col("o_orderpriority")),
      count(col("o_orderpriority"))).collect()(0))

    // deleting the whole top partition drops its files (full-match
    // tier, no rewrite): the folded max must step down with it
    Snapshot.delete(spark, dir, col("o_orderpriority") === "5-LOW")
    val wm2 = nativeDf(dir).agg(max(col("o_orderpriority")).as("hi"))
    assert(metadataOnly(wm2))
    assert(wm2.collect()(0).getString(0) == "4-NOT SPECIFIED",
      "max must skip the deleted partition")
  }

  test("catalog route: grouped fold fires on a by-name spark.sql query") {
    val wh = Files.createTempDirectory("graft-metaagg-cat").toString
    spark.conf.set("spark.sql.catalog.gmeta", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmeta.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.db")
    spark.sql("CREATE TABLE gmeta.db.t (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gmeta.db.t VALUES (1,'a'),(2,'a'),(3,'b')")
    val df = spark.sql("SELECT p, count(*) AS n, max(id) AS mx FROM gmeta.db.t GROUP BY p")
    assert(metadataOnly(df), s"catalog-name fold must fire:\n${df.queryExecution.optimizedPlan}")
    assert(df.orderBy("p").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 2L, 2L), ("b", 1L, 3L)))
  }

  test("grouped fold refuses past the group cap") {
    val t = sf()
    val dir = freshDir("cap")
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_orderpriority")).repartition(1),
      partitionCols = Seq("o_orderpriority"))
    spark.conf.set("spark.graft.metaAgg.maxGroups", "2")
    try {
      val agg = nativeDf(dir).groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(!metadataOnly(agg), "5 groups > cap 2 must fall back to the scan")
      assert(agg.count() == 5)
    } finally spark.conf.unset("spark.graft.metaAgg.maxGroups")
  }

  test("empty table: count answers 0, min/max answer null, no scan") {
    val t = sf()
    val dir = freshDir("empty")
    Snapshot.create(spark, dir,
      t.orders.select(col("o_orderkey"), col("o_totalprice")).limit(0))
    val agg = nativeDf(dir).agg(count(lit(1)).as("n"),
      min(col("o_totalprice")).as("mn"), count(col("o_orderkey")).as("c"))
    assert(metadataOnly(agg))
    val r = agg.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.getLong(2) == 0L, s"got $r")
  }
}
