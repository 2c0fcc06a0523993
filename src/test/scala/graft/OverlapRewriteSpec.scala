package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.OverlapJoinRewrite

class OverlapRewriteSpec extends SparkSpec {

  test("GraftExtensions serves graft_* functions to a pure-SQL session") {
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // same SparkContext, new session state with the extensions applied
    // (config-based extensions are a static conf — ignored when the
    // context already exists — so the builder hook stands in here; the
    // conf path is what Engine.session/spark-submit use)
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(ext => new graft.plans.GraftExtensions().apply(ext))
      .getOrCreate()
    try {
      val d = s2.sql(
        """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
        .collect()(0).getDouble(0)
      assert(d == 11.0)
      val h = s2.sql("SELECT graft_token_hashes('hello') AS h")
        .collect()(0).getSeq[Long](0)
      assert(h == Seq(1564557354L)) // md5('hello') prefix, TextDedupSpec golden
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val enabled: Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ OverlapJoinRewrite(spark)
  }

  private def intervalsDf(n: Int, path: String): DataFrame = {
    val base = ts("2024-03-01 00:00:00").getTime
    (0 until n).map { i =>
      (i.toLong, new java.sql.Timestamp(base + i * 97000L % (3L * 86400000)),
        new java.sql.Timestamp(base + i * 97000L % (3L * 86400000) + 3600000L * (1 + i % 30)))
    }.toDF("id", "s", "e").write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  test("rewrites a large-large overlap join to a bucketed equi-join with identical results") {
    enabled
    val dir = Files.createTempDirectory("graft-rw").toString
    val a = intervalsDf(500, s"$dir/a")
    val b = intervalsDf(300, s"$dir/b").withColumnsRenamed(Map("id" -> "pid", "s" -> "ps", "e" -> "pe"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force "both sides too big to broadcast"
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = a.join(b, $"s" < $"pe" && $"e" >= $"ps")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("__graft_bucket"))
      val got = joined.select("id", "pid").as[(Long, Long)].collect().toSet

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val naive = a.join(broadcast(b), $"s" < $"pe" && $"e" >= $"ps")
        .select("id", "pid").as[(Long, Long)].collect().toSet
      assert(got == naive)
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("leaves broadcast-able overlap joins to the nested-loop plan") {
    enabled
    val dir = Files.createTempDirectory("graft-rw2").toString
    val a = intervalsDf(200, s"$dir/a")
    val b = intervalsDf(20, s"$dir/b").withColumnsRenamed(Map("id" -> "pid", "s" -> "ps", "e" -> "pe"))
    val joined = a.join(b, $"s" < $"pe" && $"e" >= $"ps")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("__graft_bucket"))
  }

  test("does not touch joins that already have an equi-key") {
    enabled
    val dir = Files.createTempDirectory("graft-rw3").toString
    val a = intervalsDf(100, s"$dir/a")
    val b = intervalsDf(100, s"$dir/b").withColumnsRenamed(Map("id" -> "pid", "s" -> "ps", "e" -> "pe"))
    val joined = a.join(b, $"id" === $"pid" && $"s" < $"pe" && $"e" >= $"ps")
    assert(!joined.queryExecution.executedPlan.toString.contains("__graft_bucket"))
  }
}
