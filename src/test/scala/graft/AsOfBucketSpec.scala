package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfBucketSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join picks the latest right row at-or-before, per key, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // tie with a right row → inclusive
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")),  // before any right row → null
      (4L, 30L, ts("2024-01-01 09:00:00"))). // key with no right rows at all
      toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 5.0),
      (10L, ts("2024-01-01 11:30:00"), 7.0),
      (20L, ts("2024-01-01 10:30:00"), 9.0)).toDF("user_id", "ts", "v")
    val out = AsOfJoin.latestPriorTo(left, right, "user_id", "ts", "ts", Seq("v"))
      .select("event_id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(5.0), 2L -> Some(7.0), 3L -> None, 4L -> None))
  }

  test("bucketed tables co-locate the join: no exchange on either side") {
    // K1's clustering story at scale: pre-bucketing both tables on the
    // join key removes the per-query shuffle entirely
    val wh = Files.createTempDirectory("graft-wh").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = sf()
      t.orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("graft_orders_b")
      t.customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").mode("overwrite").saveAsTable("graft_customer_b")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == t.orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_customer_b")
    }
  }
}
