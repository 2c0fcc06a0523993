package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain aggregation") {
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong))
      .toDF("key", "v")
    val salted = Skew.saltedAgg(df, Seq("key"), buckets = 8)(
      Seq(sum($"v").as("s"), count(lit(1)).as("n")),
      Seq(sum($"s").as("s"), sum($"n").as("n")))
      .as[(String, Long, Long)].collect().toSet
    val plain = df.groupBy("key").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join and spreads the hot key") {
    val left = (1 to 5000).map(i => (if (i % 2 == 0) 1L else (i % 50).toLong, i)).toDF("id", "v")
    val right = (0L to 49L).map(i => (i, s"dim$i")).toDF("id", "name")
    val salted = Skew.saltedJoin(left, right, "id", buckets = 8)
      .select("id", "v", "name").as[(Long, Int, String)].collect().toSet
    val plain = left.join(right, "id").select("id", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 5000)
  }
}
