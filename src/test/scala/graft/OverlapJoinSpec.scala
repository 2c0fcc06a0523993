package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.TimeFns
import graft.operators.OverlapJoin

class OverlapJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("prorated minutes across a covering spine sum to the clamped duration") {
    // one event 10:30 → 13:15 against an hourly spine over the day
    val fact = Seq((1L, ts("2024-03-01 10:30:00"), ts("2024-03-01 13:15:00")))
      .toDF("id", "s", "e")
    val spine = TimeFns.spine(spark, "2024-03-01 00:00:00", "2024-03-02 00:00:00", "1 hour")
    val joined = OverlapJoin.broadcastOverlap(fact, spine, $"s", $"e", $"p_start", $"p_end")
    val total = joined
      .agg(sum(TimeFns.overlapSeconds($"s", $"e", $"p_start", $"p_end")))
      .as[Long].head()
    assert(total == 165 * 60)
    assert(joined.count() == 4) // hours 10,11,12,13
  }

  test("bucketed overlap ≡ broadcast overlap on random intervals") {
    val base = ts("2024-03-01 00:00:00").getTime
    val gen = for {
      off <- Gen.choose(0L, 72L * 3600)    // start within 3 days
      dur <- Gen.choose(1L, 30L * 3600)    // up to 30h → spans buckets
    } yield (off, dur)
    val intervals = Gen.listOfN(60, gen).sample.get.zipWithIndex.map {
      case ((off, dur), i) =>
        (i.toLong, new java.sql.Timestamp(base + off * 1000), new java.sql.Timestamp(base + (off + dur) * 1000))
    }
    val fact = intervals.toDF("id", "s", "e")
    val spine = TimeFns.spine(spark, "2024-03-01 00:00:00", "2024-03-05 00:00:00", "1 hour")
    val a = OverlapJoin.broadcastOverlap(fact, spine, $"s", $"e", $"p_start", $"p_end")
      .select("id", "p_start").as[(Long, java.sql.Timestamp)].collect().toSet
    val b = OverlapJoin.bucketedOverlap(fact, spine, "s", "e", "p_start", "p_end")
      .select("id", "p_start").as[(Long, java.sql.Timestamp)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("overlap predicate is half-open: event touching period start only at end instant") {
    val fact = Seq((1L, ts("2024-03-01 09:00:00"), ts("2024-03-01 10:00:00"))).toDF("id", "s", "e")
    val spine = TimeFns.spine(spark, "2024-03-01 09:00:00", "2024-03-01 12:00:00", "1 hour")
    val hit = OverlapJoin.broadcastOverlap(fact, spine, $"s", $"e", $"p_start", $"p_end")
      .select("p_start").as[java.sql.Timestamp].collect().toSet
    // e >= p_start keeps the 10:00 block (zero-length overlap), s < p_end drops 11:00
    assert(hit == Set(ts("2024-03-01 09:00:00"), ts("2024-03-01 10:00:00")))
  }
}
