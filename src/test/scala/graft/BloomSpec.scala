package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every dim key passes mightContain") {
    val dim = (1L to 2000L by 3).toDF("k")
    val f = Bloom.build(dim, "k")
    val missed = dim.where(!f.mightContain($"k")).count()
    assert(missed == 0L)
  }

  test("prunes most non-matching probe rows (fpp well under 5%)") {
    val dim = (1L to 500L).toDF("k")
    val probe = (100001L to 200000L).toDF("k") // disjoint from dim
    val f = Bloom.build(dim, "k")
    val passed = probe.where(f.mightContain($"k")).count()
    assert(passed < 5000L, s"false-positive passthrough too high: $passed / 100000")
  }

  test("prunedJoin is value-identical to the plain join") {
    val dim = (1L to 300L by 7).map(i => (i, s"d$i")).toDF("k", "name")
    val probe = (1L to 5000L).map(i => (i % 400, i)).toDF("k", "v")
    val pruned = Bloom.prunedJoin(probe, dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    val plain = probe.join(dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("prunedJoin matches the plain join when probe and dim key TYPES differ") {
    // hash/xxhash64 are type-sensitive: int 7 and bigint 7 hash
    // differently, so an uncoerced filter would false-negative silently
    val dim = (1 to 300 by 7).toDF("k") // int keys
    val probe = (1L to 5000L).map(i => (i % 400, i)).toDF("k", "v") // bigint keys
    val pruned = Bloom.prunedJoin(probe, dim, "k")
      .select("k", "v").as[(Long, Long)].collect().toSet
    val plain = probe.join(dim, "k")
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("broadcast-backed filter decides identically to the literal filter") {
    val dim = (1L to 2000L by 3).toDF("k")
    val lit = Bloom.build(dim, "k", org.apache.spark.sql.types.LongType, literalMaxWords = Int.MaxValue)
    val bc = Bloom.build(dim, "k", org.apache.spark.sql.types.LongType, literalMaxWords = 0)
    assert(lit.wordFn.isEmpty && bc.wordFn.isDefined)
    val probe = (1L to 4000L).toDF("k")
    val disagree = probe.where(lit.mightContain($"k") =!= bc.mightContain($"k")).count()
    assert(disagree == 0L)
    val missed = dim.where(!bc.mightContain($"k")).count()
    assert(missed == 0L)
  }

  test("a 1M-key build ships as a broadcast and keeps the plan bounded") {
    val dim = spark.range(1L, 1000001L).toDF("k")
    val f = Bloom.build(dim, "k")
    assert(f.wordFn.isDefined, s"expected broadcast path at ${f.bits.length} words")
    assert(f.bits.length > Bloom.LiteralMaxWords)
    val probe = spark.range(999000L, 1003001L).toDF("k")
    val plan = probe.where(f.mightContain($"k")).queryExecution.optimizedPlan.toString
    assert(plan.length < 100000, s"plan embeds the word array: ${plan.length} chars")
    // no false negatives across the keyspace edge
    val missed = probe.where($"k" <= 1000000L).where(!f.mightContain($"k")).count()
    assert(missed == 0L)
  }

  test("filter survives string keys and nulls on the probe side") {
    val dim = Seq("a", "b", "c").toDF("k")
    val probe = Seq(Some("a"), Some("zz"), None, Some("c")).toDF("k")
    val f = Bloom.build(dim, "k")
    val kept = probe.where(f.mightContain($"k")).as[String].collect().toSet
    // spark's hash(null) is the seed, not null, so a null key MAY pass
    // the bit test as an ordinary false positive — correctness is
    // preserved because the equi-join drops null keys regardless. The
    // dim keys must always pass; anything else is an allowed (rare,
    // deterministic) false positive.
    assert(Set("a", "c").subsetOf(kept))
    assert(kept.subsetOf(Set("a", "c", "zz", null)))
  }
}
