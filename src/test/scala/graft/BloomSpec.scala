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
