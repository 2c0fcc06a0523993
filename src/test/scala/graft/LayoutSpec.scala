package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = sf("sf0.01").events
    .select("event_id", "user_id", "event_type", "value")

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  test("z-order layout preserves the exact row multiset") {
    val dir = tmp("zorder_roundtrip")
    Layout.zorderWrite(events, dir, Seq("user_id", "value"), 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    // order-independent content check: sum of row hashes must match
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(xxhash64(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .cast("decimal(38,0)"))).head().getDecimal(0)
    assert(sig(back) == sig(events))
  }

  test("z-order skips row groups on the non-leading dimension where a linear sort cannot") {
    val zDir = tmp("zorder_z")
    val linDir = tmp("zorder_lin")
    Layout.zorderWrite(events, zDir, Seq("user_id", "value"), 16)
    Layout.linearWrite(events, linDir, "user_id", 16)
    // a tight box on value ALONE — the second z dimension. The linear
    // layout is sorted by user_id, so every file spans the full value
    // range and nothing is skippable; the z layout dedicates half its
    // interleaved bits to value, so only files whose value-box
    // intersects the band survive footer pruning.
    val band = Map("value" -> (200.0, 240.0))
    val (zHit, zTotal) = Layout.rowGroupsIntersecting(spark, zDir, band)
    val (linHit, linTotal) = Layout.rowGroupsIntersecting(spark, linDir, band)
    assert(zTotal >= 16 && linTotal >= 16)
    assert(linHit == linTotal, s"linear layout should be unskippable on value, hit $linHit/$linTotal")
    assert(zHit * 2 <= zTotal, s"z layout should skip at least half on value, hit $zHit/$zTotal")
    // and a 2-D box intersects close to the product of the per-dim
    // fractions, not the sum: strictly fewer groups than either layout
    // scans for the band alone
    val box = Map("user_id" -> (40.0, 70.0), "value" -> (200.0, 240.0))
    val (zBox, _) = Layout.rowGroupsIntersecting(spark, zDir, box)
    assert(zBox < zHit, s"2-D box ($zBox) should prune below the 1-D band ($zHit)")
  }

  test("zvalue interleaves bits: box-adjacent points get close z values, far points do not") {
    // 2-bit, 2-col sanity grid: zvalue of (bucket x, bucket y) over
    // [0,4) x [0,4) must equal the hand-computed Morton number
    val pts = Seq((0.0, 0.0, 0L), (3.999, 3.999, 15L), (0.0, 3.999, 5L), (3.999, 0.0, 10L))
    val df = pts.toDF("x", "y", "expect")
      .withColumn("z", Layout.zvalue(Seq(col("x"), col("y")), Seq((0.0, 4.0), (0.0, 4.0)), 2))
    assert(df.where(col("z") =!= col("expect")).count() == 0)
  }

  test("ordinals match the global window and sort the fact hash-partitioned, not on one partition") {
    import org.apache.spark.sql.expressions.Window
    // duplicate keys spanning would-be boundaries + a tie-heavy column:
    // equal keys must land in one bucket so tie-breaking never crosses
    val df = spark.range(0, 5000).select(
      (col("id") % 97).as("k"), col("id").as("tie"))
    val got = Layout.ordinals(df, "k", Seq("tie"), buckets = 64)
    val want = df.withColumn("ordinal",
      (row_number().over(Window.orderBy("k", "tie")) - 1).cast("long"))
    assert(got.join(want, Seq("k", "tie"))
      .where(got("ordinal") =!= want("ordinal")).count() == 0)
    assert(got.count() == 5000)
    // the fact-side sort must be partitioned by bucket: the physical
    // plan carries a hash exchange on __b, and the ONLY single-partition
    // exchange allowed is the bucket-sized offsets window
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__b"), "expected bucket-partitioned window sort")
  }

  test("bucketed tables join with no exchange on either side") {
    val dir = tmp("bucketed")
    val orders = sf("sf0.01").orders.select("o_custkey", "o_totalprice")
    val customer = sf("sf0.01").customer.select("c_custkey", "c_mktsegment")
    Layout.bucketedWrite(orders, "graft_t_orders", s"$dir/o", "o_custkey", 8)
    Layout.bucketedWrite(customer, "graft_t_customer", s"$dir/c", "c_custkey", 8)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("graft_t_orders")
        .join(spark.table("graft_t_customer"), col("o_custkey") === col("c_custkey"))
      bucketed.count() // materialize so AQE finalizes the plan
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // same join over plain parquet DOES shuffle — the bucketing is
      // what removed it, not the data size
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(bucketed.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("supplied bounds/boundaries skip the stats job entirely") {
    // a key column that THROWS when scanned: without injected bounds the
    // eager min/max stats job hits it; with bounds/boundaries, plan
    // construction must run no job at all
    val boom = udf((x: Long) => {
      if (x >= 0) throw new RuntimeException("stats job ran against poisoned input")
      x
    })
    val poisoned = spark.range(100).select(boom(col("id")).as("k"), col("id").as("v"))
    intercept[Exception] { Layout.ordinals(poisoned, "k", Seq("v")) }
    val planned = Layout.ordinals(poisoned, "k", Seq("v"), boundaries = Some(Seq(3.0, 6.0)))
    assert(planned.columns.contains("ordinal")) // planning only — no scan happened
    val planned2 = Layout.ordinals(poisoned, "k", Seq("v"), knownBounds = Some((0.0, 100.0)))
    assert(planned2.columns.contains("ordinal"))
  }

  test("zorderWrite with catalog bounds writes the same rows, no stats pass") {
    val dir = tmp("zbounds")
    val df = spark.range(0, 2000).select(
      (col("id") % 50).cast("double").as("x"), (col("id") % 37).cast("double").as("y"),
      col("id").as("v"))
    Layout.zorderWrite(df, s"$dir/z", Seq("x", "y"), numFiles = 4,
      knownBounds = Some(Seq((0.0, 50.0), (0.0, 37.0))))
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 2000)
    assert(back.select("x", "y", "v").as[(Double, Double, Long)].collect().toSet ==
      df.select("x", "y", "v").as[(Double, Double, Long)].collect().toSet)
  }

  test("quantile boundaries give exact global ordinals under heavy key skew") {
    import org.apache.spark.sql.expressions.Window
    // 500 copies of one hot key: uniform buckets would put them all in
    // one straggler; equi-depth boundaries still yield the same ordinals
    val keys = Seq.fill(500)(7.0) ++ (1 to 100).map(_.toDouble)
    val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val got = Layout.ordinals(df, "k", Seq("v"), boundaries = Some(Seq(5.0, 7.0, 50.0)))
    val want = df.withColumn("ordinal",
      (row_number().over(Window.orderBy("k", "v")) - 1).cast("long"))
    assert(got.join(want, Seq("k", "v"))
      .where(got("ordinal") =!= want("ordinal")).count() == 0)
    assert(got.count() == 600)
  }

  test("degenerate bounds (min==max) fall back to the remaining dimensions") {
    val df = Seq((1.0, 10.0), (1.0, 30.0), (1.0, 20.0)).toDF("a", "b")
      .withColumn("z", Layout.zvalue(Seq(col("a"), col("b")), Seq((1.0, 1.0), (10.0, 30.0)), 4))
    val zs = df.orderBy("b").select("z").as[Long].collect()
    assert(zs.sorted.sameElements(zs), "z must be monotone in the only varying column")
  }
}
