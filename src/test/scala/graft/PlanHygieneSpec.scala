package graft

/** Plan-shape regression net: builds every SparkEntry query (no
  * execution) and asserts the physical plan properties the 100 TB
  * contract depends on.
  */
class PlanHygieneSpec extends SparkSpec {

  // q32 is the documented exact all-pairs baseline (its LSH variant is
  // the scale path); q74 is the quantized brute-force baseline with the
  // same caveat (IVF/LSH bucketing composes in front of the codes).
  // Everything else must never plan a cross product.
  private val crossJoinAllowed = Set("q32_cosine_neardup", "q74_quantized_topk")

  test("no query plans a cartesian/cross product (except the documented baseline)") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (!crossJoinAllowed(name)) {
        assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      }
    }
  }

  test("ANN ranking is a map-side partial aggregate, not a window over candidate pairs") {
    val dir = "/root/testdata/sf0.001"
    Seq("q30_topk_bruteforce", "q31_topk_lsh", "q51_ivf_topk").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("partial_graft_topk_pairs"),
        s"$q: top-k must partially aggregate before the shuffle")
    }
  }

  test("filter and projection reach the parquet scan") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // 6-column read schema, not the 16-column table
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_returnflag:string,l_linestatus:string,l_shipdate"))
  }

  test("corpus-pack scans prune documents to the columns they use") {
    val dir = "/root/testdata/sf0.001"
    def fmt(q: String) = SparkEntry.queries(q)(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // q76 probes grams: only (doc_id, text) may be read, never the
    // lang/source/n_chars columns the table also carries
    assert(fmt("q76_ngram_containment").contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    // q75 packs per source: (doc_id, text, source) and nothing else
    assert(fmt("q75_sequence_packing").contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"))
    // q71/q72 never need doc text beyond tokens/ids
    assert(!fmt("q72_stratified_sample").contains("n_chars"))
  }

  test("dimension chains broadcast; fact side is never built") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q03_join_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin")) // dims are all broadcast-sized here
  }

  test("segmentation compiles N rules into exactly one scan of the input") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q56_segmentation_rules")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"q56 scans its input $scans times — rules must share one pass:\n$plan")
  }

  test("q62's five branches and both grains share one fact scan per load") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q62_consumo_bloques")(spark, dir)
      .queryExecution.executedPlan.toString
    val factScans = "events\\.parquet".r.findAllIn(plan).length
    // q62 recomputes BOTH sides of the publication (existing +
    // replacement; production reads `existing` from storage): 2 loads ×
    // 1 scan each — the grains ride one unioned spine and the rerun's
    // asymmetric extract is a per-grain gate, so neither the 5 branches
    // nor the 2 grains multiply the scan (5 branch plans × 2 grains
    // would be 20).
    assert(factScans == 2,
      s"q62 scans events $factScans times — branches and grains must share one pass per load")
  }

  test("q78's eight window functions share one exchange (two sorts, not eight)") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q78_window_battery")(spark, dir)
      .queryExecution.executedPlan.toString
    // all eight functions partition by event_type: one hash exchange on
    // the partition key (plus the final ORDER BY range exchange), and
    // one sort per distinct ORDER BY key (event_id, value) — Catalyst
    // must merge same-spec windows rather than planning eight exchanges
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"q78 plans $hashExchanges hash exchanges — same-partition windows must share one:\n$plan")
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows <= 2, s"q78 plans $windows Window operators for two window specs")
  }

  test("q77's profile is one two-phase aggregate over one scan") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q77_stats_profile")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "events\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"q77 scans events $scans times — moments and percentiles must share one pass")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
  }

  test("aggregations are two-phase (partial before the exchange)") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("partial_sum"))
  }

  test("q91's top-k is TakeOrderedAndProject, never a global sort of all docs") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q91_bm25_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q91 must plan a partial top-k:\n$plan")
  }

  test("q92's bloom bit test filters the fact below its exchange") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q92_bloom_pruned_join")(spark, dir)
      .queryExecution.executedPlan.toString
    // the probe-side Filter carries the literal-array bit test
    // (shiftright on element_at) — i.e. pruning happens at the scan
    // stage, not after the join
    assert(plan.contains("shiftright"), s"q92 lost its bloom probe filter:\n$plan")
  }

  test("golden plans: the ten heaviest queries keep their exchange/sort/join shape") {
    // Structural regression net for the queries that dominate the bench:
    // timings on a shared box are contention-noisy (two phantom 3-6x
    // spikes adjudicated in round 5), but these counts only change when
    // the PLAN changes. Values are the audited sf0.001 shapes — a count
    // drifting UP means a lost broadcast, a split window, or a new
    // shuffle; update a pin only after re-auditing the plan by hand.
    val dir = "/root/testdata/sf0.001"
    //                      (hash, range, sort, smj, bhj, bnlj)
    val pins = Seq(
      // connected-components family: per-round self-joins contract to
      // the label graph; exchanges scale with the (fixed) round count.
      // q109's fixture (yesterday's full labeling) is STAGED since
      // round 10, so its pinned plan is the incremental fold only —
      // contraction joins + remap over localCheckpointed inputs.
      "q109_incremental_components" -> (7, 1, 8, 4, 0, 0),
      // r16: q95 materializes its scored component join once
      // (localCheckpoint, two consumers) — the survivor election reads
      // the checkpointed RDD, so the visible plan is the election only
      "q95_quality_survivorship"    -> (2, 1, 4, 1, 0, 0),
      "q79_semantic_dedup"          -> (2, 1, 3, 1, 0, 0),
      "q70_pipeline_survivors"      -> (2, 1, 3, 1, 1, 0),
      "q44_dedup_survivors"         -> (2, 1, 3, 1, 0, 0),
      // one fact pass per grain x 2 loads; spine/dim joins broadcast
      // (bnlj = the two broadcast range/overlap joins)
      "q62_consumo_bloques"         -> (4, 1, 1, 0, 8, 2),
      // r16: the posting self-join is SHUFFLE_HASH-hinted so both sides
      // are the identical exchange (ReuseExchange computes it once) —
      // 2 hash exchanges for the join sides + 1 for the pair aggregate;
      // the ShuffledHashJoin itself is not in the counted set
      "q27_jaccard_pairs"           -> (3, 1, 1, 0, 0, 0),
      "q92_bloom_pruned_join"       -> (1, 1, 1, 0, 1, 0),
      "q66_indicadores_cia"         -> (3, 1, 1, 0, 2, 2),
      "q67_trafico_digital"         -> (4, 1, 3, 0, 0, 0))
    pins.foreach { case (q, (hash, range, sort, smj, bhj, bnlj)) =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      def c(p: String) = p.r.findAllIn(plan).length
      val got = (c("Exchange hashpartitioning"), c("Exchange rangepartitioning"),
        c("\\bSort \\["), c("SortMergeJoin"), c("BroadcastHashJoin"),
        c("BroadcastNestedLoopJoin"))
      assert(got == ((hash, range, sort, smj, bhj, bnlj)),
        s"$q plan shape drifted: (hash,range,sort,smj,bhj,bnlj) = $got, " +
          s"pinned (${hash},$range,$sort,$smj,$bhj,$bnlj)")
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian product")
    }
  }

  test("SQL over the registered snapshot source plans a native pushed-down parquet scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-src").toString + "/t"
    graft.operators.Snapshot.create(spark, dir,
      (0 until 2000).map(i => (i.toLong, s"n$i", i * 1.5)).toDF("id", "name", "score")
        .repartitionByRange(8, col("id")))
    spark.read.format("graft.sources.SnapshotSource").load(dir)
      .createOrReplaceTempView("plan_snap_t")
    val plan = spark.sql(
      "SELECT name FROM plan_snap_t WHERE id BETWEEN 100 AND 180")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"SQL source must not plan an RDD scan:\n$plan")
    assert(plan.contains("FileScan parquet"), s"expected the native parquet scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(id,100)") &&
      plan.contains("LessThanOrEqual(id,180)") && plan.contains("PushedFilters: ["),
      s"WHERE must reach the parquet scan:\n${plan.linesIterator.filter(_.contains("Pushed")).mkString}")
    assert(plan.contains("ReadSchema: struct<id:bigint,name:string>"),
      "projection must prune the read schema")
    assert(plan.contains("ColumnarToRow"), "scan must be columnar")
  }

  test("q98's lag, running sum, and session aggregate share one hash exchange") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q98_sessionize")(spark, dir)
      .queryExecution.executedPlan.toString
    // both windows partition by user_id and the (user_id, session_id)
    // aggregate is satisfied by the same clustering: one hash exchange
    // (plus only the final presentation ORDER BY's range exchange)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"q98 plans $hashExchanges hash exchanges — windows and aggregate must share one:\n$plan")
  }
}
