package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical profiling and the full ranking-window battery over the
  * events stream — the monitoring/report layer next to the pipelines
  * (the reference's sanity metrics are COUNT/nunique; a production
  * migration gets the distribution profile with them).
  *
  * Determinism: moments derive from DECIMAL sums (order-independent)
  * with the variance assembled in ONE fixed double expression; exact
  * interpolated percentiles (Spark `percentile` ≡ DuckDB
  * `quantile_cont`, verified bitwise incl. non-representable
  * interpolants); every window orders by a unique or value key so rank
  * functions are reproducible.
  */
object StatsPack extends QueryPack {

  val q77 = QueryDef(
    "q77_stats_profile",
    Some("""WITH c AS (
           |  SELECT event_type, value, CAST(round(value * 100) AS BIGINT) AS v100 FROM events
           |), s AS (
           |  SELECT event_type, COUNT(value) AS n,
           |    CAST(SUM(v100) AS BIGINT) AS sum100,
           |    CAST(SUM(v100 * v100) AS BIGINT) AS sumsq100,
           |    min(value) AS vmin, max(value) AS vmax,
           |    quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.95) AS p95
           |  FROM c GROUP BY 1
           |)
           |SELECT event_type, CAST(n AS BIGINT) AS n,
           |  CAST(sum100 AS DOUBLE) / 100.0 / n AS mean,
           |  (CAST(sumsq100 AS DOUBLE) - CAST(sum100 AS DOUBLE) * CAST(sum100 AS DOUBLE) / n) / (n - 1) / 10000.0 AS var_samp,
           |  sqrt((CAST(sumsq100 AS DOUBLE) - CAST(sum100 AS DOUBLE) * CAST(sum100 AS DOUBLE) / n) / (n - 1) / 10000.0) AS stddev,
           |  vmin, vmax, p50, p95
           |FROM s ORDER BY event_type""".stripMargin)) { t =>
    // Per-group distribution profile: exact moments via integer cents
    // (value is 2-decimal money, so round(value*100) is the exact
    // integer both engines agree on — a decimal cast of value*value
    // would round its 12th decimal differently per engine, the
    // kmeansRefine lesson), variance assembled driver-free from Σx and
    // Σx² in one fixed-order double expression — the built-in var_samp
    // folds doubles in partition order and would NOT reproduce across
    // partitionings. Percentiles are the exact interpolated ones
    // (Spark `percentile` ≡ DuckDB `quantile_cont` bitwise); at 100 TB
    // the constant-space sketch opt-in is q49's pattern, this is the
    // exact side-by-side. One two-phase hash aggregate, one shuffle
    // row per group.
    val v100 = round(col("value") * 100).cast("long")
    t.events
      .select(col("event_type"), col("value"), v100.as("v100"))
      .groupBy("event_type")
      .agg(
        count(col("value")).as("n"),
        sum(col("v100")).as("sum100"),
        sum(col("v100") * col("v100")).as("sumsq100"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        expr("percentile(value, 0.5D)").as("p50"),
        expr("percentile(value, 0.95D)").as("p95"))
      .select(col("event_type"), col("n"),
        (col("sum100").cast("double") / 100.0 / col("n")).as("mean"),
        ((col("sumsq100").cast("double") - col("sum100").cast("double") * col("sum100").cast("double") / col("n"))
          / (col("n") - 1) / 10000.0).as("var_samp"),
        sqrt((col("sumsq100").cast("double") - col("sum100").cast("double") * col("sum100").cast("double") / col("n"))
          / (col("n") - 1) / 10000.0).as("stddev"),
        col("vmin"), col("vmax"), col("p50"), col("p95"))
      .orderBy("event_type")
  }

  val q78 = QueryDef(
    "q78_window_battery",
    Some("""SELECT event_id, event_type,
           |  row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn,
           |  rank() OVER (PARTITION BY event_type ORDER BY value) AS rk,
           |  dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS drk,
           |  lag(value) OVER (PARTITION BY event_type ORDER BY event_id) AS prev_value,
           |  lead(value) OVER (PARTITION BY event_type ORDER BY event_id) AS next_value,
           |  ntile(4) OVER (PARTITION BY event_type ORDER BY event_id) AS tile,
           |  cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cdist,
           |  percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS prank
           |FROM events WHERE user_id < 50
           |ORDER BY event_id""".stripMargin)) { t =>
    // The §2.6 ranking-window battery in one pass: all eight functions
    // share two window specs (id order and value order) over the same
    // partition key, so Catalyst plans ONE exchange + two sorts, not
    // eight. Ranks over `value` are deterministic under ties (they
    // depend only on the sort key); offsets/ntile order by the unique
    // id.
    val byId = Window.partitionBy("event_type").orderBy("event_id")
    val byValue = Window.partitionBy("event_type").orderBy("value")
    t.events.where(col("user_id") < 50)
      .select(col("event_id"), col("event_type"),
        row_number().over(byId).as("rn"),
        rank().over(byValue).as("rk"),
        dense_rank().over(byValue).as("drk"),
        lag(col("value"), 1).over(byId).as("prev_value"),
        lead(col("value"), 1).over(byId).as("next_value"),
        ntile(4).over(byId).as("tile"),
        cume_dist().over(byValue).as("cdist"),
        percent_rank().over(byValue).as("prank"))
      .orderBy("event_id")
  }

  val q82 = QueryDef(
    "q82_winsorized_stats",
    Some("""WITH src AS (
           |  SELECT event_type, value, CAST(round(value * 100) AS BIGINT) AS v100 FROM events
           |), pct AS (
           |  SELECT event_type, quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
           |  FROM src GROUP BY 1
           |), j AS (
           |  SELECT s.event_type, s.value, s.v100, p.lo, p.hi
           |  FROM src s JOIN pct p USING (event_type)
           |), g AS (
           |  SELECT event_type, COUNT(*) AS n, min(lo) AS lo, min(hi) AS hi,
           |    CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
           |    CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
           |    CAST(SUM(CASE WHEN value >= lo AND value <= hi THEN v100 ELSE 0 END) AS BIGINT) AS mid100
           |  FROM j GROUP BY 1
           |)
           |SELECT event_type, CAST(n AS BIGINT) AS n, lo, hi, n_lo, n_hi,
           |  (CAST(mid100 AS DOUBLE) / 100.0 + n_lo * lo + n_hi * hi) / n AS winsor_mean
           |FROM g ORDER BY event_type""".stripMargin)) { t =>
    // Winsorized (outlier-clipped) mean per group — the robust location
    // estimate a monitoring layer wants when a feed glitch injects
    // extremes the plain mean would follow. Exact two-pass plan: pass 1
    // computes the exact interpolated p05/p95 fences per group (a
    // group-sized table), which broadcast back onto the fact scan of
    // pass 2 — the clip never shuffles the fact. Determinism: the
    // fences are the bitwise-matched interpolated percentiles (q77),
    // interior values accumulate as integer cents, and the winsorized
    // mean is assembled in ONE fixed double expression from those exact
    // components — clipped tails contribute n_tail * fence, not a
    // float sum over reordered doubles.
    val src = t.events.select(col("event_type"), col("value"),
      round(col("value") * 100).cast("long").as("v100"))
    val pct = src.groupBy("event_type").agg(
      expr("percentile(value, 0.05D)").as("lo"),
      expr("percentile(value, 0.95D)").as("hi"))
    src.join(broadcast(pct), "event_type")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("value") >= col("lo") && col("value") <= col("hi"), col("v100"))
          .otherwise(0L)).as("mid100"))
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        col("n_lo"), col("n_hi"),
        ((col("mid100").cast("double") / 100.0 + col("n_lo") * col("lo") + col("n_hi") * col("hi"))
          / col("n")).as("winsor_mean"))
      .orderBy("event_type")
  }

  val q99 = QueryDef(
    "q99_rolling_window",
    Some("""WITH daily AS (
           |  SELECT user_id, CAST(ts AS DATE) AS d,
           |    SUM(CAST(value AS DECIMAL(18,2))) AS day_spend, COUNT(*) AS day_n
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
           |x AS (SELECT user_id, d, datediff('day', DATE '2024-01-01', d) AS dn, day_spend, day_n
           |      FROM daily),
           |r AS (SELECT user_id, d,
           |  CAST(SUM(day_spend) OVER w AS DOUBLE) AS spend_7d,
           |  CAST(SUM(day_n) OVER w AS BIGINT) AS n_7d
           |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY dn
           |                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
           |SELECT user_id, d, spend_7d, n_7d,
           |  spend_7d / CAST(n_7d AS DOUBLE) AS avg_7d
           |FROM r ORDER BY user_id, d""".stripMargin)) { t =>
    // Trailing 7-day rolling spend per user — the moving-average face of
    // the monitoring layer. Two-level plan: an exact daily pre-aggregate
    // (decimal sums — partial-aggregated, one shuffle row per (user,
    // day)) and a RANGE frame over the integer day ordinal on the
    // pre-aggregate, so the window slides over at most 31 rows per user,
    // not the raw fact. Decimal window sums keep the rolling total
    // order-invariant; the average is one double division at the end.
    import org.apache.spark.sql.expressions.Window
    val daily = t.events.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("day_spend"),
        count(lit(1)).as("day_n"))
      .withColumn("dn", datediff(col("d"), lit("2024-01-01").cast("date")))
    val w = Window.partitionBy("user_id").orderBy("dn").rangeBetween(-6, 0)
    daily.select(col("user_id"), col("d"),
        sum(col("day_spend")).over(w).cast("double").as("spend_7d"),
        sum(col("day_n")).over(w).cast("long").as("n_7d"))
      .withColumn("avg_7d", col("spend_7d") / col("n_7d").cast("double"))
      .orderBy("user_id", "d")
  }

  /** Fixed event-type vocabulary — literal on both engines so the
    * per-type entropy terms sum in one fixed order (the q91 move).
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val q100 = QueryDef(
    "q100_entropy_profile", {
      import graft.functions.DetMath
      val cCols = EventTypes.map(tp =>
        s"CAST(SUM(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS BIGINT) AS c_$tp")
        .mkString(",\n        ")
      val terms = EventTypes.map { tp =>
        s"CASE WHEN c_$tp > 0 THEN CAST(c_$tp AS DOUBLE) * ${DetMath.detLnSql(s"CAST(c_$tp AS DOUBLE)")} ELSE 0.0 END"
      }.reduceLeft((a, b) => s"($a + $b)")
      val nTypes = EventTypes.map(tp => s"CASE WHEN c_$tp > 0 THEN 1 ELSE 0 END")
        .reduceLeft((a, b) => s"($a + $b)")
      Some(s"""WITH g AS (
              |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
              |        $cCols
              |  FROM events GROUP BY 1)
              |SELECT user_id, n, $nTypes AS n_types,
              |  ${DetMath.detLnSql("CAST(n AS DOUBLE)")} - ($terms) / CAST(n AS DOUBLE) AS entropy
              |FROM g ORDER BY user_id""".stripMargin)
    }) { t =>
    // Per-user Shannon entropy of the event-type mix — the behavioral-
    // diversity profile a monitoring layer reads next to q77's moments.
    // H = ln(n) − (Σ c·ln c)/n over the five known event types, every
    // ln a DetMath.detLn (bitwise-reproducible arithmetic, see q91) and
    // the Σ a conditional-aggregation sum in literal vocabulary order —
    // one partial-aggregated scan, no collected value lists, no
    // order-sensitive double accumulation.
    import graft.functions.DetMath
    val cAggs = EventTypes.map(tp =>
      sum(when(col("event_type") === tp, 1L).otherwise(0L)).as(s"c_$tp"))
    val allAggs = count(lit(1)).as("n") +: cAggs
    val g = t.events.groupBy("user_id").agg(allAggs.head, allAggs.tail: _*)
    val terms = EventTypes.map { tp =>
      val c = col(s"c_$tp")
      when(c > 0, c.cast("double") * DetMath.detLn(c.cast("double"))).otherwise(0.0)
    }.reduceLeft(_ + _)
    val nTypes = EventTypes.map(tp => when(col(s"c_$tp") > 0, 1).otherwise(0)).reduceLeft(_ + _)
    g.select(col("user_id"), col("n"), nTypes.as("n_types"),
        (DetMath.detLn(col("n").cast("double")) - terms / col("n").cast("double")).as("entropy"))
      .orderBy("user_id")
  }

  val q103 = QueryDef(
    "q103_chi2_contingency",
    Some("""WITH cell AS (
           |  SELECT event_type, dayofweek(CAST(ts AS DATE)) + 1 AS dow,
           |         CAST(COUNT(*) AS BIGINT) AS observed
           |  FROM events GROUP BY 1, 2),
           |rt AS (SELECT event_type, CAST(SUM(observed) AS BIGINT) AS rt FROM cell GROUP BY 1),
           |ct AS (SELECT dow, CAST(SUM(observed) AS BIGINT) AS ct FROM cell GROUP BY 1),
           |tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cell)
           |SELECT c.event_type, c.dow, c.observed,
           |  CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
           |  ((CAST(observed AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
           |   * (CAST(observed AS DOUBLE) - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)))
           |  / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS cell_chi2
           |FROM cell c JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot
           |ORDER BY 1, 2""".stripMargin)) { t =>
    // Independence screening: the event_type × weekday contingency
    // table with per-cell chi-square deviation terms — which (type,
    // day) cells drive a drift alert, next to q77's moments and q100's
    // entropy. Everything derives from exact integer counts through
    // fixed-order rational arithmetic (no transcendentals needed);
    // marginals and the grand total broadcast onto the 35-cell table,
    // so the plan is one partial-aggregated fact scan plus tiny-side
    // joins at any scale.
    val cell = t.events
      .select(col("event_type"), dayofweek(col("ts").cast("date")).as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("observed"))
    val rt = cell.groupBy("event_type").agg(sum("observed").as("rt"))
    val ct = cell.groupBy("dow").agg(sum("observed").as("ct"))
    val tot = cell.agg(sum("observed").as("n"))
    val expected = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
    val dev = col("observed").cast("double") - expected
    cell.join(broadcast(rt), "event_type").join(broadcast(ct), "dow")
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("dow"), col("observed"),
        expected.as("expected"), ((dev * dev) / expected).as("cell_chi2"))
      .orderBy("event_type", "dow")
  }

  val q105 = QueryDef(
    "q105_user_accounting",
    Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
           |active AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS active_users FROM ud GROUP BY 1),
           |fs AS (SELECT user_id, MIN(d) AS d FROM ud GROUP BY 1),
           |news AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users FROM fs GROUP BY 1),
           |j AS (SELECT a.d, a.active_users, coalesce(n.new_users, 0) AS new_users
           |      FROM active a LEFT JOIN news n ON a.d = n.d)
           |SELECT d, active_users, new_users,
           |  CAST(SUM(new_users) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
           |FROM j ORDER BY d""".stripMargin)) { t =>
    // Daily audience accounting: active users, NEW users (first-seen
    // that day), and the running cumulative distinct-user count — the
    // growth view that naively plans as a per-day COUNT(DISTINCT ...
    // WHERE ts <= day) rescan per row. Instead: one distinct pass on
    // (user, day), a min-per-user first-seen aggregate (both
    // partial-aggregated fact-side), and the cumulative sum runs over
    // the DAY-count table — ~30 rows, so the single-partition global
    // window is free; the heavy lifting never leaves the partial
    // aggregates.
    import org.apache.spark.sql.expressions.Window
    val ud = t.events.select(col("user_id"), col("ts").cast("date").as("d")).distinct()
    val active = ud.groupBy("d").agg(count(lit(1)).as("active_users"))
    val first = ud.groupBy("user_id").agg(min(col("d")).as("d"))
    val news = first.groupBy("d").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(news, Seq("d"), "left")
      .select(col("d"), col("active_users"), coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w).cast("long"))
      .orderBy("d")
  }

  val q108 = QueryDef(
    "q108_mergeable_histogram", {
      def pick(q: String, alias: String) =
        s"""(SELECT event_type,
           |   CAST(CAST(1 AS BIGINT) << bucket AS DOUBLE)
           |     + (($q * CAST(n AS DOUBLE) - CAST(cum_before AS DOUBLE)) / CAST(c AS DOUBLE))
           |       * CAST(CAST(1 AS BIGINT) << bucket AS DOUBLE) AS $alias
           | FROM (SELECT event_type, bucket, c, cum - c AS cum_before, n,
           |         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
           |       FROM w WHERE CAST(cum AS DOUBLE) >= $q * CAST(n AS DOUBLE))
           | WHERE rn = 1)""".stripMargin
      Some(s"""WITH hist AS (
              |  SELECT event_type,
              |    length(bin(CAST(floor(value) AS BIGINT) + 1)) - 1 AS bucket,
              |    CAST(COUNT(*) AS BIGINT) AS c
              |  FROM events GROUP BY 1, 2),
              |w AS (
              |  SELECT event_type, bucket, c,
              |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bucket
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
              |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
              |  FROM hist),
              |tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1)
              |SELECT t.event_type, t.n, p50.p50_est, p90.p90_est
              |FROM tot t
              |JOIN ${pick("0.5", "p50_est")} p50 ON t.event_type = p50.event_type
              |JOIN ${pick("0.9", "p90_est")} p90 ON t.event_type = p90.event_type
              |ORDER BY 1""".stripMargin)
    }) { t =>
    // Mergeable quantile states — the distribution complement of q86's
    // KMV: the state is an integer log2-bucket histogram, whose merge
    // is plain count addition, so incremental rollups never re-read
    // history. PROOF BY ORACLE (the q107 move): the engine computes the
    // state from two disjoint half-month increments and MERGES them;
    // the oracle computes it from the full table in one pass — bitwise
    // equality of the interpolated p50/p90 estimates proves
    // merge == recompute. All arithmetic is exact integers until the
    // final fixed-order interpolation.
    import org.apache.spark.sql.expressions.Window
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    def state(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        (length(bin(floor(col("value")).cast("long") + 1)) - 1).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
    // two increments, merged by re-aggregation — the mergeable-state path
    val merged = state(t.events.where(col("ts") < cut))
      .unionByName(state(t.events.where(col("ts") >= cut)))
      .groupBy("event_type", "bucket").agg(sum("c").as("c"))
    val w = merged
      .withColumn("cum", sum(col("c")).over(Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")).cast("long"))
    def pick(q: Double, alias: String) = {
      val lower = call_function("shiftleft", lit(1L), col("bucket")).cast("double")
      w.where(col("cum").cast("double") >= lit(q) * col("n").cast("double"))
        .withColumn("rn", row_number().over(Window.partitionBy("event_type").orderBy("bucket")))
        .where(col("rn") === 1)
        .select(col("event_type"),
          (lower + ((lit(q) * col("n").cast("double") - (col("cum") - col("c")).cast("double")) /
            col("c").cast("double")) * lower).as(alias))
    }
    val tot = merged.groupBy("event_type").agg(sum("c").cast("long").as("n"))
    tot.join(pick(0.5, "p50_est"), "event_type")
      .join(pick(0.9, "p90_est"), "event_type")
      .select("event_type", "n", "p50_est", "p90_est")
      .orderBy("event_type")
  }

  override def queries: Seq[QueryDef] = Seq(q77, q78, q82, q99, q100, q103, q105, q108)
}
