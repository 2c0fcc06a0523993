package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.TimeFns
import graft.operators.OverlapJoin

/** Core relational operators from SURVEY.md §2.3-§2.5 over the TPC-H-ish
  * testdata. Each query cites the reference operator(s) it re-expresses.
  */
object Relational extends QueryPack {

  /** decimal-exact SUM of a double column, surfaced as DOUBLE. */
  private def dsum(c: Column, dt: String = "decimal(18,2)"): Column =
    sum(c.cast(dt)).cast("double")

  val q01 = QueryDef(
    "q01_pricing_summary",
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS DOUBLE) AS sum_disc_price,
           |  COUNT(*) AS count_order,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
           |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin)) { t =>
    // A1/A4-style grouped sums with date predicate pushed to the scan
    // (reference consumo_bloques_hora.py:131-144 shape on TPC-H columns).
    t.lineitem
      .where(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,6)"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q02 = QueryDef(
    "q02_filter_project",
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_shipdate
           |FROM lineitem
           |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
           |  AND l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 40
           |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { t =>
    // P1-P4: projection + partition-column range + IN-list + numeric band
    // (reference consumo_registrados.py:122-124, audio_digital.py:258-260).
    t.lineitem
      .where(col("l_shipdate").between(
          lit("1995-01-01 00:00:00").cast("timestamp"),
          lit("1996-12-31 00:00:00").cast("timestamp"))
        && col("l_returnflag").isin("A", "R")
        && col("l_quantity").between(10, 40))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q03 = QueryDef(
    "q03_join_revenue",
    Some("""SELECT r_name, n_name,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_orders,
           |  COUNT(DISTINCT o_custkey) AS n_customers
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name
           |ORDER BY r_name, n_name""".stripMargin)) { t =>
    // J1/J2: fact→dim equi-join chain; dims broadcast (reference
    // consumo_bloques_hora.py:139, 184-188).
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("r_name", "n_name")
  }

  val q04 = QueryDef(
    "q04_join_monthly_segment",
    Some("""SELECT c_mktsegment, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mes,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(12,6)))) AS DOUBLE) AS revenue,
           |  COUNT(DISTINCT o_custkey) AS users
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment, date_trunc('month', o_orderdate)
           |ORDER BY c_mktsegment, mes""".stripMargin)) { t =>
    // J1 + A2 + month-bucket derivation (reference J10
    // programas_live.py:408-412: join/group on EXTRACT-derived buckets).
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), date_trunc("month", col("o_orderdate")).as("mes"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,6)"))).cast("double").as("revenue"),
        countDistinct(col("o_custkey")).as("users"))
      .orderBy("c_mktsegment", "mes")
  }

  /** events as intervals: [second-truncated ts, ts + floor(value*60) s).
    * `value` plays "minutes of playback" (consumo_detalle `minutes`).
    */
  private def eventIntervals(t: graft.Tables) =
    t.events.select(
      col("event_type"), col("user_id"),
      date_trunc("second", col("ts")).as("s"),
      expr("timestampadd(SECOND, CAST(floor(value*60) AS BIGINT), date_trunc('second', ts))").as("e"))

  private val overlapOracle =
    """WITH spine AS (
      |  SELECT g AS p_start, g + INTERVAL 1 HOUR AS p_end
      |  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
      |                 TIMESTAMP '2024-01-31 23:00:00', INTERVAL 1 HOUR)) AS g)
      |), ev AS (
      |  SELECT event_type, user_id, date_trunc('second', ts) AS s,
      |         date_trunc('second', ts) + INTERVAL (CAST(floor(value*60) AS BIGINT)) SECOND AS e
      |  FROM events
      |)
      |SELECT p_start, event_type,
      |  SUM(date_diff('second', greatest(s, p_start), least(e, p_end))) / 60.0 AS minutes,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS users
      |FROM ev JOIN spine ON s < p_end AND e >= p_start
      |GROUP BY p_start, event_type
      |ORDER BY p_start, event_type""".stripMargin

  val q05 = QueryDef("q05_overlap_prorated", Some(overlapOracle)) { t =>
    // J3+A1, the workload's signature operator: interval-overlap join to
    // an hourly spine + prorated minutes (reference
    // consumo_bloques_hora.py:135-140). Broadcast plan — the spine is
    // dimension-sized at any fact scale.
    val spine = TimeFns.spine(t.spark, "2024-01-01 00:00:00", "2024-02-01 00:00:00", "1 hour")
    prorate(OverlapJoin.broadcastOverlap(
      eventIntervals(t), spine, col("s"), col("e"), col("p_start"), col("p_end")))
  }

  val q05b = QueryDef("q05b_overlap_bucketed", Some(overlapOracle)) { t =>
    // Same semantics through the bucketed equi-join rewrite — the 100 TB
    // path (SURVEY.md §4.3 v1): shuffle join on day bucket instead of a
    // nested loop, deduplicated by overlap-start bucket.
    val spine = TimeFns.spine(t.spark, "2024-01-01 00:00:00", "2024-02-01 00:00:00", "1 hour")
    prorate(OverlapJoin.bucketedOverlap(
      eventIntervals(t), spine, "s", "e", "p_start", "p_end"))
  }

  private def prorate(joined: org.apache.spark.sql.DataFrame) =
    joined
      .groupBy("p_start", "event_type")
      .agg(
        (sum(TimeFns.overlapSeconds(col("s"), col("e"), col("p_start"), col("p_end"))) / 60.0).as("minutes"),
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("users"))
      .orderBy("p_start", "event_type")

  override def queries: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q05b)
}
