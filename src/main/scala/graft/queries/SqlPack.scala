package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.BandJoin

/** SQL-front-end + banding coverage: the reference's heaviest query is a
  * ~140-line SQL text with CTEs and 5-6 UNION ALL branches
  * (consumo_bloques_hora.py:102-245) — q42 runs that shape through
  * `spark.sql` over temp views (S3: the engine's SQL surface), q43
  * covers the age-banding range join (J5) + brand-validity clamp (P9).
  */
object SqlPack extends QueryPack {

  val q42 = QueryDef(
    "q42_sql_multibranch",
    Some("""WITH consumo AS (
           |  SELECT ts, user_id, event_type, value,
           |         md5(CAST(user_id AS VARCHAR) || ':' || props) AS device_id
           |  FROM events WHERE user_id IS NOT NULL
           |), periodos AS (
           |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
           |           TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS p_start
           |)
           |SELECT 'por_tipo' AS rama, p.p_start, c.event_type,
           |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS minutes,
           |       COUNT(DISTINCT c.device_id) AS devices
           |FROM consumo c JOIN periodos p
           |  ON c.ts >= p.p_start AND c.ts < p.p_start + INTERVAL 1 DAY
           |GROUP BY 2, 3
           |UNION ALL
           |SELECT 'total', p.p_start, 'ALL',
           |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE),
           |       COUNT(DISTINCT c.device_id)
           |FROM consumo c JOIN periodos p
           |  ON c.ts >= p.p_start AND c.ts < p.p_start + INTERVAL 1 DAY
           |GROUP BY 2
           |ORDER BY rama, p_start, event_type""".stripMargin)) { t =>
    // The engine's SQL surface: CTE + device-id synthesis + period join
    // + two UNION ALL branches, all as one spark.sql text (the
    // reference ships this exact shape to BigQuery; here Catalyst plans
    // it natively). Views registered per-call are idempotent.
    t.events.createOrReplaceTempView("v_events")
    t.spark.sql(
      """WITH consumo AS (
        |  SELECT ts, user_id, event_type, value,
        |         md5(CAST(user_id AS STRING) || ':' || props) AS device_id
        |  FROM v_events WHERE user_id IS NOT NULL
        |), periodos AS (
        |  SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
        |           TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS p_start
        |)
        |SELECT 'por_tipo' AS rama, p.p_start, c.event_type,
        |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS minutes,
        |       COUNT(DISTINCT c.device_id) AS devices
        |FROM consumo c JOIN periodos p
        |  ON c.ts >= p.p_start AND c.ts < p.p_start + INTERVAL 1 DAY
        |GROUP BY 2, 3
        |UNION ALL
        |SELECT 'total', p.p_start, 'ALL',
        |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE),
        |       COUNT(DISTINCT c.device_id)
        |FROM consumo c JOIN periodos p
        |  ON c.ts >= p.p_start AND c.ts < p.p_start + INTERVAL 1 DAY
        |GROUP BY 2
        |ORDER BY rama, p_start, event_type""".stripMargin)
  }

  val q43 = QueryDef(
    "q43_range_band_validity",
    Some(s"""WITH tramos (tramo, lo, hi) AS (VALUES
            |  ('bajo', 0.0, 9.99), ('medio', 10.0, 24.99), ('alto', 25.0, 1e9)
            |), validez (event_type, desde, hasta) AS (VALUES
            |  ('click',    TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-20 00:00:00'),
            |  ('view',     TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00'),
            |  ('purchase', TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-15 00:00:00')
            |)
            |SELECT t.tramo, e.event_type, COUNT(*) AS n,
            |       COUNT(DISTINCT e.user_id) AS users
            |FROM events e
            |JOIN validez v ON e.event_type = v.event_type
            |              AND e.ts >= v.desde AND e.ts < v.hasta
            |JOIN tramos t ON e.value >= t.lo AND e.value <= t.hi
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // J5 range banding (age→tramo shape, superposition nb:190-196) +
    // P9 brand-validity window clamp (mapa_consumo.py:138-150): both
    // dims broadcast, fact streams once.
    import t.spark.implicits._
    val tramos = Seq(("bajo", 0.0, 9.99), ("medio", 10.0, 24.99), ("alto", 25.0, 1e9))
      .toDF("tramo", "lo", "hi")
    val validez = Seq(
      ("click", "2024-01-05 00:00:00", "2024-01-20 00:00:00"),
      ("view", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
      ("purchase", "2024-01-10 00:00:00", "2024-01-15 00:00:00"))
      .toDF("event_type", "desde", "hasta")
      .select(col("event_type"), col("desde").cast("timestamp"), col("hasta").cast("timestamp"))
    val clamped = t.events.join(broadcast(validez), Seq("event_type"))
      .where(col("ts") >= col("desde") && col("ts") < col("hasta"))
    BandJoin.rangeBand(clamped, tramos, col("value"), col("lo"), col("hi"))
      .groupBy("tramo", "event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .orderBy("tramo", "event_type")
  }

  val q112 = QueryDef(
    "q112_correlated_subquery",
    Some("""SELECT c_custkey, c_nationkey,
           |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
           |FROM customer c
           |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
           |      (SELECT COUNT(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
           |    > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3
           |       WHERE c3.c_nationkey = c.c_nationkey)
           |ORDER BY c_custkey""".stripMargin)) { t =>
    // Correlated scalar subqueries through the SQL front end — customers
    // above their nation's average balance, the classic decorrelation
    // shape. Catalyst rewrites both correlated scalars into ONE grouped
    // aggregate joined back on the correlation key (the BigQuery habit
    // of re-running the inner query per row never happens). The
    // above-average predicate cross-multiplies instead of dividing —
    // balance × count > sum stays exact in decimal, where comparing
    // against a rounded decimal AVERAGE would put the two engines on
    // different sides of an exact tie.
    t.customer.createOrReplaceTempView("v_customer")
    t.spark.sql(
      """SELECT c_custkey, c_nationkey,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM v_customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM v_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM v_customer c3
        |       WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q113 = QueryDef(
    "q113_lateral_topn",
    Some("""SELECT n.n_nationkey, n.n_name, t.c_custkey, t.acctbal
           |FROM nation n, LATERAL (
           |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
           |  FROM customer c
           |  WHERE c.c_nationkey = n.n_nationkey
           |  ORDER BY acctbal DESC, c_custkey
           |  LIMIT 2) t
           |ORDER BY n.n_nationkey, t.acctbal DESC, t.c_custkey""".stripMargin)) { t =>
    // LATERAL correlated subquery — per-nation top-2 balances, the
    // top-N-per-group shape written the way an analyst migrating off
    // BigQuery writes it. Catalyst plans the lateral as a join + window
    // (DomainJoin decorrelation), not a per-nation rescan; the ORDER BY
    // inside the lateral carries a full tie-break so LIMIT 2 is
    // deterministic in both engines.
    t.nation.createOrReplaceTempView("v_nation")
    t.customer.createOrReplaceTempView("v_customer")
    t.spark.sql(
      """SELECT n.n_nationkey, n.n_name, t.c_custkey, t.acctbal
        |FROM v_nation n, LATERAL (
        |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |  FROM v_customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY acctbal DESC, c_custkey
        |  LIMIT 2) t
        |ORDER BY n.n_nationkey, t.acctbal DESC, t.c_custkey""".stripMargin)
  }

  val q125 = QueryDef(
    "q125_exists_notexists",
    Some("""SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numlast
           |FROM supplier s JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
           |WHERE EXISTS (SELECT 1 FROM lineitem l2
           |              WHERE l2.l_orderkey = l1.l_orderkey
           |                AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |                  WHERE l3.l_orderkey = l1.l_orderkey
           |                    AND l3.l_shipdate > l1.l_shipdate)
           |GROUP BY 1, 2 ORDER BY numlast DESC, s_suppkey""".stripMargin)) { t =>
    // The TPC-H Q21 join shape — a correlated EXISTS and a correlated
    // NOT EXISTS against the same fact — through the SQL front end:
    // which supplier shipped the FINAL line of each multi-supplier
    // order. Catalyst decorrelates both into one left-semi and one
    // left-anti join on l_orderkey (never a per-row rescan); the
    // NOT EXISTS anti join carries the shipdate inequality as its
    // join condition. Counting lines (not windowing) keeps the plan
    // two joins + one aggregate at any fact scale.
    t.supplier.createOrReplaceTempView("v_supplier")
    t.lineitem.createOrReplaceTempView("v_lineitem")
    t.spark.sql(
      """SELECT s_suppkey, s_name, COUNT(*) AS numlast
        |FROM v_supplier s JOIN v_lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM v_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM v_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_suppkey, s_name ORDER BY numlast DESC, s_suppkey""".stripMargin)
  }

  override def queries: Seq[QueryDef] = Seq(q42, q43, q112, q113, q125)
}
