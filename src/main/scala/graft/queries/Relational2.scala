package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.BandJoin

/** Joins, set ops, reshape and scalar/date batteries — SURVEY.md §2.4,
  * §2.7-§2.8, §2.10-§2.12 over the testdata.
  */
object Relational2 extends QueryPack {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def dia(ts: Column): Column = date_trunc("day", ts)

  val q06 = QueryDef(
    "q06_vip_band_join",
    Some(s"""WITH tot AS (
            |  SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS total FROM events GROUP BY user_id
            |)
            |SELECT vip, COUNT(*) AS users, CAST(SUM(total) AS DOUBLE) AS minutes
            |FROM tot JOIN ${Dims.vipsSql} ON coalesce(total, 0) >= vip
            |GROUP BY vip ORDER BY vip""".stripMargin)) { t =>
    // J4: theta join on threshold — VIP banding `IFNULL(minutes,0) >= vip`
    // (reference audio_digital.py:395-396). Broadcast BNLJ vs a 5-row dim
    // is the optimal plan at any fact scale.
    val tot = t.events.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
    BandJoin.thresholdBands(tot, Dims.vips(t.spark), col("total"), col("vip"))
      .groupBy("vip")
      .agg(count(lit(1)).as("users"), sum(col("total")).cast("double").as("minutes"))
      .orderBy("vip")
  }

  val q07 = QueryDef(
    "q07_spine_zero_fill",
    Some("""WITH spine AS (
           |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
           |           TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS p_day
           |), tipos AS (SELECT DISTINCT event_type FROM events),
           |counts AS (
           |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS p_day, event_type,
           |         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS mins
           |  FROM events GROUP BY 1, 2
           |)
           |SELECT s.p_day, t.event_type,
           |       coalesce(n, 0) AS n,
           |       CAST(coalesce(mins, 0) AS DOUBLE) AS minutes
           |FROM spine s CROSS JOIN tipos t
           |LEFT JOIN counts c ON c.p_day = s.p_day AND c.event_type = t.event_type
           |ORDER BY s.p_day, t.event_type""".stripMargin)) { t =>
    // J6 cross join (calendar × dims) + J9 spine left-join with zero fill
    // (reference indicadores_cia.py:637-638; ApiFeriados nb:112-118).
    val spine = t.spark.range(1).select(
      explode(sequence(
        lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-01-31 00:00:00").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("p_day"))
    val tipos = t.events.select("event_type").distinct()
    val counts = t.events.groupBy(dia(col("ts")).as("p_day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("mins"))
    spine.crossJoin(broadcast(tipos))
      .join(counts, Seq("p_day", "event_type"), "left")
      .select(col("p_day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("mins"), lit(0)).cast("double").as("minutes"))
      .orderBy("p_day", "event_type")
  }

  val q08 = QueryDef(
    "q08_self_join_superposition",
    Some("""WITH ud AS (
           |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS dia, event_type
           |  FROM events
           |)
           |SELECT a.event_type AS tipo_a, b.event_type AS tipo_b,
           |       COUNT(*) AS pares, COUNT(DISTINCT a.user_id) AS users
           |FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.dia = b.dia
           |  AND a.event_type < b.event_type
           |GROUP BY tipo_a, tipo_b ORDER BY tipo_a, tipo_b""".stripMargin)) { t =>
    // J7: audience-superposition self-join — same user+day, distinct
    // content pair (reference Complex_user_superposition nbs:98-101).
    val ud = t.events
      .select(col("user_id"), dia(col("ts")).as("dia"), col("event_type")).distinct()
    val a = ud.as("a"); val b = ud.as("b")
    a.join(b,
        col("a.user_id") === col("b.user_id") && col("a.dia") === col("b.dia") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("tipo_a"), col("b.event_type").as("tipo_b"))
      .agg(count(lit(1)).as("pares"), countDistinct(col("a.user_id")).as("users"))
      .orderBy("tipo_a", "tipo_b")
  }

  val q09 = QueryDef(
    "q09_anti_join",
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           |                  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
           |ORDER BY c_custkey""".stripMargin)) { t =>
    // J8: left anti join — "ids missing from the catalog" sentinel shape
    // (reference email_nulos.py:27-34 writes it as LEFT JOIN + IS NULL;
    // Spark has the join type natively): customers inactive since 1998.
    t.customer.join(
        t.orders.where(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  val q10 = QueryDef(
    "q10_semi_join",
    Some("""SELECT c_custkey, c_mktsegment FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
           |ORDER BY c_custkey""".stripMargin)) { t =>
    // Semi join (IN-subquery shape, SURVEY.md §2.4 note).
    t.customer.join(
        t.orders.where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
  }

  val q11 = QueryDef(
    "q11_union_branches",
    Some("""SELECT 'diario' AS periodo, CAST(date_trunc('day', ts) AS TIMESTAMP) AS p_start,
           |       event_type, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS minutes,
           |       COUNT(DISTINCT user_id) AS users
           |FROM events GROUP BY 2, 3
           |UNION ALL
           |SELECT 'mensual', CAST(date_trunc('month', ts) AS TIMESTAMP), event_type,
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), COUNT(DISTINCT user_id)
           |FROM events GROUP BY 2, 3
           |UNION ALL
           |SELECT 'diario_total', CAST(date_trunc('day', ts) AS TIMESTAMP), 'ALL',
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), COUNT(DISTINCT user_id)
           |FROM events GROUP BY 2
           |ORDER BY periodo, p_start, event_type""".stripMargin)) { t =>
    // U1: multi-branch UNION ALL of differently-derived aggregates — the
    // shape of the reference's heaviest query (consumo_bloques_hora.py:
    // 102-245, 5-6 branches; here 3). Parameterized periodo reruns
    // collapse into one plan.
    def branch(periodo: String, bucket: Column, tipo: Column) =
      t.events.groupBy(bucket.as("p_start"), tipo.as("event_type"))
        .agg(dsum(col("value")).as("minutes"), countDistinct(col("user_id")).as("users"))
        .select(lit(periodo).as("periodo"), col("p_start"), col("event_type"),
          col("minutes"), col("users"))
    branch("diario", dia(col("ts")), col("event_type"))
      .unionByName(branch("mensual", date_trunc("month", col("ts")), col("event_type")))
      .unionByName(branch("diario_total", dia(col("ts")), lit("ALL")))
      .orderBy("periodo", "p_start", "event_type")
  }

  val q12 = QueryDef(
    "q12_distinct",
    Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
           |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)) { t =>
    // A8: DISTINCT projection (reference q_registrados_.py:81).
    t.orders.select("o_orderstatus", "o_orderpriority").distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  val q13 = QueryDef(
    "q13_count_distinct",
    Some("""SELECT event_type,
           |  COUNT(DISTINCT user_id) AS users,
           |  COUNT(DISTINCT md5(CAST(user_id AS VARCHAR) || ':' || props)) AS devices
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) { t =>
    // A2/A3: exact COUNT(DISTINCT) incl. the md5 device-fingerprint shape
    // `count(distinct concat(ip, ua))` (reference audio_digital.py:391,
    // consumo_bloques_hora.py:106). Two-phase hash agg via Catalyst.
    t.events.groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("users"),
        countDistinct(md5(concat(col("user_id").cast("string"), lit(":"), col("props")))).as("devices"))
      .orderBy("event_type")
  }

  val q14 = QueryDef(
    "q14_conditional_agg",
    Some("""SELECT user_id,
           |  CAST(coalesce(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS compras,
           |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
           |  CASE WHEN COUNT(CASE WHEN event_type = 'click' THEN 1 END) > 0
           |       THEN CAST(coalesce(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE)
           |            / COUNT(CASE WHEN event_type = 'click' THEN 1 END)
           |       ELSE 0 END AS ratio
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)) { t =>
    // A11 conditional aggregation + A7 CASE-guarded division (reference
    // email_catalogo.py:71-97; indicadores_cia.py:152-159).
    val compras = coalesce(
      sum(when(col("event_type") === "purchase", col("value").cast("decimal(18,2)"))), lit(0))
      .cast("double")
    val clicks = count(when(col("event_type") === "click", lit(1)))
    t.events.groupBy("user_id")
      .agg(compras.as("compras"), clicks.as("clicks"))
      .withColumn("ratio",
        when(col("clicks") > 0, col("compras") / col("clicks")).otherwise(lit(0.0)))
      .orderBy("user_id")
  }

  val q15 = QueryDef(
    "q15_pivot",
    Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dia,
           |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
           |FROM events GROUP BY dia ORDER BY dia""".stripMargin)) { t =>
    // R2/R3/J12: pivot — one groupBy().pivot() replaces the reference's
    // chained filter-rename-merge pivots (indicadores_cia.py:565-577,
    // 670-714). Explicit value list keeps the plan single-pass.
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = t.events.groupBy(dia(col("ts")).as("dia"))
      .pivot("event_type", types).agg(count(lit(1)))
    p.select(col("dia") +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy("dia")
  }

  val q16 = QueryDef(
    "q16_unpivot",
    Some("""WITH agg AS (
           |  SELECT l_returnflag,
           |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           |    CAST(SUM(CAST(l_discount AS DECIMAL(12,6))) AS DOUBLE) AS sum_disc
           |  FROM lineitem GROUP BY l_returnflag
           |)
           |SELECT l_returnflag, metric, value FROM (
           |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
           |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM agg
           |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
           |) ORDER BY l_returnflag, metric""".stripMargin)) { t =>
    // R1: melt / unpivot (reference trafico_digital.py:282-283 pd.melt) —
    // Spark 3.4+ native unpivot.
    val agg = t.lineitem.groupBy("l_returnflag").agg(
      dsum(col("l_quantity")).as("sum_qty"),
      dsum(col("l_extendedprice")).as("sum_price"),
      sum(col("l_discount").cast("decimal(12,6)")).cast("double").as("sum_disc"))
    agg.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  val q17 = QueryDef(
    "q17_merge_latest_by_id",
    Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
           |  SELECT o_custkey, o_orderkey, o_orderdate,
           |         row_number() OVER (PARTITION BY o_custkey
           |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           |  FROM orders
           |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin)) { t =>
    // K3's dedup-by-id semantics as a window (SURVEY.md §2.6: the one
    // place Window is warranted — latest row per id).
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t.orders.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }

  val q18 = QueryDef(
    "q18_scalar_functions",
    Some("""SELECT c_custkey,
           |  lower(c_name) AS nombre_lower,
           |  list_aggregate(list_transform(string_split(lower(c_mktsegment), ' '),
           |    w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS segmento,
           |  md5(c_name) AS huella,
           |  substr(c_name, 1, 10) AS prefijo,
           |  regexp_replace(c_name, '[^0-9A-Za-z]', '', 'g') AS alfanum,
           |  c_mktsegment || '_' || CAST(c_custkey AS VARCHAR) AS id_sintetico,
           |  len(string_split(c_name, '#')) AS partes,
           |  greatest(c_acctbal, 0) AS saldo_pos,
           |  least(c_acctbal, 0) AS saldo_neg,
           |  sign(c_acctbal) * floor(abs(c_acctbal) * 10) / 10 AS saldo_trunc1,
           |  round(c_acctbal, 0) AS saldo_round,
           |  abs(c_acctbal) AS saldo_abs
           |FROM customer ORDER BY c_custkey""".stripMargin)) { t =>
    // §2.11 string/math battery: LOWER/INITCAP/MD5/SUBSTRING/
    // regexp_replace/concat id-synthesis/split/LEAST/GREATEST/ROUND/ABS
    // and BigQuery TRUNC(x,1) round-toward-zero semantics (reference
    // consumo_bloques_hora.py:106,135; audio_digital.py:245-255).
    t.customer.select(
        col("c_custkey"),
        lower(col("c_name")).as("nombre_lower"),
        initcap(lower(col("c_mktsegment"))).as("segmento"),
        md5(col("c_name")).as("huella"),
        substring(col("c_name"), 1, 10).as("prefijo"),
        regexp_replace(col("c_name"), "[^0-9A-Za-z]", "").as("alfanum"),
        concat(col("c_mktsegment"), lit("_"), col("c_custkey").cast("string")).as("id_sintetico"),
        size(split(col("c_name"), "#")).cast("long").as("partes"),
        greatest(col("c_acctbal"), lit(0)).as("saldo_pos"),
        least(col("c_acctbal"), lit(0)).as("saldo_neg"),
        graft.functions.TimeFns.truncTowardZero(col("c_acctbal"), 1).as("saldo_trunc1"),
        round(col("c_acctbal"), 0).as("saldo_round"),
        abs(col("c_acctbal")).as("saldo_abs"))
      .orderBy("c_custkey")
  }

  val q19 = QueryDef(
    "q19_date_functions",
    Some("""SELECT DISTINCT o_orderdate AS fecha,
           |  year(o_orderdate) AS anio, month(o_orderdate) AS mes_num,
           |  day(o_orderdate) AS dia_mes,
           |  dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
           |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mes_inicio,
           |  last_day(CAST(o_orderdate AS DATE)) AS fin_mes,
           |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dias_desde,
           |  strftime(o_orderdate, '%Y-%m') AS anio_mes,
           |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS mas_un_mes
           |FROM orders ORDER BY fecha""".stripMargin)) { t =>
    // §2.11 date battery: EXTRACT family, month trunc, last_day,
    // DATE_DIFF, strftime-style render, interval arithmetic (reference
    // programas_live.py:408-425; email_catalogo.py:37-42;
    // indicadores_cia.py:59-67). Spark dayofweek is 1=Sunday; DuckDB's is
    // 0=Sunday, hence the +1 on the oracle side.
    t.orders.select(
        col("o_orderdate").as("fecha"),
        year(col("o_orderdate")).as("anio"),
        month(col("o_orderdate")).as("mes_num"),
        dayofmonth(col("o_orderdate")).as("dia_mes"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("mes_inicio"),
        last_day(col("o_orderdate")).as("fin_mes"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("dias_desde"),
        date_format(col("o_orderdate"), "yyyy-MM").as("anio_mes"),
        add_months(col("o_orderdate"), 1).as("mas_un_mes"))
      .distinct()
      .orderBy("fecha")
  }

  val q20 = QueryDef(
    "q20_many_key_group",
    Some("""SELECT n_name, c_mktsegment, o_orderstatus, o_orderpriority,
           |  l_returnflag, l_linestatus, year(o_orderdate) AS anio,
           |  quarter(o_orderdate) AS trimestre,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS ventas,
           |  COUNT(*) AS n
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY ALL ORDER BY ALL""".stripMargin)) { t =>
    // A4: many-key GROUP BY (the reference groups on up to ~18 columns,
    // consumo_bloques_hora.py:143-144,191-194).
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"), col("o_orderstatus"),
        col("o_orderpriority"), col("l_returnflag"), col("l_linestatus"),
        year(col("o_orderdate")).as("anio"), quarter(col("o_orderdate")).as("trimestre"))
      .agg(dsum(col("l_extendedprice")).as("ventas"), count(lit(1)).as("n"))
      .orderBy("n_name", "c_mktsegment", "o_orderstatus", "o_orderpriority",
        "l_returnflag", "l_linestatus", "anio", "trimestre")
  }

  val q21 = QueryDef(
    "q21_generate_array_spine",
    Some(s"""WITH dias_mes AS (
            |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
            |           TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS fecha
            |)
            |SELECT programa, COUNT(*) AS dias_emision, min(fecha) AS primera, max(fecha) AS ultima
            |FROM dias_mes JOIN ${Dims.programasSql}
            |  ON list_contains(dias, dayofweek(CAST(fecha AS DATE)) + 1)
            |GROUP BY programa ORDER BY programa""".stripMargin)) { t =>
    // G2/G4: GENERATE_DATE_ARRAY + UNNEST × programs filtered by weekday ∈
    // program.dias (reference Complex_user_superposition_by_program_etl
    // .ipynb:44-52) → sequence/explode + array_contains.
    val dias = t.spark.range(1).select(
      explode(sequence(
        lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-01-31 00:00:00").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("fecha"))
    dias.join(broadcast(Dims.programas(t.spark)),
        array_contains(col("dias"), dayofweek(col("fecha")).cast("long")))
      .groupBy("programa")
      .agg(count(lit(1)).as("dias_emision"), min(col("fecha")).as("primera"), max(col("fecha")).as("ultima"))
      .orderBy("programa")
  }

  val q92 = QueryDef(
    "q92_bloom_pruned_join",
    Some("""SELECT p_type,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE p_brand = 'Brand#23'
           |GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // Runtime-filter join, the explicit deterministic form: a bloom
    // filter built from the selective dim side (Brand#23 parts) prunes
    // the fact BEFORE its exchange — at 100 TB the fact shuffle carries
    // only plausibly-matching rows (~3% here), and the join itself
    // removes the filter's false positives, so the oracle is simply the
    // plain join. The filter is pure codegen'd bit math on a plan
    // literal (operators.Bloom); BloomSpec pins no-false-negatives and
    // the actual prune rate.
    val dim = t.part.where(col("p_brand") === "Brand#23").select("p_partkey", "p_type")
    // revenue arithmetic entirely in decimal space: both factors are
    // 2-decimal quantities, so the casts are exact and the product/sum
    // never round — a decimal cast of the double PRODUCT would hit
    // engine-specific rounding at the cents boundary.
    val fact = t.lineitem.select(col("l_partkey").as("p_partkey"),
      (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).as("rev"))
    graft.operators.Bloom.prunedJoin(fact, dim, "p_partkey")
      .groupBy("p_type")
      .agg(sum(col("rev")).cast("double").as("revenue"), count(lit(1)).as("n"))
      .orderBy("p_type")
  }

  val q111 = QueryDef(
    "q111_cube_grouping",
    Some("""SELECT
           |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           |  l_returnflag, l_linestatus,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
           |FROM lineitem
           |GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY 1, 2, 3""".stripMargin)) { t =>
    // CUBE with grouping_id — every subtotal grain of the two-flag
    // matrix in ONE pass (Catalyst's Expand feeds a single two-phase
    // aggregate: grains × groups rows into the exchange, never one job
    // per grain). grouping_id disambiguates a rolled-up NULL from a
    // data NULL; Spark's bit order (first column = high bit) matches
    // GROUPING(a)*2 + GROUPING(b).
    t.lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"), col("n"), col("qty"))
      .orderBy("gid", "l_returnflag", "l_linestatus")
  }

  override def queries: Seq[QueryDef] = Seq(
    q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q92, q111)
}
