package graft.queries

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{TextFns, TimeFns}
import graft.operators.{Enrich, Multimodal, Writers}

/** Enrichment, multimodal plumbing, timezone semantics and the
  * remaining pandas-idiom operators (SURVEY.md §2.11-§2.12, A6, A10,
  * P6/P10/P11, R5, K3).
  */
object EnrichPack extends QueryPack {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  val q33 = QueryDef(
    "q33_enrich_distinct",
    Some("""WITH parsed AS (
           |  SELECT user_id, CAST(props->>'k' AS BIGINT) AS k FROM events
           |)
           |SELECT k // 10 AS k_band, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS users
           |FROM parsed GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // §2.12 dictionary enrichment: the "parser" (stand-in for a UA/GeoIP
    // library) runs once per DISTINCT props value via mapPartitions, and
    // the result broadcast-joins back onto the fact — never per-row.
    val kRe = """"k"\s*:\s*(\d+)""".r
    val enriched = Enrich.viaDistinct(
      t.events, "props", StructType(Seq(StructField("k", LongType)))) { props =>
      Row(kRe.findFirstMatchIn(props).map(_.group(1).toLong).orNull)
    }
    enriched.groupBy((col("k") / 10).cast("long").as("k_band"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("users"))
      .orderBy("k_band")
  }

  val q34 = QueryDef(
    "q34_multimodal_decode",
    Some("""SELECT doc_id,
           |  (['jpeg','png','webp'])[CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 3 + 1] AS format,
           |  octet_length(encode(text)) AS n_bytes,
           |  CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 128 + 16 AS width,
           |  CAST('0x' || substr(md5('h:' || text), 1, 8) AS BIGINT) % 128 + 16 AS height,
           |  ascii(substr(text, 1, 1)) + octet_length(encode(text)) AS checksum
           |FROM documents ORDER BY doc_id""".stripMargin)) { t =>
    // Multimodal columns: opaque binary payload + typed metadata + stub
    // decode (see operators.Multimodal — the codec internals are faked,
    // the schema/plumbing is real).
    Multimodal.withMedia(t.documents, "text")
      .withColumn("f", Multimodal.decodeStubExpr(col("media"), col("text")))
      .select(col("doc_id"), col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"),
        col("f.width").as("width"), col("f.height").as("height"), col("f.checksum").as("checksum"))
      .orderBy("doc_id")
  }

  val q35 = QueryDef(
    "q35_frame_sample",
    Some("""SELECT doc_id, CAST(i AS INT) AS frame_no, substr(text, CAST(i * 25 + 1 AS INT), 40) AS frame
           |FROM documents, UNNEST(range(0, CAST(floor(CAST(length(text) - 40 AS DOUBLE) / 25) AS BIGINT) + 1)) AS t(i)
           |WHERE doc_id < 50 AND length(text) >= 40
           |ORDER BY doc_id, frame_no""".stripMargin)) { t =>
    // Frame sampling: stride-25 windows of 40 "bytes" — the video
    // frame-extract shape as explode over a generated index.
    Multimodal.frameSample(
        t.documents.where(col("doc_id") < 50 && length(col("text")) >= 40),
        "text", frameLen = 40, stride = 25)
      .select(col("doc_id"), col("frame_no"), col("frame"))
      .orderBy("doc_id", "frame_no")
  }

  val q60 = QueryDef(
    "q60_media_resize",
    Some("""WITH b AS (
           |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_orig,
           |    CASE WHEN length(text) <= 64 THEN 1 ELSE (length(text) + 63) // 64 END AS stride
           |  FROM documents WHERE doc_id < 200
           |)
           |SELECT doc_id, n_orig,
           |  CAST(CASE WHEN n_orig <= 64 THEN n_orig
           |            ELSE (n_orig + stride - 1) // stride END AS BIGINT) AS n_resized,
           |  substr(text, 1, 1) AS primera,
           |  substr(text, CAST(stride + 1 AS INT), 1) AS segunda
           |FROM b ORDER BY doc_id""".stripMargin)) { t =>
    // Media resize plumbing (operators.Multimodal.resizePartition): the
    // payload streams through mapPartitions — codec handle per
    // partition, rows batched — and comes back as a smaller binary with
    // fresh metadata. The "scaler" stub stride-samples bytes to <= 64,
    // which the oracle reproduces arithmetically; the sampled content
    // itself is pinned by golden spec.
    val docs = t.documents.where(col("doc_id") < 200)
    val media = Multimodal.withMedia(docs, "text")
    val resized = Multimodal.resizePartition(media, "media", "doc_id", maxBytes = 64)
    docs.join(resized, "doc_id")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_orig"),
        col("meta_resized.n_bytes").as("n_resized"),
        substring(col("media_resized").cast("string"), 1, 1).as("primera"),
        substring(col("media_resized").cast("string"), 2, 1).as("segunda"))
      .orderBy("doc_id")
  }

  val q36 = QueryDef(
    "q36_tz_santiago",
    Some("""SELECT CAST(date_trunc('day', local_ts) AS TIMESTAMP) AS dia,
           |       hour(local_ts) AS hora, COUNT(*) AS n,
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS minutes
           |FROM (SELECT CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/Santiago' AS TIMESTAMP) AS local_ts,
           |             value FROM events)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // UTC storage → America/Santiago reporting wall-clock (reference
    // consumo_bloques_hora.py:105) — the tz duality SURVEY.md §7 flags.
    val local = TimeFns.toSantiago(col("ts"))
    t.events.groupBy(
        date_trunc("day", local).as("dia"), hour(local).as("hora"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("minutes"))
      .orderBy("dia", "hora")
  }

  val q37 = QueryDef(
    "q37_session_recovery",
    Some("""WITH per_user AS (
           |  SELECT event_type, user_id,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS minutes,
           |    COUNT(*) AS n
           |  FROM events GROUP BY 1, 2
           |), staged AS (
           |  SELECT event_type, minutes, round(minutes / (minutes / n)) AS sessions FROM per_user
           |)
           |SELECT event_type,
           |  CAST(SUM(CAST(minutes AS DECIMAL(18,6))) AS DOUBLE) AS total_minutes,
           |  CAST(SUM(sessions) AS BIGINT) AS total_sessions,
           |  CASE WHEN SUM(sessions) > 0
           |       THEN CAST(SUM(CAST(minutes AS DECIMAL(18,6))) AS DOUBLE) / CAST(SUM(sessions) AS BIGINT)
           |       ELSE 0 END AS avg_minutes
           |FROM staged GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // A6: weighted-average recovery — re-derive session counts as
    // round(minutes/avg_minutes), re-aggregate, recompute the average
    // (reference funnel_emisor.py:160-164, liveod_editorial.py:257-266).
    val perUser = t.events.groupBy("event_type", "user_id")
      .agg(dsum(col("value")).as("minutes"), count(lit(1)).as("n"))
    val staged = perUser.select(col("event_type"), col("minutes"),
      round(col("minutes") / (col("minutes") / col("n"))).as("sessions"))
    staged.groupBy("event_type")
      .agg(
        sum(col("minutes").cast("decimal(18,6)")).cast("double").as("total_minutes"),
        sum(col("sessions")).cast("long").as("total_sessions"))
      .withColumn("avg_minutes",
        when(col("total_sessions") > 0, col("total_minutes") / col("total_sessions")).otherwise(0.0))
      .select("event_type", "total_minutes", "total_sessions", "avg_minutes")
      .orderBy("event_type")
  }

  val q38 = QueryDef(
    "q38_proportional_allocation",
    Some("""WITH day_tot AS (
           |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dia,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n_day
           |  FROM events GROUP BY 1
           |), per_type AS (
           |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dia, event_type, COUNT(*) AS n_type
           |  FROM events GROUP BY 1, 2
           |)
           |SELECT p.dia, p.event_type,
           |  round(d.total * p.n_type / d.n_day, 2) AS allocated
           |FROM per_type p JOIN day_tot d ON p.dia = d.dia
           |ORDER BY p.dia, p.event_type""".stripMargin)) { t =>
    // A10: proportional allocation of a total across segment columns
    // (reference trafico_digital.py:356-383) — total × share, rounded.
    val dayTot = t.events.groupBy(date_trunc("day", col("ts")).as("dia"))
      .agg(dsum(col("value")).as("total"), count(lit(1)).as("n_day"))
    val perType = t.events.groupBy(date_trunc("day", col("ts")).as("dia"), col("event_type"))
      .agg(count(lit(1)).as("n_type"))
    perType.join(dayTot, "dia")
      .select(col("dia"), col("event_type"),
        round(col("total") * col("n_type") / col("n_day"), 2).as("allocated"))
      .orderBy("dia", "event_type")
  }

  val q39 = QueryDef(
    "q39_remap_filter",
    Some("""SELECT CASE WHEN event_type = 'click' THEN 'interaccion'
           |            WHEN event_type = 'view' THEN 'vista'
           |            ELSE 'otro' END AS tipo,
           |       COUNT(*) AS n
           |FROM events
           |WHERE NOT regexp_matches(props, '[=;]') AND lower(event_type) != 'error'
           |GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // P6 regex row filter + P5 case-folded inequality + P10/P11 CASE
    // remap (reference mapa_consumo.py:168, consumo_bloques_hora.py:141,
    // funnel_live.py:82-91).
    t.events
      .where(!col("props").rlike("[=;]") && lower(col("event_type")) =!= "error")
      .groupBy(
        when(col("event_type") === "click", "interaccion")
          .when(col("event_type") === "view", "vista")
          .otherwise("otro").as("tipo"))
      .agg(count(lit(1)).as("n"))
      .orderBy("tipo")
  }

  val q40 = QueryDef(
    "q40_union_missing_columns",
    Some("""SELECT 'total' AS periodo, event_type, COUNT(*) AS n,
           |       CAST(NULL AS TIMESTAMP) AS dia, CAST(NULL AS DOUBLE) AS minutes
           |FROM events GROUP BY 2
           |UNION ALL
           |SELECT 'diario', event_type, COUNT(*),
           |       CAST(date_trunc('day', ts) AS TIMESTAMP),
           |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           |FROM events GROUP BY 2, 4
           |ORDER BY periodo, event_type, dia NULLS FIRST""".stripMargin)) { t =>
    // R5/U2: schema-superset union — unionByName(allowMissingColumns)
    // null-fills the absent columns, mirroring the reference's
    // empty-frame-seeded concat (consumo_usuarios.py:110-116).
    val total = t.events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("periodo", lit("total"))
    val diario = t.events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("dia"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("minutes"))
      .withColumn("periodo", lit("diario"))
    total.unionByName(diario, allowMissingColumns = true)
      .select("periodo", "event_type", "n", "dia", "minutes")
      .orderBy(col("periodo"), col("event_type"), col("dia").asc_nulls_first)
  }

  val q41 = QueryDef(
    "q41_merge_upsert",
    Some("""WITH target AS (
           |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           |), updates AS (
           |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice FROM orders
           |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |)
           |SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
           |UNION ALL SELECT * FROM updates
           |ORDER BY o_orderkey""".stripMargin)) { t =>
    // K3 MERGE-by-id semantics as a pure dataflow: anti-join keeps
    // unmatched target rows, updates win on collision (reference
    // funnel_live.py:106-174 staging + MERGE).
    val tgt = t.orders.where(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val upd = t.orders.where(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), (col("o_totalprice") * 2).as("o_totalprice"))
    Writers.mergeById(tgt, upd, "o_orderkey").orderBy("o_orderkey")
  }

  val q90 = QueryDef(
    "q90_scd2_intervals",
    Some("""WITH ev AS (
           |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
           |), r AS (
           |  SELECT user_id, event_type, ts,
           |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |    - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
           |  FROM ev
           |), isl AS (
           |  SELECT user_id, event_type, grp, min(ts) AS valid_from, COUNT(*) AS n_events
           |  FROM r GROUP BY 1, 2, 3
           |)
           |SELECT user_id, event_type, valid_from,
           |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_type) AS valid_to,
           |  CAST(n_events AS BIGINT) AS n_events
           |FROM isl ORDER BY user_id, valid_from, event_type""".stripMargin)) { t =>
    // SCD Type 2 from a change stream: compress each user's event-type
    // run into a validity interval (valid_from, valid_to), open-ended
    // for the current state — the slowly-changing-dimension build every
    // warehouse needs when the upstream only ships observations.
    // Gaps-and-islands: the difference of two row_numbers is constant
    // within a run, so runs become group keys — two partitioned sorts
    // over the fact (both keyed by user, never a global sort), then the
    // interval chaining happens on the island table, which is
    // run-sized, not event-sized.
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wTyp = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val islands = t.events.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("grp", row_number().over(wAll) - row_number().over(wTyp))
      .groupBy("user_id", "event_type", "grp")
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy("user_id").orderBy("valid_from", "event_type")
    islands
      .select(col("user_id"), col("event_type"), col("valid_from"),
        lead(col("valid_from"), 1).over(wNext).as("valid_to"), col("n_events"))
      .orderBy("user_id", "valid_from", "event_type")
  }

  val q93 = QueryDef(
    "q93_gap_fill_interpolate",
    Some("""WITH obs AS (
           |  SELECT user_id, CAST(ts AS DATE) AS d, MAX(value) AS v_obs
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
           |days AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS d),
           |users AS (SELECT DISTINCT user_id FROM events),
           |g AS (SELECT u.user_id, days.d, o.v_obs
           |      FROM users u CROSS JOIN days LEFT JOIN obs o ON o.user_id = u.user_id AND o.d = days.d),
           |w AS (SELECT user_id, d, v_obs,
           |  last_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
           |  last_value(CASE WHEN v_obs IS NOT NULL THEN d END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
           |  first_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
           |  first_value(CASE WHEN v_obs IS NOT NULL THEN d END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
           |  FROM g)
           |SELECT user_id, d, v_obs, ffill,
           |  CASE WHEN v_obs IS NOT NULL THEN v_obs
           |       WHEN ffill IS NOT NULL AND next_v IS NOT NULL
           |         THEN ffill + (next_v - ffill) * (CAST(date_diff('day', prev_d, d) AS DOUBLE) / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
           |       ELSE ffill END AS interp
           |FROM w ORDER BY user_id, d""".stripMargin)) { t =>
    // Time-series regularization — the resample step of a metrics/sensor
    // pipeline: a daily spine per user (every user × every day, gaps
    // explicit), forward fill, and linear interpolation between the
    // bracketing observations. Both window passes are partitioned by
    // user and sorted only within the partition — never a global sort —
    // and the 30-row day dim broadcasts onto the user list, so the plan
    // is one shuffle on user_id at any scale. Edges are defined: before
    // the first observation interp stays null, after the last it carries
    // the forward fill. The interpolation is a single fixed-order double
    // expression of two exact day counts, so both engines agree bitwise.
    import org.apache.spark.sql.expressions.Window
    val obs = t.events.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg(max(col("value")).as("v_obs"))
    val days = t.spark.range(1).select(explode(sequence(
      lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"),
      expr("interval 1 day"))).as("d"))
    val spine = t.events.select("user_id").distinct().crossJoin(broadcast(days))
    val g = spine.join(obs, Seq("user_id", "d"), "left")
    val back = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val w = g.select(col("user_id"), col("d"), col("v_obs"),
      last(col("v_obs"), ignoreNulls = true).over(back).as("ffill"),
      last(when(col("v_obs").isNotNull, col("d")), ignoreNulls = true).over(back).as("prev_d"),
      first(col("v_obs"), ignoreNulls = true).over(fwd).as("next_v"),
      first(when(col("v_obs").isNotNull, col("d")), ignoreNulls = true).over(fwd).as("next_d"))
    w.select(col("user_id"), col("d"), col("v_obs"), col("ffill"),
        when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("ffill").isNotNull && col("next_v").isNotNull,
            col("ffill") + (col("next_v") - col("ffill")) *
              (datediff(col("d"), col("prev_d")).cast("double") /
                datediff(col("next_d"), col("prev_d")).cast("double")))
          .otherwise(col("ffill")).as("interp"))
      .orderBy("user_id", "d")
  }

  val q98 = QueryDef(
    "q98_sessionize",
    Some("""WITH e AS (
           |  SELECT user_id, ts, event_id,
           |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           |  FROM events),
           |f AS (
           |  SELECT user_id, ts, event_id,
           |    CASE WHEN prev_ts IS NULL
           |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS brk
           |  FROM e),
           |s AS (
           |  SELECT user_id, ts,
           |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           |  FROM f)
           |SELECT user_id, session_id, COUNT(*) AS n_events,
           |  min(ts) AS session_start, max(ts) AS session_end,
           |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
           |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // Time-gap sessionization (30-min inactivity breaks a session) —
    // the batch twin of EventStream's stateful sessionizer: one
    // user-partitioned window pass marks breaks (gap math in exact
    // integer microseconds — a fractional-seconds epoch would put the
    // engines on different doubles), a running sum numbers sessions,
    // one aggregate emits per-session stats. Both window sorts and the
    // aggregate share the user_id partitioning: one shuffle total.
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val e = t.events.select(col("user_id"), col("ts"), col("event_id"),
      lag(col("ts"), 1).over(order).as("prev_ts"))
    val f = e.withColumn("brk",
      when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1).otherwise(0))
    val s = f.select(col("user_id"), col("ts"),
      sum(col("brk")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long").as("session_id"))
    s.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  val q110 = QueryDef(
    "q110_json_extract",
    Some("""WITH p AS (
           |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           |  FROM events)
           |SELECT event_type,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(COUNT(k) AS BIGINT) AS n_parsed,
           |  CAST(MIN(k) AS BIGINT) AS k_min,
           |  CAST(MAX(k) AS BIGINT) AS k_max,
           |  CAST(SUM(k) AS BIGINT) AS k_sum,
           |  CAST(COUNT(DISTINCT k) AS BIGINT) AS k_distinct
           |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // Semi-structured payload extraction — the GA/Firebase event-params
    // shape (the reference unpacks JSON API payloads row by row in
    // pandas): get_json_object path extraction stays inside codegen, a
    // malformed or missing path yields null (counted separately via
    // n vs n_parsed, never an error), and the aggregate is one
    // partial-aggregated scan. All outputs are exact integers.
    val k = get_json_object(col("props"), "$.k").cast("long")
    t.events.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_parsed"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        sum(col("k")).as("k_sum"), countDistinct(col("k")).as("k_distinct"))
      .orderBy("event_type")
  }

  val q114 = QueryDef(
    "q114_native_session_window",
    // the gaps-and-islands formulation with session_window's boundary
    // semantics: a NEW session starts when the gap is >= 30 min (the
    // native operator extends a session only while ts < prev + gap),
    // where q98's manual break uses strictly-greater — distinguishable
    // only by a gap of exactly 1800.000000 s
    Some("""WITH e AS (
           |  SELECT user_id, ts, event_id,
           |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           |  FROM events),
           |f AS (
           |  SELECT user_id, ts, event_id,
           |    CASE WHEN prev_ts IS NULL
           |           OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS brk
           |  FROM e),
           |s AS (
           |  SELECT user_id, ts,
           |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
           |  FROM f)
           |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           |       COUNT(*) AS n_events
           |FROM s GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin)) { t =>
    // Spark's NATIVE session windows — the idiomatic form of q98: an
    // AGGREGATE with merging session state, one shuffle on the grouping
    // key, no sort-based window functions at all (the preferred plan at
    // 100 TB, and the exact construct the streaming sessionizer shares).
    // The oracle is the portable gaps-and-islands SQL with the native
    // boundary semantics, proving the two formulations agree; the
    // window's end is last-event + gap by definition, so subtracting
    // the gap recovers max(ts) exactly in microsecond arithmetic.
    t.events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        (col("session_window.end") - expr("INTERVAL 30 MINUTES")).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  val q160 = QueryDef.staged(
    "q160_wav_decode",
    // oracle: the decoded audio features recomputed from the SOURCE
    // rows — the gate that makes the codec REAL: per-user PCM16 WAV
    // blobs are byte-built by the engine's own RIFF encoder, then the
    // distributed decoder must recover the exact sample stream (count
    // and integer energy) through header walk, chunk parse and
    // little-endian sample decode. One flipped byte anywhere fails.
    Some("""SELECT user_id, CAST(16000 AS BIGINT) AS sample_rate,
           |  CAST(COUNT(*) AS BIGINT) AS n_samples,
           |  CAST(SUM(CAST((event_id % 30000) - 15000 AS BIGINT) *
           |           CAST((event_id % 30000) - 15000 AS BIGINT)) AS BIGINT) AS sum_sq
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // FIXTURE (untimed): land one WAV per user — samples derived from
    // the user's event stream (integer-exact, so the oracle can
    // recompute them), byte-encoded by the real RIFF writer.
    import t.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q160").toString + "/blobs"
    t.events.select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (u, it) =>
        val samples = it.map(_._2).toArray.sorted
          .map(e => ((e % 30000) - 15000).toShort)
        (u, Multimodal.encodeWavPcm16(16000, samples))
      }.toDF("user_id", "media")
      .write.mode("overwrite").parquet(dir)
    dir
  } { (t, dir: String) =>
    // MEASURED: the REAL distributed decode — mapPartitions codec seam,
    // actual RIFF/PCM16 parsing per row — then the per-user feature
    // table. At 100 TB this is the audio-quality/length gate of a
    // speech-corpus pipeline: one pass, no shuffle until the final sort.
    Multimodal.decodeWavPartition(t.spark.read.parquet(dir), "media", "user_id")
      .orderBy("user_id")
  }

  val q161 = QueryDef.staged(
    "q161_bmp_decode",
    // oracle: the decoded image features recomputed from first
    // principles — per-doc 24-bit BMPs with deterministic pixels are
    // byte-built by the engine's own encoder (bottom-up BGR rows,
    // 4-byte padding), and the distributed decoder must recover exact
    // dimensions and per-channel sums through the container round trip.
    Some("""WITH px AS (
           |  SELECT d.doc_id, (d.doc_id % 9 + 8) AS w, (d.doc_id % 7 + 8) AS h, r.range AS i
           |  FROM documents d, range(0, 672) r
           |  WHERE r.range < (d.doc_id % 9 + 8) * (d.doc_id % 7 + 8) * 3
           |)
           |SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
           |  CAST(SUM(CASE WHEN i % 3 = 0 THEN (doc_id * 31 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_r,
           |  CAST(SUM(CASE WHEN i % 3 = 1 THEN (doc_id * 31 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_g,
           |  CAST(SUM(CASE WHEN i % 3 = 2 THEN (doc_id * 31 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_b
           |FROM px GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // FIXTURE (untimed): one BMP per document, pixels a pure integer
    // function of doc_id so the oracle enumerates them in SQL.
    import t.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q161").toString + "/blobs"
    t.documents.select(col("doc_id").cast("long")).as[Long]
      .map { d =>
        val w = (d % 9 + 8).toInt
        val h = (d % 7 + 8).toInt
        val rgb = Array.tabulate(w * h * 3)(i => ((d * 31 + i) % 256).toByte)
        (d, Multimodal.encodeBmp24(w, h, rgb))
      }.toDF("doc_id", "media")
      .write.mode("overwrite").parquet(dir)
    dir
  } { (t, dir: String) =>
    // MEASURED: the REAL distributed BMP decode (row padding, BGR
    // order, bottom-up flip all exercised) → per-image feature table,
    // the image-dedup/quality front of a vision-corpus pipeline.
    Multimodal.decodeBmpPartition(t.spark.read.parquet(dir), "media", "doc_id")
      .orderBy("doc_id")
  }

  val q163 = QueryDef.staged(
    "q163_png_decode",
    // oracle: PNG is LOSSLESS, so the decoded pixel features recompute
    // from first principles exactly — per-doc PNGs with deterministic
    // pixels are encoded by the JDK's own ImageIO writer, and the
    // distributed ImageIO decode must recover exact dimensions and
    // per-channel sums through the real zlib/filter round trip. One
    // wrong pixel anywhere fails the hash.
    Some("""WITH px AS (
           |  SELECT d.doc_id, (d.doc_id % 11 + 6) AS w, (d.doc_id % 5 + 6) AS h, r.range AS i
           |  FROM documents d, range(0, 510) r
           |  WHERE r.range < (d.doc_id % 11 + 6) * (d.doc_id % 5 + 6) * 3
           |)
           |SELECT doc_id, CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
           |  CAST(SUM(CASE WHEN i % 3 = 0 THEN (doc_id * 17 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_r,
           |  CAST(SUM(CASE WHEN i % 3 = 1 THEN (doc_id * 17 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_g,
           |  CAST(SUM(CASE WHEN i % 3 = 2 THEN (doc_id * 17 + i) % 256 ELSE 0 END) AS BIGINT) AS sum_b
           |FROM px GROUP BY 1 ORDER BY 1""".stripMargin)) { t =>
    // FIXTURE (untimed): one PNG per document, pixels a pure integer
    // function of doc_id so the oracle enumerates them in SQL.
    import t.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q163").toString + "/blobs"
    t.documents.select(col("doc_id").cast("long")).as[Long]
      .map { d =>
        val w = (d % 11 + 6).toInt
        val h = (d % 5 + 6).toInt
        val rgb = Array.tabulate(w * h * 3)(i => ((d * 17 + i) % 256).toByte)
        (d, Multimodal.encodeImage("png", w, h, rgb))
      }.toDF("doc_id", "media")
      .write.mode("overwrite").parquet(dir)
    dir
  } { (t, dir: String) =>
    // MEASURED: the REAL distributed compressed-image decode — the
    // JDK's ImageIO through the mapPartitions codec seam — then the
    // per-image feature table. At 100 TB this is the image-dedup /
    // quality front of a vision-corpus pipeline over its dominant
    // storage format: one pass, no shuffle until the final sort.
    Multimodal.decodeImagePartition(t.spark.read.parquet(dir), "media", "doc_id")
      .orderBy("doc_id")
  }

  val q164 = QueryDef.staged(
    "q164_jpeg_decode",
    // oracle: JPEG is LOSSY, so the cross-engine gate is what the
    // format defines exactly — the decoded DIMENSIONS, which prove the
    // real container walk (SOI/SOF parsing through the JDK decoder) on
    // every row. Pixel determinism (same bytes → same pixels, decode →
    // re-encode → decode stability) is pinned by MultimodalCodecSpec,
    // where one JVM's decoder output can be compared against itself.
    Some("""SELECT doc_id,
           |  CAST(doc_id % 8 + 16 AS BIGINT) AS width,
           |  CAST(doc_id % 6 + 16 AS BIGINT) AS height
           |FROM documents ORDER BY 1""".stripMargin)) { t =>
    // FIXTURE (untimed): one JPEG per document via the JDK encoder.
    import t.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q164").toString + "/blobs"
    t.documents.select(col("doc_id").cast("long")).as[Long]
      .map { d =>
        val w = (d % 8 + 16).toInt
        val h = (d % 6 + 16).toInt
        val rgb = Array.tabulate(w * h * 3)(i => ((d * 13 + i * 7) % 256).toByte)
        (d, Multimodal.encodeImage("jpg", w, h, rgb))
      }.toDF("doc_id", "media")
      .write.mode("overwrite").parquet(dir)
    dir
  } { (t, dir: String) =>
    // MEASURED: real distributed JPEG decode (huffman + DCT through
    // ImageIO), projected to the format-exact columns.
    Multimodal.decodeImagePartition(t.spark.read.parquet(dir), "media", "doc_id")
      .select(col("doc_id"), col("width"), col("height"))
      .orderBy("doc_id")
  }

  val q169 = QueryDef.staged(
    "q169_gif_frame_sample",
    // oracle: frame features recomputed from first principles — one
    // ANIMATED GIF per document (a real multi-frame container, the
    // JDK's closest thing to video), frames' grayscale pixels a pure
    // integer function of (doc_id, frame, pixel); the distributed
    // sampler must decode the LZW/palette stream, keep every 2nd
    // frame, and recover exact per-frame pixel sums. One wrong pixel
    // or a mis-indexed frame fails the hash.
    Some("""WITH fr AS (
           |  SELECT d.doc_id, (d.doc_id % 6 + 4) AS w, (d.doc_id % 5 + 4) AS h,
           |         f.range AS frame_no
           |  FROM documents d, range(0, 5) f(range)
           |  WHERE f.range < (d.doc_id % 3 + 2) AND f.range % 2 = 0
           |), px AS (
           |  SELECT doc_id, frame_no, w, h, i.range AS i
           |  FROM fr, range(0, 72) i(range)
           |  WHERE i.range < w * h
           |)
           |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
           |  CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
           |  CAST(SUM((doc_id * 7 + frame_no * 13 + i) % 256) AS BIGINT) AS sum_gray
           |FROM px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)) { t =>
    // FIXTURE (untimed): one animated GIF per document, 2-4 frames,
    // grayscale pixels enumerable in SQL.
    import t.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q169").toString + "/blobs"
    t.documents.select(col("doc_id").cast("long")).as[Long]
      .map { d =>
        val w = (d % 6 + 4).toInt
        val h = (d % 5 + 4).toInt
        val frames = (0 until (d % 3 + 2).toInt).map(f =>
          Array.tabulate(w * h)(i => ((d * 7 + f * 13 + i) % 256).toByte))
        (d, Multimodal.encodeGifFrames(w, h, frames))
      }.toDF("doc_id", "media")
      .write.mode("overwrite").parquet(dir)
    dir
  } { (t, dir: String) =>
    // MEASURED: REAL distributed frame sampling — per row the full GIF
    // decode through the mapPartitions codec seam, keeping every 2nd
    // frame. At 100 TB this is the frame-extraction front of a video
    // corpus pipeline: one pass, fan-out bounded by kept frames, no
    // shuffle until the final sort.
    Multimodal.sampleGifFrames(t.spark.read.parquet(dir), "media", "doc_id", stride = 2)
      .orderBy("doc_id", "frame_no")
  }

  override def queries: Seq[QueryDef] = Seq(q33, q34, q35, q36, q37, q38, q39, q40, q41, q60, q90, q93, q98, q110, q114, q160, q161, q163, q164, q169)
}
