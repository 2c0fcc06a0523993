package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time/interval scalar helpers.
  *
  * The workload's core metric is prorated overlap minutes between a
  * playback interval and a calendar period:
  * `SUM(DATETIME_DIFF(LEAST(end,p_fin), GREATEST(start,p_inicio), SECOND)/60)`
  * (reference consumo_bloques_hora.py:135-137, q_registrados_.py:90-91).
  *
  * Determinism note: we accumulate **integer seconds** and divide once at
  * the end — summing doubles is order-dependent under parallel execution,
  * summing longs is not. This matters for oracle hash-matching and for
  * reproducible results on a real cluster.
  */
object TimeFns {

  /** Integer seconds of overlap between [s,e) and [ps,pe); assumes the
    * rows already passed an overlap predicate (result >= 0).
    */
  def overlapSeconds(s: Column, e: Column, ps: Column, pe: Column): Column =
    unix_timestamp(least(e, pe)) - unix_timestamp(greatest(s, ps))

  /** Prorated minutes for a single row (double; exact because a single
    * long/60.0 division is deterministic).
    */
  def proratedMinutes(s: Column, e: Column, ps: Column, pe: Column): Column =
    overlapSeconds(s, e, ps, pe) / lit(60.0)

  /** Interval-overlap predicate: start < p_end AND end >= p_start
    * (the exact operator shape of reference consumo_bloques_hora.py:140).
    */
  def overlaps(s: Column, e: Column, ps: Column, pe: Column): Column =
    s < pe && e >= ps

  /** BigQuery TRUNC(x, d) rounds **toward zero** (not floor) — matters for
    * negative balances (reference consumo_bloques_hora.py:135,
    * indicadores_cia.py:245).
    */
  def truncTowardZero(x: Column, d: Int): Column = {
    val f = math.pow(10, d)
    signum(x) * floor(abs(x) * f) / lit(f)
  }

  /** UTC → America/Santiago local wall-clock (reference stores UTC and
    * reports in Santiago time, consumo_bloques_hora.py:105).
    */
  def toSantiago(ts: Column): Column = from_utc_timestamp(ts, "America/Santiago")
  def fromSantiago(ts: Column): Column = to_utc_timestamp(ts, "America/Santiago")

  /** Oficial → ipsos schedule envelope (reference programas_live.py:
    * 112-121): the ipsos block floors the official start to its hour
    * (xx:00:00) and ceils the official end to the NEXT hour boundary —
    * an end already on a boundary stays put (the reference's -1s /
    * minute=59 / +1s dance, exact for the whole-minute schedule times it
    * is applied to).
    */
  def ipsosStart(start: Column): Column = date_trunc("hour", start)
  def ipsosEnd(end: Column): Column =
    date_trunc("hour", end - expr("INTERVAL 1 SECOND")) + expr("INTERVAL 1 HOUR")

  /** Calendar spine of [p_start, p_end) rows at a grain, the Spark shape
    * of BigQuery GENERATE_TIMESTAMP_ARRAY + UNNEST (reference
    * Complex_user_superposition_by_hour_etl.ipynb:48-56) and of the
    * dicc_fechas dictionary. Spines are tiny (hours-per-year ≈ 8.8k) —
    * always broadcastable.
    */
  def spine(spark: SparkSession, start: String, endExclusive: String, step: String): DataFrame = {
    spark.range(1).select(
      explode(sequence(
        lit(start).cast("timestamp"),
        lit(endExclusive).cast("timestamp") - expr(s"INTERVAL $step"),
        expr(s"INTERVAL $step"))).as("p_start"))
      .select(col("p_start"), (col("p_start") + expr(s"INTERVAL $step")).as("p_end"))
  }
}
