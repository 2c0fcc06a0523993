package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Interval-overlap join (SURVEY.md §4.3 — the one genuinely hard
  * physical problem in the workload).
  *
  * The reference joins the playback fact to calendar periods / program
  * schedules on `start < p.fin AND end >= p.inicio`
  * (consumo_bloques_hora.py:140,155,169,188; indicadores_cia.py:163-165).
  * That condition has no equi-key, so naive planning yields a
  * nested-loop join: fine when the period side is small (broadcast BNLJ,
  * `broadcastOverlap`), O(fact × periods) at 100 TB.
  *
  * `bucketed` is the scale path: both sides are exploded onto a coarse
  * time-bucket grain, the join becomes an equi-join on the bucket plus
  * the residual overlap predicate, and Catalyst plans a shuffle-hash /
  * sort-merge join. De-dup is by construction: a (fact, period) pair is
  * emitted only in the bucket containing the overlap's start, so no
  * distinct() pass is needed afterwards.
  */
object OverlapJoin {

  /** v0: correct + simple. Right plan when `periods` is dimension-sized
    * (calendar spines, program schedules — thousands of rows).
    */
  def broadcastOverlap(
      fact: DataFrame, periods: DataFrame,
      fs: Column, fe: Column, ps: Column, pe: Column): DataFrame =
    fact.join(broadcast(periods), TimeFns.overlaps(fs, fe, ps, pe))

  /** v1: bucketed rewrite for a large period side (or to avoid BNLJ row
    * amplification on the fact side). `grain` must be coarse enough that
    * a typical interval spans few buckets (e.g. "1 day" for sub-day
    * playback intervals).
    *
    * Requires column NAMES so the exploded bucket can be attached to
    * each side before the join.
    */
  def bucketedOverlap(
      fact: DataFrame, periods: DataFrame,
      fs: String, fe: String, ps: String, pe: String,
      grain: String = "day", step: String = "1 day"): DataFrame = {

    // greatest(lo, hi) guards malformed end < start rows (sequence with a
    // positive step would throw) — same guard the automatic
    // OverlapJoinRewrite rule applies, so both paths agree on bad input.
    val fb = fact.withColumn(
      "__bucket",
      explode(sequence(date_trunc(grain, col(fs)),
        date_trunc(grain, greatest(col(fs), col(fe))), expr(s"INTERVAL $step"))))
    val pb = periods.withColumn(
      "__bucket",
      explode(sequence(date_trunc(grain, col(ps)),
        date_trunc(grain, greatest(col(ps), col(pe))), expr(s"INTERVAL $step"))))

    // Emit each overlapping pair exactly once: only in the bucket that
    // contains the start of the overlap region.
    val cond = fb("__bucket") === pb("__bucket") &&
      TimeFns.overlaps(fb(fs), fb(fe), pb(ps), pb(pe)) &&
      date_trunc(grain, greatest(fb(fs), pb(ps))) === fb("__bucket")

    fb.join(pb, cond).drop("__bucket")
  }
}
