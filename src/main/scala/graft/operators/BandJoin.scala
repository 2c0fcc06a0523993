package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Theta joins against tiny banding dimensions.
  *
  * The reference bands listeners into VIP tiers with
  * `IFNULL(consumo.minutes, 0) >= vips.vip` (audio_digital.py:395-396,
  * programas_live.py:445-446) and ages into tramos with
  * `age BETWEEN edad_inf AND edad_sup`
  * (Complex_user_superposition_by_hour_etl.ipynb:190-196). Both dims are
  * <= tens of rows, so a broadcast nested-loop join is the optimal plan
  * at any scale — the fact side streams through once.
  */
object BandJoin {

  /** One output row per (fact row, band it qualifies for) — vip semantics:
    * a listener with 25 minutes lands in bands 0, 1, 5, 20.
    */
  def thresholdBands(fact: DataFrame, bands: DataFrame, value: Column, threshold: Column): DataFrame =
    fact.join(broadcast(bands), coalesce(value, lit(0.0)) >= threshold)

  /** One output row per fact row: the single [lo, hi] band containing the
    * value (age → tramo etario).
    */
  def rangeBand(fact: DataFrame, bands: DataFrame, value: Column, lo: Column, hi: Column): DataFrame =
    fact.join(broadcast(bands), value >= lo && value <= hi, "left")
}
