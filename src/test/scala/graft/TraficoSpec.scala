package graft

import org.apache.spark.sql.functions._
import graft.queries.TraficoPack

/** q67's composition contract: the four demographic reports are grouping
  * sets over one fact scan, and the proportional allocation really
  * rescales the splits onto the total (trafico_digital.py:365-383).
  */
class TraficoSpec extends SparkSpec {
  import spark.implicits._

  test("the four demographic reports share one scan of the events fact") {
    val plan = TraficoPack.carga(sf()).queryExecution.executedPlan.toString
    val eventScans = plan.split("\n").count(l => l.contains("Scan parquet") && l.contains("events"))
    assert(eventScans == 1, s"events scanned $eventScans times — reports must be grouping sets:\n$plan")
  }

  test("allocated demographic splits sum back to the total (within rounding)") {
    val out = TraficoPack.carga(sf("sf0.01"))
    // genero split: Mujeres + Hombres sesiones vs Total sesiones — the
    // allocation guarantees equality within k/2 rounding slack; WITHOUT
    // it the split would undercount (unknown-genero traffic is in Total)
    val rows = out.where($"target_tableau".isin("Tot. Pob.", "m", "h"))
      .groupBy("fecha", "hora_inicio")
      .agg(
        sum(when($"target_tableau" === "Tot. Pob.", $"sesiones")).as("tot"),
        sum(when($"target_tableau".isin("m", "h"), $"sesiones")).as("split"),
        count(when($"target_tableau".isin("m", "h"), lit(1))).as("k"))
      .where($"tot".isNotNull && $"k" > 0)
      .as[(String, String, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, h, tot, split, k) =>
      assert(math.abs(tot - split) <= k * 0.5 + 1e-9,
        s"$f $h: split $split vs total $tot exceeds rounding slack")
    }
  }

  test("rate metrics pass through unscaled; unknown demographics never surface") {
    val t = sf("sf0.01")
    val out = TraficoPack.carga(t).cache()
    try {
      // no target row may originate from an 'unknown' group
      val targets = out.select("target").distinct().as[String].collect().toSet
      assert(!targets.exists(_.toLowerCase.contains("unknown")))
      // porc_rebote for a pure genero split equals the directly computed
      // per-genero rate (no allocation applied to no_calc metrics)
      val direct = t.events.where($"user_id".isNotNull &&
          $"user_id" % 7 =!= 0 && $"user_id" % 2 === 0) // female, known
        .groupBy(date_trunc("hour", $"ts").as("dt"))
        .agg((sum(when($"value" < 5, 1L).otherwise(0L)).cast("double") * 100 / count(lit(1)))
          .as("rate"))
        .as[(java.sql.Timestamp, Double)].collect().toMap
      val viaQ67 = out.where($"target" === "Mujeres")
        .select(to_timestamp(concat($"fecha", lit(" "), $"hora_inicio")), $"porc_rebote")
        .as[(java.sql.Timestamp, Double)].collect().toMap
      assert(viaQ67.nonEmpty)
      viaQ67.foreach { case (dt, r) =>
        assert(direct.get(dt).exists(d => math.abs(d - r) < 1e-12),
          s"$dt: porc_rebote $r was rescaled (direct ${direct.get(dt)})")
      }
    } finally out.unpersist()
  }
}
