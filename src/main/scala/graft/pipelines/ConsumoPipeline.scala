package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TimeFns
import graft.operators.{BandJoin, Enrich, OverlapJoin, Writers}

/** End-to-end pipeline in the reference's DAG shape (SURVEY.md §3.1-3.2):
  * extract → enrich → interval rollup → idempotent windowed load.
  *
  * Mirrors `consumo_detalle` + `consumo_bloques_hora`: the raw event
  * feed is enriched via the distinct-value dictionary pattern, joined
  * to an hourly calendar spine (broadcast overlap — the spine is
  * dimension-sized), banded into VIP tiers, rolled up to prorated
  * minutes + distinct listeners, and written with delete-and-replace
  * semantics (only the partitions inside the replacement window are
  * rewritten, so hourly re-runs are idempotent).
  */
object ConsumoPipeline {

  case class Params(
      spineStart: String, spineEnd: String,
      grain: String = "1 hour",
      vips: Seq[Long] = Seq(0L, 1L, 5L, 20L, 40L))

  /** Transform stage: raw events (ts/user_id/event_type/value/props) →
    * per (period, event_type, vip) rollup. Pure dataflow — testable
    * without any write.
    */
  def rollup(spark: SparkSession, events: DataFrame, p: Params): DataFrame =
    rollupOver(spark, events, p,
      TimeFns.spine(spark, p.spineStart, p.spineEnd, p.grain)
        .withColumn("periodo", lit("")))
      .drop("periodo")

  /** The rollup over an explicit spine carrying a `periodo` column —
    * several grains ride ONE pass of the fact when their spines union
    * (periodo rides every aggregation key, so the unioned overlap join
    * produces exactly the rows the per-grain joins would).
    */
  private def rollupOver(spark: SparkSession, events: DataFrame, p: Params,
                         spine: DataFrame): DataFrame = {
    // 1. enrichment: parse the props payload once per distinct value
    //    (the reference's UA/GeoIP dictionary trick)
    val kRe = """"k"\s*:\s*(\d+)""".r
    val enriched = Enrich.viaDistinct(events, "props",
      StructType(Seq(StructField("k", LongType)))) { props =>
      Row(kRe.findFirstMatchIn(props).map(_.group(1).toLong).orNull)
    }

    // 2. event interval [second-truncated ts, ts + value minutes)
    val intervals = enriched.select(
      col("event_type"), col("user_id"), col("k"),
      date_trunc("second", col("ts")).as("s"),
      expr("timestampadd(SECOND, CAST(floor(value*60) AS BIGINT), date_trunc('second', ts))").as("e"),
      col("value"))

    // 3. overlap join to the calendar spine (broadcast; at 100 TB the
    //    spine is still only hours-per-decade rows)
    val joined = OverlapJoin.broadcastOverlap(
      intervals, spine, col("s"), col("e"), col("p_start"), col("p_end"))

    // 4. per-user minutes inside each period, then VIP banding (theta
    //    join vs the 5-row dim) and the final rollup
    val perUser = joined
      .groupBy("periodo", "p_start", "event_type", "user_id")
      .agg(
        (sum(TimeFns.overlapSeconds(col("s"), col("e"), col("p_start"), col("p_end"))) / 60.0)
          .as("minutes"),
        count(lit(1)).as("n_events"))
    val vips = spark.createDataFrame(
      java.util.Arrays.asList(p.vips.map(Row(_)): _*),
      StructType(Seq(StructField("vip", LongType, nullable = false))))
    BandJoin.thresholdBands(perUser, vips, col("minutes"), col("vip"))
      .groupBy("periodo", "p_start", "event_type", "vip")
      .agg(
        countDistinct(col("user_id")).as("users"),
        sum(col("n_events")).as("n_events"),
        sum(col("minutes")).as("minutes"))
      .withColumn("fecha", to_date(col("p_start")))
  }

  /** Load stage: K2 delete-and-replace of the partitions present in the
    * rollup (the trailing `dias_remplazo` window the caller filtered to).
    */
  def run(spark: SparkSession, events: DataFrame, p: Params, outPath: String): Unit =
    Writers.replaceWindow(rollup(spark, events, p), outPath, "fecha")

  /** Dual-grain publication mirroring consumo_bloques_hora's parallel
    * etl_dia / etl_mes tasks + per-periodo delete windows
    * (consumo_bloques_hora.py:30-67, 324-332): hourly and monthly
    * rollups land in ONE table keyed by `periodo`, and a re-run replaces
    * hourly rows from `cutoff` but the month rows from their month
    * start. `pHora`'s spine is the trailing replacement window;
    * `pMensual`'s spine starts at the month boundary (month-to-date
    * recomputed whole).
    */
  def runDualGrain(spark: SparkSession, events: DataFrame,
                   pHora: Params, pMensual: Params,
                   outPath: String, cutoff: org.apache.spark.sql.Column): Unit = {
    // both grains ride one fact pass: union the spines, tag periodo
    // (the q62 fold — the enrichment and banding config must agree for
    // the shared pass to be semantics-preserving)
    require(pHora.vips == pMensual.vips,
      "dual-grain fold requires identical VIP banding across grains")
    val spine = TimeFns.spine(spark, pHora.spineStart, pHora.spineEnd, pHora.grain)
        .withColumn("periodo", lit("hora"))
      .unionByName(
        TimeFns.spine(spark, pMensual.spineStart, pMensual.spineEnd, "1 month")
          .withColumn("periodo", lit("mensual")))
    Writers.replacePeriodWindowWrite(spark, outPath,
      rollupOver(spark, events, pHora, spine), "fecha", "periodo", cutoff)
  }
}
