package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables

/** trafico_digital.py composed END TO END: the GA/GA4 demographic
  * traffic pipeline — per-demographic reports (total / genero / edad /
  * generoedad, py:96-108), melt to long metrics (py:282-287), the
  * proportional demographic allocation of unir_demograficos (py:365-383:
  * each demographic split is rescaled so it sums to the total report's
  * value, EXCEPT rate/average metrics which pass through), and
  * formatear_tabla's pivot + label remap + id synthesis (py:388-443).
  *
  * The reference issues one GA request per demographic report and melts/
  * pivots each in pandas. Here the four reports are GROUPING SETS over
  * ONE scan of the fact — (datetime), (datetime, genero), (datetime,
  * edad), (datetime, genero, edad) — which is exactly what a
  * multi-report demographic extract is, and what lets the engine share
  * the scan and partial-aggregate all four. 'unknown' demographic groups
  * are dropped AFTER aggregation (the reference drops those rows per
  * report, py:261-263 — same result, the total report still includes
  * their traffic), which is why the allocation is not a no-op: demo
  * splits sum to less than the total and must be scaled up.
  *
  * Determinism: every metric value is an integer-valued double (counts,
  * integer sums) or a single-division ratio, so sums are exact, the
  * allocation ratio is one IEEE multiply+divide, and round() agrees
  * across engines.
  */
object TraficoPack extends QueryPack {

  private val Edades = Seq("18-24", "25-34", "35-44", "45-54", "55-64", "65+")
  private val CalcVars = Seq("usuarios_unicos", "sesiones", "pag_vistas")
  private val NoCalcVars = Seq("porc_rebote", "tprom_pagina") // py:370 no_calc_cols
  private val AllVars = CalcVars ++ NoCalcVars

  /** GA-shaped fixture: events at the hour grain with synthesized
    * demographics; independent unknown-ness per dimension (a GA export's
    * reality, and what makes the demo reports undercount the total).
    */
  private def base(t: Tables): DataFrame =
    t.events.where(col("user_id").isNotNull).select(
      date_trunc("hour", col("ts")).as("datetime"),
      col("user_id"), col("value").as("v"),
      when(col("user_id") % 7 === 0, lit("unknown"))
        .when(col("user_id") % 2 === 0, lit("female")).otherwise(lit("male")).as("genero"),
      when(col("user_id") % 5 === 0, lit("unknown"))
        .otherwise(element_at(array(Edades.map(lit): _*), (col("user_id") % 6 + 1).cast("int")))
        .as("edad"))

  /** The four demographic reports as grouping sets over one scan, melted
    * to (report, datetime, genero, edad, variable, value) long form.
    */
  private def reports(t: Tables): DataFrame = {
    val b = base(t)
    val grouped = b.groupingSets(
        Seq(Seq(col("datetime")), Seq(col("datetime"), col("genero")),
          Seq(col("datetime"), col("edad")), Seq(col("datetime"), col("genero"), col("edad"))),
        col("datetime"), col("genero"), col("edad"))
      .agg(
        countDistinct(col("user_id")).cast("double").as("usuarios_unicos"),
        count(lit(1)).cast("double").as("sesiones"),
        sum(floor(col("v"))).cast("double").as("pag_vistas"),
        (sum(when(col("v") < 5, 1L).otherwise(0L)).cast("double") * 100 / count(lit(1)))
          .as("porc_rebote"),
        (sum(floor(col("v") * 60)).cast("double") / count(lit(1))).as("tprom_pagina"))
      // base genero/edad are never null, so NULL == not in this
      // grouping set; drop the 'unknown' groups per report (py:261-263)
      .where((col("genero").isNull || col("genero") =!= "unknown") &&
        (col("edad").isNull || col("edad") =!= "unknown"))
      .withColumn("report",
        when(col("genero").isNotNull && col("edad").isNotNull, lit("generoedad"))
          .when(col("genero").isNotNull, lit("genero"))
          .when(col("edad").isNotNull, lit("edad")).otherwise(lit("total")))
    grouped.unpivot(
      Array(col("report"), col("datetime"), col("genero"), col("edad")),
      AllVars.map(col).toArray, "variable", "value")
  }

  /** unir_demograficos (py:365-383) in long form: per (report, datetime,
    * variable) the demo values rescale to the total report's value —
    * round(v · total / Σdemo) — while the rate/average metrics pass
    * through unscaled; the total report rides along as target 'Total'.
    *
    * Both aggregates the rescale needs (the report's demo sum, the total
    * report's value) are WINDOW functions here, not self-joins: a
    * self-joining DAG re-plans the shared subtree and scans the fact
    * once per reference, while the windows keep the plan single-
    * reference — one fact scan — and run over the POST-aggregate report
    * table (O(hours × targets × metrics) rows, vanishing next to the
    * fact), which is the altitude where a window is the right tool.
    */
  private def allocated(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVar = Window.partitionBy(col("datetime"), col("variable"))
    val byReport = Window.partitionBy(col("report"), col("datetime"), col("variable"))
    reports(t)
      .withColumn("total_value", max(when(col("report") === "total", col("value"))).over(byVar))
      .withColumn("total_demo", sum(when(col("report") =!= "total", col("value"))).over(byReport))
      .withColumn("value",
        when(col("report") === "total", col("value"))
          .when(col("variable").isin(NoCalcVars: _*), col("value"))
          .when(col("total_demo") > 0,
            round(col("value") * col("total_value") / col("total_demo")))
          .otherwise(lit(0.0))) // the reference's trailing fillna(0)
      .select("datetime", "genero", "edad", "variable", "value")
  }

  /** formatear_tabla (py:388-443): pivot the variables back to columns
    * per (datetime, target), remap to the Tableau/text labels, derive
    * fecha/hora bounds, and synthesize the row id
    * fuente[0]_marca[:3]_yymmddHH_agreg_targetid (py:434-438).
    */
  def carga(t: Tables): DataFrame = {
    val gtex = when(col("genero") === "female", "Mujeres")
      .when(col("genero") === "male", "Hombres")
    val gtab = when(col("genero") === "female", "m")
      .when(col("genero") === "male", "h")
    val etab = regexp_replace(col("edad"), "[^0-9]", "")
    val target =
      when(col("genero").isNull && col("edad").isNull, lit("Total"))
        .when(col("edad").isNull, gtex)
        .when(col("genero").isNull, col("edad"))
        .otherwise(concat(gtex, lit(" "), col("edad")))
    val targetTab =
      when(col("genero").isNull && col("edad").isNull, lit("Tot. Pob."))
        .when(col("edad").isNull, gtab)
        .when(col("genero").isNull, etab)
        .otherwise(concat(gtab, lit(" "), etab))
    val wide = allocated(t)
      .select(col("datetime"), target.as("target"), targetTab.as("target_tableau"),
        col("variable"), col("value"))
      .groupBy("datetime", "target", "target_tableau")
      .agg(AllVars.map(v =>
        coalesce(max(when(col("variable") === v, col("value"))), lit(0.0)).as(v)).head,
        AllVars.map(v =>
          coalesce(max(when(col("variable") === v, col("value"))), lit(0.0)).as(v)).tail: _*)
    val targetId = lower(regexp_replace(col("target_tableau"), "\\W+", ""))
    wide.select(
        concat(lit("a_hor_"), date_format(col("datetime"), "yyMMddHH"),
          lit("_h_"), targetId).as("id"),
        col("datetime").cast("date").cast("string").as("fecha"),
        date_format(col("datetime"), "HH:mm:ss").as("hora_inicio"),
        date_format(col("datetime") + expr("INTERVAL 59 MINUTES 59 SECONDS"), "HH:mm:ss")
          .as("hora_termino"),
        lit("hora").as("periodo"), lit("hora").as("tipo"),
        lit("horizonte.cl").as("soporte"), lit("analytics").as("fuente_dato"),
        col("target"), col("target_tableau"),
        col("porc_rebote"), col("sesiones"), col("pag_vistas"),
        col("tprom_pagina"), col("usuarios_unicos"))
      .orderBy("id")
  }

  // ---- DuckDB oracle -------------------------------------------------

  private val EdadListSql = Edades.map(e => s"'$e'").mkString("[", ",", "]")

  private val OracleSql = {
    val metricCase = AllVars.map(v => s"WHEN '$v' THEN $v").mkString(" ")
    val pivotCols = AllVars.map(v =>
      s"coalesce(max(CASE WHEN variable = '$v' THEN value END), 0.0) AS $v").mkString(",\n    ")
    s"""WITH base AS (
       |  SELECT date_trunc('hour', ts) AS datetime, user_id, value AS v,
       |    CASE WHEN user_id % 7 = 0 THEN 'unknown'
       |         WHEN user_id % 2 = 0 THEN 'female' ELSE 'male' END AS genero,
       |    CASE WHEN user_id % 5 = 0 THEN 'unknown'
       |         ELSE $EdadListSql[CAST(user_id % 6 + 1 AS INT)] END AS edad
       |  FROM events WHERE user_id IS NOT NULL),
       |grouped AS (
       |  SELECT datetime, genero, edad,
       |    CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS usuarios_unicos,
       |    CAST(COUNT(*) AS DOUBLE) AS sesiones,
       |    CAST(CAST(SUM(floor(v)) AS BIGINT) AS DOUBLE) AS pag_vistas,
       |    CAST(CAST(SUM(CASE WHEN v < 5 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) * 100 / COUNT(*) AS porc_rebote,
       |    CAST(CAST(SUM(floor(v * 60)) AS BIGINT) AS DOUBLE) / COUNT(*) AS tprom_pagina
       |  FROM base
       |  GROUP BY GROUPING SETS ((datetime), (datetime, genero),
       |                          (datetime, edad), (datetime, genero, edad))),
       |reports AS (
       |  SELECT *, CASE WHEN genero IS NOT NULL AND edad IS NOT NULL THEN 'generoedad'
       |                 WHEN genero IS NOT NULL THEN 'genero'
       |                 WHEN edad IS NOT NULL THEN 'edad' ELSE 'total' END AS report
       |  FROM grouped
       |  WHERE (genero IS NULL OR genero <> 'unknown')
       |    AND (edad IS NULL OR edad <> 'unknown')),
       |long AS (
       |  SELECT report, datetime, genero, edad, m.variable,
       |    CASE m.variable $metricCase END AS value
       |  FROM reports CROSS JOIN (VALUES ${AllVars.map(v => s"('$v')").mkString(",")}) AS m(variable)),
       |total AS (
       |  SELECT datetime, variable, value AS total_value FROM long WHERE report = 'total'),
       |demo_sums AS (
       |  SELECT report, datetime, variable, SUM(value) AS total_demo
       |  FROM long WHERE report <> 'total' GROUP BY 1, 2, 3),
       |scaled AS (
       |  SELECT d.datetime, d.genero, d.edad, d.variable,
       |    CASE WHEN d.variable IN (${NoCalcVars.map(v => s"'$v'").mkString(",")}) THEN d.value
       |         WHEN s.total_demo > 0 THEN round(d.value * t.total_value / s.total_demo)
       |         ELSE 0.0 END AS value
       |  FROM long d
       |  JOIN demo_sums s ON d.report = s.report AND d.datetime = s.datetime AND d.variable = s.variable
       |  JOIN total t ON d.datetime = t.datetime AND d.variable = t.variable
       |  WHERE d.report <> 'total'),
       |unioned AS (
       |  SELECT datetime, CAST(NULL AS VARCHAR) AS genero, CAST(NULL AS VARCHAR) AS edad,
       |    variable, total_value AS value FROM total
       |  UNION ALL SELECT * FROM scaled),
       |labeled AS (
       |  SELECT datetime,
       |    CASE WHEN genero IS NULL AND edad IS NULL THEN 'Total'
       |         WHEN edad IS NULL THEN CASE genero WHEN 'female' THEN 'Mujeres' ELSE 'Hombres' END
       |         WHEN genero IS NULL THEN edad
       |         ELSE (CASE genero WHEN 'female' THEN 'Mujeres' ELSE 'Hombres' END) || ' ' || edad
       |    END AS target,
       |    CASE WHEN genero IS NULL AND edad IS NULL THEN 'Tot. Pob.'
       |         WHEN edad IS NULL THEN CASE genero WHEN 'female' THEN 'm' ELSE 'h' END
       |         WHEN genero IS NULL THEN regexp_replace(edad, '[^0-9]', '', 'g')
       |         ELSE (CASE genero WHEN 'female' THEN 'm' ELSE 'h' END) || ' ' ||
       |              regexp_replace(edad, '[^0-9]', '', 'g')
       |    END AS target_tableau,
       |    variable, value
       |  FROM unioned),
       |wide AS (
       |  SELECT datetime, target, target_tableau,
       |    $pivotCols
       |  FROM labeled GROUP BY 1, 2, 3)
       |SELECT
       |  'a_hor_' || strftime(datetime, '%y%m%d%H') || '_h_' ||
       |    lower(regexp_replace(target_tableau, '\\W+', '', 'g')) AS id,
       |  CAST(CAST(datetime AS DATE) AS VARCHAR) AS fecha,
       |  strftime(datetime, '%H:%M:%S') AS hora_inicio,
       |  strftime(datetime + INTERVAL 59 MINUTE + INTERVAL 59 SECOND, '%H:%M:%S') AS hora_termino,
       |  'hora' AS periodo, 'hora' AS tipo, 'horizonte.cl' AS soporte,
       |  'analytics' AS fuente_dato, target, target_tableau,
       |  porc_rebote, sesiones, pag_vistas, tprom_pagina, usuarios_unicos
       |FROM wide ORDER BY id""".stripMargin
  }

  val q67 = QueryDef("q67_trafico_digital", Some(OracleSql))(t => carga(t))

  override def queries: Seq[QueryDef] = Seq(q67)
}
