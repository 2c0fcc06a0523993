package graft.pipelines

import org.apache.spark.sql.SparkSession

import graft.operators.{MatView, Snapshot}

/** FLEET-WIDE MAINTENANCE from per-table policy — the nightly loop the
  * reference runs as per-dataset Airflow jobs, collapsed to ONE tick
  * over a table list: each table declares its own rules as `graft.*`
  * properties and the loop needs no per-table knowledge.
  *
  *  - `graft.mv.refreshEvery = n` (declared via `ALTER MATERIALIZED
  *    VIEW mv SET REFRESH EVERY n TICKS`): the view refreshes on every
  *    tick divisible by n — the declared form of the reference's
  *    schedule-driven rollup recomputes (audio_digital.py re-runs its
  *    destination queries per Airflow tick). Ticks are caller-supplied
  *    integers, like [[Runner.backfill]]'s periods: the clock stays
  *    outside, so maintenance is deterministic and testable.
  *  - `graft.optimize.targetBytes`: OPTIMIZE (compaction at the
  *    declared target, z-order by declared clustering, bloom sidecar
  *    refresh — the [[Snapshot.compact]] policy body).
  *  - `graft.vacuum.retainVersions` / `graft.vacuum.retainDays`:
  *    VACUUM under the table's own retention.
  *
  * Each table is one [[Runner.Stage]] under the tick's OWN flag
  * namespace, so the whole loop inherits the DAG runner's
  * crash-resume contract: a crash between a table's refresh COMMIT and
  * its flag re-runs the stage on the next invocation, where the
  * refresh no-ops (the watermark already advanced — [[MatView.refresh]]
  * is idempotent), OPTIMIZE finds nothing to compact, and VACUUM
  * re-lists. Exactly-once effects, at-least-once execution.
  *
  * Order within a stage: REFRESH before OPTIMIZE (the refresh's
  * whole-state rewrite is what compaction then packs), VACUUM last
  * (it reclaims what the other two retired).
  */
object Maintenance {

  /** One maintenance pass over one table, policy-driven. */
  def maintain(spark: SparkSession, path: String,
               tick: Long, resolvePath: Seq[String] => String): Unit =
    Snapshot.latestManifest(spark, path).foreach { m =>
      if (MatView.isMatView(m))
        Snapshot.policyLong(m, "mv.refreshEvery").filter(_ > 0).foreach { n =>
          if (tick % n == 0) MatView.refresh(spark, path, resolvePath)
        }
      if (Snapshot.policyLong(m, "optimize.targetBytes").exists(_ > 0))
        Snapshot.compact(spark, path)
      if (Snapshot.policyLong(m, "vacuum.retainVersions").isDefined ||
          Snapshot.policyLong(m, "vacuum.retainDays").isDefined)
        Snapshot.vacuumPolicy(spark, path)
    }

  /** The tick's stages: one per table, independent (no deps — a broken
    * table must not block the fleet).
    */
  def stages(spark: SparkSession, tables: Seq[(String, String)],
             tick: Long, resolvePath: Seq[String] => String): Seq[Runner.Stage] =
    tables.map { case (name, path) =>
      Runner.Stage(s"maintain_$name")(() => maintain(spark, path, tick, resolvePath))
    }

  /** Run one fleet tick through the DAG runner. Flags live under
    * `flagDir/tick_<tick>` — a re-run of a completed tick costs one
    * directory listing; a crashed tick resumes from its failed table.
    */
  def tick(spark: SparkSession, tables: Seq[(String, String)], tick: Long,
           flagDir: String, resolvePath: Seq[String] => String,
           resume: Boolean = true): Map[String, Runner.Outcome] =
    Runner.run(spark, stages(spark, tables, tick, resolvePath),
      s"$flagDir/tick_$tick", resume)

  /** [[tick]] over EVERY table in a graft-catalog namespace
    * (`<catalog>.<ns…>`) — the zero-configuration fleet form: one
    * bounded directory listing discovers the tables, each table's own
    * policy properties decide what (if anything) runs, and MV source
    * names resolve through the session catalogs. A table created
    * tomorrow is maintained tomorrow night with no job change.
    */
  def tickNamespace(spark: SparkSession, namespace: String, tick: Long,
                    flagDir: String,
                    resume: Boolean = true): Map[String, Runner.Outcome] = {
    val parts = namespace.split('.').map(_.trim).filter(_.nonEmpty).toSeq
    require(parts.size >= 2, s"namespace must be <catalog>.<ns…>: $namespace")
    val cm = spark.sessionState.catalogManager
    require(cm.isCatalogRegistered(parts.head), s"unknown catalog: ${parts.head}")
    val tables = cm.catalog(parts.head) match {
      case g: graft.catalog.GraftCatalog =>
        g.listTables(parts.tail.toArray).toSeq
          .map(id => id.name() -> g.pathFor(id)).sortBy(_._1)
      case other => throw new IllegalArgumentException(
        s"not a graft catalog: ${parts.head} (${other.getClass.getSimpleName})")
    }
    this.tick(spark, tables, tick, flagDir,
      graft.plans.GraftCatalogResolve.pathOf(spark, _).getOrElse(
        throw new IllegalArgumentException("MV source outside the graft catalogs")),
      resume)
  }
}
