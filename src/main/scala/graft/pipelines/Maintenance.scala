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
    * table must not block the fleet), ORDERED sources-first: a STACKED
    * materialized view (an MV whose defining SQL reads another table in
    * this tick's list — the reference's hora → diario → mensual rollup
    * family as materialized tiers) must refresh AFTER its source, or
    * the whole cascade lands one tick stale. [[dependencyOrder]] sorts
    * topologically by resolved MV-source edges; stages stay dep-FREE so
    * a failed upstream doesn't block the downstream (its refresh just
    * folds to the upstream's last committed version — still exact).
    */
  def stages(spark: SparkSession, tables: Seq[(String, String)],
             tick: Long, resolvePath: Seq[String] => String): Seq[Runner.Stage] =
    dependencyOrder(spark, tables, resolvePath).map { case (name, path) =>
      Runner.Stage(s"maintain_$name")(() => maintain(spark, path, tick, resolvePath))
    }

  /** Stable topological order of the tick's tables by MV-source edges:
    * each MV's recorded source names resolve through `resolvePath` and
    * match other listed tables by qualified root. Kahn's algorithm with
    * the given order as the tie-break; an unresolvable source (outside
    * the fleet, or a resolver error) simply contributes no edge, and a
    * cycle (impossible for MVs — creation requires existing sources)
    * degrades to the given order for the strongly-connected remainder.
    */
  private[pipelines] def dependencyOrder(
      spark: SparkSession, tables: Seq[(String, String)],
      resolvePath: Seq[String] => String): Seq[(String, String)] = {
    if (tables.size < 2) return tables
    val rootOf = tables.map { case (n, p) =>
      n -> (try Snapshot.qualifiedRoot(spark, p) catch { case _: Exception => p })
    }.toMap
    val byRoot = rootOf.map(_.swap)
    val srcsOf: Map[String, Set[String]] = tables.map { case (n, p) =>
      n -> (Snapshot.latestManifest(spark, p) match {
        case Some(m) if MatView.isMatView(m) =>
          m.properties.getOrElse(MatView.SourceProp, "").split(',').toSet
            .filter(_.nonEmpty)
            .flatMap { srcName =>
              try byRoot.get(Snapshot.qualifiedRoot(spark,
                resolvePath(srcName.split('.').toSeq)))
              catch { case _: Exception => None }
            } - n
        case _ => Set.empty[String]
      })
    }.toMap
    val remaining = scala.collection.mutable.LinkedHashMap(tables: _*)
    val done = scala.collection.mutable.Set.empty[String]
    val out = Seq.newBuilder[(String, String)]
    while (remaining.nonEmpty) {
      val ready = remaining.keys.find(n => srcsOf(n).forall(done))
      // no ready node = a cycle: emit the first remaining as-is
      val next = ready.getOrElse(remaining.keys.head)
      out += next -> remaining.remove(next).get
      done += next
    }
    out.result()
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
