package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.catalog.GraftTable
import graft.operators.{MatView, Snapshot}
import graft.sources.{DvSnapshotRelation, SnapshotFileIndex}

/** MV AUTO-ROUTING: a query whose rollup matches a FRESH materialized
  * view's defining SQL answers from the MV's state instead of
  * re-aggregating the fact table — the warehouse behavior the
  * reference leans on implicitly (BigQuery routes matching rollups
  * onto its materialized views). At 100 TB this is the difference
  * between a metadata-sized scan of the rollup and a full pass over
  * the fact table the MV already paid for.
  *
  * Opt-in per session: `spark.graft.mv.autoRoute` names the candidate
  * MV paths (comma-separated). Unset, the rule is a single conf lookup
  * — zero cost to everyone else.
  *
  * Match tier (exact, conservative): the analyzed query subtree must
  * equal the MV's analyzed defining plan — same inner-join/filter tree
  * over the same source tables, same grouping, same aggregate
  * expressions, same output aliases — compared structurally with
  * attribute identity taken by lower-cased name and all plan-local ids
  * (attribute exprIds, alias ids, aggregate resultIds) normalized
  * away. No containment reasoning: a query the MV could serve via
  * further rollup stays on the fact table — wrong-but-routed is never
  * an option.
  *
  * Freshness gate, exact by construction: every source LEAF in the
  * query is pinned at one version (snapshot reader isolation); the
  * rewrite fires only when each leaf's pinned version EQUALS the MV's
  * recorded watermark for that source — the MV state then IS the
  * query's answer bitwise, regardless of what committed since. A stale
  * MV (source advanced past the watermark) silently stays unrouted.
  */
case class MvAutoRoute(session: SparkSession) extends Rule[LogicalPlan] {
  import MvAutoRoute._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = session.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty)
    if (conf.isEmpty || inRoute.get() || !plan.resolved) return plan
    val entries = conf.get.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      .flatMap(p => entryFor(session, p))
    if (entries.isEmpty) return plan
    plan.transformUpWithSubqueries {
      case agg: Aggregate if agg.resolved =>
        entries.iterator
          .filter(e => same(agg, e.defining, e.watermarks))
          .map(e => replace(e, agg))
          .collectFirst { case Some(p) => p }
          .getOrElse(agg)
    }
  }

  private def qr(path: String): String = Snapshot.qualifiedRoot(session, path)

  private def entryFor(session: SparkSession, mvPath: String): Option[Entry] =
    MatView.routeInfo(session, mvPath).flatMap { case (ver, sqlText, srcs) =>
      cache.computeIfAbsent((qr(mvPath), ver), _ => {
        val resolved = srcs.map { case (parts, wm) =>
          GraftCatalogResolve.pathOf(session, parts).flatMap(p => wm.map(qr(p) -> _))
        }
        if (resolved.exists(_.isEmpty)) None // non-catalog source or no watermark
        else {
          val analyzed =
            try {
              inRoute.set(true)
              PlanBridge.dataFrame(session,
                session.sessionState.sqlParser.parsePlan(sqlText))
                .queryExecution.analyzed
            } catch { case _: Exception => null }
            finally inRoute.set(false)
          if (analyzed == null) None
          else Some(Entry(mvPath, ver, resolved.flatten.toMap, analyzed))
        }
      })
    }

  /** (qualified table root, pinned version) when the node is a snapshot
    * scan leaf — both the native relation and the DV/column-mapping
    * fallback, plus the pre-swap v2 form.
    */
  private def leafInfo(p: LogicalPlan): Option[(String, Long)] = p match {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case i: SnapshotFileIndex => Some((qr(i.pinnedPath), i.pinnedManifest.version))
        case _ => None
      }
      case d: DvSnapshotRelation => Some((qr(d.pinnedPath), d.pinnedManifest.version))
      case _ => None
    }
    case DataSourceV2Relation(t: GraftTable, _, _, _, _, _) =>
      Some((qr(t.path), t.manifest.version))
    case _ => None
  }

  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => strip(c)
    case other => other
  }

  /** Expression identity across two independently-analyzed plans over
    * the same tables: attribute references compare by lower-cased NAME
    * (their exprIds are plan-local and AttributeReference.equals
    * includes them); AggregateExpression resultIds and alias ids/case
    * are normalized away. Both sides resolve the same table schemas, so
    * name identity is exactly as strong as the SQL text's.
    */
  private def norm(e: Expression): Expression = e.transformUp {
    case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(ar.name.toLowerCase))
    case ae: AggregateExpression => ae.copy(resultId = ExprId(0))
    case al: Alias => Alias(al.child, al.name.toLowerCase)(exprId = ExprId(0))
  }

  private def same(a0: LogicalPlan, b0: LogicalPlan,
                   wm: Map[String, Long]): Boolean = {
    val (a, b) = (strip(a0), strip(b0))
    (leafInfo(a), leafInfo(b)) match {
      case (Some((pa, va)), Some((pb, _))) =>
        // the freshness gate: the QUERY's pinned version must equal the
        // MV's watermark — then the MV state is the answer bitwise
        pa == pb && wm.get(pa).contains(va)
      case (None, None) => (a, b) match {
        case (Filter(c1, x), Filter(c2, y)) =>
          norm(c1) == norm(c2) && same(x, y, wm)
        case (Join(l1, r1, t1, c1, _), Join(l2, r2, t2, c2, _)) =>
          t1 == t2 && c1.map(norm) == c2.map(norm) &&
            same(l1, l2, wm) && same(r1, r2, wm)
        case (Aggregate(g1, a1, x, _), Aggregate(g2, a2, y, _)) =>
          g1.map(norm) == g2.map(norm) && a1.map(norm) == a2.map(norm) &&
            same(x, y, wm)
        case (Project(p1, x), Project(p2, y)) =>
          p1.map(norm) == p2.map(norm) && same(x, y, wm)
        case _ => false
      }
      case _ => false
    }
  }

  /** The MV scan, re-labeled to the replaced Aggregate's output
    * attribute ids so the swap is invisible to everything above.
    */
  private def replace(e: Entry, agg: Aggregate): Option[LogicalPlan] = {
    val mvPlan =
      try {
        inRoute.set(true)
        session.read.format("graft.sources.SnapshotSource").load(e.mvPath)
          .queryExecution.analyzed
      } catch { case _: Exception => return None }
      finally inRoute.set(false)
    // the MV must still be at the version the entry described
    if (!leafInfo(strip(mvPlan)).exists(_._2 == e.mvVersion)) return None
    if (mvPlan.output.size != agg.output.size) return None
    val aligned = agg.output.zip(mvPlan.output).forall { case (o, m) =>
      o.name.equalsIgnoreCase(m.name) && o.dataType == m.dataType }
    if (!aligned) return None
    Some(Project(agg.output.zip(mvPlan.output).map { case (o, m) =>
      Alias(m, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, mvPlan))
  }
}

object MvAutoRoute {
  val ConfKey = "spark.graft.mv.autoRoute"

  /** Re-entrancy guard: analyzing the defining SQL (or the MV scan)
    * inside the rule runs the analyzer, which runs this rule.
    */
  private[plans] val inRoute = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  private final case class Entry(mvPath: String, mvVersion: Long,
                                 watermarks: Map[String, Long],
                                 defining: LogicalPlan)

  /** Entries keyed by (qualified MV root, MV version): a REFRESH bumps
    * the version and naturally invalidates; stale keys are harmless
    * (bounded by refresh count, metadata-sized).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Option[Entry]]()
}
