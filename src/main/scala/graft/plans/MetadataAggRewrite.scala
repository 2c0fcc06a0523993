package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.operators.{Snapshot, SnapshotStats}
import graft.sources.{DvSnapshotRelation, SnapshotFileIndex}

/** Metadata-only aggregation under the VANILLA SQL front end.
  *
  * `SELECT count(*), min(c), max(c), count(c) FROM snapshot_table`
  * — the reference's row-count sanity probes and watermark lookups
  * (e.g. the MAX(date) "where did the last load stop" query every
  * incremental DAG issues before extracting, consumo_detalle.py's
  * delete-window bounds) — needs ZERO data files on a snapshot table:
  * the manifest already carries exact per-file row counts and exact
  * per-column min/max/null-count reduced from the parquet footers at
  * commit time. On 100 TB that is the difference between a
  * sub-second planning-time answer and a full-table scan, and it is
  * what every production lakehouse does for `count(*)`.
  *
  * The rewrite fires only when the answer is PROVABLY the same row
  * the scan would return:
  *
  *  - whole-table aggregate: empty grouping, and the child is the
  *    bare snapshot relation (possibly under a column-pruning
  *    Project) — any Filter, join or generator in between disables
  *    the rewrite;
  *  - every output expression is `count(<non-null literal>)`
  *    (count(*)), `count(col)`, `min(col)`, `max(col)` — no
  *    DISTINCT, no FILTER clause — or a plain literal;
  *  - every live file carries usable stats; string stats must be
  *    exact (not truncated at collection) and every recorded bound
  *    must decode — [[SnapshotStats.metadataAgg]] REFUSES otherwise
  *    and the plan stays a real scan: wrong-but-fast is never an
  *    option;
  *  - per-column aggregates additionally require a vector-free
  *    version (a deleted row may have been a file's min/max/null
  *    carrier). Pure `count(*)` stays exact even under deletion
  *    vectors — live rows = `stats.rows − dv.rows`, both manifest
  *    metadata — and under active column mapping, so it also serves
  *    the merge-on-read fallback relation.
  *
  * The aggregate folds driver-side from O(#files) manifest entries;
  * the whole Aggregate subtree is replaced by a one-row
  * [[LocalRelation]], so the final plan touches no files at all.
  */
case class MetadataAggRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  import MetadataAggRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      val rewritten =
        for {
          rel <- unwrap(child)
          m <- snapshotManifest(rel)
          cells <- classifyAll(aggExprs)
          local <- answer(agg.output, cells, m)
        } yield local
      rewritten.getOrElse(agg)
  }

  /** The bare relation, looking through column-pruning Projects only
    * (attribute-only project lists — anything computed, and the
    * aggregate is no longer over the raw table).
    */
  @annotation.tailrec
  private def unwrap(p: LogicalPlan): Option[LogicalRelation] = p match {
    case l: LogicalRelation if !l.isStreaming => Some(l)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => unwrap(c)
    case _ => None
  }

  /** The pinned manifest when the relation is a snapshot scan — the
    * native FileIndex path or the DV/column-mapping fallback (both pin
    * one version at resolution, so the fold answers for exactly the
    * version the scan would read, time travel included).
    */
  private def snapshotManifest(l: LogicalRelation): Option[Snapshot.Manifest] =
    l.relation match {
      case h: HadoopFsRelation => h.location match {
        case i: SnapshotFileIndex => Some(i.pinnedManifest)
        case _ => None
      }
      case d: DvSnapshotRelation => Some(d.pinnedManifest)
      case _ => None
    }

  private def classifyAll(es: Seq[NamedExpression]): Option[Seq[Cell]] = {
    val cells = es.map(classify)
    if (cells.forall(_.isDefined)) Some(cells.flatten) else None
  }

  private def classify(ne: NamedExpression): Option[Cell] = ne match {
    case Alias(child, _) => classifyExpr(child)
    case _ => classifyExpr(ne)
  }

  private def classifyExpr(e: Expression): Option[Cell] = e match {
    case ae: AggregateExpression if ae.filter.isEmpty && !ae.isDistinct =>
      ae.aggregateFunction match {
        // count(*) / count(1): every argument a non-null constant
        case Count(es) if es.nonEmpty && es.forall(x =>
            x.foldable && x.eval(InternalRow.empty) != null) => Some(RowCount)
        case Count(Seq(a: AttributeReference)) => Some(NonNullCount(a.name))
        case Min(a: AttributeReference) => Some(MinOf(a.name, a.dataType))
        case Max(a: AttributeReference) => Some(MaxOf(a.name, a.dataType))
        case _ => None
      }
    // `CAST(max(c) AS date)` etc — ubiquitous in ported SQL; the cast
    // folds over the computed value at rewrite time
    case c: Cast => classifyExpr(c.child).map(CastCell(_, c))
    case l: Literal => Some(Passthrough(l.value))
    case _ => None
  }

  private def answer(output: Seq[Attribute], cells: Seq[Cell],
                     m: Snapshot.Manifest): Option[LogicalPlan] = {
    // every live file must carry stats — an imported file without a
    // recorded row count makes even count(*) unanswerable
    if (!m.files.forall(m.stats.contains)) return None
    def colsOf(cell: Cell): Seq[String] = cell match {
      case NonNullCount(c) => Seq(c)
      case MinOf(c, _) => Seq(c)
      case MaxOf(c, _) => Seq(c)
      case CastCell(inner, _) => colsOf(inner)
      case _ => Nil
    }
    val cols = cells.flatMap(colsOf).distinct
    if (cols.isEmpty) {
      val n = m.files.iterator
        .map(f => m.stats(f).rows - m.dvs.get(f).map(_.rows).getOrElse(0L)).sum
      build(output, cells, n, Map.empty, Map.empty, Map.empty)
    } else {
      val live = m.files.toSet
      if (m.dvs.keysIterator.exists(live)) return None
      try {
        val row = SnapshotStats.metadataAgg(session, m, cols).collect()(0)
        val n = row.getLong(row.fieldIndex("n"))
        val mins = cols.map(c => c -> row.get(row.fieldIndex(s"min_$c"))).toMap
        val maxs = cols.map(c => c -> row.get(row.fieldIndex(s"max_$c"))).toMap
        val cnts = cols.map(c => c -> row.getLong(row.fieldIndex(s"cnt_$c"))).toMap
        build(output, cells, n, mins, maxs, cnts)
      } catch {
        // unusable / truncated / undecodable stats: the engine refused
        // — fall back to the real scan (never wrong-but-fast)
        case NonFatal(_) => None
      }
    }
  }

  private def build(output: Seq[Attribute], cells: Seq[Cell], n: Long,
                    mins: Map[String, Any], maxs: Map[String, Any],
                    cnts: Map[String, Long]): Option[LogicalPlan] = {
    try {
      // internal (Catalyst) value of one cell; a cast evaluates over
      // the already-folded inner value
      def eval(cell: Cell): Any = cell match {
        case RowCount => n
        case NonNullCount(c) => cnts(c)
        case MinOf(c, dt) =>
          CatalystTypeConverters.createToCatalystConverter(dt)(mins(c))
        case MaxOf(c, dt) =>
          CatalystTypeConverters.createToCatalystConverter(dt)(maxs(c))
        case Passthrough(v) => v
        case CastCell(inner, cast) =>
          cast.withNewChildren(Seq(Literal(eval(inner), cast.child.dataType)))
            .eval(InternalRow.empty)
      }
      val values = cells.map(eval)
      Some(LocalRelation(output, Seq(InternalRow.fromSeq(values)),
        isStreaming = false, None))
    } catch { case NonFatal(_) => None }
  }
}

private object MetadataAggRewrite {
  sealed trait Cell
  case object RowCount extends Cell
  final case class NonNullCount(col: String) extends Cell
  final case class MinOf(col: String, dt: org.apache.spark.sql.types.DataType) extends Cell
  final case class MaxOf(col: String, dt: org.apache.spark.sql.types.DataType) extends Cell
  final case class Passthrough(value: Any) extends Cell
  final case class CastCell(inner: Cell, cast: Cast) extends Cell
}
