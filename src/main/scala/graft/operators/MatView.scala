package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** MATERIALIZED VIEWS as first-class objects: a snapshot table that
  * carries its own DEFINING SQL and a SOURCE WATERMARK in its manifest
  * properties, refreshed on demand — the declared form of the
  * hand-built incremental rollups (q119/q138) and of the reference's
  * "recompute the destination table every tick" QueryJobConfig
  * materializations (audio_digital.py:350, liveod_editorial.py:282).
  *
  *  - `CREATE MATERIALIZED VIEW mv AS SELECT …` ([[create]]): executes
  *    the defining query against the source PINNED at one version (no
  *    torn reads under concurrent source commits), lands the result as
  *    a snapshot table whose properties carry the SQL text, the source
  *    table name, and the watermark (`streamBatch` keyed by
  *    [[ConsumerId]], exactly like every feed consumer).
  *  - `REFRESH MATERIALIZED VIEW mv` ([[refresh]]): advances the MV to
  *    the source's current version. When the defining query is an
  *    ADDITIVE ROLLUP (`SELECT keys…, COUNT(*) …, SUM(expr)… FROM src
  *    [WHERE pred] GROUP BY keys`), the refresh is INCREMENTAL: it
  *    reads only the net change feed for the window
  *    ([[Snapshot.readChanges]], O(changed files) — the unchanged
  *    100 TB is never touched), folds signed per-group deltas into the
  *    current state, and drops groups whose row count reaches zero —
  *    bitwise-identical to a full recompute when the SUM state is
  *    exact (decimal/integer; the one caveat is a group whose value
  *    column is ENTIRELY null across history: the fold stores NULL by
  *    delta-null tracking, which matches recompute except when deletes
  *    empty the non-null subset exactly — use exact types and non-null
  *    measures for bitwise parity). Any other defining shape (joins,
  *    distinct counts, windows) falls back to a FULL PINNED recompute —
  *    always correct, cost declared.
  *
  * Exactly-once, the [[graft.streaming.FeedConsumer]] contract: state
  * and watermark publish in ONE commit versioned against the manifest
  * the refresh read — a crash before the commit leaves the old
  * watermark (the rerun re-folds the same window onto the same pinned
  * state), a redelivered refresh no-ops, a concurrent MV commit
  * version-conflicts and refuses rather than silently losing either.
  */
object MatView {

  private[graft] val SqlProp = "graft.mv.sql"
  private[graft] val SourceProp = "graft.mv.source"
  private[graft] val ConsumerId = "__graft_mv"

  /** Is this snapshot table a materialized view? */
  def isMatView(m: Snapshot.Manifest): Boolean = m.properties.contains(SqlProp)

  /** CREATE MATERIALIZED VIEW: run `sqlText` against its single source
    * table pinned at the source's current version, land the result as
    * a new snapshot table at `mvPath` carrying the defining SQL and
    * the watermark. `resolvePath` maps the source's (possibly
    * qualified) name in the SQL to its snapshot path — the catalog
    * route resolves through the session catalogs, the registry route
    * through its table map.
    */
  def create(spark: SparkSession, mvPath: String, sqlText: String,
             resolvePath: Seq[String] => String): Long = {
    Snapshot.requireNotInGroup("CREATE MATERIALIZED VIEW") // two commits
    require(Snapshot.latestVersion(spark, mvPath).isEmpty,
      s"materialized view already exists: $mvPath")
    val plan = spark.sessionState.sqlParser.parsePlan(sqlText)
    val srcParts = sourceRelation(plan, sqlText)
    val srcPath = resolvePath(srcParts)
    val vSrc = Snapshot.latestVersion(spark, srcPath).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view source is not a snapshot table: $srcPath"))
    val result = pinnedResult(spark, plan, srcParts, srcPath, vSrc)
    Snapshot.create(spark, mvPath, result,
      properties = Map(SqlProp -> sqlText, SourceProp -> srcParts.mkString(".")))
    // watermark rides a follow-up metadata commit on the fresh table
    // (create() owns version 1); both commits precede any reader
    val m = Snapshot.latestManifest(spark, mvPath).get
    Snapshot.commitMetaOn(spark, mvPath, m, s"MATERIALIZE v$vSrc")(mm =>
      mm.copy(streamBatch = mm.streamBatch + (ConsumerId -> vSrc)))
  }

  /** REFRESH MATERIALIZED VIEW: advance to the source's latest version
    * — incrementally for additive-rollup shapes, by full pinned
    * recompute otherwise. Returns Some(from → to) when the view
    * advanced, None when already current.
    */
  def refresh(spark: SparkSession, mvPath: String,
              resolvePath: Seq[String] => String): Option[(Long, Long)] = {
    val mvM = Snapshot.latestManifest(spark, mvPath).getOrElse(
      throw new IllegalArgumentException(s"not a snapshot table: $mvPath"))
    val sqlText = mvM.properties.getOrElse(SqlProp, throw new IllegalArgumentException(
      s"not a materialized view (no $SqlProp property): $mvPath"))
    val plan = spark.sessionState.sqlParser.parsePlan(sqlText)
    val srcParts = sourceRelation(plan, sqlText)
    val srcPath = resolvePath(srcParts)
    val vNow = Snapshot.latestVersion(spark, srcPath).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view source is not a snapshot table: $srcPath"))
    val vFrom = mvM.streamBatch.get(ConsumerId)
    if (vFrom.exists(_ >= vNow)) return None
    val stamp = (m: Snapshot.Manifest) =>
      m.copy(streamBatch = m.streamBatch + (ConsumerId -> vNow))
    // the incremental path needs a READABLE, SCHEMA-STABLE window:
    // a source schema change inside it (readChanges refuses those) or
    // a vacuum that reclaimed the watermark version both demote this
    // refresh to the always-correct full pinned recompute
    def windowOk(v: Long): Boolean =
      try Snapshot.manifest(spark, srcPath, v).schemaDdl ==
        Snapshot.manifest(spark, srcPath, vNow).schemaDdl
      catch { case _: java.io.FileNotFoundException => false }
    val incremental = vFrom.filter(windowOk).flatMap(v => rollupShape(plan).map(v -> _))
    incremental match {
      case Some((v, shape)) =>
        // O(change): the net feed over the window, folded as signed
        // per-group deltas into the PINNED current state
        val feed = Snapshot.readChanges(spark, srcPath, v, vNow, net = true)
        val filtered = shape.pred.map(p => feed.where(ColumnBridge.column(p)))
          .getOrElse(feed)
        val current = Snapshot.readManifestFiles(spark, mvPath, mvM, mvM.files)
        val next = foldDeltas(current, filtered, shape)
        if (filtered.isEmpty)
          Snapshot.commitMetaOn(spark, mvPath, mvM,
            s"REFRESH MATERIALIZED VIEW v$vNow (no-op window)")(stamp)
        else
          Snapshot.replaceWholeTableOn(spark, mvPath, mvM, next,
            op = s"REFRESH MATERIALIZED VIEW v$vNow (incremental)", finish = stamp)
      case None =>
        val result = pinnedResult(spark, plan, srcParts, srcPath, vNow)
        Snapshot.replaceWholeTableOn(spark, mvPath, mvM, result,
          op = s"REFRESH MATERIALIZED VIEW v$vNow (full recompute)", finish = stamp)
    }
    Some(vFrom.getOrElse(0L) -> vNow)
  }

  // ----------------------------------------------------------- internals

  /** The single source relation the defining SQL reads (every
    * occurrence must name the same table — self-joins of one source
    * are fine, multi-table queries refresh as full recomputes only if
    * we could watermark them all, so v1 refuses them at CREATE).
    */
  private def sourceRelation(plan: LogicalPlan, sqlText: String): Seq[String] = {
    val rels = plan.collect { case r: UnresolvedRelation => r.multipartIdentifier }
    require(rels.nonEmpty, s"materialized view query reads no table: $sqlText")
    val distinct = rels.map(_.map(_.toLowerCase)).distinct
    require(distinct.size == 1,
      "materialized view over MULTIPLE source tables is not supported " +
        s"(found: ${distinct.map(_.mkString(".")).mkString(", ")}) — " +
        "materialize the single-table core and join at read time")
    rels.head
  }

  /** Execute the defining plan with every source occurrence substituted
    * by a read PINNED at `version` — no torn reads: the result and the
    * watermark name exactly the same source state even under concurrent
    * source commits.
    */
  private def pinnedResult(spark: SparkSession, plan: LogicalPlan,
                           srcParts: Seq[String], srcPath: String,
                           version: Long): DataFrame = {
    val pinned = Snapshot.readVersion(spark, srcPath, version)
      .queryExecution.logical
    val key = srcParts.map(_.toLowerCase)
    val swapped = plan.transformUp {
      case r: UnresolvedRelation if r.multipartIdentifier.map(_.toLowerCase) == key =>
        SubqueryAlias(srcParts.last, pinned)
    }
    PlanBridge.dataFrame(spark, swapped)
  }

  /** The additive-rollup shape the incremental path handles:
    * `SELECT keys…, aggs… FROM src [WHERE pred] GROUP BY keys` where
    * every agg is COUNT(*) or SUM(deterministic expr), at least one
    * COUNT(*) present (it carries group liveness — a group whose count
    * reaches zero drops, exactly like the recompute).
    */
  private final case class Shape(keys: Seq[String],
                                 cols: Seq[(String, AggCol)],
                                 pred: Option[Expression])
  private sealed trait AggCol
  private case object KeyCol extends AggCol
  private case object CountStar extends AggCol
  private final case class SumOf(e: Expression) extends AggCol

  private def rollupShape(plan: LogicalPlan): Option[Shape] = plan match {
    case Aggregate(groupingExprs, aggExprs, child, _) =>
      val keys = groupingExprs.map {
        case a: UnresolvedAttribute if a.nameParts.size == 1 => a.nameParts.head
        case _ => return None // ordinals, expressions: full recompute
      }
      val pred = child match {
        case _: UnresolvedRelation => None
        case Filter(p, _: UnresolvedRelation) =>
          if (!p.deterministic || p.containsPattern(
            org.apache.spark.sql.catalyst.trees.TreePattern.PLAN_EXPRESSION)) return None
          Some(p)
        case _ => return None
      }
      def aggOf(e: Expression): Option[AggCol] = e match {
        case f: UnresolvedFunction
            if f.nameParts.map(_.toLowerCase) == Seq("count") && !f.isDistinct =>
          f.arguments match {
            case Seq(Literal(1, _)) => Some(CountStar)
            case Seq(_: UnresolvedStar) => Some(CountStar)
            case _ => None // count(col) skips nulls: full recompute
          }
        case f: UnresolvedFunction
            if f.nameParts.map(_.toLowerCase) == Seq("sum") && !f.isDistinct =>
          f.arguments match {
            case Seq(arg) if arg.deterministic &&
              arg.collectFirst { case g: UnresolvedFunction => g }.isEmpty =>
              Some(SumOf(arg))
            case _ => None
          }
        case _ => None
      }
      val cols = aggExprs.map {
        case a: UnresolvedAttribute
            if a.nameParts.size == 1 && keys.contains(a.nameParts.head) =>
          a.nameParts.head -> (KeyCol: AggCol)
        case Alias(child, name) =>
          aggOf(child) match {
            case Some(c) => name -> c
            case None => return None
          }
        case _ => return None // unaliased aggs would break the oracle anyway
      }
      if (!cols.exists(_._2 == CountStar)) return None // liveness column required
      // every GROUP BY key must be SELECTed: otherwise the MV state
      // lacks the key column and foldDeltas' join on __cur.<key> would
      // fail at REFRESH time (an un-refreshable view) instead of
      // demoting here to the always-correct full recompute
      if (!keys.forall(k => cols.exists(c => c._1 == k && c._2 == KeyCol))) return None
      Some(Shape(keys, cols, pred))
    case _ => None
  }

  /** Fold the signed feed deltas into the current state. Null-safe on
    * group keys (GROUP BY treats nulls as one group, so must the join).
    */
  private def foldDeltas(current: DataFrame, feed: DataFrame, shape: Shape): DataFrame = {
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val aggs = shape.cols.collect {
      case (name, CountStar) => sum(sign).as(s"__d_$name")
      case (name, SumOf(e)) =>
        sum(ColumnBridge.column(e) * sign).as(s"__d_$name")
    }
    val delta = feed.groupBy(shape.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val cur = current.alias("__cur")
    val dlt = delta.alias("__dlt")
    val on = shape.keys.map(k => col(s"__cur.$k") <=> col(s"__dlt.$k"))
      .reduce(_ && _)
    val curSchema = current.schema
    def outCol(name: String, c: AggCol): Column = c match {
      case KeyCol => coalesce(col(s"__cur.$name"), col(s"__dlt.$name")).as(name)
      case CountStar =>
        (coalesce(col(s"__cur.$name"), lit(0L)) +
          coalesce(col(s"__d_$name"), lit(0L)))
          .cast(curSchema(name).dataType).as(name)
      case SumOf(_) =>
        // delta-null tracking: both sides null stays null (an all-null
        // group), anything else folds arithmetically
        when(col(s"__cur.$name").isNull && col(s"__d_$name").isNull,
          lit(null).cast(curSchema(name).dataType))
          .otherwise((coalesce(col(s"__cur.$name"), lit(0)) +
            coalesce(col(s"__d_$name"), lit(0)))
            .cast(curSchema(name).dataType)).as(name)
    }
    val liveness = shape.cols.collectFirst { case (n, CountStar) => n }.get
    cur.join(dlt, on, "full_outer")
      .select(shape.cols.map { case (n, c) => outCol(n, c) }: _*)
      .where(col(liveness) > 0)
  }
}
