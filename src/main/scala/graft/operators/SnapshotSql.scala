package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-text front end for snapshot-table maintenance.
  *
  * The reference's table maintenance is literal SQL strings handed to
  * the warehouse — `DELETE FROM t WHERE fecha >= cutoff`
  * (consumo_detalle.py:317-340), and an aliased MERGE with explicit
  * assignment arms (funnel_live.py:155-172):
  *
  * {{{
  *   MERGE target t_final USING updates t_update
  *   ON t_final.id = t_update.id
  *   WHEN MATCHED THEN UPDATE SET minutes = t_update.minutes, …
  *   WHEN NOT MATCHED THEN INSERT (id, fecha, …) VALUES (id, fecha, …)
  * }}}
  *
  * This front end lets a user porting a reference script hand over
  * that text unchanged (modulo table names): the SESSION parser does
  * all the parsing (no hand-rolled SQL grammar) — `parsePlan` yields
  * the standard `DeleteFromTable` / `UpdateTable` / `MergeIntoTable`
  * nodes, whose predicates and assignments are rewrapped as Columns
  * and routed to the engine tiers ([[Snapshot.delete]] with its
  * deletion-vector path, [[Snapshot.update]], [[Snapshot.mergeById]]
  * for `SET * / INSERT *`, [[Snapshot.mergeArms]] for explicit arms) —
  * so SQL-text DML and the Scala API are ONE code path with one set of
  * semantics, and everything the session parser accepts in a predicate
  * (BETWEEN, IN lists, nested boolean algebra, casts, functions) works
  * here for free.
  *
  * Statements execute against the `tables` registry (logical name →
  * snapshot-table path); a MERGE source may be a registered snapshot
  * table or any catalog/temp view. Refused with a clear message:
  * unknown tables/columns, foreign qualifiers, subquery predicates,
  * conditional merge arms, and arm shapes beyond one action per arm.
  */
object SnapshotSql {

  /** Parse and execute one DML statement; returns the committed
    * version (unchanged if nothing matched).
    */
  def apply(spark: SparkSession, sqlText: String,
            tables: Map[String, String]): Long =
    spark.sessionState.sqlParser.parsePlan(sqlText) match {

      case DeleteFromTable(rel, cond) =>
        val (names, path) = resolveTable(rel, tables)
        Snapshot.delete(spark, path, predicate(cond, names))

      case UpdateTable(rel, assignments, cond) =>
        val (names, path) = resolveTable(rel, tables)
        val set = assignments.map {
          case Assignment(key: UnresolvedAttribute, value) =>
            refuseSubqueries(value, "UPDATE SET values")
            singleName(key, names: _*) ->
              ColumnBridge.column(stripQualifier(value, names))
          case a => throw new IllegalArgumentException(
            s"Snapshot.sql: unsupported assignment target ${a.key.sql}")
        }
        val dup = set.map(_._1).diff(set.map(_._1).distinct).distinct
        require(dup.isEmpty,
          s"Snapshot.sql: column(s) assigned twice: ${dup.mkString(", ")}")
        Snapshot.update(spark, path,
          cond.map(predicate(_, names)).getOrElse(lit(true)), set.toMap)

      case m: MergeIntoTable => merge(spark, m, tables)

      case other => throw new IllegalArgumentException(
        s"Snapshot.sql supports DELETE / UPDATE / MERGE statements, got ${other.nodeName}")
    }

  // ------------------------------------------------------------- merge

  private def merge(spark: SparkSession, m: MergeIntoTable,
                    tables: Map[String, String]): Long = {
    val (tNames, path) = resolveTable(m.targetTable, tables)
    val (sNames, source) = resolveSource(spark, m.sourceTable, tables)
    require(m.notMatchedBySourceActions.isEmpty,
      "Snapshot.sql MERGE: WHEN NOT MATCHED BY SOURCE is not supported")
    val idCol = m.mergeCondition match {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        val all = tNames ++ sNames
        val (an, bn) = (singleName(a, all: _*), singleName(b, all: _*))
        require(an.equalsIgnoreCase(bn),
          s"Snapshot.sql MERGE: ON must equate the same id column, got $an = $bn")
        an
      case other => throw new IllegalArgumentException(
        s"Snapshot.sql MERGE: ON must be target.<id> = source.<id>, got ${other.sql}")
    }

    (m.matchedActions, m.notMatchedActions) match {
      // star/star: whole-row replace — mergeById's exact semantics
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
        val mf = Snapshot.latestManifest(spark, path).getOrElse(
          throw new IllegalArgumentException(s"not a snapshot table: $path"))
        require(mf.partitionCols.size == 1,
          s"Snapshot.sql MERGE needs a single-column-partitioned table " +
            s"(got ${mf.partitionCols.mkString(", ")}); use Snapshot.mergeById directly")
        Snapshot.mergeById(spark, path, source, idCol, mf.partitionCols.head)

      // explicit arms: the funnel_live.py:155-172 shape
      case (matched, notMatched) =>
        val (matchedSet, matchedDelete) = matched match {
          case Seq() => (None, false)
          case Seq(UpdateAction(None, assigns, _)) =>
            (Some(assigns.map {
              case Assignment(key: UnresolvedAttribute, value) =>
                refuseSubqueries(value, "MERGE assignments")
                singleName(key, tNames: _*) -> ColumnBridge.column(value)
              case a => throw new IllegalArgumentException(
                s"Snapshot.sql MERGE: unsupported assignment target ${a.key.sql}")
            }.toMap), false)
          case Seq(DeleteAction(None)) => (None, true)
          case _ => throw new IllegalArgumentException(
            "Snapshot.sql MERGE: the matched arm must be exactly one unconditional " +
              "UPDATE SET …, UPDATE SET *, or DELETE")
        }
        val insertCols = notMatched match {
          case Seq() => None
          case Seq(InsertAction(None, assigns)) =>
            Some(assigns.map {
              case Assignment(key: UnresolvedAttribute, value) =>
                refuseSubqueries(value, "MERGE insert values")
                singleName(key, tNames: _*) -> ColumnBridge.column(value)
              case a => throw new IllegalArgumentException(
                s"Snapshot.sql MERGE: unsupported insert target ${a.key.sql}")
            })
          case _ => throw new IllegalArgumentException(
            "Snapshot.sql MERGE: the not-matched arm must be exactly one unconditional " +
              "INSERT (cols) VALUES (exprs) — or INSERT * paired with UPDATE SET *")
        }
        Snapshot.mergeArms(spark, path, source,
          targetAlias = tNames.last, sourceAlias = sNames.last, idCol = idCol,
          matchedSet = matchedSet, matchedDelete = matchedDelete,
          insertCols = insertCols)
    }
  }

  // -------------------------------------------------------- resolution

  /** Unwrap an optionally-aliased table reference; returns the names
    * it may be qualified by (table name, then alias if given) and its
    * registered snapshot path.
    */
  private def resolveTable(rel: LogicalPlan,
                           tables: Map[String, String]): (Seq[String], String) = {
    val (names, ident) = unwrap(rel)
    val path = tables.collectFirst {
      case (k, v) if k.equalsIgnoreCase(ident) => v
    }.getOrElse(throw new IllegalArgumentException(
      s"Snapshot.sql: unknown table '$ident' " +
        s"(registered: ${tables.keys.toSeq.sorted.mkString(", ")})"))
    (names, path)
  }

  /** A MERGE source: a registered snapshot table, or any catalog /
    * temp-view name the session can resolve.
    */
  private def resolveSource(spark: SparkSession, rel: LogicalPlan,
                            tables: Map[String, String]): (Seq[String], DataFrame) = {
    val (names, ident) = unwrap(rel)
    val df = tables.collectFirst {
      case (k, v) if k.equalsIgnoreCase(ident) => Snapshot.read(spark, v)
    }.getOrElse(spark.table(ident))
    (names, df)
  }

  private def unwrap(rel: LogicalPlan): (Seq[String], String) = rel match {
    case SubqueryAlias(alias, r: UnresolvedRelation) =>
      val ident = r.multipartIdentifier.mkString(".")
      (Seq(ident, alias.name).distinct, ident)
    case r: UnresolvedRelation =>
      val ident = r.multipartIdentifier.mkString(".")
      (Seq(ident), ident)
    case other => throw new IllegalArgumentException(
      s"Snapshot.sql: expected a plain table name (optionally aliased), got ${other.nodeName}")
  }

  /** Predicate expression → Column, with the statement's own table
    * qualifiers stripped (it resolves against the bare target scan) and
    * subqueries refused up front — a subquery would silently analyze
    * against nothing inside the per-file match count.
    */
  private def predicate(cond: Expression, names: Seq[String]): Column = {
    refuseSubqueries(cond, "DML predicates")
    ColumnBridge.column(stripQualifier(cond, names))
  }

  /** Subqueries anywhere in a DML expression would resolve against the
    * session catalog, not the `tables` registry — silently the wrong
    * table when a name shadows, an opaque analysis error otherwise.
    * Refused with the front end's own message instead.
    */
  private def refuseSubqueries(e: Expression, where: String): Unit =
    e.foreach {
      case _: SubqueryExpression => throw new IllegalArgumentException(
        s"Snapshot.sql: subqueries are not supported in $where; " +
          "materialize the subquery and use the Scala API instead")
      case _ => ()
    }

  /** Drop the statement table's own qualifiers off attribute
    * references; any OTHER qualifier is a user error against a
    * single-table statement.
    */
  private def stripQualifier(e: Expression, names: Seq[String]): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.length > 1 =>
      val qual = a.nameParts.init.mkString(".")
      if (names.exists(_.equalsIgnoreCase(qual))) UnresolvedAttribute(Seq(a.nameParts.last))
      else throw new IllegalArgumentException(
        s"Snapshot.sql: unknown qualifier '$qual' (statement table is " +
          s"'${names.mkString("' aka '")}')")
  }

  /** An attribute that must name one column of one of `allowed`'s
    * tables (or be unqualified); returns the bare column name.
    */
  private def singleName(a: UnresolvedAttribute, allowed: String*): String =
    if (a.nameParts.length == 1) a.nameParts.head
    else {
      val qual = a.nameParts.init.mkString(".")
      if (allowed.exists(_.equalsIgnoreCase(qual))) a.nameParts.last
      else throw new IllegalArgumentException(
        s"Snapshot.sql: unknown qualifier '$qual' " +
          s"(expected one of: ${allowed.mkString(", ")})")
    }
}
