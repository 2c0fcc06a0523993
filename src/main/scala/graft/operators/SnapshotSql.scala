package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-text front end for snapshot-table maintenance.
  *
  * The reference's table maintenance is literal SQL strings handed to
  * the warehouse — `DELETE FROM t WHERE fecha >= cutoff`
  * (consumo_detalle.py:317-340), `MERGE ... ON id` with matched-update
  * / not-matched-insert arms (funnel_live.py:106-174). Round 7 built
  * the engine halves ([[Snapshot.delete]]/[[Snapshot.update]]/
  * [[Snapshot.mergeById]]) as Scala APIs; this front end lets a user
  * porting a reference script hand over the SQL text unchanged:
  *
  * {{{
  *   Snapshot.sql(spark, "DELETE FROM t WHERE yr >= 1998", Map("t" -> path))
  *   Snapshot.sql(spark, "UPDATE t SET price = price * 3 WHERE pri = '1-URGENT'", ...)
  *   Snapshot.sql(spark, "MERGE INTO t USING updates ON t.id = updates.id " +
  *     "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *", ...)
  * }}}
  *
  * The SESSION parser does all the parsing (no hand-rolled SQL
  * grammar): `parsePlan` yields the standard `DeleteFromTable` /
  * `UpdateTable` / `MergeIntoTable` logical nodes, whose predicate and
  * assignment expressions are rewrapped as Columns and routed to the
  * existing minimum-rewrite tiers — so SQL-text DML and the Scala API
  * are ONE code path with one set of semantics, and everything the
  * session parser accepts in a predicate (BETWEEN, IN lists, nested
  * boolean algebra, casts, functions) works here for free.
  *
  * Statements execute against the `tables` registry (logical name →
  * snapshot-table path). Refused with a clear message: unknown tables,
  * unknown SET columns ([[Snapshot.update]]'s existing guard), foreign
  * qualifiers, subqueries in predicates (a DML predicate must be
  * evaluable per-row against the target — the reference never uses
  * them either), and merge shapes beyond matched-update-star /
  * not-matched-insert-star (the funnel_live contract).
  */
object SnapshotSql {

  /** Parse and execute one DML statement; returns the committed
    * version (unchanged if nothing matched).
    */
  def apply(spark: SparkSession, sqlText: String,
            tables: Map[String, String]): Long =
    spark.sessionState.sqlParser.parsePlan(sqlText) match {

      case DeleteFromTable(rel, cond) =>
        val (name, path) = resolveTable(rel, tables)
        Snapshot.delete(spark, path, predicate(cond, name))

      case UpdateTable(rel, assignments, cond) =>
        val (name, path) = resolveTable(rel, tables)
        val set = assignments.map {
          case Assignment(key: UnresolvedAttribute, value) =>
            singleName(key, name) -> ColumnBridge.column(stripQualifier(value, name))
          case a => throw new IllegalArgumentException(
            s"Snapshot.sql: unsupported assignment target ${a.key.sql}")
        }
        val dup = set.map(_._1).diff(set.map(_._1).distinct).distinct
        require(dup.isEmpty,
          s"Snapshot.sql: column(s) assigned twice: ${dup.mkString(", ")}")
        Snapshot.update(spark, path,
          cond.map(predicate(_, name)).getOrElse(lit(true)), set.toMap)

      case m: MergeIntoTable =>
        val (name, path) = resolveTable(m.targetTable, tables)
        require(m.notMatchedBySourceActions.isEmpty,
          "Snapshot.sql MERGE: WHEN NOT MATCHED BY SOURCE is not supported")
        (m.matchedActions, m.notMatchedActions) match {
          case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) => ()
          case _ => throw new IllegalArgumentException(
            "Snapshot.sql MERGE supports exactly WHEN MATCHED THEN UPDATE SET * " +
              "WHEN NOT MATCHED THEN INSERT * (the funnel_live.py:106-174 shape)")
        }
        val srcName = m.sourceTable match {
          case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
          case other => throw new IllegalArgumentException(
            s"Snapshot.sql MERGE: source must be a table or view, got ${other.nodeName}")
        }
        val idCol = m.mergeCondition match {
          case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
            val (an, bn) = (singleName(a, name, srcName), singleName(b, name, srcName))
            require(an.equalsIgnoreCase(bn),
              s"Snapshot.sql MERGE: ON must equate the same id column, got $an = $bn")
            an
          case other => throw new IllegalArgumentException(
            s"Snapshot.sql MERGE: ON must be target.<id> = source.<id>, got ${other.sql}")
        }
        val mf = Snapshot.latestManifest(spark, path).getOrElse(
          throw new IllegalArgumentException(s"not a snapshot table: $path"))
        require(mf.partitionCols.size == 1,
          s"Snapshot.sql MERGE needs a single-column-partitioned table " +
            s"(got ${mf.partitionCols.mkString(", ")}); use Snapshot.mergeById directly")
        Snapshot.mergeById(spark, path, spark.table(srcName), idCol, mf.partitionCols.head)

      case other => throw new IllegalArgumentException(
        s"Snapshot.sql supports DELETE / UPDATE / MERGE statements, got ${other.nodeName}")
    }

  private def resolveTable(rel: LogicalPlan,
                           tables: Map[String, String]): (String, String) = rel match {
    case r: UnresolvedRelation =>
      val name = r.multipartIdentifier.mkString(".")
      tables.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => (name, v) }
        .getOrElse(throw new IllegalArgumentException(
          s"Snapshot.sql: unknown table '$name' " +
            s"(registered: ${tables.keys.toSeq.sorted.mkString(", ")})"))
    case other => throw new IllegalArgumentException(
      s"Snapshot.sql: target must be a plain table name, got ${other.nodeName}")
  }

  /** Predicate expression → Column, with the statement's own table
    * qualifier stripped (it resolves against the bare target scan) and
    * subqueries refused up front — a subquery would silently analyze
    * against nothing inside the per-file match count.
    */
  private def predicate(cond: Expression, table: String): Column = {
    cond.foreach {
      case _: SubqueryExpression => throw new IllegalArgumentException(
        "Snapshot.sql: subqueries are not supported in DML predicates; " +
          "materialize the subquery and use the Scala API instead")
      case _ => ()
    }
    ColumnBridge.column(stripQualifier(cond, table))
  }

  /** Drop `table.`-qualifiers off attribute references; any OTHER
    * qualifier is a user error against a single-table statement.
    */
  private def stripQualifier(e: Expression, table: String): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.length > 1 =>
      val qual = a.nameParts.init.mkString(".")
      if (qual.equalsIgnoreCase(table)) UnresolvedAttribute(Seq(a.nameParts.last))
      else throw new IllegalArgumentException(
        s"Snapshot.sql: unknown qualifier '$qual' (statement table is '$table')")
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
