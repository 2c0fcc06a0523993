package graft.queries

import org.apache.spark.sql.DataFrame
import graft.Tables

/** One verified query: a Spark build over a [[Tables]] catalog plus (when
  * SQL-expressible) an equivalent ANSI SQL text the driver replays in
  * DuckDB over the same parquet files. Column names/aliases must match
  * exactly between the two — the comparator sorts columns by name before
  * hashing values.
  *
  * Determinism rules used throughout every pack:
  *  - every query ends in an ORDER BY over its full key set;
  *  - double SUMs go through DECIMAL (exact, order-independent) and are
  *    cast back to DOUBLE at the end;
  *  - ratios are computed as one double division of two exact values.
  *
  * A STAGED query ([[QueryDef.staged]]) splits FIXTURE SETUP (tmp dirs,
  * snapshot-table loads — commit-protocol work that is scaffolding, not
  * the operator under test) from the measured build: Verify runs both
  * as one call ([[build]], the correctness path), while Bench runs the
  * setup OUTSIDE its timed window — fresh per pass, because DML
  * fixtures are not idempotent — and times only [[buildPrepared]].
  */
final class QueryDef(val name: String, val oracle: Option[String],
                     val setup: Option[Tables => Any],
                     buildF: (Tables, Any) => DataFrame) {

  /** Fixture setup + query build in one call — the correctness path. */
  def build(t: Tables): DataFrame = buildF(t, setup.map(_(t)).orNull)

  /** Build over an ALREADY-PREPARED fixture (the value [[setup]]
    * returned) — Bench's timed region for staged queries.
    */
  def buildPrepared(t: Tables, state: Any): DataFrame = buildF(t, state)
}

object QueryDef {
  def apply(name: String, oracle: Option[String])(build: Tables => DataFrame): QueryDef =
    new QueryDef(name, oracle, None, (t, _) => build(t))

  /** A query whose fixture setup must not land in the timed region. */
  def staged[S](name: String, oracle: Option[String])(setupF: Tables => S)(
      build: (Tables, S) => DataFrame): QueryDef =
    new QueryDef(name, oracle, Some(t => setupF(t)),
      (t, s) => build(t, s.asInstanceOf[S]))
}

trait QueryPack { def queries: Seq[QueryDef] }
