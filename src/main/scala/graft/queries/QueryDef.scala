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
  */
final case class QueryDef(name: String, oracle: Option[String])(val build: Tables => DataFrame)

trait QueryPack { def queries: Seq[QueryDef] }
