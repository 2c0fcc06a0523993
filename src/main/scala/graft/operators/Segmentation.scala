package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tag-segmentation rules engine (SURVEY.md §2.13; reference
  * Update_function_for_Mailing_segmentation.ipynb:56-85): a rules table
  * — one row per tag with a key column, an operator and a value — drives
  * per-rule membership filters over a query result; output is (tag,
  * member) pairs, the shape a mailing platform ingests.
  *
  * The reference evaluates each rule as a driver-side pandas filter.
  * Here each rule becomes a Column predicate and the result is ONE
  * union-of-filters plan: the data scans stay distributed and Catalyst
  * collapses the shared scan; only the rules themselves (human-authored,
  * dimension-sized by construction) ever touch the driver, to build the
  * plan — not a hot-path collect.
  */
object Segmentation {

  /** One membership rule. `op` mirrors the reference's four cases:
    *  - "in":   value is a comma-separated id list (table_key == "_id")
    *  - "bool": value is "True"/"False" against a boolean column
    *  - "null": membership = key IS NULL (table_value None)
    *  - "eq":   plain equality on the key column
    */
  final case class Rule(tag: String, key: String, op: String, value: String)

  def predicate(r: Rule): Column = r.op match {
    case "in"   => col(r.key).cast("string").isin(r.value.split(","): _*)
    case "bool" => col(r.key) === (r.value == "True")
    case "null" => col(r.key).isNull
    case "eq"   => col(r.key).cast("string") === r.value
    case other  => throw new IllegalArgumentException(s"unknown rule op: $other")
  }

  /** Evaluate every rule against `data`; emit (tag, member) rows where
    * `member` is `memberCol` (the reference uses email).
    */
  def applyRules(data: DataFrame, rules: Seq[Rule], memberCol: String): DataFrame = {
    require(rules.nonEmpty, "no segmentation rules")
    rules.map { r =>
      data.where(predicate(r))
        .select(lit(r.tag).as("tag"), col(memberCol).as("member"))
    }.reduce(_ unionByName _)
  }

  /** Rules arriving as a table (the reference reads them from Postgres,
    * S8): collect — the rules table is tiny — and delegate.
    */
  def applyRules(data: DataFrame, rules: DataFrame, memberCol: String): DataFrame =
    applyRules(data,
      rules.select("tag", "key", "op", "value").collect().toSeq
        .map(r => Rule(r.getString(0), r.getString(1), r.getString(2), r.getString(3))),
      memberCol)
}
