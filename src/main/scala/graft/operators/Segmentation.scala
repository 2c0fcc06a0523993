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
  * Here ALL rules compile into ONE pass over the data:
  * `explode(filter(array(when(pred_i, tag_i)…), isNotNull))` — each row
  * is tested against every rule inside a single projection, so N rules
  * cost one scan, not N (a union-of-filters plan re-scans the input per
  * rule: different residual filters defeat Catalyst's exchange reuse).
  * Only the rules themselves (human-authored, dimension-sized by
  * construction) ever touch the driver, to build the plan — not a
  * hot-path collect.
  */
object Segmentation {

  /** One membership rule. `op` mirrors the reference's four cases:
    *  - "in":   value is a comma-separated id list (table_key == "_id")
    *  - "bool": value is "True"/"False" against a boolean column
    *  - "null": membership = key IS NULL (table_value None)
    *  - "eq":   plain equality on the key column
    */
  final case class Rule(tag: String, key: String, op: String, value: String)

  def predicate(r: Rule): Column = {
    // "null" is the only op whose value is legitimately absent (the
    // reference encodes it as a None table_value); the rest would
    // otherwise NPE inside split/compare with no hint which rule broke
    def v: String = {
      require(r.value != null,
        s"segmentation rule '${r.tag}': op '${r.op}' requires a non-null value")
      r.value
    }
    r.op match {
      case "in"   => col(r.key).cast("string").isin(v.split(","): _*)
      case "bool" => col(r.key) === (v == "True")
      case "null" => col(r.key).isNull
      case "eq"   => col(r.key).cast("string") === v
      case other  => throw new IllegalArgumentException(s"unknown rule op: $other")
    }
  }

  /** Evaluate every rule against `data`; emit (tag, member) rows where
    * `member` is `memberCol` (the reference uses email). One scan for
    * all N rules: rows matching no rule explode away with the empty
    * array, rows matching several emit one row per matching tag — the
    * same multiset as per-rule filters unioned.
    */
  def applyRules(data: DataFrame, rules: Seq[Rule], memberCol: String): DataFrame = {
    require(rules.nonEmpty, "no segmentation rules")
    val tags = array(rules.map(r => when(predicate(r), lit(r.tag))): _*)
    data.select(explode(filter(tags, _.isNotNull)).as("tag"),
      col(memberCol).as("member"))
  }

  /** Rules arriving as a table (the reference reads them from Postgres,
    * S8): collect — the rules table is tiny — and delegate. A NULL
    * value survives as null here; `predicate` rejects it with a clear
    * error for the ops that need one ("null" ignores it). A NULL tag or
    * key is rejected immediately: a null tag would otherwise be
    * filtered out of the tag array SILENTLY, dropping the whole
    * segment's members with no error.
    */
  def applyRules(data: DataFrame, rules: DataFrame, memberCol: String): DataFrame =
    applyRules(data,
      rules.select("tag", "key", "op", "value").collect().toSeq
        .map { r =>
          require(!r.isNullAt(0), "segmentation rule with NULL tag")
          require(!r.isNullAt(1), s"segmentation rule '${r.getString(0)}': NULL key")
          Rule(r.getString(0), r.getString(1), r.getString(2), r.getString(3))
        },
      memberCol)

  /** Cross-segment exclusivity (Bigquery_to_csv_2.ipynb:66-90): segments
    * are priority-ordered and a member belongs only to the FIRST segment
    * that claims them — the reference expresses this as a GROWING CHAIN
    * of left-outer anti joins (segment k excludes the emails of all k−1
    * earlier segments: O(N²) joins, each a shuffle). One min-priority
    * aggregate over the (tag, member) pairs produces the identical
    * assignment in a single shuffle: group by member, keep the
    * smallest-priority tag. Ties inside the same priority (a tag not in
    * `priorities`) resolve by tag name so the result is deterministic;
    * unlisted tags sort after every listed one, preserving the
    * reference's "later segments only get leftovers" contract.
    */
  def exclusive(memberships: DataFrame, priorities: Seq[String]): DataFrame = {
    val prio = priorities.zipWithIndex.foldRight(lit(priorities.size): Column) {
      case ((t, i), acc) => when(col("tag") === t, lit(i)).otherwise(acc)
    }
    memberships
      .groupBy("member")
      .agg(min(struct(prio.as("p"), col("tag").as("tag"))).as("w"))
      .select(col("w.tag").as("tag"), col("member"))
  }
}
