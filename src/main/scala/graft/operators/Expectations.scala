package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the reference's null-check
  * report generalized (email_nulos.py builds one SELECT per check and
  * mails the counts; Bigquery_to_csv audits segment sizes the same
  * way). Rules are data, not code, and the engine costs:
  *   - ALL row-level rules (not-null / range / set) = ONE scan of the
  *     fact, via the same when-tag-array explode the segmentation
  *     engine uses — adding a rule never adds a pass;
  *   - each uniqueness rule = one hash aggregate on its column;
  *   - each referential rule = one left-anti join against its
  *     dimension (broadcast when the dimension is small).
  * Every rule reports even at zero violations (the rule spine is a
  * driver-side literal table), with a deterministic sample key
  * (lexicographic min of the violating keys) for triage.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Column must be non-null. */
  final case class NotNull(name: String, col: String) extends Rule
  /** Non-null values must fall in [lo, hi]; nulls are NotNull's job. */
  final case class InRange(name: String, col: String, lo: Double, hi: Double) extends Rule
  /** Non-null values must be one of `values`. */
  final case class InSet(name: String, col: String, values: Seq[String]) extends Rule
  /** Column values must be unique; violations = extra copies. */
  final case class Unique(name: String, col: String) extends Rule
  /** Every value must exist in `dim.dimCol` (referential integrity). */
  final case class ForeignKey(name: String, col: String, dim: DataFrame, dimCol: String) extends Rule

  private def violation(r: Rule): Option[Column] = r match {
    case NotNull(_, c)       => Some(col(c).isNull)
    case InRange(_, c, lo, hi) => Some(!col(c).between(lo, hi)) // null -> null -> not tagged
    case InSet(_, c, vs)     => Some(!col(c).isin(vs: _*))
    case _                   => None
  }

  /** Evaluate `rules` over `df`; returns one row per rule:
    * (rule, violations, sample_key) ordered by rule name. `keyCol`
    * identifies sample rows for row-level and FK rules; uniqueness
    * rules sample the duplicated value itself.
    */
  def check(df: DataFrame, keyCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectation rules")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val spark = df.sparkSession
    import spark.implicits._
    val key = col(keyCol).cast("string")

    val rowRules = rules.filter(violation(_).isDefined)
    val rowCounts: Seq[DataFrame] =
      if (rowRules.isEmpty) Nil
      else {
        val tags = array(rowRules.map(r => when(violation(r).get, lit(r.name))): _*)
        Seq(df.select(key.as("k"), explode(filter(tags, _.isNotNull)).as("rule"))
          .groupBy("rule")
          .agg(count(lit(1)).as("violations"), min(col("k")).as("sample_key")))
      }
    val otherCounts: Seq[DataFrame] = rules.collect {
      case Unique(name, c) =>
        df.groupBy(col(c)).agg(count(lit(1)).as("__c"))
          .where(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"),
            min(col(c).cast("string")).as("sample_key"))
          .select(lit(name).as("rule"), col("violations"), col("sample_key"))
      case ForeignKey(name, c, dim, dimCol) =>
        df.join(dim.select(col(dimCol).as(c)), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"), min(key).as("sample_key"))
          .select(lit(name).as("rule"), col("violations"), col("sample_key"))
    }
    val spine = rules.map(_.name).toDF("rule")
    val counted = (rowCounts ++ otherCounts).reduce(_ unionByName _)
    spine.join(counted, Seq("rule"), "left")
      .select(col("rule"), coalesce(col("violations"), lit(0L)).as("violations"),
        col("sample_key"))
      .orderBy("rule")
  }
}
