package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Catalyst optimizer rule: rewrite an edit-distance join
  * (`levenshtein(a, b) <= 1` with no cross-side equi-conjunct) into the
  * symmetric-deletion blocked equi-join of operators.FuzzyJoin —
  * automatically, when both sides are too large to broadcast.
  *
  * Without the rule Catalyst's only plan is a nested-loop join
  * computing |L| × |R| Levenshtein DPs. The rewrite explodes each
  * side's deletion-1 neighborhood ({s} ∪ single-char deletions) as a
  * block key, joins on key equality (so Catalyst gets a real shuffle
  * key), and keeps the original predicate as the verifying residual.
  * Blocking is lossless for distance ≤ 1 (two strings within one edit
  * always share a del-1 variant — see FuzzyJoin's proof sketch).
  *
  * Dedup is BY CONSTRUCTION, not Distinct (which would also collapse
  * legitimately duplicate input rows): a candidate pair that meets on
  * several shared variants is kept only in the lexicographically
  * smallest element of the two neighborhoods' intersection — a local
  * residual (`blk = array_min(array_intersect(del1(a), del1(b)))`),
  * evaluated only on candidates, exactly the overlap rewrite's
  * emit-once-in-the-bucket-of-the-start move.
  *
  * Fires only on: Inner join, a `levenshtein(a,b) <= 1` (or `< 2`)
  * conjunct with `a`/`b` from opposite sides, no cross-side equality
  * conjunct, and both sides above autoBroadcastJoinThreshold by plan
  * statistics (a broadcastable side leaves BNLJ alone, mirroring
  * OverlapJoinRewrite).
  */
case class FuzzyJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) if j.resolved =>
      tryRewrite(j, left, right, cond).getOrElse(j)
  }

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                         cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    // levenshtein(a, b) <= 1, either literal form, either side order
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((a, b))
      else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        Some((b, a))
      else None
    def one(e: Expression): Boolean = e match {
      case Literal(v: Int, IntegerType) => v == 1
      case _ => false
    }
    def two(e: Expression): Boolean = e match {
      case Literal(v: Int, IntegerType) => v == 2
      case _ => false
    }
    val lev = conjuncts.collectFirst {
      case LessThanOrEqual(l: Levenshtein, k) if one(k) && sides(l.left, l.right).isDefined =>
        sides(l.left, l.right).get
      case LessThan(l: Levenshtein, k) if two(k) && sides(l.left, l.right).isDefined =>
        sides(l.left, l.right).get
      case GreaterThanOrEqual(k, l: Levenshtein) if one(k) && sides(l.left, l.right).isDefined =>
        sides(l.left, l.right).get
    }
    lev match {
      case Some((a, b)) if a.dataType == StringType && b.dataType == StringType =>
        val threshold = SQLConf.get.autoBroadcastJoinThreshold
        if (threshold >= 0 &&
          (left.stats.sizeInBytes <= threshold || right.stats.sizeInBytes <= threshold))
          return None

        val blkL = AttributeReference("__graft_blk_l", StringType, nullable = true)()
        val blkR = AttributeReference("__graft_blk_r", StringType, nullable = true)()
        val lGen = Generate(Explode(del1(a)), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(blkL), child = left)
        val rGen = Generate(Explode(del1(b)), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(blkR), child = right)
        val dedup = EqualTo(blkL, ArrayMin(ArrayIntersect(del1(a), del1(b))))
        val newCond = (EqualTo(blkL, blkR) +: dedup +: conjuncts).reduce(And)
        Some(Project(j.output, Join(lGen, rGen, Inner, Some(newCond), JoinHint.NONE)))
      case _ => None
    }
  }

  /** Catalyst form of FuzzyJoin.del1: {s} ∪ distinct single-character
    * deletions; the empty string is its own whole neighborhood.
    */
  private def del1(s: Expression): Expression = {
    val i = NamedLambdaVariable("i", IntegerType, nullable = false)
    val piece = Concat(Seq(
      Substring(s, Literal(1), Subtract(i, Literal(1))),
      Substring(s, Add(i, Literal(1)), Subtract(Length(s), i))))
    // Sequence is TimeZoneAwareExpression even over integers: without an
    // explicit zone the plan flips back to unresolved (same note as the
    // overlap rewrite)
    val dels = ArrayTransform(
      Sequence(Literal(1), Length(s), None, Some(SQLConf.get.sessionLocalTimeZone)),
      LambdaFunction(piece, Seq(i)))
    If(EqualTo(Length(s), Literal(0)),
      CreateArray(Seq(s)),
      ArrayDistinct(Concat(Seq(CreateArray(Seq(s)), dels))))
  }
}
