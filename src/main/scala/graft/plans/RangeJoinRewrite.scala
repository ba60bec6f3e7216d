package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule that turns a naive point-in-interval join —
  * `p JOIN i ON p.ts BETWEEN i.lo AND i.hi`, which Spark can only
  * plan as a nested-loop join (O(|p|·|i|), the classic 100 TB
  * killer) — into the bucketized equi-join shape of
  * [[graft.operators.RangeJoin]]: quantize time into fixed buckets,
  * explode each interval over the buckets it spans, hash-join on the
  * bucket, keep the original predicate as the exact refine. Same
  * rows, shuffle-partitionable plan.
  *
  * The rewrite fires only when the join condition is EXACTLY the
  * two range conjuncts (after Catalyst canonicalizes BETWEEN) with
  * the point on one side and both bounds on the other, and no equi
  * predicate exists — if the user already has an equality key, the
  * join is hash-planned and needs no help.
  *
  * Registered either globally via `spark.sql.extensions =
  * graft.plans.GraftExtensions` ([[GraftExtensions]]) or per-session
  * with [[RangeJoinRewrite.install]]. Bucket width (micros for
  * timestamp points, raw units for longs) comes from
  * `spark.graft.rangejoin.bucket` (default 600000000 = 10 min).
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] {

  private def bucketWidth: Long =
    SQLConf.get.getConfString("spark.graft.rangejoin.bucket", "600000000").toLong

  // TimeZoneAware expressions (Sequence, tz-crossing Cast) must carry
  // an explicit timeZoneId when built inside an optimizer rule — the
  // ResolveTimeZone analyzer phase has already run, so a None leaves
  // the plan "previously resolved, now unresolved"
  private def tz: Option[String] = Some(SQLConf.get.sessionLocalTimeZone)

  private def asMicros(e: Expression): Option[Expression] = e.dataType match {
    case LongType => Some(e)
    case TimestampType => Some(UnixMicros(e))
    case TimestampNTZType => Some(UnixMicros(Cast(e, TimestampType, tz)))
    case _ => None
  }

  private def bucketOf(e: Expression, w: Long): Option[Expression] =
    asMicros(e).map(m => IntegralDivide(m, Literal(w)))

  /** (point, lo, hi) when `cond` is the canonical two-conjunct range
    * pattern with point ∈ `left` and bounds ∈ `right`.
    */
  private def rangePattern(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet) && e.references.nonEmpty
    def fromRight(e: Expression) = e.references.subsetOf(right.outputSet) && e.references.nonEmpty
    cond match {
      case And(a, b) =>
        val lower = Seq(a, b).collectFirst {
          case GreaterThanOrEqual(p, lo) if fromLeft(p) && fromRight(lo) => (p, lo)
          case LessThanOrEqual(lo, p) if fromLeft(p) && fromRight(lo) => (p, lo)
        }
        val upper = Seq(a, b).collectFirst {
          case LessThanOrEqual(p, hi) if fromLeft(p) && fromRight(hi) => (p, hi)
          case GreaterThanOrEqual(hi, p) if fromLeft(p) && fromRight(hi) => (p, hi)
        }
        (lower, upper) match {
          case (Some((p1, lo)), Some((p2, hi))) if p1.semanticEquals(p2) => Some((p1, lo, hi))
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      rangePattern(cond, left, right)
        .orElse(rangePattern(cond, right, left))
        .flatMap { case (point, lo, hi) =>
          // figure out which side the point lives on after the orElse
          val pointOnLeft = point.references.subsetOf(left.outputSet)
          val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)
          val w = bucketWidth
          for {
            pBucket <- bucketOf(point, w)
            loBucket <- bucketOf(lo, w)
            hiBucket <- bucketOf(hi, w)
          } yield {
            val pAlias = Alias(pBucket, "_rj_bucket_p")()
            val pAttr = pAlias.toAttribute
            val iAttr = AttributeReference("_rj_bucket_i", LongType, nullable = false)()
            val pProj = Project(pSide.output :+ pAlias, pSide)
            // one row per bucket the interval overlaps. Inverted
            // intervals (lo > hi) match nothing under BETWEEN but
            // would make sequence() THROW — guard to an empty array
            // so they drop out instead (NULL bounds already yield a
            // NULL sequence → no generated rows → dropped, matching
            // the NULL-condition behavior of the original join).
            val seq = If(
              LessThanOrEqual(loBucket, hiBucket),
              Sequence(loBucket, hiBucket, Some(Literal(1L)), tz),
              Literal.create(Array.empty[Long], org.apache.spark.sql.types.ArrayType(LongType)))
            val gen = Generate(
              Explode(seq),
              unrequiredChildIndex = Nil,
              outer = false,
              qualifier = None,
              generatorOutput = Seq(iAttr),
              child = iSide)
            val newCond = And(EqualTo(pAttr, iAttr), cond)
            val (nl, nr) = if (pointOnLeft) (pProj, gen: LogicalPlan) else (gen: LogicalPlan, pProj)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          }
        }
        .getOrElse(j)
  }
}

object RangeJoinRewrite {
  /** Install into an EXISTING session (extraOptimizations path —
    * `spark.sql.extensions` only applies at session build time).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RangeJoinRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite()
}

/** `spark.sql.extensions = graft.plans.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRewrite())
    e.injectOptimizerRule(_ => TopKViaHeapRule())
    e.injectPlannerStrategy(s => TopKStrategy(s))
  }
}
