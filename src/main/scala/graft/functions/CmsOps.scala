package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query companion to Spark's built-in `count_min_sketch(col,
  * eps, confidence, seed)` aggregate: Spark ships the mergeable
  * sketch builder but no way to *read* the sketch from SQL — the
  * binary result is a dead end without driver-side deserialization.
  * `cms_estimate(sketch, value)` closes that gap, so the full
  * heavy-hitter pipeline (build sketch distributed → probe candidate
  * keys) stays inside the engine.
  *
  * The sketch guarantees `exact ≤ estimate ≤ exact + eps·N` with
  * probability ≥ confidence per probe — the oracle pattern pins the
  * exact counts plus a literal-TRUE bounds flag, like the
  * profile/quantile sketches.
  *
  * Eval-only (CodegenFallback): probes run on a handful of
  * post-aggregation candidate rows, never in a per-input-row hot
  * path. The deserialized sketch is memoized per (expression
  * instance, byte-array identity) so a probe column over N candidate
  * rows deserializes the bitmap once per partition, not N times.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cms_estimate requires (BINARY sketch, BIGINT value), got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  // identity-keyed single-slot cache, per THREAD: local-mode tasks can
  // share one deserialized expression instance across threads, and an
  // unsynchronized two-field cache could pair one sketch's bytes with
  // another's deserialized counters (silent wrong estimates)
  @transient private lazy val cache =
    new ThreadLocal[(Array[Byte], CountMinSketch)]()

  protected override def nullSafeEval(sketchBytes: Any, value: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    val cached = cache.get()
    val sketch =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val s = CountMinSketch.readFrom(bytes)
        cache.set((bytes, s))
        s
      }
    sketch.estimateCount(java.lang.Long.valueOf(value.asInstanceOf[Long]))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

object CmsOps {
  /** Register `cms_estimate` for SQL/`expr()` use (idempotent). The
    * probed value must be BIGINT and the sketch must have been built
    * over BIGINT values (`count_min_sketch(CAST(x AS BIGINT), ...)`)
    * — CountMinSketch hashes by runtime type, so INT-built sketches
    * would silently miscount LONG probes.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate", exprs => CmsEstimate(exprs(0), exprs(1)), "built-in")
}
