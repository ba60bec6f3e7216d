package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** `min_pair_long(a, b)` — the lexicographic minimum `(a, b)` pair as
  * a `struct<a: bigint, b: bigint>`, as a DECLARATIVE aggregate over
  * two primitive LONG buffer slots.
  *
  * Why not `min(struct(a, b))`: Spark's Min over a struct is
  * declarative too, but its buffer IS the struct — an immutable
  * buffer type — so HashAggregateExec (primitive-mutable buffers
  * only) refuses it and the plan falls back to SortAggregate, which
  * SORTS every task's full input by the grouping key before
  * aggregating. The keep-first dedup kernels group corpus-wide line/
  * chunk/media tables by 128-bit fingerprints (high cardinality, one
  * hot-key-safe partial level), so that sort is O(n log n) per task
  * over the corpus at scale — measured in the r19 plan audit as 4
  * SortAggregate + 3 Sort nodes per paragraph-fp query where hash
  * aggregation needs none. Two LONG buffer slots keep the exact same
  * lexicographic-minimum semantics inside whole-stage-codegen'd
  * HashAggregate. (A TypedImperativeAggregate would land on
  * ObjectHashAggregateExec instead, which falls back to sort-based
  * past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` =
  * 128 distinct keys — wrong shape for high-cardinality fingerprint
  * groups.)
  *
  * Null contract: rows where `a` or `b` is NULL are ignored (the
  * dedup kernels feed non-null ids by construction); an all-null
  * group evaluates to NULL, like Min. Inputs must be BIGINT — cast
  * at the call site so the widening is visible.
  */
case class MinPairLong(
    a: Expression, b: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))
  override def prettyName: String = "min_pair_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_pair_long requires (BIGINT, BIGINT), got $other — cast explicitly")
    }

  private lazy val mA = AttributeReference("min_pair_a", LongType)()
  private lazy val mB = AttributeReference("min_pair_b", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(mA, mB)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(null, LongType))

  override lazy val updateExpressions: Seq[Expression] = {
    val inNull = Or(IsNull(a), IsNull(b))
    val takeInput = Or(
      IsNull(mA),
      Or(LessThan(a, mA), And(EqualTo(a, mA), LessThan(b, mB))))
    Seq(
      If(inNull, mA, If(takeInput, a, mA)),
      If(inNull, mB, If(takeInput, b, mB)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val takeRight = Or(
      IsNull(mA.left),
      Or(
        LessThan(mA.right, mA.left),
        And(EqualTo(mA.right, mA.left), LessThan(mB.right, mB.left))))
    Seq(
      If(IsNull(mA.right), mA.left, If(takeRight, mA.right, mA.left)),
      If(IsNull(mA.right), mB.left, If(takeRight, mB.right, mB.left)))
  }

  override lazy val evaluateExpression: Expression =
    If(
      IsNull(mA),
      Literal(null, dataType),
      CreateNamedStruct(Seq(Literal("a"), mA, Literal("b"), mB)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinPairLong =
    copy(a = newChildren(0), b = newChildren(1))
}

object MinPair {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "min_pair_long", exprs => MinPairLong(exprs(0), exprs(1)), "built-in")
  }
}
