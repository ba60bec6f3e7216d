package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Codegen'd vector kernels over `ARRAY<FLOAT>` columns.
  *
  * Both accumulate left-to-right in DOUBLE, exactly like the
  * higher-order `aggregate(zip_with(...))` formulation and the DuckDB
  * `list_reduce` oracle twin (IEEE754 is deterministic given operand
  * order), so swapping them in changes no result bits — only removes
  * the ~1 µs/element interpreted-lambda overhead from the ANN/dedup
  * hot loops.
  */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def fold(a: ArrayData, b: ArrayData): Double

  // the kernels read 4-byte float slots — reject anything else at
  // analysis time instead of returning garbage at runtime
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected override def nullSafeEval(l: Any, r: Any): Any =
    fold(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
}

/** dot(a, b) = Σ aᵢ·bᵢ in double. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dot"
  protected def fold(a: ArrayData, b: ArrayData): Double = VecDot.dot(a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** l2sq(a, b) = Σ (aᵢ−bᵢ)² in double. */
case class VecL2Sq(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_l2sq"
  protected def fold(a: ArrayData, b: ArrayData): Double = VecDot.l2sq(a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.l2sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

object VecDot {
  /** Static kernels so generated code can call them. Elements are
    * FLOAT (the embedding storage type); each is widened to double
    * before the multiply, matching `cast(x as double) * cast(y as
    * double)` in the HOF/oracle formulation.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Register `vec_dot` / `vec_l2sq` for SQL/`expr()` use (idempotent).
    * Inputs must be ARRAY<FLOAT> (the embeddings' storage type).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => VecL2Sq(exprs(0), exprs(1)), "built-in")
  }
}
