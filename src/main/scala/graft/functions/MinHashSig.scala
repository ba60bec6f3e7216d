package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature: from an ARRAY<BIGINT> of shingle
  * hashes, the NumMinhash permutation minima
  * `min_x (a_i * x + b_i) mod P` — one pass over the input per row
  * (k×|grams| fused multiply-mod-min steps in a JIT'd loop) instead of
  * k separate interpreted `array_min(transform(...))` projections.
  * Constants are [[TextExprs.minhashA]]/[[TextExprs.minhashB]], so
  * values are identical to the HOF formulation and the DuckDB oracle.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires ARRAY<BIGINT> input, got ${other.catalogString}")
    }

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import TextExprs.{minhashA, minhashB, NumMinhash, P}

  private val A: Array[Long] = Array.tabulate(NumMinhash)(minhashA)
  private val B: Array[Long] = Array.tabulate(NumMinhash)(minhashB)

  /** Static kernel so generated code can call it. ⚠ Empty input
    * yields an all-Long.MaxValue signature — two empty inputs
    * therefore agree on all 32 positions and would read as certain
    * duplicates. Every shipped operator pre-filters rows below the
    * shingle size (`tokenCount >= n`), so empty gram arrays never
    * reach this kernel there; direct SQL users of `minhash_sig` must
    * apply the same guard.
    */
  def sig(grams: ArrayData): GenericArrayData = {
    val n = grams.numElements()
    val out = Array.fill(NumMinhash)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = grams.getLong(j)
      var i = 0
      while (i < NumMinhash) {
        val v = (A(i) * h + B(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
}
