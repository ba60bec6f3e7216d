package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd SimHash: from an ARRAY<BIGINT> of word hashes, the
  * packed sign-bit fingerprint of the ±1 bit votes — one fused pass
  * (|words| × SimhashBits add/branch steps in a JIT'd loop), identical
  * values to the votes-then-pack HOF formulation and the DuckDB
  * oracle twin (TextExprs.simhashVotesDuck/simhashPackDuck).
  */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_pack requires ARRAY<BIGINT> input, got ${other.catalogString}")
    }

  protected override def nullSafeEval(input: Any): Any =
    SimHashPack.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashPack.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  import TextExprs.SimhashBits

  /** Static kernel so generated code can call it. */
  def pack(wordHashes: ArrayData): Long = {
    val votes = new Array[Int](SimhashBits)
    val n = wordHashes.numElements()
    var j = 0
    while (j < n) {
      val h = wordHashes.getLong(j)
      var i = 0
      while (i < SimhashBits) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < SimhashBits) {
      if (votes(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_pack", exprs => SimHashPack(exprs.head), "built-in")
}
