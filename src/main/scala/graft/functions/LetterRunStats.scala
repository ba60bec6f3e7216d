package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass `[a-z]`-run totals: `letter_run_stats(s)` returns
  * `[total, distinct]` — the count of maximal `[a-z]` byte runs in
  * `s` and the count of distinct run values. Exactly
  *
  *  - `total`    ≡ `size(filter(split(s, '[^a-z]+'), x -> x <> ''))`
  *  - `distinct` ≡ `size(array_distinct(` same `))`
  *
  * (callers pass `lower(text)`): splitting on the complement class
  * and dropping empties yields precisely the maximal `[a-z]` runs.
  * The split form allocates the full token array per reference and —
  * being lambda-bearing — is excluded from codegen subexpression
  * elimination; this kernel is one byte scan with a small per-row
  * hash set for the distinct count. The DuckDB oracle twin keeps the
  * split form, verifying the equivalence row by row.
  */
case class LetterRunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "letter_run_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"letter_run_stats requires STRING input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    LetterRunStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LetterRunStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): LetterRunStats =
    copy(child = newChild)
}

object LetterRunStats {

  /** The scan kernel — static so generated code can call it. */
  def stats(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var total = 0
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    var start = -1
    while (i <= n) {
      val isLetter = i < n && bytes(i) >= 'a' && bytes(i) <= 'z'
      if (isLetter) {
        if (start < 0) start = i
      } else if (start >= 0) {
        total += 1
        seen.add(UTF8String.fromBytes(bytes, start, i - start))
        start = -1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(total, seen.size))
  }

  /** Make `letter_run_stats` available to SQL/`expr()` strings
    * (idempotent).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "letter_run_stats",
      exprs => LetterRunStats(exprs.head),
      "built-in")
}
