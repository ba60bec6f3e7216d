package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, IntegerType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-bigram histogram: `bigram_counts(s)` returns a
  * `MAP<STRING, INT>` from each adjacent CODE-POINT pair of `s` to
  * its occurrence count (callers pass `lower(text)`). Exactly the
  * multiset that
  * `transform(sequence(1, length(s) - 1), i -> substring(s, i, 2))`
  * explodes to — but as ONE byte scan per row instead of a
  * Σ length(s)-row generator: `explode(bigram_counts(…))` emits the
  * already-compacted (gram, cnt) rows directly, so the downstream
  * aggregation never shuffles position-level rows and the
  * per-position explode never materializes. Key order is first-seen
  * (LinkedHashMap), so the expression is deterministic; consumers
  * aggregate, so order never reaches a result. The DuckDB oracle
  * twin keeps the positional-unnest form, verifying the equivalence
  * row by row.
  */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "bigram_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigram_counts requires STRING input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    BigramCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BigramCounts {

  private def codePointLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else 4

  /** The scan kernel — static so generated code can call it. */
  def counts(s: UTF8String): MapData = {
    val bytes = s.getBytes
    val n = bytes.length
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Integer]()
    var p0 = 0 // start of the bigram's first code point
    if (n > 0) {
      var p1 = codePointLen(bytes(0)) // start of its second code point
      while (p1 < n) {
        val p2 = p1 + codePointLen(bytes(p1)) // end of the bigram
        val g = UTF8String.fromBytes(bytes, p0, p2 - p0)
        val prev = m.get(g)
        m.put(g, if (prev == null) 1 else prev.intValue() + 1)
        p0 = p1
        p1 = p2
      }
    }
    val keys = new Array[AnyRef](m.size)
    val vals = new Array[AnyRef](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Make `bigram_counts` available to SQL/`expr()` strings
    * (idempotent).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bigram_counts",
      exprs => BigramCounts(exprs.head),
      "built-in")
}
