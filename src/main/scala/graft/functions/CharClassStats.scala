package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass code-point class counts: `char_class_stats(s)` returns
  * `[punct, nonspace, ntokens, cjk]` where
  *
  *  - `punct`    ≡ `regexp_count(s, '[^a-zA-Z0-9\s]')`
  *  - `nonspace` ≡ `length(regexp_replace(s, '\s', ''))`
  *  - `ntokens`  ≡ `CASE WHEN length(trim(s)) = 0 THEN 0
  *                  ELSE size(split(trim(s), '\s+')) END`
  *  - `cjk`      ≡ regexp_count of the `U+4E00..U+9FFF` class (the
  *                 CJK unified block — every member encodes as
  *                 3-byte UTF-8, decoded inline from the lead byte)
  *
  * with Java-regex semantics: `\s` is exactly `[ \t\n\x0B\f\r]` and
  * the class counts are per CODE POINT (every non-ASCII code point
  * is neither alnum nor `\s`, so it counts for both). `ntokens`
  * reproduces the split form's quirks bit-for-bit: Spark `trim`
  * strips 0x20 only, and Spark `split` runs `Pattern.split` with
  * limit -1, which keeps BOTH a leading and a trailing empty element
  * when the trimmed text starts/ends with non-space whitespace — so
  * the count is (maximal non-`\s` runs) + (1 per `[\t\n\x0B\f\r]`
  * boundary of the space-trimmed text). The regex
  * passes each scan the text through the backtracking engine and
  * the replace/split allocate copies; this expression is one JIT'd
  * byte scan that skips UTF-8 continuation bytes and never
  * allocates. Deterministic and lambda-free → shared across a
  * projection by codegen CSE. The DuckDB oracle twins keep the
  * regex forms, verifying the equivalence row by row.
  */
case class CharClassStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_class_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_class_stats requires STRING input, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    CharClassStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharClassStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharClassStats =
    copy(child = newChild)
}

object CharClassStats {

  private def isJavaSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** The scan kernel — static so generated code can call it. */
  def stats(s: UTF8String): ArrayData = {
    var punct = 0
    var nonspace = 0
    var cjk = 0
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xc0) != 0x80) { // skip UTF-8 continuation bytes
        if (b < 0) { // lead byte of a non-ASCII code point
          punct += 1
          nonspace += 1
          if ((b & 0xf0) == 0xe0 && i + 2 < n) { // 3-byte sequence
            val cp = ((b & 0x0f) << 12) |
              ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
            if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
          }
        } else {
          val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
            (b >= '0' && b <= '9')
          val space = isJavaSpace(b)
          if (!alnum && !space) punct += 1
          if (!space) nonspace += 1
        }
      }
      i += 1
    }
    // ntokens over the 0x20-trimmed span (Spark trim strips spaces
    // only). Spark's split runs Pattern.split with limit -1, so a
    // leading \s char contributes a leading empty element AND a
    // trailing \s char contributes a trailing empty element (unlike
    // Java's String.split, which drops trailing empties).
    var lo = 0
    var hi = n - 1
    while (lo < n && bytes(lo) == ' ') lo += 1
    while (hi >= lo && bytes(hi) == ' ') hi -= 1
    var ntokens = 0
    if (lo <= hi) {
      if (isJavaSpace(bytes(lo))) ntokens += 1
      if (isJavaSpace(bytes(hi))) ntokens += 1
      var inRun = false
      var j = lo
      while (j <= hi) {
        val sp = bytes(j) >= 0 && isJavaSpace(bytes(j))
        if (!sp && !inRun) { ntokens += 1; inRun = true }
        else if (sp) inRun = false
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(Array(punct, nonspace, ntokens, cjk))
  }

  /** Make `char_class_stats` available to SQL/`expr()` strings
    * (idempotent).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_class_stats",
      exprs => CharClassStats(exprs.head),
      "built-in")
}
