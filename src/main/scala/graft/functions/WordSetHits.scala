package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-set hit counter: `word_set_hits(s, 'w1,w2|w3,w4')`
  * returns an INT array with, per `|`-separated set, the number of
  * maximal `\w` runs of `s` that equal one of the set's `,`-separated
  * words.
  *
  * For a PURE-LETTER word set this is exactly
  * `regexp_count(s, '\b(w1|w2)\b')` under RE2 semantics — i.e. what
  * the DuckDB oracle twin computes: ASCII `\w` runs are maximal, so a
  * letter-only pattern bounded by `\b` on both sides can only match a
  * whole run. (Java's `\b` is Unicode-aware even though its `\w` is
  * ASCII, so a Spark-side `regexp_count` misses words adjacent to
  * non-ASCII letters — a latent oracle mismatch this kernel removes;
  * the divergence is pinned in PipelineOpsSpec.)
  * The funnel needs FIVE such counts (four languages + the
  * stopword set); as alternation regexes each is a per-char backtrack
  * over the text, and as `split`+`filter` higher-order functions the
  * lambdas are interpreted and excluded from subexpression
  * elimination (measured 3× WORSE than the regexes). This expression
  * does all sets in ONE JIT'd byte scan — word-char runs found by
  * ASCII byte class (multi-byte UTF-8 code points are non-word, same
  * as Java/RE2 ASCII `\w`), each run looked up once in a shared
  * hash map of word → set-membership bitmask. Deterministic and
  * lambda-free, so repeated occurrences in a projection collapse to
  * one evaluation under whole-stage codegen CSE. The DuckDB oracle
  * twins keep the regex form, verifying the equivalence row by row.
  */
case class WordSetHits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "word_set_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"word_set_hits requires STRING input, got ${left.dataType.catalogString}")
    else if (!right.dataType.isInstanceOf[StringType] || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "word_set_hits requires a foldable STRING set spec ('w1,w2|w3,w4')")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val matcher: WordSetMatcher =
    new WordSetMatcher(
      right.eval(null).asInstanceOf[UTF8String].toString)

  protected override def nullSafeEval(s: Any, spec: Any): Any =
    matcher.hits(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSetMatcher", matcher,
      "graft.functions.WordSetMatcher")
    nullSafeCodeGen(ctx, ev, (s, _) => s"${ev.value} = $ref.hits($s);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordSetHits =
    copy(left = newLeft, right = newRight)
}

/** The scan kernel + precompiled word → set-bitmask map (≤64 sets).
  * Serializable so the expression ships to executors; the map is
  * rebuilt from the spec string on deserialization.
  */
class WordSetMatcher(spec: String) extends Serializable {

  @transient private lazy val map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    sets.zipWithIndex.foreach { case (words, i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << i)))
      }
    }
    m
  }
  @transient private lazy val maxLen: Int =
    sets.iterator.flatten.map(_.getBytes("UTF-8").length).max

  private val sets: Array[Array[String]] =
    spec.split('|').map(_.split(',').filter(_.nonEmpty))
  require(sets.nonEmpty && sets.length <= 64,
    s"word_set_hits supports 1..64 sets, got ${sets.length}")
  private val nSets: Int = sets.length

  def hits(s: UTF8String): ArrayData = {
    val counts = new Array[Int](nSets)
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var start = -1
    while (i <= n) {
      val isWord = i < n && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '_'
      }
      if (isWord) {
        if (start < 0) start = i
      } else if (start >= 0) {
        val len = i - start
        if (len <= maxLen) {
          val m = map.get(UTF8String.fromBytes(bytes, start, len))
          if (m != null) {
            var mask = m.longValue()
            while (mask != 0L) {
              counts(java.lang.Long.numberOfTrailingZeros(mask)) += 1
              mask &= mask - 1
            }
          }
        }
        start = -1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}

object WordSetHits {
  /** Make `word_set_hits` available to SQL/`expr()` strings
    * (idempotent).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_set_hits",
      exprs => WordSetHits(exprs.head, exprs(1)),
      "built-in")
}
