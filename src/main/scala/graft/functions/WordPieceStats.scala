package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_stats(s, 'the,##ing,…')` — WordPiece subword
  * tokenization statistics in one pass: returns
  * `ARRAY<BIGINT>[n_tokens, n_unk_words, n_words]` for the classic
  * BERT-style greedy-longest-match algorithm over a fixed vocabulary
  * (Wu et al. 2016 / the BERT reference tokenizer, whose semantics
  * are public):
  *
  *   - words are maximal ASCII `[a-z0-9_]` runs of the LOWERCASED
  *     text (A–Z folded; any other byte, including multi-byte UTF-8,
  *     breaks the run — the same ASCII-run rule as the other text
  *     kernels, and exactly `regexp_extract_all(lower(s),
  *     '[a-z0-9_]+')` on ASCII input);
  *   - each word is consumed greedily: at every position take the
  *     LONGEST vocabulary piece that matches, where pieces at
  *     position 0 come from the plain vocab and pieces mid-word from
  *     the `##`-continuation vocab;
  *   - if no piece matches at some position the WHOLE word counts as
  *     one `[UNK]` token (partial pieces are discarded) — BERT's
  *     unk-at-word-granularity rule.
  *
  * Token counting with a REAL subword vocabulary is the budgeting
  * currency of a training pipeline (sequence packing, mixture
  * budgets, cost estimates); the whitespace/regex token counts the
  * curation funnel uses over- or under-state BPE costs by 1.3-1.5×.
  * The vocab spec is a foldable `,`-joined string (continuations
  * `##`-prefixed), compiled once into per-length hash sets — the scan
  * is O(bytes · maxPieceLen) with zero regex machinery, and the
  * DuckDB oracle twin replays the identical greedy recursion as a
  * recursive CTE over the identical vocab VALUES, so both engines
  * share one semantics definition.
  */
case class WordPieceStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wordpiece_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"wordpiece_stats requires STRING input, got ${left.dataType.catalogString}")
    else if (!right.dataType.isInstanceOf[StringType] || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "wordpiece_stats requires a foldable STRING vocab spec ('piece,##cont,…')")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val matcher: WordPieceMatcher =
    new WordPieceMatcher(right.eval(null).asInstanceOf[UTF8String].toString)

  protected override def nullSafeEval(s: Any, spec: Any): Any =
    matcher.stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceMatcher", matcher,
      "graft.functions.WordPieceMatcher")
    nullSafeCodeGen(ctx, ev, (s, _) => s"${ev.value} = $ref.stats($s);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordPieceStats =
    copy(left = newLeft, right = newRight)
}

/** The scan kernel + compiled vocabulary. Serializable so the
  * expression ships to executors; the sets are rebuilt from the spec
  * string on deserialization.
  */
class WordPieceMatcher(spec: String) extends Serializable {

  @transient private lazy val plain: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    spec.split(',').iterator.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.startsWith("##")).foreach(s.add)
    s
  }
  @transient private lazy val cont: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    spec.split(',').iterator.map(_.trim)
      .filter(_.startsWith("##")).map(_.substring(2)).filter(_.nonEmpty).foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int = {
    var m = 1
    val it = plain.iterator(); while (it.hasNext) m = math.max(m, it.next().length)
    val it2 = cont.iterator(); while (it2.hasNext) m = math.max(m, it2.next().length)
    m
  }

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  private def lower(b: Byte): Char =
    if (b >= 'A' && b <= 'Z') (b + 32).toChar else b.toChar

  /** One pass over the raw UTF-8 bytes: find word runs, tokenize each
    * greedily, accumulate [n_tokens, n_unk_words, n_words].
    */
  def stats(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var nTokens = 0L
    var nUnk = 0L
    var nWords = 0L
    var i = 0
    val word = new java.lang.StringBuilder(32)
    while (i <= bytes.length) {
      val inWord = i < bytes.length && isWordByte(bytes(i))
      if (inWord) word.append(lower(bytes(i)))
      else if (word.length > 0) {
        nWords += 1
        // greedy longest-match over the collected word
        val w = word.toString
        var pos = 0
        var pieces = 0L
        var unk = false
        while (pos < w.length && !unk) {
          var l = math.min(maxLen, w.length - pos)
          var matched = 0
          while (l >= 1 && matched == 0) {
            val cand = w.substring(pos, pos + l)
            val hit = if (pos == 0) plain.contains(cand) else cont.contains(cand)
            if (hit) matched = l else l -= 1
          }
          if (matched > 0) { pieces += 1; pos += matched }
          else unk = true
        }
        if (unk) { nTokens += 1; nUnk += 1 } else nTokens += pieces
        word.setLength(0)
      }
      i += 1
    }
    ArrayData.toArrayData(Array(nTokens, nUnk, nWords))
  }
}

object WordPieceStats {
  /** Register `wordpiece_stats` for SQL/`expr()` use (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wordpiece_stats", exprs => WordPieceStats(exprs(0), exprs(1)), "built-in")
}
