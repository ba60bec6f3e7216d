package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence properties for the byte-scan text kernels
  * (WordSetHits, CharClassStats, LetterRunStats, BigramCounts)
  * against their in-engine regex/higher-order twins — the same
  * equations the fixed-vector tests in PipelineOpsSpec pin, but over
  * seeded random text drawn from a hostile alphabet: every Java `\s`
  * char (incl. `\x0B` and `\f`), ASCII punctuation, underscores and
  * digits (which glue `\w` runs shut), 2- and 3-byte UTF-8 code
  * points inside and outside the CJK block, and a 4-byte astral
  * emoji. Each property evaluates kernel and twin side by side in
  * ONE Spark job and asserts row-wise equality, so a divergence
  * reports the offending input verbatim.
  *
  * word_set_hits is the exception: its random domain is ASCII-only,
  * because Java's `\b` is Unicode-aware while the kernel follows
  * RE2's ASCII `\b` (the DuckDB oracle's dialect) — that deliberate
  * divergence is pinned separately in PipelineOpsSpec.
  */
class KernelPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(8191)

  /** Hostile alphabet: Java-\s whitespace, run-gluing word chars,
    * punctuation, Latin-1/CJK/Yi multi-byte chars, one astral emoji.
    */
  private val hostile: IndexedSeq[String] =
    "abzAZ019_".map(_.toString) ++
      Seq(" ", "\t", "\n", "\u000B", "\f", "\r",
        ",", ".", "!", "-", "'", "(", "$",
        "é", "ß", "中", "汉", "鿿", "あ", "ꀀ",
        new String(Character.toChars(0x1F600)))

  private def randTexts(alphabet: IndexedSeq[String], n: Int, maxLen: Int): Seq[String] =
    ("" +: " \t " +: (1 to n).map { _ =>
      (0 until rnd.nextInt(maxLen)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    })

  private def assertAllTrue(texts: Seq[String], checks: Seq[(String, String)]): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val out = df.select(
      col("t") +: checks.map { case (c, n) => expr(c).as(n) }: _*)
    val names = checks.map(_._2)
    val bad = out.filter(not(names.map(col).reduce(_ && _))).collect()
    assert(bad.isEmpty,
      s"kernel/twin divergence on: ${bad.map(r => r.mkString(" | ")).mkString("; ")}")
  }

  test("char_class_stats ≡ its regex twins on random hostile text") {
    graft.functions.CharClassStats.register(spark)
    assertAllTrue(
      randTexts(hostile, 120, 32),
      Seq(
        ("element_at(char_class_stats(t), 1) = regexp_count(t, '[^a-zA-Z0-9\\\\s]')", "punct"),
        ("element_at(char_class_stats(t), 2) = length(regexp_replace(t, '\\\\s', ''))", "nonspace"),
        ("element_at(char_class_stats(t), 3) = CASE WHEN length(trim(t)) = 0 THEN 0 ELSE size(split(trim(t), '\\\\s+')) END", "ntokens"),
        ("element_at(char_class_stats(t), 4) = regexp_count(t, '[\\\\u4e00-\\\\u9fff]')", "cjk")))
  }

  test("letter_run_stats ≡ its split/filter twins on random hostile text") {
    graft.functions.LetterRunStats.register(spark)
    assertAllTrue(
      randTexts(hostile, 120, 32),
      Seq(
        ("element_at(letter_run_stats(lower(t)), 1) = size(filter(split(lower(t), '[^a-z]+'), x -> x <> ''))", "total"),
        ("element_at(letter_run_stats(lower(t)), 2) = size(array_distinct(filter(split(lower(t), '[^a-z]+'), x -> x <> '')))", "distinct")))
  }

  test("word_set_hits ≡ Java regexp_count on random ASCII token streams") {
    graft.functions.WordSetHits.register(spark)
    val sets = graft.functions.TextExprs.langStopwordLists
    val spec = sets.map(_._2.mkString(",")).mkString("|")
    // tokens: real set members plus near-misses (prefix, superstring,
    // digit-glued, underscore-glued, cased); separators: word chars
    // sometimes, so tokens fuse into non-member runs
    val members = sets.flatMap(_._2)
    val tokens = members ++ members.take(8).map(_ + "e") ++
      members.take(8).map("x" + _) ++
      Seq("th", "a1", "_the", "THE", "Des", "unD")
    val seps = IndexedSeq(" ", ", ", "\t", ".", "-", "' ", "", "_", "9")
    val texts = "" +: (1 to 100).map { _ =>
      (0 until rnd.nextInt(9)).map(_ =>
        tokens(rnd.nextInt(tokens.size)) + seps(rnd.nextInt(seps.size))).mkString
    }
    assertAllTrue(
      texts,
      sets.zipWithIndex.map { case ((lang, words), i) =>
        val pat = words.mkString("\\\\b(", "|", ")\\\\b")
        (s"element_at(word_set_hits(lower(t), '$spec'), ${i + 1}) = regexp_count(lower(t), '$pat')",
          s"ws_$lang")
      })
  }

  test("bigram_counts ≡ the positional-substring multiset on random hostile text") {
    graft.functions.BigramCounts.register(spark)
    // twin: explode every adjacent code-point pair positionally, then
    // count by brute force — O(len²) per row, fine at test scale
    val grams = "IF(length(t) < 2, array(), transform(sequence(1, length(t) - 1), i -> substring(t, i, 2)))"
    assertAllTrue(
      randTexts(hostile, 120, 24),
      Seq((s"""array_sort(map_entries(bigram_counts(t))) <=>
              |array_sort(transform(array_distinct($grams),
              |  g -> struct(g AS key, CAST(size(filter($grams, x -> x = g)) AS INT) AS value)))""".stripMargin.replace("\n", " "),
        "bigrams")))
  }

  test("shingle hash builders yield the EMPTY list below n tokens, matching the DuckDB twin (ADVICE r12)") {
    import spark.implicits._
    import graft.functions.TextExprs
    graft.functions.PolyHash.register(spark) // wordHashArraySpark uses poly_hash
    // Spark's sequence(0, negative) runs BACKWARDS — unguarded, a
    // 2-token row under n=3 emitted junk windows with null element
    // accesses where DuckDB's range() is empty. The guard pins both
    // builders to the empty list; at size ≥ n values are unchanged.
    val df = Seq(
      (1L, Seq("a", "b")),            // size 2 < n=3 → empty
      (2L, Seq.empty[String]),        // size 0 → empty
      (3L, Seq("a", "b", "c")),       // size 3 = n → exactly one window
      (4L, Seq("a", "b", "c", "d"))   // size 4 → two windows
    ).toDF("id", "w")
    val out = df.select(
      col("id"),
      expr(TextExprs.shingleHashesFromWordHashesSpark(TextExprs.wordHashArraySpark("w"), 3)).as("sh"),
      expr(TextExprs.positionalShingleHashesSpark(TextExprs.wordHashArraySpark("w"), 3, 31L)).as("pos"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    assert(out(1)._1.isEmpty && out(1)._2.isEmpty, "2 tokens under n=3 must be empty")
    assert(out(2)._1.isEmpty && out(2)._2.isEmpty, "0 tokens must be empty")
    assert(out(3)._1.size == 1 && out(3)._2.size == 1)
    assert(out(4)._2.size == 2 && out(4)._2.head == out(3)._2.head,
      "guard must not disturb the ≥ n windows (positional prefix stable)")
  }
}
