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

  test("min_pair_long ≡ min(struct) on randomized longs incl. ties and Long boundaries (VERDICT r19 #4)") {
    import spark.implicits._
    graft.functions.MinPair.register(spark)
    // randomized groups with deliberate collisions: a SMALL value
    // domain forces repeated (a, b) pairs (ties), repeated a with
    // different b (the lexicographic second-slot decision), and the
    // boundary values sit in the draw set so MinValue/MaxValue order
    // like any other long
    val domain = Array(Long.MinValue, Long.MinValue + 1, -7L, -1L, 0L,
      1L, 2L, 42L, Long.MaxValue - 1, Long.MaxValue)
    val rows = (1 to 4000).map { _ =>
      (rnd.nextInt(37).toLong, domain(rnd.nextInt(domain.length)),
        domain(rnd.nextInt(domain.length)))
    }
    val df = rows.toDF("g", "a", "b")
    val both = df.groupBy("g").agg(
      expr("min_pair_long(a, b)").as("mp"),
      min(struct(col("a"), col("b"))).as("ms"))
    val bad = both.filter(
      col("mp")("a") =!= col("ms")("a") || col("mp")("b") =!= col("ms")("b"))
      .collect()
    assert(bad.isEmpty, bad.mkString("\n"))
    // and the all-group sweep really covered ties: at 4000 draws over
    // a 10×10 pair domain and 37 groups, a tie-free run is impossible
    val withTies = df.groupBy("g", "a", "b").count().filter(col("count") > 1).count()
    assert(withTies > 0, "tie coverage assumption broken — enlarge the draw")
  }

  test("markFirstByFp falls back to min(struct) for NON-integral order columns (VERDICT r19 #2)") {
    import spark.implicits._
    // chunkDedup with STRING ids: before the r20 type guard, the
    // min_pair_long path CAST the ids to BIGINT → NULL, the aggregate
    // skipped every row, keep evaluated NULL, and the whole group was
    // silently dropped. The guard routes non-integral order columns
    // to min(struct(...)) — any orderable type, same keep-first rule.
    val chunks = Seq(
      ("doc_b", "c1", "same text"),
      ("doc_a", "c2", "same text"), // lexicographically first (doc, chunk)
      ("doc_a", "c9", "same text"),
      ("doc_z", "c0", "other text")
    ).toDF("doc_id", "chunk_id", "chunk_text")
    val marked = graft.operators.Dedup.chunkDedup(chunks)
    val kept = marked.filter(col("keep"))
      .select("doc_id", "chunk_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("doc_a", "c2"), ("doc_z", "c0")), kept)
    // the integral path is unchanged: long ids still keep-first
    val chunksL = Seq(
      (7L, 1L, "same text"), (3L, 2L, "same text"), (3L, 9L, "same text"))
      .toDF("doc_id", "chunk_id", "chunk_text")
    val keptL = graft.operators.Dedup.chunkDedup(chunksL)
      .filter(col("keep")).select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keptL == Set((3L, 2L)), keptL)
  }
}
