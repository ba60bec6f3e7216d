package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DiffOptions, DiffSql, DiffSummary, TableDiff}

/** Mirrors every pinned scenario of the reference's test suite
  * (reference: tests/test_diffgen.py, via FIXTURES.md §A3) plus the
  * scenarios the reference leaves untested (row-only-in-before, NULL
  * keys, duplicate-key fan-out, legacy `_row_status = 0` mode) and the
  * fast-plan ≡ literal-plan equivalence property.
  */
class TableDiffSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rowsByKey(df: DataFrame, key: String): Map[Any, Row] =
    df.collect().map(r => r.getAs[Any](key) -> r).toMap

  // --- tests/test_diffgen.py:22-56 ---
  test("identical single row → all statuses 0, _row_status NULL") {
    val before = Seq((1, "a")).toDF("k1", "val")
    val d = TableDiff.diff(before, before, Seq("k1")).collect().head
    assert(d.getAs[Any]("_row_status") == null)
    assert(d.getAs[Int]("val") == 0)
    assert(d.getAs[Int]("k1") == 0)
    assert(d.getAs[Int]("K_k1") == 1)
  }

  // --- tests/test_diffgen.py:59-94 ---
  test("column added on after side → status 2 everywhere for it") {
    val before = Seq((1, "a")).toDF("k1", "val")
    val after = Seq((1, "a", 99)).toDF("k1", "val", "new_col")
    val d = TableDiff.diff(before, after, Seq("k1")).collect().head
    assert(d.getAs[Any]("_row_status") == null)
    assert(d.getAs[Int]("val") == 0)
    assert(d.getAs[Int]("new_col") == 2)
  }

  test("column dropped on after side → status 3") {
    val before = Seq((1, "a", 99)).toDF("k1", "val", "old_col")
    val after = Seq((1, "a")).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1")).collect().head
    assert(d.getAs[Int]("old_col") == 3)
  }

  // --- tests/test_diffgen.py:97-126 ---
  test("changed value → status 1") {
    val before = Seq((1, "a")).toDF("k1", "val")
    val after = Seq((1, "b")).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1")).collect().head
    assert(d.getAs[Any]("_row_status") == null)
    assert(d.getAs[Int]("val") == 1)
  }

  // --- tests/test_diffgen.py:129-157 ---
  test("row only in after → _row_status 4, value cols 2") {
    val before = Seq.empty[(Int, String)].toDF("k1", "val")
    val after = Seq((1, "a")).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1")).collect().head
    assert(d.getAs[Int]("_row_status") == 4)
    assert(d.getAs[Int]("val") == 2)
    assert(d.getAs[Int]("K_k1") == 1)
  }

  // untested in the reference (full_compare.sql.j2:70)
  test("row only in before → _row_status 5, value cols 3") {
    val before = Seq((1, "a")).toDF("k1", "val")
    val after = Seq.empty[(Int, String)].toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1")).collect().head
    assert(d.getAs[Int]("_row_status") == 5)
    assert(d.getAs[Int]("val") == 3)
  }

  // --- tests/test_diffgen.py:160-194 ---
  test("composite key") {
    val before = Seq((1, "x", 100)).toDF("k1", "k2", "val")
    val d = TableDiff.diff(before, before, Seq("k1", "k2")).collect().head
    assert(d.getAs[Any]("_row_status") == null)
    assert(d.getAs[Int]("val") == 0)
    assert(d.getAs[String]("K_k2") == "x")
  }

  test("both-NULL cells match (status 0); one-side NULL → 2/3") {
    val before = Seq((1, Option.empty[String], Option("x"), Option("y")))
      .toDF("k1", "both_null", "null_after", "same")
    val after = Seq((1, Option.empty[String], Option.empty[String], Option("y")))
      .toDF("k1", "both_null", "null_after", "same")
    val d = TableDiff.diff(before, after, Seq("k1")).collect().head
    assert(d.getAs[Int]("both_null") == 0)
    assert(d.getAs[Int]("null_after") == 3)
    assert(d.getAs[Int]("same") == 0)
  }

  test("NULL-valued keys pair up null-safely (and poison _row_status per reference)") {
    val before = Seq((Option.empty[Int], "a"), (Option(1), "b")).toDF("k1", "val")
    val after = Seq((Option.empty[Int], "a"), (Option(1), "b")).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1"))
    // NULL key matched NULL key → one output row for it, val status 0.
    // The reference keys _row_status off b_<k0> IS NULL, so a present
    // NULL-keyed row still reads 4 — faithfully reproduced
    // (full_compare.sql.j2:68-72).
    assert(d.count() == 2)
    val nullRow = d.filter("K_k1 IS NULL").collect().head
    assert(nullRow.getAs[Int]("val") == 0)
    assert(nullRow.getAs[Int]("_row_status") == 4)
  }

  test("duplicate keys fan out b×a per key (reference multiplicity)") {
    val before = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k1", "val")
    val after = Seq((1, "x"), (1, "y"), (1, "z")).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1"))
    // key 1: 2×3 = 6 rows; key 2: only-in-before → 1 row
    assert(d.count() == 7)
    assert(d.filter("K_k1 = 1").count() == 6)
    val lit = TableDiff.diff(before, after, Seq("k1"),
      opts = DiffOptions(literalPlan = true))
    assert(lit.count() == 7)
  }

  test("dedupDuplicateKeys collapses to one row per key with MIN representative + multiplicity") {
    val before = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k1", "val")
    val after = Seq((1, "x"), (1, "y"), (1, "z"), (3, "q")).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1"),
      opts = DiffOptions(dedupDuplicateKeys = true))
    // one row per key — the reference-mandated b×a fan-out (2×3 on
    // key 1) is gone; the counts carry what was collapsed
    assert(d.count() == 3)
    val byKey = rowsByKey(d, "K_k1")
    val k1 = byKey(1)
    assert(k1.getAs[Any]("_row_status") == null)
    assert(k1.getAs[Long]("_dup_before") == 2L && k1.getAs[Long]("_dup_after") == 3L)
    assert(k1.getAs[Int]("_dup_status") == TableDiff.Different)
    assert(k1.getAs[Int]("val") == TableDiff.Different) // MIN "a" vs MIN "x"
    val k2 = byKey(2) // only-in-before: after-side count NULL → status 3
    assert(k2.getAs[Int]("_row_status") == TableDiff.MissingInAfter)
    assert(k2.getAs[Long]("_dup_before") == 1L && k2.getAs[Any]("_dup_after") == null)
    assert(k2.getAs[Int]("_dup_status") == TableDiff.NullInAfterOnly)
    val k3 = byKey(3)
    assert(k3.getAs[Int]("_row_status") == TableDiff.MissingInBefore)
    assert(k3.getAs[Any]("_dup_before") == null && k3.getAs[Long]("_dup_after") == 1L)
    assert(k3.getAs[Int]("_dup_status") == TableDiff.NullInBeforeOnly)
    // equal-multiplicity key reads 0 — and identical content matches
    // even though the INPUT rows were duplicated
    val dupBoth = TableDiff.diff(
      Seq((5, "m"), (5, "m")).toDF("k1", "val"),
      Seq((5, "m"), (5, "m")).toDF("k1", "val"),
      Seq("k1"), opts = DiffOptions(dedupDuplicateKeys = true)).collect().head
    assert(dupBoth.getAs[Int]("_dup_status") == TableDiff.Match)
    assert(dupBoth.getAs[Int]("val") == TableDiff.Match)
    // literal-plan composition yields the identical collapsed result
    val lit = TableDiff.diff(before, after, Seq("k1"),
      opts = DiffOptions(dedupDuplicateKeys = true, literalPlan = true))
    assert(lit.columns.toSeq == d.columns.toSeq)
    assert(lit.exceptAll(d).isEmpty && d.exceptAll(lit).isEmpty)
    // differingRows survives a metadata-stripping parquet round trip:
    // raw counts are excluded from the name-heuristic status set, so
    // an all-match collapsed diff flags nothing
    val self = TableDiff.diff(before, before, Seq("k1"),
      opts = DiffOptions(dedupDuplicateKeys = true))
    val p = java.nio.file.Files.createTempDirectory("dupkeys").toString + "/d"
    self.write.mode("overwrite").parquet(p)
    assert(spark.read.parquet(p).filter(TableDiff.anyColumnDiffers(spark.read.parquet(p))).isEmpty)
  }

  test("dedupDuplicateKeys ≡ plain diff of pre-collapsed sides (contract property)") {
    // the mode's contract: diff(collapse(b), collapse(a)) + counts.
    // NULL keys group together (groupBy ≡ <=> pairing), all-NULL
    // columns stay NULL through MIN.
    val before = Seq(
      (Option(1), Option(10)), (Option(1), Option.empty[Int]),
      (Option.empty[Int], Option(7)), (Option.empty[Int], Option(3)),
      (Option(2), Option.empty[Int]), (Option(2), Option.empty[Int])
    ).toDF("k1", "val")
    val after = Seq(
      (Option(1), Option(10)),
      (Option.empty[Int], Option(3)),
      (Option(9), Option(1))
    ).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1"),
      opts = DiffOptions(dedupDuplicateKeys = true))
    import org.apache.spark.sql.functions.{col, count, lit => flit, min}
    def collapsed(df: DataFrame) =
      df.groupBy("k1").agg(min(col("val")).as("val"))
    val manual = TableDiff.diff(collapsed(before), collapsed(after), Seq("k1"))
    val dCore = d.drop("_dup_before", "_dup_after", "_dup_status")
    assert(dCore.exceptAll(manual).isEmpty && manual.exceptAll(dCore).isEmpty)
    // NULL key collapsed to ONE row carrying both sides' counts
    val nullRow = d.filter(col("K_k1").isNull).collect()
    assert(nullRow.length == 1)
    assert(nullRow.head.getAs[Long]("_dup_before") == 2L)
    assert(nullRow.head.getAs[Long]("_dup_after") == 1L)
    // reserved-name guard fails fast
    val clash = Seq((1, 2L)).toDF("k1", "_dup_before")
    val e = intercept[IllegalArgumentException] {
      TableDiff.diff(clash, clash, Seq("k1"),
        opts = DiffOptions(dedupDuplicateKeys = true))
    }
    assert(e.getMessage.contains("_dup_before"))
    // a PLAIN diff over user data that happens to carry a _dup_before
    // column keeps it in the status set even after a metadata-
    // stripping round trip: the name exclusion applies only to frames
    // carrying the full dedup trio (counts + _dup_status)
    val plain = TableDiff.diff(clash, Seq((1, 3L)).toDF("k1", "_dup_before"), Seq("k1"))
    val pp = java.nio.file.Files.createTempDirectory("plaindup").toString + "/d"
    plain.write.mode("overwrite").parquet(pp)
    val stripped = spark.read.parquet(pp)
    assert(TableDiff.statusColumns(stripped).contains("_dup_before"))
    assert(stripped.filter(TableDiff.anyColumnDiffers(stripped)).count() == 1)
  }

  test("DiffSummary over a dedup diff counts multiplicity-only drift as a cell diff") {
    // key 1: identical content, different duplication factor (2 vs 3)
    // — _dup_status = 1 is a status cell, so the summary's
    // rows_with_cell_diffs and differingRows both surface it; key 2 is
    // a clean match (equal counts, equal content) and stays silent
    val before = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k1", "val")
    val after = Seq((1, "a"), (1, "a"), (1, "a"), (2, "b")).toDF("k1", "val")
    val d = TableDiff.diff(before, after, Seq("k1"),
      opts = DiffOptions(dedupDuplicateKeys = true))
    val s = DiffSummary.summary(d).collect().head
    assert(s.getAs[Long]("total_rows") == 2)
    assert(s.getAs[Long]("rows_in_both") == 2)
    assert(s.getAs[Long]("rows_with_cell_diffs") == 1)
    val drill = DiffSummary.differingRows(d).collect()
    assert(drill.length == 1 && drill.head.getAs[Int]("K_k1") == 1)
    assert(drill.head.getAs[Int]("_dup_status") == TableDiff.Different)
    assert(drill.head.getAs[Int]("val") == TableDiff.Match)
  }

  test("fast plan ≡ literal plan (same row multiset)") {
    val before = Seq(
      (Option(1), Option("a"), Option(10)),
      (Option(1), Option("a"), Option(11)), // duplicate key
      (Option(2), Option.empty[String], Option(20)), // NULL in key
      (Option(3), Option("c"), Option.empty[Int]),
      (Option.empty[Int], Option("d"), Option(40))
    ).toDF("k1", "k2", "val")
    val after = Seq(
      (Option(1), Option("a"), Option(10)),
      (Option(2), Option.empty[String], Option(21)),
      (Option(4), Option("e"), Option(50)),
      (Option.empty[Int], Option("d"), Option(40))
    ).toDF("k1", "k2", "val")
    val fast = TableDiff.diff(before, after, Seq("k1", "k2"))
    val literal = TableDiff.diff(before, after, Seq("k1", "k2"),
      opts = DiffOptions(literalPlan = true))
    assert(fast.columns.toSeq == literal.columns.toSeq)
    // multiset equality via exceptAll both ways
    assert(fast.exceptAll(literal).isEmpty && literal.exceptAll(fast).isEmpty)
  }

  test("self-diff of a real table with unique keys is all-match") {
    val o = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val d = TableDiff.diff(o, o, Seq("o_orderkey"))
    assert(d.count() == o.count())
    assert(DiffSummary.differingRows(d).isEmpty)
  }

  test("self-diff under duplicate keys fans out m² per key and flags intra-key diffs") {
    // lineitem's (l_orderkey, l_linenumber) is deliberately non-unique
    // in the synthetic data — self-diff pairs every before-row with
    // every after-row of the same key, so rows with differing payloads
    // inside one key group read status 1 (reference multiplicity, §4).
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val d = TableDiff.diff(li, li, Seq("l_orderkey", "l_linenumber"))
    assert(d.count() >= li.count())
    assert(d.filter("_row_status IS NOT NULL").isEmpty) // every key on both sides
  }

  test("array columns: structural equality decides the status cell") {
    // Spark's array `=` is structural — null elements compare EQUAL,
    // lengths must match, NaN equals NaN — so the status CASE needs no
    // special handling; what this pins is the cell codes on every
    // planted edge (and q_diff_arrays pins the DuckDB twin via
    // IS NOT DISTINCT FROM — ANSI `=` would return NULL on the
    // null-element cells and mis-code them 1)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("xs", ArrayType(FloatType, containsNull = true))))
    def df(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val before = df(Seq(
      Row(1, Seq(1.0f, null)), // equal incl. null element  → 0
      Row(2, Seq.empty),       // equal empties             → 0
      Row(3, Seq(1.0f, 2.0f, 3.0f)), // truncated in after  → 1
      Row(4, Seq(1.0f, 2.0f)), // null element vs value     → 1
      Row(5, null),            // whole array NULL before   → 2
      Row(6, Seq(Float.NaN)),  // NaN cells compare equal   → 0
      Row(7, Seq(1.0f, 2.0f)))) // element changed          → 1
    val after = df(Seq(
      Row(1, Seq(1.0f, null)),
      Row(2, Seq.empty),
      Row(3, Seq(1.0f, 2.0f)),
      Row(4, Seq(1.0f, null)),
      Row(5, Seq(9.0f)),
      Row(6, Seq(Float.NaN)),
      Row(7, Seq(1.0f, 9.0f))))
    val d = TableDiff.diff(before, after, Seq("k"))
    val m = rowsByKey(d, "K_k")
    val expected = Map(1 -> 0, 2 -> 0, 3 -> 1, 4 -> 1, 5 -> 2, 6 -> 0, 7 -> 1)
    expected.foreach { case (k, want) =>
      assert(m(k).getAs[Int]("xs") == want, s"key $k")
      assert(m(k).getAs[Any]("_row_status") == null, s"key $k row status")
    }
  }

  test("struct columns: structural equality decides the cell (null fields compare equal)") {
    import org.apache.spark.sql.functions.expr
    def df(rows: Seq[(Int, String)]) = rows.toDF("k", "spec")
      .withColumn("st", expr(
        """CASE WHEN spec = 'null' THEN NULL
          |     WHEN spec = 'nf' THEN named_struct('x', 1, 'y', CAST(NULL AS INT))
          |     WHEN spec = 'v2' THEN named_struct('x', 1, 'y', 2)
          |     ELSE named_struct('x', 1, 'y', 9) END""".stripMargin))
      .drop("spec")
    val before = df(Seq(1 -> "nf", 2 -> "v2", 3 -> "null", 4 -> "v2"))
    val after = df(Seq(1 -> "nf", 2 -> "nf", 3 -> "v2", 4 -> "other"))
    val m = rowsByKey(TableDiff.diff(before, after, Seq("k")), "K_k")
    assert(m(1).getAs[Int]("st") == 0) // equal null-field structs → 0
    assert(m(2).getAs[Int]("st") == 1) // value vs null field      → 1
    assert(m(3).getAs[Int]("st") == 2) // whole struct NULL before → 2
    assert(m(4).getAs[Int]("st") == 1) // field value differs      → 1
  }

  test("map columns: entry-order-insensitive equality; map keys rejected") {
    // Spark cannot '=' maps at all — the status cell canonicalizes to
    // sorted entry arrays, so insertion order is data-invisible but
    // key sets, values, and null values inside still decide the cell
    val before = Seq(
      (1, Map("a" -> 1.0, "b" -> 2.0)),
      (2, Map("a" -> 1.0)),
      (3, Map("a" -> 1.0)),
      (4, Map.empty[String, Double]),
      (5, Map("a" -> 1.0))).toDF("k", "m")
    val after = Seq(
      (1, Map("b" -> 2.0, "a" -> 1.0)), // reversed order, equal data → 0
      (2, Map("a" -> 9.0)),             // value changed             → 1
      (3, Map("a" -> 1.0, "x" -> 0.0)), // key added                 → 1
      (4, Map.empty[String, Double]),   // equal empties             → 0
      (5, Map("a" -> 1.0))).toDF("k", "m")
    val m = rowsByKey(TableDiff.diff(before, after, Seq("k")), "K_k")
    assert(Map(1 -> 0, 2 -> 1, 3 -> 1, 4 -> 0, 5 -> 0)
      .forall { case (k, want) => m(k).getAs[Int]("m") == want })
    // null VALUES inside maps compare structurally (like array cells)
    import org.apache.spark.sql.functions.expr
    val bn = Seq(1).toDF("k").withColumn("m", expr("map('a', CAST(NULL AS DOUBLE))"))
    val an = Seq(1).toDF("k").withColumn("m", expr("map('a', CAST(NULL AS DOUBLE))"))
    assert(rowsByKey(TableDiff.diff(bn, an, Seq("k")), "K_k")(1).getAs[Int]("m") == 0)
    // a MAP business key fails fast with the remedy, not deep in analysis
    val e = intercept[IllegalArgumentException] {
      TableDiff.diff(before, after, Seq("m"))
    }
    assert(e.getMessage.contains("MAP"))
    // ... including a map NESTED in a struct/array key (same
    // INVALID_ORDERING_TYPE fate in the join, so the same fast guard)
    val nested = before.withColumn("s", expr("named_struct('inner', m)"))
    val e2 = intercept[IllegalArgumentException] {
      TableDiff.diff(nested, nested, Seq("s"))
    }
    assert(e2.getMessage.contains("MAP"))
    // dedup mode cannot MIN a map data column (no ordering in Spark
    // or DuckDB) — guarded at entry, and mirrored by the SQL twin
    val e3 = intercept[IllegalArgumentException] {
      TableDiff.diff(before, after, Seq("k"),
        opts = DiffOptions(dedupDuplicateKeys = true))
    }
    assert(e3.getMessage.contains("MIN ordering"))
    val e4 = intercept[IllegalArgumentException] {
      graft.operators.DiffSql.generate(
        "SELECT * FROM b", "SELECT * FROM a", Seq("k"),
        Seq("k", "m"), Seq("k", "m"),
        dedupDuplicateKeys = true, mapEntryEqCols = Set("m"))
    }
    assert(e4.getMessage.contains("MIN ordering"))
  }

  test("numericAbsTol treats near values as equal; NaN is different in tolerance mode") {
    val before = Seq(
      (1, 100.0), (2, 100.0), (3, 100.0), (4, Double.NaN)).toDF("k", "v")
    val after = Seq(
      (1, 100.005),          // within |b−a| ≤ 0.01 → 0
      (2, 105.0),            // beyond → 1
      (3, 100.0),            // exact → 0
      (4, Double.NaN)).toDF("k", "v") // NaN distance is not ≤ tol → 1
    val m = rowsByKey(
      TableDiff.diff(before, after, Seq("k"),
        opts = DiffOptions(numericAbsTol = Some(0.01))), "K_k")
    assert(Map(1 -> 0, 2 -> 1, 3 -> 0, 4 -> 1)
      .forall { case (k, want) => m(k).getAs[Int]("v") == want })
    // exact mode keeps Spark's NaN = NaN → 0, and 100.005 reads 1
    val ex = rowsByKey(TableDiff.diff(before, after, Seq("k")), "K_k")
    assert(ex(4).getAs[Int]("v") == 0 && ex(1).getAs[Int]("v") == 1)
    // generator guard: tolerance columns without a tolerance
    val e = intercept[IllegalArgumentException] {
      graft.operators.DiffSql.generate(
        "SELECT * FROM b", "SELECT * FROM a", Seq("k"),
        Seq("k", "v"), Seq("k", "v"), absTolCols = Set("v"))
    }
    assert(e.getMessage.contains("numericAbsTol"))
  }

  test("numericAbsTol: negative/NaN/Infinity rejected at every entry point (ADVICE r12)") {
    val t = Seq((1, 1.0)).toDF("k", "v")
    // negative/NaN code every numeric cell 1 even when bit-identical;
    // +Infinity codes every pair 0 — all three are silent
    // misconfigurations, so diff(), generate(), and the CLI share one
    // guard (DiffSql.validateAbsTol)
    for (bad <- Seq(-0.01, Double.NaN, Double.PositiveInfinity)) {
      val e1 = intercept[IllegalArgumentException] {
        TableDiff.diff(t, t, Seq("k"), opts = DiffOptions(numericAbsTol = Some(bad)))
      }
      assert(e1.getMessage.contains("finite non-negative"), s"diff($bad): ${e1.getMessage}")
      val e2 = intercept[IllegalArgumentException] {
        graft.operators.DiffSql.generate(
          "SELECT * FROM b", "SELECT * FROM a", Seq("k"),
          Seq("k", "v"), Seq("k", "v"),
          numericAbsTol = Some(bad), absTolCols = Set("v"))
      }
      assert(e2.getMessage.contains("finite non-negative"), s"generate($bad): ${e2.getMessage}")
    }
    // tol = 0 is a legitimate degenerate tolerance (exact match via
    // subtraction), not a misconfiguration
    val z = rowsByKey(
      TableDiff.diff(t, t, Seq("k"), opts = DiffOptions(numericAbsTol = Some(0.0))), "K_k")
    assert(z(1).getAs[Int]("v") == 0)
  }

  test("numericAbsTol: DECIMAL subtracts natively — no 2^53 collapse; integers stay exact (ADVICE r12)") {
    // two DECIMAL(20,2) values beyond 2^53 differing by exactly 0.01:
    // the old double-cast-the-operands spelling collapsed them to
    // "equal" (both round to the same double); native decimal
    // subtraction keeps the 0.01 visible to the ≤-test
    val before = Seq((1, BigDecimal("90071992547409930.02")))
      .toDF("k", "v").select($"k", $"v".cast("decimal(20,2)").as("v"))
    val after = Seq((1, BigDecimal("90071992547409930.01")))
      .toDF("k", "v").select($"k", $"v".cast("decimal(20,2)").as("v"))
    val tight = rowsByKey(
      TableDiff.diff(before, after, Seq("k"),
        opts = DiffOptions(numericAbsTol = Some(0.005))), "K_k")
    assert(tight(1).getAs[Int]("v") == 1, "0.01 apart > 0.005 tol — must read different")
    val loose = rowsByKey(
      TableDiff.diff(before, after, Seq("k"),
        opts = DiffOptions(numericAbsTol = Some(0.02))), "K_k")
    assert(loose(1).getAs[Int]("v") == 0, "0.01 apart ≤ 0.02 tol — equal under tolerance")
    // integer-family columns left the tolerance entirely (no
    // recomputation noise to forgive, and their double-cast is the
    // same 2^53 trap): BIGINTs 2 apart read 1 even under tol = 5
    val bi = Seq((1, 9007199254740993L)).toDF("k", "v")
    val ba = Seq((1, 9007199254740995L)).toDF("k", "v")
    val ints = rowsByKey(
      TableDiff.diff(bi, ba, Seq("k"),
        opts = DiffOptions(numericAbsTol = Some(5.0))), "K_k")
    assert(ints(1).getAs[Int]("v") == 1, "integral columns are never toleranced")
  }

  test("type evolution: same column, different types — widened comparison, pinned semantics (r13)") {
    import org.apache.spark.sql.types._
    // INT → BIGINT: equal values read 0 under the widened BIGINT,
    // drifted read 1; the key itself may type-change too
    val b1 = Seq((1, 10), (2, 20)).toDF("k", "v")
      .select($"k".cast("int").as("k"), $"v".cast("int").as("v"))
    val a1 = Seq((1L, 10L), (2L, 21L)).toDF("k", "v")
    val d1 = TableDiff.diff(b1, a1, Seq("k"))
    assert(d1.schema("K_k").dataType == LongType, "key echo carries the widened type")
    val m1 = rowsByKey(d1, "K_k")
    assert(m1(1L).getAs[Int]("v") == 0 && m1(2L).getAs[Int]("v") == 1)

    // DECIMAL(15,2) → DECIMAL(18,4): same value at different scales is
    // EQUAL under the widened DECIMAL(18,4); a drift only representable
    // in the wider scale reads 1
    val b2 = Seq((1, "123.45"), (2, "7.00")).toDF("k", "v")
      .select($"k", $"v".cast("decimal(15,2)").as("v"))
    val a2 = Seq((1, "123.4500"), (2, "7.0001")).toDF("k", "v")
      .select($"k", $"v".cast("decimal(18,4)").as("v"))
    val m2 = rowsByKey(TableDiff.diff(b2, a2, Seq("k")), "K_k")
    assert(m2(1).getAs[Int]("v") == 0, "123.45 ≡ 123.4500 under the widened scale")
    assert(m2(2).getAs[Int]("v") == 1, "7.00 vs 7.0001 differs — visible only in scale 4")

    // INT → VARCHAR: compared AS STRINGS via explicit cast — '5' = '5'
    // reads 0, and the decisive pin: INT 5 vs '05' reads 1 (textual,
    // not numeric, equality — the engine DECIDES rather than letting
    // each engine's coercion pick a direction)
    val b3 = Seq((1, 5), (2, 5), (3, 7)).toDF("k", "v")
    val a3 = Seq((1, "5"), (2, "05"), (3, "8")).toDF("k", "v")
    val m3 = rowsByKey(TableDiff.diff(b3, a3, Seq("k")), "K_k")
    assert(m3(1).getAs[Int]("v") == 0 && m3(2).getAs[Int]("v") == 1 &&
      m3(3).getAs[Int]("v") == 1)

    // DATE → TIMESTAMP_NTZ: dates compare at midnight
    val b4 = Seq((1, "2024-01-02"), (2, "2024-01-02")).toDF("k", "v")
      .select($"k", $"v".cast("date").as("v"))
    val a4 = Seq((1, "2024-01-02 00:00:00"), (2, "2024-01-02 10:30:00")).toDF("k", "v")
      .select($"k", $"v".cast("timestamp_ntz").as("v"))
    val m4 = rowsByKey(TableDiff.diff(b4, a4, Seq("k")), "K_k")
    assert(m4(1).getAs[Int]("v") == 0 && m4(2).getAs[Int]("v") == 1)

    // integral ↔ DECIMAL widens exactly; LONG ↔ DOUBLE widens to
    // DOUBLE (the documented FLOAT-contract 2^53 bound)
    assert(graft.operators.SchemaUtils.widen(IntegerType, DecimalType(15, 2))
      .contains(DecimalType(15, 2)), "13 integer digits already cover INT's 10")
    assert(graft.operators.SchemaUtils.widen(LongType, DecimalType(10, 4))
      .contains(DecimalType(23, 4)))
    assert(graft.operators.SchemaUtils.widen(LongType, DoubleType).contains(DoubleType))
    assert(graft.operators.SchemaUtils.widen(ByteType, LongType).contains(LongType))

    // incomparable pairs fail FAST with the type pair and a remedy —
    // never a silently-coerced cell: INT ↔ ARRAY, FLOAT ↔ STRING
    // (float text forms are engine-dependent), DECIMAL too wide to
    // hold both exactly
    val bArr = Seq((1, Seq(1, 2))).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      TableDiff.diff(b3, bArr, Seq("k"))
    }
    assert(e1.getMessage.contains("incomparably") && e1.getMessage.contains("'v'"),
      e1.getMessage)
    val bF = Seq((1, 1.5f)).toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      TableDiff.diff(bF, a3, Seq("k"))
    }
    assert(e2.getMessage.contains("incomparably"), e2.getMessage)
    assert(graft.operators.SchemaUtils.widen(DecimalType(38, 0), DecimalType(38, 4)).isEmpty,
      "38 integer digits + scale 4 cannot fit DECIMAL(38) — must fail, not truncate")

    // nullability-only differences (incl. nested flags) are NOT a type
    // change — file-source reads force everything nullable
    val arrB = Seq((1, Seq(1, 2))).toDF("k", "v") // containsNull = false
    val arrA = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1, Seq(1, 2)))),
      StructType(Seq(StructField("k", IntegerType, nullable = true),
        StructField("v", ArrayType(IntegerType, containsNull = true), nullable = true))))
    val m5 = rowsByKey(TableDiff.diff(arrB, arrA, Seq("k")), "K_k")
    assert(m5(1).getAs[Int]("v") == 0)
  }

  test("legacy _row_status=0 convention behind the flag") {
    val before = Seq((1, "a")).toDF("k1", "val")
    val d = TableDiff
      .diff(before, before, Seq("k1"), opts = DiffOptions(legacyRowStatusZero = true))
      .collect().head
    assert(d.getAs[Int]("_row_status") == 0)
  }

  test("per-side WHERE filters (opaque predicate strings)") {
    val t = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k1", "val")
    val d = TableDiff.diff(t, t, Seq("k1"),
      beforeWhere = Some("k1 <= 2"), afterWhere = Some("k1 >= 2"))
    val m = rowsByKey(d, "K_k1")
    assert(m(1).getAs[Int]("_row_status") == 5)
    assert(m(2).getAs[Any]("_row_status") == null)
    assert(m(3).getAs[Int]("_row_status") == 4)
  }

  test("upperCase mode upper-cases all output columns (Snowflake parity)") {
    val before = Seq((1, "a")).toDF("k1", "val")
    val d = TableDiff.diff(before, before, Seq("k1"),
      opts = DiffOptions(upperCase = true))
    assert(d.columns.toSeq == Seq("_row_status", "K_K1", "K1", "VAL"))
    // but a DATA column that equals a key's echo name must fail fast —
    // the output would otherwise carry two identically-named columns
    val poisoned = before.withColumnRenamed("val", "K_k1")
    val e = intercept[IllegalArgumentException] {
      TableDiff.diff(poisoned, poisoned, Seq("k1"))
    }
    assert(e.getMessage.contains("keyPrefix"))
  }

  // --- FIXTURES.md §A2: the canonical 6-row portfolio oracle ---
  test("portfolio end-to-end sample matches the documented oracle") {
    import java.sql.Date
    val dt = Date.valueOf("2024-01-15")
    val before = Seq(
      (1001L, "GROWTH", dt, 50000.00, "ACTIVE"),
      (1002L, "INCOME", dt, 75000.50, "ACTIVE"),
      (1003L, "GROWTH", dt, 25000.75, "SUSPENDED"),
      (1004L, "BALANCED", dt, 100000.00, "ACTIVE"),
      (1005L, "INCOME", dt, 30000.00, "ACTIVE")
    ).toDF("ACCOUNT_ID", "PORTFOLIO_NAME", "VALUATION_DATE", "BALANCE", "STATUS")
    val after = Seq(
      (1001L, "GROWTH", dt, 50000.00, "ACTIVE", 1.1),
      (1002L, "INCOME", dt, 75000.50, "ACTIVE", 2.2),
      (1003L, "GROWTH", dt, 25000.75, "ACTIVE", 3.3),
      (1004L, "BALANCED", dt, 100000.00, "ACTIVE", 4.4),
      (1005L, "INCOME", dt, 35000.00, "ACTIVE", 5.5),
      (1006L, "GROWTH", dt, 60000.00, "ACTIVE", 6.6)
    ).toDF("ACCOUNT_ID", "PORTFOLIO_NAME", "VALUATION_DATE", "BALANCE", "STATUS", "NEW_COLUMN")
    val keys = Seq("ACCOUNT_ID", "PORTFOLIO_NAME", "VALUATION_DATE")
    val d = TableDiff.diff(before, after, keys)
    assert(d.columns.head == "_row_status")
    val m = rowsByKey(d, "K_ACCOUNT_ID")
    for (k <- Seq(1001L, 1002L, 1004L)) {
      assert(m(k).getAs[Any]("_row_status") == null)
      assert(m(k).getAs[Int]("BALANCE") == 0)
      assert(m(k).getAs[Int]("STATUS") == 0)
      assert(m(k).getAs[Int]("NEW_COLUMN") == 2)
    }
    assert(m(1003L).getAs[Int]("STATUS") == 1)
    assert(m(1003L).getAs[Int]("BALANCE") == 0)
    assert(m(1005L).getAs[Int]("BALANCE") == 1)
    assert(m(1006L).getAs[Int]("_row_status") == 4)
    assert(m(1006L).getAs[Int]("BALANCE") == 2)
    // summary (README.md:186-196): total=6, different=2, missing_in_before=1
    val s = DiffSummary.summary(d).collect().head
    assert(s.getAs[Long]("total_rows") == 6L)
    assert(s.getAs[Long]("rows_in_both") == 5L)
    assert(s.getAs[Long]("missing_in_before") == 1L)
    assert(s.getAs[Long]("missing_in_after") == 0L)
    // every present-both row differs somewhere (NEW_COLUMN reads 2)
    assert(s.getAs[Long]("rows_with_cell_diffs") == 5L)
    // drill-down + decode (V2/V6)
    assert(DiffSummary.differingRows(d).count() == 6)
    val dec = d
      .select($"K_ACCOUNT_ID", DiffSummary.decodeStatus($"STATUS").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec(1003L) == "DIFFERENT")
    assert(dec(1001L) == "MATCH")
    assert(dec(1006L) == "NULL_IN_BEFORE_ONLY")
  }

  // --- tests/test_diffgen.py:197-249 (transport form) ---
  test("audit SQL emits the diff shape; flatten strips comments to one line") {
    val sql = DiffSql.generate(
      "SELECT * FROM b -- before side\n",
      "SELECT * FROM a",
      Seq("k1"), Seq("k1", "val"), Seq("k1", "val"))
    assert(sql.contains("IS NOT DISTINCT FROM"))
    assert(sql.contains("UNION"))
    val flat = DiffSql.flatten(sql)
    assert(!flat.contains("\n"))
    assert(!flat.contains("--"))
  }

  test("sideBySide pads missing columns and tags sources") {
    val before = Seq((1, "a")).toDF("k1", "val")
    val after = Seq((1, "a", 9)).toDF("k1", "val", "extra")
    val s = DiffSummary.sideBySide(before, after)
    assert(s.columns.toSeq == Seq("k1", "val", "source", "extra"))
    assert(s.count() == 2)
    assert(s.filter("source = 'BEFORE' AND extra IS NULL").count() == 1)
  }
}
