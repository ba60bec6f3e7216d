package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableDiff

/** Property-style invariants over randomized small tables (fixed seed,
  * deterministic): the semantic laws SURVEY.md §5 calls out that the
  * reference never pinned.
  */
class DiffPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(42)

  /** Random table: int key from a small domain (collisions likely),
    * nullable int + string payloads, 0..8 rows. Keys are non-NULL:
    * the swap law does NOT hold for NULL keys — the reference keys
    * `_row_status` off `b_<k0> IS NULL` (full_compare.sql.j2:68-72),
    * so a present-both NULL-keyed row reads 4 in BOTH directions
    * (pinned separately in TableDiffSpec).
    */
  private def randTable(allowNullKey: Boolean = false): DataFrame = {
    import spark.implicits._
    val n = rnd.nextInt(9)
    val rows = Seq.fill(n)((
      if (allowNullKey && rnd.nextInt(6) == 0) None else Some(rnd.nextInt(5)),
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3)),
      if (rnd.nextInt(4) == 0) None else Some(Seq("x", "y", "z")(rnd.nextInt(3)))))
    rows.toDF("k", "v1", "v2")
  }

  /** Unique-key table: one row per key, non-NULL keys. */
  private def randUniqueTable(): DataFrame = {
    import spark.implicits._
    val keys = rnd.shuffle((0 to 7).toList).take(1 + rnd.nextInt(7))
    keys.map(k => (k, rnd.nextInt(3), Seq("x", "y")(rnd.nextInt(2))))
      .toDF("k", "v1", "v2")
  }

  test("swap symmetry: diff(b,a) = diff(a,b) with statuses 2↔3 and 4↔5 swapped") {
    for (_ <- 1 to 8) {
      val a = randTable()
      val b = randTable()
      val fwd = TableDiff.diff(a, b, Seq("k"))
      val bwd = TableDiff.diff(b, a, Seq("k"))
      val swapped = fwd.select(
        expr("CASE WHEN _row_status = 4 THEN 5 WHEN _row_status = 5 THEN 4 ELSE _row_status END")
          .as(TableDiff.RowStatus) +:
          col("K_k") +:
          TableDiff.statusColumns(fwd).map(c =>
            expr(s"CASE WHEN $c = 2 THEN 3 WHEN $c = 3 THEN 2 ELSE $c END").as(c)): _*)
      assert(swapped.columns.toSeq == bwd.columns.toSeq)
      assert(
        swapped.exceptAll(bwd).isEmpty && bwd.exceptAll(swapped).isEmpty,
        s"swap symmetry violated\nA:\n${a.collect().mkString("\n")}\nB:\n${b.collect().mkString("\n")}")
    }
  }

  test("self-diff with unique keys ⇒ every status 0, _row_status NULL") {
    for (_ <- 1 to 8) {
      val t = randUniqueTable()
      val d = TableDiff.diff(t, t, Seq("k"))
      assert(d.count() == t.count())
      assert(d.filter("_row_status IS NOT NULL").isEmpty)
      val statusSum = TableDiff.statusColumns(d)
        .map(c => sum(col(c))).reduce(_ + _)
      assert(d.agg(statusSum).collect().head.getLong(0) == 0L)
    }
  }

  test("nullKeySideChannel plan ≡ default plan (exact split by NULL pattern)") {
    import graft.operators.DiffOptions
    for (_ <- 1 to 6) {
      val a = randTable(allowNullKey = true)
      val b = randTable(allowNullKey = true)
      val plain = TableDiff.diff(a, b, Seq("k"))
      val split = TableDiff.diff(a, b, Seq("k"),
        opts = DiffOptions(nullKeySideChannel = true))
      assert(plain.columns.toSeq == split.columns.toSeq)
      assert(plain.exceptAll(split).isEmpty && split.exceptAll(plain).isEmpty)
    }
  }

  test("keysNotNull plan ≡ default plan when keys are in fact non-NULL") {
    import graft.operators.DiffOptions
    for (_ <- 1 to 6) {
      val a = randTable()
      val b = randTable()
      val plain = TableDiff.diff(a, b, Seq("k"))
      val eq = TableDiff.diff(a, b, Seq("k"), opts = DiffOptions(keysNotNull = true))
      assert(plain.exceptAll(eq).isEmpty && eq.exceptAll(plain).isEmpty)
    }
  }

  test("key-set law: output keys = distinct union of both sides' key tuples") {
    for (_ <- 1 to 5) {
      val a = randTable(allowNullKey = true)
      val b = randTable(allowNullKey = true)
      val d = TableDiff.diff(a, b, Seq("k"))
      val expected = a.select("k").union(b.select("k")).distinct().count()
      assert(d.select("K_k").distinct().count() == expected)
    }
  }

  test("dedupDuplicateKeys law: ≡ plain diff of MIN-collapsed sides + exact multiplicities") {
    import graft.operators.DiffOptions
    for (_ <- 1 to 8) {
      val a = randTable(allowNullKey = true)
      val b = randTable(allowNullKey = true)
      val d = TableDiff.diff(a, b, Seq("k"),
        opts = DiffOptions(dedupDuplicateKeys = true))
      // one output row per key tuple, NULL keys one group
      assert(d.count() == a.select("k").union(b.select("k")).distinct().count())
      // status matrix ≡ a plain diff over manually collapsed sides
      def collapsed(df: DataFrame): DataFrame =
        df.groupBy("k").agg(min("v1").as("v1"), min("v2").as("v2"))
      val manual = TableDiff.diff(collapsed(a), collapsed(b), Seq("k"))
      val core = d.drop("_dup_before", "_dup_after", "_dup_status")
      assert(core.exceptAll(manual).isEmpty && manual.exceptAll(core).isEmpty,
        s"collapse law violated\nA:\n${a.collect().mkString("\n")}\nB:\n${b.collect().mkString("\n")}")
      // multiplicities are the sides' true per-key row counts
      val beforeCounts = a.groupBy("k").count().collect()
        .map(r => r.get(0) -> r.getLong(1)).toMap
      val afterCounts = b.groupBy("k").count().collect()
        .map(r => r.get(0) -> r.getLong(1)).toMap
      d.collect().foreach { r =>
        val k = r.getAs[Any]("K_k")
        assert(Option(r.getAs[Any]("_dup_before")) == beforeCounts.get(k).map(identity))
        assert(Option(r.getAs[Any]("_dup_after")) == afterCounts.get(k).map(identity))
      }
    }
  }
}
