package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

/** Property-style invariants for the SCD2 operator over randomized
  * unique-key snapshots with NULL payloads (fixed seed,
  * deterministic). The laws a versioned warehouse depends on:
  *
  *   1. round trip: asOf at/after t0 but before t1 ≡ the before
  *      snapshot; asOf at/after t1 ≡ the after snapshot — for ANY
  *      snapshot pair, including NULL-valued payloads
  *   2. row budget: |history| = |unchanged| + 2·|updated| + |deleted|
  *      + |inserted|
  *   3. at most one current row per key, and current ⟺ open interval
  *   4. change_type partitions the key space consistently with the
  *      diff operator's row statuses
  */
class Scd2PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(2024)

  /** Unique-key snapshot: key domain 0..9 (so before/after overlap is
    * likely), nullable int + string payloads.
    */
  private def randSnapshot(): DataFrame = {
    import spark.implicits._
    val keys = rnd.shuffle((0 to 9).toList).take(rnd.nextInt(10))
    keys.map(k => (
      k,
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3)),
      if (rnd.nextInt(4) == 0) None else Some(Seq("x", "y")(rnd.nextInt(2)))))
      .toDF("k", "v1", "v2")
  }

  private def asSet(df: DataFrame): Set[(Int, Option[Int], Option[String])] =
    df.select("k", "v1", "v2").collect().map { r =>
      (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)))
    }.toSet

  test("asOf round-trips any random snapshot pair, NULLs included") {
    for (i <- 1 to 10) {
      val before = randSnapshot()
      val after = randSnapshot()
      val hist = Scd2.snapshotHistory(before, after, Seq("k"), "2024-01-01", "2024-02-01")
      assert(asSet(Scd2.asOf(hist, "2024-01-01")) == asSet(before), s"iter $i: t0 read != before")
      assert(asSet(Scd2.asOf(hist, "2024-01-31")) == asSet(before), s"iter $i: pre-t1 read != before")
      assert(asSet(Scd2.asOf(hist, "2024-02-01")) == asSet(after), s"iter $i: t1 read != after")
      assert(asSet(Scd2.asOf(hist, "2099-12-31")) == asSet(after), s"iter $i: far-future read != after")
      // before t0 nothing exists
      assert(Scd2.asOf(hist, "2023-12-31").count() == 0, s"iter $i: pre-history read not empty")
    }
  }

  test("merge folds a third random snapshot in and still round-trips all three") {
    for (i <- 1 to 6) {
      val s0 = randSnapshot()
      val s1 = randSnapshot()
      val s2 = randSnapshot()
      val hist = Scd2.merge(
        Scd2.snapshotHistory(s0, s1, Seq("k"), "2024-01-01", "2024-02-01"),
        s2, Seq("k"), "2024-03-01")
      assert(asSet(Scd2.asOf(hist, "2024-01-15")) == asSet(s0), s"iter $i t0")
      assert(asSet(Scd2.asOf(hist, "2024-02-15")) == asSet(s1), s"iter $i t1")
      assert(asSet(Scd2.asOf(hist, "2024-03-15")) == asSet(s2), s"iter $i t2")
      // ≤1 current row per key; current ⟺ open interval
      val rows = hist.collect()
      rows.groupBy(_.getAs[Int]("k")).foreach { case (k, vs) =>
        assert(vs.count(_.getAs[Boolean]("is_current")) <= 1, s"iter $i key $k")
        vs.foreach(r => assert(
          r.getAs[Boolean]("is_current") == (r.getAs[java.sql.Date]("valid_to") == null)))
      }
      // merging the SAME snapshot again is a no-op on the visible data
      val again = Scd2.merge(hist, s2, Seq("k"), "2024-04-01")
      assert(asSet(Scd2.asOf(again, "2024-04-15")) == asSet(s2), s"iter $i idempotent")
      assert(again.count() == rows.length, s"iter $i no-op row count")
    }
  }

  test("row budget and current-row uniqueness hold for random pairs") {
    for (i <- 1 to 10) {
      val before = randSnapshot()
      val after = randSnapshot()
      val hist = Scd2.snapshotHistory(before, after, Seq("k"), "2024-01-01", "2024-02-01")
        .collect()
      val byType = hist.groupBy(_.getAs[String]("change_type")).view.mapValues(_.length).toMap
      val bKeys = asSet(before).map(_._1)
      val aKeys = asSet(after).map(_._1)
      val bMap = asSet(before).map(t => t._1 -> (t._2, t._3)).toMap
      val aMap = asSet(after).map(t => t._1 -> (t._2, t._3)).toMap
      val unchanged = (bKeys & aKeys).count(k => bMap(k) == aMap(k))
      val updated = (bKeys & aKeys).count(k => bMap(k) != aMap(k))
      val deleted = (bKeys -- aKeys).size
      val inserted = (aKeys -- bKeys).size
      assert(byType.getOrElse("unchanged", 0) == unchanged, s"iter $i unchanged")
      assert(byType.getOrElse("updated", 0) == 2 * updated, s"iter $i updated")
      assert(byType.getOrElse("deleted", 0) == deleted, s"iter $i deleted")
      assert(byType.getOrElse("inserted", 0) == inserted, s"iter $i inserted")
      assert(hist.length == unchanged + 2 * updated + deleted + inserted, s"iter $i total")
      // per key: ≤1 current row, and current ⟺ open valid_to
      hist.groupBy(_.getAs[Int]("k")).foreach { case (k, rows) =>
        assert(rows.count(_.getAs[Boolean]("is_current")) <= 1, s"iter $i key $k current")
        rows.foreach { r =>
          assert(r.getAs[Boolean]("is_current") == (r.getAs[java.sql.Date]("valid_to") == null),
            s"iter $i key $k current≠open")
        }
      }
    }
  }
}
