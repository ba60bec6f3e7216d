package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def history(
      before: Seq[(java.lang.Long, String, java.lang.Double)],
      after: Seq[(java.lang.Long, String, java.lang.Double)]) = {
    import spark.implicits._
    Scd2.snapshotHistory(
      before.toDF("k", "status", "amount"),
      after.toDF("k", "status", "amount"),
      keys = Seq("k"),
      validFrom = "2024-01-01", validTo = "2024-02-01")
  }

  private def byKey(rows: Array[Row]): Map[Long, Seq[Row]] =
    rows.groupBy(_.getAs[Long]("k")).view.mapValues(_.toSeq.sortBy(r =>
      Option(r.getAs[java.sql.Date]("valid_from")).map(_.toString).getOrElse(""))).toMap

  test("unchanged, updated, deleted, inserted keys get the right intervals") {
    val rows = history(
      before = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0)),
      after = Seq((1L, "A", 10.0), (2L, "B", 20.0), (4L, "A", 40.0))
    ).collect()
    val m = byKey(rows)

    // unchanged: one open row from t0
    val Seq(u) = m(1L)
    assert(u.getAs[String]("change_type") == "unchanged")
    assert(u.getAs[java.sql.Date]("valid_from").toString == "2024-01-01")
    assert(u.getAs[java.sql.Date]("valid_to") == null)
    assert(u.getAs[Boolean]("is_current"))

    // updated: closed old version + open new version
    val Seq(oldV, newV) = m(2L)
    assert(oldV.getAs[String]("change_type") == "updated")
    assert(oldV.getAs[String]("status") == "A")
    assert(oldV.getAs[java.sql.Date]("valid_to").toString == "2024-02-01")
    assert(!oldV.getAs[Boolean]("is_current"))
    assert(newV.getAs[String]("status") == "B")
    assert(newV.getAs[java.sql.Date]("valid_from").toString == "2024-02-01")
    assert(newV.getAs[java.sql.Date]("valid_to") == null)
    assert(newV.getAs[Boolean]("is_current"))

    // deleted: one closed row, nothing current
    val Seq(d) = m(3L)
    assert(d.getAs[String]("change_type") == "deleted")
    assert(d.getAs[java.sql.Date]("valid_to").toString == "2024-02-01")
    assert(!d.getAs[Boolean]("is_current"))

    // inserted: one open row from t1
    val Seq(i) = m(4L)
    assert(i.getAs[String]("change_type") == "inserted")
    assert(i.getAs[java.sql.Date]("valid_from").toString == "2024-02-01")
    assert(i.getAs[Boolean]("is_current"))

    assert(rows.length == 5)
  }

  test("NULL value changes are tracked null-safely, NULL-to-NULL is unchanged") {
    val rows = history(
      before = Seq((1L, null, 10.0), (2L, "A", 20.0), (3L, null, null)),
      after = Seq((1L, "A", 10.0), (2L, null, 20.0), (3L, null, null))
    ).collect()
    val m = byKey(rows)
    assert(m(1L).size == 2) // NULL -> A is an update
    assert(m(2L).size == 2) // A -> NULL is an update
    val Seq(same) = m(3L) // NULL <=> NULL: unchanged
    assert(same.getAs[String]("change_type") == "unchanged")
  }

  test("exactly one join in the plan — no 4-branch union re-scan") {
    val df = history(
      before = Seq((1L, "A", 10.0)),
      after = Seq((1L, "B", 10.0)))
    // executedPlan is an AdaptiveSparkPlan leaf — count joins in the
    // rendered tree instead of recursing children
    val plan = df.queryExecution.executedPlan.toString
    val joins = plan.linesIterator.count(_.contains("Join"))
    assert(joins == 1, s"expected exactly 1 join, plan:\n$plan")
  }

  test("asOf reconstructs each snapshot losslessly on its side of the transition") {
    import spark.implicits._
    val before = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0))
      .map { case (k, s2, a) => (java.lang.Long.valueOf(k), s2, java.lang.Double.valueOf(a)) }
    val after = Seq((1L, "A", 10.0), (2L, "B", 20.0), (4L, "A", 40.0))
      .map { case (k, s2, a) => (java.lang.Long.valueOf(k), s2, java.lang.Double.valueOf(a)) }
    val hist = Scd2.snapshotHistory(
      before.toDF("k", "status", "amount"), after.toDF("k", "status", "amount"),
      keys = Seq("k"), validFrom = "2024-01-01", validTo = "2024-02-01")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("status"), r.getAs[Double]("amount"))).toSet

    // mid-interval → before; at/after the transition → after;
    // exactly t0 → before (valid_from ≤ d is inclusive)
    assert(rows(Scd2.asOf(hist, "2024-01-15")) == before.map(t => (t._1.longValue, t._2, t._3.doubleValue)).toSet)
    assert(rows(Scd2.asOf(hist, "2024-01-01")) == before.map(t => (t._1.longValue, t._2, t._3.doubleValue)).toSet)
    assert(rows(Scd2.asOf(hist, "2024-02-01")) == after.map(t => (t._1.longValue, t._2, t._3.doubleValue)).toSet)
    assert(rows(Scd2.asOf(hist, "2030-01-01")) == after.map(t => (t._1.longValue, t._2, t._3.doubleValue)).toSet)
  }

  test("every key present in either snapshot has exactly one current or closed chain") {
    // is_current XOR closed-without-successor: each key's interval set
    // must tile [t0, ∞) or [t0, t1) with no overlaps — spot-check the
    // invariant structurally on a mixed fixture
    val rows = history(
      before = (1L to 20L).map(k => (java.lang.Long.valueOf(k), if (k % 3 == 0) "X" else "Y", java.lang.Double.valueOf(k.toDouble))),
      after = (3L to 22L).map(k => (java.lang.Long.valueOf(k), if (k % 4 == 0) "X" else "Y", java.lang.Double.valueOf(k.toDouble)))
    ).collect()
    byKey(rows).foreach { case (k, versions) =>
      val current = versions.count(_.getAs[Boolean]("is_current"))
      assert(current <= 1, s"key $k has $current current rows")
      // an open row, if any, must start where the closed row ended
      if (versions.size == 2) {
        assert(versions.head.getAs[java.sql.Date]("valid_to").toString ==
          versions(1).getAs[java.sql.Date]("valid_from").toString)
      }
    }
  }
}
