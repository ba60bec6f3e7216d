package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** Adversarial ScalaCheck properties for [[RangeJoinRewrite]]. The
  * rule is always-on in Verify/Bench, so its blast radius is every
  * user join — these pin that for RANDOM inputs the rewritten plan
  * returns exactly the brute-force BETWEEN semantics across the
  * hazards a bucketized rewrite can get wrong:
  *
  *   - NULL points and NULL interval bounds (must drop, not crash)
  *   - inverted intervals, lo > hi (match nothing, not throw in
  *     sequence())
  *   - zero-length intervals, lo == hi
  *   - points and bounds EXACTLY on bucket boundaries (k·width) and
  *     one unit either side — off-by-one in IntegralDivide flooring
  *     would lose or duplicate these
  *   - every supported point type: LONG, TIMESTAMP, TIMESTAMP_NTZ
  *   - a pre-existing equi-key must leave the join untouched
  *
  * Deterministic: ScalaCheck generators driven by fixed seeds
  * (pureApply), so a failure reproduces exactly.
  */
class RangeJoinPropertySpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; RangeJoinRewrite.install(s); s }

  /** Default bucket width (micros / raw long units). */
  private val B = 600000000L

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Values that stress the quantization: exact bucket boundaries,
    * one unit either side, and uniform fill over ~6 buckets.
    */
  private val boundaryish: Gen[Long] = Gen.frequency(
    3 -> Gen.choose(0L, 6L).map(_ * B),
    3 -> (for { k <- Gen.choose(0L, 6L); d <- Gen.oneOf(-1L, 1L) } yield k * B + d)
      .map(v => math.max(v, 0L)),
    4 -> Gen.choose(0L, 6L * B))

  private val pointsGen: Gen[List[(Long, Option[Long])]] =
    Gen.choose(1, 12).flatMap { n =>
      Gen.sequence[List[(Long, Option[Long])], (Long, Option[Long])](
        (1 to n).toList.map { pid =>
          Gen.frequency(
            7 -> boundaryish.map(v => (pid.toLong, Some(v))),
            1 -> Gen.const((pid.toLong, Option.empty[Long])))
        })
    }

  /** lo/hi drawn independently → ~half the defined intervals are
    * inverted; explicit zero-length and NULL-bound variants mixed in.
    */
  private val intervalsGen: Gen[List[(Long, Option[Long], Option[Long])]] =
    Gen.choose(1, 6).flatMap { n =>
      Gen.sequence[List[(Long, Option[Long], Option[Long])], (Long, Option[Long], Option[Long])](
        (1 to n).toList.map { iid =>
          Gen.frequency(
            5 -> (for { a <- boundaryish; b <- boundaryish }
              yield (iid.toLong, Some(a), Some(b))),
            2 -> boundaryish.map(v => (iid.toLong, Some(v), Some(v))), // zero-length
            1 -> boundaryish.map(v => (iid.toLong, Option.empty[Long], Some(v))),
            1 -> boundaryish.map(v => (iid.toLong, Some(v), Option.empty[Long])))
        })
    }

  /** Run one random case under the given column encoding and check
    * plan shape + exact row equivalence with the brute-force filter
    * computed driver-side (no Spark join involved in the expectation).
    */
  private def checkCase(
      seed: Long,
      encode: Column => Column,
      label: String): Unit = {
    import spark.implicits._
    val pts = sample(pointsGen, seed)
    val ivs = sample(intervalsGen, seed + 1000000)
    val p = pts.toDF("pid", "pm")
      .withColumn("pts", encode(col("pm"))).select("pid", "pts")
    val i = ivs.toDF("iid", "lom", "him")
      .withColumn("lo", encode(col("lom")))
      .withColumn("hi", encode(col("him")))
      .select("iid", "lo", "hi")
    val j = p.join(i, col("pts") >= col("lo") && col("pts") <= col("hi"))
    val plan = j.queryExecution.executedPlan.toString
    // an input whose NULL-droppable rows prune a side to nothing
    // collapses to an empty LocalTableScan (PropagateEmptyRelation)
    // before any join shows in the plan — semantically correct; only
    // assert the rewrite when a join survives
    if (!plan.contains("LocalTableScan <empty>")) {
      assert(plan.contains("_rj_bucket"), s"[$label seed=$seed] rule did not fire:\n${plan.take(1200)}")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"[$label seed=$seed] nested loop survived:\n${plan.take(1200)}")
    }
    val got = j.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val expected = (for {
      (pid, pmOpt) <- pts; pm <- pmOpt.toList
      (iid, loOpt, hiOpt) <- ivs; lo <- loOpt.toList; hi <- hiOpt.toList
      if pm >= lo && pm <= hi
    } yield (pid, iid)).sorted
    // sorted-seq equality also catches DUPLICATE pairs from the
    // bucket explode, which a set compare would mask
    assert(got == expected,
      s"[$label seed=$seed]\npoints=$pts\nintervals=$ivs\ngot=$got\nexpected=$expected")
  }

  private val cases = 20

  test(s"property: LONG points — rewritten join ≡ brute force over $cases random cases") {
    (1 to cases).foreach(c => checkCase(7000L + c, identity, "long"))
  }

  test(s"property: TIMESTAMP points — rewritten join ≡ brute force over $cases random cases") {
    // micros → TIMESTAMP (UTC session in TestSpark)
    (1 to cases).foreach(c => checkCase(8000L + c, expr => timestamp_micros(expr), "timestamp"))
  }

  test(s"property: TIMESTAMP_NTZ points — rewritten join ≡ brute force over $cases random cases") {
    (1 to cases).foreach(c =>
      checkCase(9000L + c, expr => timestamp_micros(expr).cast("timestamp_ntz"), "ntz"))
  }

  test("property: a pre-existing equi key disables the rewrite but keeps the rows") {
    import spark.implicits._
    (1 to 10).foreach { c =>
      val seed = 10000L + c
      val pts = sample(pointsGen, seed)
      val ivs = sample(intervalsGen, seed + 1000000)
      // key column folds both sides onto a 3-value domain → real
      // equi-join with collisions
      val p = pts.toDF("pid", "pm").withColumn("k", col("pid") % 3)
      val i = ivs.toDF("iid", "lom", "him").withColumn("k", col("iid") % 3)
      val j = p.join(
        i,
        p("k") === i("k") && col("pm") >= col("lom") && col("pm") <= col("him"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("_rj_bucket"), s"[equi seed=$seed] rewrite fired on an equi join:\n${plan.take(1200)}")
      val got = j.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (for {
        (pid, pmOpt) <- pts; pm <- pmOpt.toList
        (iid, loOpt, hiOpt) <- ivs; lo <- loOpt.toList; hi <- hiOpt.toList
        if pid % 3 == iid % 3 && pm >= lo && pm <= hi
      } yield (pid, iid)).sorted
      assert(got == expected, s"[equi seed=$seed] got=$got expected=$expected")
    }
  }
}
