package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerGroup, TopKPerGroupExec}

class TopKPerGroupSpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; TopKPerGroup.install(s); s }

  private def ranked(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def data(n: Int, groups: Int, seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, (rnd.nextInt(groups) + 1).toLong, rnd.nextInt(1000)))
      .toDF("id", "g", "v")
  }

  test("the rule + strategy replace WindowExec with partial+final heap execs") {
    // string-match the plan: under AQE the adaptive root is a leaf
    // for collect(), but the rendered tree shows the real nodes
    val p = ranked(data(5000, 7, seed = 1), 3).queryExecution.executedPlan.toString
    val topks = "TopKPerGroup \\[".r.findAllIn(p).size
    assert(topks == 2, p.take(2000))
    assert(p.contains("int, true") && p.contains("int, false"), p.take(2000)) // partial + final
    assert(!p.contains("Window"), p.take(2000)) // stock WindowGroupLimit/WindowExec gone
    assert(!p.contains("Sort"), p.take(2000)) // no full per-group sort anywhere
  }

  test("heap result equals the row_number definition exactly, ranks included") {
    val df = data(5000, 7, seed = 2)
    val got = ranked(df, 3).collect()
      .map(r => (r.getLong(1), r.getInt(3), r.getLong(0), r.getInt(2))).sorted
    // reference computed on the driver from first principles
    val expected = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._2)
      .toSeq
      .flatMap { case (g, rows) =>
        rows.sortBy(t => (-t._3, t._1)).take(3).zipWithIndex
          .map { case ((id, _, v), i) => (g, i + 1, id, v) }
      }
      .sorted
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty)
  }

  test("groups smaller than k emit all their rows with dense leading ranks") {
    import spark.implicits._
    val tiny = Seq((1L, 1L, 10), (2L, 1L, 20), (3L, 2L, 5)).toDF("id", "g", "v")
    val got = ranked(tiny, 5).collect()
      .map(r => (r.getLong(1), r.getInt(3), r.getLong(0))).sorted.toSeq
    assert(got == Seq((1L, 1, 2L), (1L, 2, 1L), (2L, 1, 3L)))
  }

  test("empty input yields an empty result through the heap plan") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Int)].toDF("id", "g", "v")
    assert(ranked(empty, 3).count() == 0)
  }

  test("a keep-everything bound (k = Int.MaxValue) neither overflows nor drops rows") {
    val df = data(200, 4, seed = 9)
    val got = ranked(df, Int.MaxValue).count()
    assert(got == 200)
  }

  test("patterns the operator cannot honor stay on the stock plan") {
    val df = data(1000, 5, seed = 3)
    // rank() instead of row_number(): different tie semantics — no rewrite
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val r = df.withColumn("rank", rank().over(w)).filter(col("rank") <= 3)
    assert(r.queryExecution.executedPlan.collect { case t: TopKPerGroupExec => t }.isEmpty)
    assert(r.queryExecution.executedPlan.toString.contains("Window"))
    // row_number with no upper bound keeps the window too
    val all = df.withColumn("rank", row_number().over(
      Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
    assert(all.queryExecution.executedPlan.collect { case t: TopKPerGroupExec => t }.isEmpty)
  }
}
