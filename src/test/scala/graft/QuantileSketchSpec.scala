package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch

class QuantileSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def registered() = { QuantileSketch.register(spark); spark }

  test("merge of disjoint halves is bit-identical to the sketch of the whole") {
    val s = registered()
    val df = s.range(20000).selectExpr("CAST(id * 7 % 1000 AS DOUBLE) AS x", "id")
    df.createOrReplaceTempView("qs_whole")
    val whole = s.sql("SELECT dd_sketch_agg(x) AS sk FROM qs_whole")
      .head().getAs[Array[Byte]]("sk")
    val merged = s.sql(
      """SELECT dd_union_agg(sk) AS sk FROM (
        |  SELECT dd_sketch_agg(x) AS sk FROM qs_whole WHERE id < 10000
        |  UNION ALL
        |  SELECT dd_sketch_agg(x) AS sk FROM qs_whole WHERE id >= 10000
        |)""".stripMargin)
      .head().getAs[Array[Byte]]("sk")
    // counts merge by addition and serialization is canonical: the
    // roll-up is LOSSLESS, not merely close
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("quantiles land within the alpha relative-error bound of exact") {
    val s = registered()
    // skewed positive data: exp-ish spread over 4 decades
    val df = s.range(50000)
      .selectExpr("CAST(pow(10.0, 1.0 + (id % 4000) / 1000.0) AS DOUBLE) AS x")
    df.createOrReplaceTempView("qs_skew")
    val r = s.sql(
      """SELECT dd_quantile(dd_sketch_agg(x), 0.5) AS a50,
        |       dd_quantile(dd_sketch_agg(x), 0.99) AS a99,
        |       percentile(x, 0.5) AS e50,
        |       percentile(x, 0.99) AS e99
        |FROM qs_skew""".stripMargin).head()
    val tol = 2 * QuantileSketch.Alpha // α bound + quantile-definition slack
    assert(math.abs(r.getAs[Double]("a50") - r.getAs[Double]("e50")) / r.getAs[Double]("e50") <= tol)
    assert(math.abs(r.getAs[Double]("a99") - r.getAs[Double]("e99")) / r.getAs[Double]("e99") <= tol)
  }

  test("infinities survive the serialize round trip; out-of-range q clamps instead of throwing") {
    val s = registered()
    s.range(100)
      .selectExpr("CASE WHEN id = 0 THEN CAST('Infinity' AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS x")
      .createOrReplaceTempView("qs_inf")
    val r = s.sql(
      """SELECT dd_quantile(dd_union_agg(sk), 1.0) AS top,
        |       dd_quantile(dd_union_agg(sk), 1.5) AS over,
        |       dd_quantile(dd_union_agg(sk), -0.5) AS under
        |FROM (SELECT dd_sketch_agg(x) AS sk FROM qs_inf)""".stripMargin).head()
    // the Infinity bucket clamps to Int.MaxValue whose midpoint is
    // Infinity again — not a corrupted small bucket
    assert(r.getAs[Double]("top").isPosInfinity)
    assert(r.getAs[Double]("over").isPosInfinity) // q > 1 clamps to 1
    assert(r.getAs[Double]("under") > 0) // q < 0 clamps to 0 → min value region
    // all-negative data with q clamped high must not throw (the old
    // tail guard called pos.keys.max on an empty map)
    s.range(10).selectExpr("CAST(-1 - id AS DOUBLE) AS x").createOrReplaceTempView("qs_neg")
    val neg = s.sql("SELECT dd_quantile(dd_sketch_agg(x), 2.0) AS q FROM qs_neg").head()
    assert(neg.getAs[Double]("q") < 0)
  }

  test("negative values, zeros, and empty sketches behave") {
    val s = registered()
    s.range(1000)
      .selectExpr("CAST(id AS DOUBLE) - 500.0 AS x")
      .createOrReplaceTempView("qs_signed")
    val r = s.sql(
      """SELECT dd_quantile(dd_sketch_agg(x), 0.01) AS lo,
        |       dd_quantile(dd_sketch_agg(x), 0.5) AS mid,
        |       dd_quantile(dd_sketch_agg(x), 0.99) AS hi
        |FROM qs_signed""".stripMargin).head()
    assert(r.getAs[Double]("lo") < -450)
    assert(math.abs(r.getAs[Double]("mid")) <= 5) // median of -500..499 ≈ 0
    assert(r.getAs[Double]("hi") > 450)
    // empty input → empty sketch → NULL quantile
    val e = s.sql(
      """SELECT dd_quantile(dd_sketch_agg(x), 0.5) AS q
        |FROM qs_signed WHERE x > 1e9""".stripMargin).head()
    assert(e.isNullAt(0))
  }
}
