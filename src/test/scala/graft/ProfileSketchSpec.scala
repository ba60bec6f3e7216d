package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.ProfileSketch

class ProfileSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def estMap(sketches: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] =
    ProfileSketch.estimates(sketches).collect().map { r =>
      r.getAs[String]("col_name") ->
        ((r.getAs[Long]("est_distinct"), r.getAs[Long]("n_nulls"), r.getAs[Long]("n_rows")))
    }.toMap

  test("merged sketches of disjoint halves equal the sketch of the whole — no rescan roll-up") {
    val df = spark.range(10000).select(
      col("id"),
      (col("id") % 97).as("mod97"),
      concat(lit("u"), col("id") % 1234).as("cat"))
    val whole = ProfileSketch.columnSketches(df)
    val merged = ProfileSketch.merge(
      ProfileSketch.columnSketches(df.filter(col("id") < 5000)),
      ProfileSketch.columnSketches(df.filter(col("id") >= 5000)))
    // HLL merge is lossless (max per bucket): estimate-after-merge is
    // EXACTLY estimate-of-whole, not merely close
    assert(estMap(merged) == estMap(whole))
  }

  test("estimates are exact at low cardinality and within tolerance at high") {
    val df = spark.range(50000).select(
      (col("id") % 7).as("low"),
      col("id").as("high"),
      when(col("id") % 10 === 0, lit(null).cast("long")).otherwise(col("id") % 3)
        .as("with_nulls"))
    val m = estMap(ProfileSketch.columnSketches(df))
    assert(m("low")._1 == 7L) // sparse-mode HLL stores small sets exactly
    assert(m("with_nulls")._1 == 3L) // id % 3 of the non-null rows still hits {0,1,2}
    assert(m("with_nulls")._2 == 5000L) // nulls counted separately, excluded from sketch
    assert(m("high")._1 > 50000 * 0.95 && m("high")._1 < 50000 * 1.05)
    assert(m.values.forall(_._3 == 50000L))
  }

  test("drift joins two runs' sketch frames without touching sources") {
    val before = spark.range(1000).select((col("id") % 50).as("k"))
    val after = spark.range(1000).select((col("id") % 80).as("k"))
    val d = ProfileSketch
      .drift(ProfileSketch.columnSketches(before), ProfileSketch.columnSketches(after))
      .collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getAs[Long]("b_est_distinct") == 50L)
    assert(r.getAs[Long]("a_est_distinct") == 80L)
    assert(r.getAs[Long]("b_n_rows") == 1000L && r.getAs[Long]("a_n_rows") == 1000L)
  }
}
