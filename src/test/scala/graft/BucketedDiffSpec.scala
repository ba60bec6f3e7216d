package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableDiff

/** Co-located diff via bucketed tables — the 100 TB recurring-diff
  * posture (SCALE.md): when both snapshots are written bucketed by the
  * business key with the same bucket count, the diff's full-outer join
  * reads co-located buckets and needs NO shuffle exchange at all.
  */
class BucketedDiffSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("diff over same-bucketed tables plans with zero shuffle exchanges") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    TestSpark.resetTable(spark, "bdiff_before")
    TestSpark.resetTable(spark, "bdiff_after")
    try {
      o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bdiff_before")
      graft.sources.Tables.ordersAfter(spark, "/root/testdata/sf0.001")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bdiff_after")
      // keysNotNull → plain `=` join keys; null-safe `<=>` keys are
      // rewritten to coalesce/isnull by Spark and can never match a
      // bucketed layout's distribution
      val d = TableDiff.diff(
        spark.table("bdiff_before"),
        spark.table("bdiff_after"),
        Seq("o_orderkey"),
        opts = graft.operators.DiffOptions(keysNotNull = true))
      val plan = d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert("[+:]- Exchange".r.findAllIn(plan).isEmpty, plan.take(2000))
      assert("Join FullOuter".r.findAllIn(plan).size == 1)
      // and it still computes the right answer
      assert(d.filter("_row_status = 5").count() ==
        o.filter("o_orderkey % 53 = 0").count())
    } finally {
      TestSpark.resetTable(spark, "bdiff_before")
      TestSpark.resetTable(spark, "bdiff_after")
    }
  }

  test("dedupDuplicateKeys composes with bucketed layout at zero shuffle exchanges") {
    // the collapse is a groupBy on the BUCKET key, so the bucketed
    // scan already satisfies its required distribution, and the join
    // of two key-aggregated sides stays co-located too — a recurring
    // diff over bucketed snapshots WITH duplicate business keys runs
    // collapse + join entirely shuffle-free
    import org.apache.spark.sql.functions.{col, pmod}
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // plant duplicates: every 10th key appears twice
    def dup(df: org.apache.spark.sql.DataFrame) =
      df.unionByName(df.filter(pmod(col("o_orderkey"), org.apache.spark.sql.functions.lit(10)) === 0))
    TestSpark.resetTable(spark, "bdiff_dup_before")
    TestSpark.resetTable(spark, "bdiff_dup_after")
    try {
      dup(o).write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bdiff_dup_before")
      dup(graft.sources.Tables.ordersAfter(spark, "/root/testdata/sf0.001"))
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bdiff_dup_after")
      val d = TableDiff.diff(
        spark.table("bdiff_dup_before"),
        spark.table("bdiff_dup_after"),
        Seq("o_orderkey"),
        opts = graft.operators.DiffOptions(
          keysNotNull = true, dedupDuplicateKeys = true))
      val plan = d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert("[+:]- Exchange".r.findAllIn(plan).isEmpty, plan.take(2000))
      assert("Join FullOuter".r.findAllIn(plan).size == 1)
      // one row per key, the planted duplicates visible in the counts
      assert(d.count() == o.select("o_orderkey").distinct().count())
      assert(d.filter("_dup_before = 2").count() ==
        o.filter("o_orderkey % 10 = 0").count())
    } finally {
      TestSpark.resetTable(spark, "bdiff_dup_before")
      TestSpark.resetTable(spark, "bdiff_dup_after")
    }
  }
}
