package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DiffOptions, SessionInfo, TableDiff}

/** V7 (DDL lifecycle), V9 (session context), and the wide-schema
  * map-output mode.
  */
class CompanionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("V7: CREATE TABLE / INSERT VALUES / SELECT / DROP lifecycle") {
    TestSpark.resetTable(spark, "ddl_probe")
    val loc = java.nio.file.Files.createTempDirectory("ddl").toString
    spark.sql(s"""CREATE TABLE ddl_probe (id BIGINT, name STRING, bal DOUBLE)
                 |USING parquet LOCATION '$loc'""".stripMargin)
    try {
      spark.sql("INSERT INTO ddl_probe VALUES (1, 'a', 10.5), (2, 'b', 20.0)")
      assert(spark.sql("SELECT COUNT(*) FROM ddl_probe").collect().head.getLong(0) == 2L)
      assert(spark.catalog.tableExists("ddl_probe"))
      // V8: schema introspection — DESCRIBE matches df.schema
      val desc = spark.sql("DESCRIBE TABLE ddl_probe").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc("id") == "bigint" && desc("bal") == "double")
    } finally TestSpark.resetTable(spark, "ddl_probe")
    assert(!spark.catalog.tableExists("ddl_probe"))
  }

  test("V9: session-context probe returns one row of live context") {
    val r = SessionInfo.whoami(spark).collect().head
    assert(r.getAs[String]("catalog") == "spark_catalog")
    assert(r.getAs[String]("database") == "default")
    assert(r.getAs[java.sql.Timestamp]("ts") != null)
    assert(r.getAs[String]("engine_version").nonEmpty)
  }

  test("a data column named K_* is still counted by summary/differingRows") {
    import spark.implicits._
    // name collides with the key-echo prefix — metadata markers, not
    // name heuristics, must identify status columns
    val before = Seq((1, 10.0)).toDF("id", "K_FACTOR")
    val after = Seq((1, 99.0)).toDF("id", "K_FACTOR")
    val d = TableDiff.diff(before, after, Seq("id"))
    assert(TableDiff.statusColumns(d).contains("K_FACTOR"))
    assert(graft.operators.DiffSummary.differingRows(d).count() == 1)
    val s = graft.operators.DiffSummary.summary(d).collect().head
    assert(s.getAs[Long]("rows_with_cell_diffs") == 1L)
  }

  test("summary/differingRows work on statusesAsMap output") {
    import spark.implicits._
    val before = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val after = Seq((1, "a"), (2, "x")).toDF("k", "v")
    val d = TableDiff.diff(before, after, Seq("k"),
      opts = DiffOptions(statusesAsMap = true))
    assert(graft.operators.DiffSummary.differingRows(d).count() == 1)
    val s = graft.operators.DiffSummary.summary(d).collect().head
    assert(s.getAs[Long]("total_rows") == 2L)
    assert(s.getAs[Long]("rows_with_cell_diffs") == 1L)
  }

  test("statusesAsMap emits one MAP column with identical codes") {
    import spark.implicits._
    val before = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "s", "v")
    val after = Seq((1, "a", 11), (3, "c", 30)).toDF("k", "s", "v")
    val wide = TableDiff.diff(before, after, Seq("k"))
    val mapd = TableDiff.diff(before, after, Seq("k"),
      opts = DiffOptions(statusesAsMap = true))
    assert(mapd.columns.toSeq == Seq("_row_status", "K_k", "statuses"))
    val m = mapd.collect()
      .map(r => r.getAs[Any]("K_k") -> r.getAs[Map[String, Int]]("statuses")).toMap
    val w = wide.collect().map(r => r.getAs[Any]("K_k") -> r).toMap
    for ((k, row) <- w; c <- TableDiff.statusColumns(wide))
      assert(m(k)(c) == row.getAs[Int](c), s"key $k col $c")
  }
}
