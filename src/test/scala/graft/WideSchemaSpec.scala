package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DiffOptions, TableDiff}

/** The wide-schema story behind DiffOptions.statusesAsMap: a diff of a
  * ~2,000-column table emits ~2,000 status columns in the per-column
  * form, which is far past `spark.sql.codegen.maxFields` (default
  * 100) — Spark silently drops the projection out of whole-stage
  * codegen and every row pays interpreted-eval cost. The map form
  * carries identical information in ONE column and keeps the plan
  * codegen'd. This spec pins both halves of that claim, plus the
  * information-equivalence of the two shapes.
  */
class WideSchemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val nCols = 2000

  /** id + (nCols-1) value columns; `flip` perturbs a deterministic
    * subset of cells so the diff has all of MATCH/DIFFERENT/NULL
    * statuses.
    */
  private def wide(flip: Boolean): DataFrame = {
    val base = spark.range(20).toDF("id")
    val cols = col("id") +: (1 until nCols).map { i =>
      val v = col("id") * 31 + lit(i)
      val c =
        if (!flip) v
        else if (i % 7 == 0) v + 1 // DIFFERENT on these columns
        else if (i % 11 == 0) lit(null).cast("long") // NULL_IN_AFTER_ONLY
        else v
      c.as(s"c$i")
    }
    base.select(cols: _*)
  }

  /** Root node of the non-adaptive executed plan. AQE defers codegen
    * insertion to stage materialization, so the static plan is the
    * reliable place to read codegen decisions from.
    */
  private def rootWithoutAqe(mk: => DataFrame): Class[_] = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try mk.queryExecution.executedPlan.getClass
    finally spark.conf.set(key, prev)
  }

  test("per-column statuses on a 2,000-column diff leave the final sort un-codegen'd") {
    val d = TableDiff.diff(wide(flip = false), wide(flip = true), Seq("id"))
    assert(d.columns.length == 2 + nCols) // _row_status, K_id, per-col statuses
    // the 2,002-field row exceeds spark.sql.codegen.maxFields (100):
    // the output sort — stand-in for any downstream operator — runs
    // bare, outside whole-stage codegen, on interpreted row handling
    val root = rootWithoutAqe(d.orderBy("K_id"))
    assert(root == classOf[org.apache.spark.sql.execution.SortExec],
      s"expected a bare SortExec on the wide row, got $root; " +
        "if codegen starts accepting >maxFields rows, the rationale for statusesAsMap is gone")
  }

  test("map-form statuses hand downstream operators a narrow, codegen'd row") {
    val d = TableDiff.diff(
      wide(flip = false), wide(flip = true), Seq("id"),
      opts = DiffOptions(statusesAsMap = true))
    assert(d.columns.toSeq == Seq(TableDiff.RowStatus, "K_id", "statuses"))
    // identical information, 3-column row: the same downstream sort is
    // back under maxFields and lands inside WholeStageCodegen (the
    // wide join stage itself cannot — its input is unavoidably
    // 2×2,000 aligned columns; narrowing DOWNSTREAM is the win)
    val root = rootWithoutAqe(d.orderBy("K_id"))
    assert(root == classOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
  }

  test("map form carries exactly the per-column statuses") {
    val perCol = TableDiff.diff(wide(flip = false), wide(flip = true), Seq("id"))
    val asMap = TableDiff.diff(
      wide(flip = false), wide(flip = true), Seq("id"),
      opts = DiffOptions(statusesAsMap = true))
    val statusCols = TableDiff.statusColumns(perCol)
    val wideRows = perCol.orderBy("K_id").collect()
    val mapRows = asMap.orderBy("K_id").collect()
    assert(wideRows.length == mapRows.length)
    wideRows.zip(mapRows).foreach { case (w, m) =>
      val mm = m.getAs[Map[String, Int]]("statuses")
      assert(mm.keySet == statusCols.toSet)
      statusCols.foreach { c =>
        assert(mm(c) == w.getAs[Int](c), s"column $c disagrees at K_id=${w.getAs[Long]("K_id")}")
      }
    }
    // and the perturbation actually produced non-MATCH cells
    val any = mapRows.map(_.getAs[Map[String, Int]]("statuses")).flatMap(_.values)
    assert(any.contains(TableDiff.Different) && any.contains(TableDiff.NullInAfterOnly))
  }
}
