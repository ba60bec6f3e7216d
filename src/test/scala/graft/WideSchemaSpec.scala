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

  /** id + (n-1) value columns; `flip` perturbs a deterministic
    * subset of cells so the diff has all of MATCH/DIFFERENT/NULL
    * statuses.
    */
  private def wide(flip: Boolean, n: Int = nCols, rows: Int = 20): DataFrame = {
    val base = spark.range(rows).toDF("id")
    val cols = col("id") +: (1 until n).map { i =>
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

  // ---- the ~10k-column codegen cliff (SURVEY §7 "wide schemas") ----
  // Past ~10k columns the hazards change class: the map-form
  // projection is ONE expression with >20k children (codegen can blow
  // janino's 64KB method limit and must fall back, not fail), and the
  // per-column form's row is 100× past maxFields. The engine's
  // contract at this width: map form still runs end-to-end with a
  // narrow codegen'd downstream, and the per-column form stays usable
  // through chunked column selects — each chunk a narrow, codegen'd
  // projection — without ever materializing the full-width row
  // downstream.

  private val nColsXL = 10000

  test("10,000-column diff: map form executes end-to-end, downstream still codegen'd") {
    val d = TableDiff.diff(
      wide(flip = false, nColsXL, rows = 5),
      wide(flip = true, nColsXL, rows = 5),
      Seq("id"),
      opts = DiffOptions(statusesAsMap = true))
    assert(d.columns.toSeq == Seq(TableDiff.RowStatus, "K_id", "statuses"))
    // 3-field output row: downstream operators are under maxFields
    // regardless of the 10k-wide map expression feeding them
    val root = rootWithoutAqe(d.orderBy("K_id"))
    assert(root == classOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    // end-to-end execution — if the giant map_from_arrays expression
    // breaks codegen, Spark must fall back, never fail the query
    val rows = d.orderBy("K_id").collect()
    assert(rows.length == 5)
    val statuses = rows.head.getAs[Map[String, Int]]("statuses")
    assert(statuses.size == nColsXL)
    assert(statuses("c7") == TableDiff.Different)
    assert(statuses("c11") == TableDiff.NullInAfterOnly)
    assert(statuses("c1") == TableDiff.Match)
  }

  test("10,000-column diff: per-column form consumed in chunked selects, each chunk codegen'd") {
    val d = TableDiff.diff(
      wide(flip = false, nColsXL, rows = 5),
      wide(flip = true, nColsXL, rows = 5),
      Seq("id"))
    assert(d.columns.length == 2 + nColsXL)
    val statusCols = TableDiff.statusColumns(d)
    assert(statusCols.length == nColsXL)
    // the fallback pattern for consumers that need the matrix form:
    // never select the full width — walk it in sub-maxFields chunks
    val chunks = statusCols.grouped(90).toSeq
    val first = d.select((col("K_id") +: chunks.head.map(col)): _*)
    val root = rootWithoutAqe(first.orderBy("K_id"))
    assert(root == classOf[org.apache.spark.sql.execution.WholeStageCodegenExec],
      s"a 91-column chunk slice must come back under whole-stage codegen, got $root")
    // chunk values agree with the full-width row for a sampled chunk
    val sampled = first.orderBy("K_id").collect()
    assert(sampled.length == 5)
    assert(sampled.head.getAs[Int]("c7") == TableDiff.Different)
    assert(sampled.head.getAs[Int]("c11") == TableDiff.NullInAfterOnly)
    // column pruning holds: the chunk slice must not carry the other
    // ~9,900 status expressions through its projection
    val plan = first.queryExecution.optimizedPlan.toString
    assert(!plan.contains("c9999"), "unselected status columns must be pruned from the chunk plan")
  }
}
