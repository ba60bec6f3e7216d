package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The wide-schema escape-hatch measurement the r12 verdict asked
  * for: `DiffOptions.statusesAsMap` exists because a per-column CASE
  * projection over thousands of columns stresses whole-stage
  * codegen's 64KB method limits and the output row width — but until
  * this probe the threshold where the map form should engage was
  * asserted, not measured.
  *
  * Fixture: a generated `(id, c0000..cWWWW)` pair at a fixed cell
  * budget comparable to lineitem sf0.1 (~10⁸ cells), staged to
  * parquet and read back so the diff starts from a real scan. The
  * after side perturbs ~1/997 of cells, drops ~1/503 of rows, and the
  * before side drops a disjoint ~1/499 — so every status code path
  * (0/1/2-3 via the row padding, 4/5) is exercised at every width.
  *
  * Measured per width (default ladder {100, 400, 1000, 2000, 4000};
  * the recorded SCALE.md table also ran the {50, 99, 120} boundary
  * probes via SPARK_GRAFT_WIDE_WIDTHS to localize the codegen
  * disengagement at spark.sql.codegen.maxFields = 100 output fields)
  * and per form (per-column CASE vs statusesAsMap): wall time of a
  * full-result count and the WholeStageCodegen span count of the
  * FINALIZED executed plan (the span-count drop is the honest
  * fallback observable — Spark disengages silently).
  *
  * Findings are recorded in SCALE.md ("Round-13 wide-schema diff").
  */
object WideSchemaBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  /** The FINAL physical tree, descending through AQE and its query
    * stages (TreeNode.collect stops at QueryStageExec leaves, and
    * explainString on an executed AQE plan does not render codegen
    * markers — both measured 0 on a plainly-codegen'd aggregate).
    */
  private def planString(qe: org.apache.spark.sql.execution.QueryExecution): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def render(p: SparkPlan): String = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => render(a.executedPlan)
        case s: QueryStageExec => render(s.plan)
        case other => other.nodeName
      }
      self + "\n" + p.children.map(render).mkString
    }
    render(qe.executedPlan)
  }

  private def countCodegenSpans(
      qe: org.apache.spark.sql.execution.QueryExecution): Int =
    "WholeStageCodegen".r.findAllIn(planString(qe)).size

  /** Deterministic wide table: key `id`, `width` INT data columns.
    * `after = true` applies the planted drift: cell perturbation on a
    * ~1/997 stripe and a disjoint row-universe (before drops
    * id % 499 == 7, after drops id % 503 == 11) so missing-row codes
    * appear on both sides.
    */
  private def wide(
      spark: SparkSession, rows: Long, width: Int, after: Boolean): DataFrame = {
    val base = spark.range(rows)
      .filter(if (after) col("id") % 503 =!= 11 else col("id") % 499 =!= 7)
    val cols = (0 until width).map { i =>
      val v = pmod(col("id") * 2654435761L + lit(i) * 40503L, lit(100000)).cast("int")
      val cell =
        if (after) when(pmod(col("id") * 31 + lit(i), lit(997)) === 0, v + 1).otherwise(v)
        else v
      cell.as(f"c$i%04d")
    }
    base.select(col("id") +: cols: _*)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = BenchFixtures.benchSession(cpus)
    val fix = BenchFixtures.cleanedTempDir("graft_wide_fix_")

    // fixed CELL budget across widths (~10⁸ cells ≈ lineitem sf0.1's
    // 600k × 16 cols scaled to the wide regime): narrower tables get
    // proportionally more rows, so each width diffs the same volume
    // and the curve isolates the per-column-PROJECTION cost
    val cellBudget = 100_000_000L
    val widths = sys.env.get("SPARK_GRAFT_WIDE_WIDTHS")
      .map(_.split(",").toSeq.filter(_.nonEmpty).map(_.trim.toInt))
      .getOrElse(Seq(100, 400, 1000, 2000, 4000))

    // capture sanity: a trivial aggregation MUST show >= 1 codegen
    // span, or the span-counting method itself is broken
    locally {
      val t = spark.range(1000000).selectExpr("sum(id) AS s")
      val qe = t.queryExecution
      qe.toRdd.count()
      val sanity = countCodegenSpans(qe)
      println(s"""{"span_capture_sanity": $sanity}""")
      println("[sanity-plan] " + planString(qe).linesIterator.take(25).mkString(" | "))
    }

    val results = widths.map { w =>
      val rows = cellBudget / w
      val bPath = s"$fix/before_$w"
      val aPath = s"$fix/after_$w"
      // staging at BOUNDED write parallelism: each parquet write task
      // holds per-COLUMN encoder buffers, so 32 concurrent 4000-col
      // writers OOM the shared local heap before the diff ever runs —
      // 8 tasks keeps staging memory flat across the width ladder
      wide(spark, rows, w, after = false)
        .repartition(8).write.mode("overwrite").parquet(bPath)
      wide(spark, rows, w, after = true)
        .repartition(8).write.mode("overwrite").parquet(aPath)
      val before = spark.read.parquet(bPath)
      val after = spark.read.parquet(aPath)

      def run(asMap: Boolean): (Double, Int, Long) = {
        val d = graft.operators.TableDiff.diff(
          before, after, Seq("id"),
          opts = graft.operators.DiffOptions(statusesAsMap = asMap))
        var n = 0L
        val sec = time(iters) { n = d.count() }
        // span capture needs care: df.count() builds a SEPARATE plan,
        // so finalize THIS QueryExecution's AQE plan (toRdd + action)
        // and read the codegen spans from the same instance — a fresh
        // or unexecuted plan prints isFinalPlan=false with no codegen
        // detail (the first run of this probe measured 0 spans
        // everywhere for exactly that reason)
        val qe = d.queryExecution
        qe.toRdd.count()
        val spans = countCodegenSpans(qe)
        (sec, spans, n)
      }
      val (colSec, colSpans, colRows) = run(asMap = false)
      val (mapSec, mapSpans, mapRows) = run(asMap = true)
      require(colRows == mapRows, s"forms disagree at width $w: $colRows vs $mapRows")
      println(
        f"""{"width": $w, "rows": $rows, "out_rows": $colRows, """ +
          f""""percol_sec": $colSec%.3f, "map_sec": $mapSec%.3f, """ +
          f""""percol_codegen_spans": $colSpans, "map_codegen_spans": $mapSpans}""")
      (w, colSec, mapSec, colSpans, mapSpans)
    }
    val summary = results
      .map { case (w, c, m, cs, ms) => f"$w:percol=$c%.2fs/map=$m%.2fs(spans $cs/$ms)" }
      .mkString(" ")
    println(s"""{"metric":"wide_schema_diff","summary":"$summary"}""")
    spark.stop()
  }
}
