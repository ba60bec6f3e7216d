package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR and prints one JSON line. Each query's cache is
  * cleared first (operators persist hot intermediates; leaving them
  * cached across queries distorts memory pressure), and the reported
  * time is the best of `SPARK_GRAFT_BENCH_ITERS` runs (default 2) to
  * damp JIT/IO warm-up noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // extensions always on — see the note in Verify: plan shapes must
    // not depend on query execution order
    graft.plans.RangeJoinRewrite.install(spark)
    graft.plans.TopKPerGroup.install(spark)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val times = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must read as a failure, not a fast success
      name -> (if (failed) -1.0 else times.min)
    }
    // millisecond precision: the driver stores only the tail of stdout
    // (~2 KB) and BENCH_r04.json shows the full-precision 65-query line
    // overflowed it mid-line ("parsed": null) — 3 decimals keeps the
    // whole line inside the capture window
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
