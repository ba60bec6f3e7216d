package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR and prints one JSON line. Each query's cache is
  * cleared first (operators persist hot intermediates; leaving them
  * cached across queries distorts memory pressure), and the reported
  * time is the best of `SPARK_GRAFT_BENCH_ITERS` runs (default 2) to
  * damp JIT/IO warm-up noise.
  *
  * Isolation knobs (for contention-resistant re-measures; both leave
  * the default driver output byte-compatible when unset):
  *   - SPARK_GRAFT_BENCH_ONLY: comma-separated query names — run only
  *     these (one query per JVM gives the cleanest number).
  *   - SPARK_GRAFT_BENCH_SPREAD=1: also emit per-query `"spread"`
  *     (max-min over the iterations) so dispersion is recorded
  *     alongside the min.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // fail fast on unknown names: a typo would otherwise select nothing
    // and print a 0.000-total line that reads as a (suspiciously fast)
    // successful isolated re-measure instead of an error
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(
        unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names no known query: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val emitSpread = sys.env.get("SPARK_GRAFT_BENCH_SPREAD").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
    // experiment knob: extra session confs as "k=v;k=v" (e.g. a state
    // -store provider A/B) — unset leaves the driver's default
    // configuration byte-identical
    sys.env.get("SPARK_GRAFT_SPARK_CONF").foreach {
      _.split(';').map(_.trim).filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // extensions always on — see the note in Verify: plan shapes must
    // not depend on query execution order
    graft.plans.RangeJoinRewrite.install(spark)
    graft.plans.TopKPerGroup.install(spark)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      var failed = false
      val times = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        graft.operators.Dedup.unpersistAll() // drain the tracked-cache queue too
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must read as a failure, not a fast success
      (name, if (failed) -1.0 else times.min, if (failed) -1.0 else times.max - times.min)
    }
    // millisecond precision: the driver stores only the tail of stdout
    // (~2 KB) and BENCH_r04.json shows the full-precision 65-query line
    // overflowed it mid-line ("parsed": null) — 3 decimals keeps the
    // whole line inside the capture window
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val spread =
      if (!emitSpread) ""
      else results.map { case (k, _, s) => "\"" + k + "\":" + fmt(s) }
        .mkString(""","spread":{""", ",", "}") + s""","iters":$iters"""
    // the total is ALSO repeated as the line's last key: the driver
    // keeps only the tail of stdout, and at 100 queries the line's
    // head (where "value" lives) no longer fits the capture window
    // (BENCH_r07.json: "parsed": null, total lost) — the tail always
    // survives, so the total must live there too
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$spread,"sf":"$sfDir","n_queries":${results.size},"total_sec":${fmt(total)}}"""
    println(line)
    // the driver's stdout capture is a ~2 KB tail that truncates the
    // per-query map at 100+ queries (BENCH_r08.json kept 75/114 rows)
    // — also land the full line in a file it can collect
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json")),
      (line + "\n").getBytes("UTF-8"))
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write BENCH_out.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
