package graft

import org.apache.spark.sql.functions._

/** Scale curve for the keep-first FIRST-OCCURRENCE aggregate — the
  * r19/r20 `min_pair_long` HashAggregate form vs the `min(struct)`
  * SortAggregate fallback it replaced (see
  * [[graft.functions.MinPairLong]] for the mechanism: Min over a
  * struct carries an immutable buffer, which HashAggregateExec
  * refuses, so every task SORTS its full input by the 128-bit
  * fingerprint at both aggregation levels).
  *
  * The bench fabricates the kernels' exact shuffle shape — exploded
  * line rows `(pk1, pk2, doc_id, pos)` keyed by a synthetic 128-bit
  * fingerprint pair with a configurable duplication factor — and
  * times the two aggregation forms over the SAME input through the
  * noop sink (guide §1.4), printing the executed plan's aggregate
  * node so the claimed HashAggregate/SortAggregate split is checked
  * in-run, not assumed. Rows scale ×4 per step; near-flat
  * sec-per-row with a widening hash-vs-sort gap is the 100 TB
  * evidence the SCALE.md row records.
  *
  * Usage: sbt "runMain graft.FpAggScaleBench"
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ITERS
  * (default 3), SPARK_GRAFT_FPAGG_ROWS (comma list, default
  * "2000000,8000000,32000000").
  */
object FpAggScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val rowCounts = sys.env.getOrElse(
      "SPARK_GRAFT_FPAGG_ROWS", "2000000,8000000,32000000")
      .split(',').map(_.trim.toLong).toSeq
    val spark = BenchFixtures.benchSession(cpus)
    graft.functions.MinPair.register(spark)

    val fix = BenchFixtures.cleanedTempDir("graft_fpagg_fix_")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // aggregate node of the executed plan (AQE-final), so the claimed
    // operator split is verified by the run itself
    def aggNode(df: org.apache.spark.sql.DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      if (p.contains("SortAggregate")) "SortAggregate"
      else if (p.contains("ObjectHashAggregate")) "ObjectHashAggregate"
      else if (p.contains("HashAggregate")) "HashAggregate"
      else "?"
    }

    val results = rowCounts.map { n =>
      // the kernels' line-table shape: ~4 occurrences per key (the
      // duplicate mass paragraph/chunk dedup exists to find), salted
      // 128-bit fingerprints, (doc_id, pos) payload — staged to
      // parquet and read back so both forms start from a real scan
      val path = s"$fix/lines_$n"
      spark.range(n)
        .select(
          xxhash64(col("id") % (n / 4)).as("pk1"),
          xxhash64(lit("fp2"), col("id") % (n / 4)).as("pk2"),
          (col("id") * 2654435761L % 1000000007L).as("doc_id"),
          (col("id") % 997L).as("pos"))
        // pin the staged layout to `cpus` files so every size reads at
        // the same split count and the curve varies rows-per-task, not
        // scan parallelism (the 1 GB point otherwise packs into ~8
        // maxPartitionBytes splits and measures partial-parallel scan)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(path)
      val lines = spark.read.parquet(path)

      val pairAgg = lines.groupBy("pk1", "pk2")
        .agg(expr("min_pair_long(doc_id, pos)").as("_first"))
      val structAgg = lines.groupBy("pk1", "pk2")
        .agg(min(struct(col("doc_id"), col("pos"))).as("_first"))

      spark.sparkContext.setJobDescription(s"fpagg min_pair_long n=$n")
      val pairSec = BenchFixtures.minTime(iters)(noop(pairAgg))
      spark.sparkContext.setJobDescription(s"fpagg min(struct) n=$n")
      val structSec = BenchFixtures.minTime(iters)(noop(structAgg))
      spark.sparkContext.setJobDescription(null)
      val row = (n, pairSec, aggNode(pairAgg), structSec, aggNode(structAgg))
      println(f"[fpagg] n=$n%10d  min_pair_long=$pairSec%7.2f s (${row._3})  " +
        f"min_struct=$structSec%7.2f s (${row._5})  ratio=${structSec / pairSec}%5.2f")
      row
    }
    val json = results.map { case (n, ps, pn, ss, sn) =>
      s"""{"rows":$n,"min_pair_long_sec":${f"$ps%.3f"},"min_pair_node":"$pn",""" +
        s""""min_struct_sec":${f"$ss%.3f"},"min_struct_node":"$sn"}"""
    }.mkString("[", ",", "]")
    println(s"""{"bench":"fpagg_scale","cpus":$cpus,"iters":$iters,"results":$json}""")
    spark.stop()
  }
}
