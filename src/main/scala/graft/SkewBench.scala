package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DiffOptions, SkewUtils, TableDiff}
import graft.sources.Tables

/** Skew-fixture benchmark (VERDICT r7 task 7): the salted aggregation
  * and the NULL-key diff side channel are oracled for correctness on
  * uniform TPC-H-ish data; this main measures them on data that is
  * actually skewed, so BASELINE.md can carry evidence instead of a
  * design argument.
  *
  * Fixtures (derived from the driver's sf0.1 parquet, amplified so
  * task-level effects rise above scheduling noise, written once to a
  * scratch dir):
  *
  *   - zipfian events: 2M rows (events ×20), the hot user holds ~50%
  *     of all rows and the rest keep the uniform user_id spread —
  *     the "billions of rows under one default key" shape.
  *   - null-key orders: 2.4M unique-key rows per side, HALF the
  *     before side's keys nulled, none on the after side — the
  *     one-sided sentinel-key shape (a feed whose ETL nulls a key
  *     column while the reference copy stays keyed), which maximizes
  *     the hot-partition effect at zero m×n pair volume.
  *
  * Timings are min over `iters` runs of a `count()` action per
  * variant, matching Bench's protocol.
  */
object SkewBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = BenchFixtures.benchSession(cpus, skewJoin = true)

    val fix = BenchFixtures.cleanedTempDir("graft_skew_fix_")

    // ---- fixture 1: zipfian user_id over amplified events ----
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    ev.crossJoin(spark.range(20).toDF("r"))
      .withColumn(
        "user_id",
        when(pmod(col("event_id") * 20 + col("r"), lit(2)) === 0, lit(0L))
          .otherwise(col("user_id")))
      .select("user_id", "value")
      .write.mode("overwrite").parquet(s"$fix/zipf_events")
    val zipf = spark.read.parquet(s"$fix/zipf_events")
    val nZipf = zipf.count()
    val hotShare = zipf.filter(col("user_id") === 0L).count().toDouble / nZipf

    val plainAgg = time(iters) {
      zipf.groupBy("user_id")
        .agg(
          sum(col("value").cast("decimal(18,4)")).as("sum_value"),
          count(lit(1)).as("n_rows"))
        .count()
    }
    val saltedAgg = time(iters) {
      SkewUtils
        .saltedSumCount(zipf, Seq("user_id"), col("value").cast("decimal(18,4)"),
          salts = cpus.toInt)
        .count()
    }

    // ---- fixture 2: one-sided NULL-key orders diff ----
    // unique surrogate keys (o_orderkey*8 + r) so the join fan-out is
    // 1:1 away from the NULL channel; the before side nulls HALF its
    // keys, the after side none — the common real shape (one feed's
    // ETL nulls a key column for a batch while the reference copy
    // stays keyed). m×n on the NULL channel is zero; what's measured
    // is purely the shuffle layout: the plain full-outer plan drags
    // 600k NULL rows into one reducer (AQE's skew splitter does not
    // support full-outer joins), the side channel keeps them out of
    // the join shuffle entirely.
    val orders = Tables.orders(spark, sfDir)
      .crossJoin(spark.range(16).toDF("r"))
      .withColumn("k", col("o_orderkey") * 16 + col("r"))
      .select(col("k"), col("o_custkey"), col("o_totalprice"))
    orders
      .withColumn("k", when(pmod(col("k"), lit(2)) === 0, lit(null)).otherwise(col("k")))
      .write.mode("overwrite").parquet(s"$fix/null_before")
    orders
      .withColumn(
        "o_totalprice",
        when(pmod(col("k"), lit(7)) === 0, col("o_totalprice") + 1).otherwise(col("o_totalprice")))
      .write.mode("overwrite").parquet(s"$fix/null_after")
    val before = spark.read.parquet(s"$fix/null_before")
    val after = spark.read.parquet(s"$fix/null_after")
    val nullFrac = before.filter(col("k").isNull).count().toDouble / before.count()

    val plainDiff = time(iters) {
      TableDiff.diff(before, after, Seq("k")).count()
    }
    val sideChannelDiff = time(iters) {
      TableDiff.diff(before, after, Seq("k"),
        opts = DiffOptions(nullKeySideChannel = true)).count()
    }

    // ---- fixture 3: hot DUPLICATE business key (b×a fan-out) ----
    // the reference's diff semantics join on the business key, so a
    // key with b before-rows and a after-rows contributes b×a joined
    // rows. One planted key carries ~2% of all rows on EACH side
    // (sf0.1: ~3k×3k ≈ 9M pairs from a single key — the join output
    // is dominated by one reducer's key). A/B three answers: the
    // plain plan with AQE's skew splitter OFF (what a naive config
    // gets), ON (what this engine ships), and the SCALE.md
    // mitigation (diff on a pre-deduped side — one row per key).
    // ×4 amplification puts ~12k rows per side under the hot key →
    // 144M joined rows from ONE key, 99% of the join's output volume
    // — small enough to run in a bench, large enough that one
    // reducer's fan-out dominates the wall clock.
    val dupBase = Tables.orders(spark, sfDir)
      .crossJoin(spark.range(4).toDF("r"))
      .withColumn(
        "k",
        when(pmod(col("o_orderkey"), lit(50)) === 0, lit(-1L))
          .otherwise(col("o_orderkey") * 4 + col("r")))
      .select(col("k"), col("o_custkey"), col("o_totalprice"))
      .repartition(cpus.toInt)
    dupBase.write.mode("overwrite").parquet(s"$fix/dup_before")
    dupBase
      .withColumn(
        "o_totalprice",
        when(pmod(col("o_custkey"), lit(7)) === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
      .write.mode("overwrite").parquet(s"$fix/dup_after")
    val dupBefore = spark.read.parquet(s"$fix/dup_before")
    val dupAfter = spark.read.parquet(s"$fix/dup_after")
    val nDup = dupBefore.count()
    val hotDupShare = dupBefore.filter(col("k") === -1L).count().toDouble / nDup

    val skewKey = "spark.sql.adaptive.skewJoin.enabled"
    // restore the value captured BEFORE the override, not a literal —
    // a session that had skew-join disabled must leave this A/B with
    // its own config intact (the autoBroadcastJoinThreshold pattern)
    val skewPrev = spark.conf.get(skewKey)
    val dupNoSkewJoin = try {
      spark.conf.set(skewKey, "false")
      time(iters) { TableDiff.diff(dupBefore, dupAfter, Seq("k")).count() }
    } finally spark.conf.set(skewKey, skewPrev)
    val dupSkewJoin = time(iters) {
      TableDiff.diff(dupBefore, dupAfter, Seq("k")).count()
    }
    // the fast-path diff is ONE full-outer join, which AQE's skew
    // splitter does not support (the on/off pair above measures plan
    // noise, not a mitigation) — the literal plan's two LEFT joins
    // are split-eligible, so it completes the mitigation A/B
    val dupLiteral = time(iters) {
      TableDiff.diff(dupBefore, dupAfter, Seq("k"),
        opts = DiffOptions(literalPlan = true)).count()
    }
    val dupPreDedup = time(iters) {
      TableDiff.diff(
        dupBefore.dropDuplicates("k"), dupAfter.dropDuplicates("k"), Seq("k")).count()
    }
    // the mitigation as shipped API (round 11): dedupDuplicateKeys
    // collapses per-side INSIDE the diff (MIN representative +
    // multiplicity columns) — same join shape as the manual
    // dropDuplicates row, plus the multiplicity accounting
    val dupCollapseMode = time(iters) {
      TableDiff.diff(dupBefore, dupAfter, Seq("k"),
        opts = DiffOptions(dedupDuplicateKeys = true)).count()
    }

    println(
      s"""{"metric":"skew_bench","iters":$iters,"sf":"$sfDir",
         |"zipf_rows":$nZipf,"hot_key_share":${f"$hotShare%.3f"},
         |"agg_plain_sec":${f"$plainAgg%.3f"},"agg_salted_sec":${f"$saltedAgg%.3f"},
         |"diff_rows":${before.count()},"null_key_frac":${f"$nullFrac%.3f"},
         |"diff_plain_sec":${f"$plainDiff%.3f"},"diff_side_channel_sec":${f"$sideChannelDiff%.3f"},
         |"dup_rows":$nDup,"hot_dup_share":${f"$hotDupShare%.3f"},
         |"dup_diff_no_skewjoin_sec":${f"$dupNoSkewJoin%.3f"},
         |"dup_diff_skewjoin_sec":${f"$dupSkewJoin%.3f"},
         |"dup_diff_literal_skewjoin_sec":${f"$dupLiteral%.3f"},
         |"dup_diff_prededup_sec":${f"$dupPreDedup%.3f"},
         |"dup_diff_collapse_mode_sec":${f"$dupCollapseMode%.3f"}}"""
        .stripMargin.replaceAll("\n", ""))
    spark.stop()
  }
}
