package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growing-STATE probe A/B for substring-span detection: the same
  * fixed batch probed against a corpus shingle state at 1×/4×/16×/64×
  * amplification, once through a plain parquet shingle table and once
  * through the (h1, h2)-BUCKETED catalog layout
  * ([[graft.operators.Dedup.writeShingleTable]]).
  *
  * The claim under measurement is the layout's whole point: the plain
  * probe re-shuffles the CORPUS shingles on every ingest (its join
  * hash-partitions both sides, and the state is the big one), so its
  * cost grows with accumulated state; the bucketed probe scans the
  * state pre-partitioned in place and shuffles only the batch's
  * shingles, so its cost tracks the batch. Steady-state ingest pays
  * the probe ONCE PER BATCH forever — the state-side shuffle is the
  * term that eats a 100 TB deployment.
  *
  * Fixture honesty: the state is the mutated amplification (pair
  * markers — replicas of different pairs share no shingles, so
  * candidate volume cannot go quadratic by data design), the batch is
  * a fixed ~1% slice of the ORIGINAL docs (mutation makes every state
  * window marker-bearing, so matches are few and the measured cost is
  * the probe machinery, not result fan-out — the production shape,
  * where most of a new batch is novel text). State build/write time is
  * NOT in the timed section: building state is a once-per-corpus cost,
  * probing is per-ingest.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_ITERS. Emits one JSON line.
  */
object ShingleStateBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = BenchFixtures.benchSession(cpus)
    import graft.operators.Dedup

    val fix = BenchFixtures.cleanedTempDir("graft_shingle_state_fix_")
    // fixed probe batch: ~1% of the ORIGINAL corpus, shingled once
    val batchSh = Dedup
      .shingleTable(graft.sources.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 101 === 0))
      .localCheckpoint(true)
    Dedup.unpersistAll()

    val rows = Seq(1, 4, 16, 64).map { mult =>
      val docs = BenchFixtures.mutatedAmplifiedDocs(spark, sfDir, mult, cpus.toInt, fix)
      // plain layout: the shingle table as ordinary parquet
      Dedup.shingleTable(docs).write.mode("overwrite").parquet(s"$fix/plain_$mult")
      Dedup.unpersistAll()
      val plain = spark.read.parquet(s"$fix/plain_$mult")
      val nState = plain.count()
      // bucketed catalog layout
      val tbl = s"shingle_state_bench_$mult"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      Dedup.writeShingleTable(docs, tbl)
      Dedup.unpersistAll()
      val plainSec = time(iters) {
        Dedup.repeatedSpansAgainstShingles(batchSh, plain).count()
      }
      val bucketedSec = time(iters) {
        Dedup.repeatedSpansAgainstShingles(batchSh, spark.table(tbl)).count()
      }
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.TmpfsScratch.deleteRecursively(
        java.nio.file.Paths.get(s"$fix/plain_$mult"))
      graft.TmpfsScratch.deleteRecursively(
        java.nio.file.Paths.get(s"$fix/docs_$mult"))
      s""""x$mult":{"state_rows":$nState,"plain_probe_sec":${f"$plainSec%.3f"},""" +
        s""""bucketed_probe_sec":${f"$bucketedSec%.3f"}}"""
    }
    println(s"""{"metric":"shingle_state_probe_ab","iters":$iters,"sf":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }
}
