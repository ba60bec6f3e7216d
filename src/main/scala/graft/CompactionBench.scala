package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B evidence for the state-table compaction story (SCALE.md):
  * ingest-probe cost against (a) the plain signature table (corpus
  * bands re-shuffled every probe), (b) the bucketed band table right
  * after N appends (pre-shuffled but fragmented — N files per
  * bucket), and (c) the same table compacted back to one file per
  * bucket. The corpus is sf docs amplified `mult`×; each "append" is
  * a re-append of an amplified slice's band rows, mimicking N ingest
  * cycles.
  */
object CompactionBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_COMPACT_MULT", "16").toInt
    val appends = sys.env.getOrElse("SPARK_GRAFT_COMPACT_APPENDS", "8").toInt
    val spark = BenchFixtures.benchSession(cpus)

    val fix = BenchFixtures.cleanedTempDir("graft_compact_fix_")

    // amplified corpus with unique ids and pair-distinct texts (the
    // DedupScaleBench mutation, single replica class — no planted
    // pairs needed; this measures PROBE cost, not recall)
    graft.sources.Tables.documents(spark, sfDir)
      .crossJoin(spark.range(mult).toDF("r"))
      .select(
        (col("doc_id") * mult + col("r")).as("doc_id"),
        expr("array_join(transform(split(text, ' '), (t, i) -> " +
          "IF(i % 3 = 0, concat('m', CAST(r AS STRING)), t)), ' ')").as("text"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$fix/corpus")
    val corpus = spark.read.parquet(s"$fix/corpus")
    val nDocs = corpus.count()

    // persist both signature tables as parquet (the steady-state form)
    Dedup.signatureTable(corpus).write.mode("overwrite").parquet(s"$fix/sigs")
    Dedup.unpersistAll()
    val corpusSigs = spark.read.parquet(s"$fix/sigs")
    val newBatch = corpus.filter(col("doc_id") % 101 === 0)
      .withColumn("doc_id", col("doc_id") + 100000000L)
      .withColumn("text", concat(col("text"), lit(" probe tail")))
    Dedup.signatureTable(newBatch).write.mode("overwrite").parquet(s"$fix/newsigs")
    Dedup.unpersistAll()
    val newSigs = spark.read.parquet(s"$fix/newsigs")

    def consume(df: DataFrame): Long = df.count()

    // (a) plain probe: corpus bands explode + shuffle every ingest
    val plainSec = time(iters) {
      consume(Dedup.minhashPairsAgainstSignatures(newSigs, corpusSigs))
    }

    // (b) bucketed band table grown by N appends (each append is a
    // 1/N slice's band rows — total band volume ≈ one extra corpus)
    val table = "compact_bench_bands"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_compact_tmp")
    Dedup.writeBandTable(corpusSigs, table)
    (0 until appends).foreach { i =>
      Dedup.appendToBandTable(
        corpusSigs.filter(col("doc_id") % appends === i), table)
    }
    def files(): Int = {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$wh/$table")).count(_.getName.endsWith(".parquet"))
    }
    val filesFragmented = files()
    val fragmentedSec = time(iters) {
      consume(Dedup.minhashPairsAgainstBandTable(
        newSigs, spark.table(table), corpusSigs))
    }

    // (c) compacted: one file per bucket, same plan
    Dedup.compactBandTable(spark, table)
    val filesCompacted = files()
    val compactedSec = time(iters) {
      consume(Dedup.minhashPairsAgainstBandTable(
        newSigs, spark.table(table), corpusSigs))
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")

    println(
      s"""{"metric":"compaction_ab","iters":$iters,"sf":"$sfDir","mult":$mult,""" +
        s""""docs":$nDocs,"appends":$appends,""" +
        s""""plain_probe_sec":${f"$plainSec%.3f"},""" +
        s""""fragmented_files":$filesFragmented,"fragmented_probe_sec":${f"$fragmentedSec%.3f"},""" +
        s""""compacted_files":$filesCompacted,"compacted_probe_sec":${f"$compactedSec%.3f"}}""")
    spark.stop()
  }
}
