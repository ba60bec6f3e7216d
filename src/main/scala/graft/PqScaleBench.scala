package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ scaling curve: fit / encode / refined-probe timed at 1×/4×/16×
  * embedding amplification. The shapes under test: ENCODE is one
  * broadcast-codebook pass (linear in corpus, the claim a 100 TB
  * deployment rests on — any superlinearity flags a plan problem);
  * the REFINED PROBE scans the corpus only in the compressed domain
  * and touches floats for shortlist·|queries| rows. Replicas perturb
  * each float by a replica-specific epsilon, so amplified vectors are
  * distinct but the space keeps its geometry.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_ITERS. Emits one JSON line.
  */
object PqScaleBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = BenchFixtures.benchSession(cpus)
    import graft.operators.SimilaritySearch

    val fix = BenchFixtures.cleanedTempDir("graft_pq_scale_fix_")
    val rows = Seq(1, 4, 16).map { mult =>
      graft.sources.Tables.embeddings(spark, sfDir)
        .crossJoin(spark.range(mult).toDF("r"))
        .select(
          (col("vec_id") * mult + col("r")).as("vec_id"),
          expr("transform(embedding, x -> x + CAST(r AS FLOAT) * CAST(0.001 AS FLOAT))")
            .as("embedding"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$fix/emb_$mult")
      val emb = spark.read.parquet(s"$fix/emb_$mult")
      val n = emb.count()
      // seedMod scales with the corpus so the per-subspace codebook
      // stays PQ-typical (~100) rather than growing linearly
      val seedMod = math.max(1, (n / 100L).toInt)
      val fitSec = time(iters) {
        SimilaritySearch.pqFit(emb, m = 16, seedMod = seedMod)
      }
      val cb = SimilaritySearch.pqFit(emb, m = 16, seedMod = seedMod)
      val encodeSec = time(iters) {
        SimilaritySearch.pqEncode(emb, cb).count()
      }
      val codes = SimilaritySearch.pqEncode(emb, cb).localCheckpoint(true)
      var nq = 0L
      val probeSec = time(iters) {
        val out = SimilaritySearch
          .pqTopKRefined(emb, cb, codes, k = 5, shortlist = 50)
        nq = out.select("query_id").distinct().count()
      }
      graft.TmpfsScratch.deleteRecursively(java.nio.file.Paths.get(s"$fix/emb_$mult"))
      s""""x$mult":{"vectors":$n,"queries":$nq,"fit_sec":${f"$fitSec%.3f"},""" +
        s""""encode_sec":${f"$encodeSec%.3f"},"refined_probe_sec":${f"$probeSec%.3f"}}"""
    }
    println(s"""{"metric":"pq_scale_curve","iters":$iters,"sf":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }
}
