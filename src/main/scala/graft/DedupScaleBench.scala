package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling curve for the dedup chain (minhash pairs → label
  * propagation → keep-best apply) over MUTATED near-duplicate
  * amplification.
  *
  * ScaleBench deliberately excludes dedup: amplifying verbatim copies
  * makes every replica collide with every other, so candidate sets
  * grow quadratically BY DATA DESIGN and the curve measures the
  * fixture, not the plan. Here amplification is pair-structured
  * token-level mutation instead:
  *
  *  - replica r of a doc gets every 3rd token replaced by a marker
  *    token unique to its PAIR (`m{r - r%2}`). With 3-token shingles
  *    every shingle window contains exactly one marker position, so
  *    replicas of DIFFERENT pairs share no shingles at all — they
  *    cannot be near-dups of each other;
  *  - the odd replica of each pair additionally appends one token,
  *    so each (even, odd) pair is a true near-dup (signature
  *    agreement ≈ 32/32) without being exact.
  *
  * Planted near-dup pairs therefore number docs·mult/2 — LINEAR in
  * the amplification — and the measured candidate/pair counts are
  * printed next to the times so the curve's honesty is checkable:
  * near-linear `n_pairs` growth with near-linear stage times is the
  * 100 TB evidence; anything superlinear flags a plan (or fixture)
  * problem immediately.
  */
object DedupScaleBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = BenchFixtures.benchSession(cpus, skewJoin = true)

    val fix = BenchFixtures.cleanedTempDir("graft_dedup_scale_fix_")

    // stage the mutated amplification to parquet and read back, so the
    // timed chain starts from a real table at a real split count (same
    // staging discipline as ScaleBench; fixture shared via BenchFixtures)
    def stage(mult: Int): DataFrame =
      BenchFixtures.mutatedAmplifiedDocs(spark, sfDir, mult, cpus.toInt, fix)

    val results = Seq(1, 4, 16, 64).map { mult =>
      val docs = stage(mult)
      val nDocs = docs.count()
      var nPairs = 0L
      val pairsSec = time(iters) {
        nPairs = graft.operators.Dedup.minhashPairs(docs).count()
        graft.operators.Dedup.unpersistAll()
      }
      // materialize pairs once so the cluster/apply stages time THEIR
      // work, not a re-run of candidate generation
      val pairs = graft.operators.Dedup.minhashPairs(docs).localCheckpoint(true)
      graft.operators.Dedup.unpersistAll()
      var nClusters = 0L
      val clusterSec = time(iters) {
        nClusters = graft.operators.ConnectedComponents
          .labelPropagate(pairs, "doc_a", "doc_b")
          .select("component").distinct().count()
      }
      // A/B the O(log n) star alternation on the same pairs: dedup
      // graphs are near-cliques, so this measures the algorithms'
      // constant factors at equal (tiny) round counts
      val starSec = time(iters) {
        graft.operators.ConnectedComponents
          .largeSmallStar(pairs, "doc_a", "doc_b")
          .select("component").distinct().count()
      }
      val labels = graft.operators.ConnectedComponents
        .labelPropagate(pairs, "doc_a", "doc_b").localCheckpoint(true)
      var nKept = 0L
      val applySec = time(iters) {
        nKept = graft.operators.Dedup
          .applyKeepBestWithLabels(docs, labels, "n_chars").count()
      }
      // substring-span detector on the same pair-structured fixture:
      // each (even, odd) replica pair shares its full marker-mutated
      // text as one verbatim span, and the every-3rd-token pair marker
      // makes any 10-token window pair-specific — so planted span
      // count grows LINEARLY in mult and a superlinear time or span
      // curve flags quadratic fan-out immediately
      var nSpans = 0L
      val spanSec = time(iters) {
        nSpans = graft.operators.Dedup.repeatedSpanPairs(docs, minTokens = 10).count()
        graft.operators.Dedup.unpersistAll()
      }
      (mult, nDocs, nPairs, nClusters, nKept, nSpans, pairsSec, clusterSec, starSec, applySec,
        spanSec)
    }

    val qs = results.map { case (m, nd, np, nc, nk, nsp, ps, cs, ss, as_, sps) =>
      s""""x$m":{"docs":$nd,"n_pairs":$np,"n_clusters":$nc,"n_kept":$nk,"n_spans":$nsp,""" +
        s""""pairs_sec":${f"$ps%.3f"},"cluster_sec":${f"$cs%.3f"},""" +
        s""""cluster_star_sec":${f"$ss%.3f"},"apply_sec":${f"$as_%.3f"},""" +
        s""""spans_sec":${f"$sps%.3f"}}"""
    }.mkString(",")
    println(s"""{"metric":"dedup_scale_curve","iters":$iters,"sf":"$sfDir",$qs}""")

    // adversarial chain fixture: a path graph is the worst case for
    // min-label propagation (rounds = diameter) and the motivating
    // case for the star alternation (rounds ≈ log2 n). Times are one
    // run each — the gap is orders of magnitude, not noise.
    val chainResults = Seq(256, 2048).map { n =>
      import spark.implicits._
      val chain = (1L until n.toLong).map(i => (i + 1, i))
        .toDF("a", "b").repartition(cpus.toInt).localCheckpoint(true)
      val starSec = time(1) {
        val labels = graft.operators.ConnectedComponents
          .largeSmallStar(chain, "a", "b", maxIter = 40)
        require(labels.filter(col("component") =!= 1L).isEmpty, "star mislabeled chain")
      }
      // propagation needs n-1 rounds on this graph: run it only at the
      // smaller size (its cost is the point being demonstrated)
      val propSec = if (n > 256) -1.0 else time(1) {
        val labels = graft.operators.ConnectedComponents
          .labelPropagate(chain, "a", "b", maxIter = n)
        require(labels.filter(col("component") =!= 1L).isEmpty, "propagation mislabeled chain")
      }
      s""""chain_$n":{"star_sec":${f"$starSec%.3f"},"propagate_sec":${f"$propSec%.3f"}}"""
    }
    println(s"""{"metric":"cc_chain_ab",${chainResults.mkString(",")}}""")
    spark.stop()
  }
}
