package graft

import org.apache.spark.sql.functions._

/** Scaling curves for the curation-granularity additions: paragraph
  * dedup (CCNet/C4 line granularity) and SemDeDup semantic dedup.
  *
  * Both fixtures are pair-structured like [[DedupScaleBench]]'s, so
  * planted duplicate mass grows LINEARLY in the amplification and the
  * curve measures the PLAN, not a verbatim-copy quadratic fixture:
  *
  *  - paragraph: the mutated amplification (every 3rd token replaced
  *    by an (even, odd)-pair marker) is chunked into 10-word lines —
  *    the marker sits in every 10-word window, so replicas of
  *    different pairs share NO full lines, while a pair's replicas
  *    share every line except the odd's appended tail. Duplicate-line
  *    mass is linear in mult and per-line-key window groups stay ≤ 2.
  *  - semantic: replica vectors are deterministic hash-noise
  *    directions keyed by the (even, odd) pair index — cross-pair
  *    cosines concentrate near 0 (|cos| ≲ few/√64), far under the
  *    0.995 gate — and each odd replica is the 1.001× scaled copy of
  *    its even partner (cosine ≈ 1). Expected drops = exactly one per
  *    pair; printing the measured count next to the time makes the
  *    curve's honesty checkable. Clustering uses the k ≈ √n default
  *    (centroidMod = 0), so candidate volume grows ~n^1.5 — the
  *    SemDeDup paper's operating point — and the time curve should
  *    track that, never n².
  */
object CurationScaleBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = BenchFixtures.benchSession(cpus)
    val fix = BenchFixtures.cleanedTempDir("graft_curation_scale_fix_")
    val mults = sys.env.get("SPARK_GRAFT_SCALE_MULTS") match {
      case Some("") => Seq.empty[Int]
      case Some(s)  => s.split(",").map(_.trim.toInt).toSeq
      case None     => Seq(1, 4, 16, 64)
    }

    val paraResults = mults.map { mult =>
      val docs = BenchFixtures.mutatedAmplifiedDocs(spark, sfDir, mult, cpus.toInt, fix)
      docs.select(
          col("doc_id"),
          expr("""array_join(transform(
            |  sequence(0, cast(ceil(size(split(text, ' ')) / 10.0) as int) - 1),
            |  i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' ')), '\n')"""
            .stripMargin).as("text"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$fix/para_$mult")
      val corpus = spark.read.parquet(s"$fix/para_$mult")
      val nDocs = corpus.count()
      var nLines = 0L
      var nDropped = 0L
      val sec = time(iters) {
        val agg = graft.operators.Dedup.paragraphDedup(corpus)
          .agg(sum("n_paras"), sum(expr("n_paras - n_kept")))
          .collect()(0)
        nLines = agg.getLong(0)
        nDropped = agg.getLong(1)
      }
      (mult, nDocs, nLines, nDropped, sec)
    }

    // hot-key fixture (r13 verdict task #1): real duplicate-line mass
    // is Zipfian — ONE boilerplate line ("all rights reserved.")
    // interleaved after EVERY content line, so one normalized key owns
    // ~half of all line rows. The text-keyed WINDOW form funnels that
    // key through a single sort task (AQE cannot split a window
    // partition); the fingerprint AGGREGATION form partial-aggregates
    // it map-side and its join skew is AQE-splittable. Both forms must
    // report identical drop counts — the speed difference is the
    // measurement.
    val hotResults = mults.map { mult =>
      spark.read.parquet(s"$fix/para_$mult")
        .select(
          col("doc_id"),
          expr("""array_join(flatten(transform(
            |  split(text, '\n'),
            |  l -> array(l, 'All Rights Reserved.'))), '\n')""".stripMargin)
            .as("text"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$fix/parahot_$mult")
      val corpus = spark.read.parquet(s"$fix/parahot_$mult")
      var winDropped = 0L
      var fpDropped = 0L
      val winSec = time(iters) {
        winDropped = graft.operators.Dedup.paragraphDedup(corpus)
          .agg(sum(expr("n_paras - n_kept"))).collect()(0).getLong(0)
      }
      val fpSec = time(iters) {
        fpDropped = graft.operators.Dedup
          .paragraphDedup(corpus, byFingerprint = true)
          .agg(sum(expr("n_paras - n_kept"))).collect()(0).getLong(0)
      }
      require(
        winDropped == fpDropped,
        s"window ($winDropped) and fingerprint ($fpDropped) forms diverged at x$mult")
      (mult, winDropped, winSec, fpSec)
    }

    val semResults = mults.map { mult =>
      val d = graft.functions.VectorExprs.Dim
      graft.sources.Tables.embeddings(spark, sfDir)
        .select("vec_id", "embedding")
        .crossJoin(spark.range(mult).toDF("r"))
        .withColumn("e", col("r") - pmod(col("r"), lit(2)))
        .select(
          (col("vec_id") * mult + col("r")).as("vec_id"),
          expr(s"""transform(sequence(0, ${d - 1}, 1),
            |  p -> CAST(CAST(pmod(hash(vec_id, e, p), 2001) - 1000 AS DOUBLE)
            |         / 1000.0 * (1.0 + 0.001 * pmod(r, 2)) AS FLOAT))""".stripMargin)
            .as("embedding"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$fix/sem_$mult")
      val corpus = spark.read.parquet(s"$fix/sem_$mult")
      var n = 0L
      var nDropped = 0L
      var nClusters = 0L
      val sec = time(iters) {
        val agg = graft.operators.Dedup.semanticDedup(corpus, centroidMod = 0)
          .agg(
            count(lit(1)),
            sum(when(!col("keep"), 1L).otherwise(0L)),
            countDistinct("cid"))
          .collect()(0)
        n = agg.getLong(0)
        nDropped = agg.getLong(1)
        nClusters = agg.getLong(2)
        graft.operators.Dedup.unpersistAll()
      }
      // the boundary-recall probe (r13 verdict task #4): top-2
      // centroid assignment for candidate generation — how many of
      // the cross-cluster planted pairs does it reclaim, at what
      // time cost? Planted drops expected = n/2 (one per pair).
      var top2Dropped = 0L
      val top2Sec = time(iters) {
        top2Dropped = graft.operators.Dedup
          .semanticDedup(corpus, centroidMod = 0, assignTop = 2)
          .agg(sum(when(!col("keep"), 1L).otherwise(0L)))
          .collect()(0).getLong(0)
        graft.operators.Dedup.unpersistAll()
      }
      (mult, n, nClusters, nDropped, sec, top2Dropped, top2Sec)
    }

    // margin sweep (r14 verdict task #2): the gated second assignment
    // at the LARGEST mult — recall (dropped count) vs secondary-row
    // volume vs wall, across margins, bracketed by top-1 (margin-less
    // base) and unconditional top-2. Secondary-row volume is the
    // candidate-cost proxy: pair volume grows with the rows a margin
    // admits into a second cluster, and counting rows is exact and
    // cheap where counting pairs would re-run the join.
    val marginSweep = mults.lastOption.toSeq.flatMap { mult =>
      val corpus = spark.read.parquet(s"$fix/sem_$mult")
      // the margin-SELECTION probe (r15 verdict task #5): the gap
      // distribution's low quantiles are the production way to pick
      // the margin, so print them next to the sweep they predict —
      // the quantile is the admitted-fraction dial, and the sweep's
      // n_secondary column should read ≈ quantile·|corpus| at the
      // probe-chosen margins
      val probeRows = graft.operators.Dedup
        .assignMarginProbe(
          corpus, quantiles = Seq(0.001, 0.01, 0.05, 0.1), centroidMod = 0)
        .collect()
        .map(r => f"q${r.getDouble(0)}%.3f -> ${r.getDouble(1)}%.6f")
        .mkString(", ")
      graft.operators.Dedup.unpersistAll()
      println(s"[curation-scale] assignMarginProbe mult=$mult: $probeRows")
      // empty string = skip the sweep (the SPARK_GRAFT_SCALE_MULTS
      // convention), e.g. when a run only wants the percentile probe
      val margins = sys.env.get("SPARK_GRAFT_SEM_MARGINS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq)
        .getOrElse(Seq(0.05, 0.1, 0.25, 0.5, 1.0))
      margins.map { m =>
        var dropped = 0L
        val sec = time(iters) {
          dropped = graft.operators.Dedup
            .semanticDedup(corpus, centroidMod = 0, assignMargin = Some(m))
            .agg(sum(when(!col("keep"), 1L).otherwise(0L)))
            .collect()(0).getLong(0)
          graft.operators.Dedup.unpersistAll()
        }
        // secondary-assignment volume under this margin, counted
        // through the OPERATOR's own gate (Dedup.multiAssignRows —
        // a re-spelling here could silently drift from the shipped
        // candidate set, review r15)
        val idx = graft.operators.SimilaritySearch.buildIndex(corpus, centroidMod = 0)
        val nSecondary = graft.operators.Dedup.multiAssignRows(
            idx.assignments.select(col("cand_id").as("vec_id"), col("cand_emb")),
            idx.centroids, effTop = 2, assignMargin = Some(m))
          .filter(col("_rn") > 1)
          .count()
        graft.operators.Dedup.unpersistAll()
        (mult, m, dropped, nSecondary, sec)
      }
    }

    // percentile-accumulator scale probe (r14 verdict task #7): the
    // corpus report's exact `percentile` claims an accumulator bounded
    // by the ppm DOMAIN (≤ 10⁶+1 values), not corpus size — pin that
    // with a measurement at the largest mult: distinct-value count
    // (the accumulator's true key cardinality) and wall, exact vs the
    // approx_percentile sketch, over the identical staged column.
    val pctProbe = mults.lastOption.map { mult =>
      val corpus = spark.read.parquet(s"$fix/para_$mult")
      graft.operators.TextAnalysis.quality(corpus)
        .select("quality_ppm")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$fix/ppm_$mult")
      val ppm = spark.read.parquet(s"$fix/ppm_$mult")
      val n = ppm.count()
      val nDistinct = ppm.distinct().count()
      val exactSec = time(iters) {
        ppm.agg(expr("percentile(quality_ppm, array(0.25D, 0.5D, 0.75D))")).collect()
      }
      val approxSec = time(iters) {
        ppm.agg(expr(
          "approx_percentile(quality_ppm, array(0.25D, 0.5D, 0.75D), 10000)")).collect()
      }
      (mult, n, nDistinct, exactSec, approxSec)
    }

    val paraQs = paraResults.map { case (m, nd, nl, ndr, s) =>
      s""""para_x$m":{"docs":$nd,"n_lines":$nl,"n_dropped":$ndr,"sec":${f"$s%.3f"}}"""
    }.mkString(",")
    val hotQs = hotResults.map { case (m, ndr, ws, fs) =>
      s""""parahot_x$m":{"n_dropped":$ndr,"window_sec":${f"$ws%.3f"},"fp_sec":${f"$fs%.3f"}}"""
    }.mkString(",")
    val semQs = semResults.map { case (m, n, nc, ndr, s, ndr2, s2) =>
      s""""sem_x$m":{"vectors":$n,"n_clusters":$nc,"n_dropped":$ndr,"sec":${f"$s%.3f"},""" +
        s""""top2_dropped":$ndr2,"top2_sec":${f"$s2%.3f"}}"""
    }.mkString(",")
    val marginQs = marginSweep.map { case (mult, m, ndr, nsec, s) =>
      s""""sem_margin_x${mult}_$m":{"n_dropped":$ndr,"n_secondary":$nsec,"sec":${f"$s%.3f"}}"""
    }.mkString(",")
    val marginPart = if (marginQs.isEmpty) "" else s",$marginQs"
    val pctPart = pctProbe.map { case (m, n, nd, es, as_) =>
      s""","pct_x$m":{"rows":$n,"distinct_ppm":$nd,"exact_sec":${f"$es%.3f"},"approx_sec":${f"$as_%.3f"}}"""
    }.getOrElse("")
    println(s"""{"metric":"curation_scale_curve","iters":$iters,"sf":"$sfDir",$paraQs,$hotQs,$semQs$marginPart$pctPart}""")
    spark.stop()
  }
}
