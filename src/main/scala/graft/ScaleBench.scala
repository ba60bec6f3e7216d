package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TableDiff
import graft.sources.Tables

/** Scaling-curve benchmark: the core diff and the pricing aggregate
  * measured at 1×/4×/16× the sf0.1 row count (unique surrogate keys,
  * so join fan-out stays 1:1). The point is the SHAPE of the curve:
  * a plan that is O(n log n)-ish in the shuffle shows time ratios
  * tracking data ratios; anything superlinear (accidental cartesian,
  * driver materialization, codegen fallback) shows up immediately as
  * a bending curve. Complements BENCH (absolute per-query times) with
  * the evidence a 100 TB claim actually rests on.
  */
object ScaleBench {

  private def time[A](iters: Int)(f: => A): Double =
    BenchFixtures.minTime(iters)(f)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = BenchFixtures.benchSession(cpus, skewJoin = true)

    val fix = BenchFixtures.cleanedTempDir("graft_scale_fix_")

    // amplified orders with unique keys; the after side perturbs
    // every 7th price and drops every 1000th key (real diff traffic).
    // Every staged table is REPARTITIONED before writing: the
    // crossJoin amplification runs in 1-2 partitions, and a table
    // written from them reads back as a handful of splits — which
    // would serialize every NARROW downstream pipeline (a shuffle-
    // bearing plan recovers at its first exchange, a scan-speed
    // operator never does). A real 100 TB table arrives as thousands
    // of splits; the curve must not measure an artifact of the
    // staging layout (measured: the map-only curation family ran in
    // 5 tasks on 32 cores at x64 before this).
    def stage(mult: Int): (DataFrame, DataFrame, DataFrame) = {
      val o = Tables.orders(spark, sfDir)
        .crossJoin(spark.range(mult).toDF("r"))
        .withColumn("k", col("o_orderkey") * mult + col("r"))
        .select(col("k"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
        .repartition(cpus.toInt)
      o.write.mode("overwrite").parquet(s"$fix/before_$mult")
      o.withColumn(
          "o_totalprice",
          when(pmod(col("k"), lit(7)) === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .filter(pmod(col("k"), lit(1000)) =!= 0)
        .write.mode("overwrite").parquet(s"$fix/after_$mult")
      val li = Tables.lineitem(spark, sfDir)
        .crossJoin(spark.range(mult).toDF("r"))
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .repartition(cpus.toInt)
      li.write.mode("overwrite").parquet(s"$fix/lineitem_$mult")
      (
        spark.read.parquet(s"$fix/before_$mult"),
        spark.read.parquet(s"$fix/after_$mult"),
        spark.read.parquet(s"$fix/lineitem_$mult"))
    }

    // amplified documents with unique ids for the curation family —
    // text is replicated verbatim (per-row regex/model work is what
    // scales; duplicate text only scales the bigram-model counts).
    // The dedup family is deliberately NOT in this curve: amplifying
    // exact copies makes candidate sets quadratic BY DATA DESIGN
    // (every replica truly collides), which would bend the curve for
    // data reasons, not plan reasons.
    def stageDocs(mult: Int): DataFrame = {
      Tables.documents(spark, sfDir)
        .crossJoin(spark.range(mult).toDF("r"))
        .withColumn("doc_id", col("doc_id") * mult + col("r"))
        .select("doc_id", "source", "text", "n_chars")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$fix/docs_$mult")
      spark.read.parquet(s"$fix/docs_$mult")
    }

    // SPARK_GRAFT_SCALE_MULTS trims the amplification curve (e.g.
    // "1,4" for a quick iteration pass, "" to skip straight to the
    // Z-order probe); unset runs the full recorded ×1→×64 curve
    val mults = sys.env.get("SPARK_GRAFT_SCALE_MULTS") match {
      case Some(s) => s.split(',').map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
      case None => Seq(1, 4, 16, 64)
    }
    val results = mults.map { mult =>
      val (before, after, li) = stage(mult)
      val nRows = before.count()
      val diffSec = time(iters) {
        TableDiff.diff(before, after, Seq("k")).count()
      }
      val aggSec = time(iters) {
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"),
            count(lit(1)).as("n"))
          .count()
      }
      val docs = stageDocs(mult)
      val nDocs = docs.count()
      // count() alone would let Catalyst PRUNE a map-only operator to
      // a bare row count (and eliminate naturalness' unique-keyed left
      // join) — consume every output column through a hash-sum so the
      // measured time is the operator, not an empty scan
      def consumed(df: DataFrame): Unit = {
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(max(col("h")), min(col("h"))).collect()
        ()
      }
      val funnelSec = time(iters) {
        consumed(graft.operators.TextAnalysis.curationFunnel(docs))
      }
      // drain the operator's tracked cache INSIDE the timed thunk:
      // otherwise iterations 2+ of min-of-iters measure a warm cache,
      // not the operator (caught when the docs-curve numbers moved
      // with the staged partition count of the CACHED table)
      val natSec = time(iters) {
        consumed(graft.operators.TextAnalysis.naturalness(docs))
        graft.operators.Dedup.unpersistAll()
      }
      // the sampled-fit A/B: model fit on a 1/16 hash-sample, every
      // doc still scored; no tracked cache to drain (single-consumer
      // branches stay streaming)
      val natSampledSec = time(iters) {
        consumed(graft.operators.TextAnalysis.naturalness(docs, fitSampleMod = Some(16)))
      }
      // full-PSL registered-domain extraction at production rule
      // count (~9200 synthetic rules): the bounded candidate explode
      // + broadcast rule join must scale with the CORPUS, not the
      // rule count × corpus product
      val pslRules = {
        import spark.implicits._
        graft.operators.TextAnalysis
          .parsePslRules(graft.operators.TextAnalysis.syntheticPslText())
          .toDF("suffix_key", "is_exception")
      }
      val pslSec = time(iters) {
        val planted = docs.select(
          col("doc_id"),
          concat(lit("https://"),
            expr(graft.ExtensionQueries.psl9kHost("STRING")), lit("/p")).as("url"))
        consumed(graft.operators.TextAnalysis
          .registeredDomainByPsl(planted, "url", "doc_id", pslRules)
          .select(col("doc_id"), col("registered_domain")))
      }
      graft.functions.PolyHash.register(spark)
      val mixSec = time(iters) {
        graft.operators.Sampling.mixtureByBudget(
          docs.select("doc_id", "source", "n_chars"),
          "source", "n_chars",
          graft.functions.TextExprs.charHashSpark("CAST(doc_id AS STRING)"),
          "doc_id",
          Seq("src0" -> (40000L * mult), "src1" -> (20000L * mult)),
          defaultBudget = 30000L * mult).count()
      }
      // float-vs-int8 retrieval A/B over amplified embeddings with a
      // FIXED query set: ids are original*mult + r, so queryMod =
      // 97*mult selects exactly the base corpus's ~21 queries at
      // every scale — candidate work is O(q·n), LINEAR in the
      // amplification, and the two paths differ only in the scan
      // width (256B float vs 64B packed binary per vector) and the
      // dot kernel (double FMA vs integer MAC). The ratio is the
      // evidence for quantizing a 100 TB embedding column.
      val embDf = Tables.embeddings(spark, sfDir)
        .crossJoin(spark.range(mult).toDF("r"))
        .withColumn("vec_id", col("vec_id") * mult + col("r"))
        .select("vec_id", "embedding")
        .repartition(cpus.toInt)
      embDf.write.mode("overwrite").parquet(s"$fix/emb_$mult")
      val emb = spark.read.parquet(s"$fix/emb_$mult")
      val bruteSec = time(iters) {
        consumed(graft.operators.SimilaritySearch
          .bruteTopK(emb, queryMod = 97 * mult))
      }
      val quantSec = time(iters) {
        consumed(graft.operators.SimilaritySearch
          .quantizedTopK(emb, queryMod = 97 * mult))
      }
      // WordPiece tokenization: a pure map-side byte-scan kernel —
      // the curve should stay flat like the funnel's
      val wpSec = time(iters) {
        consumed(graft.operators.TextAnalysis.wordpieceStats(docs))
      }
      // the same kernel at production vocab scale (~30k pieces): the
      // scan is O(bytes · maxPieceLen) with per-length-agnostic hash
      // probes, so 300× more vocabulary should cost ~nothing beyond
      // the one-time compile — a superlinear gap here would mean the
      // matcher degrades with vocab size
      val wp30k = graft.operators.TextAnalysis.wordpieceVocab30k()
      val wp30kSec = time(iters) {
        consumed(graft.operators.TextAnalysis.wordpieceStats(docs, vocab = wp30k))
      }
      // IVF centroid-fit A/B: the Lloyd refinement is the dominant
      // build cost (a full nearest-centroid pass per iteration);
      // fitSampleMod caps it at a 1/16 hash-sample while assignment
      // stays full-corpus. buildIndex's localize() collects each
      // round, so timing the call (without consuming the lazy
      // assignment frame) measures exactly seed + fit.
      val nEmb = emb.count()
      val ivfMod = math.max(1, math.round(math.sqrt(nEmb.toDouble)).toInt)
      val ivfFitSec = time(iters) {
        graft.operators.SimilaritySearch.buildIndex(emb, centroidMod = ivfMod)
        ()
      }
      val ivfFitSampledSec = time(iters) {
        graft.operators.SimilaritySearch
          .buildIndex(emb, centroidMod = ivfMod, fitSampleMod = Some(16))
        ()
      }
      (mult, nRows, diffSec, aggSec, nDocs, funnelSec, natSec, natSampledSec,
        pslSec, mixSec, bruteSec, quantSec, wpSec, wp30kSec, ivfFitSec, ivfFitSampledSec)
    }

    val qs = results.map { case (m, n, d, a, nd, f, nt, nts, ps, mx, bt, qt, wp, wp30, ivf, ivfs) =>
      s""""x$m":{"rows":$n,"diff_sec":${f"$d%.3f"},"agg_sec":${f"$a%.3f"},""" +
        s""""docs":$nd,"funnel_sec":${f"$f%.3f"},"nat_sec":${f"$nt%.3f"},""" +
        s""""nat_sampled_sec":${f"$nts%.3f"},"psl_sec":${f"$ps%.3f"},"mix_sec":${f"$mx%.3f"},""" +
        s""""brute_topk_sec":${f"$bt%.3f"},"quant_topk_sec":${f"$qt%.3f"},""" +
        s""""wordpiece_sec":${f"$wp%.3f"},"wordpiece_30k_sec":${f"$wp30%.3f"},""" +
        s""""ivf_fit_sec":${f"$ivf%.3f"},"ivf_fit_sampled_sec":${f"$ivfs%.3f"}}"""
    }.mkString(",")
    // an empty mults list (the skip-to-probe mode) must still emit
    // valid JSON — a trailing comma would parse as null driver-side
    val qsPart = if (qs.isEmpty) "" else "," + qs
    println(s"""{"metric":"scale_curve","iters":$iters,"sf":"$sfDir"$qsPart}""")

    // ---- Z-order file-skipping probe ----
    // q_zorder_key computes the layout STAT; this measures the layout
    // DOING ITS JOB: write lineitem twice at the same file count —
    // linearly range-partitioned on l_partkey (what a naive writer
    // produces) vs range-partitioned on the Morton z-key — then
    // evaluate per-file min/max prunability for range predicates on
    // partkey alone, suppkey alone, and both. The skip ratio is
    // exactly what a min/max-pruning reader (parquet row groups,
    // Delta/Iceberg file stats) achieves on each layout; wall time of
    // the both-dims filtered scan is reported alongside.
    graft.functions.ZInterleave16.register(spark)
    val liz = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity")
    // 256 files ≈ a 16×16 z-cell grid: enough resolution that the
    // both-dims predicate prunes multiplicatively (a 10%×10% box
    // touches ~2×2 of 16×16 cells); linear's pruning saturates at the
    // slice width of its one sorted dimension no matter the file count
    val zFiles = 256
    liz.repartitionByRange(zFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$fix/zlin")
    // the PRODUCT operator does the write-side clustering, including
    // the equal-width dimension normalization without which a
    // 15-bit × 10-bit interleave degenerates to a partkey sort (0%
    // supp-dim skip — measured before clusterByZ normalized)
    graft.functions.ZInterleave16
      .clusterByZ(liz, "l_partkey", "l_suppkey", numFiles = zFiles)
      .write.mode("overwrite").parquet(s"$fix/zord")
    // 10%-wide mid-range slices of each dimension
    val bounds = liz.agg(
      min("l_partkey").cast("long"), max("l_partkey").cast("long"),
      min("l_suppkey").cast("long"), max("l_suppkey").cast("long")).head()
    def slice(lo: Long, hi: Long): (Long, Long) = {
      val w = hi - lo
      (lo + (w * 45) / 100, lo + (w * 55) / 100)
    }
    val (plo, phi) = slice(bounds.getLong(0), bounds.getLong(1))
    val (slo, shi) = slice(bounds.getLong(2), bounds.getLong(3))
    // fraction of files a min/max-stats reader PRUNES for a predicate,
    // from the files' actual per-file column ranges
    // NAMED field access throughout both probes: positional getLong
    // indexes silently misread after any agg-list edit, printing
    // plausible-but-wrong skip percentages
    def skipRatios(path: String): (Double, Double, Double) =
      skipRatiosOf(spark.read.parquet(path))
    def skipRatiosOf(df: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val stats = df
        .groupBy(input_file_name().as("f"))
        .agg(
          min("l_partkey").cast("long").as("mnp"), max("l_partkey").cast("long").as("mxp"),
          min("l_suppkey").cast("long").as("mns"), max("l_suppkey").cast("long").as("mxs"))
        .collect()
      val n = stats.length.toDouble
      def hits(p: org.apache.spark.sql.Row => Boolean) = stats.count(p) / n
      def inP(r: org.apache.spark.sql.Row) =
        r.getAs[Long]("mxp") >= plo && r.getAs[Long]("mnp") <= phi
      def inS(r: org.apache.spark.sql.Row) =
        r.getAs[Long]("mxs") >= slo && r.getAs[Long]("mns") <= shi
      (1.0 - hits(inP), 1.0 - hits(inS), 1.0 - hits(r => inP(r) && inS(r)))
    }
    val (linPart, linSupp, linBoth) = skipRatios(s"$fix/zlin")
    val (zPart, zSupp, zBoth) = skipRatios(s"$fix/zord")
    def scanSec(path: String): Double = time(iters) {
      spark.read.parquet(path)
        .filter(col("l_partkey").between(plo, phi) && col("l_suppkey").between(slo, shi))
        .agg(sum(col("l_quantity"))).collect()
      ()
    }
    val pct = (v: Double) => f"${v * 100}%.1f"
    println(
      s"""{"metric":"zorder_skip","files":$zFiles,"sf":"$sfDir",""" +
        s""""pred_part":[$plo,$phi],"pred_supp":[$slo,$shi],""" +
        s""""linear_skip_pct":{"part":${pct(linPart)},"supp":${pct(linSupp)},"both":${pct(linBoth)}},""" +
        s""""zorder_skip_pct":{"part":${pct(zPart)},"supp":${pct(zSupp)},"both":${pct(zBoth)}},""" +
        s""""linear_scan_sec":${f"${scanSec(s"$fix/zlin")}%.3f"},""" +
        s""""zorder_scan_sec":${f"${scanSec(s"$fix/zord")}%.3f"}}""")

    // ---- Z-order append degradation + re-cluster cadence probe ----
    // a clusterByZ table is only clustered until appends land: tail
    // files span the whole (partkey, suppkey) domain, a min/max-stats
    // reader prunes NONE of them, and skip% decays with every batch.
    // ZLayout folds the re-cluster cadence into the ingest call (the
    // band-table appendAndMaybeCompact pattern); this measures the
    // decay and the restore on the same predicates as zorder_skip.
    val zlay = s"$fix/zlayout"
    graft.functions.ZLayout.writeClustered(liz, zlay, "l_partkey", "l_suppkey", zFiles)
    val (b0p, b0s, b0b) = skipRatiosOf(graft.functions.ZLayout.read(spark, zlay))
    // 8 ingest batches of ~1/512 of the corpus each, 2 files per batch
    def sliceBatch(k: Int) = liz.filter(pmod(xxhash64(col("l_partkey"), col("l_suppkey"), col("l_quantity")), lit(512)) === k)
    (1 to 8).foreach(k => graft.functions.ZLayout.append(sliceBatch(k), zlay, appendTasks = 2))
    val (d8p, d8s, d8b) = skipRatiosOf(graft.functions.ZLayout.read(spark, zlay))
    val tailFiles = new java.io.File(s"$zlay/tail").listFiles()
      .count(_.getName.endsWith(".parquet"))
    // the 9th ingest trips the cadence (17+2 > 6% of 256) and
    // re-clusters base+tail into a fresh generation
    var reclustered = false
    val reclusterSec = time(1) {
      reclustered = graft.functions.ZLayout.appendAndMaybeRecluster(
        sliceBatch(9), zlay, "l_partkey", "l_suppkey", zFiles,
        maxTailFraction = 0.06, appendTasks = 2)
    }
    val (r0p, r0s, r0b) = skipRatiosOf(graft.functions.ZLayout.read(spark, zlay))
    val nAll = graft.functions.ZLayout.read(spark, zlay).count()
    println(
      s"""{"metric":"zorder_append_recluster","files":$zFiles,"sf":"$sfDir",""" +
        s""""base_skip_pct":{"part":${pct(b0p)},"supp":${pct(b0s)},"both":${pct(b0b)}},""" +
        s""""after_8_appends_skip_pct":{"part":${pct(d8p)},"supp":${pct(d8s)},"both":${pct(d8b)}},""" +
        s""""tail_files":$tailFiles,"reclustered":$reclustered,""" +
        s""""recluster_sec":${f"$reclusterSec%.3f"},""" +
        s""""post_recluster_skip_pct":{"part":${pct(r0p)},"supp":${pct(r0s)},"both":${pct(r0b)}},""" +
        s""""rows_after":$nAll}""")

    // ---- 3-dim Z-order probe (clusterByZN) ----
    // same methodology, third dimension added (l_quantity, domain
    // 1-50): the question is whether the shared bit budget still buys
    // per-dim skipping on all THREE axes, vs the 2-dim layout where
    // quantity predicates prune nothing. At 256 files the key spends
    // ~2.7 bits/dim — per-dim resolution drops (that's the documented
    // cost of each added dimension), the triple-box product prunes
    // multiplicatively.
    val liz3 = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .withColumn("l_quantity", col("l_quantity").cast("long"))
    graft.functions.ZInterleaveN
      .clusterByZN(liz3, Seq("l_partkey", "l_suppkey", "l_quantity"), numFiles = zFiles)
      .write.mode("overwrite").parquet(s"$fix/zord3")
    val qb = liz3.agg(
      min("l_quantity").cast("long"), max("l_quantity").cast("long")).head()
    val (qlo, qhi) = slice(qb.getLong(0), qb.getLong(1))
    def skipRatios3(path: String): (Double, Double, Double, Double) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(
          min("l_partkey").cast("long").as("mnp"), max("l_partkey").cast("long").as("mxp"),
          min("l_suppkey").cast("long").as("mns"), max("l_suppkey").cast("long").as("mxs"),
          min("l_quantity").cast("long").as("mnq"), max("l_quantity").cast("long").as("mxq"))
        .collect()
      val n = stats.length.toDouble
      def hits(p: org.apache.spark.sql.Row => Boolean) = stats.count(p) / n
      def inP(r: org.apache.spark.sql.Row) =
        r.getAs[Long]("mxp") >= plo && r.getAs[Long]("mnp") <= phi
      def inS(r: org.apache.spark.sql.Row) =
        r.getAs[Long]("mxs") >= slo && r.getAs[Long]("mns") <= shi
      def inQ(r: org.apache.spark.sql.Row) =
        r.getAs[Long]("mxq") >= qlo && r.getAs[Long]("mnq") <= qhi
      (1.0 - hits(inP), 1.0 - hits(inS), 1.0 - hits(inQ),
        1.0 - hits(r => inP(r) && inS(r) && inQ(r)))
    }
    val (z3Part, z3Supp, z3Qty, z3All) = skipRatios3(s"$fix/zord3")
    println(
      s"""{"metric":"zorder3_skip","files":$zFiles,"sf":"$sfDir",""" +
        s""""pred_qty":[$qlo,$qhi],""" +
        s""""zorder3_skip_pct":{"part":${pct(z3Part)},"supp":${pct(z3Supp)},"qty":${pct(z3Qty)},"all3":${pct(z3All)}}}""")
    spark.stop()
  }
}
