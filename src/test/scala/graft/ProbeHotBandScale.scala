package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measurement probe for the hot-band star dial
  * (`Dedup.minhashPairs(maxDocsPerBand)`): candidate-pair volume and
  * wall as ONE band bucket grows. The skew shape under measurement is
  * the boilerplate template — H verbatim copies of a single document.
  * Identical texts produce identical minhash signatures, so the group
  * shares a (band, bkey) bucket in EVERY band and the uncapped
  * self-join's candidate volume is bands × H(H−1)/2 — quadratic in H
  * with no shuffle-partitioning escape (it is ONE join key). The
  * star form emits H−1 edges per band instead.
  *
  * Claim under measurement: uncapped VERIFIED pair count grows as
  * H²/2 while the capped count stays H−1 (exact tallies), and capped
  * wall stays flat while uncapped wall bends quadratic once the
  * bucket dominates the corpus' natural pair volume. Run:
  * `Test/runMain graft.ProbeHotBandScale /root/testdata/sf0.01`.
  * Numbers recorded in SCALE.md.
  */
object ProbeHotBandScale {

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sizes = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(64, 256, 1024, 4096))

    val base = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").localCheckpoint(true)
    val seed = base.orderBy("doc_id").limit(1).select("text")

    println(f"${"H"}%8s ${"mode"}%10s ${"pairs"}%12s ${"hot_pairs"}%12s ${"wall_s"}%8s")
    for (h <- sizes) {
      val hot = base.unionByName(
        spark.range(h.toLong)
          .select((col("id") + 3000000L).as("doc_id"))
          .crossJoin(seed)
          .select("doc_id", "text"))
        .localCheckpoint(true)
      for ((mode, cap) <- Seq("uncapped" -> 0, "star" -> 8)) {
        val t0 = System.nanoTime()
        val pairs = Dedup.minhashPairs(hot, maxDocsPerBand = cap)
          .select("doc_a", "doc_b")
          .withColumn("hot",
            (col("doc_a") >= 3000000L || col("doc_b") >= 3000000L).cast("long"))
          .agg(count(lit(1L)).as("n"), sum(col("hot")).as("nh"))
          .collect()(0)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$h%8d $mode%10s ${pairs.getLong(0)}%12d ${pairs.getLong(1)}%12d $wall%8.2f")
        Dedup.unpersistAll()
      }
    }

    // the Hamming-family twin: the same template flood through the
    // pigeonhole segment buckets (simhashPairs) — identical texts
    // carry ONE fingerprint, flooding all maxHamming+1 buckets
    println(f"${"H"}%8s ${"mode"}%10s ${"sh_pairs"}%12s ${"wall_s"}%8s")
    for (h <- sizes) {
      val hot = base
        .withColumn("source", lit("s0"))
        .unionByName(
          spark.range(h.toLong)
            .select((col("id") + 3000000L).as("doc_id"))
            .crossJoin(seed)
            .select(col("doc_id"), col("text"), lit("s0").as("source")))
        .localCheckpoint(true)
      for ((mode, cap) <- Seq("uncapped" -> 0, "star" -> 8)) {
        val t0 = System.nanoTime()
        val n = Dedup.simhashPairs(hot, maxDocsPerSegment = cap).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$h%8d $mode%10s $n%12d $wall%8.2f")
        Dedup.unpersistAll()
      }
    }

    // the SEMANTIC twin: an identical-embedding spike (the
    // broken-encoder shape) collapses into one cluster; uncapped,
    // SemDeDup's within-cluster join pays H²/2 full-width cosine
    // comparisons there — wall is the observable (the operator
    // returns decisions, not pairs). At H > 49 some planted ids land
    // on % 50 seed slots (identical seed vectors — degenerate
    // duplicate centroids), unlike the hotEmbCorpus fixture, which
    // requires a seedless spike; here both modes share whatever
    // clustering results, so the capped-vs-uncapped comparison (and
    // the decision-equality readout) stays valid
    println(f"${"H"}%8s ${"mode"}%10s ${"decisions"}%12s ${"wall_s"}%8s")
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").localCheckpoint(true)
    val embSeed = emb.orderBy("vec_id").limit(1).select("embedding")
    for (h <- sizes) {
      val hot = emb.unionByName(
        spark.range(h.toLong)
          .select((col("id") + 300001L).as("vec_id"))
          .crossJoin(embSeed)
          .select("vec_id", "embedding"))
        .localCheckpoint(true)
      for ((mode, cap) <- Seq("uncapped" -> 0, "star" -> 8)) {
        val t0 = System.nanoTime()
        val n = graft.operators.Dedup
          .semanticDedup(hot, maxVecsPerCluster = cap).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$h%8d $mode%10s $n%12d $wall%8.2f")
        Dedup.unpersistAll()
      }
    }

    // the STEADY-STATE shape: the corpus signature state accumulates
    // 512 more template copies per ingest while a FIXED 8-copy batch
    // probes it — uncapped, the per-ingest probe bill grows with the
    // accumulated hot mass; capped, it stays at 8 × cap representatives
    println(f"${"ingest"}%8s ${"mode"}%10s ${"probe_pairs"}%12s ${"wall_s"}%8s")
    val probeB = spark.range(8L)
      .select((col("id") + 5000000L).as("doc_id"))
      .crossJoin(seed).select("doc_id", "text")
    val probeSigs = Dedup.signatureTable(probeB).localCheckpoint(true)
    Dedup.unpersistAll()
    for ((mode, cap) <- Seq("uncapped" -> 0, "capped" -> 8)) {
      var stateSigs = Dedup.signatureTable(base).localCheckpoint(true)
      Dedup.unpersistAll()
      for (i <- 1 to 8) {
        val arriving = spark.range(512L)
          .select((col("id") + 3000000L + i * 100000L).as("doc_id"))
          .crossJoin(seed).select("doc_id", "text")
        val arrivingSigs = Dedup.signatureTable(arriving).localCheckpoint(true)
        Dedup.unpersistAll()
        stateSigs = stateSigs.unionByName(arrivingSigs).localCheckpoint(true)
        val t0 = System.nanoTime()
        val n = Dedup.minhashPairsAgainstSignatures(
          probeSigs, stateSigs, maxCorpusDocsPerBand = cap).count()
        val wall = (System.nanoTime() - t0) / 1e9
        if (i == 1 || i == 4 || i == 8)
          println(f"$i%8d $mode%10s $n%12d $wall%8.2f")
        Dedup.unpersistAll()
      }
    }

    // the INGEST shape: a fixed 8-copy template batch probed against
    // a corpus whose hot group grows. Uncapped verified pairs per
    // batch = 8 × (H + natural), capped = 8 × (union of per-bucket
    // representative slices) — O(cap), corpus-independent.
    println(f"${"H"}%8s ${"mode"}%10s ${"probe_pairs"}%12s ${"wall_s"}%8s")
    val batch = spark.range(8L)
      .select((col("id") + 4000000L).as("doc_id"))
      .crossJoin(seed).select("doc_id", "text")
      .localCheckpoint(true)
    for (h <- sizes) {
      val corpus = base.unionByName(
        spark.range(h.toLong)
          .select((col("id") + 3000000L).as("doc_id"))
          .crossJoin(seed)
          .select("doc_id", "text"))
        .localCheckpoint(true)
      for ((mode, cap) <- Seq("uncapped" -> 0, "capped" -> 8)) {
        val t0 = System.nanoTime()
        val n = Dedup.minhashPairsAgainst(batch, corpus, maxCorpusDocsPerBand = cap).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$h%8d $mode%10s $n%12d $wall%8.2f")
        Dedup.unpersistAll()
      }
    }
  }
}
