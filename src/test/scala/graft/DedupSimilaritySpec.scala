package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SimilaritySearch, TextAnalysis}
import graft.sources.{Corpus, Tables}

/** Quality properties the DuckDB oracle can't express: recall of the
  * planted duplicates/near-duplicates and ANN-vs-brute agreement.
  * Runs on sf0.001 (500 docs / 500 vectors).
  */
class DedupSimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val corpus = Corpus.docCorpus(spark, dir).cache()

  test("exact dedup finds every planted exact copy and nothing else") {
    val d = Dedup.exact(corpus).cache()
    val dups = d.filter("n_copies > 1")
    // ids ≡ 0 (mod 7) in 0..499 are copied exactly once
    assert(dups.count() == Math.ceil(500.0 / 7).toLong)
    assert(dups.filter("n_copies != 2").count() == 0)
    assert(d.count() > 500) // near-dup variants stay distinct
  }

  test("ngram Jaccard: exact copies score 1e6; planted near-dups score high") {
    val p = Dedup.ngramJaccardPairs(corpus).cache()
    val exactPairs = p.filter("doc_b = doc_a + 1000000 AND jaccard_ppm = 1000000")
    assert(exactPairs.count() == Math.ceil(500.0 / 7).toLong)
    val nearPairs = p.filter("doc_a < 500 AND doc_b = doc_a + 2000000")
    assert(nearPairs.count() == Math.ceil(500.0 / 11).toLong)
    // a 4-token tail on a short doc can drag Jaccard down toward ~0.5
    assert(nearPairs.filter("jaccard_ppm < 400000").count() == 0)
  }

  test("repeated spans ≡ quadratic naive maximal-run sweep; planted corpus pairs found") {
    import spark.implicits._
    val k = 4
    // deterministic small-vocab docs — natural cross-doc repeats are
    // LIKELY at vocab 10, which is the point: the naive O(n²) sweep is
    // ground truth for everything, planted or accidental (the
    // ngramJaccard verifier precedent)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa")
    def tok(seed: Int, n: Int): Vector[String] =
      Vector.tabulate(n)(i => vocab(math.abs((seed * 31 + i * 17) ^ (i * i * 7)) % vocab.size))
    val base = (0 until 8).map(d => d.toLong -> tok(d + 1, 30)).toMap
    val planted = base
      .updated(1L, base(1L) ++ base(2L).take(6)) // (1,2): 6-token span at the seam
      .updated(3L, base(3L).patch(5, base(4L).slice(10, 20), 10)) // (3,4): 10-token mid-doc
    val docs = planted.toSeq
      .map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpanPairs(docs, minTokens = k, maxDocsPerShingle = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val arr = planted.toSeq.sortBy(_._1)
    val want = (for {
      i <- arr.indices
      j <- arr.indices
      if arr(i)._1 < arr(j)._1
      (a, ta) = arr(i)
      (b, tb) = arr(j)
      pa <- ta.indices
      pb <- tb.indices
      // a maximal run starts where the previous tokens differ (or at a boundary)
      if pa == 0 || pb == 0 || ta(pa - 1) != tb(pb - 1)
      run = Iterator.from(0)
        .takeWhile(o => pa + o < ta.size && pb + o < tb.size && ta(pa + o) == tb(pb + o))
        .size
      if run >= k
    } yield (a, b, pa.toLong, pb.toLong, run.toLong)).toSet
    assert(got == want, s"operator vs naive: extra=${got -- want} missing=${want -- got}")
    Dedup.unpersistAll()
    // and on the real planted corpus: every (13m, 13m+1) pair carries
    // its ≥10-token span
    val spans = Dedup
      .repeatedSpanPairs(Corpus.spanCorpus(spark, "/root/testdata/sf0.001"), minTokens = 10)
      .cache()
    val plantedPairs = spans.filter("doc_b = doc_a + 1 AND doc_a % 13 = 0")
    assert(plantedPairs.count() >= 30, s"planted pairs: ${plantedPairs.count()}")
    assert(plantedPairs.filter("span_tokens >= 10").count() == plantedPairs.count())
    spans.unpersist()
    Dedup.unpersistAll()
  }

  test("incremental spans: batch probes the corpus shingle table; roles, self-match, cap") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 ca cb"),
      (11L, "d0 d1 d2 d3 d4 d5")).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "x0 x1 c2 c3 c4 c5 c6 c7 c8 c9 y0"), // copies corpus 10's tokens 2..9
      (21L, "z0 z1 z2 z3 z4 z5 z6 z7")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpansAgainstShingles(
      Dedup.shingleTable(batch, minTokens = 4),
      Dedup.shingleTable(corpus, minTokens = 4),
      minTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // doc_a = CORPUS id, doc_b = BATCH id, regardless of id ordering
    assert(spans == Set((10L, 20L, 2L, 2L, 8L)))
    Dedup.unpersistAll()
    // a doc on both sides matches itself full-length (caller-filter
    // contract, same as minhashPairsAgainst)
    val self = Dedup.repeatedSpansAgainstShingles(
      Dedup.shingleTable(corpus, minTokens = 4),
      Dedup.shingleTable(corpus, minTokens = 4),
      minTokens = 4)
    assert(self.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet ==
      Set((10L, 10L, 12L), (11L, 11L, 6L)))
    Dedup.unpersistAll()
    // hot-shingle cap counts CORPUS docs: a phrase in > cap corpus
    // docs emits nothing (bounded fan-out)
    val hot = (1L to 5L).map(i => (100L + i, "h0 h1 h2 h3 h4")).toDF("doc_id", "text")
    val probe = Seq((200L, "h0 h1 h2 h3 h4")).toDF("doc_id", "text")
    val capped = Dedup.repeatedSpansAgainstShingles(
      Dedup.shingleTable(probe, minTokens = 4),
      Dedup.shingleTable(hot, minTokens = 4),
      minTokens = 4, maxDocsPerShingle = 4)
    assert(capped.isEmpty)
    Dedup.unpersistAll()
    // a k/minTokens mismatch would silently shift every span_tokens by
    // the difference — the k stamped on the table (parquet-durable
    // column metadata) makes it fail loudly instead
    val corpusAt4 = Dedup.shingleTable(corpus, minTokens = 4)
    val dir = java.nio.file.Files.createTempDirectory("shingles").toString + "/t"
    corpusAt4.write.parquet(dir) // metadata must survive the round trip
    val reloaded = spark.read.parquet(dir)
    val mism = intercept[IllegalArgumentException] {
      Dedup.repeatedSpansAgainstShingles(
        Dedup.shingleTable(batch, minTokens = 5), reloaded, minTokens = 5)
    }
    assert(mism.getMessage.contains("built at k=4"), mism.getMessage)
    Dedup.unpersistAll()
  }

  test("PQ: m codes per vector from the codebook domain; refined ranks the ADC shortlist by exact L2") {
    import org.apache.spark.sql.functions.{broadcast, col, countDistinct, expr, lit}
    val emb = Tables.embeddings(spark, dir)
    val m = 8 // sf0.001 is tiny — smaller m keeps subspace codebooks meaningful
    val cb = SimilaritySearch.pqFit(emb, m = m, seedMod = 20)
    val codes = SimilaritySearch.pqEncode(emb, cb).localCheckpoint(true)
    // exactly m codes per vector, each from its subspace's codebook
    val n = emb.count()
    assert(codes.count() == n * m)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= m).isEmpty)
    assert(codes.join(
      cb.centroids.select(col("s"), col("cid").as("code")), Seq("s", "code"), "left_anti")
      .isEmpty, "every code must name a live sub-centroid")
    // the fit is deterministic: a second fit yields the same codebook
    val cb2 = SimilaritySearch.pqFit(emb, m = m, seedMod = 20)
    assert(cb.centroids.exceptAll(cb2.centroids).isEmpty &&
      cb2.centroids.exceptAll(cb.centroids).isEmpty)
    // refined output ⊆ the ADC shortlist, ranked by exact L2 (rank 1
    // carries the minimal l2_ppm per query)
    val short = SimilaritySearch.pqTopK(emb, cb, codes, k = 20)
      .select(col("query_id").as("s_qid"), col("cand_id").as("s_cid"))
    val ref = SimilaritySearch.pqTopKRefined(emb, cb, codes, k = 5, shortlist = 20)
      .localCheckpoint(true)
    assert(ref.join(broadcast(short),
      ref("query_id") === col("s_qid") && ref("cand_id") === col("s_cid"), "left_anti")
      .isEmpty, "refined candidates must come from the ADC shortlist")
    val notMonotone = ref.as("a").join(ref.as("b"),
      col("a.query_id") === col("b.query_id") && col("a.rank") < col("b.rank"))
      .filter(col("a.l2_ppm") > col("b.l2_ppm"))
    assert(notMonotone.isEmpty, "refined rank must be non-decreasing in exact L2")
  }

  test("IVFADC: candidates confined to the probed lists; all-lists probe ≡ the full ADC scan") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val (m, seedMod) = (8, 20)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // degenerate pruning: probing EVERY list reproduces the full ADC
    // scan exactly (same codebooks, same fixed-order sum)
    val full = rows(SimilaritySearch.pqAdcTopK(emb, m = m, seedMod = seedMod))
    val allLists = rows(
      SimilaritySearch.ivfPqTopK(emb, m = m, seedMod = seedMod, nprobe = 1000000))
    assert(allLists == full, "probing every list must equal the full ADC scan")
    // real pruning: every returned candidate lives in one of its
    // query's nprobe nearest coarse lists (recomputed independently
    // with the probe's own tie order)
    graft.functions.VecDot.register(spark)
    val index = SimilaritySearch.buildIndex(emb, centroidMod = 50)
    val byD = org.apache.spark.sql.expressions.Window
      .partitionBy("vid").orderBy(col("d"), col("cid"))
    val qLists = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("vid"), col("embedding"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("d", expr(graft.functions.VectorExprs.l2sqSpark("embedding", "cemb")))
      .withColumn("rn", row_number().over(byD))
      .filter(col("rn") <= 2)
      .select(col("vid").as("query_id"), col("cid"))
    val allowed = qLists
      .join(index.assignments.select(col("cand_id"), col("cid")), Seq("cid"))
      .select("query_id", "cand_id")
    val res = SimilaritySearch.ivfPqTopK(emb, m = m, seedMod = seedMod, nprobe = 2)
      .localCheckpoint(true)
    assert(res.count() > 0)
    assert(res.join(allowed, Seq("query_id", "cand_id"), "left_anti").isEmpty,
      "every IVFADC candidate must come from its query's probed lists")

    // the RESIDUAL variant (faiss's default IVFADC): same pruning
    // contract — candidates confined to probed lists — plus per-query
    // top-k shape and bitwise determinism (the residual float
    // rounding and the per-(query, list) ADC tables are all
    // deterministic algebra, so two runs must agree exactly)
    val resid = SimilaritySearch
      .ivfPqResidualTopK(emb, m = m, seedMod = seedMod, nprobe = 2)
      .localCheckpoint(true)
    assert(resid.count() > 0)
    assert(resid.join(allowed, Seq("query_id", "cand_id"), "left_anti").isEmpty,
      "every residual-IVFADC candidate must come from its query's probed lists")
    val shapes = resid.groupBy("query_id").agg(
      count(lit(1)).as("n"),
      max(col("rank")).as("mx"),
      min(col("rank")).as("mn"))
    assert(shapes.filter(
      col("mx") =!= col("n") || col("mn") =!= 1 || col("n") > 5).isEmpty,
      "ranks must be contiguous 1..n with n <= k per query")
    assert(rows(SimilaritySearch.ivfPqResidualTopK(
      emb, m = m, seedMod = seedMod, nprobe = 2)) == rows(resid))
  }

  test("streamed span fold ≡ one-shot exactly until a shingle crosses the cap mid-stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, greatest, least}
    // the q_stream_span_ingest equivalence precondition, DEMONSTRATED
    // at its boundary: 6 docs share one 4-token phrase, arriving as
    // two 3-doc batches. With cap ≥ 6 the streamed union reproduces
    // the one-shot self-join exactly; with cap 4 the one-shot
    // suppresses the shingle (6 docs > cap) while each probe's
    // VISIBLE subset stays under cap and still emits — the divergence
    // is precisely the boilerplate-cap case the query doc calls out
    val mk = (ids: Seq[Long]) => ids.map(i => (i, "p0 p1 p2 p3")).toDF("doc_id", "text")
    val b1 = mk(Seq(1L, 2L, 3L))
    val b2 = mk(Seq(4L, 5L, 6L))
    val all = b1.unionByName(b2)
    def fold(cap: Int): Set[(Long, Long)] = {
      val s1 = Dedup.shingleTable(b1, minTokens = 4).localCheckpoint(true)
      val s2 = Dedup.shingleTable(b2, minTokens = 4).localCheckpoint(true)
      Dedup.unpersistAll()
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val within1 = pairs(Dedup.repeatedSpansAgainstShingles(s1, s1, 4, cap))
      val within2 = pairs(Dedup.repeatedSpansAgainstShingles(s2, s2, 4, cap))
      val cross = Dedup.repeatedSpansAgainstShingles(s2, s1, 4, cap)
        .select(
          least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      (within1 ++ within2 ++ cross).toSet
    }
    def oneShot(cap: Int): Set[(Long, Long)] =
      Dedup.repeatedSpanPairs(all, minTokens = 4, maxDocsPerShingle = cap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = (for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b)).toSet
    // under the precondition (corpus-wide count ≤ cap): exact equality
    assert(oneShot(6) == allPairs && fold(6) == allPairs)
    // over it: the one-shot suppresses, the fold's subsets still emit
    assert(oneShot(4).isEmpty)
    assert(fold(4) == allPairs)
    Dedup.unpersistAll()
  }

  test("span coverage merges overlapping intervals and never double-counts") {
    import spark.implicits._
    // hand fixture: doc 1 with two OVERLAPPING spans [0,6) and [4,10)
    // (union 10, sum 12 — the merge is the point), doc 2 with disjoint
    // [0,4) and [8,12), doc 3 span-free
    val docs = Seq(
      (1L, (0 until 20).map(i => s"w$i").mkString(" ")),
      (2L, (0 until 16).map(i => s"v$i").mkString(" ")),
      (3L, "x y z")).toDF("doc_id", "text")
    // doc 1's [0,6) span appears TWICE (two partners) — the duplicate
    // interval that used to tie under the window ORDER BY and split
    // nondeterministically into its own island, double-counting
    val spans = Seq(
      (1L, 8L, 0L, 0L, 6L),
      (1L, 9L, 0L, 0L, 6L),
      (1L, 9L, 4L, 10L, 6L),
      (2L, 9L, 0L, 20L, 4L),
      (2L, 9L, 8L, 30L, 4L)).toDF("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    val cov = Dedup.repeatedSpanCoverage(docs, spans, maxCoveragePpm = 400000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(cov(1L) == ((20L, 10L, 500000L, "drop"))) // union of overlaps, not 12
    assert(cov(2L) == ((16L, 8L, 500000L, "drop")))
    assert(cov(3L) == ((3L, 0L, 0L, "keep")))
    // real corpus: coverage bounded by the doc and raw docs read 0
    val corpus = Corpus.spanCorpus(spark, "/root/testdata/sf0.001")
    val real = Dedup.repeatedSpanCoverage(
      corpus, Dedup.repeatedSpanPairs(corpus, minTokens = 10)).cache()
    assert(real.filter("covered_tokens > n_tokens").isEmpty)
    assert(real.filter("doc_id % 13 = 0 AND covered_tokens >= 10").count() >= 30)
    real.unpersist()
    Dedup.unpersistAll()
  }

  test("span removal cuts the later occurrence's tokens exactly, leaves everything else alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "p q  a b c d  r"), // odd spacing: must survive UNTOUCHED byte-identical
      (3L, "x y z")).toDF("doc_id", "text")
    // pair (1,2) shares [a b c d]: doc 1 at 0..4, doc 2 at 2..6 —
    // keep-first removes from doc 2 (the later doc) only
    val spans = Seq((1L, 2L, 0L, 2L, 4L))
      .toDF("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    val out = Dedup.removeRepeatedSpans(docs, spans).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b c d e f g h", 0L))) // doc_a role: untouched
    assert(out(2L) == (("p q r", 4L))) // tokens 2-5 cut, whitespace normalized
    assert(out(3L) == (("x y z", 0L)))
    // untouched docs keep their original bytes (doc 2 only normalizes
    // BECAUSE it was rebuilt; doc 1/3 never were) — now prove it with
    // the odd-spaced doc in the untouched role
    val spans2 = Seq((1L, 3L, 0L, 0L, 2L))
      .toDF("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    val out2 = Dedup.removeRepeatedSpans(docs, spans2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(2L) == "p q  a b c d  r") // byte-identical passthrough
    assert(out2(3L) == "z")
    // real corpus: every planted later-doc (13m+1) loses its copied
    // prefix; clean token count = original - removed, globally
    val corpus = Corpus.spanCorpus(spark, "/root/testdata/sf0.001")
    val cleaned = Dedup.removeRepeatedSpans(
      corpus, Dedup.repeatedSpanPairs(corpus, minTokens = 10)).cache()
    val check = cleaned
      .join(corpus.withColumnRenamed("text", "orig"), Seq("doc_id"))
      .selectExpr(
        "size(split(trim(orig), '\\\\s+')) - " +
          "(CASE WHEN length(trim(clean_text)) = 0 THEN 0 " +
          " ELSE size(split(trim(clean_text), '\\\\s+')) END) AS lost",
        "n_tokens_removed")
    assert(check.filter("lost != n_tokens_removed").isEmpty)
    assert(cleaned.filter("doc_id % 13 = 1 AND n_tokens_removed >= 10").count() >= 25)
    cleaned.unpersist()
    Dedup.unpersistAll()
  }

  test("MinHash-LSH recovers planted pairs with full-signature agreement on exact copies") {
    val p = Dedup.minhashPairs(corpus).cache()
    // doc_a < 500: ids ≡ 0 (mod 77) also pair an exact copy with a
    // near-dup at the same id distance, which can tie at full agreement
    val exactPairs = p.filter(s"doc_a < 500 AND doc_b = doc_a + 1000000 AND n_agree = 32")
    assert(exactPairs.count() == Math.ceil(500.0 / 7).toLong)
    // near-dups: LSH banding is probabilistic — expect most planted
    // pairs recovered at est-Jaccard ≥ 0.5
    val near = p.filter("doc_b = doc_a + 2000000").count()
    assert(near >= Math.ceil(500.0 / 11).toLong * 8 / 10, s"minhash near-dup recall too low: $near")
  }

  test("hot-band star: subset of uncapped pairs, identical-copy components intact, |group|−1 edges") {
    import org.apache.spark.sql.functions._
    val hot = Corpus.hotCorpus(spark, dir).cache()
    val capped = Dedup.minhashPairs(hot, maxDocsPerBand = 8).cache()
    val uncapped = Dedup.minhashPairs(hot).cache()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cs = pairSet(capped)
    val us = pairSet(uncapped)
    // every star edge (bucket-min, member) is also an uncapped
    // candidate of the same bucket, verified by the same n_agree gate
    assert(cs.subsetOf(us), s"capped pairs must be a subset; extra: ${(cs -- us).take(5)}")
    // the identical-copy hub: doc 0, its +1M exact copy, and the 40
    // planted 3M+ copies share every band bucket (identical sigs) —
    // the capped form emits exactly the 41 star edges from hub 0 at
    // full agreement, where uncapped pays C(42,2) = 861
    val hotIds = (Set(0L, 1000000L) ++ (0 until 40).map(g => 3000000L + g)).toSet
    val hotCapped = cs.filter { case (a, b) => hotIds(a) && hotIds(b) }
    val hotUncapped = us.filter { case (a, b) => hotIds(a) && hotIds(b) }
    assert(hotCapped == hotIds.filter(_ != 0L).map(m => (0L, m)),
      s"hot group must reduce to the 41-edge star on doc 0; got ${hotCapped.size}")
    assert(hotUncapped.size == 42 * 41 / 2, s"uncapped control: ${hotUncapped.size}")
    assert(capped.filter(col("doc_a") === 0L && col("doc_b") >= 3000000L)
      .filter(col("n_agree") =!= 32L).count() == 0, "identical copies verify at full agreement")
    // clusters are what dedup consumes: the identical-copy component
    // survives the star reduction byte-identically
    def hubComponent(pairs: org.apache.spark.sql.DataFrame) =
      graft.operators.ConnectedComponents.labelPropagate(pairs, "doc_a", "doc_b")
        .filter(col("component") === 0L).select("node")
        .collect().map(_.getLong(0)).toSet
    assert(hubComponent(capped).intersect(hotIds) == hubComponent(uncapped).intersect(hotIds),
      "identical-copy membership of component 0 must match")
  }

  test("hotBucketReport: the planted template owns the top band buckets; generic over states") {
    val hot = Corpus.hotCorpus(spark, dir)
    val rep = Dedup.hotBandReport(hot, k = 10).collect()
    assert(rep.length == 10)
    // the 42 identical members (seed, +1M copy, 40 planted) land in
    // ONE bucket per band — 8 bands, so the top 8 rows are theirs
    assert(rep.take(8).forall(_.getLong(2) >= 42L),
      s"top-8 counts: ${rep.take(8).map(_.getLong(2)).toSeq}")
    assert(rep(8).getLong(2) < 42L, "rank 9 must be a natural bucket")
    val counts = rep.map(_.getLong(2)).toSeq
    assert(counts == counts.sortBy(-_), "largest first")
    // the same verb reads cluster sizes off a built index's
    // assignments — the semantic star's dial-setting view
    val sizes = Dedup.hotBucketReport(
      graft.operators.SimilaritySearch
        .buildIndex(Corpus.hotEmbCorpus(spark, dir)).assignments,
      Seq("cid"), k = 3).collect()
    assert(sizes.head.getLong(1) >= 41L,
      s"the spike's cluster must top the report: ${sizes.map(_.getLong(1)).toSeq}")
    Dedup.unpersistAll()
  }

  test("hot-band boundary: a bucket at the cap stays all-pairs; one past the cap goes star") {
    import spark.implicits._
    // k identical docs: one bucket of size k in every band
    def group(k: Int) = (0 until k)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val k = 5
    val atCap = Dedup.minhashPairs(group(k), maxDocsPerBand = k)
    assert(atCap.count() == k.toLong * (k - 1) / 2, "nd == cap must keep all-pairs")
    val pastCap = Dedup.minhashPairs(group(k), maxDocsPerBand = k - 1).collect()
    assert(pastCap.length == k - 1 && pastCap.forall(r => r.getLong(0) == 0L),
      "nd == cap+1 must star onto the bucket min")
  }

  test("band tuning: narrower bands yield a candidate superset (the recall dial)") {
    // contiguous band layout ⇒ a w-wide agreeing band contains
    // agreeing halves, so halving rowsPerBand can only ADD candidates
    def cand(bands: Int, rpb: Int) = Dedup
      .minhashPairs(corpus, minAgree = 0, bands = bands, rowsPerBand = rpb)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val coarse = cand(4, 8)
    val default = cand(8, 4)
    val fine = cand(16, 2)
    assert(coarse.subsetOf(default), "8-wide candidates must survive 4-wide banding")
    assert(default.subsetOf(fine), "4-wide candidates must survive 2-wide banding")
    // and the dial actually moves: finer banding finds strictly more
    // at this corpus' similarity spread
    assert(fine.size > default.size && default.size > coarse.size,
      s"sizes ${coarse.size} / ${default.size} / ${fine.size}")
    // oversubscribing the signature is rejected
    intercept[IllegalArgumentException] {
      Dedup.minhashPairs(corpus, bands = 16, rowsPerBand = 4)
    }
  }

  test("hot-segment star: subset of uncapped, Hamming-0 hub exact, boundary at the cap") {
    import org.apache.spark.sql.functions._
    val hot = Corpus.hotCorpus(spark, dir).cache()
    val capped = Dedup.simhashPairs(hot, maxDocsPerSegment = 8).cache()
    val uncapped = Dedup.simhashPairs(hot).cache()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cs = pairSet(capped)
    val us = pairSet(uncapped)
    assert(cs.subsetOf(us), s"extra capped pairs: ${(cs -- us).take(5)}")
    // the 42 fingerprint-identical members (seed, +1M copy, 40 hot
    // copies — all one source block) flood every segment bucket:
    // capped keeps exactly the star on the seed at Hamming 0
    val hotIds = (Set(0L, 1000000L) ++ (0 until 40).map(g => 3000000L + g)).toSet
    val hotCapped = cs.filter { case (a, b) => hotIds(a) && hotIds(b) }
    assert(hotCapped == hotIds.filter(_ != 0L).map(m => (0L, m)),
      s"hot group must star on doc 0: ${hotCapped.size}")
    assert(capped.filter(col("doc_a") === 0L && col("doc_b") >= 3000000L)
      .filter(col("hamming") =!= 0L).count() == 0)
    assert(us.count { case (a, b) => hotIds(a) && hotIds(b) } == 42 * 41 / 2)
    // cap boundary on a synthetic fingerprint-identical group
    import spark.implicits._
    def group(k: Int) = (0 until k)
      .map(i => (i.toLong, "s0", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "source", "text")
    assert(Dedup.simhashPairs(group(5), maxDocsPerSegment = 5).count() == 10L,
      "nd == cap keeps all-pairs")
    val star = Dedup.simhashPairs(group(5), maxDocsPerSegment = 4).collect()
    assert(star.length == 4 && star.forall(_.getLong(0) == 0L),
      "nd == cap+1 stars onto the min")
    // the reference quadratic form has no buckets to cap
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(group(5), pigeonhole = false, maxDocsPerSegment = 4)
    }
  }

  test("SimHash: exact copies at Hamming 0") {
    val p = Dedup.simhashPairs(corpus).cache()
    // exact copies share source block and fingerprint; restrict doc_a to
    // originals — ids ≡ 0 (mod 77) also plant an (exact-copy, near-dup)
    // pair at the same id distance
    assert(p.filter("doc_a < 500 AND doc_b = doc_a + 1000000 AND hamming = 0").count() ==
      Math.ceil(500.0 / 7).toLong)
  }

  test("SimHash pigeonhole candidates are lossless vs the all-pairs reference") {
    // the pigeonhole bound must hold at any maxHamming, including ones
    // with uneven segment widths (30 bits / 3, 5, 8 segments)
    for (k <- Seq(2, 4, 7)) {
      def pairs(pigeonhole: Boolean): Set[(Long, Long, Long)] =
        Dedup.simhashPairs(corpus, maxHamming = k, pigeonhole = pigeonhole)
          .collect()
          .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
          .toSet
      val blocked = pairs(pigeonhole = true)
      val allPairs = pairs(pigeonhole = false)
      assert(blocked == allPairs, s"maxHamming=$k: pigeonhole diverged from all-pairs")
      assert(blocked.nonEmpty, s"maxHamming=$k produced no pairs — vacuous comparison")
    }
  }

  test("embedding near-dup pairs = exactly the planted scaled copies") {
    val p = Dedup.embeddingPairs(Corpus.embCorpus(spark, dir))
    val rows = p.collect()
    assert(rows.length == Math.ceil(500.0 / 17).toLong)
    assert(rows.forall(r => r.getAs[Long]("vec_b") == r.getAs[Long]("vec_a") + 100000L))
    assert(rows.forall(_.getAs[Long]("cos_ppm") >= 999000L))
  }

  test("IVF ANN: probing all lists ≡ brute force; nprobe=2 trades recall for 5× fewer scans") {
    val emb = Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val brute = pairs(SimilaritySearch.bruteTopK(emb))
    assert(brute.nonEmpty)
    // invariant: probing every centroid list recovers the exact answer
    val full = pairs(SimilaritySearch.ivfTopK(emb, nprobe = Int.MaxValue))
    assert(full == brute)
    // nprobe=2 of 10 lists over *random* vectors: recall is modest at
    // this toy scale (real corpora cluster; these don't) — sanity-bound it
    val ivf = pairs(SimilaritySearch.ivfTopK(emb))
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall vs brute force = $recall")
    assert(ivf.size == brute.size)
  }

  test("language ID labels every doc with one of the five languages") {
    val l = TextAnalysis.langId(Tables.documents(spark, dir))
    assert(l.filter("lang_pred NOT IN ('en','de','es','fr','zh')").count() == 0)
  }

  test("fingerprint is injective on the distinct-text corpus (no collisions at this scale)") {
    val fp = TextAnalysis.fingerprint(Tables.documents(spark, dir))
    assert(fp.select("fingerprint").distinct().count() == fp.count())
  }

  test("paragraph dedup: first occurrence wins, blanks are structure, docs reassemble") {
    import spark.implicits._
    val docs = Seq(
      // doc 1: "header" repeats inside the doc (intra-doc drop), a
      // blank line sits between (structural, kept)
      (1L, "header\n\nbody one\nheader"),
      // doc 2: its "header" is a later corpus-wide occurrence (drops);
      // "  HEADER  " normalizes to the same key (case+trim) and drops;
      // whitespace-only line kept
      (2L, "header\nbody two\n  HEADER  \n \nunique tail"),
      (3L, "")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_paras") == 4 && out(0).getAs[Long]("n_kept") == 3)
    assert(out(0).getAs[String]("text_deduped") == "header\n\nbody one")
    assert(out(1).getAs[Long]("n_paras") == 5 && out(1).getAs[Long]("n_kept") == 3)
    assert(out(1).getAs[String]("text_deduped") == "body two\n \nunique tail")
    // empty doc: one structural empty paragraph, kept, rebuilt as ""
    assert(out(2).getAs[Long]("n_paras") == 1 && out(2).getAs[Long]("n_kept") == 1)
    assert(out(2).getAs[String]("text_deduped") == "")
  }

  test("fingerprint paragraph dedup equals the text-keyed form, hot key included, collision check armed") {
    import spark.implicits._
    // one Zipf-head key owns half the line rows (the shape the window
    // form can't split); case variants normalize to the same key, so
    // the fingerprint must hash the NORMALIZED line
    val docs = (1L to 40L).map(i =>
      (i, s"unique line $i\nAll Rights Reserved.\nbody $i\nall rights reserved.\n"))
      .toDF("doc_id", "text")
    val win = Dedup.paragraphDedup(docs)
    val fp = Dedup.paragraphDedup(docs, byFingerprint = true, collisionCheck = true)
    assert(fp.except(win).isEmpty && win.except(fp).isEmpty,
      "fingerprint form must keep exactly the text-keyed set")
    // the hot key survives exactly once corpus-wide
    val kept = fp.agg(org.apache.spark.sql.functions.sum("n_kept")).collect()(0).getLong(0)
    assert(kept == 40 * 2 + 1 + 40, // unique+body per doc, 1 hot survivor, 40 trailing blanks
      s"unexpected kept-line count $kept")
  }

  test("paragraph dedup on the planted corpus: the appended copy wins, the partner's line 0 drops") {
    val res = Dedup.paragraphDedup(Corpus.paraCorpus(spark, dir)).cache()
    // the GLOBAL invariant: after dedup no normalized non-blank line
    // key survives twice anywhere in the rebuilt corpus (planted
    // cross-doc copies, intra-doc repeats, and the word-salad's
    // natural short-line collisions all collapse to one occurrence)
    import org.apache.spark.sql.functions._
    val survivors = res.select(
      explode(split(col("text_deduped"), "\n", -1)).as("line"))
      .filter(trim(col("line")) =!= "")
      .groupBy(lower(trim(col("line")))).count()
    assert(survivors.filter("count > 1").count() == 0)
    // every partner doc 13m+1 loses at least its first line — the
    // appended copy in doc 13m precedes it in (doc_id, pos) order
    val partners = res.filter("doc_id % 13 = 1 AND doc_id > 0 AND doc_id <= 499")
    assert(partners.count() > 0)
    assert(partners.filter("n_kept = n_paras").count() == 0)
    res.unpersist()
  }

  test("paragraph ingest fold equals the arrival-order replay, not the id-order one-shot") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val corpus = Corpus.paraCorpus(spark, dir).select("doc_id", "text").localCheckpoint(true)
    // manual 4-slice fold through the ingest step (the streaming
    // path's semantics, minus the stream harness the driver oracle
    // already exercises end-to-end)
    var state = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("pk1", LongType),
        StructField("pk2", LongType)))).localCheckpoint(true)
    var outs = Dedup.paragraphDedup(corpus.limit(0)).localCheckpoint(true)
    for (i <- 0 until 4) {
      val batch = corpus.filter(pmod(col("doc_id"), lit(4)) === i).localCheckpoint(true)
      val (rebuilt, keys) = Dedup.paragraphIngestStep(batch, state)
      state = state.unionByName(keys.select("pk1", "pk2").localCheckpoint(true))
      outs = outs.unionByName(rebuilt).localCheckpoint(true)
      Dedup.unpersistAll()
    }
    // in-engine arrival-order replay twin: ONE window ordered by
    // (slice, doc_id, pos)
    import org.apache.spark.sql.expressions.Window
    val parts = corpus.select(
      col("doc_id"),
      posexplode(split(coalesce(col("text"), lit("")), "\n", -1)).as(Seq("pos", "para")))
    val w = Window.partitionBy(lower(trim(col("para"))))
      .orderBy(pmod(col("doc_id"), lit(4)), col("doc_id"), col("pos"))
    val marked = parts.withColumn("keep",
      when(trim(col("para")) === "", lit(true))
        .otherwise(row_number().over(w) === 1))
    val replay = marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_paras"),
      sum(col("keep").cast("long")).as("n_kept"),
      concat_ws("\n", transform(
        array_sort(collect_list(when(col("keep"), struct(col("pos"), col("para"))))),
        e => e("para"))).as("text_deduped"))
    assert(outs.except(replay).isEmpty && replay.except(outs).isEmpty,
      "fold must equal the arrival-order replay exactly")
    // and arrival order genuinely differs from (doc_id, pos) order:
    // a planted pair whose partner's slice precedes the appender's
    // swaps its winner — the oracle is not vacuously the one-shot
    val oneShot = Dedup.paragraphDedup(corpus)
    assert(replay.except(oneShot).count() > 0,
      "slice order must visibly reorder at least one planted pair")
  }

  test("semantic dedup top-2 assignment: candidates only grow, decisions stay total with one keeper per component") {
    import org.apache.spark.sql.functions._
    val corpus = Corpus.embCorpus(spark, dir)
    val n = corpus.count()
    val base = Dedup.semanticDedup(corpus).cache()
    val top2 = Dedup.semanticDedup(corpus, assignTop = 2).cache()
    // totality holds under multi-assignment: one decision row per
    // vector, primary cid unchanged
    assert(top2.count() == n && top2.select("vec_id").distinct().count() == n)
    assert(top2.select("vec_id", "cid").except(base.select("vec_id", "cid")).isEmpty,
      "multi-assignment must not change the PRIMARY cluster assignment")
    // extra candidates can only merge components → never fewer drops
    def drops(df: org.apache.spark.sql.DataFrame) =
      df.filter(!col("keep")).count()
    assert(drops(top2) >= drops(base))
    // still exactly one keeper per component
    assert(top2.groupBy("component")
      .agg(sum(col("keep").cast("long")).as("k"))
      .filter(col("k") =!= 1).count() == 0)
    base.unpersist(); top2.unpersist()
    Dedup.unpersistAll()
  }

  test("semantic dedup margin gate: 0 reduces to top-1, a huge margin reduces to top-2, decisions stay total") {
    import org.apache.spark.sql.functions._
    val corpus = Corpus.embCorpus(spark, dir)
    val n = corpus.count()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().toSeq
    // margin 0: d2 - d1 < 0 never holds, so only primary assignments
    // generate candidates — EXACTLY the top-1 result
    val base = canon(Dedup.semanticDedup(corpus))
    Dedup.unpersistAll()
    val zeroMargin = canon(Dedup.semanticDedup(corpus, assignMargin = Some(0.0)))
    Dedup.unpersistAll()
    assert(zeroMargin == base)
    // margin ∞ (any bound over the fixture's distance range): every
    // vector's second assignment is admitted — EXACTLY the top-2 result
    val top2 = canon(Dedup.semanticDedup(corpus, assignTop = 2))
    Dedup.unpersistAll()
    val hugeMargin = canon(Dedup.semanticDedup(corpus, assignMargin = Some(1e18)))
    Dedup.unpersistAll()
    assert(hugeMargin == top2)
    // an intermediate margin is monotone between the brackets: totality
    // holds, primary cids unchanged, drops between top-1's and top-2's
    val mid = Dedup.semanticDedup(corpus, assignMargin = Some(0.5)).cache()
    assert(mid.count() == n && mid.select("vec_id").distinct().count() == n)
    assert(mid.select("vec_id", "cid").collect().toSet ==
      base.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1))).toSet)
    def drops(rows: Seq[org.apache.spark.sql.Row]) = rows.count(!_.getBoolean(3))
    val midDrops = mid.filter(!col("keep")).count()
    assert(midDrops >= drops(base) && midDrops <= drops(top2))
    assert(mid.groupBy("component")
      .agg(sum(col("keep").cast("long")).as("k"))
      .filter(col("k") =!= 1).count() == 0)
    mid.unpersist()
    Dedup.unpersistAll()
    // a negative margin is a misconfiguration, named
    val e = intercept[IllegalArgumentException](
      Dedup.semanticDedup(corpus, assignMargin = Some(-1.0)))
    assert(e.getMessage.contains("assignMargin"))
  }

  test("assignMarginProbe: low-quantile margin reclaims a crafted boundary split at ~quantile volume") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Corpus.embCorpus(spark, dir).select("vec_id", "embedding")
      .localCheckpoint(true)
    // craft a near-dup pair STRADDLING a Voronoi boundary — the
    // cluster-split shape the margin dial exists for: from the base
    // build's CLOSEST centroid pair (their bisector region is owned
    // by the two of them, not a third list) take the midpoint and
    // step ±0.005 along (c2 − c1). Geometry tuned by measurement
    // (ProbeMarginFixture sweep): this displacement keeps the rebuilt
    // clustering splitting the pair at top-1 (Lloyd drag from the two
    // added vectors is smaller than the step) while one member's
    // d₂−d₁ gap lands in the distribution's 1% left tail and the
    // pair cosine stays ≥ 0.995.
    val idx0 = SimilaritySearch.buildIndex(base, centroidMod = 50)
    val cents = idx0.centroids.collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val closest = (for {
      i <- cents.indices; j <- cents.indices if i < j
    } yield {
      val d2 = cents(i).indices.map(k => math.pow(cents(i)(k) - cents(j)(k), 2)).sum
      (d2, i, j)
    }).minBy(_._1)
    val c1 = cents(closest._2); val c2 = cents(closest._3)
    val d = c1.indices.map(i => c2(i) - c1(i)).toArray
    val dn2 = d.map(x => x * x).sum
    val mid = c1.indices.map(i => (c1(i) + c2(i)) / 2).toArray
    val eps = 0.005 / math.sqrt(dn2) // displacement ε·|d| = 0.005
    val va = c1.indices.map(i => (mid(i) + eps * d(i)).toFloat).toArray
    val vb = c1.indices.map(i => (mid(i) - eps * d(i)).toFloat).toArray
    val corpus = base
      .unionByName(Seq((900001L, va.toSeq), (900003L, vb.toSeq))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS FLOAT))").as("embedding")))
      .localCheckpoint(true)
    // top-1 must SPLIT the pair (different clusters, both kept = the
    // boundary miss) — the fixture premise, asserted not assumed
    val dec0 = Dedup.semanticDedup(corpus).localCheckpoint(true)
    Dedup.unpersistAll()
    val pairRows = dec0.filter(col("vec_id").isin(900001L, 900003L))
      .orderBy("vec_id").collect()
    assert(pairRows(0).getLong(1) != pairRows(1).getLong(1),
      s"fixture must split the pair across clusters at top-1: ${pairRows.toSeq}")
    assert(pairRows.forall(_.getBoolean(3)),
      "a split pair is a MISS: both members keep at top-1")
    // the probe: its q0.01 margin must admit the pair (their d₂−d₁
    // gaps are the distribution's left tail by construction) …
    val probe = Dedup.assignMarginProbe(corpus, quantiles = Seq(0.01, 0.05))
      .orderBy("quantile").collect()
    Dedup.unpersistAll()
    val m01 = probe(0).getDouble(1)
    assert(probe(0).getDouble(0) == 0.01 && m01 > 0.0)
    assert(probe(1).getDouble(1) >= m01, "quantile margins are monotone")
    val dec1 = Dedup.semanticDedup(corpus, assignMargin = Some(m01))
      .localCheckpoint(true)
    Dedup.unpersistAll()
    assert(dec1.filter(col("vec_id").isin(900001L, 900003L))
      .filter(col("keep")).count() == 1L,
      "the probe-chosen margin reclaims the boundary miss: one keeper")
    // … at ~quantile volume: secondary rows ≈ 1% of the corpus (the
    // quantile IS the cost dial; allow 3× for ties/interpolation)
    val idx1 = SimilaritySearch.buildIndex(corpus, centroidMod = 50)
    val nSec = Dedup.multiAssignRows(
        idx1.assignments.select(col("cand_id").as("vec_id"), col("cand_emb")),
        idx1.centroids, effTop = 2, assignMargin = Some(m01))
      .filter(col("_rn") > 1).count()
    Dedup.unpersistAll()
    val n = corpus.count()
    assert(nSec >= 2 && nSec <= n * 3 / 100,
      s"q0.01 margin admitted $nSec of $n secondary rows — expected ≈1%")
  }

  test("hot-cluster star: embedding-spike decisions equal uncapped SemDeDup; dial rejects multi-assign") {
    import org.apache.spark.sql.functions._
    val hot = Corpus.hotEmbCorpus(spark, dir)
    def decisions(cap: Int) =
      Dedup.semanticDedup(hot, maxVecsPerCluster = cap)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    val capped = decisions(8)
    val uncapped = decisions(0)
    // cosine-identical spike members all verify against the cluster's
    // min-id hub, so the star loses nothing this corpus' pairs need:
    // the full decision table matches row for row
    assert(capped == uncapped)
    // the spike (seed + 40 copies) is one component with one keeper
    val seedId = Tables.embeddings(spark, dir).orderBy("vec_id").limit(1)
      .collect()(0).getLong(0)
    val spikeIds = (Set(seedId) ++ (0 until 40).map(g => 300001L + g)).toSet
    val spike = capped.filter(r => spikeIds(r._1))
    assert(spike.size == 41)
    assert(spike.map(_._3).toSet.size == 1, "spike must be one component")
    assert(spike.count(_._4) == 1, "exactly one spike keeper")
    // the dial is a top-1-path cap; multi-assignment paths refuse it
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(hot, assignTop = 2, maxVecsPerCluster = 8)
    }
    Dedup.unpersistAll()
  }

  test("semantic dedup: planted copies collapse within clusters, one keeper per component") {
    val dec = Dedup.semanticDedup(Corpus.embCorpus(spark, dir)).cache()
    val n = Corpus.embCorpus(spark, dir).count()
    // decision table is TOTAL: one row per corpus vector
    assert(dec.count() == n)
    assert(dec.select("vec_id").distinct().count() == n)
    // exactly one keeper per component — multi-member or singleton
    assert(dec.groupBy("component")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("keep").cast("long")).as("k"))
      .filter("k != 1").count() == 0)
    // components never cross clusters: candidate pairs are cid-scoped
    assert(dec.groupBy("component")
      .agg(org.apache.spark.sql.functions.countDistinct("cid").as("nc"))
      .filter("nc != 1").count() == 0)
    // recall of the planted ×1.001 copies: the copy must land in its
    // original's component (same cluster + cosine ≈ 1). Property, not
    // exact edge (memory: assert ≥, not ==): measured 100% at every SF
    val copies = dec.filter("vec_id >= 100000")
      .select(org.apache.spark.sql.functions.col("vec_id").minus(100000L).as("orig_id"),
        org.apache.spark.sql.functions.col("component").as("copy_comp"))
    val joined = copies.join(
      dec.select(org.apache.spark.sql.functions.col("vec_id").as("orig_id"),
        org.apache.spark.sql.functions.col("component").as("orig_comp")), "orig_id")
    val nCopies = joined.count()
    assert(nCopies > 0)
    val collapsed = joined.filter("copy_comp = orig_comp").count()
    assert(collapsed >= (0.9 * nCopies).toLong,
      s"only $collapsed of $nCopies planted copies collapsed")
    // the pairwise stage must be the cid equi-join, never a cartesian
    assert(!dec.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    dec.unpersist()
    Dedup.unpersistAll()
  }

  test("unpersistAll releases exactly the dedup-persisted intermediates") {
    // clean slate: earlier tests cache results whose plans would
    // otherwise serve this test's run straight from the CacheManager
    spark.catalog.clearCache()
    Dedup.unpersistAll()
    // caller-owned cache that must SURVIVE the dedup cleanup
    val mine = corpus.limit(10).cache()
    mine.count()
    // compare ID SETS, not sizes: earlier tests' localCheckpoint RDDs
    // are reclaimed ASYNCHRONOUSLY by the ContextCleaner, so a raw
    // size can shrink between the two reads and mask the growth (the
    // r13 flake). The dedup-tracked caches are strongly referenced
    // until unpersistAll, so the new-ID delta is race-free.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashPairs(corpus, n = 4).count() // persists wh/grams/sig internally
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "minhashPairs should have materialized tracked caches")
    Dedup.unpersistAll()
    assert((spark.sparkContext.getPersistentRDDs.keySet & added).isEmpty,
      "unpersistAll left dedup intermediates cached")
    // the caller's cache is untouched (clearCache() would have dropped it)
    assert(mine.storageLevel.useMemory)
    mine.unpersist()
  }
}
