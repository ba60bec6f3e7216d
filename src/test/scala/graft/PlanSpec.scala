package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale design (SCALE.md) depends
  * on these physical-plan properties; a refactor that silently loses
  * one (extra shuffle, lost pushdown, lost broadcast) would still pass
  * the value-correctness gate, so they are pinned here.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  // formatted plans list each node twice (tree + detail); match the
  // tree lines ("<JoinImpl> <JoinType> (" / "+- Exchange (") only
  test("diff is ONE full-outer join, not the literal 3-node plan") {
    val p = plan("q_diff_lineitem")
    assert("Join FullOuter".r.findAllIn(p).size == 1, p.take(2000))
    // two input exchanges + the deterministic orderBy's range exchange
    assert("[+:]- Exchange".r.findAllIn(p).size <= 3)
  }

  test("preferShuffledHash hints the diff join to ShuffledHashJoin") {
    import graft.operators.{DiffOptions, TableDiff}
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val d = TableDiff.diff(o, o, Seq("o_orderkey"),
      opts = DiffOptions(preferShuffledHash = true))
    val p = d.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
    assert(d.count() == o.count()) // and still computes correctly
  }

  test("literal-plan mode really builds union-distinct keys + two left joins") {
    val p = plan("q_diff_orders_literal")
    assert("Join LeftOuter".r.findAllIn(p).size == 2, p.take(2000))
    assert(p.contains("HashAggregate")) // the UNION's distinct
  }

  test("filters and column pruning reach the parquet scan") {
    val p = plan("q_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), LessThan"))
    // projection pruned to the 5 referenced columns, not all 11
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"))
  }

  test("dimension joins broadcast the small sides") {
    val p = plan("q_join_agg_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    // the fact scan reads only the needed columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"))
  }

  test("aggregation is partial (map-side combine) before the exchange") {
    val p = plan("q_agg_pricing")
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0 && p.indexOf("HashAggregate", aggIdx + 1) > 0) // partial + final
  }

  test("top-n compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q_orderby_topn")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("range join plans as a hash join on the bucket, never a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("Join Inner"))
  }

  test("as-of join is pure window composition — no join operator at all") {
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Window"))
    assert(p.contains("Union"))
  }

  test("simhash candidates are an equi-join on pigeonhole segments, not a block cartesian") {
    val p = plan("q_dedup_simhash")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the segment value participates in the join keys — candidates are
    // bucketed by fingerprint content, not just the block column
    assert(p.contains("sh_key"), p.take(2000))
  }

  test("embedding near-dup candidates are an equi-join on LSH band keys") {
    // pin the OPERATOR's plan — the q_dedup_embed query now reads the
    // pair list materialized once per dataset (the pipeline-sharing
    // shape), so the band-join structure lives in the operator call
    val p = graft.operators.Dedup
      .embeddingPairs(graft.sources.Corpus.embCorpus(spark, dir))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("eb_key"), p.take(2000))
  }

  test("vector kernels appear as codegen'd expressions in the ANN plan") {
    val p = plan("q_embed_topk_brute")
    assert(p.contains("vec_dot"))
    assert(!p.contains("aggregate(zip_with")) // no interpreted HOF fold left
  }

  test("quantized top-k scans packed binary, broadcasts queries, dots via the int kernel") {
    val p = plan("q_embed_topk_quantized")
    assert(p.contains("vec_dot_i8"))
    assert(p.contains("i8_quantize")) // the fused one-pass kernel, not the HOF form
    assert(!p.contains("aggregate(zip_with")) // no interpreted HOF fold
    assert(!p.contains("transform(")) // no interpreted per-element lambdas at all
    assert(p.contains("BroadcastExchange"), p.take(2000)) // small query side broadcast
    // candidates reach the broadcast join without a shuffle of their own
    assert(!"""Exchange hashpartitioning.*cand_id""".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("IVF-SQ8 probe scores codes with the mixed kernel and broadcasts centroids") {
    val p = plan("q_embed_ann_ivf_sq8")
    assert(p.contains("vec_dot_f_i8")) // float query × int8 codes, no dequantize
    assert(p.contains("i8_quantize"))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("aggregate(zip_with"))
  }

  test("training-shard assignment is one hash shuffle — no global sort, no join") {
    val p = plan("q_train_shards")
    assert(!p.contains("Join"), p.take(2000))
    // the per-shard window is the operator's one shuffle; the final
    // ORDER BY adds its range exchange — nothing else may appear
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected ≤2 exchanges (window + order), got $exchanges:\n${p.take(2000)}")
    assert(p.contains("poly_hash"))
  }

  test("the five-stage pipeline keeps a bounded shuffle count and no cartesian") {
    val p = plan("q_pipeline_train_export")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // curate/dedup/decontaminate semi-gates + mixture window + shard
    // window + final order — the composition must not multiply
    // exchanges beyond its stages (measured 7 at authoring time)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 8, s"pipeline grew to $exchanges exchanges:\n${p.take(3000)}")
  }

  test("pivot compiles to one conditional-aggregation pass, no join or expand") {
    val p = plan("q_pivot")
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Expand"), p.take(2000))
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0 && p.indexOf("HashAggregate", aggIdx + 1) > 0) // partial + final
  }

  test("upsert-apply is exactly ONE full-outer join — the single-shuffle MERGE") {
    val p = plan("q_upsert_apply")
    assert("Join FullOuter".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("hash sampling is a pure filter over one scan: no join, no pre-agg exchange") {
    val p = plan("q_hash_sample")
    assert(!p.contains("Join"), p.take(2000))
    // count node-detail headers — the tree section lists nodes twice
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1)
    // single global aggregate: partial → (single-partition) exchange → final
    assert(p.contains("Filter"))
    assert(p.contains("poly_hash"))
  }

  test("grouping sets aggregate via Expand in a single pass — no per-set scans") {
    val p = plan("q_grouping_sets")
    assert(p.contains("Expand"))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("bucketed diff joins co-located buckets: the only exchange is the ORDER BY's") {
    val p = plan("q_diff_bucketed")
    assert("Join FullOuter".r.findAllIn(p).size == 1, p.take(2000))
    // one range exchange for the deterministic ORDER BY, zero for the join
    assert("[+:]- Exchange".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("proven non-nullable keys take the = join automatically; file scans stay null-safe") {
    import org.apache.spark.sql.catalyst.expressions.EqualNullSafe
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{DataFrame, Row}
    import graft.operators.TableDiff
    import scala.jdk.CollectionConverters._
    def nullSafeKeyed(d: DataFrame): Boolean =
      d.queryExecution.optimizedPlan
        .collect { case j: Join => j.condition }
        .flatten
        .exists(_.exists(_.isInstanceOf[EqualNullSafe]))
    // Catalyst-proven non-nullable key (constructed schema) → the `=`
    // plan with no keysNotNull declaration
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType)))
    val df = spark.createDataFrame(
      Seq(Row(1L, "a"), Row(2L, "b")).asJava, schema)
    val auto = TableDiff.diff(df, df, Seq("k"))
    assert(!nullSafeKeyed(auto),
      "non-nullable keys on both sides must plan as `=`")
    assert(auto.filter("_row_status IS NULL").count() == 2) // and still correct
    // parquet read: Spark widens the read schema to nullable (files
    // are externally appendable), so the diff must KEEP `<=>` —
    // auto-switching here would silently drop NULL-key pairing
    val o = spark.read.parquet(s"$dir/orders.parquet")
    assert(nullSafeKeyed(TableDiff.diff(o, o, Seq("o_orderkey"))),
      "file-source keys are nullable by fiat and must stay null-safe")
    // one proven side is not enough
    val mixed = TableDiff.diff(df.toDF("o_orderkey", "v").select("o_orderkey"),
      o.select("o_orderkey"), Seq("o_orderkey"))
    assert(nullSafeKeyed(mixed), "a single nullable side must stay null-safe")
  }

  test("partitioned sink read-back prunes to the filtered partition directory") {
    val p = plan("q_sink_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p.take(2000))
    // the literal value must appear INSIDE the partition-filter list,
    // not merely anywhere in the plan
    assert("PartitionFilters: \\[[^\\]]*= click".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("ANN top-k plans as the bounded-heap operator even in a bare session") {
    // library callers don't run Verify/Bench's session-wide install;
    // ivfTopK/bruteTopK must self-install (idempotently) or their
    // rn<=k filters fall back to the full WindowExec sort
    val fresh = spark.newSession()
    assert(!fresh.experimental.extraOptimizations
      .exists(_.isInstanceOf[graft.plans.TopKViaHeapRule]))
    val emb = fresh.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.operators.SimilaritySearch
      .ivfTopK(emb)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TopKPerGroup"), p.take(2000))
    assert(!p.contains("WindowExec"), p.take(2000))
  }

  test("generated diff SQL text plans identically to the literal DataFrame diff") {
    // the SQL string and the DataFrame API must hit the same physical
    // shape: union-distinct keys + two left joins (the text mirrors
    // the reference template, which is the literal plan)
    val p = plan("q_diff_sql_exec")
    assert("Join LeftOuter".r.findAllIn(p).size == 2, p.take(2000))
  }

  test("round-7 queries prune their scans to the consumed columns") {
    // a 2-column projection that reads the full lineitem/documents
    // width is wrong at any scale — pin the pushed ReadSchema
    assert(plan("q_zorder_key").contains(
      "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"))
    assert(plan("q_tfidf_top_terms").contains(
      "ReadSchema: struct<doc_id:bigint,text:string>"))
    assert(plan("q_heavy_hitters_cms").contains(
      "ReadSchema: struct<l_suppkey:bigint>"))
    assert(plan("q_per_source_cap").contains(
      "ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"))
  }

  test("round-8 text operators prune their scans and stay shuffle-free") {
    // redaction and chunking consume only (doc_id, text); reading the
    // full documents width — or shuffling anywhere — is wrong at scale
    assert(plan("q_doc_chunks").contains(
      "ReadSchema: struct<doc_id:bigint,text:string>"))
    val pii = plan("q_pii_scrub")
    assert(pii.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    // narrow projections end-to-end: the only Exchange either query
    // may carry is the final ORDER BY's range partitioning
    val chunksNoSort = graft.operators.TextAnalysis
      .chunk(graft.sources.Tables.documents(spark, dir), chunkChars = 120, overlap = 24)
      .queryExecution.executedPlan.toString
    assert(!chunksNoSort.contains("Exchange"), chunksNoSort)
  }

  test("curation funnel is one pruned zero-shuffle scan; url filter broadcasts its blocklist") {
    // funnel: all four gates in a single narrow projection — no join,
    // no Exchange before the query's final ORDER BY
    val funnel = graft.operators.TextAnalysis
      .curationFunnel(graft.sources.Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!funnel.contains("Exchange") && !funnel.contains("Join"), funnel.take(2000))
    assert(plan("q_curation_funnel").contains(
      "ReadSchema: struct<doc_id:bigint,text:string>"))
    // url filter: the blocklist anti-join must broadcast the list
    // side, never shuffle the corpus
    val url = plan("q_url_filter")
    assert(url.contains("BroadcastHashJoin") && url.contains("LeftAnti"), url.take(2000))
  }

  test("mixture sampling's only exchanges are the stratum window and final sort") {
    // one hash partitioning on the stratum column for the running-sum
    // window; a plan that repartitions anywhere else re-shuffles the
    // corpus at 100 TB
    val p = plan("q_mixture_sample")
    assert("hashpartitioning\\(source".r.findAllIn(p).size >= 1, p.take(2000))
    assert("[+:]- Exchange".r.findAllIn(p).size <= 2, p.take(2000))
  }

  test("naturalness re-joins its bigram model as a broadcast") {
    val p = plan("q_text_naturalness")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("the curation funnel plans as byte-scan kernels, zero regex") {
    // the r8 kernel work's regression guard: every gate count comes
    // from a codegen'd byte-scan expression; a reappearing regexp_*
    // or split-lambda means someone reverted to a per-pattern pass
    val p = plan("q_curation_funnel")
    assert(p.contains("word_set_hits") && p.contains("char_class_stats") &&
      p.contains("letter_run_stats"), p.take(3000))
    assert(!p.toLowerCase.contains("regexp"), p.take(3000))
  }

  test("naturalness plans as the bigram histogram kernel, no positional explode") {
    val p = plan("q_text_naturalness")
    assert(p.contains("bigram_counts"), p.take(3000))
    assert(!p.contains("sequence(") && !p.contains("transform("), p.take(3000))
  }

  test("scd2 asOf over a history TABLE is a pure pushed-filter scan") {
    // the time-travel read path: materialize a history once, then any
    // asOf is a single scan with the validity predicates pushed down —
    // no join, no shuffle (the orderBy-free form)
    val hist = graft.operators.Scd2.snapshotHistory(
      spark.read.parquet(s"$dir/orders.parquet"),
      graft.sources.Tables.ordersAfter(spark, dir),
      Seq("o_orderkey"), "2024-01-01", "2024-02-01")
    val out = java.nio.file.Files.createTempDirectory("graft_scd2_hist_").toString
    hist.write.mode("overwrite").parquet(out)
    val p = graft.operators.Scd2.asOf(spark.read.parquet(out), "2024-01-15")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join") && !p.contains("Exchange"), p.take(2000))
    assert(p.contains("PushedFilters:") && p.contains("valid_from"), p.take(2000))
  }

  test("paragraph dedup: two key-hash exchanges plus the sort, corpus joins broadcast") {
    val p = plan("q_dedup_paragraph")
    // line-key window + doc_id reassembly + deterministic orderBy —
    // a fourth exchange means the blank-line bypass or the union
    // started re-shuffling the corpus
    assert("[+:]- Exchange".r.findAllIn(p).size <= 3, p.take(2000))
    assert(p.contains("hashpartitioning(pkey"), p.take(2000))
    // the planted-corpus construction join stays broadcast
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("stratified quality gate: both windows share ONE stratum exchange") {
    val p = plan("q_quality_stratified")
    // rank + count windows over the same hashpartitioning(stratum)
    // exchange, plus the final sort — nothing else may shuffle
    assert("[+:]- Exchange".r.findAllIn(p).size <= 2, p.take(2000))
    assert("Window".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("hashpartitioning(stratum"), p.take(2000))
  }

  test("approx stratified gate: threshold join broadcasts, no window, no per-stratum sort") {
    // the operator's own plan — the 100 TB claim is NO total order
    // anywhere: one partial-aggregating pass for the thresholds
    // (broadcast back) and a windowless keep projection
    val docs = graft.sources.Tables.documents(spark, dir)
    val p = graft.operators.TextAnalysis
      .stratifiedQualityGateApprox(docs, stratumCol = Some("lang"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("corpus report: NO window anywhere — quartiles ride the percentile aggregate") {
    // the r13 verdict's scale-killer: the old report ranked the whole
    // corpus through one unpartitioned row_number task; the reworked
    // plan must be aggregate-only (percentile's accumulator is bounded
    // by the ppm domain, not corpus size)
    val p = plan("q_corpus_report")
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("fingerprint paragraph dedup: window-free, keyed by the hash pair") {
    val p = plan("q_dedup_paragraph_fp")
    // first-occurrence via min_pair_long aggregation + a fingerprint
    // equi-join — no rank window anywhere (the skew-safety claim), and
    // the key shuffles carry the hash pair, not line text
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("hashpartitioning(pk1"), p.take(2000))
    // the r19 HashAggregate claim, pinned (VERDICT r19 #1): the
    // two-long-buffer min_pair_long keeps the keep-first aggregation
    // out of the SortAggregate fallback — no per-task sort of the
    // exploded line table by its 128-bit fingerprint, at either
    // aggregation level
    assert(!p.contains("SortAggregate"), p.take(4000))
  }

  test("media-exact keep-first aggregates by hash, never by sort") {
    // the media kernel's twin of the paragraph-fp pin: min(col) /
    // min_pair_long keep every keep-first aggregation hash-based
    val p = plan("q_dedup_media")
    assert(!p.contains("SortAggregate"), p.take(4000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("full-PSL matching broadcasts the rule table; the corpus never shuffles for it") {
    // candidate fan-out is a bounded generator over each host's
    // labels; the rule join must broadcast the (tiny) rule side and
    // the corpus side must reach the prevailing-rule aggregate
    // without any corpus-wide exchange beyond the aggregate's own
    val p = plan("q_url_psl_full")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p.take(3000))
    // prevailing-rule arg-max runs as max(int) through HashAggregate
    // (r20): the old max_by(string, int) carried a string buffer and
    // fell back to SortAggregate at both aggregation levels
    assert(!p.contains("SortAggregate"), p.take(4000))
  }

  test("full-PSL plan shape holds at production rule count (~9200 rules)") {
    // the ~20-rule fixture proves semantics; this proves the PLAN
    // still broadcasts and never degenerates to a nested loop when
    // the rule table has the live list's cardinality
    val p = plan("q_url_psl_9k")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p.take(3000))
    assert(!p.contains("SortAggregate"), p.take(4000)) // see q_url_psl_full
  }
}
