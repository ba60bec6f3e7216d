package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.pipelines.TrainingExport

/** Measurement probe for the steady-state export's central scale
  * claim: per-ingest cost must track the BATCH, not the accumulated
  * state — a pipeline whose ingest slows as the corpus grows is one
  * that eventually cannot keep up with its own history. Feeds N
  * equal-size distinct batches (sf0.1 documents, per-batch id offset
  * and a batch token appended so nothing cross-dedups and the state
  * genuinely accumulates) through runIngest under DedupExact and
  * DedupNearDup, recording per-ingest wall and the state row counts.
  * The honest part is the near-dup column: its candidate REFINE joins
  * the persisted signature table, which grows linearly — the join is
  * bucket-co-located (zero state-side shuffle) but the scan is real,
  * so the probe shows where the O(batch) claim holds exactly (exact:
  * bucketed fingerprint equi-join) and where it is O(batch) shuffle +
  * O(state) columnar scan. Run:
  * `Test/runMain graft.ProbeIngestScale /root/testdata/sf0.1 12`.
  * Numbers recorded in SCALE.md next to runIngest.
  */
object ProbeIngestScale {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(12)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text", "n_chars").localCheckpoint(true)
    val n = docs.count()

    for (mode <- Seq("exact", "neardup", "media", "span")) {
      val p = s"ingest_scale_${mode}"
      val tables = Seq(
        "_dedup", "_dedup_compact_tmp", "_dedup_tombstones",
        "_sigs", "_sigs_compact_tmp", "_sigs_tombstones",
        "_mediafp", "_mediafp_compact_tmp", "_mediafp_tombstones",
        "_mediadh", "_mediadh_compact_tmp", "_mediadh_tombstones",
        "_shingles", "_shingles_compact_tmp", "_shingles_tombstones",
        "_budget", "_offsets")
      tables.foreach(t => TestSpark.resetTable(spark, s"`$p$t`"))
      val cfg = TrainingExport.Config(
        curate = false, // isolate the state machinery from the funnel
        dedup = mode match {
          case "exact" => TrainingExport.DedupExact
          case "neardup" => TrainingExport.DedupNearDup()
          case _ => TrainingExport.DedupOff // media/span: isolate one state
        },
        mediaDedup = if (mode == "media") Some(4) else None,
        // span mode: isolate the shingle state + surgery — the r17
        // ingest stage; probes join the bucketed positional table, so
        // the claim under measurement is O(batch) probe + O(batch)
        // append as the 28-byte-row state grows linearly
        spanDedup = if (mode == "span") Some(10) else None,
        contaminationMaxPpm = None,
        budgets = Nil,
        numShards = 8)
      println(s"=== mode $mode: $nBatches batches x $n docs ===")
      (0 until nBatches).foreach { k =>
        Dedup.unpersistAll()
        // suffix every WORD with the batch tag: a mere appended tail
        // keeps shingle Jaccard ~1 (measured: every later batch
        // near-dups batch 0 and ships ~0), and an INTERLEAVED token
        // manufactures (tag, w, tag) shingles shared across a batch's
        // docs (measured: within-batch candidate blowup, one 22 s
        // ingest). Per-word suffixing keeps each doc's shingle
        // structure while making every batch fully distinct corpus.
        val batch = docs
          .withColumn("doc_id", col("doc_id") + lit(k.toLong * 10000000L))
          .withColumn("text",
            expr(s"array_join(transform(split(text, ' '), w -> concat(w, '_b$k')), ' ')"))
        // media mode: one payload per doc, synthesized from the
        // OFFSET id so every batch carries fully distinct pixels (a
        // payload derives from its synth input id) — the per-ingest
        // cost is then one decode pass + the two state probes
        val media =
          if (mode != "media") null
          else graft.operators.Multimodal.synthesizePpmTextured(
            batch.select("doc_id"))
        val t0 = System.nanoTime()
        val shipped = TrainingExport.runIngest(
          batch, docs.limit(1), cfg, p, media = media)
        val rows = shipped.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val stateTbl = mode match {
          case "media" => s"${p}_mediadh"
          case "span" => s"${p}_shingles"
          case _ => s"${p}_dedup"
        }
        val stateRows = spark.table(stateTbl).count()
        println(f"  ingest $k%2d: wall $wall%6.2f s  shipped $rows%7d  state_rows $stateRows%9d")
      }
      tables.foreach(t => TestSpark.resetTable(spark, s"`$p$t`"))
    }
    spark.stop()
  }
}
