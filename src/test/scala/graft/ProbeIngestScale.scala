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

    for (mode <- Seq("exact", "neardup", "media", "span", "semantic", "semanticpq")) {
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
        // semantic modes: isolate the written index (float vs codes-
        // backed); each batch is the base embedding cloud ROTATED by
        // the batch number — an isotropic cloud's rotation keeps the
        // list geometry stationary (no spurious drift re-cluster)
        // while every vector is a genuinely new direction (no
        // cross-batch dups)
        semanticDedup = mode.startsWith("semantic"),
        semanticPq = mode == "semanticpq",
        contaminationMaxPpm = None,
        budgets = Nil,
        numShards = 8)
      val idxDir = TrainingExport.semanticIndexDir(spark, p)
      def dropIdx(): Unit = {
        val pth = new org.apache.hadoop.fs.Path(idxDir)
        pth.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pth, true)
      }
      dropIdx()
      val embBase =
        if (!mode.startsWith("semantic")) null
        else graft.sources.Tables.embeddings(spark, dir)
          .select("vec_id", "embedding").localCheckpoint(true)
      val semDocs =
        if (!mode.startsWith("semantic")) docs
        else docs.join(
          embBase.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
          .localCheckpoint(true)
      val nMode = if (mode.startsWith("semantic")) semDocs.count() else n
      println(s"=== mode $mode: $nBatches batches x $nMode docs ===")
      (0 until nBatches).foreach { k =>
        Dedup.unpersistAll()
        // suffix every WORD with the batch tag: a mere appended tail
        // keeps shingle Jaccard ~1 (measured: every later batch
        // near-dups batch 0 and ships ~0), and an INTERLEAVED token
        // manufactures (tag, w, tag) shingles shared across a batch's
        // docs (measured: within-batch candidate blowup, one 22 s
        // ingest). Per-word suffixing keeps each doc's shingle
        // structure while making every batch fully distinct corpus.
        val batch = semDocs
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
        val rot = k % 63 + 1
        val emb =
          if (!mode.startsWith("semantic")) null
          else embBase.select(
            (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
            expr(s"concat(slice(embedding, $rot + 1, ${64 - rot}), " +
              s"slice(embedding, 1, $rot))").as("embedding"))
        val t0 = System.nanoTime()
        val shipped = TrainingExport.runIngest(
          batch, docs.limit(1), cfg, p, media = media, embeddings = emb)
        val rows = shipped.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val stateRows = mode match {
          case "media" => spark.table(s"${p}_mediadh").count()
          case "span" => spark.table(s"${p}_shingles").count()
          case m if m.startsWith("semantic") =>
            spark.read.parquet(s"$idxDir/assignments").count()
          case _ => spark.table(s"${p}_dedup").count()
        }
        println(f"  ingest $k%2d: wall $wall%6.2f s  shipped $rows%7d  state_rows $stateRows%9d")
      }
      tables.foreach(t => TestSpark.resetTable(spark, s"`$p$t`"))
      dropIdx()
    }
    spark.stop()
  }
}
