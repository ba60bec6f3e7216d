package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch}

/** Measurement probe for the r17 verdict's one weak component: the
  * codes-backed semantic probe reconstructed the ENTIRE corpus per
  * batch (posexplode of every live vector's codes + a corpus-width
  * groupBy — m×N rows at full float width, every ingest). Round 18
  * carries `cid` on code rows (partitioned like the assignments) and
  * prunes the reconstruction to the lists the batch touches BEFORE
  * the fan-out, so the probe's corpus term is Σ|touched lists| — the
  * SemDeDup co-assignment contract.
  *
  * This probe measures that shape directly, as the verdict asked:
  * the RECONSTRUCTION INPUT ROWS (exact tally: code rows under the
  * batch's assigned cids — the same isin filter the probe plans) and
  * the probe's task-level shuffle bytes, while the corpus grows
  * batch over batch under a FIXED probe batch. Claim under
  * measurement: recon rows track touched-list mass (a fixed SHARE of
  * the corpus set by |touched lists| / nLists, here a small batch →
  * small share), never the r17 shape (share ≡ 100%); shuffle bytes
  * grow with the touched mass only. Appended clouds are coordinate
  * ROTATIONS of the base (the ProbeIngestScale trick): list geometry
  * stays stationary (no maintenance fires mid-probe), every vector
  * is genuinely new. Run:
  * `Test/runMain graft.ProbePqProbeScale /root/testdata/sf0.1 8`.
  * Numbers recorded in SCALE.md.
  */
object ProbePqProbeScale {

  private final class ShuffleTally extends SparkListener {
    val bytes = new AtomicLong()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    val e = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").localCheckpoint(true)
    val nBase = e.count()
    // FIXED probe batch: a small new cloud (1/199 of the base,
    // re-keyed and rotated by a fixed amount) — small so it touches
    // few lists and the touched share is visibly below 1
    val probeBatch = e.filter(col("vec_id") % 199 === 0)
      .select(
        (col("vec_id") + 900000000L).as("vec_id"),
        expr("concat(slice(embedding, 33, 32), slice(embedding, 1, 32))")
          .as("embedding"))
      .localCheckpoint(true)

    val state = java.nio.file.Files
      .createTempDirectory("graft_pq_probe_scale_").toString
    try {
      val cb = SimilaritySearch.pqFit(e, m = 16, seedMod = 50)
      SimilaritySearch.writeIvfPqIndex(
        SimilaritySearch.buildIndex(e, centroidMod = 50),
        cb, SimilaritySearch.pqEncode(e, cb), state)
      val nLists = spark.read.parquet(s"$state/centroids").count()
      println(s"=== base corpus $nBase vectors, $nLists lists, " +
        s"probe batch ${probeBatch.count()} vectors ===")
      (0 until nBatches).foreach { k =>
        Dedup.unpersistAll()
        // the exact tally the pruned plan scans: code rows under the
        // probe batch's assigned cids
        val touched = SimilaritySearch.assignVectors(
          spark.read.parquet(s"$state/centroids"), probeBatch, "vec_id")
          .select(col("cid").cast("long")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val codes = spark.read.parquet(s"$state/codes")
        val total = codes.count()
        val reconRows =
          codes.filter(col("cid").cast("long").isin(touched: _*)).count()
        tally.bytes.set(0L)
        val t0 = System.nanoTime()
        val pairs = Dedup.semanticDedupAgainstPqIndex(
          probeBatch, spark, state, minCosPpm = 900000L).count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext, 10000L)
        val mb = tally.bytes.get() / 1e6
        println(f"  probe $k%2d: corpus $total%8d rows  touched ${touched.length}%3d/$nLists%3d lists" +
          f"  recon_rows $reconRows%8d (${100.0 * reconRows / total}%5.1f%%)" +
          f"  pairs $pairs%6d  wall $wall%6.2f s  shuffle $mb%8.2f MB")
        // grow the corpus: a rotated cloud, stationary geometry
        val rot = k % 63 + 1
        val grow = e.select(
          (col("vec_id") + lit((k + 1).toLong * 10000000L)).as("vec_id"),
          expr(s"concat(slice(embedding, $rot + 1, ${64 - rot}), " +
            s"slice(embedding, 1, $rot))").as("embedding"))
        SimilaritySearch.appendToWrittenIvfPqIndex(spark, state, grow)
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(state)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
