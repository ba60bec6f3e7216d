package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Measurement probe for hashedLinearFit's scale claim: "n epochs =
  * n aggregates" — per-epoch cost is one codegen margin pass over the
  * materialized token-hash frame plus one bucket-width shuffle capped
  * at B groups and a ≤B-row collect, so wall should track the CORPUS
  * (linearly) and stay flat in B (the shuffle moves ≤B rows whatever
  * the corpus). Run:
  * `Test/runMain graft.ProbeFitScale`. Numbers in SCALE.md.
  */
object ProbeFitScale {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          expr(graft.ExtensionQueries.fitPlantedTextSql).as("text"),
          expr("doc_id % 2 = 0").as("label"))
        .localCheckpoint(true)
      val n = docs.count()
      // past literalMaxBuckets (default 4096) the fit switches to the
      // broadcast-weights join epoch (r17 verdict task #4); the probe
      // measures BOTH paths at the big B — the literal-array cliff the
      // r17 table found vs the join path that replaced it as default
      for (b <- Seq(64, 4096, 65536); epochs <- Seq(3, 6);
           path <- if (b == 65536) Seq("join", "literal") else Seq("auto")) {
        val lmb = path match {
          case "literal" => 65536 // force the literal array at big B
          case _ => 4096
        }
        val t0 = System.nanoTime()
        val fit = TextAnalysis.hashedLinearFit(
          docs, b, epochs = epochs, literalMaxBuckets = lmb)
        val nz = fit.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[fit-scale] $dir%-24s docs=$n%5d B=$b%5d epochs=$epochs " +
          f"path=$path%-7s: wall $wall%6.2f s (${wall / epochs}%5.2f s/epoch)  " +
          f"nonzero_w=$nz%5d")
      }
    }
    spark.stop()
  }
}
