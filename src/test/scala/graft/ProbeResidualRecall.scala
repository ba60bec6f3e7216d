package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Measurement probe (ProbeLateWindow's discipline): recall@5 vs the
  * exact L2 ground truth for vector-coded IVFADC vs RESIDUAL-coded
  * IVFADC at identical parameters, sf0.01 (the smallest scale where
  * ANN recall comparisons mean anything — see the fixture lessons).
  * Run via `Test/runMain graft.ProbeResidualRecall`; the numbers are
  * recorded in COVERAGE.md next to the residual operator.
  */
object ProbeResidualRecall {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    graft.functions.VecDot.register(spark)
    graft.plans.TopKPerGroup.install(spark)

    val q = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val cand = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cemb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("cand_id"))
    val exact = cand.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("d2", expr(graft.functions.VectorExprs.l2sqSpark("qemb", "cemb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "cand_id")
      .localCheckpoint(true)
    val nQ = exact.select("query_id").distinct().count()

    def recall(res: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val hits = exact.join(
        res.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "inner").count()
      println(f"[residual-recall] $name%-22s hits@5 = $hits / ${nQ * 5} " +
        f"(${hits.toDouble / (nQ * 5)}%.3f over $nQ queries)")
    }
    recall(SimilaritySearch.ivfPqTopK(emb), "ivfpq (vector codes)")
    recall(SimilaritySearch.ivfPqResidualTopK(emb), "ivfpq (residual codes)")
    // the shared CEILING: the fraction of true top-5 neighbors that
    // live in the query's nprobe=2 probed lists at all — no code
    // quality can rank a candidate the coarse pruning never scores
    val index = SimilaritySearch.buildIndex(emb, centroidMod = 50)
    val byD = org.apache.spark.sql.expressions.Window
      .partitionBy("vid").orderBy(col("d"), col("cid"))
    val allowed = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("vid"), col("embedding"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("d", expr(graft.functions.VectorExprs.l2sqSpark("embedding", "cemb")))
      .withColumn("rn", row_number().over(byD))
      .filter(col("rn") <= 2)
      .select(col("vid").as("query_id"), col("cid"))
      .join(index.assignments.select(col("cand_id"), col("cid")), Seq("cid"))
      .select("query_id", "cand_id")
    recall(allowed, "coarse-pruning ceiling")
    spark.stop()
  }
}
