package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Measurement probe (ProbeResidualRecall's discipline): does the
  * written index's re-cluster cadence actually BUY recall once the
  * ingested distribution drifts? Fixture: the corpus's own vectors
  * re-ingested TRANSLATED (+1.5 per component) — a new region the
  * build-time centroids never saw, so frozen-centroid appends pile
  * the whole drifted mass into the few lists nearest the offset
  * direction and nprobe=2 pruning starves. Queries are drawn from
  * the DRIFTED region; ground truth is the exact L2 top-5 over the
  * accumulated corpus. Run at sf0.1 (the smallest scale where ANN
  * recall comparisons mean anything — fixture lessons):
  * `Test/runMain graft.ProbeReclusterRecall /root/testdata/sf0.1`.
  * Numbers recorded in SCALE.md next to the re-cluster verb.
  */
object ProbeReclusterRecall {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    graft.functions.VecDot.register(spark)
    graft.plans.TopKPerGroup.install(spark)

    val base = emb.select("vec_id", "embedding")
    val drifted = base
      .select(
        (col("vec_id") + 100000L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x + CAST(1.5 AS FLOAT) AS FLOAT))")
          .as("embedding"))
      .localCheckpoint(true)
    val union = base.unionByName(drifted).localCheckpoint(true)
    val queries = drifted.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
      .localCheckpoint(true)

    // exact L2 top-5 ground truth over the accumulated corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("cand_id"))
    val exact = union
      .select(col("vec_id").as("cand_id"), col("embedding").as("cemb"))
      .crossJoin(broadcast(queries))
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
      println(f"[recluster-recall] $name%-22s hits@5 = $hits / ${nQ * 5} " +
        f"(${hits.toDouble / (nQ * 5)}%.3f over $nQ queries)")
    }

    // scanned-candidate volume per query at a given nprobe — the COST
    // axis recall must be read against: a drifted frozen index piles
    // the whole new region into a few giant lists, so its "recall"
    // is bought by degenerating toward a brute-force scan
    def scanned(index: SimilaritySearch.IvfIndex, nprobe: Int): Double = {
      val byD = org.apache.spark.sql.expressions.Window
        .partitionBy("vid").orderBy(col("d"), col("cid"))
      val probed = queries
        .select(col("query_id").as("vid"), col("qemb").as("embedding"))
        .crossJoin(broadcast(index.centroids))
        .withColumn("d", expr(graft.functions.VectorExprs.l2sqSpark("embedding", "cemb")))
        .withColumn("rn", row_number().over(byD))
        .filter(col("rn") <= nprobe)
        .select(col("vid").as("query_id"), col("cid"))
        .join(index.assignments.select("cid"), Seq("cid"))
        .count()
      probed.toDouble / math.max(1L, nQ)
    }

    def report(index: SimilaritySearch.IvfIndex, name: String, nprobes: Seq[Int]): Unit =
      nprobes.foreach { np =>
        val res = SimilaritySearch.probe(
          index,
          queries.withColumnRenamed("query_id", "vec_id")
            .withColumnRenamed("qemb", "embedding"),
          nprobe = np)
        val hits = exact.join(
          res.select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"), "inner").count()
        println(f"[recluster-recall] $name%-16s nprobe=$np%-3d hits@5 = $hits / ${nQ * 5} " +
          f"(${hits.toDouble / (nQ * 5)}%.3f), scanned/query = ${scanned(index, np)}%.0f")
      }

    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_recluster_probe_").toString
    SimilaritySearch.writeIndex(
      SimilaritySearch.buildIndex(base, centroidMod = 50), stateDir)
    SimilaritySearch.appendToWrittenIndex(spark, stateDir, drifted)
    // the cadence trigger the recall curves justify (r16 verdict task
    // #4): drifted appended mass reads as per-list skew BEFORE any
    // probe quality is measured — print both fixtures' reports so
    // SCALE.md can quote the gap
    println(s"[recluster-recall] driftReport(drifted)    = " +
      SimilaritySearch.driftReport(spark, stateDir))
    val statDir = java.nio.file.Files
      .createTempDirectory("graft_recluster_probe_stat_").toString
    SimilaritySearch.writeIndex(
      SimilaritySearch.buildIndex(base, centroidMod = 50), statDir)
    SimilaritySearch.appendToWrittenIndex(
      spark, statDir,
      base.select((col("vec_id") + 200000L).as("vec_id"), col("embedding")))
    println(s"[recluster-recall] driftReport(stationary) = " +
      SimilaritySearch.driftReport(spark, statDir))
    report(SimilaritySearch.readIndex(spark, stateDir), "frozen", Seq(2, 4))
    SimilaritySearch.reclusterWrittenIndex(spark, stateDir, centroidMod = 50)
    report(SimilaritySearch.readIndex(spark, stateDir), "re-clustered", Seq(2, 4, 8, 16, 40))
    spark.stop()
  }
}
