package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway A/B: bigram_counts-kernel naturalness vs the
  * explode+groupBy form, on an x64-amplified docs table staged in a
  * realistic 32-split layout (test scope; `Test/runMain`).
  */
object ProfileNaturalness {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextExprs._
    graft.functions.BigramCounts.register(spark)
    val docs0 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    docs0.crossJoin(spark.range(64).toDF("r"))
      .withColumn("doc_id", col("doc_id") * 64 + col("r"))
      .select("doc_id", "text").repartition(32)
      .write.mode("overwrite").parquet("/tmp/prof_docs64_32p")
    val d = spark.read.parquet("/tmp/prof_docs64_32p")

    def consume(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(max(col("h"))).collect()
      ()
    }
    def t(label: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label%-14s ${times.min}%.3f s")
    }

    // the explode+groupBy compaction, verbatim from the previous form
    def naturalnessExplode(docs: DataFrame): DataFrame = {
      val gramCounts = docs
        .filter(length(col("text")) >= 2)
        .select(
          col("doc_id"),
          explode(expr(
            "transform(sequence(1, length(text) - 1), i -> substring(lower(text), i, 2))"))
            .as("gram"))
        .groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      val model = gramCounts
        .groupBy("gram").agg(sum(col("cnt")).as("c2"))
        .withColumn(
          "c1", sum(col("c2")).over(Window.partitionBy(expr("substring(gram, 1, 1)"))))
        .select(col("gram"), expr(ppmSpark("c2", "c1")).cast("long").as("p_ppm"))
      val perDoc = gramCounts
        .join(broadcast(model), "gram")
        .groupBy("doc_id")
        .agg(sum(col("p_ppm") * col("cnt")).as("sum_ppm"), sum(col("cnt")).as("n"))
      val out = docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("n"), lit(0L)).cast("long").as("n_bigrams"),
          coalesce(
            expr("CAST(floor(CAST(sum_ppm AS DOUBLE) / n) AS BIGINT)"),
            lit(0L)).as("naturalness_ppm"))
      out
    }

    // the kernel form with NO cache boundary: both consumers (model
    // fit broadcast job + scoring join) recompute the narrow
    // kernel+explode — two cheap byte-scan passes vs one pass plus a
    // ~|docs|·|distinct grams| cache write and two cache reads
    def naturalnessNoPersist(docs: DataFrame): DataFrame = {
      val gramCounts = docs
        .filter(length(col("text")) >= 2)
        .select(
          col("doc_id"),
          explode(expr("bigram_counts(lower(text))")).as(Seq("gram", "cnt")))
      val model = gramCounts
        .groupBy("gram").agg(sum(col("cnt")).as("c2"))
        .withColumn(
          "c1", sum(col("c2")).over(Window.partitionBy(expr("substring(gram, 1, 1)"))))
        .select(col("gram"), expr(ppmSpark("c2", "c1")).cast("long").as("p_ppm"))
      val perDoc = gramCounts
        .join(broadcast(model), "gram")
        .groupBy("doc_id")
        .agg(sum(col("p_ppm") * col("cnt")).as("sum_ppm"), sum(col("cnt")).as("n"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("n"), lit(0L)).cast("long").as("n_bigrams"),
          coalesce(
            expr("CAST(floor(CAST(sum_ppm AS DOUBLE) / n) AS BIGINT)"),
            lit(0L)).as("naturalness_ppm"))
    }

    t("nat_kernel") {
      consume(graft.operators.TextAnalysis.naturalness(d))
      graft.operators.Dedup.unpersistAll()
    }
    t("nat_nopersist") {
      consume(naturalnessNoPersist(d))
    }
    t("nat_explode") {
      val df = naturalnessExplode(d)
      consume(df)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
