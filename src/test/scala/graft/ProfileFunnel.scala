package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway per-gate cost profile for the curation funnel (test
  * scope; run via `Test/runMain graft.ProfileFunnel`). Not part of
  * the driver surface.
  */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val docs = docs0.crossJoin(spark.range(16).toDF("r"))
      .withColumn("doc_id", col("doc_id") * 16 + col("r"))
      .select("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/prof_docs16")
    val d = spark.read.parquet("/tmp/prof_docs16")

    def consume(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(max(col("h"))).collect()
      ()
    }
    def t(label: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label%-12s ${times.min}%.3f s")
    }
    t("scan") { consume(d.select(col("doc_id"), length(col("text")).as("l"))) }
    t("tokens") { consume(d.select(col("doc_id"),
      expr(graft.functions.TextExprs.tokenCountSpark("text")).as("n"))) }
    t("quality") { consume(graft.operators.TextAnalysis.quality(d)) }
    t("langid") { consume(graft.operators.TextAnalysis.langId(d)) }
    t("repetition") { consume(graft.operators.TextAnalysis.repetition(d)) }
    t("funnel") { consume(graft.operators.TextAnalysis.curationFunnel(d)) }
    spark.stop()
  }
}
