package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measurement probe for the text-SimHash ingest fixture geometry
  * (the dHash fixture lesson applied to 30-bit text fingerprints):
  * before wiring q_dedup_simhash_incremental's planted copies, pin
  * (a) the Hamming histogram between each original and its
  * tail-appended copy — the planted signal must land mostly within
  * the probe radius — and (b) the non-planted floor (nearest
  * cross-pair among UNRELATED docs), which decides how much
  * incidental pairing the unblocked state probe admits. Run:
  * `Test/runMain graft.ProbeSimhashIngest /root/testdata/sf0.01`.
  * Numbers recorded in FIXTURES.md next to the simhash ingest
  * queries.
  */
object ProbeSimhashIngest {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.sources.Tables.documents(spark, dir)

    for (tail <- Seq(" ingest tail", " near dup extra tail", " x")) {
      val batch = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(col("text"), lit(tail)))
      val corpusFp = Dedup.simhashFingerprints(docs)
      val batchFp = Dedup.simhashFingerprints(batch)
      // planted distances: copy vs its own source
      val planted = batchFp.as("b")
        .join(corpusFp.as("c"), col("b.doc_id") - 1000000L === col("c.doc_id"))
        .select(
          bit_count(col("b.fph").bitwiseXOR(col("c.fph"))).as("hamming"))
        .groupBy("hamming").count().orderBy("hamming")
      println(s"=== tail '$tail': planted copy→source Hamming histogram ===")
      planted.collect().foreach(r => println(s"  h=${r.get(0)} n=${r.get(1)}"))
      // non-planted floor: batch vs every UNRELATED corpus doc
      val floor = batchFp.as("b")
        .join(corpusFp.as("c"), col("b.doc_id") - 1000000L =!= col("c.doc_id"))
        .select(
          bit_count(col("b.fph").bitwiseXOR(col("c.fph"))).as("hamming"))
        .groupBy("hamming").count().orderBy("hamming").limit(8)
      println(s"=== tail '$tail': non-planted floor (lowest Hamming buckets) ===")
      floor.collect().foreach(r => println(s"  h=${r.get(0)} n=${r.get(1)}"))
    }
    spark.stop()
  }
}
