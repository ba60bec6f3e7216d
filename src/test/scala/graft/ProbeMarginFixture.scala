package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilaritySearch}
import graft.sources.Corpus

/** Scratch tuner for the assignMarginProbe spec fixture: sweeps the
  * crafted-pair geometry (offset norm, ε·|d| step) and reports which
  * combinations survive the rebuild as a genuine top-1 cluster split
  * with an in-left-tail gap. Run:
  * `Test/runMain graft.ProbeMarginFixture /root/testdata/sf0.001`.
  */
object ProbeMarginFixture {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val base = Corpus.embCorpus(spark, dir).select("vec_id", "embedding")
      .localCheckpoint(true)
    val idx0 = SimilaritySearch.buildIndex(base, centroidMod = 50)
    val cents = idx0.centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    // closest centroid pair — the bisector region most likely owned
    // by the two of them
    val pairs = for (i <- cents.indices; j <- cents.indices if i < j) yield {
      val d2 = cents(i)._2.indices
        .map(k => math.pow(cents(i)._2(k) - cents(j)._2(k), 2)).sum
      (d2, i, j)
    }
    val (d2min, i1, i2) = pairs.minBy(_._1)
    println(s"closest centroid pair: cid=${cents(i1)._1}, cid=${cents(i2)._1}, |d|=${math.sqrt(d2min)}")
    val c1 = cents(i1)._2; val c2 = cents(i2)._2
    val d = c1.indices.map(i => c2(i) - c1(i)).toArray
    val dn2 = d.map(x => x * x).sum
    val mid = c1.indices.map(i => (c1(i) + c2(i)) / 2).toArray
    val proj = d(0) / dn2
    val w0 = c1.indices.map(i => (if (i == 0) 1.0 else 0.0) - proj * d(i)).toArray
    val w0n = math.sqrt(w0.map(x => x * x).sum)
    for (off <- Seq(0.0, 0.2); step <- Seq(0.001, 0.002, 0.003, 0.005)) {
      val u = c1.indices.map(i => mid(i) + off * w0(i) / w0n).toArray
      val eps = step / math.sqrt(dn2)
      val va = c1.indices.map(i => (u(i) + eps * d(i)).toFloat).toSeq
      val vb = c1.indices.map(i => (u(i) - eps * d(i)).toFloat).toSeq
      val corpus = base
        .unionByName(Seq((900001L, va), (900003L, vb)).toDF("vec_id", "embedding")
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS FLOAT))").as("embedding")))
        .localCheckpoint(true)
      val dec0 = Dedup.semanticDedup(corpus).localCheckpoint(true)
      Dedup.unpersistAll()
      val rows = dec0.filter(col("vec_id").isin(900001L, 900003L))
        .orderBy("vec_id").collect()
      val split = rows(0).getLong(1) != rows(1).getLong(1)
      val bothKeep = rows.forall(_.getBoolean(3))
      // cosine of the pair
      val dot = va.indices.map(i => va(i).toDouble * vb(i)).sum
      val na = math.sqrt(va.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(vb.map(x => x.toDouble * x).sum)
      // gap + probe margins
      val probe = Dedup.assignMarginProbe(corpus, quantiles = Seq(0.01, 0.05))
        .orderBy("quantile").collect()
      Dedup.unpersistAll()
      val idx1 = SimilaritySearch.buildIndex(corpus, centroidMod = 50)
      val gaps = Dedup.multiAssignRows(
          idx1.assignments.select(col("cand_id").as("vec_id"), col("cand_emb")),
          idx1.centroids, effTop = 2, assignMargin = None)
        .groupBy("vec_id").agg((max(col("_d")) - min(col("_d"))).as("gap"))
        .filter(col("vec_id").isin(900001L, 900003L))
        .collect().map(r => f"${r.getDouble(1)}%.5f").mkString("/")
      Dedup.unpersistAll()
      println(f"off=$off%.1f step=$step%.2f split=$split bothKeep=$bothKeep " +
        f"cos=${dot / (na * nb)}%.5f pairGaps=$gaps " +
        f"q01=${probe(0).getDouble(1)}%.5f q05=${probe(1).getDouble(1)}%.5f")
    }
    spark.stop()
  }
}
