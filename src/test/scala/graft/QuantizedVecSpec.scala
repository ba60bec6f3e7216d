package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Int8Vec, VectorExprs}
import graft.operators.{Sampling, SimilaritySearch}

/** int8 embedding quantization (pack kernel, integer-dot kernel,
  * quantized top-k, recall) and the training-shard exporter.
  */
class QuantizedVecSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(4099)

  /** n random dim-64 float vectors as an embeddings-shaped frame. */
  private def randEmb(n: Int): org.apache.spark.sql.DataFrame = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, (0 until VectorExprs.Dim).map(_ => rnd.nextFloat() * 2f - 1f))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false)))))
  }

  test("i8_pack packs codes byte-for-byte and rejects out-of-range / NULL components") {
    Int8Vec.register(spark)
    import spark.implicits._
    val packed = Seq((1L, Seq(-128, -1, 0, 1, 127)))
      .toDF("id", "codes")
      .select(expr("i8_pack(codes)").as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(packed.toSeq == Seq[Byte](-128, -1, 0, 1, 127))

    val err = intercept[Exception] {
      Seq((1L, Seq(128))).toDF("id", "codes").select(expr("i8_pack(codes)")).collect()
    }
    assert(err.getMessage != null)
  }

  test("vec_dot_i8 over packed bytes ≡ the higher-order integer dot on random codes") {
    Int8Vec.register(spark)
    import spark.implicits._
    val df = (1 to 80).map { i =>
      (i.toLong,
        (0 until VectorExprs.Dim).map(_ => rnd.nextInt(255) - 127),
        (0 until VectorExprs.Dim).map(_ => rnd.nextInt(255) - 127))
    }.toDF("id", "a", "b")
    val bad = df
      .withColumn("kernel", expr("vec_dot_i8(i8_pack(a), i8_pack(b))"))
      .withColumn("twin", expr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .filter(col("kernel") =!= col("twin"))
    assert(bad.isEmpty, s"kernel/twin dot divergence: ${bad.collect().mkString("; ")}")
  }

  test("fused i8_quantize ≡ i8_pack over the HOF code formulation, byte for byte") {
    Int8Vec.register(spark)
    val emb = randEmb(120)
    val scale = VectorExprs.quantScaleSpark("embedding")
    val bad = emb
      .withColumn("fused", expr("i8_quantize(embedding)"))
      .withColumn("hof", expr(s"i8_pack(${VectorExprs.quantCodesSpark("embedding", scale)})"))
      .filter(col("fused") =!= col("hof"))
    assert(bad.isEmpty, s"fused/HOF quantization divergence: ${bad.collect().take(3).mkString("; ")}")
  }

  test("quantization codes stay in [-127, 127] with per-component error ≤ scale/2") {
    val emb = randEmb(60)
    val scale = VectorExprs.quantScaleSpark("embedding")
    val checked = emb
      .withColumn("scale", expr(scale))
      .withColumn("codes", expr(VectorExprs.quantCodesSpark("embedding", scale)))
      .withColumn("in_range", expr("forall(codes, c -> c >= -127 AND c <= 127)"))
      .withColumn("max_err", expr(
        "array_max(zip_with(codes, embedding, (c, x) -> abs(CAST(c AS DOUBLE) * scale - CAST(x AS DOUBLE))))"))
    val bad = checked.filter(!col("in_range") || col("max_err") > col("scale") / 2 + lit(1e-12))
    assert(bad.isEmpty, s"quantization violation: ${bad.collect().take(3).mkString("; ")}")
  }

  test("codes are invariant under exact power-of-two scaling of the vector") {
    // ×2 is exact in float arithmetic, scale doubles with max|x|, so
    // x/scale — and therefore every code — must not move a bit
    val emb = randEmb(40)
    val scale = VectorExprs.quantScaleSpark("embedding")
    val doubled = emb.withColumn(
      "embedding", expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))"))
    val a = emb.select(col("vec_id"), expr(VectorExprs.quantCodesSpark("embedding", scale)).as("c"))
    val b = doubled.select(col("vec_id"), expr(VectorExprs.quantCodesSpark("embedding", scale)).as("c2"))
    val bad = a.join(b, "vec_id").filter(col("c") =!= col("c2"))
    assert(bad.isEmpty, s"codes moved under ×2 scaling: ${bad.collect().take(3).mkString("; ")}")
  }

  test("packed-binary quantized top-k ≡ the ARRAY<INT> code formulation (the oracle's form)") {
    val emb = randEmb(150)
    val fast = SimilaritySearch.quantizedTopK(emb, k = 3, queryMod = 10)
    // the oracle twin: same arithmetic over unpacked codes, no binary
    val scale = VectorExprs.quantScaleSpark("embedding")
    val codes = emb.select(
      col("vec_id"),
      expr(VectorExprs.quantCodesSpark("embedding", scale)).as("qemb"))
      .withColumn("nsq", expr(
        "aggregate(zip_with(qemb, qemb, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
    val q = codes.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("qemb").as("qq"), col("nsq").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    val slow = codes.select(col("vec_id").as("cand_id"), col("qemb").as("cq"), col("nsq").as("cn"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", expr(
        "CAST(aggregate(zip_with(qq, cq, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)" +
          " / sqrt(CAST(qn * cn AS DOUBLE))"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(
        col("query_id"), col("rank").cast("long").as("rank"), col("cand_id"),
        floor(expr("CAST(1000000 AS DOUBLE)") * col("cos")).cast("long").as("qcos_ppm"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "packed kernel path diverges from the array-code formulation")
  }

  test("vec_dot_f_i8 ≡ the higher-order mixed dot on random float×code pairs") {
    Int8Vec.register(spark)
    import spark.implicits._
    val df = (1 to 60).map { i =>
      (i.toLong,
        (0 until VectorExprs.Dim).map(_ => rnd.nextFloat() * 2f - 1f),
        (0 until VectorExprs.Dim).map(_ => rnd.nextInt(255) - 127))
    }.toDF("id", "f", "c")
    val bad = df
      .withColumn("kernel", expr("vec_dot_f_i8(f, i8_pack(c))"))
      .withColumn("twin", expr(
        "aggregate(zip_with(f, c, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .filter(col("kernel") =!= col("twin"))
    assert(bad.isEmpty, s"mixed-dot kernel/twin divergence: ${bad.collect().take(3).mkString("; ")}")
  }

  test("IVF-SQ8 returns the float IVF's neighbors on separated clusters") {
    // same planted geometry as the recall test: int8 noise cannot
    // reorder cluster mates vs outsiders, and both paths probe the
    // same lists — so the NEIGHBOR SET (not the ppm scores) matches
    val rows = (0 until 150).map { i =>
      val c = i / 5
      val center = (0 until VectorExprs.Dim).map { d =>
        math.sin(0.7 * (c + 1) * (d + 1)).toFloat * 10f
      }
      Row(i.toLong, center.map(x => x + rnd.nextFloat() * 0.01f))
    }
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false)))))
    val fl = SimilaritySearch
      .ivfTopK(emb, k = 4, queryMod = 15, centroidMod = 10)
      .select("query_id", "cand_id")
    val q8 = SimilaritySearch
      .ivfSq8TopK(emb, k = 4, queryMod = 15, centroidMod = 10)
      .select("query_id", "cand_id")
    assert(fl.exceptAll(q8).isEmpty && q8.exceptAll(fl).isEmpty,
      "IVF-SQ8 neighbor set diverges from float IVF on separated clusters")
  }

  test("SQ8 inverted lists are materially smaller on parquet than float lists") {
    // the 100 TB claim measured at spec scale: same index, both
    // payloads written to parquet, code-form must be well under half
    // the float bytes (raw ratio is 4×; parquet framing narrows it)
    val emb = randEmb(2000)
    val idx = SimilaritySearch.buildIndex(emb, centroidMod = 45)
    val q8 = SimilaritySearch.quantizeAssignments(idx)
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8_size_").toString
    def bytesOf(p: String): Long = {
      val files = new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
      files.map(_.length()).sum
    }
    try {
      idx.assignments.write.mode("overwrite").parquet(s"$dir/float")
      q8.assignments.write.mode("overwrite").parquet(s"$dir/sq8")
      val (fb, qb) = (bytesOf(s"$dir/float"), bytesOf(s"$dir/sq8"))
      assert(qb.toDouble / fb < 0.5,
        s"SQ8 lists not smaller enough: float=$fb bytes, sq8=$qb bytes")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("a quantized index probes identically after a writeIndex/readIndex round trip") {
    // the deployment shape: build once, quantize, persist as cid=
    // inverted-list dirs, probe from storage — BINARY codes and the
    // integer norms must survive parquet untouched
    val emb = randEmb(300)
    val q8 = SimilaritySearch.quantizeAssignments(
      SimilaritySearch.buildIndex(emb, centroidMod = 20))
    val queries = emb.filter(col("vec_id") % 30 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8_rt_").toString
    try {
      SimilaritySearch.writeIndex(q8, dir)
      val back = SimilaritySearch.readIndex(spark, dir)
      val mem = SimilaritySearch.probeQuant(q8, queries, k = 3)
      val disk = SimilaritySearch.probeQuant(back, queries, k = 3)
      assert(mem.exceptAll(disk).isEmpty && disk.exceptAll(mem).isEmpty,
        "persisted quantized index probes differently than the in-memory one")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("quantized recall@k is high on separated clusters and bounded by k everywhere") {
    // planted geometry: 30 tight clusters of 5; a query's exact
    // neighbors are its cluster mates, far from everything else —
    // int8 noise (~1/254 of the range) cannot flip that ordering
    val rows = (0 until 150).map { i =>
      val c = i / 5
      val center = (0 until VectorExprs.Dim).map { d =>
        // c+1: cluster 0 must not sit at the zero vector, where
        // cosine ordering would be pure noise
        math.sin(0.7 * (c + 1) * (d + 1)).toFloat * 10f
      }
      Row(i.toLong, center.map(x => x + rnd.nextFloat() * 0.01f))
    }
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false)))))
    val recall = SimilaritySearch.quantRecallAt(emb, k = 4, queryMod = 5)
    val got = recall.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 30)
    assert(got.values.forall(h => h >= 0 && h <= 4))
    // every query's 4 cluster mates must survive quantization
    assert(got.values.forall(_ == 4), s"cluster mates lost under int8: $got")
  }

  test("shardForTraining: exhaustive, dense per-shard sequences, deterministic, guarded") {
    graft.functions.PolyHash.register(spark)
    import spark.implicits._
    val docs = (1 to 500).map(i => (i.toLong, s"doc-$i")).toDF("doc_id", "payload")
    val h = graft.functions.TextExprs.charHashSpark("CAST(doc_id AS STRING)")
    val sharded = Sampling.shardForTraining(docs, "doc_id", h, numShards = 8)
    assert(sharded.count() == 500)
    // dense 1..n_s per shard, all 8 shards populated
    val per = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("seq").as("mx"), min("seq").as("mn"))
      .collect()
    assert(per.length == 8)
    per.foreach { r =>
      assert(r.getAs[Long]("mn") == 1L && r.getAs[Long]("mx") == r.getAs[Long]("n"))
    }
    // pure function of the key: a re-run is row-identical
    val again = Sampling.shardForTraining(docs, "doc_id", h, numShards = 8)
    assert(sharded.exceptAll(again).isEmpty && again.exceptAll(sharded).isEmpty)
    // placement and intra-shard order must not correlate: within a
    // shard, consecutive seqs should not be consecutive doc_ids
    // (a sorted-id order would mean the "shuffle" didn't shuffle)
    val sortedLikeId = sharded
      .withColumn("id_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")).cast("long"))
      .filter(col("id_rank") === col("seq"))
    assert(sortedLikeId.count() < 100, "within-shard order correlates with doc_id order")
    intercept[IllegalArgumentException](Sampling.shardForTraining(docs, "doc_id", h, 0))
    intercept[IllegalArgumentException](
      Sampling.shardForTraining(sharded, "doc_id", h, 8))
  }

  test("writeShards lands one file per shard with rows in seq order") {
    graft.functions.PolyHash.register(spark)
    import spark.implicits._
    val docs = (1 to 400).map(i => (i.toLong, s"t-$i")).toDF("doc_id", "payload")
    val h = graft.functions.TextExprs.charHashSpark("CAST(doc_id AS STRING)")
    val sharded = Sampling.shardForTraining(docs, "doc_id", h, numShards = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      Sampling.writeShards(sharded, dir, numShards = 4)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shardDirs.length == 4, s"expected 4 shard dirs, got ${shardDirs.map(_.getName).toSeq}")
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName}: expected 1 file, got ${files.length}")
      }
      // file order is seq order: reading one shard back without any
      // sort must yield ascending seq (what a data loader streams)
      val one = spark.read.parquet(s"$dir/shard=2").select("seq").collect().map(_.getLong(0))
      assert(one.toSeq == one.sorted.toSeq, "rows in shard file not in seq order")
      // round trip preserves the full row set
      val back = spark.read.parquet(dir)
        .select(col("doc_id"), col("shard").cast("long").as("shard"), col("seq"))
      val orig = sharded.select("doc_id", "shard", "seq")
      assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
