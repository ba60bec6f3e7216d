package graft

import java.time.{LocalDate, LocalDateTime}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIO

/** Pins the Avro container-file sink/source: full supported-type
  * round trip (including NULLs, binary, date, and BOTH timestamp
  * flavors through their spec'd logical types), the emitted Avro
  * schema's logical-type annotations, file-per-partition layout, and
  * the fail-fast on unmapped Catalyst types.
  */
class AvroIOSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/data"

  test("every supported type round-trips exactly, nulls included") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("s", StringType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType),
      StructField("day", DateType)))
    val rows = Seq(
      Row(1L, 42, 3.5, 1.25f, "hello, avro", true, Array[Byte](1, 2, -3),
        java.sql.Timestamp.valueOf("2024-02-29 12:34:56.123456"),
        LocalDateTime.parse("2024-02-29T12:34:56.123456"),
        java.sql.Date.valueOf(LocalDate.parse("2024-02-29"))),
      Row(2L, null, null, null, null, null, null, null, null, null),
      // pre-epoch values exercise the floorDiv/floorMod micros path
      Row(3L, -7, -0.0, -1.5f, "", false, Array.empty[Byte],
        java.sql.Timestamp.valueOf("1901-06-15 01:02:03.000007"),
        LocalDateTime.parse("1901-06-15T01:02:03.000007"),
        java.sql.Date.valueOf(LocalDate.parse("1901-06-15"))))
    val df = spark.createDataFrame(rows.asJava, schema)
    val p = tmp("avro_types")
    AvroIO.write(df, p)
    val back = AvroIO.read(spark, p, schema)
    assert(back.schema == schema)
    val (orig, got) = (
      df.collect().sortBy(_.getLong(0)),
      back.collect().sortBy(_.getLong(0)))
    orig.zip(got).foreach { case (o, g) =>
      (0 until schema.length).foreach { j =>
        (o.get(j), g.get(j)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b), s"col $j")
          case (a, b) => assert(a == b, s"col $j: $a != $b")
        }
      }
    }
  }

  test("nullable short/byte columns write through the [null,int] union") {
    // Avro's union resolution recognizes only java.lang.Integer for
    // the int branch — unconverted Short/Byte values used to throw
    // "Unknown datum type" at write time
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sh", ShortType),
      StructField("by", ByteType)))
    val rows = Seq(
      Row(1L, 123.toShort, 7.toByte),
      Row(2L, null, null),
      Row(3L, Short.MinValue, Byte.MaxValue))
    val df = spark.createDataFrame(rows.asJava, schema)
    val p = tmp("avro_short")
    AvroIO.write(df, p)
    val got = AvroIO.read(spark, p, schema).collect().sortBy(_.getLong(0))
    assert(got(0).getShort(1) == 123.toShort && got(0).getByte(2) == 7.toByte)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(2).getShort(1) == Short.MinValue && got(2).getByte(2) == Byte.MaxValue)
  }

  test("timestamps carry the Avro spec's logical types in the emitted schema") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType),
      StructField("day", DateType)))
    val avro = AvroIO.toAvroSchema(schema)
    def logicalOf(field: String): String = {
      val union = avro.getField(field).schema()
      val t = union.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL).get
      Option(t.getLogicalType).map(_.getName).getOrElse("")
    }
    assert(logicalOf("ts") == "timestamp-micros")
    assert(logicalOf("ntz") == "local-timestamp-micros")
    assert(logicalOf("day") == "date")
  }

  test("one container file per partition; read parallelism follows files") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id").repartition(4)
    val p = tmp("avro_parts")
    AvroIO.write(df, p)
    val files = new java.io.File(p).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".avro")) == 4, files.mkString(","))
    assert(files.contains("_schema.avsc"))
    val back = AvroIO.read(spark, p, df.schema)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq == (1L to 100L))
  }

  test("array columns round-trip — including the real embeddings table") {
    // synthetic: nullable array of nullable ints
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("xs", ArrayType(IntegerType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq(1, null, 3)),
      Row(2L, null),
      Row(3L, Seq.empty[Int]))
    val df = spark.createDataFrame(rows.asJava, schema)
    val p = tmp("avro_arr")
    AvroIO.write(df, p)
    val got = AvroIO.read(spark, p, schema).collect().sortBy(_.getLong(0))
    assert(got(0).getSeq[Any](1) == Seq(1, null, 3))
    assert(got(1).isNullAt(1))
    assert(got(2).getSeq[Any](1).isEmpty)
    // the production shape: embeddings (ARRAY<FLOAT>) hash-identical
    // through the Avro round trip
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p2 = tmp("avro_emb")
    AvroIO.write(emb, p2)
    val back = AvroIO.read(spark, p2, emb.schema)
    import org.apache.spark.sql.functions.{col, concat_ws, expr, xxhash64}
    def digest(d: org.apache.spark.sql.DataFrame): Long = d
      .select(xxhash64(col("vec_id"), concat_ws(",", col("embedding").cast("array<string>"))).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(back.count() == emb.count())
    assert(digest(back) == digest(emb))
  }

  test("mid-write failure never touches the target (rename-based commit)") {
    import spark.implicits._
    val p = tmp("avro_commit")
    val schema = StructType(Seq(StructField("id", LongType, nullable = false)))
    AvroIO.write((1L to 10L).toDF("id").repartition(2), p)
    val committed = new java.io.File(p).listFiles().map(_.getName).sorted.toSeq
    // a write whose partition containing 100 throws mid-stream, AFTER
    // some rows have already been appended to its container file
    val bad = (1L to 100L).toDF("id").repartition(4).as[Long]
      .map(v => { if (v == 100L) throw new RuntimeException("boom"); v })
      .toDF("id")
    intercept[org.apache.spark.SparkException] { AvroIO.write(bad, p) }
    // target: exactly the previously committed contents, readable
    assert(new java.io.File(p).listFiles().map(_.getName).sorted.toSeq == committed)
    assert(AvroIO.read(spark, p, schema).count() == 10)
    // and no staging/partial debris beside it
    val siblings = new java.io.File(p).getParentFile.listFiles().map(_.getName)
    assert(!siblings.exists(_.contains("__staging")), siblings.mkString(","))
    // first-ever write failing: the target path never appears at all
    val p2 = tmp("avro_commit_fresh")
    intercept[org.apache.spark.SparkException] { AvroIO.write(bad, p2) }
    assert(!new java.io.File(p2).exists())
    assert(!new java.io.File(p2).getParentFile.listFiles()
      .map(_.getName).exists(_.contains("__staging")))
  }

  test("overwrite replaces prior contents; unsupported types fail fast") {
    import spark.implicits._
    val p = tmp("avro_ow")
    AvroIO.write((1L to 10L).toDF("id").repartition(8), p)
    AvroIO.write((1L to 3L).toDF("id").repartition(1), p)
    assert(AvroIO.read(spark, p, StructType(Seq(StructField("id", LongType)))).count() == 3)
    val nested = (1L to 3L).toDF("id").withColumn("a", org.apache.spark.sql.functions.array())
    val e = intercept[IllegalArgumentException] { AvroIO.toAvroSchema(nested.schema) }
    assert(e.getMessage.contains("does not map"))
  }
}
