package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd kernels for int8-quantized embeddings.
  *
  * At 100 TB the embedding column dominates storage and scan I/O:
  * FLOAT is 4 bytes/component, so symmetric int8 scalar quantization
  * (the faiss `SQ8` layout) cuts the column to a quarter. These
  * kernels make the quantized form a first-class citizen:
  *
  *   - [[I8Pack]] packs `ARRAY<INT>` codes (each in [-128, 127]) into
  *     a `BINARY` of one byte per component — the actual wire/storage
  *     layout, with none of Spark's per-element array overhead;
  *   - [[VecDotI8]] computes the integer dot product straight over
  *     the packed bytes in exact BIGINT arithmetic.
  *
  * Cosine over dequantized vectors needs NO float dequantization:
  * dequant(a) = scaleA · qa, so the per-vector scales cancel in
  * cos = (scaleA·scaleB·⟨qa,qb⟩) / (scaleA·|qa| · scaleB·|qb|) and
  * the whole similarity is integer dots plus one double divide —
  * bit-reproducible on any engine, which is what lets the DuckDB
  * oracle mirror it exactly (see `VectorExprs.dotIntDuck`).
  */
case class I8Pack(child: Expression) extends UnaryExpression {
  override def prettyName: String = "i8_pack"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<INT>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(v: Any): Any =
    Int8Vec.pack(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8Vec.pack($c)")
  override protected def withNewChildInternal(c: Expression): I8Pack =
    copy(child = c)
}

/** Fused quantize-and-pack: ARRAY<FLOAT> → BINARY in ONE pass
  * (max|x|, scale, round-half-up, pack), replacing the
  * `i8_pack(transform(...))` higher-order formulation whose
  * per-element interpreted lambdas dominated the quantization cost
  * at scale (measured 4.7 s vs 0.8 s float brute at ×64 before the
  * fuse). Bit-identical to the HOF form — spec-pinned — because the
  * arithmetic is the same IEEE doubles in the same order; the DuckDB
  * oracle keeps the list-comprehension form.
  */
case class I8Quantize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "i8_quantize"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(v: Any): Any =
    Int8Vec.quantize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8Vec.quantize($c)")
  override protected def withNewChildInternal(c: Expression): I8Quantize =
    copy(child = c)
}

/** ⟨a, b⟩ over two i8-packed vectors, exact in BIGINT. */
case class VecDotI8(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_dot_i8"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == BinaryType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BINARY inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  protected override def nullSafeEval(l: Any, r: Any): Any =
    Int8Vec.dot(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Int8Vec.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotI8 =
    copy(left = l, right = r)
}

/** ⟨f, c⟩ between a FLOAT vector and an i8-packed code vector, in
  * DOUBLE — the IVF-SQ8 probe kernel: stored lists carry 4×-smaller
  * codes, queries stay float, and the per-vector scale cancels in
  * the cosine exactly as in the all-quantized case.
  */
case class VecDotF8(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_dot_f_i8"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, BINARY), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  protected override def nullSafeEval(l: Any, r: Any): Any =
    Int8Vec.dotF8(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Int8Vec.dotF8($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotF8 =
    copy(left = l, right = r)
}

object Int8Vec {
  /** Static kernels so generated code can call them. */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // NULL components and out-of-range codes are caller bugs (the
      // quantizer can produce neither) — fail fast, don't wrap
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"i8_pack: NULL component at index $i")
      val v = a.getInt(i)
      if (v < -128 || v > 127)
        throw new IllegalArgumentException(
          s"i8_pack: component $i = $v outside signed-byte range [-128, 127]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** One-pass symmetric int8 quantization, the fused twin of
    * `i8_pack(quantCodes(...))` — see `VectorExprs.quantScaleSpark` /
    * `quantCodesSpark` for the arithmetic contract both share with
    * the DuckDB oracle.
    */
  def quantize(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"i8_quantize: NULL component at index $i")
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = math.max(maxAbs, 1e-30) / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble / scale + 0.5).toInt.toByte
      i += 1
    }
    out
  }

  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    // mismatched dims are a caller bug (the quantizer preserves the
    // input length) — truncating would quietly score a wrong
    // similarity, inconsistent with pack/quantize's fail-fast stance
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vec_dot_i8: vector lengths differ (${a.length} vs ${b.length})")
    val n = a.length
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }

  def dotF8(a: ArrayData, b: Array[Byte]): Double = {
    if (a.numElements() != b.length)
      throw new IllegalArgumentException(
        s"vec_dot_f_i8: vector lengths differ (${a.numElements()} vs ${b.length})")
    val n = b.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** Register `i8_pack` / `vec_dot_i8` for SQL/`expr()` use (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "i8_pack", exprs => I8Pack(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "i8_quantize", exprs => I8Quantize(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_i8", exprs => VecDotI8(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_f_i8", exprs => VecDotF8(exprs(0), exprs(1)), "built-in")
  }
}
