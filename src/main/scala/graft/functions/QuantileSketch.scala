package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable quantile sketch — the quantile analog of
  * [[graft.operators.ProfileSketch]]'s HLL rows, for drift monitoring
  * of value DISTRIBUTIONS without re-scanning sources.
  *
  * The sketch is DDSketch-shaped (Masson et al., VLDB 2019):
  * log-spaced buckets `idx = ceil(log_gamma |x|)` with
  * `gamma = (1+α)/(1-α)`, so any quantile estimate is within relative
  * error α by construction. Chosen over GK/KLL because its state is a
  * bag of COUNTS: merge is pure addition — deterministic,
  * order-independent (a shuffle can deliver partials in any order and
  * the result is bit-identical), and exactly lossless, so
  * sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property the
  * no-rescan roll-up story rests on, which GK/KLL merges (compaction
  * depends on merge order) cannot give.
  *
  * Spark surface: `dd_sketch_agg(x)` aggregates values into a BINARY
  * state, `dd_union_agg(sketch)` merges states, and
  * `dd_quantile(sketch, q)` reads a quantile out — mirroring the
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate triple.
  */
object QuantileSketch {

  /** Relative-error parameter. */
  val Alpha = 0.01
  val Gamma: Double = (1 + Alpha) / (1 - Alpha)
  private val LogGamma = math.log(Gamma)

  /** Mutable aggregation state: log-bucket counts for positive and
    * negative values plus a zero counter.
    */
  final class State(
      val pos: mutable.LongMap[Long] = mutable.LongMap.empty,
      val neg: mutable.LongMap[Long] = mutable.LongMap.empty,
      var zero: Long = 0L) {

    def insert(x: Double): Unit =
      if (x == 0.0 || x.isNaN) zero += 1 // NaN guarded upstream; count defensively
      else if (x > 0) { val i = bucket(x); pos(i) = pos.getOrElse(i, 0L) + 1 }
      else { val i = bucket(-x); neg(i) = neg.getOrElse(i, 0L) + 1 }

    def mergeIn(o: State): Unit = {
      o.pos.foreach { case (i, c) => pos(i) = pos.getOrElse(i, 0L) + c }
      o.neg.foreach { case (i, c) => neg(i) = neg.getOrElse(i, 0L) + c }
      zero += o.zero
    }

    def total: Long = zero + pos.values.sum + neg.values.sum
  }

  /** Bucket index, clamped into Int range so the serialized form
    * (Int indices) is lossless for EVERY double: ±Infinity buckets at
    * ±Int.MaxValue, whose bucketValue is ±Infinity again — without
    * the clamp an Infinity landed on Long.MaxValue, serialized as -1,
    * and corrupted both quantiles and the bit-identical-merge
    * invariant after any shuffle of partial states.
    */
  private def bucket(absX: Double): Long = {
    val raw = math.ceil(math.log(absX) / LogGamma)
    if (raw >= Int.MaxValue) Int.MaxValue.toLong
    else if (raw <= Int.MinValue) Int.MinValue.toLong
    else raw.toLong
  }

  /** Midpoint estimator for bucket i: 2·γ^i / (γ+1), within α of every
    * value the bucket covers.
    */
  private def bucketValue(i: Long): Double =
    2.0 * math.pow(Gamma, i.toDouble) / (Gamma + 1.0)

  def serialize(s: State): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + 4 + 12 * (s.pos.size + s.neg.size))
    buf.putLong(s.zero)
    buf.putInt(s.pos.size)
    buf.putInt(s.neg.size)
    // sorted for a canonical byte form: equal sketches serialize equal
    s.pos.toSeq.sortBy(_._1).foreach { case (i, c) => buf.putInt(i.toInt); buf.putLong(c) }
    s.neg.toSeq.sortBy(_._1).foreach { case (i, c) => buf.putInt(i.toInt); buf.putLong(c) }
    buf.array()
  }

  def deserialize(b: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(b)
    val s = new State(zero = buf.getLong)
    val np = buf.getInt
    val nn = buf.getInt
    var k = 0
    while (k < np) { val i = buf.getInt; val c = buf.getLong; s.pos(i.toLong) = c; k += 1 }
    k = 0
    while (k < nn) { val i = buf.getInt; val c = buf.getLong; s.neg(i.toLong) = c; k += 1 }
    s
  }

  /** Quantile read-out: rank `ceil(q·n)` over neg-desc, zero, pos-asc
    * cumulative counts. NULL (None) on an empty sketch; q is clamped
    * into [0, 1] (so rank ≤ n and the cumulative walk always
    * terminates inside a bucket — an out-of-range q used to fall
    * through to `pos.keys.max`, which throws when no positives exist).
    */
  def quantile(s: State, q: Double): Option[Double] = {
    val n = s.total
    if (n == 0L) return None
    val qc = math.min(1.0, math.max(0.0, q))
    val rank = math.min(n, math.max(1L, math.ceil(qc * n).toLong))
    var seen = 0L
    for ((i, c) <- s.neg.toSeq.sortBy(-_._1)) {
      seen += c
      if (seen >= rank) return Some(-bucketValue(i))
    }
    seen += s.zero
    if (seen >= rank) return Some(0.0)
    for ((i, c) <- s.pos.toSeq.sortBy(_._1)) {
      seen += c
      if (seen >= rank) return Some(bucketValue(i))
    }
    None // unreachable: rank ≤ n and every count was walked
  }

  /** Static helper for [[DDQuantile]]'s codegen. */
  def quantileOrNull(bytes: Array[Byte], q: Double): java.lang.Double =
    quantile(deserialize(bytes), q).map(java.lang.Double.valueOf).orNull

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "dd_sketch_agg", exprs => DDSketchAgg(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "dd_union_agg", exprs => DDUnionAgg(exprs.head), "built-in")
    // q literals arrive as DECIMAL from SQL; coerce at build time
    // (ImplicitCastInputTypes' AbstractDataType is sql-private)
    reg.createOrReplaceTempFunction(
      "dd_quantile", exprs => DDQuantile(
        exprs.head,
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs(1), DoubleType)), "built-in")
  }
}

/** `dd_sketch_agg(x)`: DOUBLE values → serialized sketch (BINARY). */
case class DDSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.State] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dd_sketch_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dd_sketch_agg requires DOUBLE input (cast explicitly), got ${other.catalogString}")
    }

  override def createAggregationBuffer(): QuantileSketch.State = new QuantileSketch.State()

  override def update(
      buffer: QuantileSketch.State, input: InternalRow): QuantileSketch.State = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }

  override def merge(
      buffer: QuantileSketch.State, other: QuantileSketch.State): QuantileSketch.State = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: QuantileSketch.State): Any =
    QuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSketch.State): Array[Byte] =
    QuantileSketch.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): QuantileSketch.State =
    QuantileSketch.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DDSketchAgg =
    copy(child = newChildren.head)
}

/** `dd_union_agg(sketch)`: merge serialized sketches (BINARY → BINARY). */
case class DDUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.State] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dd_union_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dd_union_agg requires BINARY sketch input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): QuantileSketch.State = new QuantileSketch.State()

  override def update(
      buffer: QuantileSketch.State, input: InternalRow): QuantileSketch.State = {
    val v = child.eval(input)
    if (v != null)
      buffer.mergeIn(QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(
      buffer: QuantileSketch.State, other: QuantileSketch.State): QuantileSketch.State = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: QuantileSketch.State): Any =
    QuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSketch.State): Array[Byte] =
    QuantileSketch.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): QuantileSketch.State =
    QuantileSketch.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): DDUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DDUnionAgg =
    copy(child = newChildren.head)
}

/** `dd_quantile(sketch, q)`: read quantile q out of a serialized
  * sketch; NULL for an empty sketch.
  */
case class DDQuantile(left: Expression, right: Expression) extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dd_quantile"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dd_quantile requires (BINARY, DOUBLE), got $other")
    }

  protected override def nullSafeEval(sketch: Any, q: Any): Any =
    QuantileSketch.quantileOrNull(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("ddq")
    nullSafeCodeGen(ctx, ev, (s, q) =>
      s"""java.lang.Double $res = graft.functions.QuantileSketch.quantileOrNull($s, $q);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDQuantile =
    copy(left = newLeft, right = newRight)
}
