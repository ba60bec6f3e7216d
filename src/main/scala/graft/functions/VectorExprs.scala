package graft.functions

/** Paired Spark-SQL / DuckDB-SQL expression generators for vector
  * math over `ARRAY<FLOAT>` embedding columns. All arithmetic is done
  * in DOUBLE with a strict left-fold, which both engines implement
  * identically (Spark `aggregate` with 0.0 init ≡ DuckDB
  * `list_reduce` seeded by the first element, since 0.0 + x == x in
  * IEEE754) — so cosine/L2 values are bit-identical across engines
  * and need no tolerance in the oracle compare.
  */
object VectorExprs {

  /** Embedding dimensionality of the test tables (TESTDATA.md). */
  val Dim = 64

  /** Spark side uses the codegen'd [[VecDot]]/[[VecL2Sq]] kernels —
    * callers must have called `VecDot.register(spark)`. Left-to-right
    * double accumulation, bit-identical to the DuckDB folds below.
    */
  def dotSpark(a: String, b: String): String = s"vec_dot($a, $b)"
  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)), (acc, v) -> acc + v)"

  def l2sqSpark(a: String, b: String): String = s"vec_l2sq($a, $b)"
  def l2sqDuck(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> (($a[i]::DOUBLE) - ($b[i]::DOUBLE)) * (($a[i]::DOUBLE) - ($b[i]::DOUBLE))), (acc, v) -> acc + v)"

  def cosineSpark(a: String, b: String): String =
    s"(${dotSpark(a, b)}) / (sqrt(${dotSpark(a, a)}) * sqrt(${dotSpark(b, b)}))"
  def cosineDuck(a: String, b: String): String =
    s"(${dotDuck(a, b)}) / (sqrt(${dotDuck(a, a)}) * sqrt(${dotDuck(b, b)}))"
}
