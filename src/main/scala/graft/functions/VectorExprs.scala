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

  // ---------- symmetric int8 scalar quantization (SQ8) ----------
  /** Per-vector quantization scale: max |xᵢ| / 127, floored at 1e-30
    * so an all-zero vector quantizes to all-zero codes instead of
    * dividing by zero. max/abs over floats are exact, the double
    * divide is IEEE-deterministic — both dialects produce the same
    * bits.
    */
  def quantScaleSpark(e: String): String =
    s"greatest(array_max(transform($e, x -> abs(CAST(x AS DOUBLE)))), 1E-30) / CAST(127 AS DOUBLE)"
  def quantScaleDuck(e: String): String =
    s"greatest(list_aggregate(list_transform($e, x -> abs(x::DOUBLE)), 'max'), 1e-30) / CAST(127 AS DOUBLE)"

  /** The int8 codes: round-half-up(x / scale) as `floor(v + 0.5)` —
    * floor is exact on doubles and identical in both engines, unlike
    * `round()` whose half-way tie rule differs by dialect. |x| ≤
    * 127·scale by construction, so codes land in [-127, 127] with no
    * clamp.
    */
  def quantCodesSpark(e: String, scale: String): String =
    s"transform($e, x -> CAST(floor(CAST(x AS DOUBLE) / ($scale) + CAST(0.5 AS DOUBLE)) AS INT))"
  def quantCodesDuck(e: String, scale: String): String =
    s"list_transform($e, x -> CAST(floor((x::DOUBLE) / ($scale) + 0.5::DOUBLE) AS INT))"

  /** Exact BIGINT dot over two INT-code lists — the oracle twin of
    * the packed-binary `vec_dot_i8` kernel.
    */
  def dotIntDuck(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> ($a[i]::BIGINT) * ($b[i]::BIGINT)), (acc, v) -> acc + v)"

  /** DOUBLE dot between a FLOAT vector and an INT-code list — the
    * oracle twin of the mixed-precision `vec_dot_f_i8` probe kernel.
    */
  def dotMixedDuck(f: String, c: String): String =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> ($f[i]::DOUBLE) * ($c[i]::DOUBLE)), (acc, v) -> acc + v)"

  /** L2² fold over two ALREADY-SLICED sub-vectors of length `len` —
    * the PQ (product-quantization) oracle twin of `vec_l2sq` over a
    * `slice(...)`: same left-to-right double accumulation, so
    * sub-space distances are bit-identical across engines.
    */
  def l2sqSubDuck(a: String, b: String, len: Int): String =
    s"list_reduce(list_transform(range(1, ${len + 1}), i -> (($a[i]::DOUBLE) - ($b[i]::DOUBLE)) * (($a[i]::DOUBLE) - ($b[i]::DOUBLE))), (acc, v) -> acc + v)"

  /** `x − c` per component: double subtract, rounded back to FLOAT —
    * one IEEE op each, so residual vectors are bit-identical across
    * engines (the IVFADC-residual composition depends on it; FLOAT
    * because the distance kernels and the PQ fit take ARRAY<FLOAT>).
    */
  def residualSpark(x: String, c: String): String =
    s"zip_with($x, $c, (xe, ce) -> CAST(CAST(xe AS DOUBLE) - CAST(ce AS DOUBLE) AS FLOAT))"
  def residualDuck(x: String, c: String): String =
    s"list_transform(range(1, ${Dim + 1}), i -> CAST(($x[i]::DOUBLE) - ($c[i]::DOUBLE) AS FLOAT))"

  // ---------- comparison-bit LSH bands (near-dup candidate blocking) ----------
  /** Winner-take-all-style sketch: bit t is `x[a_t] > x[b_t]` for a
    * fixed pseudo-random index pair (a_t, b_t). Comparisons are
    * invariant under positive per-vector scaling (float multiply by a
    * positive constant is monotone), so scaled near-duplicates collide
    * with probability ~1 — and the bits cost O(1) each, no dot
    * products. Grouped into [[CmpBands]] bands of [[CmpBitsPerBand]]
    * bits; candidate pairs agree on at least one whole band (same
    * banding scheme as MinHash-LSH). Cf. Yagnik et al., "The Power of
    * Comparative Reasoning" (ICCV 2011).
    */
  val CmpBands = 8
  val CmpBitsPerBand = 8

  /** Deterministic index pair for comparison bit `t` (both dialects
    * embed the same literals, so the bands are engine-identical).
    */
  def cmpPair(t: Int): (Int, Int) = {
    def h(x: Int): Int = (((x + 1) * 2654435761L) % 1000000007L % Dim).toInt
    val a = h(2 * t)
    val b0 = h(2 * t + 1)
    val b = if (b0 == a) (b0 + 1) % Dim else b0
    (a, b)
  }

  /** One packed band-key expression per band. Spark arrays index
    * 0-based, DuckDB lists 1-based.
    */
  def cmpBandKeysSpark(e: String): Seq[String] =
    (0 until CmpBands).map { band =>
      (0 until CmpBitsPerBand).map { j =>
        val (a, b) = cmpPair(band * CmpBitsPerBand + j)
        s"(CASE WHEN $e[$a] > $e[$b] THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
    }
  def cmpBandKeysDuck(e: String): Seq[String] =
    (0 until CmpBands).map { band =>
      (0 until CmpBitsPerBand).map { j =>
        val (a, b) = cmpPair(band * CmpBitsPerBand + j)
        s"(CASE WHEN $e[${a + 1}] > $e[${b + 1}] THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
    }
}
