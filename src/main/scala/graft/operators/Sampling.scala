package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: a per-stratum sampling rate
  * applied as a pure hash filter.
  *
  * Like `q_hash_sample`'s uniform variant, this is the only sampling
  * shape that survives scale: `df.stat.sampleBy` draws per-partition
  * RNGs (non-reproducible across runs/engines and not a pushable
  * predicate), while a key-hash modulus is a stateless filter — no
  * shuffle, no RNG state, evaluated at the scan, and any engine
  * (including the DuckDB oracle) reproduces the exact row set.
  * Training-data pipelines lean on this constantly: downsample the
  * over-represented stratum (e.g. English web text) without touching
  * the rare ones.
  */
object Sampling {

  /** Keep rows where `hash(key) % modulus(stratum) == 0`; a stratum's
    * modulus m keeps ~1/m of its rows (deterministically).
    *
    * @param hashExpr  SQL expression producing a non-negative BIGINT
    *                  hash of the row key (e.g. a registered
    *                  `poly_hash`-based expression)
    * @param mods      stratum value → modulus
    * @param defaultMod modulus for strata not listed
    */
  def stratifiedHash(
      df: DataFrame,
      strataCol: String,
      hashExpr: String,
      mods: Seq[(String, Int)],
      defaultMod: Int): DataFrame = {
    require(mods.nonEmpty, "need at least one stratum rate")
    df.filter(expr(
      s"(${mixedHash(hashExpr)}) % (${modulusCase(strataCol, mods, defaultMod)}) = 0"))
  }

  /** Multiplicative re-mix of a hash before the modulus, dialect
    * -neutral. Needed because poly_hash's base 31 ≡ 1 (mod 10): over
    * short numeric keys, `hash % 10` degenerates to char-code-sum mod
    * 10, which correlates with the key — a ×Knuth-constant step mod
    * the same prime breaks the congruence for any small modulus.
    * Inputs < 2³⁰·ish keep the product well inside signed-64 range in
    * both engines.
    */
  def mixedHash(hashExpr: String): String =
    s"((($hashExpr) * 2654435761) % 1000000007)"

  /** The dialect-neutral `CASE stratum WHEN ... END` modulus picker —
    * shared verbatim by the Spark filter and the DuckDB oracle.
    */
  def modulusCase(strataCol: String, mods: Seq[(String, Int)], defaultMod: Int): String =
    s"CASE $strataCol " +
      mods.map { case (v, m) => s"WHEN '$v' THEN $m" }.mkString(" ") +
      s" ELSE $defaultMod END"
}
