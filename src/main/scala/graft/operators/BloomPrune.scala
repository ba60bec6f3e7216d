package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a bloom filter over the small
  * side's join keys, broadcast it, and filter the large side *before*
  * its shuffle — the manual, always-on form of Spark's AQE runtime
  * bloom filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
  * which only injects when selectivity estimates line up).
  *
  * Why this matters at 100 TB: a selective dimension-side predicate
  * (say 2% of suppliers) normally still shuffles EVERY fact row —
  * the join can only drop non-matching rows after the exchange. The
  * bloom prefilter drops ~98% of fact rows at the scan side for the
  * cost of one broadcast of a few-MB bitmap, shrinking the dominant
  * shuffle by the dimension's selectivity. False positives only cost
  * wasted shuffle rows; the exact join afterwards keeps the result
  * identical to a plain join — which is exactly how the oracle checks
  * it.
  *
  * Built from Spark's own (catalyst-internal but public) runtime
  * filter expressions — `BloomFilterAggregate` is a mergeable
  * TypedImperativeAggregate (partial aggregation per partition, OR
  * -merge of bitmaps), `BloomFilterMightContain` is codegen'd — so
  * the build side is one narrow pass, not a collect.
  */
object BloomPrune {

  /** Register `bloom_agg(xxhash64_value, est_items, num_bits)` and
    * `bloom_might_contain(bloom, xxhash64_value)` for SQL/`expr()`
    * use (idempotent). Values must be pre-hashed to BIGINT with
    * `xxhash64(...)`, mirroring what Spark's injected runtime filters
    * do for non-long keys.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Inner-join `large` to `small`, pruning `large` with a bloom
    * filter over `small`'s keys before the join's exchange.
    *
    * @param estItems expected distinct keys on the small side — sizes
    *                 the bitmap (`numBits = 8 × estItems` ≈ 2% false
    *                 positives, the same default ratio Spark's runtime
    *                 filter uses)
    */
  def prunedJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      estItems: Long = 1000000L): DataFrame = {
    val spark = large.sparkSession
    register(spark)
    val numBits = 8L * estItems
    // might_contain requires its bloom input to be a constant or a
    // scalar subquery — the subquery runs once, then the predicate is
    // a constant-bitmap probe evaluated before the join's exchange
    val bloom = small
      .agg(expr(s"bloom_agg(xxhash64($smallKey), ${estItems}L, ${numBits}L)").as("_bloom"))
      .scalar()
    val pruned = large
      .filter(call_function("bloom_might_contain", bloom, xxhash64(col(largeKey))))
    // same-named keys would make `col(largeKey) === col(smallKey)`
    // ambiguous — use a USING join there (one shared key column out)
    if (largeKey == smallKey) pruned.join(small, Seq(largeKey))
    else pruned.join(small, col(largeKey) === col(smallKey))
  }
}
