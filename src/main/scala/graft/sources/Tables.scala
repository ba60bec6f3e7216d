package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers for the driver test data
  * (/root/repo/TESTDATA.md), plus the deterministic before/after
  * diff fixtures (/root/repo/FIXTURES.md §B "Diff-fixture
  * construction"): the reference's core query needs a before/after
  * pair, so `after` sides are computed in-engine as pure
  * perturbations of a base table — no files written, fully
  * expressible in the DuckDB oracle SQL.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  /** events.ts has shipped in two parquet layouts across driver data
    * generations: TIMESTAMP(NANOS, isAdjustedToUTC=false), which
    * Spark's vectorized reader rejects — read nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong) and convert — and plain
    * TIMESTAMP_MICROS, which reads natively as TIMESTAMP_NTZ. Both
    * normalize to TIMESTAMP_NTZ micros — lossless for this data
    * (values are microsecond-resolution) and matching DuckDB's naive
    * TIMESTAMP in the oracle. Integer `DIV` keeps the full 63-bit
    * nanos precision (a double division would lose bits above 2^53).
    *
    * NOTE: the conf set here is session-global and must stay set for
    * the lifetime of this DataFrame (the parquet scan consults it at
    * execution, not just at schema inference), so it is deliberately
    * not restored. Side effect on other reads: TIMESTAMP(NANOS)
    * columns elsewhere in the session read as LongType instead of
    * failing — a benign direction, but order-dependent; sessions that
    * need the hard error should not touch the events table.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) layout, read as BIGINT nanos under the conf
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
      // native TIMESTAMP_MICROS layout (driver data from round 9 on):
      // same instants — just pin the NTZ type the engine standardizes on
      case org.apache.spark.sql.types.TimestampType =>
        // a session-TZ-adjusted read (isAdjustedToUTC=1 parquet) only
        // preserves instants through the NTZ cast when the session TZ
        // is UTC — assert it instead of relying on the harness pinning.
        // Accept any UTC-EQUIVALENT zone (Etc/UTC, GMT, +00:00): the
        // cast preserves instants under any fixed zero offset, so a
        // string-equality check would spuriously reject them.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        val rules = java.time.ZoneId.of(tz).getRules
        require(
          rules.isFixedOffset &&
            rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0,
          s"Tables.events: parquet ts read as TIMESTAMP (LTZ) and session time " +
            s"zone is '$tz' — the TIMESTAMP_NTZ cast would shift instants. Set " +
            "spark.sql.session.timeZone=UTC before reading events.")
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Deterministic "after" perturbation of lineitem (FIXTURES.md §B):
    *   - rows with l_orderkey % 101 == 0 dropped   → `_row_status` 5
    *   - rows with l_orderkey % 103 == 0 re-injected with negated
    *     order key                                  → `_row_status` 4
    *   - l_quantity + 1 where l_orderkey % 97 == 0  → status 1
    *   - l_tax nulled where l_orderkey % 89 == 0    → status 3
    *   - constant `extra_col` appended              → status 2 on every
    *     present-both row (added-column semantics,
    *     full_compare.sql.j2:45)
    * Keys: (l_orderkey, l_linenumber) — unique, so this also serves as
    * the duplicate-key fan-out control.
    */
  def lineitemAfter(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val base = li
      .filter(col("l_orderkey") % 101 =!= 0)
      .withColumn(
        "l_quantity",
        when(col("l_orderkey") % 97 === 0, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
      .withColumn(
        "l_tax",
        when(col("l_orderkey") % 89 === 0, lit(null).cast("double"))
          .otherwise(col("l_tax")))
    val injected = li
      .filter(col("l_orderkey") % 103 === 0)
      .withColumn("l_orderkey", -col("l_orderkey"))
    base.unionByName(injected).withColumn("extra_col", lit(1.0))
  }

  /** DuckDB-dialect SQL producing exactly [[lineitemAfter]], for
    * embedding in oracle queries as a CTE body.
    */
  val lineitemAfterSql: String =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
      |  CASE WHEN l_orderkey % 97 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
      |  l_extendedprice, l_discount,
      |  CASE WHEN l_orderkey % 89 = 0 THEN NULL ELSE l_tax END AS l_tax,
      |  l_returnflag, l_linestatus, l_shipdate,
      |  CAST(1.0 AS DOUBLE) AS extra_col
      |FROM lineitem WHERE l_orderkey % 101 <> 0
      |UNION ALL
      |SELECT -l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      |  l_shipdate, CAST(1.0 AS DOUBLE)
      |FROM lineitem WHERE l_orderkey % 103 = 0""".stripMargin

  /** Smaller deterministic before/after pair on orders, used by the
    * literal-plan and decode queries: drop % 53, mutate o_totalprice
    * % 47, null o_orderpriority % 43.
    */
  def ordersAfter(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    o.filter(col("o_orderkey") % 53 =!= 0)
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 47 === 0, col("o_totalprice") + lit(10.0))
          .otherwise(col("o_totalprice")))
      .withColumn(
        "o_orderpriority",
        when(col("o_orderkey") % 43 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
  }

  /** DuckDB-dialect SQL producing exactly [[ordersAfter]]. */
  val ordersAfterSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 47 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
      |  o_orderdate,
      |  CASE WHEN o_orderkey % 43 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
      |FROM orders WHERE o_orderkey % 53 <> 0""".stripMargin

  /** Third deterministic snapshot in the orders chain (for the
    * incremental SCD2 merge): perturb [[ordersAfter]] — drop % 59,
    * bump o_totalprice % 41, flip o_orderstatus % 37 — and re-insert
    * the odd half of the keys the t0→t1 transition deleted (% 53,
    * original values), so the 'inserted' path is exercised too.
    */
  def ordersAfter2(spark: SparkSession, dir: String): DataFrame = {
    val a = ordersAfter(spark, dir)
      .filter(col("o_orderkey") % 59 =!= 0)
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 41 === 0, col("o_totalprice") + lit(5.0))
          .otherwise(col("o_totalprice")))
      .withColumn(
        "o_orderstatus",
        when(col("o_orderkey") % 37 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    val back = orders(spark, dir)
      .filter(col("o_orderkey") % 53 === 0 && col("o_orderkey") % 2 === 1)
    a.unionByName(back)
  }

  /** Common planted transform under the ARRAY-diff fixture, applied to
    * BOTH sides so the cases read as MATCHING cells (status 0) across
    * engines — the null-element match is the cross-engine trap the
    * fixture exists to pin (Spark's structural array `=` says equal,
    * ANSI `=` says NULL; see DiffSql.structuralEqCols):
    *   - vec_id % 37 == 0 → empty array (equal empties)
    *   - vec_id % 43 == 0 → NULL element appended (equal
    *     null-element arrays)
    */
  private def embPlantCommon(df: DataFrame): DataFrame = df.withColumn(
    "embedding",
    when(col("vec_id") % 37 === 0, expr("CAST(array() AS ARRAY<FLOAT>)"))
      .when(
        col("vec_id") % 43 === 0,
        concat(col("embedding"), array(lit(null).cast("float"))))
      .otherwise(col("embedding")))

  /** Before side of the ARRAY-column diff fixture: the planted common
    * transform, plus the whole array nulled where vec_id % 23 == 0
    * (before-only NULL → status 2).
    */
  def embeddingsBefore(spark: SparkSession, dir: String): DataFrame =
    embPlantCommon(embeddings(spark, dir)).withColumn(
      "embedding",
      when(col("vec_id") % 23 === 0, lit(null).cast("array<float>"))
        .otherwise(col("embedding")))

  /** After side of the ARRAY-column diff fixture (FIXTURES.md §B
    * style, on embeddings):
    *   - rows vec_id % 53 == 0 dropped            → `_row_status` 5
    *   - rows vec_id % 59 == 0 re-injected with negated key,
    *     original embedding                        → `_row_status` 4
    *   - % 29: whole array NULL                    → status 3
    *   - % 47: every element negated               → status 1 (value)
    *   - % 41: extra NULL element appended         → status 1 (null
    *     element + length both differ — structural FALSE, not NULL)
    *   - % 31: truncated to the first 2 elements   → status 1 (length)
    * CASE order matters where moduli overlap; the oracle SQL replays
    * the same order.
    */
  def embeddingsAfter(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val base = embPlantCommon(e)
      .filter(col("vec_id") % 53 =!= 0)
      .withColumn(
        "embedding",
        when(col("vec_id") % 29 === 0, lit(null).cast("array<float>"))
          .when(col("vec_id") % 47 === 0, transform(col("embedding"), x => -x))
          .when(
            col("vec_id") % 41 === 0,
            concat(col("embedding"), array(lit(null).cast("float"))))
          .when(col("vec_id") % 31 === 0, slice(col("embedding"), 1, 2))
          .otherwise(col("embedding")))
    val injected = e
      .filter(col("vec_id") % 59 === 0)
      .withColumn("vec_id", -col("vec_id"))
    base.unionByName(injected)
  }

  private val embCommonSql: String =
    """CASE WHEN vec_id % 37 = 0 THEN CAST([] AS FLOAT[])
      |       WHEN vec_id % 43 = 0 THEN embedding || [CAST(NULL AS FLOAT)]
      |       ELSE embedding END""".stripMargin

  /** DuckDB-dialect SQL producing exactly [[embeddingsBefore]]. */
  val embeddingsBeforeSql: String =
    s"""SELECT vec_id,
       |  CASE WHEN vec_id % 23 = 0 THEN NULL ELSE $embCommonSql END AS embedding,
       |  label
       |FROM embeddings""".stripMargin

  /** DuckDB-dialect SQL producing exactly [[embeddingsAfter]]. */
  val embeddingsAfterSql: String =
    s"""SELECT vec_id,
       |  CASE WHEN vec_id % 29 = 0 THEN NULL
       |       WHEN vec_id % 47 = 0 THEN CAST(list_transform($embCommonSql, x -> -x) AS FLOAT[])
       |       WHEN vec_id % 41 = 0 THEN ($embCommonSql) || [CAST(NULL AS FLOAT)]
       |       WHEN vec_id % 31 = 0 THEN list_slice($embCommonSql, 1, 2)
       |       ELSE $embCommonSql END AS embedding,
       |  label
       |FROM embeddings WHERE vec_id % 53 <> 0
       |UNION ALL
       |SELECT -vec_id, embedding, label FROM embeddings WHERE vec_id % 59 = 0""".stripMargin

  /** DuckDB-dialect SQL producing exactly [[ordersAfter2]]. */
  val ordersAfter2Sql: String =
    s"""SELECT o_orderkey, o_custkey,
       |  CASE WHEN o_orderkey % 37 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       |  CASE WHEN o_orderkey % 41 = 0 THEN o_totalprice + 5.0 ELSE o_totalprice END AS o_totalprice,
       |  o_orderdate, o_orderpriority
       |FROM (
       |$ordersAfterSql
       |) WHERE o_orderkey % 59 <> 0
       |UNION ALL
       |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
       |FROM orders WHERE o_orderkey % 53 = 0 AND o_orderkey % 2 = 1""".stripMargin
}
