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
    // modulus 0 would be silent data loss, not an error: non-ANSI
    // Spark evaluates x % 0 to NULL so the filter drops the whole
    // stratum, while the DuckDB oracle errors on % 0 — validate up
    // front like assignSplit does its weights
    require(mods.forall(_._2 >= 1),
      s"every stratum modulus must be >= 1, got ${mods.filter(_._2 < 1).mkString(", ")}")
    require(defaultMod >= 1, s"default modulus must be >= 1, got $defaultMod")
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

  /** Deterministic train/val/test split assignment: re-mixed
    * `hash % 100` lands each row in a percentile bucket, and
    * cumulative weight ranges name the split. Key-hash splits are the
    * only kind that survive pipeline re-runs: the same document lands
    * in the same split forever (and in any engine), so later
    * incremental ingests can't leak val/test rows into train.
    *
    * @param weights (name, percent) in assignment order; must sum to
    *                100
    */
  def assignSplit(
      df: DataFrame,
      hashExpr: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "every split weight must be positive")
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    df.withColumn("split", expr(splitCase(hashExpr, weights)))
  }

  /** The dialect-neutral CASE mapping a re-mixed hash to its split
    * name — shared verbatim by the Spark column and the DuckDB
    * oracle.
    */
  def splitCase(hashExpr: String, weights: Seq[(String, Int)]): String = {
    // a single 100%-weight split has no WHEN branch — CASE with zero
    // WHENs is a parse error, so emit the constant directly
    if (weights.size == 1) return s"'${sq(weights.head._1)}'"
    val bucket = s"(${mixedHash(hashExpr)}) % 100"
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val whens = weights.init.zip(bounds.init)
      .map { case ((name, _), hi) => s"WHEN ($bucket) < $hi THEN '${sq(name)}'" }
      .mkString(" ")
    s"CASE $whens ELSE '${sq(weights.last._1)}' END"
  }

  /** Cap each group at its `k` best rows by `orderSql` (an ORDER BY
    * fragment; include a unique tiebreaker for determinism). The
    * curation workhorse — "at most k documents per domain" — planned
    * as a group-limit (bounded heaps around one shuffle on
    * `groupCol`), never a global sort.
    */
  def perGroupCap(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[org.apache.spark.sql.Column],
      k: Int): DataFrame = {
    require(k >= 1, s"cap must be at least 1, got $k")
    require(orderCols.nonEmpty, "perGroupCap needs an ordering")
    // withColumn would silently REPLACE a caller's existing rn data
    // column — fail fast instead, matching the codebase's collision
    // guards (clusterByZ on _z, TableDiff on key-echo names)
    require(!df.columns.contains("rn"),
      "perGroupCap exposes its rank as column 'rn' but the input already has one — rename it first")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(expr(s"rn <= $k"))
      .withColumn("rn", expr("CAST(rn AS BIGINT)"))
  }

  /** Token-budget mixture sampling: fill each stratum's weight budget
    * (tokens, chars, bytes — whatever `weightCol` measures) by taking
    * rows in re-mixed-hash order until the running total would pass
    * the budget, then stop. This is how training mixtures are
    * actually specified — "20 B tokens of web, 5 B of code" — and the
    * hash ordering makes the kept set a uniform, REPRODUCIBLE draw:
    * re-runs and other engines keep exactly the same rows, and
    * growing the budget only ever ADDS rows (the hash order is a
    * fixed permutation per stratum), so mixture revisions are
    * monotone, never a reshuffle.
    *
    * One shuffle on `strataCol` (the window), no RNG, no driver
    * state. A row larger than the remaining budget ends its stratum's
    * fill — budgets are honored as hard ceilings.
    *
    * Output adds `running_weight`, the stratum-cumulative weight
    * through each kept row (ends ≤ the stratum budget by
    * construction).
    */
  def mixtureByBudget(
      df: DataFrame,
      strataCol: String,
      weightCol: String,
      hashExpr: String,
      idCol: String,
      budgets: Seq[(String, Long)],
      defaultBudget: Long): DataFrame = {
    require(budgets.nonEmpty, "need at least one stratum budget")
    require(budgets.forall(_._2 >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    require(!df.columns.contains("running_weight"),
      "mixtureByBudget exposes column 'running_weight' but the input already has one — rename it first")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, sum}
    val w = Window.partitionBy(strataCol)
      .orderBy(expr(mixedHash(hashExpr)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_weight", sum(col(weightCol).cast("long")).over(w))
      .filter(expr(
        s"running_weight <= (${budgetCase(strataCol, budgets, defaultBudget)})"))
  }

  /** [[mixtureByBudget]] with budgets from a CONFIG TABLE (columns
    * `stratum`, `budget`) instead of literals — a production mixture
    * spec has thousands of strata (domains, languages, source×epoch
    * cells) that cannot live in a CASE expression. The budget table
    * joins in broadcast-small; strata absent from it fall back to
    * `defaultBudget`. Same ordering, same hard-ceiling semantics
    * (pinned ≡ the literal form by spec).
    */
  def mixtureByBudgetTable(
      df: DataFrame,
      strataCol: String,
      weightCol: String,
      hashExpr: String,
      idCol: String,
      budgetTable: DataFrame,
      defaultBudget: Long): DataFrame = {
    require(budgetTable.columns.sameElements(Array("stratum", "budget")),
      s"budget table must have exactly columns (stratum, budget), got ${budgetTable.columns.mkString(", ")}")
    require(defaultBudget >= 0, "default budget must be non-negative")
    require(!df.columns.contains("running_weight"),
      "mixtureByBudgetTable exposes column 'running_weight' but the input already has one — rename it first")
    require(!df.columns.contains("budget"),
      "mixtureByBudgetTable joins a 'budget' column but the input already has one — rename it first")
    // a duplicated stratum row would silently DUPLICATE every kept row
    // of that stratum through the join — fail fast instead. The count
    // costs one job over the config table, which is broadcast-small by
    // contract.
    require(
      budgetTable.count() == budgetTable.select("stratum").distinct().count(),
      "budget table has duplicate stratum rows — deduplicate it first")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, sum}
    val w = Window.partitionBy(strataCol)
      .orderBy(expr(mixedHash(hashExpr)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_weight", sum(col(weightCol).cast("long")).over(w))
      .join(
        broadcast(budgetTable.withColumnRenamed("stratum", strataCol)),
        Seq(strataCol), "left")
      .filter(col("running_weight") <= coalesce(col("budget"), lit(defaultBudget)))
      .drop("budget")
  }

  /** Temperature-balanced mixture — the multilingual pre-training
    * sampling technique (public: mBERT / XLM-R "exponentially
    * smoothed" source weighting, p_i ∝ n_i^α with α ∈ (0, 1]
    * flattening source skew so head sources stop drowning the tail):
    * stratum i with n_i rows gets a ROW budget
    * `floor(totalDocs · w_i / W)` where `w_i = n_i^(1/2^sqrtDepth)`
    * and `W = Σ w_j`, filled as a hash-order prefix (the
    * [[mixtureByBudgetTable]] semantics at weight 1 per row, INLINED
    * — see the in-body note — with budgets computed IN-PLAN from the
    * data, no driver collect).
    *
    * α is expressed as a SQRT DEPTH (α = 1/2^depth: depth 0 =
    * proportional, 1 = the standard α = 0.5, 2 = 0.25) rather than a
    * free double exponent, deliberately: IEEE 754 guarantees
    * correctly-rounded SQRT in every engine, so the budget doubles
    * are bit-identical cross-engine, while `pow(n, α)` differs
    * between libms in final ulps — exactly at the floor() boundaries
    * where a budget would flake by one row (the DECIMAL-cast
    * float-aggregate lesson, applied to exponents). For the same
    * reason W is accumulated through a RUNNING window ordered by
    * stratum: double addition is non-associative, so the summation
    * order is pinned to one both engines replay.
    *
    * Scale shape: one tiny per-stratum count aggregation, a
    * stratum-count-sized window (single partition of #strata rows),
    * a broadcast join, and the one mixture window shuffle — the
    * corpus moves once.
    */
  def temperatureMixture(
      df: DataFrame,
      strataCol: String,
      hashExpr: String,
      idCol: String,
      totalDocs: Long,
      sqrtDepth: Int = 1): DataFrame = {
    require(totalDocs >= 0, "totalDocs must be non-negative")
    require(sqrtDepth >= 0 && sqrtDepth <= 4, "sqrtDepth must be in [0, 4]")
    Seq("running_weight", "budget").foreach(c =>
      require(!df.columns.contains(c),
        s"temperatureMixture exposes column '$c' — rename the input's"))
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.orderBy(strataCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wExpr = (0 until sqrtDepth)
      .foldLeft(col("_n").cast("double"))((e, _) => sqrt(e))
    val budgets = df.groupBy(strataCol).agg(count(lit(1)).as("_n"))
      .withColumn("_w", wExpr)
      .withColumn("_rw", sum(col("_w")).over(ordered))
      .withColumn("_tw", max(col("_rw")).over(whole))
      .select(
        col(strataCol),
        floor(lit(totalDocs.toDouble) * col("_w") / col("_tw"))
          .cast("long").as("budget"))
    // the prefix fill is INLINED rather than routed through
    // mixtureByBudgetTable: its duplicate-stratum require costs two
    // extra jobs over the budget frame, which here is derived from
    // the CORPUS (a groupBy output — provably duplicate-free), so the
    // check would re-aggregate the whole input twice for nothing
    val wk = Window.partitionBy(strataCol)
      .orderBy(expr(mixedHash(hashExpr)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_weight", sum(lit(1L)).over(wk))
      .join(broadcast(budgets), Seq(strataCol), "left")
      .filter(col("running_weight") <= coalesce(col("budget"), lit(0L)))
      .drop("budget")
  }

  /** Epoch-weighted repetition for data-constrained training
    * (public technique: Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models" — repeating scarce data for a
    * few epochs is near-as-good as fresh data, so a mixture repeats
    * the tail instead of over-sampling the head): stratum s
    * configured at E_s epochs emits `floor(E_s)` copies of every row
    * plus ONE more copy of a deterministic hash-order prefix of
    * `floor(frac(E_s) · n_s)` rows. Output = input columns +
    * `epoch` (0-based copy index). E_s < 1 degenerates to
    * subsampling (zero full copies, a frac-sized prefix) — the same
    * knob covers both directions. Pair with [[shardForTraining]]
    * over a hash of (id, epoch) so a row's repeats spread across
    * shards instead of clumping.
    *
    * Determinism: E_s enters as a double literal both engines parse
    * to the same IEEE value, and `frac · n` is a single multiply —
    * identical everywhere, no libm involved (the
    * [[temperatureMixture]] sqrt argument does not even arise); the
    * extra-copy prefix is the same mixed-hash order every mixture
    * uses. No RNG, no driver state; the one shuffle is the
    * per-stratum window.
    */
  def epochRepeat(
      df: DataFrame,
      strataCol: String,
      hashExpr: String,
      idCol: String,
      epochs: Seq[(String, Double)],
      defaultEpochs: Double = 1.0): DataFrame = {
    require(epochs.forall(_._2 >= 0) && defaultEpochs >= 0,
      "epochs must be non-negative")
    Seq("epoch", "_rn", "_n", "_e", "_total").foreach(c =>
      require(!df.columns.contains(c),
        s"epochRepeat uses column '$c' — rename the input's"))
    import org.apache.spark.sql.expressions.Window
    val eCase = s"CASE $strataCol " +
      epochs.map { case (v, e) => s"WHEN '${sq(v)}' THEN CAST($e AS DOUBLE)" }
        .mkString(" ") +
      s" ELSE CAST($defaultEpochs AS DOUBLE) END"
    val w = Window.partitionBy(strataCol)
      .orderBy(expr(mixedHash(hashExpr)), col(idCol))
    val wAll = Window.partitionBy(strataCol)
    df.withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_e", expr(eCase))
      .withColumn(
        "_total",
        floor(col("_e")).cast("long") +
          when(
            col("_rn") <= floor((col("_e") - floor(col("_e"))) * col("_n")),
            1L).otherwise(0L))
      .withColumn(
        "epoch",
        explode(
          when(col("_total") > 0, sequence(lit(0L), col("_total") - 1))
            .otherwise(array().cast("array<bigint>"))))
      .drop("_rn", "_n", "_e", "_total")
  }

  /** Deterministic global shuffle + shard assignment for training
    * export — the step between a curated corpus and the trainer's
    * data loader. Every row gets a `shard` in [0, numShards) and a
    * dense 1-based `seq` within its shard, where BOTH are pure
    * functions of the row key: shard = re-mixed hash mod numShards,
    * and the within-shard order is a SECOND independent re-mix of the
    * same hash (so shard placement and intra-shard position don't
    * correlate — a row's neighbors in its shard are a uniform draw
    * from the corpus, which is the whole point of shuffling training
    * data). No RNG, no global sort: one hash shuffle for the
    * per-shard window, reproducible on any engine and across
    * incremental re-runs.
    *
    * `hashExpr` should be non-negative (any [[stratifiedHash]]-style
    * hash is); shard uses `pmod` so even a negative hash stays inside
    * the documented [0, numShards) contract rather than emitting
    * shard=-N directories from [[writeShards]].
    */
  def shardForTraining(
      df: DataFrame,
      idCol: String,
      hashExpr: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be at least 1, got $numShards")
    Seq("shard", "seq").foreach { c =>
      require(!df.columns.contains(c),
        s"shardForTraining exposes column '$c' but the input already has one — rename it first")
    }
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val h1 = mixedHash(hashExpr)
    // second mix: a different odd multiplier over the same prime field
    // (h1 < 1e9+7 keeps the product < 2^62 — no signed-64 overflow)
    val mix2 = s"(((($h1) + 1) * 2246822519) % 1000000007)"
    val w = Window.partitionBy("shard").orderBy(expr(mix2), col(idCol))
    df.withColumn("shard", expr(s"CAST(pmod(($h1), $numShards) AS BIGINT)"))
      .withColumn("seq", row_number().over(w).cast("long"))
  }

  /** Write a [[shardForTraining]] result as the layout a data loader
    * mounts: one directory per shard, ONE file per shard, rows inside
    * the file in `seq` order. `repartition(numShards, shard)` puts
    * each shard wholly in one task, `sortWithinPartitions` lays the
    * rows out in shuffle order, and the partitioned write splits the
    * (possibly co-resident) shards into their own directories — so
    * the write costs exactly one shuffle and file count stays
    * numShards no matter how many executors ran the job. At 100 TB
    * you pick numShards so each file lands in the 100 MB–1 GB range
    * the loaders want.
    */
  def writeShards(sharded: DataFrame, dir: String, numShards: Int): Unit =
    sharded
      .repartition(numShards, org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("shard", "seq")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** The dialect-neutral `CASE stratum WHEN ... END` budget picker —
    * shared verbatim by the Spark filter and the DuckDB oracle.
    */
  def budgetCase(strataCol: String, budgets: Seq[(String, Long)], defaultBudget: Long): String =
    s"CASE $strataCol " +
      budgets.map { case (v, b) => s"WHEN '${sq(v)}' THEN $b" }.mkString(" ") +
      s" ELSE $defaultBudget END"

  /** Single-quote escape for values interpolated into the generated
    * CASE expressions — a stratum named `o'reilly` must not truncate
    * (or rewrite) the predicate.
    */
  private def sq(v: String): String = v.replace("'", "''")

  /** The dialect-neutral `CASE stratum WHEN ... END` modulus picker —
    * shared verbatim by the Spark filter and the DuckDB oracle.
    */
  def modulusCase(strataCol: String, mods: Seq[(String, Int)], defaultMod: Int): String =
    s"CASE $strataCol " +
      mods.map { case (v, m) => s"WHEN '${sq(v)}' THEN $m" }.mkString(" ") +
      s" ELSE $defaultMod END"
}
