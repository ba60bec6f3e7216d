package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 snapshot history: turn a (before, after) snapshot pair
  * into a slowly-changing-dimension row set with validity intervals.
  *
  * This is the natural downstream of the reference's diff pipeline
  * (`full_compare.sql.j2` classifies rows as equal / changed /
  * added / dropped; see /root/reference/diffgen.py:3): a user who
  * diffs two snapshots almost always wants the *versioned history*
  * those statuses imply. Per row key:
  *
  *   - unchanged:  one open row      [t0, NULL)              from `before`
  *   - updated:    one closed row    [t0, t1)  from `before`
  *                 + one open row    [t1, NULL) from `after`
  *   - deleted:    one closed row    [t0, t1)  from `before`
  *   - inserted:   one open row      [t1, NULL) from `after`
  *
  * Plan shape (the 100 TB contract, same as TableDiff's fast path):
  * ONE full-outer null-safe join on the keys — one shuffle per input,
  * AQE/skew-join eligible — followed by a *narrow* explode that emits
  * 1–2 rows per joined row. No second join, no union re-scan: the
  * naive 4-branch UNION (scan the join output four times) is exactly
  * what this avoids. Value comparison is null-safe (`<=>`), matching
  * the diff operator's NULL-change semantics.
  */
object Scd2 {

  /** Build the SCD2 history for one snapshot transition.
    *
    * @param before    earlier snapshot
    * @param after     later snapshot (same columns)
    * @param keys      row-identity columns
    * @param validFrom ISO date the `before` snapshot took effect
    * @param validTo   ISO date of the transition to `after`
    */
  def snapshotHistory(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      validFrom: String,
      validTo: String): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    require(
      before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshots must share a schema, got ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    require(
      keys.forall(before.columns.contains),
      s"keys ${keys.filterNot(before.columns.contains).mkString(",")} not in the snapshot schema")
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    val ordered = keys ++ valueCols

    // presence markers survive the full-outer join where key columns
    // alone cannot (a NULL key is a legal value under <=>)
    val b = before.select(ordered.map(col): _*).withColumn("_b_present", lit(1)).alias("b")
    val a = after.select(ordered.map(col): _*).withColumn("_a_present", lit(1)).alias("a")

    val joinCond = keys.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _)
    val joined = b.join(a, joinCond, "full_outer")

    val bPresent = col("b._b_present").isNotNull
    val aPresent = col("a._a_present").isNotNull
    val changed = valueCols.map(c => !(col(s"b.$c") <=> col(s"a.$c"))).reduce(_ || _)

    val t0 = lit(validFrom).cast("date")
    val t1 = lit(validTo).cast("date")
    val openEnd = lit(null).cast("date")

    def version(
        side: String,
        from: Column,
        to: Column,
        current: Column,
        change: Column): Column =
      struct(
        keys.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k)) ++
          valueCols.map(c => col(s"$side.$c").as(c)) ++ Seq(
            from.as("valid_from"),
            to.as("valid_to"),
            current.as("is_current"),
            change.as("change_type")): _*)

    // history row: every key present in `before` has one, closed iff
    // the row changed or disappeared
    val histRow = when(
      bPresent,
      version(
        "b",
        t0,
        when(!aPresent || changed, t1).otherwise(openEnd),
        aPresent && !changed,
        when(!aPresent, lit("deleted"))
          .when(changed, lit("updated"))
          .otherwise(lit("unchanged"))))
    // current row: new version for updated keys, first version for
    // inserted keys (unchanged keys keep their open history row)
    val currRow = when(
      aPresent && (!bPresent || changed),
      version(
        "a",
        t1,
        openEnd,
        lit(true),
        when(!bPresent, lit("inserted")).otherwise(lit("updated"))))

    joined
      .select(explode(array(histRow, currRow)).as("v"))
      .filter(col("v").isNotNull)
      .select(col("v.*"))
  }

  /** Incremental merge: apply a NEW snapshot to an EXISTING history —
    * the production SCD2 path, where the history table persists and
    * each ingest folds one snapshot in (rebuilding from all snapshots
    * is exactly what SCD2 exists to avoid).
    *
    * Label convention (same as [[snapshotHistory]]): a CLOSED row's
    * `change_type` records what closed it ('updated' — superseded,
    * 'deleted' — key vanished); an OPEN row's records its birth
    * ('unchanged' — initial load survivor, 'updated', 'inserted').
    * Rows already closed pass through untouched; open rows whose key
    * left the snapshot close as 'deleted'; changed keys close their
    * old version and open a new one at `asOfDate`.
    *
    * Plan shape: the closed partition is a pass-through scan; only the
    * CURRENT rows (≈ |live keys|, not |history|) join the snapshot —
    * one full-outer null-safe join + narrow explode, then a UNION
    * with the untouched closed rows.
    *
    * `deleteAbsentKeys = false` switches from SNAPSHOT semantics (a
    * key missing from the snapshot closes as 'deleted') to UPSERT/CDC
    * semantics: the input carries only keys that changed, absent keys
    * keep their open row untouched. This is the per-micro-batch shape
    * a change stream folds in (q_stream_scd2) — a batch is never a
    * full snapshot, so absence means "no news", not deletion.
    */
  def merge(
      history: DataFrame,
      snapshot: DataFrame,
      keys: Seq[String],
      asOfDate: String,
      deleteAbsentKeys: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val metaCols = Seq("valid_from", "valid_to", "is_current", "change_type")
    require(metaCols.forall(history.columns.contains),
      s"history must carry ${metaCols.mkString(",")}")
    val valueCols = snapshot.columns.filterNot(keys.contains).toSeq
    require((keys ++ valueCols).forall(history.columns.contains),
      "history and snapshot disagree on key/value columns")

    val ordered = keys ++ valueCols
    val closed = history.filter(col("valid_to").isNotNull)
    val current = history.filter(col("valid_to").isNull)
      .select((ordered :+ "valid_from" :+ "change_type").map(col): _*)
      .withColumn("_b_present", lit(1)).alias("b")
    val snap = snapshot.select(ordered.map(col): _*)
      .withColumn("_a_present", lit(1)).alias("a")

    val joinCond = keys.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _)
    val joined = current.join(snap, joinCond, "full_outer")
    val bPresent = col("b._b_present").isNotNull
    val aPresent = col("a._a_present").isNotNull
    val changed = valueCols.map(c => !(col(s"b.$c") <=> col(s"a.$c"))).reduce(_ || _)

    val t = lit(asOfDate).cast("date")
    val openEnd = lit(null).cast("date")

    def version(
        side: String,
        from: Column,
        to: Column,
        isCur: Column,
        change: Column): Column =
      struct(
        keys.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k)) ++
          valueCols.map(c => col(s"$side.$c").as(c)) ++ Seq(
            from.as("valid_from"),
            to.as("valid_to"),
            isCur.as("is_current"),
            change.as("change_type")): _*)

    // the surviving/closing row for every previously-current key;
    // under upsert semantics only a CHANGED key closes its row
    val closesExisting =
      if (deleteAbsentKeys) !aPresent || changed else aPresent && changed
    val existingRow = when(
      bPresent,
      version(
        "b",
        col("b.valid_from"),
        when(closesExisting, t).otherwise(openEnd),
        !closesExisting,
        when(lit(deleteAbsentKeys) && !aPresent, lit("deleted"))
          .when(aPresent && changed, lit("updated"))
          .otherwise(col("b.change_type")))) // untouched open row keeps its birth label
    // the new version for changed or newly-inserted keys
    val newRow = when(
      aPresent && (!bPresent || changed),
      version(
        "a",
        t,
        openEnd,
        lit(true),
        when(!bPresent, lit("inserted")).otherwise(lit("updated"))))

    val merged = joined
      .select(explode(array(existingRow, newRow)).as("v"))
      .filter(col("v").isNotNull)
      .select(col("v.*"))
      // an out-of-order merge (asOfDate predating an open row's
      // valid_from) would write an inverted interval that asOf can
      // never see — fail the job instead of silently losing history.
      // assert_true returns NULL on success, so the filter keeps every
      // row while forcing the check to evaluate; no extra pass.
      .filter(assert_true(
        col("valid_to").isNull || col("valid_to") > col("valid_from"),
        lit(s"scd2 merge: asOfDate $asOfDate predates an open row's " +
          "valid_from — snapshots must merge in chronological order")).isNull)
    closed.select(merged.columns.map(col): _*).unionByName(merged)
  }

  /** Point-in-time read: reconstruct the snapshot as of `date` from a
    * [[snapshotHistory]] row set. A row is visible iff
    * `valid_from ≤ date < valid_to` (open intervals never expire).
    *
    * Pure filter + projection — at scale this is the whole point of
    * SCD2: time travel without storing N snapshots. Reconstruction is
    * lossless: `asOf` at any instant in [t0, t1) returns exactly the
    * `before` snapshot, and at ≥ t1 exactly `after` (the
    * q_scd2_asof oracle pins both directions against the raw tables).
    */
  def asOf(history: DataFrame, date: String): DataFrame = {
    val d = lit(date).cast("date")
    history
      .filter(col("valid_from") <= d && (col("valid_to").isNull || col("valid_to") > d))
      .drop("valid_from", "valid_to", "is_current", "change_type")
  }
}
