package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Options for [[TableDiff.diff]].
  *
  * @param legacyRowStatusZero the live reference template emits
  *   `_row_status = NULL` for rows present on both sides
  *   (full_compare.sql.j2:71, pinned by tests/test_diffgen.py:56) but
  *   three docs and one stale artifact assume `0`
  *   (README.md:189, samples/setup_all.sql:80,
  *   artifacts/generated_diff.sql:164-168). Default = live semantics
  *   (NULL); set true for the legacy `0` convention.
  * @param literalPlan when true, build the reference's literal 3-node
  *   plan — UNION-distinct of key tuples + two null-safe LEFT joins
  *   (full_compare.sql.j2:23-65). When false (default), build ONE
  *   full-outer null-safe join, which is row-for-row equivalent
  *   (including b×a fan-out under duplicate keys — both plans yield
  *   m×n rows for a key with m before / n after matches) but shuffles
  *   each input once instead of three times. Property-tested equal in
  *   TableDiffSpec.
  * @param keyPrefix prefix for the echoed key-value columns
  *   (reference: `K_` — full_compare.sql.j2:39,73-75).
  * @param upperCase reference upper-cases every column name for
  *   Snowflake (diffgen.py:73). Off by default to keep parquet-cased
  *   names round-trippable.
  * @param statusesAsMap emit ONE `statuses MAP<STRING,INT>` column
  *   instead of a status column per union column. MEASURED
  *   (WideSchemaBench, r13, fixed ~10⁸-cell budget, widths
  *   50→4000): there is NO per-column-form performance cliff to
  *   escape — whole-stage codegen bows out for BOTH forms at
  *   spark.sql.codegen.maxFields (100) output fields (codegen spans
  *   4 → 0 between widths 99 and 120), long before the 64KB method
  *   limit could bite, and the interpreted wide projection stays
  *   flat (0.35-0.7 s across the ladder; map form ~1.4× ahead only
  *   at 4000 columns). The map form's real value is row-width
  *   ergonomics for downstream consumers — no auto-switch is
  *   warranted (SCALE.md "Round-13 wide-schema diff").
  * @param nullKeySideChannel route rows whose key tuple contains a
  *   NULL through a separate small diff and union the results. Under
  *   null-safe hashing every all/partially-NULL key lands in the same
  *   few partitions; when a large fraction of rows has NULL keys this
  *   becomes the straggler at 100 TB (AQE skew-join splits can't help
  *   a single hot KEY, only hot partitions of distinct keys). The
  *   split is exact: a key tuple matches only tuples with the same
  *   NULL pattern, so the two sub-diffs partition the output.
  *   Property-tested equivalent to the default plan.
  * @param keysNotNull declare the key columns NULL-free, so the join
  *   uses plain `=` instead of `<=>`. Semantically identical when the
  *   declaration holds (NULL-keyed rows, if any, silently become
  *   missing-on-both-sides rows) — and it unlocks what null-safe keys
  *   cannot have: Spark rewrites `<=>` join keys to
  *   coalesce/isnull pairs, whose required distribution a bucketed
  *   table layout can never satisfy, so co-located bucket joins
  *   (zero-shuffle recurring diffs, BucketedDiffSpec) need `=` keys.
  *   When every key field is ALREADY non-nullable in both sides'
  *   Catalyst schemas the `=` plan is taken automatically (PlanSpec);
  *   the declaration remains necessary for file-source inputs, whose
  *   read schemas Spark deliberately widens to nullable.
  * @param preferShuffledHash hint the join to ShuffledHashJoin
  *   instead of sort-merge: skips both sort phases (~25% faster at
  *   bench scale) but builds a per-partition hash map of one side —
  *   use when partitions comfortably fit executor memory; sort-merge
  *   (default) degrades gracefully via spill at 100 TB.
  * @param dedupDuplicateKeys collapse each side to ONE row per key
  *   tuple BEFORE the join: every data column aggregated with `min`
  *   (a deterministic representative; NULLs ignored unless the column
  *   is all-NULL for the key, matching ANSI MIN) plus the side's row
  *   count carried through as `_dup_before` / `_dup_after` (NULL when
  *   the key is missing on that side) and a `_dup_status` cell coded
  *   like any other status cell over the two counts. This is the
  *   measured duplicate-key skew mitigation (SkewBench fixture 3: a
  *   hot key with m×n fan-out makes the reference-semantics join emit
  *   m×n rows — ~14 s literal / ~2 s plain vs ~1.3 s collapsed at
  *   bench scale): the b×a output volume is irreducible by
  *   scheduling, only key collapse removes it. NOT reference
  *   semantics — the reference fans out b×a per duplicate key — so
  *   it's opt-in, and the contract (one row per key, min
  *   representative, counts) is exactly what the emitted oracle SQL
  *   pins ([[DiffSql.generate]] with `dedupDuplicateKeys = true`).
  * @param numericAbsTol when set, every FRACTIONAL column's status
  *   cell treats values within `|b − a| ≤ tol` as equal (status 0) —
  *   the feature-table ask: re-computed floats differ in trailing
  *   digits without being DIFFERENT. FLOAT/DOUBLE columns are cast to
  *   DOUBLE before subtracting (float→double is exact, and the
  *   identical IEEE arithmetic runs in any engine); DECIMAL columns
  *   subtract in NATIVE DECIMAL — exact — and only the difference is
  *   double-cast (double-casting the OPERANDS collapses distinct
  *   values beyond 2^53 into "equal", ADVICE r12; the remaining
  *   bound: a DECIMAL(38,s) subtraction cannot widen past 38, so two
  *   operands whose difference needs 39 digits overflow — at which
  *   point they differ by ≥ 10^37 and any practical tolerance run
  *   fails loudly under ANSI rather than mis-coding). NaN on either
  *   side is status 1 in tolerance mode — NaN's distance is not
  *   ≤ tol, and both engines agree (exact mode keeps NaN = NaN as 0).
  *   INTEGER-family columns stay on exact `=`: integers carry no
  *   recomputation noise, and their double-cast is the 2^53 trap.
  *   NOT reference semantics (native per-type `=`), so it's opt-in;
  *   [[DiffSql.generate]] spells the identical predicates via
  *   `absTolCols`/`absTolDecimalCols`. The tolerance must be finite
  *   and non-negative (shared guard [[DiffSql.validateAbsTol]]).
  */
final case class DiffOptions(
    legacyRowStatusZero: Boolean = false,
    literalPlan: Boolean = false,
    keyPrefix: String = "K_",
    upperCase: Boolean = false,
    statusesAsMap: Boolean = false,
    nullKeySideChannel: Boolean = false,
    keysNotNull: Boolean = false,
    preferShuffledHash: Boolean = false,
    dedupDuplicateKeys: Boolean = false,
    numericAbsTol: Option[Double] = None)

/** Spark-native re-expression of the reference's generated diff query
  * (reference: checkatron/templates/full_compare.sql.j2 — the entire
  * query surface of simbo1905/checkatron, see SURVEY.md §0/§2.1).
  *
  * Given `before` and `after` DataFrames, a business-key column list,
  * and optional per-side WHERE predicates, emits one row per key tuple
  * present on either side with:
  *
  *   - `_row_status`: 4 = row missing in BEFORE, 5 = missing in AFTER,
  *     NULL (or 0 in legacy mode) = present on both sides
  *     (full_compare.sql.j2:68-72; keyed off the FIRST key column's
  *     side-value nullness, faithfully including the reference's
  *     behavior for NULL-valued keys);
  *   - `K_<key>` echo columns with the original key values/types
  *     (full_compare.sql.j2:39,73-75);
  *   - one INT status column per column of the union of both schemas,
  *     keys included (full_compare.sql.j2:77-85):
  *     0 = match (equal, or NULL on both sides), 1 = both non-NULL and
  *     different, 2 = NULL in BEFORE only, 3 = NULL in AFTER only.
  *     Columns absent on one side are NULL-padded, so an added/dropped
  *     column reads 2/3 on every present-both row
  *     (full_compare.sql.j2:45,52).
  *
  * Scale notes (100 TB design point): the default plan is a single
  * full-outer sort-merge/shuffled-hash join on null-safe key equality
  * (Spark plans `<=>` as a proper equi-join key, not a residual
  * filter), so each input is scanned and shuffled exactly once; the
  * wide per-column CASE projection is whole-stage-codegen'd. NULL-key
  * rows all hash to one partition — AQE skew handling applies; keys
  * are business keys and overwhelmingly non-NULL in practice.
  */
object TableDiff {

  val RowStatus = "_row_status"

  /** Status-cell codes (full_compare.sql.j2:79-83 / README.md:9-14). */
  val Match = 0
  val Different = 1
  val NullInBeforeOnly = 2
  val NullInAfterOnly = 3
  val MissingInBefore = 4
  val MissingInAfter = 5

  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case _: MapType => true
      case ArrayType(e, _) => containsMap(e)
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }

  def diff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      beforeWhere: Option[String] = None,
      afterWhere: Option[String] = None,
      opts: DiffOptions = DiffOptions()): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    opts.numericAbsTol.foreach(DiffSql.validateAbsTol(_, "DiffOptions.numericAbsTol"))

    // O2: opaque per-side WHERE strings, parsed by Catalyst
    // (reference injects them verbatim — full_compare.sql.j2:14-15,19-20)
    def cased(df: DataFrame): DataFrame =
      if (opts.upperCase) df.toDF(df.columns.map(_.toUpperCase).toIndexedSeq: _*) else df
    val b = cased(beforeWhere.fold(before)(w => before.filter(expr(w))))
    val a = cased(afterWhere.fold(after)(w => after.filter(expr(w))))

    val keyNames = keys.map { k =>
      val kk = if (opts.upperCase) k.toUpperCase else k
      SchemaUtils.resolve(b, kk) // keys must exist on the before side
    }
    // a MAP business key — top-level OR nested inside an array/struct
    // key — would only fail deep inside the join's analysis (maps have
    // no ordering Spark can hash or sort on) — fail here with the
    // remedy instead
    keyNames.foreach { k =>
      require(
        !containsMap(b.schema(k).dataType),
        s"key column '$k' is or contains a MAP — maps cannot serve as join " +
          "keys; diff on scalar business-key columns")
    }

    if (opts.nullKeySideChannel) {
      // exact split by NULL pattern: NULL-containing key tuples can
      // only match NULL-containing tuples, so the sub-diffs partition
      // the output; the (small) NULL-key diff no longer rides the hot
      // partitions of the main shuffle. (Composes with the key
      // collapse below: a key tuple's rows share one NULL pattern, so
      // each per-key group lands wholly in one branch and the
      // sub-diffs collapse it identically.)
      val anyKeyNull = keyNames.map(col(_).isNull).reduce(_ || _)
      val sub = opts.copy(nullKeySideChannel = false)
      val mainDiff = diff(b.filter(!anyKeyNull), a.filter(!anyKeyNull), keyNames, opts = sub)
      val nullDiff = diff(b.filter(anyKeyNull), a.filter(anyKeyNull), keyNames, opts = sub)
      return mainDiff.unionByName(nullDiff)
    }

    // duplicate-key collapse (see DiffOptions.dedupDuplicateKeys):
    // one hash aggregation per side — the same key shuffle the join
    // pays anyway — in exchange for removing the m×n per-key join
    // fan-out entirely. groupBy groups NULL key values together,
    // consistent with the `<=>` join semantics downstream.
    val dupB = if (opts.upperCase) "_DUP_BEFORE" else "_dup_before"
    val dupA = if (opts.upperCase) "_DUP_AFTER" else "_dup_after"
    val dupS = if (opts.upperCase) "_DUP_STATUS" else "_dup_status"
    def collapse(df: DataFrame, cntName: String): DataFrame = {
      val dataCols = df.columns.filterNot(c => keyNames.exists(_.equalsIgnoreCase(c)))
      val aggs = dataCols.map(c => min(col(c)).as(c)) :+ count(lit(1)).as(cntName)
      df.groupBy(keyNames.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val (bc, ac) =
      if (opts.dedupDuplicateKeys) {
        val reserved = Seq(dupB, dupA, dupS)
          .filter(r => (b.columns ++ a.columns).exists(_.equalsIgnoreCase(r)))
        require(
          reserved.isEmpty,
          s"dedupDuplicateKeys reserves the column name(s) ${reserved.mkString(", ")}; " +
            "rename the input column(s)")
        // MIN over a map (or a map nested in an array/struct) has no
        // ordering in Spark OR DuckDB — the collapse would fail deep
        // inside the aggregate's analysis, the exact opaque failure
        // the map-key guard above pre-empts. Same treatment here.
        val mapData = (b.schema ++ a.schema)
          .filter(f => !keyNames.exists(_.equalsIgnoreCase(f.name)))
          .filter(f => containsMap(f.dataType))
          .map(_.name).distinct
        require(
          mapData.isEmpty,
          s"dedupDuplicateKeys cannot collapse MAP-typed data column(s) " +
            s"${mapData.mkString(", ")} (maps have no MIN ordering); drop or " +
            "pre-convert them (e.g. array_sort(map_entries(c))), or diff " +
            "without dedupDuplicateKeys")
        (collapse(b, dupB), collapse(a, dupA))
      } else (b, a)

    // G3: ordered union of both schemas, before-side first
    val allCols = SchemaUtils.mergeColumnTypes(bc.schema, ac.schema)
    // the multiplicity columns ride the join like data but are NOT
    // status-matrix members — they surface raw per-side counts.
    // Dedup mode only: in a plain diff a user data column that
    // happens to be named _dup_before is ordinary data and must keep
    // its status cell.
    val statusCols =
      if (opts.dedupDuplicateKeys)
        allCols.filterNot { case (c, _) => c == dupB || c == dupA }
      else allCols

    // O6: per-side projection aligned to the union schema, with
    // literal-NULL padding for columns absent on that side. A column
    // present on BOTH sides with different types is EXPLICITLY cast to
    // the widened common type (SchemaUtils.mergeColumnTypes — r13): the
    // widening matrix is lossless by construction, so the cast never
    // changes a value, it only pins which type the status cell's `=`
    // runs under (previously each engine's implicit coercion decided).
    def aligned(df: DataFrame, prefix: String): DataFrame =
      df.select(allCols.map { case (c, dt) =>
        df.schema.fields.find(_.name.equalsIgnoreCase(c)) match {
          case Some(f) if SchemaUtils.sameTypeIgnoringNullability(f.dataType, dt) =>
            col(c).as(prefix + c)
          case Some(_) => col(c).cast(dt).as(prefix + c)
          case None => lit(null).cast(dt).as(prefix + c)
        }
      }: _*)
    val bAligned = aligned(bc, "b_")
    val aAligned = aligned(ac, "a_")

    val joined: DataFrame =
      if (opts.literalPlan) {
        // O4: UNION (distinct) of key tuples from both sides
        val allKeys = bc
          .select(keyNames.map(col): _*)
          .union(ac.select(keyNames.map(col): _*))
          .distinct()
          .select(keyNames.map(k => col(k).as(opts.keyPrefix + k)): _*)
        // O5: two null-safe LEFT equi-joins (Spark plans <=> as a join key)
        def keyCond(side: DataFrame, prefix: String): Column =
          keyNames
            .map(k => allKeys(opts.keyPrefix + k) <=> side(prefix + k))
            .reduce(_ && _)
        allKeys
          .join(bAligned, keyCond(bAligned, "b_"), "left")
          .join(aAligned, keyCond(aAligned, "a_"), "left")
      } else {
        // Fast path: ONE full-outer null-safe join — equivalent row
        // multiset (see DiffOptions.literalPlan), 1/3rd the shuffles.
        // When Catalyst can PROVE every key field non-nullable on
        // both sides, `=` and `<=>` are identical and the `=` plan is
        // taken automatically — same benefit as declaring
        // keysNotNull, no user action. File-source scans never
        // qualify on their own: Spark deliberately erases read-schema
        // nullability (files are externally appendable), so parquet
        // inputs still need the explicit declaration; proven lineage
        // (aggregation keys, literals, constructed frames) does.
        val autoEq = keyNames.forall { k =>
          !bAligned.schema(s"b_$k").nullable && !aAligned.schema(s"a_$k").nullable
        }
        val cond = keyNames
          .map { k =>
            if (opts.keysNotNull || autoEq) bAligned(s"b_$k") === aAligned(s"a_$k")
            else bAligned(s"b_$k") <=> aAligned(s"a_$k")
          }
          .reduce(_ && _)
        val aSide =
          if (opts.preferShuffledHash) aAligned.hint("shuffle_hash") else aAligned
        val j = bAligned.join(aSide, cond, "full_outer")
        // echo keys from whichever side is present (equal when both)
        keyNames.foldLeft(j) { (df, k) =>
          df.withColumn(opts.keyPrefix + k, coalesce(col(s"b_$k"), col(s"a_$k")))
        }
      }

    // O7: _row_status keyed off the FIRST key column (j2:68-72)
    val k0 = keyNames.head
    val bothPresent: Column =
      if (opts.legacyRowStatusZero) lit(0) else lit(null).cast("int")
    val rowStatus = when(col(s"b_$k0").isNull, MissingInBefore)
      .when(col(s"a_$k0").isNull, MissingInAfter)
      .otherwise(bothPresent)
      .as(RowStatus)

    // O9: per-column status CASE over every union column (j2:77-85).
    // MAP columns cannot be compared with `=` at all in Spark
    // (INVALID_ORDERING_TYPE) — their value branch canonicalizes to
    // sorted entry arrays first: map keys are unique, so sorting by
    // key is a total order and the comparison is entry-ORDER-
    // INSENSITIVE (two maps built in different insertion orders are
    // equal data), with null values inside compared structurally like
    // array elements. The oracle spells the same canonicalization
    // ([[DiffSql.generate]] mapEntryEqCols) because engine-native map
    // equality, where it exists at all, is order-sensitive (DuckDB).
    def status(c: String, dt: org.apache.spark.sql.types.DataType): Column = {
      val bc = col(s"b_$c")
      val ac = col(s"a_$c")
      val valueEq = dt match {
        case _: org.apache.spark.sql.types.MapType =>
          array_sort(map_entries(bc)) === array_sort(map_entries(ac))
        case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType
            if opts.numericAbsTol.isDefined =>
          // see DiffOptions.numericAbsTol: double-cast both sides so
          // the subtraction is the same IEEE op in every engine
          abs(bc.cast("double") - ac.cast("double")) <=
            lit(opts.numericAbsTol.get)
        case _: org.apache.spark.sql.types.DecimalType
            if opts.numericAbsTol.isDefined =>
          // exact types subtract NATIVELY (ADVICE r12: double-casting
          // the operands collapses distinct values beyond 2^53); only
          // the already-small difference is double-cast for the
          // comparison
          abs(bc - ac).cast("double") <= lit(opts.numericAbsTol.get)
        case _ => bc === ac
      }
      when(bc.isNull && ac.isNull, Match)
        .when(bc.isNull, NullInBeforeOnly)
        .when(ac.isNull, NullInAfterOnly)
        .when(valueEq, Match)
        .otherwise(Different)
        .as(c)
    }

    // O8 + output shape: _row_status first, K_ echoes, then the matrix.
    // Status and key-echo columns carry metadata markers so the
    // companion helpers identify them structurally — a name-prefix
    // heuristic would silently misclassify a DATA column named K_*.
    // The one unrepresentable case: a DATA column whose name equals a
    // key's echo name would give the output two identically-named
    // columns (metadata distinguishes them internally, but name-based
    // select and parquet writes break) — fail fast with the remedy.
    val echoCollisions = keyNames.map(opts.keyPrefix + _)
      .filter(e => allCols.exists(_._1 == e))
    require(
      echoCollisions.isEmpty,
      s"data column(s) ${echoCollisions.mkString(", ")} collide with the key-echo " +
        s"name(s) the diff emits (keyPrefix='${opts.keyPrefix}'); rename the " +
        "column(s) or set a different DiffOptions.keyPrefix")
    val keyMeta = new MetadataBuilder().putBoolean(TableDiff.KeyEchoMeta, true).build()
    val statusMeta = new MetadataBuilder().putBoolean(TableDiff.StatusMeta, true).build()
    // multiplicity tail (dedupDuplicateKeys only): raw per-side counts
    // (NULL when the key is missing on that side) + a status cell over
    // them — "is the duplication factor itself different?"
    val dupTail: Seq[Column] =
      if (!opts.dedupDuplicateKeys) Nil
      else {
        val bcnt = col(s"b_$dupB")
        val acnt = col(s"a_$dupA")
        Seq(
          bcnt.as(dupB),
          acnt.as(dupA),
          when(bcnt.isNull && acnt.isNull, Match)
            .when(bcnt.isNull, NullInBeforeOnly)
            .when(acnt.isNull, NullInAfterOnly)
            .when(bcnt === acnt, Match)
            .otherwise(Different)
            .as(dupS, statusMeta))
      }
    if (opts.statusesAsMap)
      joined.select(
        (rowStatus +:
          keyNames.map(k => col(opts.keyPrefix + k).as(opts.keyPrefix + k, keyMeta)) :+
          map_from_arrays(
            array(statusCols.map { case (c, _) => lit(c) }: _*),
            array(statusCols.map { case (c, dt) => status(c, dt) }: _*))
            .as("statuses", statusMeta)) ++ dupTail: _*)
    else
      joined.select(
        (rowStatus +:
          keyNames.map(k => col(opts.keyPrefix + k).as(opts.keyPrefix + k, keyMeta)) ++:
          statusCols.map { case (c, dt) => status(c, dt).as(c, statusMeta) }) ++ dupTail: _*)
  }

  /** Column-metadata keys marking a diff result's status cells and
    * key echoes (set by [[diff]]), so helpers never have to guess
    * from names.
    */
  val StatusMeta = "graft.diff.status"
  val KeyEchoMeta = "graft.diff.keyEcho"

  private def hasMeta(f: org.apache.spark.sql.types.StructField, key: String): Boolean =
    f.metadata.contains(key) && f.metadata.getBoolean(key)

  /** The status columns of a diff result. Prefers the metadata markers
    * [[diff]] attaches; falls back to the name heuristic (everything
    * but `_row_status` and `keyPrefix`-prefixed columns) for frames
    * that lost metadata, e.g. a parquet round-trip.
    */
  def statusColumns(diff: DataFrame, keyPrefix: String = "K_"): Seq[String] = {
    val marked = diff.schema.fields.filter(hasMeta(_, StatusMeta)).map(_.name).toSeq
    if (marked.nonEmpty) marked
    else {
      // the raw multiplicity columns of a dedupDuplicateKeys diff are
      // counts, not status cells — without excluding them a
      // metadata-stripped (e.g. parquet round-tripped) dedup diff
      // would flag EVERY row as differing through _dup_before >= 1.
      // Exclude by name ONLY when the frame carries the full dedup
      // trio (both counts + _dup_status): a plain diff over user data
      // that happens to contain a _dup_before column keeps it in the
      // status set.
      val lower = diff.columns.map(_.toLowerCase).toSet
      val dedupShaped = Seq("_dup_before", "_dup_after", "_dup_status").forall(lower)
      diff.columns.filterNot { c =>
        c == RowStatus || c.startsWith(keyPrefix) ||
          (dedupShaped &&
            (c.equalsIgnoreCase("_dup_before") || c.equalsIgnoreCase("_dup_after")))
      }.toSeq
    }
  }

  /** "Any column differs" predicate (reference README.md:18,209 —
    * Excel-style "filter any column > 0"), V2 in SURVEY.md §2.2.
    * Works for both output shapes (per-column INTs and the
    * `statusesAsMap` MAP column).
    *
    * The per-column form is `greatest(cols…) > 0`, not an OR chain:
    * status cells are non-null ints, so the two are equivalent, and a
    * left-deep `c1 > 0 OR c2 > 0 OR …` over thousands of columns
    * overflows the analyzer's recursion (one stack frame per Or node)
    * — `greatest` is a single flat expression regardless of width.
    */
  def anyColumnDiffers(diff: DataFrame, keyPrefix: String = "K_"): Column = {
    val cols = statusColumns(diff, keyPrefix)
    if (cols == Seq("statuses") &&
      diff.schema("statuses").dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      exists(map_values(col("statuses")), _ > 0)
    else if (cols.sizeIs == 1) col(cols.head) > 0
    else greatest(cols.map(col): _*) > 0
  }
}
