package graft.operators

/** ANSI-SQL text emitter for the diff — the counterpart of the
  * reference's whole purpose (it *generates* SQL rather than executing
  * it — checkatron/diffgen.py:96-111 rendering
  * checkatron/templates/full_compare.sql.j2). Our engine executes
  * natively via [[TableDiff]]; this emitter exists (a) for audit
  * parity — users of the reference get SQL text they can read — and
  * (b) to generate the DuckDB oracle queries for the driver harness,
  * guaranteeing the oracle and the Spark plan share one definition of
  * the semantics. Null-safe equality is spelled
  * `IS NOT DISTINCT FROM` (ANSI/DuckDB) where Spark uses `<=>`.
  */
object DiffSql {

  /** Emit the full diff query (no trailing ORDER BY; caller appends).
    *
    * @param beforeBody SQL producing the before side (table name or subquery body)
    * @param afterBody  SQL producing the after side
    * @param keys       business-key column names
    * @param beforeCols columns of the before side, in order
    * @param afterCols  columns of the after side, in order
    * @param paddedTypes SQL type per column that is absent on one side,
    *                    for `CAST(NULL AS t)` padding (full_compare.sql.j2:45,52)
    * @param legacyRowStatusZero emit `0` instead of `NULL` for
    *                    present-both rows (SURVEY.md §0 trap 1)
    * @param dedupDuplicateKeys collapse each side to one row per key
    *                    tuple (MIN per data column + COUNT(*)) before
    *                    the join and append `_dup_before` /
    *                    `_dup_after` / `_dup_status` — the SQL twin of
    *                    [[DiffOptions.dedupDuplicateKeys]], pinning
    *                    the fast mode's contract in one definition
    * @param structuralEqCols columns whose value-equality branch is
    *                    spelled `IS NOT DISTINCT FROM` instead of `=`.
    *                    Needed for ARRAY columns: Spark's `=` on
    *                    arrays is STRUCTURAL (`[1,NULL] = [1,NULL]` is
    *                    TRUE, `[1,NULL] = [1,2]` is FALSE) while ANSI/
    *                    DuckDB `=` returns NULL whenever a compared
    *                    element is NULL — so a null-element cell would
    *                    fall through the CASE to status 1 in one
    *                    engine and read 0 in the other. At the value
    *                    branch both sides are already non-NULL, so for
    *                    scalar columns the two spellings are
    *                    identical; for nested types DuckDB's
    *                    DISTINCT-semantics comparison is exactly
    *                    Spark's structural equality (probed: null
    *                    elements, length mismatch, empty, NaN, -0.0).
    * @param mapEntryEqCols MAP columns: the value branch becomes
    *                    `array_sort(map_entries(b)) IS NOT DISTINCT
    *                    FROM array_sort(map_entries(a))` — map keys
    *                    are unique so the sort is a total order and
    *                    equality is entry-order-INSENSITIVE, matching
    *                    the operator's canonicalization (engine-native
    *                    map `=` is order-sensitive where it exists at
    *                    all; Spark has none). Both function names
    *                    parse in Spark AND DuckDB, so the emitted SQL
    *                    stays dual-dialect.
    * @param numericAbsTol with `absTolCols`: those columns' value
    *                    branch becomes `ABS(CAST(b AS DOUBLE) -
    *                    CAST(a AS DOUBLE)) <= tol` — the
    *                    [[DiffOptions.numericAbsTol]] spelling
    *                    (float→double is exact and the subtraction is
    *                    the same IEEE op in both engines; NaN reads
    *                    status 1 in this mode, identically in both).
    * @param absTolDecimalCols DECIMAL columns under the tolerance:
    *                    spelled `CAST(ABS(b - a) AS DOUBLE) <= tol` —
    *                    the subtraction runs in NATIVE DECIMAL (exact
    *                    in both engines; both widen precision by one,
    *                    capped at 38), and only the already-small
    *                    difference is double-cast. The plain
    *                    `absTolCols` spelling double-casts each SIDE
    *                    first, which collapses distinct DECIMAL values
    *                    beyond 2^53 into "equal" (ADVICE r12) — for
    *                    exact types the operand cast must come AFTER
    *                    the subtraction.
    * @param castTypes   columns that exist on BOTH sides with
    *                    DIFFERENT types: each side's reference is
    *                    wrapped `CAST(side.col AS t)` with the widened
    *                    common type t ([[SchemaUtils.widen]],
    *                    dual-dialect spelling
    *                    [[SchemaUtils.sqlTypeName]]), in the
    *                    projections, the key-universe UNION, and the
    *                    join conditions — so NEITHER engine's implicit
    *                    coercion ever decides a status cell or a key
    *                    match (the reference compares raw columns and
    *                    lets Snowflake coerce, full_compare.sql.j2:82;
    *                    this engine pins the type explicitly, r13).
    */
  def generate(
      beforeBody: String,
      afterBody: String,
      keys: Seq[String],
      beforeCols: Seq[String],
      afterCols: Seq[String],
      paddedTypes: Map[String, String] = Map.empty,
      legacyRowStatusZero: Boolean = false,
      dedupDuplicateKeys: Boolean = false,
      structuralEqCols: Set[String] = Set.empty,
      mapEntryEqCols: Set[String] = Set.empty,
      numericAbsTol: Option[Double] = None,
      absTolCols: Set[String] = Set.empty,
      absTolDecimalCols: Set[String] = Set.empty,
      castTypes: Map[String, String] = Map.empty): String = {
    require(
      (absTolCols.isEmpty && absTolDecimalCols.isEmpty) || numericAbsTol.isDefined,
      "absTolCols/absTolDecimalCols given without numericAbsTol — set the tolerance")
    numericAbsTol.foreach(validateAbsTol(_, "numericAbsTol"))
    // the converse is just as silent a trap: TableDiff auto-applies
    // its tolerance to every fractional column, so a generate() call
    // that sets the tolerance but no columns would emit an EXACT
    // oracle against a toleranced operator
    require(
      numericAbsTol.isEmpty || absTolCols.nonEmpty || absTolDecimalCols.nonEmpty,
      "numericAbsTol given without absTolCols/absTolDecimalCols — list the " +
        "columns (TableDiff applies the tolerance to every FLOAT/DOUBLE column " +
        "via absTolCols semantics and every DECIMAL column via " +
        "absTolDecimalCols semantics; spell the same sets here)")
    val allCols = SchemaUtils.mergeColumns(beforeCols, afterCols)
    val bSet = beforeCols.map(_.toLowerCase).toSet
    val aSet = afterCols.map(_.toLowerCase).toSet
    val keySet = keys.map(_.toLowerCase).toSet

    // mirror TableDiff.diff's reserved-name guard (ADVICE r11): without
    // it an input column literally named _dup_before makes collapseSel
    // emit two same-aliased columns that fail only at execution time
    if (dedupDuplicateKeys) {
      val reserved = Seq("_dup_before", "_dup_after", "_dup_status")
        .filter(r => (beforeCols ++ afterCols).exists(_.equalsIgnoreCase(r)))
      require(
        reserved.isEmpty,
        s"dedupDuplicateKeys reserves the column name(s) ${reserved.mkString(", ")}; " +
          "rename the input column(s)")
      // mirror the operator's MAP-data guard: MIN over a map column
      // has no ordering in either engine — the emitted SQL would fail
      // only at execution time
      val mapData = mapEntryEqCols.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
      require(
        mapData.isEmpty,
        s"dedupDuplicateKeys cannot collapse MAP-typed data column(s) " +
          s"${mapData.mkString(", ")} (maps have no MIN ordering); drop or " +
          "pre-convert them, or generate without dedupDuplicateKeys")
    }

    def pad(c: String) =
      paddedTypes.get(c).map(t => s"CAST(NULL AS $t)").getOrElse("NULL")
    // type-changed columns: every reference to the column is cast to
    // the widened common type, so the comparison type is pinned, not
    // engine-coerced (see @param castTypes)
    def castOf(c: String): Option[String] =
      castTypes.collectFirst { case (n, t) if n.equalsIgnoreCase(c) => t }
    def ref(alias: String, c: String): String =
      castOf(c).map(t => s"CAST($alias.$c AS $t)").getOrElse(s"$alias.$c")

    // plain key list (collapse CTE select/GROUP BY — original types);
    // the key UNIVERSE select casts type-changed keys to the widened
    // type so the UNION-distinct and join run under the pinned type
    val keyList = keys.mkString(", ")
    val keyUniverse = keys
      .map(k => castOf(k).map(t => s"CAST($k AS $t) AS $k").getOrElse(k))
      .mkString(", ")
    val kEcho = keys.map(k => s"k.$k AS K_$k").mkString(", ")
    val bProj = allCols
      .map(c => if (bSet(c.toLowerCase)) s"${ref("b", c)} AS b_$c" else s"${pad(c)} AS b_$c")
      .mkString(",\n    ")
    val aProj = allCols
      .map(c => if (aSet(c.toLowerCase)) s"${ref("a", c)} AS a_$c" else s"${pad(c)} AS a_$c")
      .mkString(",\n    ")
    def joinCond(alias: String) =
      keys
        .map(k => s"${ref(alias, k)} IS NOT DISTINCT FROM k.$k")
        .mkString(" AND ")

    val k0 = keys.head
    val bothPresent = if (legacyRowStatusZero) "0" else "CAST(NULL AS INTEGER)"
    val statusCols = allCols
      .map { c =>
        val valueEq =
          if (mapEntryEqCols.exists(_.equalsIgnoreCase(c)))
            s"array_sort(map_entries(b_$c)) IS NOT DISTINCT FROM array_sort(map_entries(a_$c))"
          else if (structuralEqCols.exists(_.equalsIgnoreCase(c)))
            s"b_$c IS NOT DISTINCT FROM a_$c"
          else if (absTolDecimalCols.exists(_.equalsIgnoreCase(c)))
            // exact-type spelling: subtract in native DECIMAL, cast
            // only the (small) difference to DOUBLE — see @param
            s"CAST(ABS(b_$c - a_$c) AS DOUBLE) <= ${numericAbsTol.get}"
          else if (absTolCols.exists(_.equalsIgnoreCase(c)))
            // [[DiffOptions.numericAbsTol]]'s spelling: double-cast
            // both sides, same IEEE subtraction in both engines
            s"ABS(CAST(b_$c AS DOUBLE) - CAST(a_$c AS DOUBLE)) <= ${numericAbsTol.get}"
          else s"b_$c = a_$c"
        s"""CASE WHEN b_$c IS NULL AND a_$c IS NULL THEN 0
           |    WHEN b_$c IS NULL THEN 2
           |    WHEN a_$c IS NULL THEN 3
           |    WHEN $valueEq THEN 0
           |    ELSE 1 END AS $c""".stripMargin
      }
      .mkString(",\n  ")

    // key collapse CTEs (dedupDuplicateKeys): one row per key tuple,
    // MIN representative per data column, COUNT(*) multiplicity
    def collapseSel(cols: Seq[String], cnt: String): String =
      (keys ++
        cols.filterNot(c => keySet(c.toLowerCase)).map(c => s"MIN($c) AS $c") :+
        s"COUNT(*) AS $cnt").mkString(", ")
    val collapseCtes =
      if (!dedupDuplicateKeys) ""
      else
        s"""|, before_c AS (
            |  SELECT ${collapseSel(beforeCols, "_dup_before")}
            |  FROM before_t GROUP BY $keyList
            |), after_c AS (
            |  SELECT ${collapseSel(afterCols, "_dup_after")}
            |  FROM after_t GROUP BY $keyList
            |)""".stripMargin
    val (bFrom, aFrom) =
      if (dedupDuplicateKeys) ("before_c", "after_c") else ("before_t", "after_t")
    val dupJoinedCols =
      if (dedupDuplicateKeys) ",\n    b._dup_before AS _dup_before, a._dup_after AS _dup_after"
      else ""
    val dupTail =
      if (!dedupDuplicateKeys) ""
      else
        """|,
           |  _dup_before, _dup_after,
           |  CASE WHEN _dup_before IS NULL AND _dup_after IS NULL THEN 0
           |       WHEN _dup_before IS NULL THEN 2
           |       WHEN _dup_after IS NULL THEN 3
           |       WHEN _dup_before = _dup_after THEN 0
           |       ELSE 1 END AS _dup_status""".stripMargin

    s"""WITH before_t AS (
       |$beforeBody
       |), after_t AS (
       |$afterBody
       |)$collapseCtes, all_keys AS (
       |  SELECT $keyUniverse FROM $bFrom
       |  UNION
       |  SELECT $keyUniverse FROM $aFrom
       |), joined AS (
       |  SELECT $kEcho,
       |    $bProj,
       |    $aProj$dupJoinedCols
       |  FROM all_keys k
       |  LEFT JOIN $bFrom b ON ${joinCond("b")}
       |  LEFT JOIN $aFrom a ON ${joinCond("a")}
       |)
       |SELECT
       |  CASE WHEN b_$k0 IS NULL THEN 4
       |       WHEN a_$k0 IS NULL THEN 5
       |       ELSE $bothPresent END AS _row_status,
       |  ${keys.map(k => s"K_$k").mkString(", ")},
       |  $statusCols$dupTail
       |FROM joined""".stripMargin
  }

  /** Single-line "transport" flattening: strip `--` comments and
    * collapse all whitespace — the reference's one-statement-per-line
    * batch form (diffgen.py:120-129). The reference only drops
    * comment-only lines and *forbids* inline `--` (AGENTS.md:176-179);
    * we additionally strip trailing comments so any emitted SQL is
    * flattenable. (Naive about `--` inside string literals, same as
    * the reference.)
    */
  /** The ONE tolerance guard shared by all three entry points —
    * [[generate]], [[TableDiff.diff]], and the CLI
    * ([[graft.cli.DiffGen]]). A negative or NaN tolerance makes every
    * numeric cell read status 1 (even bit-identical values, since
    * `|b−a| <= tol` is false for tol < 0 and NEVER true against NaN);
    * +Infinity makes every pair read status 0. Both are silent
    * misconfigurations, so every entry point rejects them (ADVICE
    * r12: the guard previously lived only on the CLI path).
    */
  private[graft] def validateAbsTol(t: Double, flag: String): Unit =
    require(
      t >= 0 && !t.isNaN && !t.isInfinity,
      s"$flag must be a finite non-negative number, got $t (negative/NaN " +
        "reads every numeric cell as status 1 even when bit-identical; " +
        "+Infinity reads every pair as status 0)")

  def flatten(sql: String): String =
    sql.linesIterator
      .map(_.replaceAll("--.*$", "").trim)
      .filterNot(_.isEmpty)
      .mkString(" ")
      .replaceAll("\\s+", " ")
      .trim
}
