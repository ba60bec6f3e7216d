package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `z_interleave16(x, y)` — Morton / Z-order bit interleave of the
  * low 16 bits of two BIGINT dimension values into one BIGINT in
  * [0, 2³²).
  *
  * The layout primitive for multi-dimensional data clustering: sort
  * or `repartitionByRange` by the Z-key and rows close in (x, y) land
  * in the same files, so min/max column statistics prune scans for
  * predicates on EITHER dimension — the standard lakehouse technique
  * for two-column locality where a lexicographic sort only helps the
  * leading column. 16 bits per dimension = 65 536 buckets per axis,
  * ample for file-level clustering, and keeps every intermediate
  * below 2³² so the identical shift/mask formula is overflow-safe in
  * any engine's signed-64-bit arithmetic (the DuckDB oracle runs the
  * same five spread steps verbatim).
  *
  * Codegen'd (static kernel call, stays inside WholeStageCodegen);
  * pure bit ops, bit-exact everywhere.
  */
case class ZInterleave16(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "z_interleave16"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_interleave16 requires two BIGINT inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  protected override def nullSafeEval(x: Any, y: Any): Any =
    ZInterleave16.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZInterleave16.interleave($x, $y)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZInterleave16 =
    copy(left = l, right = r)
}

object ZInterleave16 {

  /** Spread the low 16 bits of v to the even bit positions of a
    * 32-bit value (the classic magic-number Morton spread).
    */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** x bits at even positions, y bits at odd — called from generated
    * code.
    */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Register `z_interleave16` for SQL/`expr()` use (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave16", exprs => ZInterleave16(exprs(0), exprs(1)), "built-in")

  /** DuckDB twin of [[spread]] as an inline SQL expression. */
  private def spreadDuck(e: String): String = {
    val a = s"(($e) & 65535)"
    val b = s"((($a) | (($a) << 8)) & 16711935)"
    val c = s"((($b) | (($b) << 4)) & 252645135)"
    val d = s"((($c) | (($c) << 2)) & 858993459)"
    s"((($d) | (($d) << 1)) & 1431655765)"
  }

  /** DuckDB twin of the full interleave, over two SQL expressions. */
  def interleaveDuck(x: String, y: String): String =
    s"(${spreadDuck(x)} | (${spreadDuck(y)} << 1))"

  /** Cluster a DataFrame for a two-dimensional-locality write:
    * range-partition by the Z-key into `numFiles` partitions and sort
    * within each, so a `write.parquet` of the result produces files
    * whose min/max column statistics are tight on BOTH dimensions.
    *
    * By default each dimension is NORMALIZED to the full 16-bit
    * domain from its observed min/max (one tiny agg pass — the
    * Delta/Iceberg writers rank-normalize the same way), because a
    * raw interleave of unequal-width domains is quietly useless: with
    * a 15-bit × 10-bit key pair the second dimension's high interleave
    * bits are constant zero, the key order degenerates to a sort on
    * the wider column, and the narrow dimension gets 0% file skipping
    * (measured — the ScaleBench probe before normalization). Pass
    * `normalize = false` to key on the raw `% 65536` values when the
    * caller has already scaled its dimensions.
    *
    * The `_z` column is dropped before return — callers write exactly
    * their own schema; the clustering lives in the row order.
    */
  def clusterByZ(
      df: org.apache.spark.sql.DataFrame,
      xCol: String,
      yCol: String,
      numFiles: Int,
      normalize: Boolean = true): org.apache.spark.sql.DataFrame = {
    register(df.sparkSession)
    import org.apache.spark.sql.functions.{col, expr, max, min}
    // withColumn would silently REPLACE (and drop below) a caller's
    // own `_z` — fail loudly instead of losing their data
    require(!df.columns.contains("_z"),
      "input already has a column named _z; rename it before clusterByZ")
    val zExpr =
      if (!normalize)
        s"z_interleave16(CAST($xCol % 65536 AS BIGINT), CAST($yCol % 65536 AS BIGINT))"
      else {
        val b = df.agg(
          min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
          min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
        if (b.isNullAt(0) || b.isNullAt(2))
          // empty input (or all-NULL dims): nothing to normalize
          s"z_interleave16(CAST($xCol % 65536 AS BIGINT), CAST($yCol % 65536 AS BIGINT))"
        else
          s"z_interleave16(${ZNorm.scaledDim("clusterByZ", xCol, b.getLong(0), b.getLong(1), 65536L)}, " +
            s"${ZNorm.scaledDim("clusterByZ", yCol, b.getLong(2), b.getLong(3), 65536L)})"
      }
    df.withColumn("_z", expr(zExpr))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}

/** Append + re-cluster lifecycle for a [[ZInterleave16.clusterByZ]]
  * parquet layout — the Z-order counterpart of the band table's
  * write/append/compact trio (Dedup.writeBandTable family). A
  * clustered table is only clustered until the first append: appended
  * files carry arbitrary (x, y) ranges, so a min/max-stats reader can
  * never prune them and skip% decays with every batch (measured by
  * the ScaleBench append-degradation probe). The layout here is
  * `path/base` (clustered generation) + `path/tail` (raw appends);
  * [[appendAndMaybeRecluster]] folds the re-cluster cadence into the
  * ingest call the way [[graft.operators.Dedup.appendAndMaybeCompact]]
  * does for band tables, so steady-state pipelines cannot forget it.
  *
  * Scale note: a re-cluster rewrites base+tail wholesale — the
  * trigger is a FILE-COUNT fraction precisely so that cost stays
  * amortized (a tail capped at fraction f of the base bounds rewrite
  * work per ingested row at 1/f writes). A 100 TB deployment
  * partitions the table (by day/tenant) and runs this per partition;
  * the cadence logic is unchanged.
  */
object ZLayout {

  import org.apache.hadoop.fs.{FileSystem, Path}
  import org.apache.spark.sql.{DataFrame, SparkSession}

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parquetFiles(spark: SparkSession, dir: String): Int = {
    val f = fsOf(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) 0
    else f.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  private def subdirs(f: FileSystem, path: String, prefix: String): Seq[Path] = {
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath).filter(_.getName.startsWith(prefix)).toSeq
  }

  /** Write (or replace) the clustered base generation and clear any
    * tail (or in-flight merge) left by a previous generation.
    */
  def writeClustered(
      df: DataFrame, path: String, xCol: String, yCol: String, numFiles: Int): Unit =
    writeClusteredWith(df, path, ZInterleave16.clusterByZ(_, xCol, yCol, numFiles))

  /** [[writeClustered]] for an N-dimensional key
    * ([[ZInterleaveN.clusterByZN]], 2-8 dims) — same layout, same
    * lifecycle ([[append]]/[[appendAndMaybeReclusterN]]/[[recover]]).
    */
  def writeClusteredN(
      df: DataFrame, path: String, dims: Seq[String], numFiles: Int): Unit =
    writeClusteredWith(df, path, ZInterleaveN.clusterByZN(_, dims, numFiles))

  private def writeClusteredWith(
      df: DataFrame, path: String, cluster: DataFrame => DataFrame): Unit = {
    // Full replacement rides the SAME crash-safe swap as the
    // re-cluster cadence (ADVICE r12: the previous overwrite-then-
    // clean order had a window where a crash — or a concurrent read —
    // between the base overwrite and the tail deletion served the new
    // base plus the OLD generation's stale tail, a mixed-generation
    // result). Protocol: finish/discard any in-flight swap, snapshot
    // the tail aside as merging_* (reads keep serving the complete old
    // generation), materialize the new generation FULLY at base_next,
    // then rollForward commits — discarding the snapshot (replacement
    // means those rows are superseded by `df`) and swapping via
    // checked renames. Every crash point lands in a recover()-decidable
    // state: old generation intact, or new generation committed.
    val spark = df.sparkSession
    val f = fsOf(spark, path)
    recover(spark, path)
    val tail = new Path(s"$path/tail")
    if (f.exists(tail)) {
      val merging = new Path(
        s"$path/merging_${java.util.UUID.randomUUID().toString.take(8)}")
      if (!f.rename(tail, merging))
        throw new java.io.IOException(s"could not snapshot $path/tail for replacement")
    }
    cluster(df).write.mode("overwrite").parquet(s"$path/base_next")
    rollForward(f, path)
  }

  /** The whole table: clustered base, any appended tail, and any
    * `merging_*` snapshot a re-cluster is currently folding in (its
    * rows leave `tail` the moment the re-cluster starts but only
    * leave disk once the new generation is complete — reading it
    * keeps the table complete throughout the swap). Rows tombstoned
    * by [[delete]] are masked here (broadcast anti-join on the tiny
    * key set — a DATA-table scan has no bucketing to preserve, caller
    * predicates still push through the streamed side to parquet; no
    * plan change at all when nothing was ever deleted).
    */
  /** The live generation's tombstone set: INSIDE the base directory,
    * underscore-named so Spark's parquet listing never sees it as
    * data. Generation-scoping is the crash-safety design (review
    * r13): the set dies ATOMICALLY with its generation at the
    * existing checked-rename swap — a replacement's fresh `base_next`
    * carries no set (caller-authoritative rows are never masked, not
    * even transiently), a re-cluster's fresh generation was built
    * through the masked read (the removal is baked in), and there is
    * NO separate clear step to crash around.
    */
  private def tombstoneDir(path: String): String = s"$path/base/_tombstones"

  def read(spark: SparkSession, path: String): DataFrame = {
    val extra = subdirs(fsOf(spark, path), path, "merging_").map(_.toString)
      .filter(d => parquetFiles(spark, d) > 0)
    val tail = if (parquetFiles(spark, s"$path/tail") > 0) Seq(s"$path/tail") else Nil
    val raw = spark.read.parquet((Seq(s"$path/base") ++ tail ++ extra): _*)
    val t = tombstoneDir(path)
    // committed-footer guard, same as the sibling dirs: a delete that
    // crashed mid-write leaves only _temporary — an existence check
    // alone would brick every subsequent read on schema inference
    if (parquetFiles(spark, t) == 0) raw
    else {
      import org.apache.spark.sql.functions.broadcast
      // no distinct(): right-side duplicates cannot change an
      // anti-join, and delete() already writes each call's set
      // distinct — the aggregate would tax every masked read
      val tomb = spark.read.parquet(t)
      raw.join(broadcast(tomb), Seq(tomb.columns.head), "left_anti")
    }
  }

  /** Hard cap on a generation's tombstone ids — the r13 state-table
    * contract (Dedup.MaxTombstones rationale): past this the set is
    * not "takedown-sized" and the fix is a fold, not a bigger mask
    * ([[read]] broadcasts the set to every executor).
    */
  val MaxTombstones: Int = 100000

  /** Tombstone rows by key (takedown/re-curation — the deletion path
    * every other persisted layout in the engine grew in r13): `ids`
    * must be ONE column whose NAME is a column of the stored rows and
    * whose TYPE matches that column exactly (the anti-join would
    * otherwise ride Catalyst's implicit comparison coercions — a
    * BIGINT key matched against STRING ids goes through DOUBLE and
    * silently misses ids past 2^53; the engine just pinned
    * widen-or-fail type semantics for exactly this class of seam, so
    * the delete fails fast instead). [[read]] masks the keys
    * immediately; the next COMMITTED generation swap (re-cluster
    * cadence or a [[writeClustered]] replacement) retires the set
    * atomically with the generation it belongs to — a re-cluster
    * bakes the removal in, a replacement supersedes it with the
    * caller's rows. Ids are permanent until then (a row re-appended
    * under a tombstoned key stays masked and is dropped by a fold);
    * NULL ids and oversized sets fail fast here at the error site.
    * `delete` is a WRITER op under the layout's single-writer
    * maintenance contract, and like every writer op it first
    * [[recover]]s — writing into a generation that a pending
    * completed swap is about to replace would lose the takedown.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      "pass exactly ONE id column, named as the stored rows' key column; " +
        s"got ${ids.columns.mkString(", ")}")
    recover(spark, path)
    val keyCol = ids.columns.head
    import org.apache.spark.sql.functions.col
    val baseField = spark.read.parquet(s"$path/base").schema.fields
      .find(_.name == keyCol)
    require(baseField.isDefined,
      s"tombstone key column '$keyCol' does not exist in the stored rows — " +
        "the mask would silently drop nothing")
    val idType = ids.schema.head.dataType
    require(idType.catalogString == baseField.get.dataType.catalogString,
      s"tombstone ids are ${idType.catalogString} but stored column " +
        s"'$keyCol' is ${baseField.get.dataType.catalogString} — an implicit " +
        "comparison coercion can silently miss keys; cast the ids explicitly")
    val t = tombstoneDir(path)
    val existingCount =
      if (parquetFiles(spark, t) == 0) 0L
      else {
        val existing = spark.read.parquet(t)
        require(existing.columns.head == keyCol,
          s"tombstone set at $t keys on '${existing.columns.head}' but this " +
            s"delete keys on '$keyCol' — one generation masks by one key " +
            "column; re-cluster to fold the existing set in before switching keys")
        existing.count()
      }
    // one upstream execution for the null gate, the cap, and the write
    val d = ids.distinct().localCheckpoint(true)
    require(
      d.filter(col(keyCol).isNull).isEmpty,
      s"tombstone ids contain NULL in '$keyCol' — a null key identifies no " +
        "row; clean the id set before calling delete")
    require(existingCount + d.count() <= MaxTombstones,
      s"tombstone set would exceed $MaxTombstones ids — no longer " +
        "takedown-sized; re-cluster to fold the current set into the layout " +
        "before deleting more")
    d.coalesce(1).write.mode("append").parquet(t)
  }

  /** Raw append into the tail — cheap (no clustering pass), unpruned
    * by readers until the next re-cluster. `appendTasks` caps the
    * batch's file fan-out like the band-table append knob.
    */
  def append(batch: DataFrame, path: String, appendTasks: Int = 0): Unit =
    (if (appendTasks > 0) batch.repartition(appendTasks) else batch)
      .write.mode("append").parquet(s"$path/tail")

  /** [[append]] plus automatic re-cluster cadence: when the tail
    * exceeds `maxTailFraction` of the base's file count, base+tail
    * are re-clustered into a fresh base generation (written beside,
    * then swapped in) and the tail is cleared. Returns true when this
    * append triggered the re-cluster. File count, not bytes, is the
    * trigger for the same reason as the band table's: every unpruned
    * tail file costs a reader one open regardless of size, and tail
    * files are batch-sized by construction.
    *
    * Swap protocol (single-writer maintenance op, like
    * compactBandTable), crash-safe by roll-forward:
    *  1. the tail being merged is renamed aside to `merging_*`
    *     FIRST, so rows appended after a crash can never be confused
    *     with rows already folded into a new generation;
    *  2. the new generation is FULLY written to `base_next` — a
    *     complete write is identified by parquet's `_SUCCESS` marker,
    *     before which every row still lives in base + merging_* (both
    *     of which [[read]] serves), after which every row lives in
    *     base_next;
    *  3. [[rollForward]] then deletes merging_*, parks base at
    *     `base_old_*`, renames base_next in, and clears base_old —
    *     each rename CHECKED (a rename onto an existing directory
    *     NESTS on HDFS instead of replacing).
    * [[recover]] runs at the top of every call and is decidable from
    * the on-disk state alone: complete base_next → finish the swap;
    * partial base_next → discard it and put merging_* back in the
    * tail; orphan base_old_* → restore or clear. So no crash point
    * loses rows, and a leftover base_next is never clobbered by the
    * next generation write. The residual window (crash between
    * merging_* deletion and the rename-in) leaves reads stale —
    * never wrong or doubled — until the next writer call recovers;
    * a production deployment would close even that with a
    * manifest/catalog commit.
    */
  def appendAndMaybeRecluster(
      batch: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      numFiles: Int,
      maxTailFraction: Double = 0.15,
      appendTasks: Int = 0): Boolean =
    appendAndMaybeReclusterWith(
      batch, path, maxTailFraction, appendTasks,
      ZInterleave16.clusterByZ(_, xCol, yCol, numFiles))

  /** [[appendAndMaybeRecluster]] for an N-dimensional key — identical
    * cadence and crash-safe swap, clustered by
    * [[ZInterleaveN.clusterByZN]].
    */
  def appendAndMaybeReclusterN(
      batch: DataFrame,
      path: String,
      dims: Seq[String],
      numFiles: Int,
      maxTailFraction: Double = 0.15,
      appendTasks: Int = 0): Boolean =
    appendAndMaybeReclusterWith(
      batch, path, maxTailFraction, appendTasks,
      ZInterleaveN.clusterByZN(_, dims, numFiles))

  private def appendAndMaybeReclusterWith(
      batch: DataFrame,
      path: String,
      maxTailFraction: Double,
      appendTasks: Int,
      cluster: DataFrame => DataFrame): Boolean = {
    require(maxTailFraction > 0, "maxTailFraction must be positive")
    val spark = batch.sparkSession
    recover(spark, path)
    append(batch, path, appendTasks)
    val nTail = parquetFiles(spark, s"$path/tail")
    val nBase = parquetFiles(spark, s"$path/base")
    if (nTail.toDouble <= maxTailFraction * math.max(nBase, 1)) false
    else {
      val f = fsOf(spark, path)
      val merging = new Path(
        s"$path/merging_${java.util.UUID.randomUUID().toString.take(8)}")
      if (!f.rename(new Path(s"$path/tail"), merging))
        throw new java.io.IOException(s"could not snapshot $path/tail for merge")
      // materialize the new generation COMPLETELY before touching
      // anything the readers see (read() still serves merging_*)
      cluster(read(spark, path))
        .write.mode("overwrite").parquet(s"$path/base_next")
      rollForward(f, path)
      true
    }
  }

  /** Complete (or discard) an interrupted generation swap. Idempotent,
    * single-writer; see [[appendAndMaybeRecluster]] for the protocol.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val f = fsOf(spark, path)
    val next = new Path(s"$path/base_next")
    if (f.exists(new Path(next, "_SUCCESS"))) {
      // the new generation is complete — finish the swap
      rollForward(f, path)
    } else {
      if (f.exists(next) && !f.delete(next, true))
        throw new java.io.IOException(s"could not discard partial $path/base_next")
      // a merge snapshot whose generation never completed: its rows
      // exist nowhere else — move its files back into the tail
      // (part-file names are UUID-unique, so no collisions)
      subdirs(f, path, "merging_").foreach { m =>
        val tail = new Path(s"$path/tail")
        if (!f.exists(tail) && !f.mkdirs(tail))
          throw new java.io.IOException(s"could not recreate $tail")
        f.listStatus(m).foreach { st =>
          if (!f.rename(st.getPath, new Path(tail, st.getPath.getName)))
            throw new java.io.IOException(
              s"could not restore ${st.getPath} into $tail")
        }
        f.delete(m, true)
      }
      val olds = subdirs(f, path, "base_old_")
      if (!f.exists(new Path(s"$path/base")) && olds.nonEmpty) {
        // crash between the park and the rename-in with base_next
        // already gone cannot happen under this protocol (base_next
        // is renamed before base_old is cleared), but restore
        // defensively rather than leave the table headless
        if (!f.rename(olds.head, new Path(s"$path/base")))
          throw new java.io.IOException(s"could not restore ${olds.head}")
        olds.tail.foreach(f.delete(_, true))
      } else olds.foreach(f.delete(_, true))
    }
  }

  /** The commit half of the swap, re-runnable from any crash point
    * after `base_next` is complete.
    */
  private def rollForward(f: FileSystem, path: String): Unit = {
    // merged rows all live in the complete base_next; drop snapshots
    subdirs(f, path, "merging_").foreach { m =>
      if (!f.delete(m, true))
        throw new java.io.IOException(
          s"could not clear $m — new generation left at $path/base_next")
    }
    val base = new Path(s"$path/base")
    if (f.exists(base)) {
      val oldBase = new Path(
        s"$path/base_old_${java.util.UUID.randomUUID().toString.take(8)}")
      if (!f.rename(base, oldBase))
        throw new java.io.IOException(
          s"could not move $path/base aside — new generation left at $path/base_next")
    }
    if (!f.rename(new Path(s"$path/base_next"), base))
      throw new java.io.IOException(
        s"could not swap $path/base_next into place — previous generation " +
          s"preserved under $path/base_old_*")
    subdirs(f, path, "base_old_").foreach(f.delete(_, true))
    // no tombstone step here BY DESIGN: the set lives INSIDE the base
    // generation (tombstoneDir), so the rename above retired the old
    // set atomically with its generation — the re-cluster path baked
    // the removal in through the masked read, and a replacement's
    // fresh generation starts unmasked (caller-authoritative rows are
    // never hidden, not even transiently).
  }
}

/** The ONE definition of equal-width dimension normalization shared
  * by the 2-dim and N-dim clustering paths — the span-overflow guard
  * here earned a bugfix once (raw `mx - mn` wraps for a dimension
  * spanning more than half the 64-bit domain and slips past the width
  * check into DIV-0/garbage keys); a second copy would let the fix
  * drift.
  */
private[functions] object ZNorm {
  def scaledDim(opName: String, c: String, mn: Long, mx: Long, dom: Long): String = {
    val span =
      try Math.subtractExact(mx, mn)
      catch {
        case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"$opName: $c spans more than 2^63 values — too wide " +
              "to normalize exactly; pre-scale the dimension or pass " +
              "normalize = false")
      }
    val range = span + 1
    // (v - mn) * dom must stay inside signed 64 bits
    require(range > 0 && range < (1L << 46),
      s"$opName: $c spans $range values — too wide to normalize " +
        "exactly; pre-scale the dimension or pass normalize = false")
    s"CAST((($c) - ($mn)) * $dom DIV $range AS BIGINT)"
  }
}

/** `z_interleave_n(x1, …, xd)` — Morton interleave generalized to d
  * dimensions (2 ≤ d ≤ 8): bit j of dimension i lands at position
  * j·d + i, using ⌊63/d⌋-capped-at-16 bits per dimension so the key
  * always fits non-negative signed 64-bit (d=2 → 16 bits each,
  * identical key to [[ZInterleave16]]; d=3 → 16 bits; d=4 → 15; …).
  *
  * The spread is a plain bit loop rather than the 2-dim magic-number
  * ladder, and the expression is a CodegenFallback — deliberate, not
  * an oversight: this is a WRITE-side clustering primitive evaluated
  * once per row during layout (≤ 16·d bit steps), never a scan-side
  * kernel, so the interpreted-eval cost is noise next to the write
  * it feeds; the 2-dim hot path keeps the fully codegen'd
  * [[ZInterleave16]].
  */
case class ZInterleaveN(children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "z_interleave_n"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"z_interleave_n takes 2 to 8 BIGINT dimensions, got ${children.size}")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"z_interleave_n requires BIGINT inputs, got " +
          children.map(_.dataType.catalogString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = children.size
    val bits = ZInterleaveN.bitsPerDim(d)
    var acc = 0L
    var i = 0
    while (i < d) {
      val v = children(i).eval(input)
      if (v == null) return null
      acc |= ZInterleaveN.spread(v.asInstanceOf[Long], d, bits) << i
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZInterleaveN = copy(children = newChildren)
}

object ZInterleaveN {

  /** Bits kept per dimension: the full key must stay within 63 bits. */
  def bitsPerDim(d: Int): Int = math.min(16, 63 / d)

  /** Bit j of (v mod 2^bits) moved to position j·stride — the
    * stride-generic Morton spread.
    */
  def spread(v: Long, stride: Int, bits: Int): Long = {
    val masked = v & ((1L << bits) - 1)
    var out = 0L
    var j = 0
    while (j < bits) {
      out |= ((masked >> j) & 1L) << (j * stride)
      j += 1
    }
    out
  }

  /** Full interleave over a value array — reference form for specs. */
  def interleave(vals: Array[Long]): Long = {
    val d = vals.length
    val bits = bitsPerDim(d)
    var acc = 0L
    var i = 0
    while (i < d) { acc |= spread(vals(i), d, bits) << i; i += 1 }
    acc
  }

  /** Register `z_interleave_n` for SQL/`expr()` use (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave_n", exprs => ZInterleaveN(exprs), "built-in")

  /** DuckDB twin of the d-dim interleave over SQL expressions — the
    * bit loop unrolled to shift/mask terms (16·d ORs; mechanical but
    * exactly the Scala kernel's formula, so the oracle and the engine
    * share one definition).
    */
  def interleaveNDuck(dims: Seq[String]): String = {
    val d = dims.size
    require(d >= 2 && d <= 8, s"interleaveNDuck takes 2 to 8 dims, got $d")
    val bits = bitsPerDim(d)
    dims.zipWithIndex
      .flatMap { case (e, i) =>
        (0 until bits).map(j => s"((((${e}) >> $j) & 1) << ${j * d + i})")
      }
      .mkString("(", " | ", ")")
  }

  /** [[ZInterleave16.clusterByZ]] generalized to d dimensions: range-
    * partition by the d-dim Z-key into `numFiles` partitions and sort
    * within each, with the same equal-width min/max normalization per
    * dimension (and the same overflow guards) — so a write of the
    * result yields files whose min/max statistics are tight on EVERY
    * clustered dimension. More dimensions split the same bit budget:
    * per-dim resolution is 2^⌊63/d⌋-capped-at-16 cells, so each added
    * dimension costs the others selectivity — cluster the 2-4 columns
    * queries actually filter on, not every column.
    */
  def clusterByZN(
      df: org.apache.spark.sql.DataFrame,
      cols: Seq[String],
      numFiles: Int,
      normalize: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(cols.size >= 2 && cols.size <= 8, "clusterByZN takes 2 to 8 dimension columns")
    register(df.sparkSession)
    import org.apache.spark.sql.functions.{col, expr, max, min}
    require(!df.columns.contains("_z"),
      "input already has a column named _z; rename it before clusterByZN")
    val dom = 1L << bitsPerDim(cols.size)
    val dims: Seq[String] =
      if (!normalize) cols.map(c => s"CAST($c % $dom AS BIGINT)")
      else {
        val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
        val b = df.agg(aggs.head, aggs.tail: _*).head()
        cols.zipWithIndex.map { case (c, i) =>
          if (b.isNullAt(2 * i)) s"CAST($c % $dom AS BIGINT)"
          else ZNorm.scaledDim("clusterByZN", c, b.getLong(2 * i), b.getLong(2 * i + 1), dom)
        }
      }
    df.withColumn("_z", expr(s"z_interleave_n(${dims.mkString(", ")})"))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
