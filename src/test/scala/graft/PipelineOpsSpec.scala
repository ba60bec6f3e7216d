package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CmsOps, ZInterleave16}
import graft.operators.{BloomPrune, Sampling, TextAnalysis}

/** Round-7 pipeline operators: bloom join pruning, count-min heavy
  * hitters, Z-order layout keys, stratified sampling, tf-idf top
  * terms.
  */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // ---- bloom join pruning ----

  test("bloom-pruned join returns exactly the plain join's rows") {
    import spark.implicits._
    val large = (1L to 2000L).map(k => (k, k % 97)).toDF("id", "fk")
    val small = Seq((5L, "a"), (13L, "b"), (44L, "c")).toDF("pk", "name")
    val pruned = BloomPrune.prunedJoin(large, small, "fk", "pk", estItems = 100L)
      .select("id", "fk", "pk", "name")
    val plain = large.join(small, col("fk") === col("pk"))
      .select("id", "fk", "pk", "name")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("an undersized bloom (high false-positive rate) never changes the result") {
    import spark.implicits._
    val large = (1L to 5000L).map(k => (k, k % 211)).toDF("id", "fk")
    val small = Seq((7L, "a"), (101L, "b")).toDF("pk", "name")
    // estItems=1 → 8-bit bitmap: nearly everything is a false
    // positive, the prefilter prunes almost nothing — the exact join
    // must still make the output identical to the plain join
    val pruned = BloomPrune.prunedJoin(large, small, "fk", "pk", estItems = 1L)
      .select("id", "fk", "pk", "name")
    val plain = large.join(small, col("fk") === col("pk"))
      .select("id", "fk", "pk", "name")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the bloom probe filters the large side BELOW the join") {
    import spark.implicits._
    val large = (1L to 100L).map(k => (k, k % 7)).toDF("id", "fk")
    val small = Seq((1L, "a")).toDF("pk", "name")
    val plan = BloomPrune.prunedJoin(large, small, "fk", "pk", estItems = 10L)
      .queryExecution.executedPlan.toString
    // tree renders parents above children: the probe-side filter line
    // must appear below the join line
    val joinAt = plan.linesIterator.indexWhere(_.contains("Join"))
    val filterAt = plan.linesIterator.indexWhere(l =>
      l.contains("Filter") && l.contains("might_contain"))
    assert(joinAt >= 0 && filterAt > joinAt,
      s"bloom filter not below the join:\n$plan")
  }

  // ---- count-min sketch estimate ----

  test("cms_estimate upper-bounds within eps*N and never undercounts") {
    import spark.implicits._
    CmsOps.register(spark)
    // skewed multiset: key k appears k times, over 8 partitions so the
    // sketch aggregation exercises partial+merge
    val data = (1L to 50L).flatMap(k => Seq.fill(k.toInt)(k))
    val df = spark.sparkContext.parallelize(data, 8).toDF("k")
    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.99d, 7)").as("sk"))
    val n = data.size
    val checked = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .join(broadcast(sk))
      .select(
        col("k"), col("exact"),
        expr("cms_estimate(sk, k)").as("est"))
      .collect()
    assert(checked.length == 50)
    checked.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact"), r.getAs[Long]("est"))
      assert(est >= exact, s"undercount for k=${r.getAs[Long]("k")}")
      assert(est <= exact + math.ceil(0.001 * n).toLong + 1,
        s"estimate $est too far above exact $exact")
    }
  }

  test("cms_estimate rejects non-(BINARY, BIGINT) inputs at analysis time") {
    import spark.implicits._
    CmsOps.register(spark)
    val df = Seq((Array[Byte](1), 1)).toDF("sk", "k")
    val e = intercept[Exception] {
      df.select(expr("cms_estimate(sk, CAST(k AS INT))")).collect()
    }
    assert(e.getMessage.contains("cms_estimate"))
  }

  // ---- Z-order interleave ----

  test("z_interleave16 matches a bit-by-bit reference") {
    def reference(x: Long, y: Long): Long = {
      var z = 0L
      for (b <- 0 until 16) {
        z |= ((x >> b) & 1L) << (2 * b)
        z |= ((y >> b) & 1L) << (2 * b + 1)
      }
      z
    }
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0xABCDL, 0x1234L), (70000L, 3L) /* masked to 16 bits */ )
    cases.foreach { case (x, y) =>
      assert(ZInterleave16.interleave(x, y) == reference(x & 0xFFFF, y & 0xFFFF),
        s"mismatch at ($x, $y)")
    }
  }

  test("sorting by z-key clusters both dimensions: per-chunk bbox area shrinks") {
    import spark.implicits._
    ZInterleave16.register(spark)
    // 64x64 grid; after a z-sort, consecutive chunks of 256 rows
    // should cover a small bounding box in BOTH x and y (the whole
    // point of the layout), vs the x-sorted layout where y spans the
    // full axis in every chunk
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val zSorted = grid.toDF("x", "y")
      .withColumn("z", expr("z_interleave16(x, y)"))
      .orderBy("z")
      .collect()
    val chunkAreas = zSorted.grouped(256).map { chunk =>
      val xs = chunk.map(_.getAs[Long]("x"))
      val ys = chunk.map(_.getAs[Long]("y"))
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
    }.toSeq
    // perfect z-curve on a 64x64 grid: each 256-row chunk is a 16x16
    // tile (area 256); any lexicographic sort gives 64*4-ish boxes
    // with full-axis spans (area >= 64*4 = 256 only when aligned —
    // but with y spanning 0..63 the box is 4*64; same area, worse
    // shape). Assert the z-property exactly: every chunk is a 16x16 tile.
    assert(chunkAreas.forall(_ == 256), s"non-tile chunks: $chunkAreas")
  }

  test("clusterByZ yields disjoint per-partition z-ranges with tight 2-D bboxes") {
    import spark.implicits._
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val clustered = ZInterleave16.clusterByZ(grid.toDF("x", "y"), "x", "y", numFiles = 16)
    val perPart = clustered
      .withColumn("pid", spark_partition_id())
      .withColumn("z", expr("z_interleave16(x, y)"))
      .groupBy("pid")
      .agg(
        min("z").as("zmin"), max("z").as("zmax"),
        min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"),
        count(lit(1)).as("n"))
      .collect()
    // range partitioning: z-intervals must not overlap across files
    val ranges = perPart.map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping z-ranges: ${ranges.toSeq}")
      case _ =>
    }
    // locality: each file's 2-D bounding box must be far smaller than
    // the naive x-sorted layout, where every file spans all of y
    // (area ≥ 4·64 = 256 with a 64-wide side). Range boundaries come
    // from sampling so tiles aren't exact — bound the mean area.
    val areas = perPart.map(r =>
      (r.getAs[Long]("xmax") - r.getAs[Long]("xmin") + 1) *
        (r.getAs[Long]("ymax") - r.getAs[Long]("ymin") + 1).toDouble)
    val meanArea = areas.sum / areas.length
    assert(meanArea < 1024, s"poor clustering, mean bbox area $meanArea (naive is 4096/file)")
    assert(!clustered.columns.contains("_z"))
  }

  test("ZLayout: appends degrade file prunability, the cadence re-cluster restores it") {
    import spark.implicits._
    import graft.functions.ZLayout
    val dir = java.nio.file.Files.createTempDirectory("zlayout").toString + "/t"
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)).toDF("x", "y")
    ZLayout.writeClustered(grid, dir, "x", "y", numFiles = 16)
    // the prunability a min/max reader gets is bounded by per-file
    // 2-D bounding boxes — measure the WORST file (exact skip% at 16
    // files is range-boundary-alignment luck; the box area is the
    // guaranteed property, same bound the clusterByZ spec uses)
    def maxBoxArea(): Long = {
      val stats = ZLayout.read(spark, dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("mnx"), max("x").as("mxx"),
          min("y").as("mny"), max("y").as("mxy"))
        .collect()
      stats.map(r =>
        (r.getAs[Long]("mxx") - r.getAs[Long]("mnx") + 1) *
          (r.getAs[Long]("mxy") - r.getAs[Long]("mny") + 1)).max
    }
    val a0 = maxBoxArea()
    assert(a0 <= 1024, s"fresh cluster: every file locally tight, worst box $a0")
    // full-domain batches land in the tail — a tail file's box IS the
    // whole domain, the reader can never prune it
    val batch = (for { x <- 0L until 64L by 7; y <- 0L until 64L by 7 } yield (x, y))
      .toDF("x", "y")
    (1 to 3).foreach(_ => ZLayout.append(batch, dir, appendTasks = 1))
    val a1 = maxBoxArea()
    assert(a1 >= 3000, s"appended tail must contain a full-domain file, worst box $a1")
    assert(ZLayout.read(spark, dir).count() == grid.count() + 3 * batch.count())
    // below the cadence: no re-cluster (3+1 tail files vs 0.5*16)
    assert(!ZLayout.appendAndMaybeRecluster(
      batch, dir, "x", "y", numFiles = 16, maxTailFraction = 0.5, appendTasks = 1))
    // over the cadence: re-cluster runs, tail clears, every file's box
    // is tight again, and not a row is lost across the generation swap
    assert(ZLayout.appendAndMaybeRecluster(
      batch, dir, "x", "y", numFiles = 16, maxTailFraction = 0.25, appendTasks = 1))
    assert(!new java.io.File(s"$dir/tail").exists())
    val a2 = maxBoxArea()
    // duplicate-heavy density shifts the range sampler's boundaries a
    // little off tile edges, so a restored file can straddle ~2 tiles
    // — bounded locality (≤ half the domain) is the guarantee, vs the
    // tail's unprunable 4096 full-domain box
    assert(a2 <= 2048, s"re-cluster must restore locality, worst box $a2")
    assert(ZLayout.read(spark, dir).count() == grid.count() + 5 * batch.count())
  }

  test("ZLayout delete: tombstones mask reads immediately, the re-cluster folds them in and clears, guards fail fast") {
    import spark.implicits._
    import graft.functions.ZLayout
    val dir = java.nio.file.Files.createTempDirectory("zlayout_del").toString + "/t"
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)).toDF("x", "y")
    ZLayout.writeClustered(grid, dir, "x", "y", numFiles = 8)
    ZLayout.append(
      (for { x <- 32L until 40L; y <- 0L until 4L } yield (x, y)).toDF("x", "y"),
      dir, appendTasks = 1)
    val total = ZLayout.read(spark, dir).count()
    // delete by key column `x`: rows in BOTH base and tail vanish
    // from the live view, nothing else does
    ZLayout.delete(spark, dir, Seq(3L, 35L).toDF("x"))
    val masked = ZLayout.read(spark, dir)
    assert(masked.filter(col("x").isin(3L, 35L)).isEmpty)
    assert(masked.count() == total - 32 - 4)
    // guards at the error site: NULL key, unknown column, second key
    // column against a live set, and a TYPE-skewed id set (implicit
    // comparison coercion would silently miss keys past 2^53 — the
    // widen-or-fail discipline applies to takedowns too)
    intercept[IllegalArgumentException] {
      ZLayout.delete(spark, dir, Seq(Some(1L), None).toDF("x"))
    }
    intercept[IllegalArgumentException] {
      ZLayout.delete(spark, dir, Seq(1L).toDF("no_such_col"))
    }
    intercept[IllegalArgumentException] {
      ZLayout.delete(spark, dir, Seq(1L).toDF("y"))
    }
    intercept[IllegalArgumentException] {
      ZLayout.delete(spark, dir, Seq("3").toDF("x"))
    }
    // the cadence re-cluster folds the removal into the fresh
    // generation, which RETIRES the set atomically with the swap
    // (the set lives inside the generation dir) — same rows, no mask
    // anywhere in the plan
    assert(ZLayout.appendAndMaybeRecluster(
      grid.limit(0), dir, "x", "y", numFiles = 8, maxTailFraction = 1e-9))
    assert(!new java.io.File(s"$dir/base/_tombstones").exists())
    val after = ZLayout.read(spark, dir)
    assert(after.count() == total - 32 - 4)
    assert(after.filter(col("x").isin(3L, 35L)).isEmpty)
    assert(!after.queryExecution.executedPlan.toString.contains("LeftAnti"),
      "post-fold reads must not pay the mask")
  }

  test("ZLayoutN: appends degrade 3-D prunability, the cadence re-cluster restores it") {
    import spark.implicits._
    import graft.functions.ZLayout
    val dir = java.nio.file.Files.createTempDirectory("zlayout3").toString + "/t"
    val dims = Seq("x", "y", "w")
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L; w <- 0L until 16L }
      yield (x, y, w)).toDF("x", "y", "w")
    ZLayout.writeClusteredN(grid, dir, dims, numFiles = 8)
    def boxVols(): Seq[Long] = {
      val stats = ZLayout.read(spark, dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("mnx"), max("x").as("mxx"),
          min("y").as("mny"), max("y").as("mxy"),
          min("w").as("mnw"), max("w").as("mxw"))
        .collect()
      stats.map(r =>
        (r.getAs[Long]("mxx") - r.getAs[Long]("mnx") + 1) *
          (r.getAs[Long]("mxy") - r.getAs[Long]("mny") + 1) *
          (r.getAs[Long]("mxw") - r.getAs[Long]("mnw") + 1)).toSeq
    }
    def meanVol(): Double = { val v = boxVols(); v.sum.toDouble / v.length }
    // the guaranteed property is MEAN volume (the clusterByZN spec's
    // bound: a lexicographic layout gives >= 4096/file on this cube;
    // individual files can straddle sampler boundaries)
    val a0 = meanVol()
    assert(a0 < 1600, s"fresh 3-dim cluster: mean box volume $a0")
    // full-domain stride batches land in the tail — an unprunable
    // 15^3-volume box for any min/max reader
    val batch = (for { x <- 0L until 16L by 7; y <- 0L until 16L by 7;
      w <- 0L until 16L by 7 } yield (x, y, w)).toDF("x", "y", "w")
    (1 to 3).foreach(_ => ZLayout.append(batch, dir, appendTasks = 1))
    assert(boxVols().max >= 3000, "appended tail must contain a full-domain file")
    // below the cadence: no re-cluster (4+1 tail files vs 2.0*8)
    assert(!ZLayout.appendAndMaybeReclusterN(
      batch, dir, dims, numFiles = 8, maxTailFraction = 2.0, appendTasks = 1))
    // over it: swap runs through the same crash-safe protocol, rows
    // exact, locality restored
    assert(ZLayout.appendAndMaybeReclusterN(
      batch, dir, dims, numFiles = 8, maxTailFraction = 0.25, appendTasks = 1))
    assert(!new java.io.File(s"$dir/tail").exists())
    val a2 = meanVol()
    assert(a2 < 1600, s"re-cluster must restore 3-D locality, mean box $a2")
    assert(ZLayout.read(spark, dir).count() == grid.count() + 5 * batch.count())
  }

  test("ZLayout: an interrupted generation swap is recovered without losing a row") {
    import spark.implicits._
    import graft.functions.{ZInterleave16, ZLayout}
    val dir = java.nio.file.Files.createTempDirectory("zrecover").toString + "/t"
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)).toDF("x", "y")
    val batch = (for { x <- 0L until 32L by 5; y <- 0L until 32L by 5 } yield (x, y))
      .toDF("x", "y")
    ZLayout.writeClustered(grid, dir, "x", "y", numFiles = 8)
    ZLayout.append(batch, dir, appendTasks = 1)
    val total = grid.count() + batch.count()

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    // crash point A: tail snapshotted aside, new generation only
    // PARTIALLY written (no _SUCCESS). The merging snapshot keeps
    // reads complete; recovery must discard the partial generation
    // and put the snapshot back in the tail.
    assert(fs.rename(p("tail"), p("merging_crashA")))
    fs.mkdirs(p("base_next"))
    val junk = fs.create(new org.apache.hadoop.fs.Path(p("base_next"), "part-00000.parquet"))
    junk.write(Array[Byte](1, 2, 3)); junk.close()
    assert(ZLayout.read(spark, dir).count() == total, "reads stay complete mid-swap")
    ZLayout.recover(spark, dir)
    assert(!fs.exists(p("base_next")) && !fs.exists(p("merging_crashA")))
    assert(ZLayout.read(spark, dir).count() == total, "partial generation discarded, no loss")

    // crash point B: new generation COMPLETE (parquet _SUCCESS
    // present) but the swap never ran. Recovery — here via the next
    // appendAndMaybeRecluster call — must roll FORWARD, never
    // clobber base_next, and every row (old + appended) survives.
    assert(fs.rename(p("tail"), p("merging_crashB")))
    ZInterleave16
      .clusterByZ(ZLayout.read(spark, dir), "x", "y", numFiles = 8)
      .write.mode("overwrite").parquet(s"$dir/base_next")
    assert(fs.exists(new org.apache.hadoop.fs.Path(p("base_next"), "_SUCCESS")))
    val batch2 = Seq((100L, 100L), (101L, 101L)).toDF("x", "y")
    ZLayout.appendAndMaybeRecluster(
      batch2, dir, "x", "y", numFiles = 8, maxTailFraction = 100.0, appendTasks = 1)
    assert(!fs.exists(p("base_next")) && !fs.exists(p("merging_crashB")))
    assert(ZLayout.read(spark, dir).count() == total + batch2.count(),
      "complete generation rolled forward, appended rows intact")
  }

  test("ZLayout: full replacement over a live tail is crash-safe — never a mixed-generation read (ADVICE r12)") {
    import spark.implicits._
    import graft.functions.ZLayout
    val dir = java.nio.file.Files.createTempDirectory("zreplace").toString + "/t"
    val gen1 = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)).toDF("x", "y")
    val tailRows = Seq((500L, 500L), (501L, 501L)).toDF("x", "y")
    ZLayout.writeClustered(gen1, dir, "x", "y", numFiles = 4)
    ZLayout.append(tailRows, dir, appendTasks = 1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    // happy path: replacement = EXACTLY the new rows, all scaffolding
    // cleared — the old overwrite-then-clean order had a window where
    // the new base and the stale tail were served together
    val gen2 = (for { x <- 100L until 110L; y <- 100L until 110L } yield (x, y)).toDF("x", "y")
    ZLayout.writeClustered(gen2, dir, "x", "y", numFiles = 4)
    assert(ZLayout.read(spark, dir).count() == gen2.count(),
      "replacement must serve exactly the new generation — no stale tail rows")
    assert(!fs.exists(p("tail")) && subdirs(fs, dir, "merging_").isEmpty &&
      !fs.exists(p("base_next")) && subdirs(fs, dir, "base_old_").isEmpty)

    // crash mid-replacement: tail snapshotted aside, base_next only
    // PARTIAL (no _SUCCESS) — the protocol must serve the complete OLD
    // generation throughout, and recover() must restore it fully
    ZLayout.append(tailRows, dir, appendTasks = 1)
    val liveTotal = gen2.count() + tailRows.count()
    assert(fs.rename(p("tail"), p("merging_crashR")))
    fs.mkdirs(p("base_next"))
    val junk = fs.create(new org.apache.hadoop.fs.Path(p("base_next"), "part-00000.parquet"))
    junk.write(Array[Byte](9, 9)); junk.close()
    assert(ZLayout.read(spark, dir).count() == liveTotal,
      "mid-replacement reads serve the complete old generation, never base_next")
    ZLayout.recover(spark, dir)
    assert(ZLayout.read(spark, dir).count() == liveTotal,
      "aborted replacement restores the old generation in full")
    // and the next replacement still commits atomically
    ZLayout.writeClustered(gen1, dir, "x", "y", numFiles = 4)
    assert(ZLayout.read(spark, dir).count() == gen1.count())
  }

  private def subdirs(fs: org.apache.hadoop.fs.FileSystem, dir: String, prefix: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith(prefix)).toSeq
  }

  test("clusterByZ rejects a dimension spanning more than half the Long domain") {
    import spark.implicits._
    // mx - mn overflows signed 64 bits here; unchecked arithmetic
    // would wrap negative, slip past the width guard, and emit a
    // DIV-0/garbage _z (silently degenerating the clustering) — the
    // guard must instead fail loudly
    val wide = Seq((Long.MinValue, 0L), (Long.MaxValue, 1L)).toDF("x", "y")
    val ex = intercept[IllegalArgumentException] {
      ZInterleave16.clusterByZ(wide, "x", "y", numFiles = 2)
    }
    assert(ex.getMessage.contains("too wide"), ex.getMessage)
    // exactly half-plus-one span: subtractExact succeeds but range
    // wraps ≤ 0 via span + 1 at Long.MaxValue — also rejected
    val edge = Seq((Long.MinValue, 0L), (-1L, 1L)).toDF("x", "y")
    val ex2 = intercept[IllegalArgumentException] {
      ZInterleave16.clusterByZ(edge, "x", "y", numFiles = 2)
    }
    assert(ex2.getMessage.contains("too wide"), ex2.getMessage)
  }

  test("z_interleave_n: d=2 ≡ z_interleave16; bits round-trip at any d; bad arity rejected") {
    import graft.functions.ZInterleaveN
    val rnd = new scala.util.Random(7)
    // d=2 keeps 16 bits/dim → the N-dim loop must reproduce the
    // 2-dim magic-number ladder bit-for-bit
    (1 to 200).foreach { _ =>
      val (x, y) = (rnd.nextLong() & 0xFFFFL, rnd.nextLong() & 0xFFFFL)
      assert(ZInterleaveN.interleave(Array(x, y)) == ZInterleave16.interleave(x, y))
    }
    // de-interleave round trip: dim i's bits sit at positions j·d + i
    for (d <- 2 to 8) {
      val bits = ZInterleaveN.bitsPerDim(d)
      val vals = Array.fill(d)(rnd.nextLong() & ((1L << bits) - 1))
      val key = ZInterleaveN.interleave(vals)
      assert(key >= 0L, s"d=$d key must stay non-negative")
      val back = Array.tabulate(d) { i =>
        (0 until bits).foldLeft(0L)((acc, j) => acc | (((key >> (j * d + i)) & 1L) << j))
      }
      assert(back.toSeq == vals.toSeq, s"d=$d round trip")
    }
    // SQL registration + arity/type checking
    graft.functions.ZInterleaveN.register(spark)
    val k = spark.range(1)
      .selectExpr("z_interleave_n(CAST(5 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT))")
      .head().getLong(0)
    assert(k == ZInterleaveN.interleave(Array(5L, 3L, 1L)))
    val err = intercept[Exception] {
      spark.range(1).selectExpr("z_interleave_n(CAST(1 AS BIGINT))").head()
    }
    assert(err.getMessage.contains("2 to 8"))
  }

  test("clusterByZN yields tight 3-D bboxes per file on a cube grid") {
    import spark.implicits._
    import graft.functions.ZInterleaveN
    val cube = for { x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L } yield (x, y, z)
    val clustered = ZInterleaveN.clusterByZN(
      cube.toDF("x", "y", "zz"), Seq("x", "y", "zz"), numFiles = 16)
    val perPart = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(
        min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"),
        min("zz").as("zmin"), max("zz").as("zmax"))
      .collect()
    // a lexicographic sort gives every file the full 16×16 extent in
    // the two trailing dims (volume ≥ 16·16·1 = 256 per file at 256
    // rows/file); the z-layout must keep the mean 3-D bbox volume
    // well under that
    val vols = perPart.map(r =>
      (r.getAs[Long]("xmax") - r.getAs[Long]("xmin") + 1).toDouble *
        (r.getAs[Long]("ymax") - r.getAs[Long]("ymin") + 1) *
        (r.getAs[Long]("zmax") - r.getAs[Long]("zmin") + 1))
    val meanVol = vols.sum / vols.length
    assert(meanVol < 1600, s"poor 3-D clustering, mean bbox volume $meanVol (lex ≥ 4096/file)")
    assert(!clustered.columns.contains("_z"))
  }

  test("z_interleave16 stays inside WholeStageCodegen") {
    ZInterleave16.register(spark)
    // a Range source (not a LocalTableScan, which constant-folds the
    // whole projection away) so the expression actually code-gens
    val plan = spark.range(10).toDF("x")
      .select(expr("z_interleave16(x, x)"))
      .queryExecution.executedPlan.toString
    // the compact rendering marks WholeStageCodegen stages with "*(n)"
    // — the projection carrying the expression must be starred
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("z_interleave16")),
      plan)
  }

  // ---- stratified sampling ----

  test("stratified hash sampling is deterministic and respects per-stratum rates") {
    import spark.implicits._
    graft.functions.PolyHash.register(spark)
    val rows = (1L to 10000L).map(k => (k, if (k % 3 == 0) "big" else "small"))
    val df = rows.toDF("k", "stratum")
    val h = graft.functions.TextExprs.charHashSpark("CAST(k AS STRING)")
    val sampled = Sampling.stratifiedHash(df, "stratum", h, Seq("big" -> 10), defaultMod = 2)
    val counts = sampled.groupBy("stratum").count().collect()
      .map(r => r.getAs[String]("stratum") -> r.getAs[Long]("count")).toMap
    val bigTotal = rows.count(_._2 == "big")
    val smallTotal = rows.size - bigTotal
    // hash-modulus keeps ~1/m per stratum; generous tolerance, the
    // point is the per-stratum ratio difference and determinism
    assert(math.abs(counts("big").toDouble / bigTotal - 0.1) < 0.03)
    assert(math.abs(counts("small").toDouble / smallTotal - 0.5) < 0.05)
    // rerun: identical row set (no RNG state anywhere)
    val again = Sampling.stratifiedHash(df, "stratum", h, Seq("big" -> 10), defaultMod = 2)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
    // modulus <= 0 is silent data loss in non-ANSI Spark (x % 0 → NULL
    // drops the stratum) and an error in the DuckDB oracle — reject it
    intercept[IllegalArgumentException] {
      Sampling.stratifiedHash(df, "stratum", h, Seq("big" -> 0), defaultMod = 2)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedHash(df, "stratum", h, Seq("big" -> 10), defaultMod = 0)
    }
  }

  test("assignSplit is exhaustive, deterministic, and near the declared weights") {
    import spark.implicits._
    graft.functions.PolyHash.register(spark)
    val df = (1L to 20000L).toDF("k")
    val h = graft.functions.TextExprs.charHashSpark("CAST(k AS STRING)")
    val splits = Sampling.assignSplit(df, h, Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = splits.groupBy("split").count().collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("count")).toMap
    assert(counts.keySet == Set("train", "val", "test")) // exhaustive, no NULL bucket
    assert(math.abs(counts("train") / 20000.0 - 0.80) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.10) < 0.02)
    assert(math.abs(counts("test") / 20000.0 - 0.10) < 0.02)
    // re-assignment is identical row-for-row (the anti-leak property)
    val again = Sampling.assignSplit(df, h, Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(splits.exceptAll(again).isEmpty)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, h, Seq("train" -> 90, "val" -> 20))
    }
  }

  test("perGroupCap keeps exactly the k best per group, planned as a group-limit") {
    import spark.implicits._
    val df = (1L to 1000L).map(k => (k, s"g${k % 7}", k * 3 % 101)).toDF("id", "g", "score")
    val capped = Sampling.perGroupCap(df, "g", Seq(col("score").desc, col("id").asc), k = 5)
    val byGroup = capped.collect().groupBy(_.getAs[String]("g"))
    assert(byGroup.size == 7 && byGroup.values.forall(_.length == 5))
    // each group's kept rows are its true top-5 under the same order
    byGroup.foreach { case (g, rows) =>
      val expected = (1L to 1000L).filter(k => s"g${k % 7}" == g)
        .map(k => (k * 3 % 101, k)).sortBy { case (s2, k) => (-s2, k) }.take(5)
        .map(_._2).toSet
      assert(rows.map(_.getAs[Long]("id")).toSet == expected, s"group $g")
    }
    // bounded-heap shape: a group-limit (native WindowGroupLimit or
    // the TopKPerGroup extension), never a whole-partition sort alone
    val plan = Sampling.perGroupCap(df, "g", Seq(col("score").desc), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") || plan.contains("TopKPerGroup"), plan)
    // an existing rn data column must fail fast, not be silently
    // replaced by the exposed rank
    intercept[IllegalArgumentException] {
      Sampling.perGroupCap(
        df.withColumnRenamed("score", "rn"), "g", Seq(col("rn").desc), 5)
    }
  }

  test("redactPii counts and replaces emails, phones, and IPs in pattern order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or admin@x.io thanks"),
      (2L, "call 555-010-1234 then 555 010 9999 from 10.0.0.1"),
      (3L, "clean text, no pii at all"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"), r.getAs[Long]("n_ipv4"),
          r.getAs[String]("redacted"))).toMap
    assert(out(1L)._1 == 2 && out(1L)._4 == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(out(2L) == ((0L, 2L, 1L, "call <PHONE> then <PHONE> from <IP>")))
    assert(out(3L) == ((0L, 0L, 0L, "clean text, no pii at all")))
    assert(out(4L) == ((0L, 0L, 0L, "")))
    // narrow projection: no shuffle anywhere in the plan
    val plan = TextAnalysis.redactPii(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("chunk slides fixed windows with overlap; short tail; empty docs vanish") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"), // 10 chars
      (2L, "xyz"),
      (3L, "")).toDF("doc_id", "text")
    // chunkChars=4, overlap=1 → stride 3 → starts 0,3,6,9
    val rows = TextAnalysis.chunk(docs, chunkChars = 4, overlap = 1).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_no"), r.getAs[Long]("chunk_len")))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._3).toSeq == Seq(4L, 4L, 4L, 1L)) // abcd, defg, ghij, j
    assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(3L))
    assert(!rows.exists(_._1 == 3L))
    // reconstruction: consecutive chunks overlap by exactly `overlap`
    val digests = TextAnalysis.chunk(docs, chunkChars = 4, overlap = 1)
      .filter(col("doc_id") === 1L).orderBy("chunk_no").collect()
      .map(_.getAs[String]("digest"))
    val expected = Seq("abcd", "defg", "ghij", "j").map { s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    }
    assert(digests.toSeq == expected)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunk(docs, chunkChars = 4, overlap = 4)
    }
  }

  test("packSequences tiles each group's token stream exactly, empty docs occupy no span") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "one two three"),        // 3 tokens  → [0,3)
      (2L, "a", "four five"),            // 2 tokens  → [3,5)
      (3L, "a", ""),                     // empty → dropped
      (4L, "a", "six seven eight nine"), // 4 tokens → [5,9)
      (5L, "b", "alpha beta")            // own group → [0,2)
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(docs, seqTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset"),
          r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last"))).toMap
    assert(out(1L) == ((3L, 0L, 0L, 0L)))
    assert(out(2L) == ((2L, 3L, 0L, 1L))) // straddles the 4-token cut
    assert(!out.contains(3L))
    assert(out(4L) == ((4L, 5L, 1L, 2L)))
    assert(out(5L) == ((2L, 0L, 0L, 0L))) // group b restarts at offset 0
    // tiling invariant on real data: within a group, spans are
    // contiguous and gap-free (next start == previous start + len)
    val real = TextAnalysis.packSequences(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"), seqTokens = 512)
      .orderBy("source", "doc_id").collect()
    real.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      rows.foldLeft(0L) { (expected, r) =>
        assert(r.getAs[Long]("start_offset") == expected, s"gap in group $src")
        expected + r.getAs[Long]("n_tokens")
      }
    }
  }

  test("chunk property: digests equal a direct slice-by-slice reference on random texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(8)
    (1 to 8).foreach { trial =>
      val chunkChars = 2 + rnd.nextInt(11)
      val overlap = if (rnd.nextBoolean()) math.min(chunkChars / 2, chunkChars - 1) else 0
      val stride = chunkChars - overlap
      val ts = Seq.fill(6)(rnd.alphanumeric.take(rnd.nextInt(51)).mkString)
      val docs = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val chunks = TextAnalysis.chunk(docs, chunkChars, overlap)
        .collect()
        .groupBy(_.getAs[Long]("doc_id"))
      ts.zipWithIndex.foreach { case (t, i) =>
        if (t.isEmpty) assert(!chunks.contains(i.toLong), s"trial $trial doc $i")
        else {
          // reference: every stride-offset slice of up to chunkChars
          val expected = (0 until ((t.length - 1) / stride + 1)).map { c =>
            val s = t.slice(c * stride, math.min(c * stride + chunkChars, t.length))
            java.security.MessageDigest.getInstance("MD5")
              .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
          }
          val got = chunks(i.toLong).sortBy(_.getAs[Long]("chunk_no"))
            .map(_.getAs[String]("digest")).toSeq
          assert(got == expected, s"trial $trial doc $i chunk=$chunkChars overlap=$overlap")
        }
      }
    }
  }

  test("wordpiece stats: greedy longest match, unk-at-word, hand-computed fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the training"),           // "the"=1 piece, "training"="train"+"##ing"=2
      (2L, "a quiz today"),           // "quiz" has q/z → [UNK]; "a"=1; "today"="to"+"##d"+"##a"+"##y"=4
      (3L, ""),                       // no words
      (4L, "THE The the")             // case folding: 3 occurrences, 1 piece each
    ).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.wordpieceStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk_words"), r.getAs[Long]("n_words")))).toMap
    assert(m(1L) == ((3L, 0L, 2L)))
    assert(m(2L) == ((6L, 1L, 3L)))
    assert(m(3L) == ((0L, 0L, 0L)))
    assert(m(4L) == ((3L, 0L, 3L)))
    // greedy LONGEST: with 't','th','the' all plain, "the" is ONE
    // piece, never 't'+'##h'+'##e'; and unk discards partial pieces
    // ("theq" consumed 'the' before failing on 'q' → still 1 token)
    val tiny = Seq((1L, "the theq")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.wordpieceStats(
      tiny, vocab = Seq("t", "th", "the", "##h", "##e")).collect().head
    assert(r.getAs[Long]("n_tokens") == 2L) // "the"=1 + unk("theq")=1
    assert(r.getAs[Long]("n_unk_words") == 1L)
  }

  test("wordpiece kernel ≡ independent reference on hostile random text") {
    import spark.implicits._
    val vocab = graft.operators.TextAnalysis.wordpieceVocab()
    val plain = vocab.filterNot(_.startsWith("##")).toSet
    val cont = vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
    val maxLen = (plain.map(_.length) ++ cont.map(_.length)).max
    // clean-room twin: codepoint-based word extraction + greedy match
    def ref(text: String): (Long, Long, Long) = {
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      (text + " ").foreach { ch =>
        val c = if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_') sb.append(c)
        else { if (sb.nonEmpty) { words += sb.toString; sb.clear() } }
      }
      var (tok, unk) = (0L, 0L)
      words.foreach { w =>
        var pos = 0; var pieces = 0L; var dead = false
        while (pos < w.length && !dead) {
          val l = (math.min(maxLen, w.length - pos) to 1 by -1).find { n =>
            val cand = w.substring(pos, pos + n)
            if (pos == 0) plain(cand) else cont(cand)
          }
          l match {
            case Some(n) => pieces += 1; pos += n
            case None => dead = true
          }
        }
        if (dead) { tok += 1; unk += 1 } else tok += pieces
      }
      (tok, unk, words.length.toLong)
    }
    val rnd = new scala.util.Random(91)
    val alphabet = "abcdefghijklmnopqrstuvwxyzQZ019_ .,-—é漢\n'\"" // incl q/z, unicode, punct
    val texts = (1L to 60L).map { i =>
      (i, (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = graft.operators.TextAnalysis.wordpieceStats(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unk_words"), r.getAs[Long]("n_words")))).toMap
    texts.foreach { case (i, t) =>
      assert(got(i) == ref(t), s"doc $i mismatch on ${t.take(60)}…")
    }
  }

  test("wordpiece at 30k vocab: table entry point ≡ literal vocab, order-independent") {
    import spark.implicits._
    val vocab = graft.operators.TextAnalysis.wordpieceVocab30k()
    // the scale fixture is genuinely production-sized and multi-length
    assert(vocab.size > 25000 && vocab.size < 50000, s"vocab size ${vocab.size}")
    assert(vocab.map(p => (if (p.startsWith("##")) p.drop(2) else p).length).max == 4)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val direct = graft.operators.TextAnalysis
      .wordpieceStats(docs, vocab = vocab).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // vocab-from-a-table path, deliberately shuffled: matching is
    // longest-match over compiled sets, so table order must not matter
    val shuffled = new scala.util.Random(7).shuffle(vocab).toDF("piece")
    val viaTable = graft.operators.TextAnalysis
      .wordpieceStatsFromVocabTable(docs, shuffled).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(direct == viaTable)
    // with every single char in vocab, ASCII words can never be UNK
    assert(direct.values.forall(_._2 == 0L))
    // subword compression is real: fewer pieces than chars, more than words
    val some = direct.values.take(50)
    assert(some.forall { case (tok, _, words) => words == 0 || tok >= words })
    // the cap guard fires on a mis-pointed "vocab"
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.wordpieceStatsFromVocabTable(
        docs, spark.range(200000).selectExpr("CAST(id AS STRING) AS piece"))
    }
    assert(e.getMessage.contains("100000"))
  }

  test("repetition counts duplicated tokens in fixed-point ppm") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha beta"), // 4 tokens, 2 distinct → 50% repeated
      (2L, "all distinct words here"),
      (3L, "")).toDF("doc_id", "text")
    val m = TextAnalysis.repetition(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"), r.getAs[Long]("repetition_ppm"))).toMap
    assert(m(1L) == ((4L, 2L, 500000L)))
    assert(m(2L) == ((4L, 4L, 0L)))
    assert(m(3L)._3 == 0L) // empty doc: no division blow-up
  }

  test("a prebuilt IVF index probes identically to the fused call, including after a parquet round-trip") {
    import graft.operators.SimilaritySearch
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fused = SimilaritySearch.ivfTopK(emb).collect().toSet
    // centroidMod pinned to ivfTopK's default; a bare buildIndex call
    // auto-derives ≈ sqrt(n) instead (covered below)
    val index = SimilaritySearch.buildIndex(emb, centroidMod = 50)
    val queries = emb.filter(col("vec_id") % 97 === 0)
    assert(SimilaritySearch.probe(index, queries).collect().toSet == fused)
    // the production path: persist the index as tables, reload, probe
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    index.centroids.write.parquet(s"$dir/centroids")
    index.assignments.write.parquet(s"$dir/assignments")
    val reloaded = SimilaritySearch.IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assignments"))
    assert(SimilaritySearch.probe(reloaded, queries).collect().toSet == fused)
  }

  test("appendToIndex equals a build-time pass over both sets, and survives a parquet round-trip") {
    import graft.operators.SimilaritySearch
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val queries = emb.filter(col("vec_id") % 97 === 0)
    val baseIdx = SimilaritySearch.buildIndex(base, centroidMod = 50)
    val appended = SimilaritySearch.appendToIndex(baseIdx, batch)
    // reference: assign EVERYTHING against the same frozen centroids —
    // assignment is a pure per-vector function, so append ≡ build-time
    val full = SimilaritySearch.IvfIndex(
      baseIdx.centroids,
      SimilaritySearch.appendToIndex(
        SimilaritySearch.IvfIndex(
          baseIdx.centroids, appended.assignments.limit(0)),
        emb).assignments)
    assert(
      SimilaritySearch.probe(appended, queries).collect().toSet ==
        SimilaritySearch.probe(full, queries).collect().toSet)
    // the steady-state ingest shape: persisted index + appended batch
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_inc_").toString
    appended.centroids.write.parquet(s"$dir/centroids")
    appended.assignments.write.parquet(s"$dir/assignments")
    val reloaded = SimilaritySearch.IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assignments"))
    assert(
      SimilaritySearch.probe(reloaded, queries).collect().toSet ==
        SimilaritySearch.probe(appended, queries).collect().toSet)
  }

  test("buildIndex derives centroidMod ≈ sqrt(n) when none is given") {
    import graft.operators.SimilaritySearch
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val expectedMod = math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
    val auto = SimilaritySearch.buildIndex(emb)
    val explicit = SimilaritySearch.buildIndex(emb, centroidMod = expectedMod)
    // same seed rule → identical centroid tables (bit-exact: both run
    // the same DECIMAL-summed Lloyd round)
    assert(
      auto.centroids.collect().toSet == explicit.centroids.collect().toSet)
    // nlist lands near sqrt(n): seeds are every mod-th id
    val nlist = auto.centroids.count()
    assert(nlist >= 1 && nlist <= n / expectedMod + 1)
  }

  test("sampled Lloyd fit: Some(1) is the full fit bit-for-bit; a real sample keeps recall") {
    import graft.operators.SimilaritySearch
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 97 === 0)
    val full = SimilaritySearch.buildIndex(emb, centroidMod = 50)
    // the degenerate sample is the full corpus — identical centroids
    // and identical probe output, pinning that the sampling path adds
    // no numeric drift
    val mod1 = SimilaritySearch.buildIndex(emb, centroidMod = 50, fitSampleMod = Some(1))
    assert(mod1.centroids.collect().toSet == full.centroids.collect().toSet)
    // a genuine 1/4 sample: list geometry shifts (k-means on a
    // sample), so the judge of quality is recall@5 against the BRUTE
    // ground truth, not agreement with the full fit's lists — the fit
    // is statistical, the assignment is still full-corpus
    val truth = SimilaritySearch.bruteTopK(emb).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
    def recallAt5(idx: SimilaritySearch.IvfIndex): Double = {
      val got = SimilaritySearch.probe(idx, queries).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("cand_id")).toSet).toMap
      val hits = truth.map { case (q, t) => (t intersect got.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }
    val fullRecall = recallAt5(full)
    val sampled = SimilaritySearch.buildIndex(emb, centroidMod = 50, fitSampleMod = Some(4))
    val sampledRecall = recallAt5(sampled)
    info(f"recall@5 full=$fullRecall%.3f sampled(1/4)=$sampledRecall%.3f")
    // sampling the fit must not cost meaningful retrieval quality
    assert(sampledRecall >= fullRecall - 0.05,
      f"sampled-fit recall $sampledRecall%.3f dropped more than 0.05 below full-fit $fullRecall%.3f")
    // a dry sample must fail loudly, not build a silently-empty index
    val tiny = emb.filter(col("vec_id") < 3)
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.buildIndex(tiny, centroidMod = 1, fitSampleMod = Some(1 << 20))
    }
    assert(e.getMessage.contains("sampled zero vectors"))
  }

  test("prunedJoin supports same-named key columns via a USING join") {
    import spark.implicits._
    val large = (1L to 100L).map(k => (k, k % 7)).toDF("id", "key")
    val small = Seq((1L, "a"), (3L, "b")).toDF("key", "name")
    val out = BloomPrune.prunedJoin(large, small, "key", "key", estItems = 10L)
    assert(out.columns.count(_ == "key") == 1) // USING join: one shared key column
    assert(out.count() == large.filter(col("key").isin(1L, 3L)).count())
  }

  test("assignSplit handles a single 100% split and quoted names") {
    import spark.implicits._
    graft.functions.PolyHash.register(spark)
    val df = (1L to 50L).toDF("k")
    val h = graft.functions.TextExprs.charHashSpark("CAST(k AS STRING)")
    // one split: constant expression, no WHEN-less CASE parse error
    val one = Sampling.assignSplit(df, h, Seq("all" -> 100))
    assert(one.filter(col("split") === "all").count() == 50)
    // a quoted stratum name must survive interpolation
    val strat = Sampling.stratifiedHash(
      df.withColumn("s", lit("o'reilly")), "s", h, Seq("o'reilly" -> 5), defaultMod = 1)
    assert(strat.count() > 0 && strat.count() < 50)
  }

  test("incremental minhash pairs the new batch against the corpus only") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy sleeping dog tonight"),
      (2L, "an entirely different document about distributed query engines today"),
      (3L, "a third document that resembles nothing else in this corpus")).toDF("doc_id", "text")
    val newBatch = Seq(
      (100L, "the quick brown fox jumps over the lazy sleeping dog tonight"), // exact copy of 1
      (101L, "fresh unseen content with no duplicate anywhere in sight")).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsAgainst(newBatch, corpus).collect()
    // the copy matches its original with a full-agreement signature
    val hit = pairs.find(r => r.getAs[Long]("new_id") == 100L && r.getAs[Long]("corpus_id") == 1L)
    assert(hit.isDefined && hit.get.getAs[Long]("n_agree") == 32L, pairs.mkString(","))
    // the fresh doc matches nothing, and ids never come from the same side
    assert(!pairs.exists(_.getAs[Long]("new_id") == 101L))
    assert(pairs.forall(r => r.getAs[Long]("new_id") >= 100L && r.getAs[Long]("corpus_id") < 100L))
  }

  test("incremental embedding pairs match scaled copies against the corpus only") {
    import graft.operators.Dedup
    // real-dimension vectors (the comparison-bit bands index fixed
    // high dimensions, so tiny synthetic vectors can't exercise them)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val newBatch = corpus
      .filter(col("vec_id") % 17 === 0)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding", expr("transform(embedding, x -> x * cast(1.001 as float))"))
    val planted = newBatch.select("vec_id").collect().map(_.getLong(0)).toSet
    val pairs = Dedup.embeddingPairsAgainst(newBatch, corpus).collect()
    // every planted scaled copy finds its original (cosine ≥ 0.999)
    planted.foreach { nid =>
      assert(pairs.exists(r =>
        r.getAs[Long]("new_id") == nid && r.getAs[Long]("corpus_id") == nid - 100000L),
        s"planted copy $nid found no original")
    }
    // sides never mix
    assert(pairs.forall(r =>
      r.getAs[Long]("new_id") >= 100000L && r.getAs[Long]("corpus_id") < 100000L))
  }

  test("a persisted signature table pairs identically to re-signaturing the corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy sleeping dog tonight"),
      (2L, "an entirely different document about distributed query engines today")).toDF("doc_id", "text")
    val newBatch = Seq(
      (100L, "the quick brown fox jumps over the lazy sleeping dog tonight")).toDF("doc_id", "text")
    val direct = Dedup.minhashPairsAgainst(newBatch, corpus).collect().toSet
    // the steady-state path: signatures written once, reloaded, probed
    val dir = java.nio.file.Files.createTempDirectory("graft_sigs_").toString
    Dedup.signatureTable(corpus).write.parquet(s"$dir/corpus")
    Dedup.signatureTable(newBatch).write.parquet(s"$dir/new")
    val viaTables = Dedup.minhashPairsAgainstSignatures(
      spark.read.parquet(s"$dir/new"),
      spark.read.parquet(s"$dir/corpus")).collect().toSet
    assert(viaTables == direct && direct.nonEmpty)
  }

  test("incremental semantic pairs match scaled copies against co-clustered corpus members") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val newBatch = e.filter(col("vec_id") % 17 === 0)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding", expr("transform(embedding, x -> x * cast(1.001 as float))"))
    val p = graft.operators.Dedup.semanticDedupAgainst(newBatch, e).cache()
    val nNew = newBatch.count()
    // every planted ×1.001 copy lands in its original's cluster and
    // pairs with it at cosine ≈ 1; nothing else clears the gate on
    // the gaussian corpus (deterministic fixture — exact is safe)
    assert(p.count() == nNew)
    assert(p.filter(col("corpus_id") === col("new_id") - 100000L).count() == nNew)
    assert(p.filter("cos_ppm < 999000").count() == 0)
    // the written layout probes identically: write → read → probe is
    // the steady-state path and must be row-for-row the in-memory one
    val stateDir = java.nio.file.Files.createTempDirectory("sem_written_spec_").toString
    val idx = graft.operators.SimilaritySearch.buildIndex(e, centroidMod = 50)
    graft.operators.SimilaritySearch.writeIndex(idx, stateDir)
    val fromState = graft.operators.Dedup.semanticDedupAgainstIndex(
      newBatch, graft.operators.SimilaritySearch.readIndex(spark, stateDir))
    assert(fromState.except(p).isEmpty && p.except(fromState).isEmpty)
    p.unpersist()
    graft.operators.Dedup.unpersistAll()
  }

  test("repairSplitLeakage re-homes whole components to the highest-priority split") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "train"), (2L, "test"),                 // crossing pair → both train
      (3L, "test"),                                // singleton untouched
      (4L, "valid"), (5L, "test"),                 // lower-priority pair → valid
      (6L, "test"), (7L, "train"), (8L, "valid")   // transitive chain → train
    ).toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (4L, 5L), (6L, 7L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = graft.operators.Dedup
      .repairSplitLeakage(corpus, pairs, Seq("train", "valid", "test"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("split"), r.getAs[String]("split_repaired"), r.getAs[Boolean]("leaked"))))
      .toMap
    assert(out(1L) == (("train", "train", false)) && out(2L) == (("test", "train", true)))
    assert(out(3L) == (("test", "test", false)))
    assert(out(4L) == (("valid", "valid", false)) && out(5L) == (("test", "valid", true)))
    // the A–B–C bridge: a pair-local fix would leave 6 or 8 leaky
    assert(Seq(6L, 7L, 8L).forall(out(_)._2 == "train"))
    assert(out(6L)._3 && !out(7L)._3 && out(8L)._3)
    // a split name outside the priority ranking aborts the job on
    // first contact (lazy raise_error — no separate guard scan)
    intercept[Exception] {
      graft.operators.Dedup.repairSplitLeakage(
        corpus.withColumn("split", lit("oops")), pairs, Seq("train")).collect()
    }
    // ...and string ids are rejected at the SCHEMA level, eagerly —
    // they would NULL out inside the propagation and read as clean
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.repairSplitLeakage(
        corpus.withColumn("doc_id", col("doc_id").cast("string")), pairs, Seq("train", "valid", "test"))
    }
  }

  test("contamination scores planted, partial, and clean docs correctly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // IS the benchmark doc
      (2L, "quick brown fox leaps somewhere else entirely today"), // shares one 3-gram
      (3L, "completely unrelated text with no overlap at all")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 1L)
    val m = TextAnalysis.contamination(docs, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"), r.getAs[Long]("contamination_ppm"))).toMap
    assert(m(1L)._3 == 1000000L) // planted: every gram hits
    // doc 2: grams of 8 words = 6 distinct 3-grams, exactly one
    // ("quick brown fox") appears in the benchmark
    assert(m(2L)._1 == 6L && m(2L)._2 == 1L)
    assert(m(2L)._3 == math.floor(1e6 * 1.0 / 6.0).toLong)
    assert(m(3L)._2 == 0L && m(3L)._3 == 0L) // clean
  }

  // ---- tf-idf top terms ----

  test("tf-idf ranks a document's distinctive term above ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat zebra zebra"),
      (2L, "the dog sat on the log"),
      (3L, "the bird sat on the wire")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, k = 1).collect()
    val top1 = top.find(_.getAs[Long]("doc_id") == 1L).get
    // 'zebra': tf=2, df=1 — beats 'the' (tf=2, df=3) and everything else
    assert(top1.getAs[String]("term") == "zebra")
    // ranks are 1-based and dense per doc
    assert(top.forall(_.getAs[Long]("rank") == 1L))
  }

  test("tf-idf top-k plans as a bounded heap, not a global sort") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val plan = TextAnalysis.tfIdfTopTerms(docs, k = 3)
      .queryExecution.executedPlan.toString
    // TopKPerGroup rewrites the rank<=k window into the bounded-heap
    // operator (same pin as ANN's rn=1)
    assert(plan.contains("TopKPerGroup") || !plan.contains("Window"),
      s"expected bounded-heap top-k, got:\n$plan")
  }

  test("applyKeepBest keeps the argmax-score member, min id on ties, singletons untouched") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, 3L), (2L, 4L),   // cluster {1,2}: 2 is longer -> 2 survives
      (3L, 5L), (4L, 5L),   // cluster {3,4}: tie -> min id 3 survives
      (5L, 1L)              // singleton, never in the pair list
    ).toDF("doc_id", "n_len")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val kept = Dedup.applyKeepBest(corpus, pairs, "n_len")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L, 3L, 5L))
    assertThrows[IllegalArgumentException] {
      Dedup.applyKeepBest(corpus, pairs, "no_such_col")
    }
  }

  test("curationFunnel labels each doc with the FIRST failing gate") {
    import spark.implicits._
    val longEnough = "the and is of to in that it was for on are with as the " * 4
    val docs = Seq(
      (1L, longEnough),                                   // passes everything... except repetition
      (2L, "short text"),                                 // too_short fires first
      (3L, "!!! ??? *** !!! ??? *** !!! ??? *** !!! ???"),// 11 ws-tokens, all punct → low_quality
      (4L, "的 月 日 " + longEnough),                      // zh wins → wrong_language (quality gate passes: stopword-rich)
      (5L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "the and is of to in that it was for on are with as some more words here now then") * 2))
      .toDF("doc_id", "text")
    val out = TextAnalysis
      .curationFunnel(docs, minTokens = 5, minQualityPpm = 400000L,
        keepLangs = Seq("en"), maxRepetitionPpm = 500000L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(out(2L) == "too_short")
    assert(out(3L) == "low_quality",
      "pure punctuation clears the ws-token count gate but not the quality gate")
    assert(out(4L) == "wrong_language")
    assert(out(1L) == "too_repetitive", "a 4x-repeated stopword run is repetition, not keep")
    assert(out(5L) == "keep")
    // the naturalness-gated funnel only ever RELABELS heuristic keeps
    // to 'unnatural' — every heuristic drop verdict is unchanged (the
    // model gate is last), and an impossible threshold changes nothing
    val natural = TextAnalysis
      .curationFunnelWithNaturalness(docs, minTokens = 5,
        minQualityPpm = 400000L, keepLangs = Seq("en"),
        maxRepetitionPpm = 500000L, minNaturalnessPpm = 0L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(natural == out, "minNaturalnessPpm=0 must reproduce the heuristic funnel")
    val strict = TextAnalysis
      .curationFunnelWithNaturalness(docs, minTokens = 5,
        minQualityPpm = 400000L, keepLangs = Seq("en"),
        maxRepetitionPpm = 500000L, minNaturalnessPpm = 1000001L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(strict(5L) == "unnatural", "an impossible naturalness bar relabels the keep")
    assert(strict.filter(_._2 != "unnatural") == out.filter(_._2 != "keep"),
      "heuristic drop verdicts must be untouched by the model gate")
  }

  private lazy val stratifiedDocs = {
    import spark.implicits._
    Seq(
      (1L, "en", "the and is of to in that it was for on are with as the words"),
      (2L, "en", "!!! ??? *** noise block with little natural content here"),
      (3L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "en", "the quick brown fox jumps over the lazy dog and runs on"),
      (5L, "en", "zz xq jw kv bb nn mm pp qq rr ss tt"),
      (6L, "de", "der die das und ist ein eine mit von zu"),
      (7L, "de", "!!! *** ??? kaum inhalt hier"),
      (8L, "de", "wort wort anderes wort noch mehr worte hier jetzt dann")
    ).toDF("doc_id", "lang", "text").localCheckpoint(true)
  }

  test("corpusReport: one row per metric, ordered quartiles, exact planted duplicate mass") {
    val corpus = graft.sources.Corpus.docCorpus(spark, "/root/testdata/sf0.001")
    val rows = graft.operators.TextAnalysis.corpusReport(corpus).collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "duplicate metric rows in the report")
    val rep = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("n_docs") == corpus.count())
    // the planted exact copies (doc_id % 7, +1M) are the only
    // duplicate texts in the fixture
    assert(rep("n_duplicate_docs") == Math.ceil(500.0 / 7).toLong)
    assert(rep("quality_p25") <= rep("quality_p50")
      && rep("quality_p50") <= rep("quality_p75"))
    assert(rep("n_tokens_total") > 0)
    assert(rep.keys.count(_.startsWith("lang:")) >= 1)
    assert(rep.filter(_._1.startsWith("lang:")).values.sum == rep("n_docs"),
      "language mix must partition the corpus")
  }

  test("chunkDocuments: stride prefixes + final chunk reconstruct each doc, zero-token docs vanish") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 53).map(i => s"w$i").mkString(" ")), // 3 chunks at starts 0/20/40
      (2L, (1 to 7).map(i => s"v$i").mkString(" ")),  // one short chunk
      (3L, "")                                        // zero tokens → zero chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, chunkTokens = 30, strideTokens = 20)
      .orderBy("doc_id", "chunk_id").collect()
    assert(!out.exists(_.getLong(0) == 3L))
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 3 && byDoc(2L).length == 1)
    // every non-final chunk is full-width; the final keeps the tail
    assert(byDoc(1L).dropRight(1).forall(_.getAs[Long]("n_tokens") == 30))
    assert(byDoc(1L).last.getAs[Long]("n_tokens") == 13)
    // total coverage with the declared overlap: the stride-token
    // prefix of each non-final chunk plus the whole final chunk
    // reassemble the original word sequence exactly
    def rebuild(rows: Array[org.apache.spark.sql.Row]): String =
      (rows.dropRight(1).map(
        _.getAs[String]("chunk_text").split(" ").take(20).mkString(" ")) :+
        rows.last.getAs[String]("chunk_text")).mkString(" ")
    assert(rebuild(byDoc(1L)) == (1 to 53).map(i => s"w$i").mkString(" "))
    assert(rebuild(byDoc(2L)) == (1 to 7).map(i => s"v$i").mkString(" "))
    // consecutive chunks genuinely overlap by chunk − stride tokens
    val c = byDoc(1L).map(_.getAs[String]("chunk_text").split(" "))
    assert(c(0).drop(20).toSeq == c(1).take(10).toSeq)
  }

  test("stratifiedQualityGate keeps exactly the ceil-cut top-quality prefix per stratum") {
    val docs = stratifiedDocs
    val out = TextAnalysis
      .stratifiedQualityGate(docs, keepPpm = 500000L, stratumCol = Some("lang"))
      .collect()
    assert(out.length == 8)
    // the kept set must be the (quality DESC, doc_id ASC) prefix of
    // length ceil(n/2) within each stratum — recomputed independently
    out.groupBy(_.getAs[String]("stratum")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (-r.getAs[Long]("quality_ppm"), r.getAs[Long]("doc_id")))
      val k = ((rows.length * 500000L + 999999L) / 1000000L).toInt
      val expectKeep = sorted.take(k).map(_.getAs[Long]("doc_id")).toSet
      rows.foreach { r =>
        assert(r.getAs[Boolean]("keep") == expectKeep.contains(r.getAs[Long]("doc_id")),
          s"doc ${r.getAs[Long]("doc_id")}: keep disagrees with the recomputed prefix")
      }
    }
    // integer-ceil edges: 0 keeps nothing, 10^6 keeps everything
    assert(TextAnalysis.stratifiedQualityGate(docs, keepPpm = 0L,
      stratumCol = Some("lang")).filter("keep").count() == 0)
    assert(TextAnalysis.stratifiedQualityGate(docs, keepPpm = 1000000L,
      stratumCol = Some("lang")).filter("NOT keep").count() == 0)
    // default mode strata come from the langId prediction
    val pred = TextAnalysis.stratifiedQualityGate(docs, keepPpm = 500000L)
    assert(pred.select("stratum").distinct().collect()
      .map(_.getString(0)).forall(Set("en", "de", "es", "fr", "zh")))
  }

  test("stratifiedQualityGateApprox: threshold keep is monotone and tracks the exact cut") {
    val docs = stratifiedDocs
    val out = TextAnalysis
      .stratifiedQualityGateApprox(docs, keepPpm = 500000L, stratumCol = Some("lang"))
      .collect()
    out.groupBy(_.getAs[String]("stratum")).foreach { case (_, rows) =>
      val kept = rows.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("quality_ppm"))
      val dropped = rows.filterNot(_.getAs[Boolean]("keep")).map(_.getAs[Long]("quality_ppm"))
      assert(kept.nonEmpty, "a positive keep fraction keeps at least the threshold doc")
      // threshold rule is MONOTONE: every kept quality >= every dropped
      assert(dropped.isEmpty || kept.min >= dropped.max)
      // and tracks the exact ceil cut within boundary-tie slack
      val k = ((rows.length * 500000L + 999999L) / 1000000L).toInt
      assert(math.abs(kept.length - k) <= 2,
        s"approx kept ${kept.length} vs exact cut $k")
    }
    // keepPpm = 10^6: the threshold is the stratum minimum — keeps all
    assert(TextAnalysis.stratifiedQualityGateApprox(docs,
      keepPpm = 1000000L, stratumCol = Some("lang")).filter("NOT keep").count() == 0)
  }

  test("registeredDomainBySuffix picks the longest suffix rule, falls back off-list") {
    import spark.implicits._
    val sfx = Seq("com", "uk", "co.uk").toDF("suffix")
    val rows = Seq(
      (1L, "https://shop.example.co.uk/x"), // longest match co.uk -> example.co.uk
      (2L, "https://example.co.uk"),        // exactly registered -> itself
      (3L, "https://www.site.com/y"),       // plain TLD -> site.com
      (4L, "https://intranet.corp/z"),      // off-list -> two-label fallback
      (5L, "https://localhost/w")           // single label: no rule, no fallback match -> ''
    ).toDF("id", "url")
    val out = TextAnalysis.registeredDomainBySuffix(rows, "url", "id", sfx)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("registered_domain")).toMap
    assert(out(1L) == "example.co.uk", "the 'uk' rule must lose to 'co.uk'")
    assert(out(2L) == "example.co.uk")
    assert(out(3L) == "site.com")
    assert(out(4L) == "intranet.corp")
    assert(out(5L) == "")
    assertThrows[IllegalArgumentException] {
      TextAnalysis.registeredDomainBySuffix(rows, "url", "id", Seq(("a", "b")).toDF("x", "y"))
    }
  }

  test("dropBlockedDomains strips subdomains to the registered domain and drops exactly the blocklist") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://www.bad.com/x?y=1"),
      (2L, "http://deep.sub.bad.com/y"),
      (3L, "https://good.com/z#frag"),
      (4L, "https://also-good.org"),     // no path at all
      (5L, "not a url")).toDF("id", "url")
    val out = TextAnalysis
      .dropBlockedDomains(rows, "url", Seq("bad.com").toDF("domain"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("registered_domain"))
      .toMap
    // both bad.com spellings (www., deep.sub.) are gone
    assert(out.keySet == Set(3L, 4L, 5L))
    assert(out(3L) == "good.com")
    assert(out(4L) == "also-good.org")
    // a non-URL extracts an empty domain and passes (no false drops)
    assert(out(5L) == "")
    // collision guard
    assertThrows[IllegalArgumentException] {
      TextAnalysis.dropBlockedDomains(
        rows.withColumnRenamed("url", "registered_domain"),
        "registered_domain", Seq("x").toDF("domain"))
    }
    // blocklist schema guard
    assertThrows[IllegalArgumentException] {
      TextAnalysis.dropBlockedDomains(rows, "url", Seq(("a", "b")).toDF("d1", "d2"))
    }
  }

  test("temperatureMixture flattens source skew with exact sqrt-weighted budgets") {
    import spark.implicits._
    import graft.operators.Sampling
    // 900/100 skew: α=0.5 weights are 30/10 → budgets 225/75 of 300;
    // proportional (depth 0) weights 900/100 → 270/30 — both exact
    // (every number here is integer-representable, no float edge)
    val docs = ((1L to 900L).map(i => (i, "srcA")) ++
      (1001L to 1100L).map(i => (i, "srcB")))
      .toDF("doc_id", "source")
    val h = graft.functions.TextExprs.charHashSpark("CAST(doc_id AS STRING)")
    graft.functions.PolyHash.register(spark)
    def kept(depth: Int): Map[String, Long] =
      Sampling.temperatureMixture(docs, "source", h, "doc_id", 300L, depth)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept(1) == Map("srcA" -> 225L, "srcB" -> 75L),
      "sqrt smoothing: tail source's share rises 10% -> 25%")
    assert(kept(0) == Map("srcA" -> 270L, "srcB" -> 30L),
      "depth 0 = proportional")
    // deterministic: the same prefix both times
    val a = Sampling.temperatureMixture(docs, "source", h, "doc_id", 300L, 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMixture(docs, "source", h, "doc_id", 300L, 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 300)
  }

  test("epochRepeat emits exact floor+fraction copies; epochs < 1 subsample") {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = ((1L to 10L).map(i => (i, "srcA")) ++
      (101L to 110L).map(i => (i, "srcB")) ++
      (201L to 210L).map(i => (i, "srcC"))).toDF("doc_id", "source")
    graft.functions.PolyHash.register(spark)
    val h = graft.functions.TextExprs.charHashSpark("CAST(doc_id AS STRING)")
    val out = Sampling.epochRepeat(
      docs, "source", h, "doc_id",
      epochs = Seq("srcA" -> 2.5, "srcB" -> 0.5), defaultEpochs = 1.0)
      .localCheckpoint(true)
    // srcA: 10·2 full copies + a 5-doc extra prefix = 25 rows;
    // srcB: 0 full copies + a 5-doc prefix = 5; srcC default = 10
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("srcA" -> 25L, "srcB" -> 5L, "srcC" -> 10L))
    // epochs are dense 0..total-1 per doc and (doc, epoch) unique
    assert(out.count() == out.select("doc_id", "epoch").distinct().count())
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0L)
    assert(bad.isEmpty, "per-doc epochs must be dense from 0")
    // deterministic: identical multiset on a re-run
    val again = Sampling.epochRepeat(
      docs, "source", h, "doc_id",
      epochs = Seq("srcA" -> 2.5, "srcB" -> 0.5), defaultEpochs = 1.0)
    assert(out.unionByName(again).distinct().count() == out.count())
  }

  test("mixtureByBudget fills budgets as hard ceilings, monotone under growth") {
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      (i, if (i <= 20) "web" else "code", 10L + (i % 7))
    }.toDF("doc_id", "source", "n_chars")
    val h = "CAST(doc_id AS STRING)" // ascii digits hash fine through length+codes
    def keep(webBudget: Long) = Sampling
      .mixtureByBudget(
        docs, "source", "n_chars",
        graft.functions.TextExprs.charHashSpark(h), "doc_id",
        Seq("web" -> webBudget), defaultBudget = 60L)
      .collect()
    graft.functions.PolyHash.register(spark)
    val small = keep(50L)
    val big = keep(120L)
    // hard ceiling: every stratum's running total ends within budget
    def maxRunning(rows: Array[org.apache.spark.sql.Row], src: String) = rows
      .filter(_.getAs[String]("source") == src)
      .map(_.getAs[Long]("running_weight")).maxOption.getOrElse(0L)
    assert(maxRunning(small, "web") <= 50L)
    assert(maxRunning(big, "web") <= 120L)
    assert(maxRunning(small, "code") <= 60L)
    // monotone: growing one budget only ADDS rows, and only in that stratum
    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids(small).subsetOf(ids(big)))
    assert(ids(big).size > ids(small).size)
    assert(
      ids(small).filter(_ > 20L) == ids(big).filter(_ > 20L),
      "untouched stratum must keep the identical row set")
    // deterministic: same inputs, same rows
    assert(ids(keep(50L)) == ids(small))
    // collision guard mirrors perGroupCap's
    val clash = docs.withColumnRenamed("n_chars", "running_weight")
    assertThrows[IllegalArgumentException] {
      Sampling.mixtureByBudget(
        clash, "source", "running_weight",
        graft.functions.TextExprs.charHashSpark(h), "doc_id",
        Seq("web" -> 10L), 10L)
    }
    // the config-table form is row-identical to the literal CASE form,
    // including the default fallback for strata absent from the table
    val viaTable = Sampling.mixtureByBudgetTable(
      docs, "source", "n_chars",
      graft.functions.TextExprs.charHashSpark(h), "doc_id",
      Seq(("web", 50L)).toDF("stratum", "budget"), defaultBudget = 60L)
    assert(
      viaTable.select("doc_id", "source", "running_weight").collect().toSet ==
        Sampling.mixtureByBudget(
          docs, "source", "n_chars",
          graft.functions.TextExprs.charHashSpark(h), "doc_id",
          Seq("web" -> 50L), 60L)
          .select("doc_id", "source", "running_weight").collect().toSet)
    assertThrows[IllegalArgumentException] {
      Sampling.mixtureByBudgetTable(
        docs, "source", "n_chars",
        graft.functions.TextExprs.charHashSpark(h), "doc_id",
        Seq(("web", 50L)).toDF("wrong", "cols"), 60L)
    }
  }

  test("naturalness ranks key-mash garbage below natural prose") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "the other dog sits near the old stone wall in the sun"
    val docs = Seq(
      (1L, prose),
      (2L, prose.reverse.filterNot(_ == ' ').grouped(4).mkString(" ")), // shredded transitions
      (3L, "zq xv kj qz vx jk zq xv kj qz vx jk zq xv kj qz"),          // key mash
      (4L, prose),                                                      // natural twin of 1
      (5L, "a"),                                                        // sub-bigram doc
      (6L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.naturalness(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("naturalness_ppm"))).toMap
    // every doc reappears, including the no-bigram ones at (0, 0)
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(5L) == ((0L, 0L)) && out(6L) == ((0L, 0L)))
    // identical docs score identically; prose beats both garbage forms
    assert(out(1L) == out(4L))
    assert(out(1L)._2 > out(3L)._2,
      s"prose ${out(1L)._2} should beat key-mash ${out(3L)._2}")
    assert(out(1L)._2 > out(2L)._2,
      s"prose ${out(1L)._2} should beat shredded text ${out(2L)._2}")
    // bigram geometry: n_bigrams = len - 1 for the prose docs
    assert(out(1L)._1 == (prose.length - 1).toLong)
  }

  test("sampled naturalness fit: mod 1 ≡ full fit; sampled model keeps the garbage ordering") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "the other dog sits near the old stone wall in the sun"
    // a corpus big enough that a 1/3 hash-sample certainly catches
    // prose docs: 30 prose carriers + the three probe docs
    val carriers = (10L to 39L).map(i => (i, prose + " run " + ("the dog " * (i % 3).toInt).trim))
    val probes = Seq(
      (1L, prose),
      (2L, prose.reverse.filterNot(_ == ' ').grouped(4).mkString(" ")), // shredded
      (3L, "zq xv kj qz vx jk zq xv kj qz vx jk zq xv kj qz"))          // key mash
    val docs = (carriers ++ probes).toDF("doc_id", "text")
    // Some(1) samples every doc — must reproduce the full fit exactly
    val full = TextAnalysis.naturalness(docs).orderBy("doc_id").collect().toSeq
    val mod1 = TextAnalysis.naturalness(docs, fitSampleMod = Some(1))
      .orderBy("doc_id").collect().toSeq
    assert(mod1 == full, "fitSampleMod = Some(1) must equal the full fit bit-for-bit")
    // a real sample: model fit on 1/3 of docs, ordering must survive
    val sampled = TextAnalysis.naturalness(docs, fitSampleMod = Some(3)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("naturalness_ppm"))).toMap
    assert(sampled(1L)._1 > 0L, "the sampled model must cover the prose probe's grams")
    assert(sampled(1L)._2 > sampled(3L)._2,
      s"prose ${sampled(1L)._2} should beat key-mash ${sampled(3L)._2} under a sampled fit")
    assert(sampled(1L)._2 > sampled(2L)._2,
      s"prose ${sampled(1L)._2} should beat shredded text ${sampled(2L)._2} under a sampled fit")
  }

  test("word_set_hits / char_class_stats match their regex twins on adversarial text") {
    import spark.implicits._
    graft.functions.WordSetHits.register(spark)
    graft.functions.CharClassStats.register(spark)
    graft.functions.LetterRunStats.register(spark)
    // boundary underscores/digits glue runs shut; \x0B is Java \s;
    // overlapping membership ("a" en-only, "es" es-only) exercises
    // the bitmask fan-out. ASCII-only texts here: the Unicode case
    // is pinned separately below because Java and RE2 disagree on it.
    val texts = Seq(
      "the cat and the hat", "the_cat and2 the hat_", "THE The the",
      "a", " a ", "xa ax", "", "   ", "\tthe\u000Bcat\r\n",
      "el es la les est", "und der die das ist",
      "a-a_a a", "the,a;and.of!to?is:in it", "dans pour une est le les",
      // CJK rows (space-separated from any stopword, so Java and RE2
      // \\b agree and every check column applies)
      "\u4f60\u597d \u4e16\u754c the cat", "\u6c49\u5b57\u6f22\u5b57", "caf\u00e9 \u4f60 tab\t\u4e16")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val sets = graft.functions.TextExprs.langStopwordLists
    val spec = sets.map(_._2.mkString(",")).mkString("|")
    val (checks, names) = (sets.zipWithIndex.map { case ((lang, words), i) =>
      val pat = words.mkString("\\\\b(", "|", ")\\\\b")
      (s"element_at(word_set_hits(lower(t), '$spec'), ${i + 1}) = regexp_count(lower(t), '$pat')",
        s"ws_$lang")
    } :+
      ("element_at(char_class_stats(t), 1) = regexp_count(t, '[^a-zA-Z0-9\\\\s]')", "cc_punct") :+
      ("element_at(char_class_stats(t), 2) = length(regexp_replace(t, '\\\\s', ''))", "cc_nonspace") :+
      ("element_at(char_class_stats(t), 3) = CASE WHEN length(trim(t)) = 0 THEN 0 ELSE size(split(trim(t), '\\\\s+')) END", "cc_ntokens") :+
      ("element_at(char_class_stats(t), 4) = regexp_count(t, '[\\\\u4e00-\\\\u9fff]')", "cc_cjk") :+
      ("element_at(letter_run_stats(lower(t)), 1) = size(filter(split(lower(t), '[^a-z]+'), x -> x <> ''))", "lr_total") :+
      ("element_at(letter_run_stats(lower(t)), 2) = size(array_distinct(filter(split(lower(t), '[^a-z]+'), x -> x <> '')))", "lr_distinct")).unzip
    val out = df.select(col("id") +: checks.zip(names).map { case (c, n) => expr(c).as(n) }: _*)
    val bad = out.filter(not(names.map(col).reduce(_ && _))).collect()
    assert(bad.isEmpty, s"equivalence failed: ${bad.mkString("; ")} over ${texts.mkString("|")}")
  }

  test("word_set_hits follows RE2/ASCII \\b (the DuckDB twin), not Java's Unicode \\b") {
    import spark.implicits._
    graft.functions.WordSetHits.register(spark)
    // Java's \b is Unicode-aware even without UNICODE_CHARACTER_CLASS
    // (a famous asymmetry with ASCII \w), so \bthe\b does NOT match
    // inside "\u00e9the"; RE2 — what the DuckDB oracle runs — uses
    // ASCII word chars, so it DOES. The kernel sides with RE2: it is
    // the cross-engine-parity choice, and the old Spark-side regex
    // was a latent oracle mismatch on any text with a stopword
    // adjacent to a non-ASCII letter.
    val df = Seq((1L, "caf\u00e9 the \u00e9the le caf\u00e9"), (2L, "\u4f60\u597dthe\u4e16\u754c"))
      .toDF("id", "t")
    val sets = graft.functions.TextExprs.langStopwordLists
    val spec = sets.map(_._2.mkString(",")).mkString("|")
    val out = df.select(
      col("id"),
      expr(s"element_at(word_set_hits(lower(t), '$spec'), 1)").as("kernel_en"),
      expr("regexp_count(lower(t), '\\\\b(the|a|and|of|to|is|in|it)\\\\b')").as("java_en"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == ((2, 1)), s"got ${out(1L)}") // kernel counts "\u00e9the"'s run, Java does not
    assert(out(2L) == ((1, 0)), s"got ${out(2L)}")
  }

  // ---- public-suffix list: parser + strict-spec matcher ----

  test("parsePslRules handles comments, blanks, inline junk, and exception marks") {
    val text =
      """// ===BEGIN ICANN DOMAINS===
        |
        |com
        |co.uk   // not an inline comment per spec: token ends at whitespace
        |  *.ck
        |!www.ck
        |
        |// ===END===
        |UK
        |""".stripMargin
    val rules = TextAnalysis.parsePslRules(text)
    assert(rules == Seq(
      ("com", 0), ("co.uk", 0), ("*.ck", 0), ("www.ck", 1), ("uk", 0)))
  }

  test("registeredDomainByPsl follows the publicsuffix.org algorithm") {
    import spark.implicits._
    val rules = TextAnalysis.parsePslRules(
      """com
        |uk
        |co.uk
        |*.ck
        |!www.ck
        |""".stripMargin).toDF("suffix_key", "is_exception")
    val cases = Seq(
      // the spec's own ck family
      (1L, "https://www.ck/x", "www.ck"),          // exception beats *.ck
      (2L, "https://foo.www.ck/x", "www.ck"),      // public suffix ck (exception rule minus leading label)
      (3L, "https://test.ck/x", null),             // host IS a public suffix (*.ck)
      (4L, "https://b.test.ck/x", "b.test.ck"),    // wildcard suffix + one label
      (5L, "https://a.b.test.ck/x", "b.test.ck"),
      // longest-match over multi-label suffixes
      (6L, "https://shop.example.co.uk/x", "example.co.uk"),
      (7L, "https://example.co.uk/x", "example.co.uk"),
      (8L, "https://co.uk/x", null),               // host IS a public suffix (co.uk)
      (9L, "https://EXAMPLE.COM/x", "example.com"),// case-insensitive matching
      // implicit * default: unlisted suffixes
      (10L, "https://a.b.intra.corp/x", "intra.corp"),
      (11L, "https://localhost/x", null))          // one label, no registrable domain
    val df = cases.map { case (id, url, _) => (id, url) }.toDF("doc_id", "url")
    val out = TextAnalysis.registeredDomainByPsl(df, "url", "doc_id", rules)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("registered_domain")).toMap
    cases.foreach { case (id, url, want) =>
      assert(out(id) == want, s"$url: got ${out(id)}, want $want")
    }
  }

  test("registeredDomainByPsl matches a clean-room reference on random rules and hosts") {
    import spark.implicits._
    val rnd = new scala.util.Random(4099)
    // small label alphabet so hosts and rules collide constantly —
    // wildcard overlaps, exception shadows, host==suffix cases all
    // occur by volume. `*` only ever leftmost, as in the real list.
    val labels = IndexedSeq("a", "b", "co", "uk", "ck", "x")
    def randLabels(n: Int): Seq[String] =
      (0 until n).map(_ => labels(rnd.nextInt(labels.size)))
    // reference: the publicsuffix.org algorithm, label-at-a-time
    def ref(host: String, rules: Seq[(String, Int)]): Option[String] = {
      val hs = host.split('.').toSeq
      val matches = rules.flatMap { case (rule, exc) =>
        val rl = rule.split('.').toSeq
        if (rl.size <= hs.size &&
          rl.zip(hs.takeRight(rl.size)).forall { case (r, h) => r == "*" || r == h })
          Some((exc, rl.size))
        else None
      }
      val psLabels =
        if (matches.isEmpty) 1 // implicit `*` default rule
        else {
          val (exc, k) = matches.maxBy { case (e, k) => (e, k) }
          if (exc == 1) k - 1 else k
        }
      if (hs.size > psLabels) Some(hs.takeRight(psLabels + 1).mkString("."))
      else None
    }
    (1 to 5).foreach { round =>
      // rules: 1-3 labels, ~25% wildcard; each wildcard sometimes
      // gets an exception carved out of it
      val base = (1 to 10).map { _ =>
        val body = randLabels(1 + rnd.nextInt(3)).mkString(".")
        if (rnd.nextInt(4) == 0) "*." + body else body
      }.distinct
      val excs = base.filter(_.startsWith("*.")).filter(_ => rnd.nextInt(2) == 0)
        .map(w => (labels(rnd.nextInt(labels.size)) + w.drop(1), 1))
      val rules = (base.map((_, 0)) ++ excs).distinct
        .groupBy(_._1).map(_._2.head).toSeq // a key is either normal or exception, as in the list
      val hosts = (1 to 80).map(_ => randLabels(1 + rnd.nextInt(5)).mkString(".")).distinct
      val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, s"https://$h/x") }
        .toDF("doc_id", "url")
      val out = TextAnalysis.registeredDomainByPsl(
        df, "url", "doc_id", rules.toDF("suffix_key", "is_exception"))
        .collect().map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("registered_domain"))).toMap
      hosts.zipWithIndex.foreach { case (h, i) =>
        val want = ref(h, rules)
        assert(out(i.toLong) == want,
          s"round $round host $h rules ${rules.mkString(",")}: got ${out(i.toLong)}, want $want")
      }
    }
  }

  test("dropBlockedDomainsPsl blocks multi-label-suffix domains the heuristic cannot") {
    import spark.implicits._
    val rules = TextAnalysis.parsePslRules("uk\nco.uk\ncom\n")
      .toDF("suffix_key", "is_exception")
    val docs = Seq(
      (1L, "https://shop.example.co.uk/x"),  // blocked: reg = example.co.uk
      (2L, "https://example.co.uk/x"),       // blocked: same reg, bare
      (3L, "https://other.co.uk/x"),         // kept: different reg
      (4L, "https://co.uk/x"),               // kept: NULL reg (public suffix)
      (5L, "https://example.com/x"))         // kept: .com not listed
      .toDF("doc_id", "url")
    val block = Seq("example.co.uk").toDF("domain")
    val out = TextAnalysis.dropBlockedDomainsPsl(docs, "url", "doc_id", rules = rules,
      blocklist = block)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L))
    // the two-label heuristic CANNOT express this block: it extracts
    // co.uk for every .co.uk host, so blocking example.co.uk drops
    // nothing and blocking co.uk would drop other.co.uk too
    val heuristic = TextAnalysis.dropBlockedDomains(docs, "url", block)
    assert(heuristic.count() == 5L)
    intercept[IllegalArgumentException] {
      TextAnalysis.dropBlockedDomainsPsl(
        docs, "url", "doc_id", block.withColumnRenamed("domain", "d"), rules)
    }
  }

  test("registeredDomainByPsl guards its inputs") {
    import spark.implicits._
    val df = Seq((1L, "https://a.com/x")).toDF("doc_id", "url")
    val rules = Seq(("com", 0)).toDF("suffix_key", "is_exception")
    intercept[IllegalArgumentException] {
      TextAnalysis.registeredDomainByPsl(
        df, "url", "doc_id", rules.withColumnRenamed("suffix_key", "sfx"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.registeredDomainByPsl(
        df.withColumn("registered_domain", lit("x")), "url", "doc_id", rules)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.registeredDomainByPsl(df, "url", "doc_id", rules, maxSuffixLabels = 0)
    }
  }

  // ---- line-level quality stats (Gopher rule family) ----

  test("lineStats computes exact per-line metrics and the Gopher verdicts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "- a\n- b\n* c"),            // all bullet starts
      (2L, "x\nx\nx\ny"),               // 2 of 4 lines repeats
      (3L, "hello...\nworld"),          // half ellipsis ends
      (4L, "ab\n\n   \ncd"),            // empty/blank lines dropped
      (5L, "one line only")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.lineStats(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def m(id: Long, c: String) = got(id).getAs[Long](c)
    def v(id: Long) = got(id).getAs[String]("line_verdict")
    assert(m(1, "n_lines") == 3 && m(1, "bullet_start_ppm") == 1000000L && v(1) == "bullets")
    assert(m(2, "dup_line_ppm") == 500000L && v(2) == "dup_lines")
    assert(m(3, "ellipsis_end_ppm") == 500000L && v(3) == "ellipsis")
    assert(m(4, "n_lines") == 2 && m(4, "dup_line_ppm") == 0L && v(4) == "keep")
    assert(m(4, "mean_line_chars_ppm") == 2000000L) // 2 chars/line x 1e6
    assert(m(5, "n_lines") == 1 && v(5) == "keep")
  }

  // ---- TrainingExport stage-toggle matrix ----

  import graft.pipelines.TrainingExport
  import graft.pipelines.TrainingExport.{Config, DedupExact, DedupNearDup, DedupOff}

  /** 24-doc corpus: 8 English-passing bases across two sources, each
    * with one exact copy (id+100) and one near-dup copy (id+200, one
    * appended token) — every dedup strength has something to bite on.
    * Every 3rd token is a base-specific letters-only marker, so every
    * 3-shingle contains one and DIFFERENT bases share zero shingles
    * (the DedupScaleBench trick): near-dup clustering and the
    * contamination gate bind exactly per planted cluster, never
    * across bases. Letters only — the tokenizer splits on non-alpha,
    * so digit-suffixed markers would collapse to one token.
    */
  private lazy val matrixDocs = {
    import spark.implicits._
    val stops = Seq("the", "and", "was", "for", "not", "all",
      "can", "her", "one", "you", "our", "out")
    val words = Seq("fox", "dog", "cat", "owl", "bee", "elk",
      "ant", "ram", "hen", "cow", "pig", "bat")
    val bases = (1L to 8L).map { i =>
      val li = ('a' + i - 1).toChar
      val text = (0 until 12).map { k =>
        s"${stops(k)} ${words(k)} q$li${('a' + k).toChar}zz"
      }.mkString(" ")
      (i, if (i % 2 == 0) "src0" else "src1", text)
    }
    val rows = bases.flatMap { case (i, src, t) =>
      Seq((i, src, t), (i + 100, src, t), (i + 200, src, t + " extra"))
    }
    rows.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .localCheckpoint(true)
  }

  private def runExport(cfg: Config) =
    TrainingExport.run(
      matrixDocs,
      matrixDocs.filter(col("doc_id") === 1L), // benchmark = doc 1's text
      cfg).localCheckpoint(true)

  private val allOff = Config(
    curate = false, dedup = DedupOff, contaminationMaxPpm = None,
    budgets = Nil, numShards = 4)

  test("TrainingExport with every stage off is pure shard assignment") {
    val out = runExport(allOff)
    assert(out.count() == matrixDocs.count())
    // shard ∈ [0, numShards); seq dense 1..n within each shard
    assert(out.filter(col("shard") < 0 || col("shard") >= 4).isEmpty)
    val badSeq = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("seq").as("mx"), min("seq").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(badSeq.isEmpty, "seq must be dense 1..n per shard")
  }

  test("TrainingExport exact dedup keeps one min-id doc per distinct text") {
    val out = runExport(allOff.copy(dedup = DedupExact))
    // 8 bases + 8 near-dup variants survive; the 8 exact copies fold
    assert(out.count() == 16)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1L to 8L).forall(ids.contains), "canonical = min id per text group")
    assert((101L to 108L).forall(i => !ids.contains(i)), "exact copies dropped")
  }

  test("TrainingExport near-dup dedup also folds the mutated copies") {
    val out = runExport(allOff.copy(dedup = DedupNearDup()))
    // each cluster {i, i+100, i+200} collapses to its min id
    assert(out.count() == 8)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == (1L to 8L).toSet)
    // near-clique clusters converge inside the propagation budget, so
    // the adaptive chooser stays on the cheap path — no star fallback
    assert(graft.operators.ConnectedComponents.lastComponentsPath.get() == "propagate")
    // a tighter propagation budget changes only the algorithm choice,
    // never the manifest (both algorithms emit identical labels)
    val tight = runExport(allOff.copy(dedup = DedupNearDup(propagateRounds = 1)))
    assert(tight.orderBy("shard", "seq").collect().toSeq ==
      out.orderBy("shard", "seq").collect().toSeq)
  }

  test("TrainingExport near-dup chain corpus trips the star fallback inside the pipeline") {
    import spark.implicits._
    // rolling-window chain: doc k (k = 0..11) = 24 consecutive tokens
    // of one letters-only stream, shifted 2 per doc — adjacent docs
    // share 22 of 24 tokens (3-shingle Jaccard ≈ 0.83, far above the
    // banding + agreement gates, so every chain link is detected),
    // while docs 0 and 11 share only 2 tokens (zero shingles — no
    // edge possible). A connected pair graph missing the 0↔11 edge
    // has diameter ≥ 2, so with propagateRounds = 1 min-label
    // propagation cannot reach the fixpoint in its one round →
    // ConnectedComponents.components must fall back to
    // large-star/small-star INSIDE the pipeline run.
    val stream = (0 until 46).map(i => f"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}zz")
    val chain = (0L to 11L).map { k =>
      val text = stream.slice(k.toInt * 2, k.toInt * 2 + 24).mkString(" ")
      (k, "src0", text)
    }.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // the pair graph is a chain: every adjacent link present (the
    // high-overlap pairs MinHash cannot miss), the far ends unlinked
    // — mid-distance skip edges are allowed (they shorten but never
    // collapse the diameter below 2)
    val pairs = graft.operators.Dedup.minhashPairs(chain)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L to 10L).foreach { k =>
      assert(pairs.contains((k, k + 1)), s"fixture drifted: missing adjacent link ($k,${k + 1}) in $pairs")
    }
    assert(!pairs.contains((0L, 11L)), s"fixture drifted: far ends linked in $pairs")
    val out = TrainingExport.run(
      chain, chain.filter(col("doc_id") === 99L),
      allOff.copy(dedup = TrainingExport.DedupNearDup(propagateRounds = 1),
        contaminationMaxPpm = None))
    // one chain component → only the min id survives
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L))
    assert(graft.operators.ConnectedComponents.lastComponentsPath.get() == "star")
  }

  test("TrainingExport contamination gate drops the benchmark-overlapping cluster") {
    val out = runExport(allOff.copy(contaminationMaxPpm = Some(500000L)))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 1 and its copies share ~all 3-grams with the benchmark;
    // other bases differ by one token out of ~26, which leaves 3
    // contaminated shingles out of 24 — under the 50% gate
    assert(!ids.contains(1L) && !ids.contains(101L) && !ids.contains(201L))
    assert(ids.contains(2L) && out.count() >= 20)
  }

  test("TrainingExport mixture budgets truncate each source to a hash-order prefix") {
    val budget = 400L
    val out = runExport(allOff.copy(
      budgets = Seq("src0" -> budget, "src1" -> budget), defaultBudget = 0L))
    val perSrc = matrixDocs.select("doc_id", "source", "n_chars")
      .join(out.select("doc_id"), Seq("doc_id"), "left_semi")
      .groupBy("source").agg(sum("n_chars").as("chars")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc.nonEmpty && perSrc.values.forall(_ <= budget),
      s"kept chars per source must respect the budget, got $perSrc")
    assert(out.count() < matrixDocs.count(), "a 400-char budget must bind")
  }

  test("TrainingExport token-currency budgets bill in WordPiece tokens; chars stays the default") {
    import graft.pipelines.TrainingExport.{BudgetChars, BudgetWordPieceTokens}
    def rows(cfg: Config) = runExport(cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val base = allOff.copy(
      budgets = Seq("src0" -> 400L, "src1" -> 400L), defaultBudget = 0L)
    // the explicit chars toggle IS the default — historical hashes hold
    assert(rows(base) == rows(base.copy(budgetCurrency = BudgetChars)))
    // token currency: independent replay — per-source hash-order
    // prefix over WordPiece token counts must equal the kept set
    val budget = 150L
    val out = runExport(base.copy(
      budgets = Seq("src0" -> budget, "src1" -> budget),
      budgetCurrency = BudgetWordPieceTokens()))
    val gotIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    graft.functions.PolyHash.register(spark)
    val h = graft.functions.TextExprs.charHashSpark("CAST(doc_id AS STRING)")
    val weighted = graft.operators.TextAnalysis
      .wordpieceStats(matrixDocs, passthroughCols = Seq("source"))
      .selectExpr("doc_id", "source", "n_tokens",
        s"(${graft.operators.Sampling.mixedHash(h)}) AS mh")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val wantIds = weighted.groupBy(_._2).toSeq.flatMap { case (_, docs) =>
      val ordered = docs.toSeq.sortBy(d => (d._4, d._1))
      val running = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(running).collect { case (d, sum) if sum <= budget => d._1 }
    }.toSet
    assert(gotIds == wantIds,
      s"extra=${gotIds -- wantIds} missing=${wantIds -- gotIds}")
    // the 150-token budget binds (truncates) but keeps something
    assert(gotIds.nonEmpty && gotIds.size < matrixDocs.count())
    // the billed unit is genuinely tokens, not a char alias: marker
    // words are UNK (1 token each, many chars), so every doc's token
    // weight is far below its char weight — a 150 budget keeps docs
    // in token currency but would keep NOTHING in chars
    val charWeights = matrixDocs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted.forall { case (id, _, tok, _) => tok < charWeights(id) })
    assert(charWeights.values.forall(_ > budget), "chars at this budget would keep nothing")
  }

  test("TrainingExport spanDedup stage cuts repeated spans and later stages bill the rewritten text") {
    // every base's copies (+100 exact, +200 one-token-appended) share
    // the full 36-token base text as a repeated span; with the stage
    // on, the LATER occurrences are gutted (keep-first), so their
    // char cost collapses to ~0 and a budget that truncated the
    // source before now admits every doc — the proof that the
    // mixture bills POST-surgery n_chars
    val budget = allOff.copy(budgets = Seq("src1" -> 700L), defaultBudget = 1000000L)
    val without = runExport(budget)
    val withSpans = runExport(budget.copy(spanDedup = Some(10)))
    // surgery never drops docs: every input doc still ships a row
    assert(runExport(allOff.copy(spanDedup = Some(10))).count() == matrixDocs.count())
    val srcCount = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("source") === "src1").count()
    assert(srcCount(without) < 12,
      s"src1 at 700 chars must truncate pre-surgery (12 docs ≈ 2000 chars)")
    assert(srcCount(withSpans) == 12,
      "post-surgery src1 costs ~688 chars — every doc fits the same budget")
  }

  test("TrainingExport paragraphDedup stage rebuilds docs and bills post-dedup chars") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (901L, "src9", shared + "\nunique tail one"),
      (902L, "src9", shared + "\nunique tail two and a bit more"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    def run(cfg: Config) = TrainingExport.run(
      docs, docs.filter(col("doc_id") === 0L), cfg)
    // the stage rewrites, never drops: both docs still ship a row
    assert(run(allOff.copy(paragraphDedup = true)).count() == 2)
    // billing proof: doc 902 loses the shared first line (first
    // occurrence lives in 901), so its post-dedup cost is its unique
    // tail only. A budget of exactly (full 901 + tail-only 902) admits
    // BOTH docs with the stage on (total fits, any hash order), but
    // with the stage off the same budget cannot fit both full texts.
    val full = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val budget = full(901L) + (full(902L) - shared.length - 1)
    val cfg = allOff.copy(budgets = Seq("src9" -> budget), defaultBudget = 0L)
    assert(run(cfg.copy(paragraphDedup = true)).count() == 2,
      "post-dedup chars must fit the exact-total budget")
    assert(run(cfg).count() < 2,
      "pre-dedup chars must NOT fit the same budget")
  }

  test("TrainingExport semanticDedup stage drops a non-representative embedding dupe, embedding-free docs pass") {
    import spark.implicits._
    val docs = Seq(
      (800L, "src8", "the quick brown fox jumps over the lazy dog and runs on"),
      (801L, "src8", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (803L, "src8", "wort wort anderes wort noch mehr worte hier jetzt dann zz"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // 801's vector is the 1.001×-scaled copy of 800's → cosine ≈ 1,
    // one semantic component {800, 801} (800 is also the centroid
    // seed: 800 % 50 == 0); doc 803 has NO embedding row
    val base = (0 until graft.functions.VectorExprs.Dim)
      .map(i => ((i * 7) % 13 - 6).toFloat)
    val emb = Seq(
      (800L, base), (801L, base.map(_ * 1.001f))).toDF("vec_id", "embedding")
    def run(cfg: Config, e: org.apache.spark.sql.DataFrame) =
      TrainingExport.run(
        docs, docs.filter(col("doc_id") === 0L), cfg, embeddings = e)
    val on = run(allOff.copy(semanticDedup = true), emb)
      .select("doc_id").as[Long].collect().toSet
    graft.operators.Dedup.unpersistAll()
    assert(on.contains(803L), "embedding-free docs must pass through")
    assert(Set(800L, 801L).intersect(on).size == 1,
      "exactly one of the semantic pair ships")
    // toggle off: all three ship, byte-identical prior behavior
    assert(run(allOff, null).count() == 3)
    // stage on without the data it needs fails fast at the call site
    val e = intercept[IllegalArgumentException] {
      run(allOff.copy(semanticDedup = true), null).count()
    }
    assert(e.getMessage.contains("embeddings"), e.getMessage)
  }

  test("TrainingExport simhash dedup folds exact and drifted copies, survivors are canonical bases") {
    import spark.implicits._
    val out = runExport(allOff.copy(
      dedup = TrainingExport.DedupSimHash(numPartitions = Some(4))))
    val ids = out.select("doc_id").as[Long].collect().toSet
    // every copy folds: exact copies sit at Hamming 0 of their base,
    // one-token-tail copies within the radius; min-id canonical means
    // every survivor is a BASE (bases may additionally merge if two
    // lands within radius 4 in one source block — survivors are then
    // the component minima, still bases)
    assert(ids.nonEmpty && ids.subsetOf((1L to 8L).toSet),
      s"survivors must be canonical bases, got $ids")
    assert((101L to 108L).forall(i => !ids.contains(i)))
    assert((201L to 208L).forall(i => !ids.contains(i)))
  }

  test("TrainingExport mediaDedup stage: exact byte pass, then perceptual drop; media-less docs pass") {
    import spark.implicits._
    val docs = Seq(
      (900L, "src9", "the quick brown fox jumps over the lazy dog and runs on"),
      (901L, "src9", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (902L, "src9", "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
      (903L, "src9", "nulla facilisi morbi tempus iaculis urna id volutpat lacus zz"),
      (905L, "src9", "wort wort anderes wort noch mehr worte hier jetzt dann zz"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // media plant: 901's payload is a BYTE-EXACT copy of 900's (the
    // exact pass's prey), 903's a 3-pixel perturbed copy of 902's
    // (the perceptual pass's — Hamming ≤ 3 under radius 4); 905 has
    // NO media row. Formula keys 450/451 sit in the measured ≥5
    // cross-margin domain, so the two pairs never cross-link.
    def keyed(k: Long) = Seq(k).toDF("doc_id")
    def m(k: Long, mediaId: Long, pert: Boolean) =
      graft.operators.Multimodal.synthesizePpmTextured(keyed(k), perturb = pert)
        .withColumn("media_id", lit(mediaId))
    val media = m(450L, 900L, pert = false)
      .unionByName(m(450L, 901L, pert = false))
      .unionByName(m(451L, 902L, pert = false))
      .unionByName(m(451L, 903L, pert = true))
      .localCheckpoint(true)
    // sanity on the plant itself: 900/901 byte-identical, 902/903 not
    assert(media.select(md5(col("media")).as("d"))
      .groupBy("d").count().filter(col("count") === 2).count() == 1)
    def run(cfg: Config, md: org.apache.spark.sql.DataFrame) =
      TrainingExport.run(
        docs, docs.filter(col("doc_id") === 0L), cfg, media = md)
    val on = run(allOff.copy(mediaDedup = Some(4)), media)
      .select("doc_id").as[Long].collect().toSet
    graft.operators.Dedup.unpersistAll()
    assert(on.contains(905L), "media-less docs must pass through")
    assert(on.contains(900L) && !on.contains(901L),
      "byte-exact copy drops at the exact pass, min media_id wins")
    assert(on.contains(902L) && !on.contains(903L),
      "perturbed copy drops at the perceptual pass, min media_id wins")
    // toggle off: all five ship, byte-identical prior behavior
    assert(run(allOff, null).count() == 5)
    // stage on without the data it needs fails fast at the call site
    val e = intercept[IllegalArgumentException] {
      run(allOff.copy(mediaDedup = Some(4)), null).count()
    }
    assert(e.getMessage.contains("media"), e.getMessage)
  }

  test("TrainingExport lineRules stage drops bullet-farm docs, leaves single-line docs alone") {
    import spark.implicits._
    val bulletFarm = (0 until 12).map(i => s"- item ${('a' + i).toChar}").mkString("\n")
    val withFarm = matrixDocs.unionByName(
      Seq((900L, "src0", bulletFarm)).toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long")))
    def ids(cfg: Config) = TrainingExport.run(
      withFarm, withFarm.filter(col("doc_id") === 1L), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val off = ids(allOff)
    assert(off.contains(900L), "stage off: the bullet farm ships")
    val on = ids(allOff.copy(lineRules = true))
    assert(!on.contains(900L), ">90% bullet lines must fail the line gate")
    // single-line matrix docs pass the line rules untouched
    assert(on == off - 900L)
  }

  test("TrainingExport curate stage drops the short-doc outlier and each stage only removes rows") {
    import spark.implicits._
    val withShort = matrixDocs.unionByName(
      Seq((999L, "src0", "too short")).toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long")))
    def ids(cfg: Config) = TrainingExport.run(
      withShort, withShort.filter(col("doc_id") === 1L), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(allOff)
    assert(base.contains(999L))
    val curated = ids(allOff.copy(curate = true))
    assert(!curated.contains(999L), "sub-minTokens doc must fail the funnel")
    // monotonicity: enabling stages never adds rows
    assert(curated.subsetOf(base))
    val full = ids(Config(
      curate = true, dedup = DedupNearDup(),
      contaminationMaxPpm = Some(500000L),
      budgets = Seq("src0" -> 400L, "src1" -> 400L), defaultBudget = 0L,
      numShards = 4))
    assert(full.subsetOf(curated))
  }

  test("TrainingExport chunk export: doc stages first, duplicate chunks fold, token budgets bind") {
    import graft.operators.{Dedup, TextAnalysis}
    def runChunks(cfg: Config) = TrainingExport.runChunks(
      matrixDocs, matrixDocs.filter(col("doc_id") === 1L), cfg,
      chunkTokens = 8, strideTokens = 4).localCheckpoint(true)
    // all doc stages off: exact-copy docs (i and i+100) survive to the
    // chunker, but every one of i+100's chunks duplicates i's — the
    // CHUNK dedup stage must fold them all; i+200 ends "extra", so
    // only its tail window (and any window covering it) differs
    val out = runChunks(allOff)
    val byDoc = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1L to 8L).forall(byDoc.contains))
    assert(!(101L to 108L).exists(byDoc.contains),
      "a doc whose every chunk is a duplicate contributes nothing")
    // the output identity is the unpacked composite and matches the
    // standalone chunkDedup keep-set exactly (stage ≡ operator)
    val chunks = TextAnalysis.chunkDocuments(
      matrixDocs, chunkTokens = 8, strideTokens = 4)
    val keepSet = Dedup.chunkDedup(chunks).filter(col("keep"))
      .select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val outSet = out.select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(outSet == keepSet)
    // seq dense 1..n per shard, like the doc export
    val badSeq = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("seq").as("mx"), min("seq").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(badSeq.isEmpty)
    // doc-level dedup BEFORE chunking changes nothing here (the chunk
    // dedup already folded the copies) — stage order is consistent
    val dd = runChunks(allOff.copy(dedup = DedupExact))
    assert(dd.select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == outSet)
    // chunk-token budgets are hard ceilings per source
    val budgeted = runChunks(allOff.copy(
      budgets = Seq("src0" -> 20L, "src1" -> 20L), defaultBudget = 0L))
    assert(budgeted.count() > 0 && budgeted.count() < out.count(),
      "a 20-token budget must bind")
    val weights = budgeted.join(
      TextAnalysis.chunkDocuments(matrixDocs, 8, 4)
        .select("doc_id", "chunk_id", "n_tokens"),
      Seq("doc_id", "chunk_id"))
    val perSrc = weights.groupBy("source")
      .agg(sum("n_tokens").as("t")).collect()
    assert(perSrc.forall(_.getLong(1) <= 20L))
  }

  test("runChunks rejects the WordPiece budget currency instead of silently mis-billing") {
    val e = intercept[IllegalArgumentException] {
      TrainingExport.runChunks(
        matrixDocs, matrixDocs.filter(col("doc_id") === 1L),
        allOff.copy(
          budgets = Seq("src0" -> 100L),
          budgetCurrency = TrainingExport.BudgetWordPieceTokens()),
        chunkTokens = 8, strideTokens = 4)
    }
    assert(e.getMessage.contains("CHUNK TOKENS"), e.getMessage)
  }

  test("packedChunkId: round-trip and lazy range guards (r14 verdict: no unguarded packing)") {
    import spark.implicits._
    import graft.operators.Dedup
    val ok = Seq((5L, 0L), (0L, 1048575L), (123456789L, 42L))
      .toDF("d", "c")
      .select(
        col("d"), col("c"),
        Dedup.unpackedDocId(Dedup.packedChunkId(col("d"), col("c"))).as("d2"),
        Dedup.unpackedChunkId(Dedup.packedChunkId(col("d"), col("c"))).as("c2"))
      .collect()
    assert(ok.forall(r => r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3)))
    // lazy: the guard fires on the row that violates, inside the job
    def boom(d: Long, c: Long): String =
      intercept[Exception] {
        Seq((d, c)).toDF("d", "c")
          .select(Dedup.packedChunkId(col("d"), col("c"))).collect()
      }.getMessage
    assert(boom(1L, 1L << 20).contains("packing range"))
    assert(boom(1L, -1L).contains("packing range"))
    assert(boom(1L << 43, 1L).contains("packing range"))
    assert(boom(-1L, 1L).contains("packing range"))
  }

  test("chunkNearDupPairs emits the composite identity of the packed minhash pairs") {
    import spark.implicits._
    import graft.operators.{Dedup, TextAnalysis}
    val chunks = TextAnalysis.chunkDocuments(
      matrixDocs, chunkTokens = 8, strideTokens = 4)
    val viaOp = Dedup.chunkNearDupPairs(chunks)
      .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b").collect().toSeq
    Dedup.unpersistAll()
    val viaPacked = Dedup.minhashPairs(
      chunks.select(
        (col("doc_id") * (1L << 20) + col("chunk_id")).as("doc_id"),
        col("chunk_text").as("text")))
      .select(
        (col("doc_a") / (1L << 20)).cast("long").as("doc_a"),
        (col("doc_a") % (1L << 20)).as("chunk_a"),
        (col("doc_b") / (1L << 20)).cast("long").as("doc_b"),
        (col("doc_b") % (1L << 20)).as("chunk_b"),
        col("n_agree"))
      .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b").collect().toSeq
    Dedup.unpersistAll()
    assert(viaOp == viaPacked && viaOp.nonEmpty)
  }

  test("hashedLinearScore: margin equals the hand fold in integer ppm, stays one narrow projection; weights loader guards") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha alpha alpha alpha"),
      (3L, "unrelated words entirely here now"))
      .toDF("doc_id", "text")
    val b = 64
    val w = Array.tabulate(b)(i => ((i.toLong * 37L) % 101L) - 50L)
    val out = TextAnalysis
      .hashedLinearScore(docs, w, biasPpm = 10L, thresholdPpm = 10L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // hand fold over the SAME word hashes the operator consumes
    val hashes = docs
      .select(
        col("doc_id"),
        expr(graft.functions.TextExprs.wordHashArraySpark(
          graft.functions.TextExprs.wordsSpark("text"))).as("wh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(hashes.nonEmpty && hashes.values.forall(_.nonEmpty))
    hashes.foreach { case (id, hs) =>
      val margin = 10L * hs.length + hs.map(h => w((h % b).toInt)).sum
      assert(out(id) == ((hs.length.toLong, margin, margin >= 10L * hs.length)),
        s"doc $id: ${out(id)} vs hand margin $margin")
    }
    // loader: dense round trip, zero default, range + duplicate guards
    val loaded = TextAnalysis.hashedLinearWeights(
      Seq((0L, 5L), (63L, -7L)).toDF("bucket", "weight_ppm"), 64)
    assert(loaded(0) == 5L && loaded(63) == -7L && loaded(5) == 0L)
    intercept[IllegalArgumentException](TextAnalysis.hashedLinearWeights(
      Seq((64L, 1L)).toDF("bucket", "weight_ppm"), 64))
    intercept[IllegalArgumentException](TextAnalysis.hashedLinearWeights(
      Seq((1L, 1L), (1L, 2L)).toDF("bucket", "weight_ppm"), 64))
    // the whole scorer is one narrow projection — no shuffle, no join
    val plan = TextAnalysis.hashedLinearScore(docs, w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hashedLinearFit: learns a planted-separable gate, deterministic, label guard") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // separable by construction: positives carry 'good', negatives
    // 'bad', plus shared noise tokens in both classes
    val docs = (1L to 40L).map { i =>
      val pos = i % 2 == 0
      val marker = if (pos) "good good good" else "bad bad bad"
      (i, s"common filler words here $marker tail$i", pos)
    }.toDF("doc_id", "text", "label")
    val b = 64
    val fit = TextAnalysis.hashedLinearFit(docs, b, epochs = 3, lrPpm = 1000L)
    assert(fit.columns.toSeq == Seq("bucket", "weight_ppm"))
    val w = TextAnalysis.hashedLinearWeights(fit, b)
    // the trained gate separates the planted classes at margin 0
    val gated = TextAnalysis.hashedLinearScore(docs, w)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    (1L to 40L).foreach(i =>
      assert(gated(i) == (i % 2 == 0), s"doc $i misgated after fit: $gated"))
    // full-batch + fixed-point = bit-deterministic: re-fit is identical
    val again = TextAnalysis.hashedLinearFit(docs, b, epochs = 3, lrPpm = 1000L)
    assert(fit.orderBy("bucket").collect().toSeq ==
      again.orderBy("bucket").collect().toSeq)
    // a NULL label fails fast instead of silently training a negative
    val holed = docs.withColumn(
      "label", when(col("doc_id") === 7L, lit(null)).otherwise(col("label")))
    val e = intercept[IllegalArgumentException](
      TextAnalysis.hashedLinearFit(holed, b))
    assert(e.getMessage.contains("NULL labels"), e.getMessage)
    graft.operators.Dedup.unpersistAll()
  }

  // ---- runIngest: the steady-state export ----

  private def dropIngestState(p: String): Unit =
    Seq(
      s"${p}_dedup", s"${p}_dedup_compact_tmp", s"${p}_dedup_tombstones",
      s"${p}_sigs", s"${p}_sigs_compact_tmp", s"${p}_sigs_tombstones",
      s"${p}_chunks", s"${p}_chunks_compact_tmp", s"${p}_chunks_tombstones",
      s"${p}_budget", s"${p}_offsets")
      .foreach(t => TestSpark.resetTable(spark, s"`$t`"))

  test("runIngest: arrival-order dedup across batches, idempotent re-ingest, dense cross-batch seq") {
    import spark.implicits._
    import graft.operators.Dedup
    val p = "ingest_spec_arrival"
    dropIngestState(p)
    val cfg = allOff.copy(dedup = DedupExact, numShards = 4)
    val bench = matrixDocs.filter(col("doc_id") === 1L)
    def mk(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    try {
      val b0 = matrixDocs.filter(col("doc_id") <= 8L)
      val s0 = TrainingExport.runIngest(b0, bench, cfg, p)
      Dedup.unpersistAll()
      assert(s0.count() == 8L, "first ingest ships every distinct doc")
      // batch 1: byte-copies of batch-0 docs — including one with a
      // SMALLER id than its original — are rejected (arrival wins,
      // not min id); a genuinely new doc ships
      val t1 = matrixDocs.filter(col("doc_id") === 1L)
        .head().getString(2)
      val b1 = mk(Seq(
        (0L, "src1", t1), // smaller id than the batch-0 owner (1L)
        (901L, "src0", "a genuinely new document about nothing else zzz")))
        .unionByName(matrixDocs.filter(col("doc_id") === 102L)) // copy of 2
      val s1 = TrainingExport.runIngest(b1, bench, cfg, p)
      Dedup.unpersistAll()
      val shipped1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(shipped1 == Set(901L),
        s"copies must lose to first arrival whatever their id: $shipped1")
      // batch 2: re-ingesting batch 0 verbatim ships nothing
      val s2 = TrainingExport.runIngest(b0, bench, cfg, p)
      Dedup.unpersistAll()
      assert(s2.count() == 0L, "re-ingest is idempotent")
      // the documented crash remedy: takedown of the batch owners
      // frees their fingerprint slots, and a re-ingest ships them
      // fresh (probes read the tombstone-masked live view)
      Dedup.deleteFromLineTable(
        matrixDocs.filter(col("doc_id") <= 8L).select("doc_id"),
        s"${p}_dedup")
      val s3 = TrainingExport.runIngest(b0, bench, cfg, p)
      Dedup.unpersistAll()
      assert(s3.count() == 8L,
        "after takedown the re-ingested batch must ship again")
      // seq is dense 1..n per shard ACROSS all four ingests (the
      // post-takedown re-ship continues the offsets like any batch)
      val all = s0.unionByName(s1).unionByName(s2).unionByName(s3)
        .select("shard", "seq").collect().map(r => (r.getLong(0), r.getLong(1)))
      all.groupBy(_._1).foreach { case (sh, rows) =>
        val seqs = rows.map(_._2).sorted.toSeq
        assert(seqs == (1L to rows.length.toLong).toSeq,
          s"shard $sh seqs not dense: $seqs")
      }
    } finally dropIngestState(p)
  }

  test("runIngest: budgets are corpus-lifetime ceilings and a budget-rejected doc keeps its identity slot") {
    import spark.implicits._
    import graft.operators.Dedup
    val p = "ingest_spec_budget"
    dropIngestState(p)
    // texts sized exactly: A and B 60 chars, C 30, D 50 — budget 100
    def padTo(base: String, n: Int) =
      (base + " " + ("x " * n)).take(n)
    val cfg = allOff.copy(
      dedup = DedupExact,
      budgets = Seq("src0" -> 100L), defaultBudget = 0L, numShards = 2)
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    try {
      // batch 0: two 60-char docs — exactly one fits the 100 budget
      val a = padTo("alpha doc words", 60)
      val b = padTo("bravo doc words", 60)
      val s0 = TrainingExport.runIngest(mk(Seq((1L, a), (2L, b))), bench, cfg, p)
      Dedup.unpersistAll()
      val k0 = s0.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(k0.size == 1, s"one 60-char doc fits budget 100: $k0")
      val rejected = (Set(1L, 2L) -- k0).head
      val rejectedText = if (rejected == 1L) a else b
      // batch 1: a byte-copy of the BUDGET-rejected doc — identity is
      // permanent, so it is still a duplicate even though the budget
      // has room; a new 30-char doc fills the remaining 40
      val s1 = TrainingExport.runIngest(
        mk(Seq((10L, rejectedText), (11L, padTo("charlie doc", 30)))),
        bench, cfg, p)
      Dedup.unpersistAll()
      val k1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(k1 == Set(11L),
        s"copy of the budget-rejected doc must not ship: $k1")
      // batch 2: remaining budget is 100-60-30 = 10 — a 50-char doc
      // does not fit, even though a fresh batch-run would admit it
      val s2 = TrainingExport.runIngest(
        mk(Seq((20L, padTo("delta doc words", 50)))), bench, cfg, p)
      Dedup.unpersistAll()
      assert(s2.count() == 0L, "the lifetime ceiling binds across ingests")
      // the persisted consumed state reads exactly what shipped
      val consumed = spark.table(s"${p}_budget").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(consumed == Map("src0" -> 90L), s"consumed: $consumed")
    } finally dropIngestState(p)
  }

  test("runIngest near-dup and simhash stages probe their persisted states; the sigs state grows by the whole batch") {
    import graft.operators.Dedup
    val bench = matrixDocs.filter(col("doc_id") === 1L)
    // near-dup: batch 0 = bases, batch 1 = the +200 tail copies — all
    // rejected against the persisted band+signature state
    val p1 = "ingest_spec_nd"
    dropIngestState(p1)
    try {
      val cfg = allOff.copy(dedup = DedupNearDup(), numShards = 4)
      val s0 = TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") <= 8L), bench, cfg, p1)
      Dedup.unpersistAll()
      assert(s0.count() == 8L)
      val sigRows0 = spark.table(s"${p1}_sigs").count()
      assert(sigRows0 == 8L, "every batch doc's signature persists")
      val s1 = TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") > 200L), bench, cfg, p1)
      Dedup.unpersistAll()
      assert(s1.count() == 0L, "near-dup tail copies lose to the corpus state")
      // seen-corpus policy: the rejected batch's signatures persist too
      assert(spark.table(s"${p1}_sigs").count() == sigRows0 + 8L)
    } finally dropIngestState(p1)
    // simhash: the drifted copies sit within Hamming 4 of their
    // source-blocked originals — rejected by the segment state
    val p2 = "ingest_spec_sh"
    dropIngestState(p2)
    try {
      import graft.pipelines.TrainingExport.DedupSimHash
      val cfg = allOff.copy(dedup = DedupSimHash(), numShards = 4)
      val s0 = TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") <= 8L), bench, cfg, p2)
      Dedup.unpersistAll()
      // the matrix bases share 2/3 of their tokens, so bases MERGE
      // within a source block (the batch-stage test pins the same):
      // survivors are a nonempty subset of the bases — docs with no
      // smaller-id partner within the radius
      val k0 = s0.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(k0.nonEmpty && k0.subsetOf((1L to 8L).toSet), s"got $k0")
      val s1 = TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") > 200L), bench, cfg, p2)
      Dedup.unpersistAll()
      assert(s1.count() == 0L, "fingerprint-drift copies lose to the segment state")
    } finally dropIngestState(p2)
  }

  test("runIngest near-dup hot-bucket cap: survivors equal the uncapped front on a template-flood fixture") {
    import spark.implicits._
    import graft.operators.Dedup
    // a boilerplate template flooding both the within-batch pass and
    // the persisted state probe: the cap (3) binds in both — NEW-side
    // hubs within the batch, corpus-side representatives at the probe
    // — and over sig-identical copies both orientations provably keep
    // the uncapped REJECTION set, so the shipped set must match the
    // uncapped front doc for doc
    val template = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    val b0 = mk((1L to 10L).map(i => (i, template)) ++ Seq(
      (20L, "twenty completely different words about weather patterns today"),
      (21L, "twenty one another unrelated document on maritime navigation charts")))
    val b1 = mk((31L to 35L).map(i => (i, template)) :+
      ((40L, "forty a genuinely new arrival discussing volcanic geology")))
    def shipped(p: String, cap: Int): Seq[Set[Long]] = {
      dropIngestState(p)
      try {
        val cfg = allOff.copy(
          dedup = DedupNearDup(maxDocsPerBand = cap), numShards = 2)
        Seq(b0, b1).map { b =>
          val s = TrainingExport.runIngest(b, bench, cfg, p)
          Dedup.unpersistAll()
          s.select("doc_id").collect().map(_.getLong(0)).toSet
        }
      } finally dropIngestState(p)
    }
    val capped = shipped("ingest_spec_hotcap", cap = 3)
    val uncapped = shipped("ingest_spec_hotun", cap = 0)
    assert(capped == uncapped,
      s"capped front must ship the uncapped set: $capped vs $uncapped")
    assert(capped(0) == Set(1L, 20L, 21L),
      s"batch 0: template hub + the two distinct docs: ${capped(0)}")
    assert(capped(1) == Set(40L),
      s"batch 1: re-shipped template copies all lose to the state: ${capped(1)}")

    // the SimHash granularity under the same flood: identical texts
    // carry one fingerprint, so the segment-bucket star (within) and
    // the corpus-side representative cap (state probe) must also
    // reproduce the uncapped front doc for doc
    def shippedSh(p: String, cap: Int): Seq[Set[Long]] = {
      dropIngestState(p)
      try {
        val cfg = allOff.copy(
          dedup = TrainingExport.DedupSimHash(maxDocsPerSegment = cap),
          numShards = 2)
        Seq(b0, b1).map { b =>
          val s = TrainingExport.runIngest(b, bench, cfg, p)
          Dedup.unpersistAll()
          s.select("doc_id").collect().map(_.getLong(0)).toSet
        }
      } finally dropIngestState(p)
    }
    val shCapped = shippedSh("ingest_spec_hotcap_sh", cap = 3)
    val shUncapped = shippedSh("ingest_spec_hotun_sh", cap = 0)
    assert(shCapped == shUncapped,
      s"SimHash capped front must ship the uncapped set: $shCapped vs $shUncapped")
    assert(shCapped(1).isEmpty || shCapped(1) == Set(40L),
      s"re-shipped template copies must lose to the segment state: ${shCapped(1)}")
  }

  test("runChunksIngest: cross-batch chunk keys fold, re-ingest ships nothing, seq continues densely") {
    import spark.implicits._
    import graft.operators.{Dedup, TextAnalysis}
    val p = "ingest_spec_chunks"
    dropIngestState(p)
    // doc-level dedup OFF so the chunk state alone does the folding
    val cfg = allOff.copy(numShards = 2)
    def mk(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "src0", "benchmark text nothing shares this")))
    val base = "one two three four five six seven eight nine ten eleven twelve"
    try {
      val b0 = mk(Seq((1L, "src0", base)))
      val s0 = TrainingExport.runChunksIngest(
        b0, bench, cfg, p, chunkTokens = 8, strideTokens = 4)
      Dedup.unpersistAll()
      val n0 = s0.count()
      assert(n0 >= 2, s"expected multiple chunks, got $n0")
      // batch 1: a doc PREFIXED by the same text — its leading chunk
      // windows are byte-identical to batch 0's and hold batch-0
      // keys; only the genuinely new tail windows ship
      val t1 = base + " alpha beta gamma delta epsilon zeta eta theta"
      val b1 = mk(Seq((2L, "src0", t1)))
      val c1 = TextAnalysis.chunkDocuments(b1, 8, 4).count()
      val s1 = TrainingExport.runChunksIngest(
        b1, bench, cfg, p, chunkTokens = 8, strideTokens = 4)
      Dedup.unpersistAll()
      val n1 = s1.count()
      assert(n1 >= 1 && n1 < c1,
        s"overlapping chunks must fold against the state: shipped $n1 of $c1")
      assert(s1.select("doc_id").distinct().collect().map(_.getLong(0)).toSeq
        == Seq(2L))
      // re-ingesting batch 1 verbatim ships nothing
      val s2 = TrainingExport.runChunksIngest(
        b1, bench, cfg, p, chunkTokens = 8, strideTokens = 4)
      Dedup.unpersistAll()
      assert(s2.count() == 0L, "re-ingest is idempotent at chunk granularity")
      // seq dense 1..n per shard across all three ingests
      val all = s0.unionByName(s1).unionByName(s2)
        .select("shard", "seq").collect().map(r => (r.getLong(0), r.getLong(1)))
      all.groupBy(_._1).foreach { case (sh, rows) =>
        val seqs = rows.map(_._2).sorted.toSeq
        assert(seqs == (1L to rows.length.toLong).toSeq,
          s"shard $sh seqs not dense: $seqs")
      }
    } finally dropIngestState(p)
  }

  test("runIngest paragraph stage: earlier arrivals claim lines, rebuilt text is what gets billed") {
    import spark.implicits._
    import graft.operators.Dedup
    val p = "ingest_spec_para"
    dropIngestState(p)
    TestSpark.resetTable(spark, s"`${p}_lines`")
    TestSpark.resetTable(spark, s"`${p}_lines_compact_tmp`")
    TestSpark.resetTable(spark, s"`${p}_lines_tombstones`")
    // doc dedup off: the line state alone does the work; budgets on
    // so the persisted consumed state exposes the billed n_chars
    val cfg = allOff.copy(
      paragraphDedup = true,
      budgets = Seq("src0" -> 100000L), numShards = 2)
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    def consumed(): Long = spark.table(s"${p}_budget").collect()
      .map(_.getLong(1)).sum
    try {
      val shared = "alpha shared line here"
      val t0 = s"$shared\nunique zero line"
      val s0 = TrainingExport.runIngest(mk(Seq((1L, t0))), bench, cfg, p)
      Dedup.unpersistAll()
      assert(s0.count() == 1L)
      // nothing seen yet: the rebuild is byte-identical, billed in full
      assert(consumed() == t0.length.toLong, s"got ${consumed()}")
      // batch 1: a DIFFERENT doc repeating the shared line — the line
      // is claimed by batch 0, so the rebuild cuts it and the budget
      // bills ONLY the fresh tail (the rebuilt-text contract,
      // observable through the persisted consumed state)
      val tail = "fresh tail line"
      val s1 = TrainingExport.runIngest(
        mk(Seq((2L, s"$shared\n$tail"))), bench, cfg, p)
      Dedup.unpersistAll()
      assert(s1.count() == 1L)
      assert(consumed() == t0.length.toLong + tail.length.toLong,
        s"rebuilt billing: got ${consumed()}")
      // re-ingest doc 2 (doc dedup off): every line is now claimed,
      // the rebuild is empty, and the budget bills nothing — the
      // batch stage's fully-cut-doc behavior, incrementally
      val s2 = TrainingExport.runIngest(
        mk(Seq((3L, s"$shared\n$tail"))), bench, cfg, p)
      Dedup.unpersistAll()
      assert(s2.count() == 1L, "a fully-cut doc still flows (batch parity)")
      assert(consumed() == t0.length.toLong + tail.length.toLong)
    } finally {
      dropIngestState(p)
      TestSpark.resetTable(spark, s"`${p}_lines`")
      TestSpark.resetTable(spark, s"`${p}_lines_compact_tmp`")
      TestSpark.resetTable(spark, s"`${p}_lines_tombstones`")
    }
  }

  test("runIngest media stage: byte and perceptual claims bind across batches, media-less docs flow") {
    import spark.implicits._
    import graft.operators.{Dedup, Multimodal}
    val p = "ingest_spec_media"
    dropIngestState(p)
    Seq("_mediafp", "_mediafp_compact_tmp", "_mediafp_tombstones",
      "_mediadh", "_mediadh_compact_tmp", "_mediadh_tombstones")
      .foreach(t => TestSpark.resetTable(spark, s"`$p$t`"))
    val cfg = allOff.copy(mediaDedup = Some(4), numShards = 2)
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    // all payloads derive from BASE id 1 (mediaIdOffset relabels the
    // media_id without changing the pixel formulas): m(2) is a byte
    // copy of m(1), m(3) a 3-pixel perturbation within Hamming 4
    def mediaFor(baseId: Long, mediaId: Long, perturb: Boolean = false) =
      Multimodal.synthesizePpmTextured(
        Seq(baseId).toDF("doc_id"),
        mediaIdOffset = mediaId - baseId, perturb = perturb)
    try {
      val s0 = TrainingExport.runIngest(
        mk(Seq((1L, "doc one entirely distinct text"))), bench, cfg, p,
        media = mediaFor(1L, 1L))
      Dedup.unpersistAll()
      assert(s0.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
      // batch 1: doc 2's media is a BYTE copy (exact state claim),
      // doc 3's a perturbed copy (perceptual state claim), doc 4 has
      // no media — only doc 4 ships
      val b1 = mk(Seq(
        (2L, "doc two other words completely"),
        (3L, "doc three more words again"),
        (4L, "doc four media less and free")))
      val m1 = mediaFor(1L, 2L)
        .unionByName(mediaFor(1L, 3L, perturb = true))
      val s1 = TrainingExport.runIngest(b1, bench, cfg, p, media = m1)
      Dedup.unpersistAll()
      assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L),
        "byte and perceptual claims must both bind against the states")
      // a later byte re-ship of the perceptually-REJECTED doc 3's
      // payload still loses: doc 3's media was an exact SURVIVOR, so
      // its fingerprint holds the byte slot (identity is permanent)
      val s2 = TrainingExport.runIngest(
        mk(Seq((5L, "doc five fresh words here"))), bench, cfg, p,
        media = mediaFor(1L, 5L, perturb = true))
      Dedup.unpersistAll()
      assert(s2.count() == 0L,
        "the perceptually-rejected media's byte identity persists")
    } finally {
      dropIngestState(p)
      Seq("_mediafp", "_mediafp_compact_tmp", "_mediafp_tombstones",
        "_mediadh", "_mediadh_compact_tmp", "_mediadh_tombstones")
        .foreach(t => TestSpark.resetTable(spark, s"`$p$t`"))
    }
  }

  test("runIngest media hot-bucket cap: survivors equal the uncapped front on a re-encoded asset flood") {
    import spark.implicits._
    import graft.operators.{Dedup, Multimodal}
    // the asset-farm flood the byte pass CANNOT stop: re-encoded
    // copies (same pixels, different header comment) are
    // byte-distinct, so every one reaches the perceptual state and
    // the dHash bucket accumulates — exactly where
    // mediaMaxDocsPerSegment binds; over hash-identical members the
    // capped front must ship the uncapped survivor set doc for doc
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    def mediaFor(baseId: Long, mediaId: Long) =
      Multimodal.synthesizePpmTextured(
        Seq(baseId).toDF("doc_id"), mediaIdOffset = mediaId - baseId)
    // byte-distinct, pixel-identical: rewrite the header comment only
    def reencoded(mediaId: Long, v: Int) = mediaFor(1L, mediaId)
      .withColumn("media", expr(
        s"CAST(replace(CAST(media AS STRING), '# doc 1', '# doc 1 v$v') AS BINARY)"))
    val b0docs = mk((1L to 5L).map(i => (i, s"doc $i words $i")) :+
      ((6L, "doc six carries its own distinct payload")))
    val b0media = (1 to 5).map(i => reencoded(i.toLong, i))
      .reduce(_ unionByName _)
      .unionByName(mediaFor(6L, 6L))
    val b1docs = mk(Seq(
      (11L, "doc eleven reships the asset"),
      (12L, "doc twelve reships it too"),
      (13L, "doc thirteen has no media at all")))
    val b1media = reencoded(11L, 11).unionByName(reencoded(12L, 12))
    def shipped(p: String, cap: Int): Seq[Set[Long]] = {
      dropIngestState(p)
      Seq("_mediafp", "_mediafp_compact_tmp", "_mediafp_tombstones",
        "_mediadh", "_mediadh_compact_tmp", "_mediadh_tombstones")
        .foreach(t => TestSpark.resetTable(spark, s"`$p$t`"))
      try {
        val cfg = allOff.copy(
          mediaDedup = Some(4), mediaMaxDocsPerSegment = cap, numShards = 2)
        Seq(b0docs -> b0media, b1docs -> b1media).map { case (b, m) =>
          val s = TrainingExport.runIngest(b, bench, cfg, p, media = m)
          Dedup.unpersistAll()
          s.select("doc_id").collect().map(_.getLong(0)).toSet
        }
      } finally {
        dropIngestState(p)
        Seq("_mediafp", "_mediafp_compact_tmp", "_mediafp_tombstones",
          "_mediadh", "_mediadh_compact_tmp", "_mediadh_tombstones")
          .foreach(t => TestSpark.resetTable(spark, s"`$p$t`"))
      }
    }
    val capped = shipped("ingest_spec_mediacap", cap = 3)
    val uncapped = shipped("ingest_spec_mediaun", cap = 0)
    assert(capped == uncapped,
      s"capped media front must ship the uncapped set: $capped vs $uncapped")
    assert(capped(0) == Set(1L, 6L),
      s"batch 0: flood hub + the distinct-payload doc: ${capped(0)}")
    assert(capped(1) == Set(13L),
      s"batch 1: re-encoded re-ships lose to the dHash state: ${capped(1)}")
  }

  test("runIngest semantic stage: arrival claims via batch membership, embedding-less docs flow, takedown remedy works") {
    import spark.implicits._
    import graft.operators.{Dedup, SimilaritySearch}
    val p = "ingest_spec_sem"
    dropIngestState(p)
    def dropIdx(): Unit = {
      val pth = new org.apache.hadoop.fs.Path(
        TrainingExport.semanticIndexDir(spark, p))
      pth.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pth, true)
    }
    dropIdx()
    val cfg = allOff.copy(semanticDedup = true, numShards = 2)
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    // a deterministic 4-dim embedding per id: ids 100 and 1 share a
    // direction (cosine 1 up to scale); id 2 is orthogonal
    def emb(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")
    val vA = Seq(1f, 2f, 3f, 4f)
    val vB = Seq(4f, -3f, 2f, -1f)
    try {
      // batch 0: the LARGER id arrives first and claims the semantic
      // slot (vec 100 seeds the index/centroids; vec_id % 50 == 0)
      val s0 = TrainingExport.runIngest(
        mk(Seq((100L, "doc hundred words here"))), bench, cfg, p,
        embeddings = emb(Seq((100L, vA))))
      Dedup.unpersistAll()
      assert(s0.count() == 1L)
      // batch 1: doc 1's vector is a scaled copy of doc 100's —
      // rejected by the EARLIER arrival whatever the ids; doc 2 is
      // orthogonal and ships; doc 3 has NO embedding row and flows
      val s1 = TrainingExport.runIngest(
        mk(Seq(
          (1L, "doc one other words"),
          (2L, "doc two unrelated words"),
          (3L, "doc three no embedding"))), bench, cfg, p,
        embeddings = emb(Seq(
          (1L, vA.map(_ * 1.001f)),
          (2L, vB))))
      Dedup.unpersistAll()
      val k1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(k1 == Set(2L, 3L),
        s"earlier arrival claims, embedding-less flows: $k1")
      // the crash/takedown remedy: delete doc 1's vector from the
      // written index and re-ingest it — it ships (nothing claims it;
      // doc 100's vector was deleted too in this takedown)
      SimilaritySearch.deleteFromWrittenIndex(
        spark, TrainingExport.semanticIndexDir(spark, p),
        Seq(100L, 1L).toDF("vec_id"))
      val s2 = TrainingExport.runIngest(
        mk(Seq((10L, "doc ten fresh words"))), bench, cfg, p,
        embeddings = emb(Seq((10L, vA.map(_ * 1.002f)))))
      Dedup.unpersistAll()
      assert(s2.count() == 1L,
        "after index takedown the semantic slot is claimable again")
      // the state is maintainable IN PLACE with the written-index
      // verbs: a re-cluster (retrain centroids from the live corpus,
      // marker-committed swap) between ingests must not break the
      // stage — a later scaled copy of an indexed vector still loses
      SimilaritySearch.reclusterWrittenIndex(
        spark, TrainingExport.semanticIndexDir(spark, p), centroidMod = 1)
      val s3 = TrainingExport.runIngest(
        mk(Seq((11L, "doc eleven still more words"))), bench, cfg, p,
        embeddings = emb(Seq((11L, vA.map(_ * 1.003f)))))
      Dedup.unpersistAll()
      assert(s3.count() == 0L,
        "the stage keeps rejecting against the re-clustered state")
    } finally {
      dropIngestState(p)
      dropIdx()
    }
  }

  test("runIngest semantic stage on the CODES-backed state: claims bind through reconstructions, layout flips fail fast") {
    import spark.implicits._
    import graft.operators.Dedup
    val p = "ingest_spec_sempq"
    dropIngestState(p)
    val idxDir = TrainingExport.semanticIndexDir(spark, p)
    def dropIdx(): Unit = {
      val pth = new org.apache.hadoop.fs.Path(idxDir)
      pth.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pth, true)
    }
    dropIdx()
    val cfg = allOff.copy(semanticDedup = true, semanticPq = true, numShards = 2)
    def mk(ids: Seq[Long]) =
      ids.map(id => (id, "src0", s"doc $id body"))
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq(999999L))
    // 64-dim vectors each supported in its OWN m=16 subspace (dim
    // i*4): with seedMod 1 every batch-0 subvector seeds its own
    // codebook entry, so batch-0 vectors reconstruct EXACTLY and the
    // claim binds at the float threshold, while a direction the
    // codebooks never saw reconstructs to zero (cosine NaN → no
    // pair) instead of ALIASING onto a seen one — the collapse a
    // shared-subspace fixture measured first
    def basis(i: Int): Seq[Float] =
      Seq.tabulate(64)(j => if (j == i * 4) 4f else 0f)
    def emb(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
    try {
      val s0 = TrainingExport.runIngest(
        mk(Seq(2L, 4L)), bench, cfg, p,
        embeddings = emb(Seq((2L, basis(0)), (4L, basis(1)))),
        semCentroidMod = 1, semPqSeedMod = 1)
      Dedup.unpersistAll()
      assert(s0.count() == 2L)
      // the persisted state carries NO float corpus vectors — codes +
      // codebooks + coarse assignments only
      val assignCols = spark.read.parquet(s"$idxDir/assignments").columns.toSet
      assert(!assignCols.contains("cand_emb"),
        s"codes-backed state must not store embeddings: $assignCols")
      assert(spark.read.parquet(s"$idxDir/codes").count() == 2L)
      // batch 1: a scaled copy of doc 2's vector loses to the EARLIER
      // arrival through its reconstruction; an orthogonal doc ships
      // this spec pins the claim semantics under FROZEN codebooks —
      // and the fixture's seedMod-1 batch-0 fit has a literally ZERO
      // quantization-error baseline, so basis(2)'s unseen direction
      // would (correctly) read as an infinite error ratio and trip
      // the refit arm; the documented opt-out pins the geometry
      val s1 = TrainingExport.runIngest(
        mk(Seq(1L, 3L)), bench, cfg, p,
        embeddings = emb(Seq(
          (1L, basis(0).map(_ * 1.001f)), (3L, basis(2)))),
        semCentroidMod = 1, semPqSeedMod = 1,
        semRefitErrFactor = Double.PositiveInfinity,
        onSemanticMaintenance = a => assert(
          a == graft.operators.SimilaritySearch.NoMaintenance, s"got $a"))
      Dedup.unpersistAll()
      assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L),
        "the reconstructed claim must reject the scaled copy")
      // flipping semanticPq against the existing codes layout names
      // the mismatch instead of dying inside a probe
      val e = intercept[IllegalArgumentException] {
        TrainingExport.runIngest(
          mk(Seq(10L)), bench, cfg.copy(semanticPq = false), p,
          embeddings = emb(Seq((10L, basis(3)))), semCentroidMod = 1)
      }
      assert(e.getMessage.contains("codes-backed"), e.getMessage)
    } finally {
      dropIngestState(p)
      dropIdx()
    }
  }

  test("runIngest semantic stage: a drifted ingest trips the re-cluster inside the stage") {
    import spark.implicits._
    import graft.operators.{Dedup, SimilaritySearch}
    val p = "ingest_spec_semdrift"
    dropIngestState(p)
    val idxDir = TrainingExport.semanticIndexDir(spark, p)
    def dropIdx(): Unit = {
      val pth = new org.apache.hadoop.fs.Path(idxDir)
      pth.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pth, true)
    }
    dropIdx()
    val cfg = allOff.copy(semanticDedup = true, numShards = 2)
    def mk(ids: Seq[Long]) =
      ids.map(id => (id, "src0", s"doc $id body"))
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq(999999L))
    def basis(i: Int): Seq[Float] =
      Seq.tabulate(8)(j => if (j == i) 1f else 0f)
    // twelve well-separated directions (mutual cosine ≤ ~0.71, far
    // from the 0.995 dedup threshold): the 8-dim basis plus rotated
    // pair vectors — big enough that batch 2's single append stays
    // below the 5% materiality floor and cannot re-trip the trigger
    def spread(i: Int): Seq[Float] =
      if (i < 6) basis(i)
      else Seq.tabulate(8)(j =>
        if (j == i - 6 || j == (i - 5) % 6) 0.7f else 0f)
    try {
      // batch 0: twelve directions seed twelve lists (mod 1 = every
      // vector a centroid)
      TrainingExport.runIngest(
        mk(1L to 12L), bench, cfg, p,
        embeddings = (1L to 12L).map(i => (i, spread(i.toInt - 1)))
          .toDF("vec_id", "embedding"),
        semCentroidMod = 1)
      Dedup.unpersistAll()
      assert(spark.read.parquet(s"$idxDir/centroids").count() == 12L)
      // batch 1 DRIFTS: twelve vectors in a direction the build never
      // shaped, all nearest one list — appended share 12/24, skew 12×
      // uniform → the stage's closed-loop append re-clusters
      // AUTOMATICALLY
      val driftVecs = (21L to 32L).map(i =>
        (i, Seq(0.9f, 0.5f, i / 1000f, 0f, 0f, 0f, 0f, 0f)))
      TrainingExport.runIngest(
        mk(21L to 32L), bench, cfg, p,
        embeddings = driftVecs.toDF("vec_id", "embedding"),
        semCentroidMod = 1)
      Dedup.unpersistAll()
      // the re-cluster retrained from the 24 live vectors (mod 1) and
      // stamped a fresh baseline — the evidence window reset
      assert(spark.read.parquet(s"$idxDir/centroids").count() == 24L,
        "the drifted append must have re-clustered inside the stage")
      val after = SimilaritySearch.driftReport(spark, idxDir)
      assert(after.appendedRows == 0L && !after.recluster, s"$after")
      // the re-clustered state still claims: a later scaled copy of a
      // drifted vector loses to the earlier arrival
      val s2 = TrainingExport.runIngest(
        mk(Seq(100L)), bench, cfg, p,
        embeddings = Seq(
          (100L, driftVecs.head._2.map(_ * 1.001f)))
          .toDF("vec_id", "embedding"),
        semCentroidMod = 1)
      Dedup.unpersistAll()
      assert(s2.count() == 0L,
        "the stage keeps rejecting against the auto-re-clustered state")
    } finally {
      dropIngestState(p)
      dropIdx()
    }
  }

  test("runIngest span stage: cross-batch spans cut from LATER ARRIVALS whatever the ids, rebuilt text billed") {
    import spark.implicits._
    import graft.operators.Dedup
    val p = "ingest_spec_span"
    dropIngestState(p)
    Seq(s"${p}_shingles", s"${p}_shingles_compact_tmp", s"${p}_shingles_tombstones")
      .foreach(t => TestSpark.resetTable(spark, s"`$t`"))
    val cfg = allOff.copy(
      spanDedup = Some(10), budgets = Seq("src0" -> 100000L), numShards = 2)
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    def consumed(): Long = spark.table(s"${p}_budget").collect()
      .map(_.getLong(1)).sum
    val span1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val span2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
    try {
      // batch 0: doc 2 carries span1 — nothing seen, billed in full
      val t2 = s"$span1 tail two extra words"
      TrainingExport.runIngest(mk(Seq((2L, t2))), bench, cfg, p)
      Dedup.unpersistAll()
      assert(consumed() == t2.length.toLong, s"got ${consumed()}")
      // batch 1: doc 1 repeats span1 — the state claimed it in batch
      // 0, so the SMALLER id is cut (arrival order, not id order);
      // docs 5 and 6 share span2 within the batch — the larger id
      // loses, the one-shot orientation
      val head1 = "head one words"
      val t5 = s"$span2 five tail"
      val s1 = TrainingExport.runIngest(
        mk(Seq(
          (1L, s"$head1 $span1"),
          (5L, t5),
          (6L, s"six head $span2"))), bench, cfg, p)
      Dedup.unpersistAll()
      assert(s1.count() == 3L, "span surgery rewrites, never drops docs")
      assert(consumed() ==
        t2.length.toLong + head1.length.toLong + t5.length.toLong +
          "six head".length.toLong,
        s"rebuilt billing: got ${consumed()}")
      // the state accumulated every staged doc's PRE-surgery shingles
      // (seen-corpus policy): 4 docs' worth of positional rows
      assert(spark.table(s"${p}_shingles")
        .select("doc_id").distinct().count() == 4L)
    } finally {
      dropIngestState(p)
      Seq(s"${p}_shingles", s"${p}_shingles_compact_tmp", s"${p}_shingles_tombstones")
        .foreach(t => TestSpark.resetTable(spark, s"`$t`"))
    }
  }

  test("runIngest bills WordPiece tokens when asked: consumed state in token currency, cross-batch continuation") {
    import spark.implicits._
    import graft.operators.{Dedup, TextAnalysis}
    val p = "ingest_spec_tok"
    dropIngestState(p)
    def mk(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, "src0", t) }
        .toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = mk(Seq((7777L, "benchmark text nothing shares this")))
    def tokensOf(rows: Seq[(Long, String)]): Long = TextAnalysis
      .wordpieceStats(mk(rows)).agg(sum("n_tokens")).head().getLong(0)
    val b0 = Seq((1L, "the quick brown fox jumps over the lazy dog"))
    val b1 = Seq((2L, "an entirely different second document body"))
    // budget sized between batch 0's and batch 0+1's token totals so
    // the SECOND batch is what the remaining-budget continuation cuts
    val t0 = tokensOf(b0)
    val cfg = allOff.copy(
      budgets = Seq("src0" -> (t0 + 1L)),
      budgetCurrency = TrainingExport.BudgetWordPieceTokens(), numShards = 2)
    try {
      val s0 = TrainingExport.runIngest(mk(b0), bench, cfg, p)
      Dedup.unpersistAll()
      assert(s0.count() == 1L)
      // the consumed state bills TOKENS, not chars: the two differ on
      // this text, so a chars-billed state would fail this equality
      val spent0 = spark.table(s"${p}_budget").collect().map(_.getLong(1)).sum
      assert(spent0 == t0 && spent0 != b0.head._2.length.toLong,
        s"token billing: spent $spent0, tokens $t0, chars ${b0.head._2.length}")
      // batch 1: only 1 token of budget remains — the doc cannot fit
      val s1 = TrainingExport.runIngest(mk(b1), bench, cfg, p)
      Dedup.unpersistAll()
      assert(s1.count() == 0L,
        "the remaining TOKEN budget must cut the second batch")
    } finally dropIngestState(p)
  }

  test("runIngest fail-fasts: chunk-front currency, numShards drift") {
    import graft.operators.Dedup
    val bench = matrixDocs.filter(col("doc_id") === 1L)
    val e2 = intercept[IllegalArgumentException] {
      TrainingExport.runChunksIngest(
        matrixDocs, bench,
        allOff.copy(
          budgets = Seq("src0" -> 100L),
          budgetCurrency = TrainingExport.BudgetWordPieceTokens()),
        "ingest_spec_ff")
    }
    assert(e2.getMessage.contains("CHUNK TOKENS"), e2.getMessage)
    val p = "ingest_spec_shards"
    dropIngestState(p)
    try {
      TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") <= 4L), bench,
        allOff.copy(numShards = 4), p)
      Dedup.unpersistAll()
      val e3 = intercept[IllegalArgumentException] {
        TrainingExport.runIngest(
          matrixDocs.filter(col("doc_id") > 4L), bench,
          allOff.copy(numShards = 8), p)
      }
      assert(e3.getMessage.contains("numShards"), e3.getMessage)
    } finally dropIngestState(p)
    // a cfg.dedup switch against an existing state names the mismatch
    // instead of dying inside a probe join (the legacy-layout lesson)
    val p2 = "ingest_spec_layout"
    dropIngestState(p2)
    try {
      TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") <= 4L), bench,
        allOff.copy(dedup = DedupExact), p2)
      Dedup.unpersistAll()
      val e4 = intercept[IllegalArgumentException] {
        TrainingExport.runIngest(
          matrixDocs.filter(col("doc_id") > 4L), bench,
          allOff.copy(dedup = DedupNearDup()), p2)
      }
      assert(e4.getMessage.contains("different dedup stage"), e4.getMessage)
    } finally dropIngestState(p2)
  }

  test("budget ledger records its currency: a mid-loop flip fails fast both ways, fronts cannot share a prefix") {
    import graft.operators.Dedup
    val bench = matrixDocs.filter(col("doc_id") === 1L)
    // chars -> tokens flips fail; the chunk front (its own unit,
    // chunk_tokens) is refused on the same ledger too
    val p = "ingest_spec_cur1"
    dropIngestState(p)
    try {
      TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") <= 4L), bench,
        allOff.copy(budgets = Seq("src0" -> 100000L)), p)
      Dedup.unpersistAll()
      assert(spark.table(s"${p}_budget").select("currency").distinct()
        .collect().map(_.getString(0)).toSeq == Seq("chars"))
      val e1 = intercept[IllegalArgumentException] {
        TrainingExport.runIngest(
          matrixDocs.filter(col("doc_id") > 4L), bench,
          allOff.copy(
            budgets = Seq("src0" -> 100000L),
            budgetCurrency = TrainingExport.BudgetWordPieceTokens()), p)
      }
      assert(e1.getMessage.contains("denominated"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        TrainingExport.runChunksIngest(
          matrixDocs.filter(col("doc_id") > 4L), bench,
          allOff.copy(budgets = Seq("src0" -> 100000L)), p)
      }
      assert(e2.getMessage.contains("denominated"), e2.getMessage)
    } finally dropIngestState(p)
    // tokens -> chars flips fail; the SAME currency keeps flowing
    val p2 = "ingest_spec_cur2"
    dropIngestState(p2)
    try {
      val tokCfg = allOff.copy(
        budgets = Seq("src0" -> 100000L),
        budgetCurrency = TrainingExport.BudgetWordPieceTokens())
      TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") <= 4L), bench, tokCfg, p2)
      Dedup.unpersistAll()
      val e3 = intercept[IllegalArgumentException] {
        TrainingExport.runIngest(
          matrixDocs.filter(col("doc_id") > 4L), bench,
          allOff.copy(budgets = Seq("src0" -> 100000L)), p2)
      }
      assert(e3.getMessage.contains("denominated"), e3.getMessage)
      TrainingExport.runIngest(
        matrixDocs.filter(col("doc_id") > 4L), bench, tokCfg, p2)
      Dedup.unpersistAll()
      assert(spark.table(s"${p2}_budget").select("currency").distinct()
        .collect().map(_.getString(0)).toSeq == Seq("wordpiece"))
    } finally dropIngestState(p2)
  }

  test("hashedLinearFit: broadcast-weights epoch path is bit-identical to the literal path (r17 literal-array ceiling)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = (1L to 60L).map { i =>
      val pos = i % 2 == 0
      val marker = if (pos) "good good excellent" else "bad awful dreadful"
      (i, s"common filler words here $marker tail$i extra${i % 7}", pos)
    }.toDF("doc_id", "text", "label")
    // literalMaxBuckets = 1 forces the JOIN path at any real B; the
    // default keeps the literal path at B = 512 — same corpus, same
    // epochs, the two margin plans must train the same model
    val b = 512
    val viaLiteral = TextAnalysis.hashedLinearFit(docs, b, epochs = 4)
    val viaJoin = TextAnalysis.hashedLinearFit(
      docs, b, epochs = 4, literalMaxBuckets = 1)
    assert(viaLiteral.orderBy("bucket").collect().toSeq ==
      viaJoin.orderBy("bucket").collect().toSeq,
      "join-path fit must be bit-identical to the literal path")
    // above the default threshold the fit takes the join path on its
    // own — cross-checked against a literal-forced twin at the same B
    val big = 8192
    val viaDefault = TextAnalysis.hashedLinearFit(docs, big, epochs = 2)
    val viaForcedLiteral = TextAnalysis.hashedLinearFit(
      docs, big, epochs = 2, literalMaxBuckets = big)
    assert(viaDefault.orderBy("bucket").collect().toSeq ==
      viaForcedLiteral.orderBy("bucket").collect().toSeq)
    graft.operators.Dedup.unpersistAll()
  }
}
