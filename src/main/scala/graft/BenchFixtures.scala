package graft

/** Shared scratch-dir helper for the bench harness mains.
  *
  * ScaleBench / SkewBench stage amplified parquet fixtures up to 64×
  * sf0.1 in java.io.tmpdir; without cleanup, repeated runs leak
  * multi-GB scratch data. Mirrors the shutdown-hook pattern of
  * `ExtensionQueries.scratchTable` (a hook, not a finally block,
  * because the dirs are read lazily by queries until the JVM exits).
  */
object BenchFixtures {

  /** The ONE bench SparkSession recipe — shared so a config change
    * cannot silently diverge across the bench mains. `skewJoin` is
    * the only per-main extra in use.
    */
  def benchSession(cpus: String, skewJoin: Boolean = false): org.apache.spark.sql.SparkSession = {
    val b = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", ScratchWarehouse.dir)
    val spark =
      (if (skewJoin) b.config("spark.sql.adaptive.skewJoin.enabled", "true") else b)
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Best-of-`iters` wall seconds — the shared bench timing helper. */
  def minTime[A](iters: Int)(f: => A): Double =
    (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.min

  /** Mutated near-duplicate amplification, staged to parquet and read
    * back (the DedupScaleBench fixture, shared with ShingleStateBench):
    * replica r of a doc gets every 3rd token replaced by a marker
    * unique to its (even, odd) PAIR, so replicas of different pairs
    * share no shingles — candidate volume stays LINEAR in `mult`
    * instead of measuring verbatim-copy quadratic blowup.
    */
  def mutatedAmplifiedDocs(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String, mult: Int, cpus: Int, fixDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.documents(spark, sfDir)
      .crossJoin(spark.range(mult).toDF("r"))
      .withColumn("e", col("r") - pmod(col("r"), lit(2)))
      .select(
        (col("doc_id") * mult + col("r")).as("doc_id"),
        col("source"),
        concat(
          expr("array_join(transform(split(text, ' '), (t, i) -> " +
            "IF(i % 3 = 0, concat('m', CAST(e AS STRING)), t)), ' ')"),
          when(pmod(col("r"), lit(2)) === 1, lit(" zz")).otherwise(lit("")))
          .as("text"),
        col("n_chars"))
      .repartition(cpus)
      .write.mode("overwrite").parquet(s"$fixDir/docs_$mult")
    spark.read.parquet(s"$fixDir/docs_$mult")
  }

  /** Create a temp dir whose tree is recursively deleted at JVM
    * shutdown.
    */
  def cleanedTempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toAbsolutePath
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      } catch { case _: Throwable => () }))
    p.toString
  }
}
