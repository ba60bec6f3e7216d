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
