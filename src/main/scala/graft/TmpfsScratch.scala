package graft

import java.nio.file.{Files, Path, Paths}

/** The one definition of "throwaway scratch space, in RAM when the
  * box has it": /dev/shm when present and writable (tmpfs — no
  * per-file fsync latency for state that never outlives the run),
  * else the JVM temp dir. Shared by the streaming checkpoint bridges
  * and the harness warehouse so the selection rule and the recursive
  * cleanup (which must close its walk stream — a leaked handle per
  * call adds up across a 126-query bench) cannot drift apart.
  */
object TmpfsScratch {

  /** tmpfs root when available, else java.io.tmpdir. */
  def root(): Path = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
    else Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Fresh per-call scratch directory under [[root]]. */
  def createTempDir(prefix: String): Path = Files.createTempDirectory(root(), prefix)

  /** Depth-first recursive delete; closes the walk stream. Missing
    * paths are a no-op.
    */
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }
}
