package graft

/** Per-JVM throwaway warehouse for the harness mains (Verify, Bench,
  * Smoke, the bench family).
  *
  * Every managed table these processes create — q_ddl_lifecycle,
  * q_diff_ctas, the incremental-ingest band tables, CompactionBench's
  * fixtures — is scratch state: written, probed, and dropped within
  * the run. The default cwd-relative `spark-warehouse/` puts those
  * writes on ext4, where each bucketed append pays per-file fsync
  * latency that measures as query cost but is pure harness I/O (the
  * same reasoning as StreamRunner's /dev/shm checkpoints, r8). Point
  * the warehouse at tmpfs when available; a real deployment sets
  * `spark.sql.warehouse.dir` to durable storage — this helper is for
  * the run-and-discard harness only.
  *
  * The directory is per-JVM (temp-dir nonce) so concurrent harness
  * processes cannot collide on catalog paths, and reclaimed by a
  * shutdown hook so repeated runs don't accumulate in tmpfs.
  */
object ScratchWarehouse {
  lazy val dir: String = {
    val p = TmpfsScratch.createTempDir("graft_warehouse_")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try TmpfsScratch.deleteRecursively(p)
      catch { case _: Throwable => () }))
    p.toString
  }
}
