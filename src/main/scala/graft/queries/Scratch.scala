package graft.queries

/** JVM-exit cleanup for query scratch directories: scratch tables are
  * created per run with fresh UUIDs and must outlive the returned
  * DataFrame's lazy reads, so they can only be removed at shutdown —
  * without this, repeated bench/verify runs accumulate orphaned parquet in
  * tmpdir indefinitely. */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Scratch root: prefer tmpfs (/dev/shm) over the disk-backed default
    * tmpdir — scratch tables are ephemeral by definition, and the
    * lifecycle queries' round-over-round numbers otherwise measure ext4
    * page-cache weather (observed ±2× swings) instead of plan cost.
    * `SPARK_GRAFT_SCRATCH_DIR` overrides; tmpfs is only taken with
    * generous free headroom, because "spill" to tmpfs consumes RAM — on a
    * tight host the working set must degrade to disk, not OOM. */
  val baseDir: String = sys.env.get("SPARK_GRAFT_SCRATCH_DIR")
    .filter(_.nonEmpty).getOrElse {
      val shm = new java.io.File("/dev/shm")
      val minFree = 16L * 1024 * 1024 * 1024
      if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= minFree)
        "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      try deleteRecursively(new java.io.File(d)) catch { case _: Throwable => }
    }
  }))

  def deleteOnExit(dir: String): Unit = dirs.add(dir)

  /** Fresh per-run scratch directory under [[baseDir]], registered for
    * shutdown cleanup — THE way query code allocates scratch space (one
    * definition; per-file copies of this helper are where a future
    * cleanup fix would get applied to only one site). */
  def dir(name: String): String = {
    val d = s"$baseDir/graft-q-$name-" + java.util.UUID.randomUUID()
    deleteOnExit(d)
    d
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
