package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single-winner publish primitive behind every snapshot commit:
  * atomically put `tmp`'s content at `dest`, returning false when `dest`
  * is already occupied (a concurrent commit won). EVERYTHING else in the
  * commit protocol — optimistic retry, conflict detection, idempotent txn
  * stamps — is built on this one primitive, so porting graft to a store
  * with different atomicity guarantees means swapping this trait's
  * implementation and nothing else. */
trait CommitLock {
  def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean
}

/** Filesystem-native publish: POSIX link(2) for file:// (atomic,
  * fails EEXIST — Hadoop's LocalFileSystem rename-onto-existing silently
  * OVERWRITES, so bare rename is not single-winner there), plain rename
  * elsewhere (HDFS rename-to-existing fails correctly). */
object LinkCommitLock extends CommitLock {
  override def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val scheme = Option(fs.makeQualified(tmp).toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      val t = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
      val d = java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath)
      try {
        java.nio.file.Files.createLink(d, t)
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else fs.rename(tmp, dest)
  }
}

/** Lock-service publish for stores with NO atomic rename-or-fail
  * primitive — the S3A shape, where Iceberg serializes commits through an
  * external lock/catalog service (DynamoDB, Glue, a JDBC catalog). The
  * protocol under the held lock is plain check-exists + rename, which is
  * safe precisely because the lock serializes contenders. The lock table
  * here is process-global (a stand-in with the same acquire/release
  * contract a real service exposes); a production port implements
  * acquire/release against the external service and keeps everything
  * else. */
class LockServiceCommitLock(acquireTimeoutMs: Long = 30000) extends CommitLock {
  override def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val key = fs.makeQualified(dest).toString
    if (!LockServiceCommitLock.acquire(key, acquireTimeoutMs))
      throw new IllegalStateException(s"commit lock timeout on $key")
    try {
      if (fs.exists(dest)) false
      else fs.rename(tmp, dest)
    } finally LockServiceCommitLock.release(key)
  }
}

object LockServiceCommitLock {
  private val locks = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def acquire(key: String, timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!locks.add(key)) {
      if (System.nanoTime() > deadline) return false
      Thread.sleep(1)
    }
    true
  }

  private def release(key: String): Unit = locks.remove(key)
}
