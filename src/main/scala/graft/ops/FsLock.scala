package graft.ops

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}

/** ONE home for the exclusive-create lock-file primitive the
  * single-writer protocols ride ([[Versioning.publish]]'s publish
  * lock, [[AnnIndex]]'s index-writer lock): a lock is an
  * exclusively-created file — server-side `create(overwrite=false)`
  * on HDFS, nio O_CREAT|O_EXCL on local filesystems (Hadoop's local
  * `create(false)` is a check-then-create TOCTOU, the
  * `graft.engine.Schedule.createExclusive` lesson). The guarantee is
  * HDFS/posix-only; object stores lack server-side exclusive create
  * (see [[Versioning]]'s scheme guard for the protocol that refuses
  * them outright).
  *
  * A crashed holder takes its lock to the grave BY DESIGN — nothing
  * else can distinguish crashed from slow; the owning protocol
  * exposes a break operation for the operator who has confirmed the
  * holder is dead.
  */
private[graft] object FsLock {

  /** Try to acquire `lock` via exclusive create. Returns true iff this
    * caller created the file (and therefore owns the lock).
    */
  def tryAcquire(fs: FileSystem, lock: Path): Boolean =
    if (fs.isInstanceOf[LocalFileSystem] ||
        fs.isInstanceOf[RawLocalFileSystem]) {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(lock.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try { fs.create(lock, false).close(); true }
      catch {
        case e: java.io.IOException =>
          if (fs.exists(lock)) false else throw e
      }
    }

  /** Release a held (or orphaned) lock. Idempotent. */
  def release(fs: FileSystem, lock: Path): Unit =
    fs.delete(lock, false)
}
