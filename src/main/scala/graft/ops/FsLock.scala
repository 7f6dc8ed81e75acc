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

  /** Holder identity stamped INTO the lock file at acquisition — what
    * the operator deciding whether to break a lock reads to find (and
    * confirm dead) its holder. Empty lock files gave them nothing.
    */
  def holderStamp(op: String): String =
    s"op=$op pid=${ProcessHandle.current().pid()} host=" +
      s"${java.net.InetAddress.getLocalHost.getHostName} " +
      s"acquired=${java.time.Instant.now()}"

  /** Try to acquire `lock` via exclusive create, stamping `info` into
    * the file. Returns true iff this caller created the file (and
    * therefore owns the lock). The create is the atomic claim; the
    * content write rides the same call (CREATE_NEW locally, the
    * exclusive create's own stream on HDFS), so a visible lock file
    * always carries its holder line.
    */
  def tryAcquire(fs: FileSystem, lock: Path, info: String = ""): Boolean =
    if (fs.isInstanceOf[LocalFileSystem] ||
        fs.isInstanceOf[RawLocalFileSystem]) {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(lock.toUri.getPath),
          info.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(info.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case e: java.io.IOException =>
          if (fs.exists(lock)) false else throw e
      }
    }

  /** The holder line of a held lock, for the lock-held error message.
    * None if the lock vanished (holder released between the failed
    * acquire and this read) or predates holder stamping.
    */
  def holderInfo(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val bytes = new Array[Byte](4096)
        val n = in.read(bytes)
        if (n <= 0) None
        else Some(new String(bytes, 0, n,
          java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Release a held (or orphaned) lock. Idempotent. */
  def release(fs: FileSystem, lock: Path): Unit =
    fs.delete(lock, false)
}
