package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** ONE home for the STAGE → FENCE → RENAME tree-commit discipline
  * ([[AnnIndex]]'s generation/centroid/tombstone writes,
  * [[Versioning.publish]]'s version tree — two protocols, one
  * implementation, so a fix to the commit sequence lands once).
  *
  * Why staging exists: [[FsLock.Fence]] can only be checked from the
  * driver, and a distributed write job runs minutes — fencing at the
  * job's START would leave a reclaimed-but-still-running writer (a
  * driver stalled past the lease TTL; a dead app's executors still
  * flushing tasks) free to land files in the live tree. So every job
  * writes into a dot-hidden, token-unique staging dir that no reader
  * and no successor writer shares — a fenced-out twin's late job
  * commit strands in its OWN stage — and only the fence-guarded
  * RENAME (a metadata op, milliseconds) touches the tree.
  */
private[graft] object StagedCommit {

  def stageToken(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Purge leftover staging dirs under `parent` whose name starts
    * with `prefix` — dead or fenced-out writers leave their (hidden,
    * reader-invisible) stages behind; the next writer of the same
    * target clears them before staging its own. MUST be called with
    * the fence already verified: purging is itself a mutation of
    * shared state, and a fenced-out zombie resuming here must throw
    * before it can delete the live holder's in-flight stage.
    */
  def purgeStages(fs: FileSystem, parent: String, prefix: String,
      fence: FsLock.Fence): Unit = {
    fence.verify()
    val p = new Path(parent)
    if (fs.exists(p))
      fs.listStatus(p).filter(_.getPath.getName.startsWith(prefix))
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Fence, then swap `stage` into `target`: the commit instant. A
    * crash before the rename leaves the target untouched; between the
    * delete and the rename leaves it absent — the "visibly uncovered,
    * replay rewrites" state the owning protocols' crash contracts
    * already cover.
    */
  def commitStaged(fs: FileSystem, fence: FsLock.Fence,
      stage: String, target: String): Unit = {
    fence.verify()
    val t = new Path(target)
    if (fs.exists(t)) fs.delete(t, true)
    val parent = t.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    if (!fs.rename(new Path(stage), t))
      throw new IllegalStateException(
        s"commitStaged: rename $stage -> $target failed")
  }
}
