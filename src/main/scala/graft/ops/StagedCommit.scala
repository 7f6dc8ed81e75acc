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

  /** Fence, then swap `stage` into `target`: the commit instant. The
    * old target is renamed ASIDE to a stage-prefixed tombstone (a
    * metadata op), not deleted — so a rename failure, or a fence
    * failure caught between the two renames, puts the old tree BACK
    * and the target stays old-or-new; only the rename gap itself
    * (metadata-op ms) leaves it absent. A crash inside that gap
    * leaves the old tree in the tombstone — reader-invisible
    * (dot-hidden, stage-prefixed) and swept by the owning protocol's
    * [[purgeStages]] before the replay rewrites, the same "visibly
    * uncovered, replay rewrites" contract as before. The second
    * fence narrows the two-writer window to the rename alone
    * (r14 ADVICE): a wrong break landing during the old tree's
    * rename-aside now aborts with the old tree restored instead of
    * leaving the target absent.
    */
  def commitStaged(fs: FileSystem, fence: FsLock.Fence,
      stage: String, target: String): Unit = {
    fence.verify()
    val t = new Path(target)
    val parent = t.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    val tomb = new Path(stage + ".tomb")
    val hadOld = fs.exists(t)
    if (hadOld) {
      if (fs.exists(tomb)) fs.delete(tomb, true)
      if (!fs.rename(t, tomb)) throw new IllegalStateException(
        s"commitStaged: rename-aside $target -> $tomb failed")
    }
    // The restore itself can fail (the one truly bad state: target
    // absent, old tree stranded in the tomb). Surface that on the
    // thrown error instead of letting it imply the old tree is back —
    // the operator's recovery is a manual tomb -> target rename.
    def restore(onto: Throwable): Unit =
      if (hadOld && !fs.rename(tomb, t)) onto.addSuppressed(
        new IllegalStateException(
          s"commitStaged: RESTORE $tomb -> $target also failed — " +
            s"target is ABSENT and the old tree lives in $tomb"))
    try fence.verify() catch { case e: Throwable => restore(e); throw e }
    if (!fs.rename(new Path(stage), t)) {
      val e = new IllegalStateException(
        s"commitStaged: rename $stage -> $target failed")
      restore(e)
      throw e
    }
    if (hadOld) fs.delete(tomb, true)
  }
}
