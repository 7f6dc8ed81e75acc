package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset versioning: what changed between two corpus snapshots —
  * the audit step before retraining on a refreshed crawl (which docs
  * arrived, which left, which were edited in place) — plus the
  * ATOMIC PUBLISH that makes "the corpus a training run read" a
  * reproducible fact rather than a directory that mutated underneath
  * the job.
  *
  * Published layout under `dir`:
  *   - `v=N/…` — immutable version trees, written whole by the
  *     FileOutputCommitter (in-flight files stay under `_temporary`);
  *   - `_current` — a one-line pointer file holding N, swapped with
  *     an ATOMIC rename. Readers resolve the pointer, then read an
  *     immutable tree — a reader can never observe a half-written
  *     version, a half-swapped pointer, or a torn mix of two
  *     versions.
  *
  * Crash story (the [[graft.ops.AnnIndex]] generation discipline):
  * a publish that dies mid-write leaves `_current` untouched and an
  * orphan `v=N` invisible to readers; the NEXT publish computes its
  * version from the pointer (not the directory listing), so it
  * re-owns and overwrites the orphan wholesale. [[rollback]] is a
  * pointer swap — the rolled-back version stays on disk for audit
  * and is re-owned by the next publish.
  */
object Versioning {

  private val CurrentFile = "_current"

  private def fsOf(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** The version readers currently resolve — None before the first
    * completed publish (including the crashed-first-publish state:
    * the tree may hold an orphan `v=1`, but nothing points at it).
    */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, _) = fsOf(spark, dir)
    val ptr = new org.apache.hadoop.fs.Path(s"$dir/$CurrentFile")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Version ids present on disk, pointed-at or not — orphans from
    * crashed publishes and rolled-back versions included (that is the
    * point: they are visible to maintenance, invisible to readers).
    */
  def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, path) = fsOf(spark, dir)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
      .sorted
  }

  /** Atomically swap the `_current` pointer to `version`. The swap is
    * ONE FileContext rename with OVERWRITE (atomic on posix and HDFS)
    * — there is no window where the pointer is absent or truncated.
    */
  private def swapPointer(spark: SparkSession, dir: String,
      version: Long): Unit = {
    val (fs, _) = fsOf(spark, dir)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$dir/.${CurrentFile}.tmp-$version")
    val out = fs.create(tmp, true)
    try out.write(version.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(s"$dir/$CurrentFile"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private val LockFile = "_publish_lock"

  /** Filesystem schemes on which publish's two primitives DO NOT hold:
    * object stores where `create(overwrite=false)` is a client-side
    * check-then-create (no server-side exclusive create) and rename
    * is a non-atomic copy+delete — so neither the single-writer lock
    * nor the atomic `_current` pointer swap would actually be atomic.
    * Publish REFUSES these loudly rather than silently degrading to
    * "probably fine" semantics; production object-store deployments
    * need a real coordination layer (a table format or a lock
    * service), not this file-convention protocol. HDFS (server-side
    * exclusive create + atomic in-namespace rename) and local/posix
    * (O_CREAT|O_EXCL + atomic rename(2)) are the supported homes.
    */
  private val NonAtomicSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss",
      "oss", "cosn", "swift")

  private[ops] def requireAtomicFs(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, op: String = "Versioning.publish"): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file").toLowerCase
    require(!NonAtomicSchemes.contains(scheme),
      s"$op: $dir is on '$scheme', which has no atomic " +
        "rename or server-side exclusive create — the single-writer and " +
        "atomic-pointer-swap guarantees would not hold. Use HDFS/posix, " +
        "or a table format with a real commit protocol for object stores")
  }

  /** Manual override for a crash-orphaned dataset lock that
    * [[FsLock.acquireOrReclaim]] cannot self-heal (foreign host, or
    * a stamp it can't prove dead): the operator or a lease-holding
    * maintenance job (the [[graft.engine.Schedule]] claim discipline)
    * clears it after confirming the holder dead — the holder line
    * stamped into the lock file says who to confirm. Breaking a
    * STILL-LIVE holder is survivable but not free: the live holder is
    * fenced out at its next mutating write ([[FsLock.Fence]]) and
    * aborts loudly rather than racing the new mutator.
    */
  def breakLock(spark: SparkSession, dir: String): Unit = {
    val (fs, _) = fsOf(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$LockFile"), false)
  }

  /** ONE dataset mutation at a time: publish, rollback, and vacuum
    * all serialize through the same exclusive-create lock. Publish
    * alone was locked through r12, which left two real tears: a
    * vacuum racing a publish sees the just-written v=N+1 tree before
    * the pointer swap, classifies it DISAVOWED (id above the
    * pointer), and deletes the tree the swap is about to expose; a
    * rollback racing a publish has its pointer swap silently
    * overridden, un-disavowing the versions the rollback renounced.
    * Readers stay lock-free (the pointer swap is atomic; every
    * reader-visible state under a single mutator is covered by the
    * crash-ordering contract).
    */
  private def withDatasetLock[T](spark: SparkSession, dir: String,
      op: String)(body: FsLock.Fence => T): T = {
    val (fs, root) = fsOf(spark, dir)
    requireAtomicFs(fs, dir, s"Versioning.$op")
    if (!fs.exists(root)) fs.mkdirs(root)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/$LockFile")
    // acquireOrReclaim: a crash-orphaned lock whose stamped pid is
    // provably dead ON THIS HOST self-heals (the AnnIndex writer-lock
    // discipline, shared at the FsLock level); anything unprovable
    // still refuses and names the holder. The body must fence.verify()
    // before each mutating write — the backstop against a wrong break.
    // advertiseLease: this wrapper runs the body under withHeartbeat,
    // so the stamp's lease promise is actually kept
    val stamp = FsLock.holderStamp(op, advertiseLease = true)
    if (!FsLock.acquireOrReclaim(fs, lock, stamp)) {
      val holder = FsLock.holderInfo(fs, lock)
        .map(h => s" (holder: $h)").getOrElse("")
      throw new IllegalStateException(
        s"$op: another mutator holds $dir/$LockFile$holder — publish, " +
          "rollback and vacuum serialize; back off, or breakLock(dir) " +
          "if its holder crashed")
    }
    // heartbeat while the mutation runs (the cross-host lease, FsLock
    // path 2); release-if-owned: a fenced-out mutator must not delete
    // the usurper's lock on its way down
    try FsLock.withHeartbeat(fs, lock, stamp) {
      body(FsLock.fence(fs, lock, stamp, s"Versioning.$op"))
    } finally FsLock.releaseOwned(fs, lock, stamp)
  }

  /** Publish `df` as the next version of the dataset at `dir` and
    * atomically move readers onto it. Returns the published version
    * id (1-based). The version tree is written FIRST and the pointer
    * swapped LAST — the only two orderings a crash can observe are
    * "old version still current" and "new version current and
    * complete".
    *
    * ONE publisher at a time: publish opens with an exclusive-create
    * lock (O_CREAT|O_EXCL locally, server-side exclusive create on
    * HDFS — the [[graft.engine.Schedule]] claim primitive), so a
    * second concurrent publisher fails LOUDLY instead of racing its
    * Overwrite into the same v=N tree and leaving a torn mix behind
    * the pointer. The lock is removed on success AND on failure; only
    * a publisher that died takes it to the grave — see [[breakLock]].
    *
    * SUPPORTED FILESYSTEMS: HDFS and local/posix only. Both
    * guarantees lean on primitives object stores lack (server-side
    * exclusive create; atomic rename) — publish refuses known
    * non-atomic schemes loudly rather than degrading silently (see
    * [[NonAtomicSchemes]]).
    */
  def publish(df: DataFrame, dir: String): Long =
    // exclusive create via the shared primitive ([[FsLock]]): nio
    // O_CREAT|O_EXCL locally (Hadoop local create(false) is a
    // check-then-create TOCTOU), server-side exclusive create on HDFS
    publishTree(df.sparkSession, dir)(stage =>
      df.write.mode(SaveMode.Overwrite).parquet(stage))

  /** Publish a caller-BUILT tree as the next version: the same lock /
    * stage / fence / rename / pointer-swap discipline as [[publish]]
    * (which rides this), but the version's content is produced by
    * `build(stageDir)` — any writer that lays a directory tree down,
    * e.g. a full [[AnnIndex.buildIvfIndex]] rebuild. This is the
    * ZERO-DOWNTIME REBUILD composition the in-place rebuild scaladoc
    * points at: readers keep resolving (and reading) the complete,
    * immutable `v=N` tree for the whole minutes-long build — the new
    * tree grows inside a dot-hidden stage they never see — and the
    * commit is a rename plus an atomic pointer swap, metadata ops.
    * A reader can never observe a torn tree because no version is
    * ever mutated in place; mid-swap readers finish on old-complete,
    * post-swap readers start on new-complete.
    */
  def publishTree(spark: SparkSession, dir: String)
      (build: String => Unit): Long =
    withDatasetLock(spark, dir, "publish") { fence =>
      val (fs, _) = fsOf(spark, dir)
      val next = currentVersion(spark, dir).getOrElse(0L) + 1L
      // STAGE → FENCE → RENAME ([[StagedCommit]] — one implementation
      // shared with the index writers): the version write can run
      // minutes at corpus scale, and a publisher stalled past the
      // lease TTL and reclaimed must find its late job commit landed
      // in its own dot-hidden stage — never the v=N tree a successor
      // may already own. The fence guards the millisecond rename, and
      // the pointer swap stays last, so the only crash-visible states
      // remain "old version current" and "new version current and
      // complete".
      StagedCommit.purgeStages(fs, dir, s".stage_v_${next}_", fence)
      val stage = s"$dir/.stage_v_${next}_${StagedCommit.stageToken()}"
      build(stage)
      StagedCommit.commitStaged(fs, fence, stage, s"$dir/v=$next")
      fence.verify()
      swapPointer(spark, dir, next)
      next
    }

  /** Read the dataset: the current version by default, or any
    * still-on-disk version for time travel (`read(dir, Some(1))` is
    * "exactly what the March run trained on", as long as retention
    * kept it).
    */
  def read(spark: SparkSession, dir: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(
        s"no published version at $dir — publish first"))
    val (fs, _) = fsOf(spark, dir)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$v")),
      s"version $v does not exist at $dir (have: " +
        s"${listVersions(spark, dir).mkString(",")})")
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Point readers back at an older version — the bad-publish escape
    * hatch. A pointer swap only: the rolled-back version stays on
    * disk for audit, and the NEXT publish overwrites it (its content
    * was disavowed; its number is reused so the version line stays
    * contiguous).
    */
  def rollback(spark: SparkSession, dir: String, version: Long): Unit =
    withDatasetLock(spark, dir, "rollback") { fence =>
      require(listVersions(spark, dir).contains(version),
        s"cannot roll back to absent version $version at $dir")
      fence.verify()
      swapPointer(spark, dir, version)
    }

  /** Retention: drop DISAVOWED versions (ids above the pointer — a
    * rollback renounced their content, so "newest" must not protect
    * them: serving one from time travel after an incident is exactly
    * the data the rollback was supposed to bury, r11 review finding),
    * then all but the `keep` highest LEGITIMATE versions. The
    * pointed-at version is NEVER vacuumed no matter how old (a
    * rollback target must not be deleted out from under readers).
    * Time travel reaches exactly what retention kept; this is where
    * that sentence gets its teeth. Also sweeps orphaned publisher
    * stages (`.stage_v_*` dirs a crashed or fenced-out publisher left
    * behind — reader-invisible, but garbage). Returns the version ids
    * deleted.
    *
    * RETENTION GRACE for SERVING roots (lock-free readers, e.g. an
    * [[AnnIndex.rebuildIvfIndexVersioned]] root): a reader resolves
    * the pointer once and then reads its immutable `v=N` tree with no
    * lock held, so only the pointed-at version is protected —
    * `vacuum(keep = 1)` fired right after a publish/rebuild can
    * delete the superseded version an in-flight reader resolved
    * moments earlier, failing it mid-read. Either keep ≥ 2 (the
    * superseded version survives one more retention cycle) or delay
    * vacuum past the maximum read/query duration after a pointer
    * swap. Offline/archival roots with no concurrent readers may use
    * keep = 1 freely.
    */
  def vacuum(spark: SparkSession, dir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"keep must be ≥ 1, got $keep")
    withDatasetLock(spark, dir, "vacuum") { fence =>
      val (fs, _) = fsOf(spark, dir)
      val cur = currentVersion(spark, dir)
      val (disavowed, legit) = listVersions(spark, dir).sorted
        .partition(v => cur.exists(v > _))
      val doomed = (disavowed ++ legit.dropRight(keep))
        .filterNot(cur.contains).sorted
      // fence per DELETE, not once per loop: a mid-loop wrong reclaim
      // followed by the usurper's rollback could otherwise point
      // readers at a version this stale loop is about to destroy
      doomed.foreach { v =>
        fence.verify()
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v=$v"), true)
      }
      // catch-all sweep of orphaned publisher stages: publish purges
      // only its OWN version's .stage_v_<next>_ prefix, so a publisher
      // that died mid-stage leaves its dot-hidden dir (and a crashed
      // commit's .tomb, which shares the prefix) behind forever if no
      // later publish lands the same version number. Reader-invisible
      // bytes, but retention is exactly where they get reclaimed —
      // the AnnIndex compaction catch-all, mirrored. No live
      // publisher's in-flight stage can be here: publish and vacuum
      // serialize through the dataset lock, and a fenced-out zombie's
      // stage is precisely the garbage this sweeps.
      StagedCommit.purgeStages(fs, dir, ".stage_v_", fence)
      doomed
    }
  }

  /** Snapshot diff by content hash: (doc_id, change) for every doc
    * `added` / `removed` / `modified` between the two snapshots;
    * unchanged docs are dropped (at corpus scale the diff is the
    * small output, the corpus is the big input).
    *
    * Only (id, xxhash64(text)) pairs shuffle — document bodies never
    * cross the wire, so the full-outer join is 16 bytes/row no matter
    * how large the documents are. A modified doc whose old and new
    * texts collide on xxhash64 (2⁻⁶⁴) reports as unchanged — the
    * standard at-scale trade, same policy as the postings hash.
    * `idCol` must be unique within each snapshot (the PK contract of
    * a snapshot); duplicate ids would multiply join rows.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // A null text is a VALUE distinct from every string (IS DISTINCT
    // FROM semantics): the hash stays null for it — xxhash64 would
    // otherwise skip the null argument and emit the seed constant,
    // conflating null text with whatever string shares that hash —
    // and presence rides an explicit flag, never the hash's nullness.
    def sig(df: DataFrame, side: String) =
      df.select(col(idCol).as("doc_id"),
        when(col(textCol).isNotNull, xxhash64(col(textCol))).as(s"h_$side"),
        lit(true).as(s"in_$side"))
    sig(oldSnap, "old")
      .join(sig(newSnap, "new"), Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(!(col("h_old") <=> col("h_new")), lit("modified")))
      .where(col("change").isNotNull)
      .select(col("doc_id"), col("change"))
  }

  /** One-row diff summary: the counts a snapshot-promotion gate
    * alerts on (plus both snapshot sizes, recomputed in the same
    * pass for ratio rules like "reject if >30% of the corpus
    * changed").
    */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def n(kind: String) =
      coalesce(sum(when(col("change") === kind, 1L)), lit(0L)).as(s"n_$kind")
    val d = snapshotDiff(oldSnap, newSnap, idCol, textCol)
      .agg(n("added"), n("removed"), n("modified"))
    val sizes = oldSnap.agg(count(lit(1)).as("n_old"))
      .crossJoin(newSnap.agg(count(lit(1)).as("n_new")))
    d.crossJoin(broadcast(sizes))
  }
}
