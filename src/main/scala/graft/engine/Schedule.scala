package graft.engine

import java.nio.charset.StandardCharsets
import java.time.{Duration, Instant}

import org.apache.spark.sql.SparkSession

/** Schedule/catchup control plane (SURVEY §2.10) — the reference DAG
  * declares `schedule=None, catchup=False`
  * (reference `dags/iowa_liquor_dag.py:53-54`): manual triggering, and
  * when a scheduler IS attached, missed intervals are NOT backfilled.
  * The library-honest equivalent is a pure tick calculator plus a
  * marker-file run gate — the caller's cron/driver invokes `runDue`
  * as often as it likes; the marker makes re-invocation idempotent and
  * the catchup flag decides whether downtime is replayed tick-by-tick
  * or collapsed to the latest interval (Airflow's `catchup=False`).
  */
object Schedule {

  /** One schedulable interval: `scheduled` is the tick's nominal time
    * (interval END, matching Airflow's data-interval convention);
    * `isCatchup` marks ticks older than the most recent one.
    */
  case class Tick(scheduled: Instant, isCatchup: Boolean)

  /** The ticks a scheduler would fire in (lastRun, now], aligned to
    * whole multiples of `every` since epoch (deterministic grid, so
    * independent callers agree on tick identity):
    * - no marker (first ever run): exactly one non-catchup tick — the
    *   latest grid point ≤ now (no unbounded history backfill);
    * - `catchup = false`: missed ticks collapse to the LATEST one;
    * - `catchup = true`: one tick per missed grid point, oldest first,
    *   all but the newest flagged `isCatchup`.
    * Empty when the newest grid point ≤ lastRun (nothing due).
    */
  def dueTicks(lastRun: Option[Instant], now: Instant, every: Duration,
      catchup: Boolean): Seq[Tick] = {
    require(!every.isZero && !every.isNegative, "schedule interval must be positive")
    val step = every.toMillis
    val latest = Math.floorDiv(now.toEpochMilli, step) * step
    if (latest <= 0 && now.toEpochMilli < 0) return Seq.empty // pre-epoch: out of scope
    lastRun match {
      case None =>
        Seq(Tick(Instant.ofEpochMilli(latest), isCatchup = false))
      case Some(prev) if latest <= prev.toEpochMilli => Seq.empty
      case Some(prev) =>
        if (!catchup) Seq(Tick(Instant.ofEpochMilli(latest), isCatchup = false))
        else {
          val first = (Math.floorDiv(prev.toEpochMilli, step) + 1) * step
          (first to latest by step).map(t =>
            Tick(Instant.ofEpochMilli(t), isCatchup = t != latest))
        }
    }
  }

  private def markerPath(markerDir: String) =
    new org.apache.hadoop.fs.Path(markerDir, "_last_run")

  /** Last successfully-completed tick, if any. A MISSING or
    * unparseable marker reads as "never ran" (the documented
    * first-run semantics — note this collapses any pending catchup
    * backlog to the single latest tick, which is why writes below are
    * atomic-replace). A genuine I/O failure PROPAGATES: treating a
    * transient read error as never-ran would silently skip due
    * catchup intervals, and idempotent loads do not protect against
    * skipped work.
    */
  def readMarker(spark: SparkSession, markerDir: String): Option[Instant] = {
    val p = markerPath(markerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .trim.toLongOption.map(Instant.ofEpochMilli)
      finally in.close()
    }
  }

  /** Record `tick` as the last completed run: write-temp then
    * ATOMIC-REPLACE rename (`Options.Rename.OVERWRITE` via
    * FileContext — unlike `FileSystem.rename`, this is a single
    * replace where the filesystem supports it and THROWS on failure
    * rather than returning false). A delete-then-rename pair would
    * leave a no-marker window in which a crash silently resets the
    * schedule to first-run semantics.
    */
  def writeMarker(spark: SparkSession, markerDir: String, tick: Instant): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = markerPath(markerDir)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(markerDir, "._last_run.tmp")
    val out = fs.create(tmp, true)
    try out.write(tick.toEpochMilli.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Run gate: computes the due ticks from the marker, runs `job` per
    * tick (oldest first), advances the marker AFTER each successful
    * tick (a mid-catchup crash resumes at the failed tick, never
    * re-runs completed ones). Returns the number of ticks run.
    * Single-scheduler semantics, matching the reference's lone DAG run.
    * For concurrent schedulers over one marker dir, use [[runDueShared]].
    */
  def runDue(spark: SparkSession, markerDir: String, every: Duration,
      catchup: Boolean, now: Instant = Instant.now())(job: Tick => Unit): Int = {
    val ticks = dueTicks(readMarker(spark, markerDir), now, every, catchup)
    ticks.foreach { t =>
      job(t)
      writeMarker(spark, markerDir, t.scheduled)
    }
    ticks.size
  }

  private def claimPath(markerDir: String, tick: Instant) =
    new org.apache.hadoop.fs.Path(markerDir, s"_claim_${tick.toEpochMilli}")

  /** Per-tick claim via ATOMIC CREATE-EXCLUSIVE (`FileSystem.create`
    * with overwrite=false — single atomic namespace op on HDFS and
    * posix local FS): of N schedulers racing on one tick, exactly one
    * create succeeds. A claim whose holder crashed before advancing
    * the marker would wedge the tick forever, so a claim OLDER than
    * `leaseTimeout` (file mtime) with its tick still due may be
    * deleted and re-claimed — the standard lease compromise: inside
    * the lease window execution is exactly-once; a holder that
    * SILENTLY stalls past it (no crash, no marker write) downgrades
    * that tick to at-least-once. Claim files are the per-tick dedup
    * record and are kept after completion (GC'd by [[runDueShared]]
    * once the marker has durably passed them).
    *
    * A create failure with the claim absent (not a lost race) is a
    * genuine I/O error and PROPAGATES, mirroring [[readMarker]].
    */
  def claimTick(spark: SparkSession, markerDir: String, tick: Instant,
      owner: String, leaseTimeout: Duration,
      now: Instant = Instant.now()): Boolean = {
    val p = claimPath(markerDir, tick)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Hadoop's LOCAL create(overwrite=false) is check-then-create (a
    // TOCTOU window between JVM-concurrent claimants); O_CREAT|O_EXCL
    // via nio is the atomic local equivalent of HDFS's server-side
    // exclusive create.
    val isLocalFs = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    def tryCreate(): Boolean =
      if (isLocalFs)
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(p.toUri.getPath),
            owner.getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      else
        try {
          val out = fs.create(p, false)
          try out.write(owner.getBytes(StandardCharsets.UTF_8)) finally out.close()
          true
        } catch {
          case e: java.io.IOException =>
            if (fs.exists(p)) false // lost the race — claimed by another
            else throw e
        }
    if (tryCreate()) true
    else {
      val stale =
        try now.toEpochMilli - fs.getFileStatus(p).getModificationTime >
          leaseTimeout.toMillis
        catch { case _: java.io.FileNotFoundException => true } // holder vanished
      if (stale) { fs.delete(p, false); tryCreate() } else false
    }
  }

  /** Advance the marker MONOTONICALLY: a straggler scheduler finishing
    * an old tick after a peer already advanced further must not
    * regress the schedule (regression would re-due completed ticks —
    * harmless only because their claim files still gate them, but the
    * marker should converge regardless).
    */
  def writeMarkerIfNewer(spark: SparkSession, markerDir: String,
      tick: Instant): Unit =
    if (!readMarker(spark, markerDir).exists(_.toEpochMilli >= tick.toEpochMilli))
      writeMarker(spark, markerDir, tick)

  /** Multi-scheduler run gate: like [[runDue]], but safe for several
    * schedulers polling ONE marker dir concurrently — each due tick is
    * gated by [[claimTick]], so exactly one scheduler executes it
    * (within the lease window); the rest skip. Marker advance is
    * monotonic, and claim files older than the marker by more than
    * `leaseTimeout` are GC'd (bounded housekeeping: a claim is only
    * GC-eligible long after its tick stopped being due). Returns the
    * number of ticks THIS scheduler ran.
    */
  def runDueShared(spark: SparkSession, markerDir: String, every: Duration,
      catchup: Boolean, owner: String,
      leaseTimeout: Duration = Duration.ofMinutes(30),
      now: Instant = Instant.now())(job: Tick => Unit): Int = {
    val ticks = dueTicks(readMarker(spark, markerDir), now, every, catchup)
    val ran = ticks.count { t =>
      val claimed = claimTick(spark, markerDir, t.scheduled, owner, leaseTimeout, now)
      if (claimed) {
        job(t)
        writeMarkerIfNewer(spark, markerDir, t.scheduled)
      }
      claimed
    }
    // GC: claims far behind the (just-advanced) marker can never be
    // due again short of a straggler delayed beyond the lease window.
    readMarker(spark, markerDir).foreach { m =>
      val dir = new org.apache.hadoop.fs.Path(markerDir)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val horizon = m.toEpochMilli - leaseTimeout.toMillis
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("_claim_"))
          name.stripPrefix("_claim_").toLongOption
            .filter(_ < horizon)
            .foreach(_ => fs.delete(st.getPath, false))
      }
    }
    ran
  }
}
