package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path
import java.net.URI

/** Parquet-backed keyed table store.
  *
  * Physical model mapping (/root/reference SURVEY.md §1.2): Azure Table
  * Storage (PartitionKey=dataset, RowKey=date) -> one parquet directory per
  * dataset under a root, so dataset scoping is directory (partition)
  * pruning, and the date key is a parquet column with min/max row-group
  * stats for predicate pushdown. Writes are atomic per dataset via
  * write-temp-then-swap (plain parquet has no MERGE; SURVEY.md §4.3).
  *
  * At cluster scale: each dataset dir is written with however many tasks its
  * size needs; small control tables (revisions, metadata) coalesce to few
  * files to avoid small-file explosion.
  */
final class TableStore(spark: SparkSession, root: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def path(table: String): String = s"$root/$table"

  private def oldPath(table: String) = {
    val t = new Path(URI.create(path(table)).normalize().toString)
    new Path(t.getParent, s".${t.getName}.__old__")
  }

  /** Compaction's backup dir — distinct from overwrite's `.__old__`
    * because its recovery differs: it may hold LATE-APPENDED files that
    * must be merged forward, never just deleted. */
  private def coldPath(table: String) = {
    val t = new Path(URI.create(path(table)).normalize().toString)
    new Path(t.getParent, s".${t.getName}.__cold__")
  }

  private val ManifestFile = "_compact_manifest"

  /** Per-invocation PRIVATE temp dir: two concurrent writers of the same
    * table (a stream micro-batch racing a batch catch-up, a scheduled
    * compact racing an overwrite) must never see — let alone delete —
    * each other's in-progress Spark output. Crashed invocations leak the
    * dir; sweepStaleTmp() below reclaims it on the table's next write. */
  private def tmpPath(table: String) = {
    val t = new Path(URI.create(path(table)).normalize().toString)
    new Path(t.getParent, s".${t.getName}.__tmp_${
      java.util.UUID.randomUUID().toString.take(8)}__")
  }

  /** A temp/append-temp dir older than this is a crashed writer's leak and
    * is reclaimed by a later write to the table. Generous on purpose: a
    * LIVE tmp dir is one Spark write job in progress, and at real scale
    * that can run for a long time — deleting a live one fails that job
    * (the source data is untouched). Liveness is judged by the NEWEST
    * mtime anywhere under the dir, not the top-level dir's (Spark tasks
    * write under _temporary/ subtrees and never touch the root's mtime),
    * so a job is live as long as any task has produced output within the
    * bound. Crashes leak disk for at most this long plus the gap to the
    * table's next swept write; drop() reclaims unconditionally. */
  private val TmpStaleMs = 6L * 3600 * 1000

  /** Sweep every 64th write per table (and the first): the sweep is one
    * server-side-filtered glob of the store root, pure overhead in the
    * common no-leak case, so a streaming ingest writing twice per
    * micro-batch must not pay it twice per batch forever. */
  private val SweepEvery = 64L
  private val sweepTick =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  private def newestMtime(p: Path): Long = {
    var newest = fs.getFileStatus(p).getModificationTime
    val it = fs.listFiles(p, true)
    while (it.hasNext) newest = newest max it.next().getModificationTime
    newest
  }

  private def sweepStaleTmp(table: String): Unit = {
    val n = sweepTick.computeIfAbsent(table,
      _ => new java.util.concurrent.atomic.AtomicLong()).getAndIncrement()
    if (n % SweepEvery == 0) sweepLeakedTmp(table)
  }

  /** The table's reclaimable-artifact name prefixes — writer temp dirs,
    * append temp dirs, orphaned lock breakers. ONE list shared by the
    * periodic sweep and drop() so a new artifact kind can't be added to
    * one and leak (or resurrect) through the other. Never includes
    * lock/old/cold: those are live coordination/recovery state. */
  private def leakPrefixes(tableName: String): Seq[String] =
    Seq(s".$tableName.__tmp_", s".$tableName.__apd_",
      s".$tableName.__lock__.break_")

  /** Best-effort: a leaked dir that cannot be statted or deleted (ACLs,
    * object-store throttling) must never fail the caller's WRITE — it
    * just stays leaked until drop() or an operator removes it.
    * Package-private so the stale/live boundary is testable directly. */
  private[graft] def sweepLeakedTmp(table: String): Unit = {
    val t = new Path(URI.create(path(table)).normalize().toString)
    val now = System.currentTimeMillis()
    try {
      val leaks = fs.globStatus(new Path(t.getParent, s".${t.getName}.__*"))
      val pfx = leakPrefixes(t.getName)
      for (s <- Option(leaks).getOrElse(Array.empty)) {
        if (pfx.exists(s.getPath.getName.startsWith))
          try {
            if (now - newestMtime(s.getPath) > TmpStaleMs)
              fs.delete(s.getPath, true)
          } catch { case scala.util.control.NonFatal(_) => () }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Commit lock serializing append's file-landing against overwrite's and
    * compaction's two-rename swap window. Only FAST metadata operations run
    * under it (renames, a recovery check) — never a Spark write job — so
    * contention is bounded by filesystem rename latency. Acquisition is
    * create-exclusive where the filesystem can actually provide it: on
    * HDFS via fs.create(overwrite=false) (atomic there — the NameNode
    * serializes the create), and on local filesystems via NIO CREATE_NEW
    * (POSIX O_CREAT|O_EXCL) — Hadoop's local create(false) is
    * check-then-create and measurably loses exclusion under contention
    * (see createExclusive). On OBJECT-STORE schemes (S3A, ABFS, GCS)
    * neither create-exclusive nor rename is atomic — both are
    * check-then-act over HTTP — so there the whole lock, breaker rename
    * included, is BEST-EFFORT: two breakers can both believe they won.
    * Single-writer deployments (this engine's contract) are unaffected;
    * a multi-writer deployment on an object store needs the lease
    * service / lakehouse commit log called out in the boundary note
    * below. A crashed holder is healed by the staleness bound, which
    * sits orders of magnitude above any rename's duration.
    *
    * The lock file carries a per-acquisition OWNER TOKEN:
    *   - release deletes the lock only if the token is still ours, so a
    *     holder whose lock was stale-broken can never delete the breaking
    *     writer's fresh lock (which would cascade a third writer in);
    *   - stale-breaking is rename-then-verify, not blind delete: rename to
    *     a breaker-private name is atomic (exactly one breaker wins), and
    *     the verdict is re-derived from the BREAKER's own mtime (rename
    *     preserves it) — not from anything read at the original path
    *     beforehand, which a competing breaker's fresh lock could have
    *     replaced in the meantime. A breaker that finds it stole a fresh
    *     lock renames it straight back.
    * The lock carries a HEARTBEAT while held: the owner re-touches the
    * lock file's mtime on a timer (period = staleness bound / 3), and the
    * staleness verdict reads mtime — so it judges HEARTBEAT age, not
    * acquisition age. A slow-but-alive holder (throttled object-store
    * renames, a long recovery under the lock) keeps the lock indefinitely;
    * only a holder whose JVM stopped beating — death, or a full
    * stop-the-world freeze longer than the bound (which freezes the
    * heartbeat thread with everything else) — is broken.
    * Boundary (documented, not defended): that full-freeze case remains —
    * the classic lease-less lock-file limit, now narrowed from "paused
    * anywhere past the bound" to "entire JVM frozen past the bound" — and
    * a failed rename-back of a mistakenly-stolen fresh lock (its path was
    * re-created in the microseconds in between) strands that holder
    * lockless; a multi-writer production deployment wants a lease service
    * or a lakehouse commit log instead of raw parquet. */
  private def lockPath(table: String) = {
    val t = new Path(URI.create(path(table)).normalize().toString)
    new Path(t.getParent, s".${t.getName}.__lock__")
  }

  /** Staleness bound on the lock HEARTBEAT (mtime age). Package-private
    * and mutable only so tests can shorten it to exercise the
    * break/no-break boundary without 30s sleeps. */
  @volatile private[graft] var lockStaleMs: Long = 30000L

  private def readToken(p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** The lock sits on a local disk iff the RESOLVED filesystem is local —
    * judged from `fs`, never from the lock path's own (possibly absent)
    * scheme: a scheme-less root resolves against fs.defaultFS, which may
    * be HDFS, and routing such a lock to driver-local NIO would both lose
    * cross-node exclusion and strand an undeletable local lock file. */
  private def isLocalFs: Boolean =
    fs.getUri.getScheme == "file"

  /** Create the lock file exclusively, token inside; false if it exists.
    * On a LOCAL filesystem Hadoop's create(overwrite=false) is
    * CHECK-then-create — two contenders can both pass the check and both
    * believe they acquired (measured: 23/160 lost updates under an
    * 8-thread hammer). Local paths therefore go through NIO CREATE_NEW
    * (POSIX O_CREAT|O_EXCL — genuinely atomic); HDFS and object-store
    * schemes keep fs.create(false), which is atomic there. */
  private def createExclusive(lock: Path, token: String): Boolean = {
    if (isLocalFs) {
      val p = java.nio.file.Paths.get(lock.toUri.getPath)
      try {
        java.nio.file.Files.write(p, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException =>
          // parent missing (first write to a fresh store root): create it
          // and retry once — CREATE_NEW does not mkdirs like fs.create
          try {
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p, token.getBytes("UTF-8"),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            true
          } catch { case _: java.io.IOException => false }
        case _: java.io.IOException => false
      }
    } else
      try {
        val out = fs.create(lock, false)
        try out.write(token.getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  /** Rename the breaker file back to the lock path, FAILING if the path
    * was re-created in the meantime — never replacing it. HDFS rename
    * already has fail-if-exists semantics. POSIX rename(2) silently
    * REPLACES an existing destination (and Hadoop's local rename and NIO
    * ATOMIC_MOVE both inherit that), which would clobber another writer's
    * fresh lock and leave TWO writers believing they hold it — so local
    * paths go through a hard link (atomic, EEXIST on an occupied path)
    * plus breaker delete. A failed rename-back strands the stolen lock's
    * owner lockless (the documented boundary) on every filesystem alike. */
  private[graft] def renameBackExclusive(breaker: Path, lock: Path): Boolean = {
    if (isLocalFs) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(lock.toUri.getPath),
          java.nio.file.Paths.get(breaker.toUri.getPath))
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(breaker.toUri.getPath))
        true
        // NonFatal, not just IOException: a link-less filesystem throws
        // UnsupportedOperationException, which must degrade to "rename-back
        // failed" (breaker deleted, owner stranded — the documented
        // boundary), never escape the acquire loop
      } catch { case scala.util.control.NonFatal(_) => false }
    } else fs.rename(breaker, lock)
  }

  private[graft] def withTableLock[A](table: String)(body: => A): A = {
    val lock = lockPath(table)
    val token = java.util.UUID.randomUUID().toString
    var acquired = false
    var unacquirableSinceMs = 0L // first of an unbroken run of create-fails-AND-no-lock-visible
    while (!acquired) {
      if (createExclusive(lock, token)) acquired = true
      else {
          // held by another writer: break it if stale, else wait briefly
          try {
            val st = fs.getFileStatus(lock)
            unacquirableSinceMs = 0L // a lock file exists: normal contention
            if (System.currentTimeMillis() - st.getModificationTime > lockStaleMs) {
              val breaker = new Path(lock.getParent,
                s"${lock.getName}.break_${token.take(8)}")
              if (fs.rename(lock, breaker)) {
                // re-derive staleness from the renamed file itself: its
                // mtime travels with the rename, so this judges whatever
                // we ACTUALLY took, not whatever we statted moments ago
                val broke = fs.getFileStatus(breaker)
                if (System.currentTimeMillis() - broke.getModificationTime >
                    lockStaleMs)
                  fs.delete(breaker, false)
                else if (!renameBackExclusive(breaker, lock))
                  fs.delete(breaker, false)
              }
            } else Thread.sleep(5)
          } catch {
            // lock vanished between createExclusive and getFileStatus —
            // usually the holder released; loop and re-contend. But this
            // arm also catches the pathological case where createExclusive
            // keeps mapping a PERSISTENT error (EACCES, quota) to false
            // while the path never exists: sleep so that isn't a hot spin,
            // and once the no-lock-visible condition has persisted past a
            // staleness bound — far longer than any release/re-acquire
            // window — warn (rate-limited to once per bound) so the hang
            // has a cause in the log instead of being silent.
            case _: java.io.FileNotFoundException =>
              val now = System.currentTimeMillis()
              if (unacquirableSinceMs == 0L) unacquirableSinceMs = now
              else if (now - unacquirableSinceMs > lockStaleMs) {
                TableStore.log.warn(
                  s"TableStore: lock for '$table' unacquirable for " +
                  s"${now - unacquirableSinceMs}ms — create keeps failing " +
                  "while no lock file exists (persistent create error? " +
                  "permissions/quota on the lock's parent directory)")
                unacquirableSinceMs = now
              }
              Thread.sleep(5)
          }
      }
    }
    // heartbeat: re-touch the lock's mtime while the body runs, so the
    // staleness verdict above judges "stopped beating", not "held long".
    // Token-checked per beat: after a (full-freeze) stale-break, the path
    // may hold ANOTHER writer's fresh lock, which we must not refresh.
    // setTimes is VERIFIED per beat: Hadoop's FileSystem.setTimes default
    // is an empty no-op and object-store connectors don't override it
    // (object mtime is immutable in place) — a beat whose mtime did not
    // advance falls back to rewriting the lock file with the same token,
    // which re-creates the object and so refreshes its timestamp. The
    // rewrite's clobber window (our lock stale-broken and re-acquired
    // between the token check and the write) requires the JVM frozen past
    // the staleness bound first — the same documented full-freeze
    // boundary as everywhere else. A rewrite racing our own RELEASE is
    // PREVENTED, not just documented: the beat body and release
    // synchronize on `beatGate`, and release flips `released` INSIDE the
    // monitor — so release first waits out any in-flight beat, then makes
    // every later-firing beat a no-op, and only then deletes the lock. No
    // orphan lock can be recreated behind the delete on any filesystem.
    // Beat failures never fail the holder (the heartbeat is an aliveness
    // signal, never a correctness dependency) but they are COUNTED: a
    // live holder on a throttled/flaky filesystem that misses beats past
    // the staleness bound can lose the lock while still running, so
    // sustained failure logs a rate-limited warning here and the release
    // path below warns when the token shows the lock was in fact lost —
    // an overlapped commit window is at least observable.
    val period = math.max(1L, lockStaleMs / 3)
    val beatGate = new Object
    var released = false      // guarded by beatGate (monitor gives visibility)
    var beatFailures = 0L     // consecutive; guarded by beatGate
    var lastFailWarnMs = 0L   // guarded by beatGate
    // a "missed" beat is any beat that did not refresh OUR lock's mtime:
    // an IO failure, but equally a token that could not be read back or is
    // no longer ours (readToken maps transient read errors to None, and a
    // stale-broken lock shows another writer's token — both mean the
    // protection is not being renewed). Called only under beatGate.
    def missedBeat(why: => String): Unit = {
      beatFailures += 1
      val now = System.currentTimeMillis()
      if (beatFailures * period > lockStaleMs &&
          now - lastFailWarnMs > lockStaleMs) {
        lastFailWarnMs = now
        TableStore.log.warn(
          s"TableStore: lock heartbeat for '$table' has missed " +
          s"$beatFailures consecutive beats (> staleness bound) — the " +
          s"lock may be stale-broken under this live holder ($why)")
      }
    }
    val beat = TableStore.heartbeatPool.scheduleWithFixedDelay(
      () => beatGate.synchronized {
        if (!released) {
          try {
            if (readToken(lock).contains(token)) {
              val before = fs.getFileStatus(lock).getModificationTime
              fs.setTimes(lock, System.currentTimeMillis(), -1)
              if (fs.getFileStatus(lock).getModificationTime <= before) {
                val out = fs.create(lock, true)
                try out.write(token.getBytes("UTF-8"))
                finally out.close()
              }
              beatFailures = 0
            } else missedBeat("owner token unreadable or replaced at the lock path")
          } catch {
            case scala.util.control.NonFatal(e) => missedBeat(e.toString)
          }
        }
      },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      beat.cancel(false)
      beatGate.synchronized { released = true } // waits out an in-flight beat
      // one retry on the read: readToken maps a TRANSIENT read failure to
      // None, which must not silently skip deleting our own lock
      readToken(lock).orElse(readToken(lock)) match {
        case Some(t) if t == token => fs.delete(lock, false)
        case Some(_) =>
          // another writer's token at our lock path: we were stale-broken
          // while running (JVM freeze past the bound, or sustained beat
          // failures above) — the commit that just completed may have
          // overlapped the breaking writer's. Surface it; deleting THEIR
          // lock would cascade a third writer in.
          TableStore.log.warn(
            s"TableStore: lock for '$table' was lost while held (token " +
            "replaced by another writer) — the completed commit may have " +
            "overlapped a concurrent one")
        case None =>
          // None + file absent: normal (we were stale-broken and the
          // breaker deleted it). None + file PRESENT: the token cannot be
          // read, so deleting could destroy another writer's fresh lock —
          // leave it (a stale leftover of ours self-heals in one bound)
          // but say so, since writers block on it in the meantime.
          if (try fs.exists(lock)
              catch { case scala.util.control.NonFatal(_) => false })
            TableStore.log.warn(
              s"TableStore: release of '$table' could not read the lock's " +
              "owner token — leaving the lock file in place (if it is ours " +
              "it self-heals via the staleness bound)")
      }
    }
  }

  /** A table "exists" if its directory OR an interrupted-swap backup does —
    * recoverTable() heals the latter before any read. */
  def exists(table: String): Boolean =
    fs.exists(new Path(path(table))) || fs.exists(oldPath(table)) ||
      fs.exists(coldPath(table))

  /** Heal an interrupted overwrite() or compact():
    *   - target missing, a backup present -> the crash happened between the
    *     two renames; restore the backup so readers see the pre-swap table;
    *   - target present, compaction backup present -> the crash happened
    *     during the late-append merge; finish it (idempotent) using the
    *     manifest the backup carries, then drop the backup.
    *
    * The HEALING renames run under the commit lock: a LIVE writer between
    * atomicSwap's two renames looks exactly like a crash, and an unlocked
    * healer would rename the backup into place under it (failing its swap
    * and consuming its restore point). The fast path — no recovery
    * artifacts present, i.e. always, outside the seconds after a crash —
    * takes no lock and costs the same existence probes as before; the
    * state is re-derived inside the lock before healing, so losing the
    * race to the live writer (or another healer) degrades to a no-op. */
  private def recoverTable(table: String): Unit = {
    val target = new Path(URI.create(path(table)).normalize().toString)
    if (fs.exists(coldPath(table)) ||
        (!fs.exists(target) && fs.exists(oldPath(table))))
      withTableLock(table) { recoverTableLocked(table) }
  }

  private def recoverTableLocked(table: String): Unit = {
    val target = new Path(URI.create(path(table)).normalize().toString)
    val old = oldPath(table)
    val cold = coldPath(table)
    if (!fs.exists(target) && fs.exists(old)) {
      if (!fs.rename(old, target))
        sys.error(s"TableStore: failed to recover $table from ${old}")
    }
    if (!fs.exists(target) && fs.exists(cold)) {
      if (!fs.rename(cold, target))
        sys.error(s"TableStore: failed to recover $table from ${cold}")
      // the compaction this manifest described was rolled back — drop it so
      // a later recovery can't mistake it for a live snapshot
      val mf = new Path(target, ManifestFile)
      if (fs.exists(mf)) fs.delete(mf, false)
    }
    if (fs.exists(target) && fs.exists(cold))
      mergeLateAppends(table, target, cold)
  }

  /** Move every data file in `cold` that is NOT in its compaction manifest
    * (i.e. was appended after the compaction snapshot) into `target`, then
    * drop `cold`. Idempotent: already-moved files are simply gone from
    * `cold` on a re-run after a crash mid-merge. */
  private def mergeLateAppends(table: String, target: Path, cold: Path): Unit = {
    val manifest = new Path(cold, ManifestFile)
    if (!fs.exists(manifest))
      sys.error(s"TableStore: compaction backup $cold has no manifest — " +
        "refusing to guess which files are late appends")
    val snapNames = {
      val in = fs.open(manifest)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSet
      finally in.close()
    }
    for (f <- dataFiles(cold) if !snapNames.contains(f.getName)) {
      val dest = new Path(target, f.getName)
      if (!fs.rename(f, dest))
        sys.error(s"TableStore: failed to merge late append $f into $target")
    }
    fs.delete(cold, true)
  }

  /** The delicate two-rename swap shared by overwrite() and compaction:
    * clear any stale backup, move the live table to `backup`, move `tmp`
    * into place (restoring the backup if that fails). Callers own the
    * backup's eventual disposal. */
  private def atomicSwap(target: Path, tmp: Path, backup: Path): Unit = {
    if (fs.exists(backup)) fs.delete(backup, true)
    if (fs.exists(target) && !fs.rename(target, backup))
      sys.error(s"TableStore: rename $target -> $backup failed")
    if (!fs.rename(tmp, target)) {
      // put the previous table back before failing — never leave no table
      if (fs.exists(backup)) fs.rename(backup, target)
      sys.error(s"TableStore: rename $tmp -> $target failed")
    }
  }

  def read(table: String): DataFrame = {
    recoverTable(table)
    spark.read.parquet(path(table))
  }

  def readOrEmpty(table: String, like: DataFrame): DataFrame =
    if (exists(table)) read(table) else like.limit(0)

  /** Atomic keyed overwrite: write to a temp dir, then swap directories.
    * Readers never observe a half-written table (the swap is two renames —
    * the same commit discipline a lakehouse format provides via its log).
    * Every rename's boolean result is checked (HDFS signals failure by
    * returning false, not throwing); the `.__old__` backup is deleted only
    * after the new target is verified in place, and an interrupted swap is
    * healed on the next read via recoverTable(). */
  def overwrite(table: String, df: DataFrame, maxFiles: Int = 0,
                partitionBy: Seq[String] = Nil): Unit = {
    recoverTable(table)
    sweepStaleTmp(table)
    val target = new Path(URI.create(path(table)).normalize().toString)
    val tmp = tmpPath(table)
    val old = oldPath(table)
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    try {
      // partitionBy keeps a partitioned layout through the WHOLE-TABLE
      // atomic swap — the full-rewrite complement to overwritePartitions()
      // (which replaces only touched partitions but is not atomic across
      // them). A layout-changing rewrite of a partitioned table (schema
      // migration, re-clustering) must go through here: a crash mid-way
      // leaves the old table intact, never a table whose partitions mix
      // the old and new physical layouts.
      val w = out.write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(tmp.toString)
      withTableLock(table) {
        atomicSwap(target, tmp, old)
        if (fs.exists(target) && fs.exists(old)) fs.delete(old, true)
      }
    } finally if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Partition-scoped overwrite: the table is laid out as
    * `table/<partCol>=<v>/...`; ONLY the partitions present in `df` are
    * replaced (dynamic partition overwrite), untouched partitions are
    * neither read nor written. This is the 100 TB incremental-merge write
    * path: a daily batch touching one year rewrites one year, not a decade
    * of history. Reads prune directories on any `partCol` predicate.
    *
    * Coordination boundary: unlike overwrite()/append()/compact(), this
    * path does NOT serialize under the per-table commit lock — the commit
    * is Spark's dynamic-partition-overwrite committer (staging dirs +
    * per-partition replacement inside the table dir), which the lock's
    * whole-directory two-rename protocol cannot wrap without holding the
    * lock across an entire Spark job. Two writers overwriting DISJOINT
    * partitions are safe (each replaces only its own partition dirs);
    * racing it against compact()/overwrite() of the SAME table, or two
    * writers on the SAME partition, is unsupported — the engine never
    * does either (partitioned tables are written only by this path, one
    * dataset's runner/stream at a time; compaction targets the unpartitioned
    * revision log). A multi-writer deployment wants a lakehouse commit log. */
  def overwritePartitions(table: String, df: DataFrame,
                          partCols: Seq[String]): Unit = {
    recoverTable(table)
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path(table))
  }

  /** Append (revision log — append-only audit trail). Default is the
    * natural task parallelism — a large CDC stream must not serialize
    * through one writer; callers appending a handful of audit rows pass
    * maxFiles=1 to avoid small-file buildup.
    *
    * The Spark write lands in a private temp dir (full task parallelism,
    * no lock held); only the per-file renames into the table dir run under
    * the commit lock, AFTER recoverTable() — so an append arriving first
    * after a crashed compaction restores/merges the backup instead of
    * recreating the target dir and letting a later recovery mistake it for
    * compacted output (which would silently destroy every snapshot file). */
  def append(table: String, df: DataFrame, maxFiles: Int = 0): Unit = {
    sweepStaleTmp(table)
    val target = new Path(URI.create(path(table)).normalize().toString)
    val tmp = new Path(target.getParent,
      s".${target.getName}.__apd_${java.util.UUID.randomUUID().toString.take(8)}__")
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    try withTableLock(table) {
      recoverTableLocked(table)
      if (!fs.exists(target)) fs.mkdirs(target)
      landFiles(target, tmp)
    } finally fs.delete(tmp, true)
  }

  /** Land every data file from `tmp` into `target` by rename — all-or-
    * nothing against a FAILED rename: if one returns false partway through
    * the batch, the files already landed are renamed back into `tmp` before
    * raising, so the table never holds a half batch and a caller that
    * retries the whole batch cannot double-append the half that landed
    * (append's finally then deletes `tmp`, rolled-back files included).
    * A rollback rename that itself fails leaves that file landed and is
    * named in the error — the caller must inspect before retrying, exactly
    * like any other partial-commit report. The rename operation is
    * injectable (package-private, production default below) because a
    * mid-batch rename failure cannot be provoked from outside on the
    * local FS (its rename falls back to a copy) — fault injection is the
    * only deterministic test of the rollback path. */
  private[graft] def landFiles(target: Path, tmp: Path,
      rename: (Path, Path) => Boolean = tryRename): Unit = {
    val landed = scala.collection.mutable.ArrayBuffer.empty[Path]
    for (f <- dataFiles(tmp)) {
      val dest = new Path(target, f.getName)
      if (!rename(f, dest)) {
        val stuck = landed.filterNot(d => rename(d, new Path(tmp, d.getName)))
        sys.error(s"TableStore: append commit $f -> $target failed; " +
          (if (stuck.isEmpty) "batch rolled back, safe to retry"
           else s"rollback ALSO failed for ${stuck.mkString(", ")} — " +
             "those rows are landed, do not blindly retry the batch"))
      }
      landed += dest
    }
  }

  /** fs.rename with failure normalized to `false`: HDFS signals failure by
    * returning false, but the local FS's copy fallback (and object-store
    * shims) can THROW instead — both forms must take landFiles' rollback
    * path, not skip it. */
  private def tryRename(src: Path, dst: Path): Boolean =
    try fs.rename(src, dst)
    catch { case scala.util.control.NonFatal(_) => false }

  /** Compact an append-accumulated table: the revision log gains one
    * small file per merge (one per MICRO-BATCH on a long-lived stream —
    * thousands of files over weeks, and file-listing cost grows with
    * every one). Safe against a writer appending WHILE compaction runs:
    * the input file list is snapshotted first, the temp dir is written
    * from exactly those files, and any data file that appeared after the
    * snapshot is MERGED into the compacted table (renamed in, not
    * deleted) before the backup dir is dropped — so a micro-batch that
    * lands mid-compaction is preserved, not silently lost. The former
    * last window — an append racing the two renames themselves — is closed
    * by the per-table commit lock: append's file-landing and the swap
    * serialize, with no Spark job ever run under the lock.
    *
    * Coordination boundary: compact() is safe against concurrent
    * append()s (that is its contract). Against a concurrent overwrite()
    * or another compact() of the same table it LOSES SAFELY: the commit
    * re-checks under the lock that the snapshot's files are still live
    * and aborts as a no-op if the table was swapped underneath (see
    * compactSnapshot) — at worst the racing compaction's read job fails
    * loudly when the files vanish mid-scan. It never duplicates rows or
    * clobbers the winning writer. The engine still never races them
    * (compaction targets the append-only revision log). Scope: table-root
    * files only — unpartitioned tables; a partitioned table's files live
    * under `name=value` subdirs and are left untouched. Returns true iff
    * a compacted copy committed (false: missing table, or a lose-safe
    * abort against a racing writer). */
  def compact(table: String, targetFiles: Int = 1): Boolean = {
    if (!exists(table)) return false
    recoverTable(table)
    val target = new Path(URI.create(path(table)).normalize().toString)
    compactSnapshot(table, dataFiles(target), targetFiles)
  }

  /** The on-disk `name=value` partition layout of a table, in nesting
    * order — Nil for an unpartitioned (flat) table. Derived from the
    * DATA FILES' directory paths (one recursive listing — the same work
    * Spark's partition discovery does), not from a single-branch
    * directory walk: a stray empty or shallower sibling dir left by an
    * interrupted writer can't truncate or skew the answer, and every
    * file must agree on one column sequence (a disagreement means a
    * corrupted mixed tree and fails loudly here rather than at Spark's
    * partition discovery). Hidden-path filtering mirrors Spark's
    * `shouldFilterOutPathName` applied PER LEVEL, not just to the leaf
    * file name: a file under a hidden intermediate dir — a name starting
    * with '.' (`.spark-staging-<job>/...` from a crashed dynamic
    * overwrite) or with '_' and no '=' (`_temporary/...` from an
    * in-flight job) — is writer debris Spark itself would never read, so
    * it can't skew or block the answer here either. A `name=value` dir
    * still counts as a partition dir even with a leading underscore (the
    * store's own __year layout) — mirroring Spark, which exempts
    * '='-bearing names from the hidden-file convention. Used by
    * migrateDeclared to refuse to silently flatten a partitioned table.
    *
    * Cost: O(data files) in the worst case — one recursive listing of
    * the table tree, the same cost Spark's own partition discovery pays
    * on first read. Only reachable from migrateDeclared (a quiesced
    * admin operation), never on a hot path. The walk short-circuits on
    * the first CONFLICTING file (two layouts, or a mixed
    * plain/'='-bearing path): the first visible data file fixes the
    * candidate layout and every later file only needs to agree, so a
    * corrupt tree fails loudly without listing the rest of it. */
  def partitionColumns(table: String): Seq[String] = {
    if (!exists(table)) return Nil
    recoverTable(table)
    val root = new Path(URI.create(path(table)).normalize().toString)
    val rootDepth = root.depth()
    // Spark's shouldFilterOutPathName, per path level: '.'-prefixed always
    // hidden; '_'-prefixed hidden unless it's a name=value partition dir.
    def hidden(name: String): Boolean =
      name.startsWith(".") || (name.startsWith("_") && !name.contains('='))
    val it = fs.listFiles(root, true)
    val layouts = collection.mutable.Set.empty[Seq[String]]
    while (it.hasNext && layouts.size < 2 && !layouts.contains(Seq("__mixed__"))) {
      val f = it.next().getPath
      // dir segments strictly between the table root and the file
      val segs = Iterator.iterate(f.getParent)(_.getParent)
        .takeWhile(p => p != null && p.depth() > rootDepth)
        .map(_.getName).toSeq.reverse
      if (!hidden(f.getName) && !segs.exists(hidden)) {
        // partition dirs only: a plain (no '=') subdir tree is not a
        // Hive layout (Spark's flat read ignores it); all-or-nothing
        // per file path — a path MIXING '='-bearing and plain segments
        // is a corrupt tree and flags loudly
        if (segs.forall(_.contains('=')))
          layouts += segs.map(_.takeWhile(_ != '='))
        else if (segs.exists(_.contains('=')))
          layouts += Seq("__mixed__")
      }
    }
    if (layouts.isEmpty) Nil
    else {
      require(layouts.size == 1 && layouts.head != Seq("__mixed__"),
        s"table '$table': inconsistent partition directory layout across " +
          s"data files: ${layouts.toSeq.map(_.mkString("/")).sorted.mkString("; ")}")
      layouts.head
    }
  }

  /** Top-level data-file count — one directory listing, the cheap signal a
    * compaction cadence keys on. 0 for a missing table. Counts the table
    * ROOT only: for a partitioned table (files under `name=value` subdirs)
    * this returns 0, so compactIfOver never fires there — compact() and
    * compactIfOver() apply to unpartitioned tables only (the engine's one
    * compaction target, the flat revision log). */
  def dataFileCount(table: String): Int =
    if (!exists(table)) 0
    else {
      recoverTable(table)
      dataFiles(new Path(URI.create(path(table)).normalize().toString)).size
    }

  /** Cadence form of compact(): compact only once the file count EXCEEDS
    * `threshold`, so a caller on a hot loop (a stream appending one file
    * per micro-batch) can invoke it every batch and pay one directory
    * listing until the log actually needs collapsing. Returns true iff a
    * compaction actually COMMITTED: false when the count is at/under the
    * threshold, and also when compact() itself lost safely to a racing
    * writer (table dropped, stale-snapshot abort under the commit lock).
    * Unpartitioned tables only, like compact(). Same safety contract as
    * compact(). */
  def compactIfOver(table: String, threshold: Int, targetFiles: Int = 1): Boolean =
    dataFileCount(table) > math.max(0, threshold) && compact(table, targetFiles)

  private def dataFiles(dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath)

  /** Compact exactly `snapshot`'s files; anything that lands in the table
    * dir after the snapshot is merged into the result, not deleted — even
    * across a crash: the snapshot manifest is written INTO the table dir
    * under the commit lock just before the swap, so it travels with the
    * backup and recoverTable() can finish an interrupted merge on the next
    * access instead of deleting unmerged micro-batches with the backup.
    *
    * Under the lock, BEFORE committing, the live file set is re-checked
    * against the snapshot: a concurrent compact() or overwrite() that
    * swapped the table in the meantime replaced the snapshot's files, and
    * committing our (now stale) compacted copy over it would re-land every
    * snapshot row as a "late append" — every row duplicated. If any
    * snapshot file is gone, this compaction ABORTS as a no-op (the rows
    * live on in whatever replaced them; only the redundant compacted copy
    * is discarded). This makes concurrent compact-vs-compact and
    * compact-vs-overwrite lose-safely: the loser aborts (quietly when the
    * race already happened at entry — the existence probe below; loudly if
    * the files vanish mid-scan), never commits a duplicate or clobbers the
    * winner. Returns true iff the compacted copy actually COMMITTED (the
    * swap ran); false on empty snapshot or either abort path, so callers
    * (compact, compactIfOver) can report truthfully. Package-private so
    * the snapshot-vs-late-append race is testable deterministically (the
    * test passes a deliberately stale snapshot). */
  private[graft] def compactSnapshot(table: String, snapshot: Seq[Path],
                                     targetFiles: Int): Boolean = {
    if (snapshot.isEmpty) return false
    // lost already: a racing compact/overwrite consumed the snapshot's
    // files before we even started reading — abort before burning a Spark
    // job on a commit the under-lock recheck would refuse anyway
    if (!snapshot.forall(fs.exists)) return false
    sweepStaleTmp(table)
    val target = new Path(URI.create(path(table)).normalize().toString)
    val tmp = tmpPath(table)
    val cold = coldPath(table)
    try {
      spark.read.parquet(snapshot.map(_.toString): _*)
        .coalesce(targetFiles max 1)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      withTableLock(table) {
        val live =
          if (fs.exists(target)) dataFiles(target).map(_.getName).toSet
          else Set.empty[String]
        if (snapshot.forall(p => live.contains(p.getName))) {
          // manifest then swap, both under the lock: the manifest can only
          // ever describe the swap that immediately follows. A file appended
          // between the snapshot and the lock is simply absent from it and
          // gets merged forward like any other late append.
          val mf = fs.create(new Path(target, ManifestFile), true)
          try mf.write(snapshot.map(_.getName).mkString("\n").getBytes("UTF-8"))
          finally mf.close()
          atomicSwap(target, tmp, cold)
          mergeLateAppends(table, target, cold)
          true
        } else false
      }
    } finally if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Drop the table AND every recovery artifact — otherwise an `.__old__`
    * or `.__cold__` left by an interrupted swap keeps exists() true and the
    * next read() resurrects the dropped table via recoverTable().
    *
    * Runs under the commit lock: an unlocked drop racing an in-flight
    * append/overwrite COMMIT would delete the holder's lock (admitting
    * another writer mid-commit) and the holder's subsequent renames could
    * partially resurrect the dropped table. Under the lock, an in-flight
    * commit finishes (or aborts) first and the drop then removes its
    * result whole. The lock file itself is deleted LAST, by the normal
    * release path, as its owner. Boundary (documented, not defended): a
    * writer whose Spark job is still writing its PRIVATE tmp dir (no lock
    * held during the job) loses that dir here — its commit then fails
    * loudly with the source data untouched, which is what dropping the
    * table out from under a writer means. */
  def drop(table: String): Unit = {
    val target = new Path(URI.create(path(table)).normalize().toString)
    val pfx = leakPrefixes(target.getName)
    withTableLock(table) {
      Seq(target, oldPath(table), coldPath(table))
        .foreach(p => if (fs.exists(p)) fs.delete(p, true))
      // every per-invocation temp/append dir and stray lock breaker, any age
      try fs.listStatus(target.getParent).foreach { s =>
        if (pfx.exists(s.getPath.getName.startsWith)) fs.delete(s.getPath, true)
      } catch { case _: java.io.FileNotFoundException => () }
    }
  }
}

object TableStore {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[TableStore])

  /** One JVM-wide daemon thread drives every held lock's heartbeat: beats
    * are sub-millisecond metadata touches at a many-second cadence, so a
    * single thread serves any realistic number of concurrently-held locks
    * (the engine holds at most a handful, briefly). Daemon — never blocks
    * JVM exit; an exiting holder's lock is healed by the staleness bound. */
  private val heartbeatPool: java.util.concurrent.ScheduledThreadPoolExecutor = {
    val p = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val t = new Thread(r, "tablestore-lock-heartbeat")
      t.setDaemon(true)
      t
    })
    p.setRemoveOnCancelPolicy(true)
    p
  }
}
