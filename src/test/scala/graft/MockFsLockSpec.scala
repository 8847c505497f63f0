package graft

import graft.store.TableStore
import org.apache.hadoop.fs.Path
import java.nio.file.Files

/** Drives `TableStore.withTableLock`'s NON-local branch (the `isLocalFs`
  * fork at acquisition, rename-back, and heartbeat) through a mock remote
  * FileSystem with HDFS rename semantics and object-store no-op `setTimes`
  * — the branch the r15 local-FS fixes forked away from direct coverage.
  */
class MockFsLockSpec extends SparkSuite with MockFsFixture {

  private def get(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("non-local branch: acquire/release via fs.create(false); no NIO routing") {
    val (store, root, fs) = newMockStore()
    val lock = new Path(s"$root/.t.__lock__")
    var ran = false
    store.withTableLock("t") {
      ran = true
      assert(fs.exists(lock), "lock file absent while held (non-local create path)")
    }
    assert(ran)
    assert(!fs.exists(lock), "lock not deleted at release")
  }

  test("no-op setTimes: heartbeat falls back to token-preserving rewrite") {
    val (store, root, fs) = newMockStore()
    val lock = new Path(s"$root/.hb.__lock__")
    val prior = store.lockStaleMs
    store.lockStaleMs = 600L // beat period 200ms
    try {
      var mtime0 = 0L; var token0 = ""
      var mtime1 = 0L; var token1 = ""
      store.withTableLock("hb") {
        mtime0 = fs.getFileStatus(lock).getModificationTime
        token0 = get(fs, lock)
        Thread.sleep(1000) // several beats; setTimes no-ops, so only the
                           // rewrite fallback can advance the mtime
        mtime1 = fs.getFileStatus(lock).getModificationTime
        token1 = get(fs, lock)
      }
      assert(mtime1 > mtime0,
        s"heartbeat did not advance lock mtime on a no-op-setTimes FS " +
        s"($mtime0 -> $mtime1) — rewrite fallback not taken")
      assert(token1 == token0, "rewrite did not preserve the owner token")
    } finally store.lockStaleMs = prior
  }

  test("non-local rename-back: refused on occupied path, succeeds on free") {
    val (store, root, fs) = newMockStore()
    def put(p: Path, s: String): Unit = {
      val o = fs.create(p, true); o.write(s.getBytes("UTF-8")); o.close()
    }
    val lock = new Path(s"$root/.rb.__lock__")
    val breaker = new Path(s"$root/.rb.__lock__.break_t")
    // occupied destination: HDFS rename semantics must refuse, leaving the
    // fresh lock byte-intact (this is the fs.rename branch, not the local
    // hard-link one)
    put(lock, "fresh-owner"); put(breaker, "stolen")
    assert(!store.renameBackExclusive(breaker, lock))
    assert(get(fs, lock) == "fresh-owner")
    // free destination: rename-back restores the stolen lock
    fs.delete(lock, false)
    assert(store.renameBackExclusive(breaker, lock))
    assert(get(fs, lock) == "stolen")
    assert(!fs.exists(breaker))
  }

  test("non-local branch: dead holder's lock is stale-broken and reacquired") {
    val (store, root, fs) = newMockStore()
    val lock = new Path(s"$root/.dead.__lock__")
    val prior = store.lockStaleMs
    store.lockStaleMs = 300L
    try {
      // a crashed JVM's lock: exists, never beats. setTimes is a no-op on
      // this FS, so staleness comes from real wall-clock aging.
      val o = fs.create(lock, true); o.write("dead".getBytes("UTF-8")); o.close()
      Thread.sleep(700)
      var entered = false
      store.withTableLock("dead") { entered = true }
      assert(entered, "stale lock not broken on the non-local branch")
      assert(!fs.exists(lock))
    } finally store.lockStaleMs = prior
  }

  test("beat failures never break the holder: body completes, lock released") {
    val (store, root, fs) = newMockStore()
    val lock = new Path(s"$root/.flaky.__lock__")
    val prior = store.lockStaleMs
    store.lockStaleMs = 300L // ~100ms beats, all of which will throw
    MockHdfsFileSystem.throwOnSetTimes.set(true)
    try {
      var ran = false
      store.withTableLock("flaky") {
        Thread.sleep(500) // several throwing beats while held
        ran = true
      }
      assert(ran, "holder body did not complete under beat failures")
      assert(!fs.exists(lock), "lock not released after beat failures")
    } finally {
      MockHdfsFileSystem.throwOnSetTimes.set(false)
      store.lockStaleMs = prior
    }
  }

  test("release never leaves an orphan lock behind a racing rewrite beat") {
    val (store, root, fs) = newMockStore()
    val lock = new Path(s"$root/.orph.__lock__")
    val prior = store.lockStaleMs
    // tiny bound -> 50ms beat period; every beat REWRITES the lock (no-op
    // setTimes), so pre-fix a beat in flight at release time could
    // recreate the just-deleted file. The beatGate handshake must make
    // that impossible on every iteration.
    store.lockStaleMs = 150L
    try {
      (1 to 30).foreach { i =>
        store.withTableLock("orph") { Thread.sleep(60) }
        assert(!fs.exists(lock),
          s"iteration $i: release left an orphan lock behind a racing beat")
      }
    } finally store.lockStaleMs = prior
  }
}
