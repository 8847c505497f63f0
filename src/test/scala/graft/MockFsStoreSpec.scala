package graft

import graft.store.TableStore
import org.apache.hadoop.fs.Path
import java.nio.file.Files

/** Drives `TableStore`'s DATA-PLANE commit protocol — the two-rename
  * atomic swap, locked append file-landing, compaction, and
  * interrupted-swap recovery — through the mock remote FileSystem
  * (`MockHdfsFileSystem`: HDFS fail-if-destination-exists rename,
  * object-store no-op setTimes). `MockFsLockSpec` covers the LOCK on this
  * filesystem; this spec covers what the lock protects. The swap protocol
  * was designed against HDFS rename semantics (every rename's boolean is
  * checked, destinations are cleared or absent by construction), so each
  * of these paths must complete with renames that REFUSE occupied
  * destinations — a silent POSIX-replace would mask a protocol hole.
  */
class MockFsStoreSpec extends SparkSuite with MockFsFixture {
  import spark.implicits._

  test("overwrite/read round-trip and re-overwrite swap on HDFS rename semantics") {
    val (store, _, _) = newMockStore()
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    store.overwrite("t", v1, maxFiles = 1)
    assert(store.read("t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // second overwrite exercises the full two-rename swap over an EXISTING
    // table (target -> backup, tmp -> target, backup delete) — the path
    // where fail-if-exists rename semantics actually bite
    val v2 = Seq((3L, "c")).toDF("id", "v")
    store.overwrite("t", v2, maxFiles = 1)
    assert(store.read("t").as[(Long, String)].collect().toSeq == Seq((3L, "c")))
  }

  test("append lands files under the lock; compact folds them on the mock FS") {
    val (store, root, fs) = newMockStore()
    store.overwrite("log", Seq((1L, "x")).toDF("id", "v"), maxFiles = 1)
    store.append("log", Seq((2L, "y")).toDF("id", "v"), maxFiles = 1)
    store.append("log", Seq((3L, "z")).toDF("id", "v"), maxFiles = 1)
    assert(store.read("log").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "y"), (3L, "z")))
    assert(store.compact("log", targetFiles = 1))
    assert(store.read("log").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "y"), (3L, "z")))
    // compaction's cold backup is disposed of after the swap completes
    assert(!fs.exists(new Path(s"$root/.log.__cold__")),
      "compaction backup left behind")
  }

  test("interrupted swap (target gone, backup present) heals on next read") {
    val (store, root, fs) = newMockStore()
    store.overwrite("r", Seq((7L, "q")).toDF("id", "v"), maxFiles = 1)
    // simulate a crash between atomicSwap's two renames: live table moved
    // to the backup name, nothing at the target
    assert(fs.rename(new Path(s"$root/r"), new Path(s"$root/.r.__old__")))
    assert(store.read("r").as[(Long, String)].collect().toSeq == Seq((7L, "q")))
    assert(fs.exists(new Path(s"$root/r")) &&
      !fs.exists(new Path(s"$root/.r.__old__")),
      "recovery did not restore the table from the backup")
  }
}
