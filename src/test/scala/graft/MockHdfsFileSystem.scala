package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import java.net.URI

/** A local-disk Hadoop FileSystem masquerading as a REMOTE one, so tests
  * can drive `TableStore`'s non-local lock branch (`isLocalFs == false`)
  * through its real code paths without a cluster:
  *
  *   - scheme `mockhdfs` (not `file`), so `createExclusive` takes the
  *     `fs.create(overwrite=false)` path and `renameBackExclusive` takes
  *     the `fs.rename` path instead of their NIO local forks;
  *   - `rename` REFUSES an existing destination (HDFS semantics). POSIX
  *     rename(2) silently replaces — which is exactly the hazard the
  *     non-local branch relies on HDFS to NOT have, so the mock must not
  *     inherit it from the local disk underneath;
  *   - `setTimes` is a NO-OP (object-store semantics: object mtime is
  *     immutable in place), forcing the lock heartbeat's verified-beat
  *     fallback to REWRITE the lock file to advance its timestamp.
  *
  * Registered per-conf via `fs.mockhdfs.impl`; backed by a temp directory
  * on local disk, so file contents/mtimes behave normally otherwise.
  */
class MockHdfsFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockhdfs:///")
  override def getScheme: String = "mockhdfs"

  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)

  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    if (MockHdfsFileSystem.throwOnSetTimes.get())
      throw new java.io.IOException("injected: setTimes throttled")
    else () // object-store no-op
}

object MockHdfsFileSystem {
  /** Failure injection for the lock heartbeat: when set, every setTimes
    * throws (a throttled/flaky store) instead of no-op'ing — the beat must
    * swallow it (counting a missed beat) and the holder/release must be
    * unaffected. Global because Hadoop's FileSystem cache hands every test
    * the same instance per scheme. */
  val throwOnSetTimes = new java.util.concurrent.atomic.AtomicBoolean(false)
}

/** Shared bootstrap for suites driving `TableStore` through the mock
  * remote filesystem — one owner for the scheme registration and root
  * layout, so MockFsLockSpec and MockFsStoreSpec cannot diverge. */
trait MockFsFixture { self: SparkSuite =>
  protected def newMockStore(): (graft.store.TableStore, String,
      org.apache.hadoop.fs.FileSystem) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.mockhdfs.impl", classOf[MockHdfsFileSystem].getName)
    val local = java.nio.file.Files.createTempDirectory("graft-mockfs").toString
    val root = s"mockhdfs://$local"
    (new graft.store.TableStore(spark, root), root,
      new org.apache.hadoop.fs.Path(root).getFileSystem(hconf))
  }
}
