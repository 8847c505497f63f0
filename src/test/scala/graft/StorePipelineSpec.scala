package graft

import graft.store.TableStore
import org.apache.hadoop.fs.Path
import java.nio.file.Files

/** TableStore atomic-swap semantics incl. interrupted-swap recovery
  * (ADVICE round-1 finding). */
class StorePipelineSpec extends SparkSuite {
  import spark.implicits._

  private def newStore() = {
    val dir = Files.createTempDirectory("graft-store").toString
    new TableStore(spark, dir) -> dir
  }

  test("overwrite then read round-trips; second overwrite replaces") {
    val (store, _) = newStore()
    store.overwrite("t1", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(store.read("t1").count() == 2)
    store.overwrite("t1", Seq((3, "c")).toDF("k", "v"))
    val out = store.read("t1").collect()
    assert(out.length == 1 && out.head.getInt(0) == 3)
  }

  test("interrupted swap (target gone, backup present) is healed on read") {
    val (store, dir) = newStore()
    store.overwrite("t2", Seq((1, "a")).toDF("k", "v"))
    // simulate a crash between rename(target->old) and rename(tmp->target)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$dir/t2")
    val old = new Path(s"$dir/.t2.__old__")
    assert(fs.rename(target, old))
    assert(!fs.exists(target) && fs.exists(old))
    assert(store.exists("t2"))           // backup counts as existing
    assert(store.read("t2").count() == 1) // read heals and succeeds
    assert(fs.exists(target) && !fs.exists(old))
  }

  test("compact: per-append small files collapse to one, content unchanged") {
    val (store, dir) = newStore()
    (1 to 5).foreach(i =>
      store.append("revlog", Seq((i, s"v$i")).toDF("k", "v"), maxFiles = 1))
    def files() = new java.io.File(s"$dir/revlog").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() == 5) // one file per append — the long-lived-stream shape
    val before = store.read("revlog").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    store.compact("revlog")
    assert(files() == 1)
    assert(store.read("revlog").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == before)
    // the log keeps accepting appends after compaction
    store.append("revlog", Seq((6, "v6")).toDF("k", "v"), maxFiles = 1)
    assert(store.read("revlog").count() == 6)
    store.compact("missing") // no-op on absent tables, never throws
  }

  test("compact: a file appended after the snapshot survives (merged, not deleted)") {
    val (store, dir) = newStore()
    (1 to 3).foreach(i =>
      store.append("revlog", Seq((i, s"v$i")).toDF("k", "v"), maxFiles = 1))
    // snapshot the current file list, THEN append — exactly the race of a
    // micro-batch landing between compact's listing and its swap
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshot = fs.listStatus(new Path(s"$dir/revlog")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    store.append("revlog", Seq((4, "late")).toDF("k", "v"), maxFiles = 1)
    assert(store.compactSnapshot("revlog", snapshot, targetFiles = 1))
    val out = store.read("revlog").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "v1"), (2, "v2"), (3, "v3"), (4, "late")))
    // 1 compacted file + the merged late file
    assert(new java.io.File(s"$dir/revlog").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
  }

  test("compact recovery: a crash between swap and merge loses nothing") {
    val (store, dir) = newStore()
    (1 to 3).foreach(i =>
      store.append("revlog", Seq((i, s"v$i")).toDF("k", "v"), maxFiles = 1))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tableDir = new Path(s"$dir/revlog")
    def names() = fs.listStatus(tableDir).toSeq.map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    val snapNames = names()
    store.append("revlog", Seq((4, "late")).toDF("k", "v"), maxFiles = 1)
    // hand-build the exact on-disk state of a compaction that died right
    // after the two renames: manifest + pre-swap table (incl. the late
    // file) in .__cold__, compacted snapshot content as the live table
    val mf = fs.create(new Path(tableDir, "_compact_manifest"), true)
    mf.write(snapNames.mkString("\n").getBytes("UTF-8")); mf.close()
    assert(fs.rename(tableDir, new Path(s"$dir/.revlog.__cold__")))
    Seq((1, "v1"), (2, "v2"), (3, "v3")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/revlog")
    assert(store.exists("revlog"))
    // first read heals: the late append is merged forward, backup dropped
    val out = store.read("revlog").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "v1"), (2, "v2"), (3, "v3"), (4, "late")))
    assert(!fs.exists(new Path(s"$dir/.revlog.__cold__")))
  }

  test("append straight after a crashed compaction heals first — snapshot survives") {
    // ADVICE r11 (medium): crash between compactSnapshot's two renames
    // leaves target gone and .__cold__ holding the WHOLE pre-compaction
    // table + manifest. An append that recreated the target dir would make
    // the next recovery treat the new dir as compacted output and delete
    // every manifest-listed snapshot file with the backup. append() must
    // recover (restore the backup) BEFORE landing any file.
    val (store, dir) = newStore()
    (1 to 3).foreach(i =>
      store.append("revlog", Seq((i, s"v$i")).toDF("k", "v"), maxFiles = 1))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tableDir = new Path(s"$dir/revlog")
    val snapNames = fs.listStatus(tableDir).toSeq.map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    val mf = fs.create(new Path(tableDir, "_compact_manifest"), true)
    mf.write(snapNames.mkString("\n").getBytes("UTF-8")); mf.close()
    assert(fs.rename(tableDir, new Path(s"$dir/.revlog.__cold__")))
    // crash point: target missing, cold holds rows 1-3 + manifest
    store.append("revlog", Seq((4, "late")).toDF("k", "v"), maxFiles = 1)
    val out = store.read("revlog").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "v1"), (2, "v2"), (3, "v3"), (4, "late")))
    assert(!fs.exists(new Path(s"$dir/.revlog.__cold__")))
    // the rolled-back compaction's manifest must not linger in the table
    assert(!fs.exists(new Path(tableDir, "_compact_manifest")))
  }

  test("drop removes recovery backups too — no resurrection via exists/read") {
    val (store, dir) = newStore()
    store.overwrite("t3", Seq((1, "a")).toDF("k", "v"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // interrupted swap: live table sits in the .__old__ backup
    assert(fs.rename(new Path(s"$dir/t3"), new Path(s"$dir/.t3.__old__")))
    assert(store.exists("t3"))
    store.drop("t3")
    assert(!store.exists("t3"))
    assert(!fs.exists(new Path(s"$dir/.t3.__old__")))
    // same for a compaction backup
    store.overwrite("t4", Seq((1, "a")).toDF("k", "v"))
    val mf = fs.create(new Path(s"$dir/t4/_compact_manifest"), true)
    mf.write("x".getBytes("UTF-8")); mf.close()
    assert(fs.rename(new Path(s"$dir/t4"), new Path(s"$dir/.t4.__cold__")))
    store.drop("t4")
    assert(!store.exists("t4"))
    assert(!fs.exists(new Path(s"$dir/.t4.__cold__")))
  }

  test("commit lock: a held lock delays append; a stale lock is broken") {
    val (store, dir) = newStore()
    store.append("locked", Seq((1, "a")).toDF("k", "v"), maxFiles = 1)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new Path(s"$dir/.locked.__lock__")
    // stale holder (crashed writer): mtime far past the staleness bound —
    // append must break the lock and proceed rather than hang
    fs.create(lock, true).close()
    fs.setTimes(lock, System.currentTimeMillis() - 120000L, -1)
    store.append("locked", Seq((2, "b")).toDF("k", "v"), maxFiles = 1)
    assert(store.read("locked").count() == 2)
    assert(!fs.exists(lock)) // released after commit
    // live holder: append blocks until the lock is released by its owner
    fs.create(lock, true).close()
    val releaser = new Thread(() => { Thread.sleep(400); fs.delete(lock, false) })
    releaser.start()
    store.append("locked", Seq((3, "c")).toDF("k", "v"), maxFiles = 1)
    releaser.join()
    assert(store.read("locked").count() == 3)
    assert(!fs.exists(lock))
  }

  test("crashed-writer temp dirs: swept when stale, kept when live, gone on drop") {
    val (store, dir) = newStore()
    store.overwrite("t5", Seq((1, "a")).toDF("k", "v"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staleApd = new Path(s"$dir/.t5.__apd_deadbeef__")
    val staleTmp = new Path(s"$dir/.t5.__tmp_deadbeef__")
    val liveTmp = new Path(s"$dir/.t5.__tmp_cafebabe__")
    Seq(staleApd, staleTmp, liveTmp).foreach(fs.mkdirs)
    val old = System.currentTimeMillis() - 7L * 3600 * 1000 // > 6h bound
    Seq(staleApd, staleTmp).foreach(p => fs.setTimes(p, old, -1))
    // the sweep (run on every 64th write) reclaims the stale leaks but
    // never a live writer's dir
    store.sweepLeakedTmp("t5")
    assert(!fs.exists(staleApd) && !fs.exists(staleTmp))
    assert(fs.exists(liveTmp))
    store.append("t5", Seq((2, "b")).toDF("k", "v"), maxFiles = 1)
    assert(store.read("t5").count() == 2)
    // drop reclaims unconditionally (the table is going away)
    store.drop("t5")
    assert(!fs.exists(liveTmp))
  }

  test("concurrent overwrites of one table: last committed wins, table stays readable") {
    val (store, _) = newStore()
    // per-invocation private tmp dirs: neither writer can delete or swap
    // the other's in-progress output; the lock serializes the two swaps
    val threads = (0 until 4).map { i =>
      new Thread(() => store.overwrite("race",
        Seq((i, s"w$i")).toDF("k", "v"), maxFiles = 1))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val out = store.read("race").collect()
    assert(out.length == 1 && out.head.getString(1).startsWith("w"))
  }

  test("append/compact/overwrite race stress: every appended row survives") {
    val (store, _) = newStore()
    // the CDC-log shape: many appenders racing periodic compactions. Every
    // appended row must be in the final table — compaction merges late
    // appends, never drops them; the commit lock serializes file-landing
    // against the swap; per-invocation temp dirs keep writers private.
    val appenders = (0 until 3).map { t =>
      new Thread(() => {
        for (i <- 0 until 8)
          store.append("log", Seq((t * 100 + i, s"t$t-$i")).toDF("k", "v"),
            maxFiles = 1)
      })
    }
    val compactor = new Thread(() => {
      for (_ <- 0 until 5) { store.compact("log"); Thread.sleep(20) }
    })
    (appenders :+ compactor).foreach(_.start())
    (appenders :+ compactor).foreach(_.join())
    store.compact("log")
    val keys = store.read("log").collect().map(_.getInt(0)).toSet
    val expect = (for (t <- 0 until 3; i <- 0 until 8) yield t * 100 + i).toSet
    assert(keys == expect, s"lost ${expect -- keys}, phantom ${keys -- expect}")
  }

  test("recovery waits for a live commit lock — a reader never heals under a writer") {
    val (store, dir) = newStore()
    store.overwrite("t6", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a live writer mid-swap: target renamed away, commit lock held fresh.
    // an unlocked healer here would rename the backup into place UNDER the
    // writer, consuming the restore point its swap depends on
    assert(fs.rename(new Path(s"$dir/t6"), new Path(s"$dir/.t6.__old__")))
    fs.create(new Path(s"$dir/.t6.__lock__"), true).close()
    @volatile var n = -1L
    val reader = new Thread(() => { n = store.read("t6").count() })
    reader.start()
    Thread.sleep(400)
    // reader is blocked on the lock; the mid-swap state is untouched
    assert(n == -1L)
    assert(fs.exists(new Path(s"$dir/.t6.__old__")) &&
      !fs.exists(new Path(s"$dir/t6")))
    // writer "crashes" (lock released without finishing): reader acquires,
    // heals the interrupted swap, and completes
    fs.delete(new Path(s"$dir/.t6.__lock__"), false)
    reader.join(30000)
    assert(n == 2)
    assert(fs.exists(new Path(s"$dir/t6")) &&
      !fs.exists(new Path(s"$dir/.t6.__old__")))
  }

  test("readOrEmpty on a missing table returns an empty frame of the template schema") {
    val (store, _) = newStore()
    val like = Seq((1, "a")).toDF("k", "v")
    val out = store.readOrEmpty("nope", like)
    assert(out.isEmpty && out.schema == like.schema)
  }

  test("append commit rolls back landed files when a mid-batch rename fails") {
    // ADVICE r12 (low): a rename failing partway through append's multi-file
    // commit must not leave a half batch in the table — a caller retrying
    // the whole batch would double-append the half that landed. The failure
    // is injected (the local FS can't be made to fail a rename on demand).
    val (store, dir) = newStore()
    store.overwrite("lf", Seq((0, "base")).toDF("k", "v"), maxFiles = 1)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$dir/lf")
    val tmp = new Path(s"$dir/.lf.__apd_test__")
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .repartition(3).write.parquet(tmp.toString)
    def parts(p: Path) = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    val batch = parts(tmp).sorted
    assert(batch.size == 3)
    val before = parts(target).toSet
    // forward rename of the SECOND batch file fails; every other rename
    // (incl. the rollback of the first) succeeds
    var calls = 0
    val failSecond = (src: Path, dst: Path) => {
      if (dst.getParent == target) { calls += 1; if (calls == 2) false
        else fs.rename(src, dst) }
      else fs.rename(src, dst)
    }
    val err = intercept[RuntimeException](store.landFiles(target, tmp, failSecond))
    assert(err.getMessage.contains("rolled back, safe to retry"))
    assert(parts(target).toSet == before)      // no half batch landed
    assert(parts(tmp).sorted == batch)         // every file back in tmp
    assert(store.read("lf").count() == 1)      // table content untouched
    // retrying the identical batch now succeeds whole
    store.landFiles(target, tmp, fs.rename)
    assert(store.read("lf").count() == 4)
    fs.delete(tmp, true)
  }

  test("append rollback failure names the stuck file instead of claiming safety") {
    val (store, dir) = newStore()
    store.overwrite("lf2", Seq((0, "base")).toDF("k", "v"), maxFiles = 1)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$dir/lf2")
    val tmp = new Path(s"$dir/.lf2.__apd_test__")
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .repartition(2).write.parquet(tmp.toString)
    // forward rename of file 2 fails AND the rollback of file 1 fails:
    // the error must name the landed file so the caller doesn't blind-retry
    var fwd = 0
    val failBoth = (src: Path, dst: Path) => {
      if (dst.getParent == target) { fwd += 1; if (fwd == 2) false
        else fs.rename(src, dst) }
      else false // rollback direction: refuse
    }
    val err = intercept[RuntimeException](store.landFiles(target, tmp, failBoth))
    assert(err.getMessage.contains("rollback ALSO failed"))
    assert(err.getMessage.contains("do not blindly retry"))
    fs.delete(tmp, true)
  }

  test("stale-snapshot compaction aborts as a no-op after a racing overwrite") {
    // ADVICE r12 (medium): compactSnapshot committing a snapshot whose
    // files a concurrent overwrite/compact replaced would re-land every
    // snapshot row as a "late append" — each row duplicated. The commit
    // now re-checks the live file set under the lock and aborts.
    val (store, dir) = newStore()
    (1 to 3).foreach(i =>
      store.append("cs", Seq((i, s"v$i")).toDF("k", "v"), maxFiles = 1))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = fs.listStatus(new Path(s"$dir/cs")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    // the race: another writer swaps the table before our commit
    store.overwrite("cs", Seq((9, "winner")).toDF("k", "v"), maxFiles = 1)
    assert(!store.compactSnapshot("cs", stale, targetFiles = 1)) // reports the abort
    val out = store.read("cs").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((9, "winner"))) // winner intact, zero duplicates
    // the aborted compaction leaves no manifest to confuse recovery
    assert(!fs.exists(new Path(s"$dir/cs/_compact_manifest")))
  }

  test("compact-vs-compact: the second commit of one snapshot is a no-op") {
    val (store, dir) = newStore()
    (1 to 3).foreach(i =>
      store.append("cc", Seq((i, s"v$i")).toDF("k", "v"), maxFiles = 1))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = fs.listStatus(new Path(s"$dir/cc")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    assert(store.compactSnapshot("cc", snap, targetFiles = 1))
    val after = store.read("cc").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    // a second compactor that raced to the same snapshot commits nothing:
    // the snapshot's files were consumed by the first swap — and it
    // REPORTS the no-op (compactIfOver surfaces this same signal)
    assert(!store.compactSnapshot("cc", snap, targetFiles = 1))
    assert(store.read("cc").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == after)
    assert(new java.io.File(s"$dir/cc").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
  }

  test("drop takes the commit lock: blocked by a live writer, breaks a stale one") {
    // ADVICE r12 (low): an unlocked drop racing an in-flight commit would
    // delete the holder's lock mid-commit. drop() now serializes like any
    // other committer.
    val (store, dir) = newStore()
    store.overwrite("d1", Seq((1, "a")).toDF("k", "v"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new Path(s"$dir/.d1.__lock__")
    // live holder: drop must wait for the release, not delete the lock
    fs.create(lock, true).close()
    @volatile var dropped = false
    val dropper = new Thread(() => { store.drop("d1"); dropped = true })
    dropper.start()
    Thread.sleep(400)
    assert(!dropped && store.exists("d1")) // still waiting, table intact
    fs.delete(lock, false)                 // holder finishes
    dropper.join(30000)
    assert(dropped && !store.exists("d1"))
    assert(!fs.exists(lock))
    // stale holder (crashed writer): drop breaks the lock and proceeds
    store.overwrite("d2", Seq((1, "a")).toDF("k", "v"))
    val lock2 = new Path(s"$dir/.d2.__lock__")
    fs.create(lock2, true).close()
    fs.setTimes(lock2, System.currentTimeMillis() - 120000L, -1)
    store.drop("d2")
    assert(!store.exists("d2") && !fs.exists(lock2))
  }

  test("compactIfOver: the cadence compacts only past the threshold") {
    val (store, _) = newStore()
    assert(store.dataFileCount("nope") == 0)
    assert(!store.compactIfOver("nope", 1)) // missing: false, never throws
    (1 to 3).foreach(i =>
      store.append("cad", Seq((i, s"v$i")).toDF("k", "v"), maxFiles = 1))
    assert(store.dataFileCount("cad") == 3)
    assert(!store.compactIfOver("cad", threshold = 3)) // 3 <= 3: one listing, no job
    assert(store.dataFileCount("cad") == 3)
    store.append("cad", Seq((4, "v4")).toDF("k", "v"), maxFiles = 1)
    assert(store.compactIfOver("cad", threshold = 3)) // 4 > 3: compacts
    assert(store.dataFileCount("cad") == 1)
    assert(store.read("cad").collect().map(_.getInt(0)).toSet == Set(1, 2, 3, 4))
  }

  test("overwritePartitions: disjoint-partition writers compose, untouched files untouched") {
    // the documented coordination boundary (r12 verdict #2): this path
    // commits via Spark's dynamic-partition committer, not the table lock —
    // safe exactly for writers touching DISJOINT partitions. Two such
    // writes must both land, and a write must not rewrite (or even touch)
    // the other's partition files.
    val (store, dir) = newStore()
    import org.apache.spark.sql.functions.{col, substring}
    def part(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__year", substring(col("date"), 1, 4).cast("int"))
    store.overwritePartitions("dp",
      part(Seq(("2023-01-01", 1.0)).toDF("date", "v")), Seq("__year"))
    val p2023 = new java.io.File(s"$dir/dp/__year=2023")
    def files2023() = p2023.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    val before = files2023()
    assert(before.nonEmpty)
    val writers = Seq(2024, 2025).map { y =>
      new Thread(() => store.overwritePartitions("dp",
        part(Seq((s"$y-01-01", y.toDouble)).toDF("date", "v")), Seq("__year")))
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    // all three partitions present; 2023's files byte-for-byte the same
    assert(files2023() == before)
    assert(store.read("dp").collect()
      .map(r => (r.getAs[String]("date"), r.getAs[Double]("v"))).toSet ==
      Set(("2023-01-01", 1.0), ("2024-01-01", 2024.0), ("2025-01-01", 2025.0)))
  }

  test("declared-decimal writes refuse a session with ANSI mode off") {
    // ADVICE r12 (low): without ANSI, declared-precision overflow becomes a
    // silent NULL at rest — the exact corruption SinkTypes exists to
    // prevent. LocalSession pins ansi=true; an embedding consumer's session
    // might not, so the cast sites assert instead of trusting ambient conf.
    val df = Seq(("2024-01-01", 3.14)).toDF("date", "price")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val err = intercept[IllegalArgumentException](
        graft.store.SinkTypes.sinkCast(df, "gasprice"))
      assert(err.getMessage.contains("ansi"))
      intercept[IllegalArgumentException](
        graft.store.SinkTypes.declaredRound(df, "gasprice"))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    // with ANSI back on, the same cast succeeds and carries DECIMAL(12,2)
    val cast = graft.store.SinkTypes.sinkCast(df, "gasprice")
    assert(cast.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    // undeclared tables never touch the guard regardless of conf
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try assert(graft.store.SinkTypes.sinkCast(df, "not_a_table").schema ==
      df.schema)
    finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("partitionColumns: file-derived layout survives stray dirs, rejects mixed trees") {
    val (store, dir) = newStore()
    // flat table -> Nil; missing table -> Nil
    store.overwrite("flat", Seq((1, "a")).toDF("k", "v"))
    assert(store.partitionColumns("flat") == Nil)
    assert(store.partitionColumns("nope") == Nil)
    // partitioned layout, plus a stray EMPTY partition dir (interrupted
    // writer debris): layout derives from data files, so the stray dir
    // can neither truncate nor skew the answer
    val part = Seq(("2023-01-01", 1.0), ("2024-01-01", 2.0)).toDF("date", "v")
      .withColumn("__year", org.apache.spark.sql.functions
        .substring(org.apache.spark.sql.functions.col("date"), 1, 4).cast("int"))
    store.overwritePartitions("py", part, Seq("__year"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$dir/py/__year=1999"))      // empty: no data files
    fs.mkdirs(new Path(s"$dir/py/junk"))             // non-partition subdir, empty
    assert(store.partitionColumns("py") == Seq("__year"))
    // crashed-writer debris under HIDDEN intermediate dirs: a dynamic
    // overwrite's .spark-staging-<job>/ tree and an in-flight job's
    // _temporary/ tree hold data files with NON-hidden leaf names.
    // Hidden-path filtering applies per level (Spark's
    // shouldFilterOutPathName), so the debris neither skews the layout
    // nor blocks migrateDeclared on an otherwise-healthy table.
    val hconf = spark.sparkContext.hadoopConfiguration
    val flatFile = fs.listStatus(new Path(s"$dir/flat")).toSeq
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    org.apache.hadoop.fs.FileUtil.copy(fs, flatFile, fs,
      new Path(s"$dir/py/.spark-staging-42/__year=2030/part-0.parquet"),
      false, hconf)
    org.apache.hadoop.fs.FileUtil.copy(fs, flatFile, fs,
      new Path(s"$dir/py/_temporary/0/task_1/part-1.parquet"), false, hconf)
    assert(store.partitionColumns("py") == Seq("__year"))
    // a path MIXING '='-bearing and plain VISIBLE segments is a corrupt
    // tree and fails loudly (not silently ignored like a pure-plain one)
    org.apache.hadoop.fs.FileUtil.copy(fs, flatFile, fs,
      new Path(s"$dir/py/__year=2024/extra/part-2.parquet"), false, hconf)
    val em = intercept[IllegalArgumentException](store.partitionColumns("py"))
    assert(em.getMessage.contains("inconsistent partition directory layout"))
    fs.delete(new Path(s"$dir/py/__year=2024/extra"), true)
    assert(store.partitionColumns("py") == Seq("__year"))
    // a MIXED flat+partitioned tree (the unreadable state the
    // migrateDeclared guard exists to prevent) fails loudly
    org.apache.hadoop.fs.FileUtil.copy(fs, flatFile, fs,
      new Path(s"$dir/py/stray.parquet"), false, hconf)
    val e = intercept[IllegalArgumentException](store.partitionColumns("py"))
    assert(e.getMessage.contains("inconsistent partition directory layout"))
  }

  test("lock heartbeat: slow-but-alive holder is not broken; dead holder is") {
    val (store, dir) = newStore()
    store.overwrite("hb", Seq((1, "a")).toDF("k", "v"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = store.lockStaleMs
    // shortened bound so the boundary is exercised without 30s sleeps —
    // but wide enough (1s; ~333ms beat cadence) that an ordinary GC pause
    // can't age the mtime past the bound and fail the test spuriously
    store.lockStaleMs = 1000L
    try {
      // SLOW-BUT-ALIVE holder: holds the lock for 3x the staleness bound.
      // The heartbeat keeps the mtime fresh, so the contender below must
      // WAIT for the release — before the heartbeat, it would stale-break
      // in at ~bound and enter mid-hold.
      val aHolds = new java.util.concurrent.CountDownLatch(1)
      @volatile var aEnd = 0L
      val a = new Thread(() => store.withTableLock("hb") {
        aHolds.countDown()
        Thread.sleep(3000); aEnd = System.nanoTime()
      })
      a.start()
      // latch, not a fixed sleep: B must not race A for first acquisition
      assert(aHolds.await(30, java.util.concurrent.TimeUnit.SECONDS))
      var bStart = 0L
      store.withTableLock("hb") { bStart = System.nanoTime() }
      a.join(30000)
      assert(aEnd != 0L && bStart > aEnd,
        "contender entered while a live holder was inside the lock")
      // DEAD holder: a lock file with no heartbeat (crashed JVM) past the
      // bound is still broken promptly — the heal path is unchanged
      val lock = new Path(s"$dir/.hb.__lock__")
      fs.create(lock, true).close()
      fs.setTimes(lock, System.currentTimeMillis() - 10000L, -1)
      var entered = false
      store.withTableLock("hb") { entered = true }
      assert(entered)
    } finally store.lockStaleMs = prior
  }

  test("renameBackExclusive never replaces a re-created lock") {
    val (store, dir) = newStore()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(p: Path, s: String): Unit = {
      val o = fs.create(p, true); o.write(s.getBytes("UTF-8")); o.close()
    }
    def get(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val lock = new Path(s"$dir/.rb.__lock__")
    val breaker = new Path(s"$dir/.rb.__lock__.break_t")
    // occupied destination (another writer re-created the lock mid-steal):
    // POSIX rename(2) would silently REPLACE it — the rename-back must
    // FAIL and leave the fresh lock byte-intact instead
    put(lock, "fresh-owner"); put(breaker, "stolen")
    assert(!store.renameBackExclusive(breaker, lock))
    assert(get(lock) == "fresh-owner")
    // free destination: the rename-back restores the stolen lock
    fs.delete(lock, false)
    assert(store.renameBackExclusive(breaker, lock))
    assert(get(lock) == "stolen")
    assert(!fs.exists(breaker))
  }

  test("lock: mutual exclusion holds under contention with the heartbeat path") {
    val (store, _) = newStore()
    val prior = store.lockStaleMs
    store.lockStaleMs = 500L
    try {
      // lost-update detector: get/sleep/set is atomic ONLY if the lock
      // serializes holders; AtomicInteger supplies cross-thread visibility
      // while leaving the read-modify-write unprotected on purpose
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 8).map(_ => new Thread(() =>
        try (1 to 20).foreach { _ =>
          store.withTableLock("mx") {
            val c = counter.get(); Thread.sleep(1); counter.set(c + 1)
          }
        } catch { case t: Throwable => errs.add(t) }))
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"locked section threw: ${errs.peek()}")
      assert(counter.get() == 160,
        s"lost updates: ${160 - counter.get()} of 160 increments vanished")
    } finally store.lockStaleMs = prior
  }
}
