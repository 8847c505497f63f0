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

  /** A table "exists" if its directory OR its interrupted-swap backup does —
    * recoverTable() heals the latter before any read. */
  def exists(table: String): Boolean =
    fs.exists(new Path(path(table))) || fs.exists(oldPath(table))

  /** Heal an interrupted overwrite(): if the target is missing but the
    * `.__old__` backup survives, the crash happened between the two renames —
    * restore the backup so readers see the pre-swap table. */
  private def recoverTable(table: String): Unit = {
    val target = new Path(URI.create(path(table)).normalize().toString)
    val old = oldPath(table)
    if (!fs.exists(target) && fs.exists(old)) {
      if (!fs.rename(old, target))
        sys.error(s"TableStore: failed to recover $table from ${old}")
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
  def overwrite(table: String, df: DataFrame, maxFiles: Int = 0): Unit = {
    recoverTable(table)
    val target = new Path(URI.create(path(table)).normalize().toString)
    val tmp = new Path(target.getParent, s".${target.getName}.__tmp__")
    val old = oldPath(table)
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    if (fs.exists(tmp)) fs.delete(tmp, true)
    out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      sys.error(s"TableStore: rename $target -> $old failed")
    if (!fs.rename(tmp, target)) {
      // put the previous table back before failing — never leave no table
      if (fs.exists(old)) fs.rename(old, target)
      sys.error(s"TableStore: rename $tmp -> $target failed")
    }
    if (fs.exists(target) && fs.exists(old)) fs.delete(old, true)
  }

  /** Partition-scoped overwrite: the table is laid out as
    * `table/<partCol>=<v>/...`; ONLY the partitions present in `df` are
    * replaced (dynamic partition overwrite), untouched partitions are
    * neither read nor written. This is the 100 TB incremental-merge write
    * path: a daily batch touching one year rewrites one year, not a decade
    * of history. Reads prune directories on any `partCol` predicate. */
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
    * maxFiles=1 to avoid small-file buildup. */
  def append(table: String, df: DataFrame, maxFiles: Int = 0): Unit = {
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    out.write.mode(SaveMode.Append).parquet(path(table))
  }

  /** Compact an append-accumulated table: the revision log gains one
    * small file per merge (one per MICRO-BATCH on a long-lived stream —
    * thousands of files over weeks, and file-listing cost grows with
    * every one). Safe against a writer appending WHILE compaction runs:
    * the input file list is snapshotted first, the temp dir is written
    * from exactly those files, and any data file that appeared after the
    * snapshot is MERGED into the compacted table (renamed in, not
    * deleted) before the backup dir is dropped — so a micro-batch that
    * lands mid-compaction is preserved, not silently lost. The only
    * remaining window is an append racing the two renames themselves
    * (milliseconds); that one needs external coordination, same as any
    * log-less parquet layout. */
  def compact(table: String, targetFiles: Int = 1): Unit = {
    if (!exists(table)) return
    recoverTable(table)
    val target = new Path(URI.create(path(table)).normalize().toString)
    compactSnapshot(table, dataFiles(target), targetFiles)
  }

  private def dataFiles(dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath)

  /** Compact exactly `snapshot`'s files; anything that lands in the table
    * dir after the snapshot is merged into the result, not deleted.
    * Package-private so the snapshot-vs-late-append race is testable
    * deterministically (the test passes a deliberately stale snapshot). */
  private[graft] def compactSnapshot(table: String, snapshot: Seq[Path],
                                     targetFiles: Int): Unit = {
    if (snapshot.isEmpty) return
    val target = new Path(URI.create(path(table)).normalize().toString)
    val snapNames = snapshot.map(_.getName).toSet
    val tmp = new Path(target.getParent, s".${target.getName}.__tmp__")
    val old = oldPath(table)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(snapshot.map(_.toString): _*)
      .coalesce(targetFiles max 1)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(target, old))
      sys.error(s"TableStore: rename $target -> $old failed")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // put the previous table back — never leave no table
      sys.error(s"TableStore: rename $tmp -> $target failed")
    }
    // merge files appended after the snapshot (they were swapped into `old`)
    for (f <- dataFiles(old) if !snapNames.contains(f.getName)) {
      val dest = new Path(target, f.getName)
      if (!fs.rename(f, dest))
        sys.error(s"TableStore: failed to merge late append $f into $target")
    }
    fs.delete(old, true)
  }

  def drop(table: String): Unit = {
    val p = new Path(path(table))
    if (fs.exists(p)) fs.delete(p, true)
  }
}
