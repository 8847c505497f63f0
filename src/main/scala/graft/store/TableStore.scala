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

  def exists(table: String): Boolean = fs.exists(new Path(path(table)))

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def readOrEmpty(table: String, like: DataFrame): DataFrame =
    if (exists(table)) read(table) else like.limit(0)

  /** Atomic keyed overwrite: write to a temp dir, then swap directories.
    * Readers never observe a half-written table (the swap is two renames —
    * the same commit discipline a lakehouse format provides via its log). */
  def overwrite(table: String, df: DataFrame, maxFiles: Int = 0): Unit = {
    val target = new Path(URI.create(path(table)).normalize().toString)
    val tmp = new Path(target.getParent, s".${target.getName}.__tmp__")
    val old = new Path(target.getParent, s".${target.getName}.__old__")
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    if (fs.exists(tmp)) fs.delete(tmp, true)
    out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Append (revision log — append-only audit trail). */
  def append(table: String, df: DataFrame, maxFiles: Int = 1): Unit = {
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    out.write.mode(SaveMode.Append).parquet(path(table))
  }

  def drop(table: String): Unit = {
    val p = new Path(path(table))
    if (fs.exists(p)) fs.delete(p, true)
  }
}
