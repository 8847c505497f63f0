package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan pruning at scale.
  *
  * Parquet scans prune with per-file/per-row-group min-max statistics;
  * sorting by a single column makes the stats tight for that column only.
  * Z-ORDER (Morton) clustering interleaves the bits of several key
  * columns so that files end up covering small HYPER-RECTANGLES of the
  * key space — min-max pruning then works for filters on ANY prefix-free
  * combination of the clustered columns. On a 100 TB table this is the
  * difference between scanning every file and scanning the handful whose
  * rectangle intersects the predicate.
  *
  * The key is a pure static-expression bit interleave (shift/and/or —
  * whole-stage codegen, no UDF): distinct powers of two summed, so the
  * arithmetic is ANSI-overflow-safe by construction (2*bits < 63) and
  * bit-identical on any engine.
  */
object Layout {

  /** Morton (Z-curve) key: interleave the low `bits` bits of two
    * non-negative integer columns — bit i of `a` lands at position
    * 2i+1, bit i of `b` at position 2i. Values are clamped into
    * [0, 2^bits) so out-of-range keys degrade to the curve's edge
    * instead of corrupting high bits. */
  def zOrderKey(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val cap = (1L << bits) - 1
    def clamp(c: Column) = least(greatest(c.cast("long"), lit(0L)), lit(cap))
    val ca = clamp(a)
    val cb = clamp(b)
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_ + _) // distinct powers of two: sum == bitwise OR
  }

  /** Rewrite `df` into `numFiles` output slices clustered along the
    * Z-curve of (a, b): range-partition on the key, sort within
    * partitions, drop the key. Each written file then covers a compact
    * rectangle of (a, b) space, so min-max stats prune scans filtered on
    * either column or both. Range partitioning samples the key
    * distribution — the standard skew-proof way to lay out a table for
    * write (vs hash partitioning, which scatters the curve). */
  def clusterByZOrder(df: DataFrame, a: String, b: String,
                      numFiles: Int, bits: Int = 21): DataFrame = {
    val keyed = df.withColumn("__zkey", zOrderKey(col(a), col(b), bits))
    keyed
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Deterministic shard id in [0, numShards): the first 8 md5 hex digits
    * of the key, mod the shard count. md5-based (never `hash()`/`rand()`)
    * so the assignment is engine-portable and identical on every rerun —
    * a failed 1000-executor job resumes into the SAME shards. */
  def shardKey(key: Column, numShards: Int): Column = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % numShards
  }

  /** Within-shard pseudo-random order priority: [[Sampling.hashPriority]]
    * of a DOMAIN-SEPARATED key (`ord:` prefix), so it is statistically
    * independent of [[shardKey]] — ordering by the shard hash itself
    * would sort each shard by the residue structure that chose it.
    * Delegates to hashPriority so the bit-pinned priority formula keeps
    * exactly one owner.
    *
    * `epoch` re-seeds the permutation for multi-epoch training (each
    * epoch streams the corpus in a fresh deterministic order — fixed
    * visit order across epochs measurably hurts convergence): epoch 0
    * is the original `ord:` key BIT-FOR-BIT (shuffle_shards' oracle
    * hash is a frozen contract), epoch e > 0 prefixes `ord:e<e>:` —
    * independent of both the shard hash and every other epoch. */
  def shardOrderKey(key: Column, epoch: Long = 0L): Column = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val pfx = if (epoch == 0L) "ord:" else s"ord:e$epoch:"
    Sampling.hashPriority(concat(lit(pfx), key.cast("string")))
  }

  /** GLOBAL TRAINING SHUFFLE: assign every row a shard and a dense
    * within-shard position, both deterministic functions of the key — the
    * layout step that turns a curated corpus into training shards. A data
    * loader can then stream shard files independently while the global
    * order is a fixed pseudo-random permutation (seeded by the md5 domain
    * separation, reproducible across engines, reruns, and cluster sizes).
    *
    * Scale shape: ONE hash shuffle on the shard id plus a per-shard sort
    * for the position `row_number` — exactly the exchange the physical
    * shard write needs anyway, so the ordering is free at write time
    * (`df.write.partitionBy("shard")` with `sortWithinPartitions` lands
    * each shard's rows in position order). Never a global sort: the
    * window partitions by shard, so no single task sees more than one
    * shard. At 100 TB with numShards sized to ~1–4 GB of rows per shard,
    * each sort fits one executor comfortably. */
  def assignShards(df: DataFrame, keyCol: String, numShards: Int,
                   epoch: Long = 0L): DataFrame = {
    val w = Window.partitionBy("shard")
      .orderBy(shardOrderKey(col(keyCol), epoch), col(keyCol))
    df.withColumn("shard", shardKey(col(keyCol), numShards))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1L)
  }
}
