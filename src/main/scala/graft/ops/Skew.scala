package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salting for hot keys.
  *
  * AQE's skew-join split (on by default) handles most runtime skew; salting
  * is the plan-level tool for the cases AQE can't fix — a single pathological
  * key in an aggregation, or a broadcast-infeasible join where one key holds
  * a double-digit percentage of the rows.
  *
  * Salts are DERIVED (xxhash64 of the full row), never `rand()`: retried
  * tasks must salt identically or shuffle retries produce duplicates.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hash of all columns, so rows
    * of one hot key spread across salts while re-computation is stable. */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.toSeq.map(col): _*), lit(salts)).cast("int")

  /** Two-phase salted sum/count: partial aggregate on (keys, salt) — spreads
    * one hot key over `salts` reducers — then final aggregate on keys.
    * Result is identical to a direct groupBy. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int): DataFrame = {
    val partial = df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join: the large (skewed) side gets a derived salt; the
    * small side is replicated once per salt value; the join key becomes
    * (keys, salt). One hot key's rows land on `salts` different reducers
    * instead of one. Join semantics identical to the unsalted join. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val l = large.withColumn("__salt", rowSalt(large, salts))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
