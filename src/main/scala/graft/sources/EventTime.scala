package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Event-time normalization for raw-long timestamp reads.
  *
  * Parquet TIMESTAMP(NANOS) columns are rejected by Spark's reader unless
  * `spark.sql.legacy.parquet.nanosAsLong` forces them to LongType — and the
  * runtime has been observed to deliver that long as NANOS in one session
  * and MICROS in another, with the batch and file-stream read paths of the
  * SAME session able to disagree. Any static divisor is therefore wrong by
  * 1000× whenever the runtime flips. This is the operator-library owner of
  * the defense; the harness (`SparkEntry`) and the streaming module both
  * route through it.
  */
object EventTime {

  /** Nanos/micros decision threshold: 2024-era nanos are ~1.7e18, micros
    * ~1.7e15. 3e17 separates the two scales for any timestamp between 1979
    * and year ~11000 — outside that range the scales become ambiguous and
    * no magnitude guard can work. */
  val NanosThreshold: Long = 300000000000000000L

  /** Normalize a raw-long event-time column to MICROSECONDS.
    *
    * Contract:
    *   - `col` must hold epoch longs at either micro or nano scale, with
    *     true values between 1979 and year ~11000 (see [[NanosThreshold]]);
    *   - the guard is PER ROW, not per frame, so a union of sources with
    *     different scales still normalizes correctly;
    *   - nanos are divided exactly: epoch nanos / 1000 < 2^53, so no
    *     precision is lost in the integer division;
    *   - pure column expression (codegen'd, stream-safe — no driver state,
    *     usable under `readStream` and inside `foreachBatch`).
    *
    * Callers wrap the result in `timestamp_micros(col)` when a
    * TimestampType column is wanted. */
  def rawTsToMicros(df: DataFrame, col: String = "ts"): DataFrame =
    df.withColumn(col,
      expr(s"CASE WHEN $col > ${NanosThreshold}L THEN $col div 1000 ELSE $col END"))
}
