package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without a cartesian product.
  *
  * Spark executes a plain `t BETWEEN start AND end` join as
  * BroadcastNestedLoop / cartesian-with-filter — O(points x intervals),
  * a scale killer. The standard fix (same idea as Databricks' range-join
  * bin optimization): quantize time into fixed buckets, explode each
  * interval to the buckets it covers, EQUI-join on the bucket id, then
  * apply the exact range predicate to the (small) per-bucket candidate set.
  * Shuffle cost is O(points + interval-bucket copies); fan-out is bounded
  * by intervalLength/bucketWidth, a caller-controlled constant.
  */
object RangeJoin {

  private val Epoch = lit("1970-01-01")

  /** Join point rows (date `tCol`) to interval rows (`startCol`..`endCol`
    * inclusive, date-typed) via day-bucket equi-join. `bucketDays` should
    * be on the order of the typical interval length. All columns of both
    * inputs survive (names must not collide). */
  def pointInInterval(points: DataFrame, tCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketDays: Int = 7): DataFrame = {
    val pb = points.withColumn("__bucket",
      floor(datediff(col(tCol), Epoch) / bucketDays))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(datediff(col(startCol), Epoch) / bucketDays),
        floor(datediff(col(endCol), Epoch) / bucketDays))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(tCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
