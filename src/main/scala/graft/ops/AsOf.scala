package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for every left row, attach the LATEST right
  * row with right.date <= left.date — the canonical time-series alignment
  * (pricing against the last known rate, panels against the last published
  * indicator). Spark has no native as-of join; the brief's preference order
  * (a) applies: compose existing operators.
  *
  * Composition: tag both sides, UNION them, and run one window pass ordered
  * by (date, side) carrying the last non-null right payload forward. Cost is
  * a single shuffle+sort over the union — no join node at all, and in
  * particular no O(left x right) range join. With a partition key (per-series
  * alignment) the window partitions by it and all series align in one pass.
  */
object AsOf {

  /** Left as-of join. `rightCols` are the right-side payload columns to
    * carry (emitted under the same names, null when no right row is at or
    * before the left date). Same-date rows match (<=). */
  def asOfJoin(left: DataFrame, right: DataFrame, dateCol: String,
               rightCols: Seq[String],
               partitionCols: Seq[String] = Seq.empty): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == dateCol ||
      partitionCols.contains(c)).toSeq
    val rStruct = struct(col(dateCol).as("as_of_date") +: rightCols.map(col): _*)
    val rStructType = right.select(rStruct).schema.head.dataType
    val l = left.withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val r = right.select(
      (partitionCols.map(col) :+ col(dateCol)) ++
        Seq(lit(0).as("__side"), rStruct.as("__r")): _*)
    // align schemas: right side has no left payload columns
    val rFull = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.select(
      (partitionCols.map(col) :+ col(dateCol) :+ col("__side") :+ col("__r")) ++
        leftCols.map(col): _*)
      .unionByName(rFull.select(
        (partitionCols.map(col) :+ col(dateCol) :+ col("__side") :+ col("__r")) ++
          leftCols.map(col): _*))
    // right rows (side 0) sort before left rows (side 1) at equal dates, so
    // a same-date right observation is visible to the left row (<= match)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(dateCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (partitionCols.map(col) :+ col(dateCol)) ++ leftCols.map(col) ++
          (col("__match.as_of_date").as("as_of_date") +:
            rightCols.map(c => col(s"__match.$c").as(c))): _*)
  }
}
