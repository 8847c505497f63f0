package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic read-path operators over the canonical long (dataset, date,
  * value) shape: resampling aggregation and window analytics.
  *
  * Resampling replaces the reference's delegation of aggregation to the FRED
  * server (`frequency='m'|'q'` — /root/reference/core_local/azure_fred_scraper.py:85,
  * "Monthly average" fred_config.py:31-33) with an in-engine groupBy: a
  * single hash shuffle on the truncated date key, map-side partial
  * aggregation free from Catalyst.
  *
  * Window analytics (MoM/YoY via lag) are the documented-but-absent analysis
  * tools of the reference (documentation/economic_indicators.md:116-126),
  * expressed as Spark window functions partitioned by series so a 1000-series
  * store computes every series' deltas in one pass with no driver loop.
  */
object Analytics {

  /** Resample to month grain with an avg (FRED frequency='m' semantics). */
  def resampleMonthlyAvg(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(FiscalDates.monthStart(col(tsCol)).as("month"))
      .agg(avg(col(valueCol)).as("avg_value"), count(col(valueCol)).as("n"))

  /** Resample to quarter grain (FRED frequency='q' semantics). */
  def resampleQuarterlyAvg(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(FiscalDates.quarterStart(col(tsCol)).as("quarter"))
      .agg(avg(col(valueCol)).as("avg_value"), count(col(valueCol)).as("n"))

  private def seriesWindow(partCols: Seq[String], orderCol: String) =
    Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))

  /** Previous value within each series (lag 1 by date). */
  def withPrev(df: DataFrame, partCols: Seq[String], orderCol: String,
               valueCol: String, as: String = "prev_value"): DataFrame =
    df.withColumn(as, lag(col(valueCol), 1).over(seriesWindow(partCols, orderCol)))

  /** Period-over-period absolute and percent change per series. */
  def periodChange(df: DataFrame, partCols: Seq[String], orderCol: String,
                   valueCol: String): DataFrame = {
    val prev = lag(col(valueCol), 1).over(seriesWindow(partCols, orderCol))
    df.withColumn("prev_value", prev)
      .withColumn("change", col(valueCol) - col("prev_value"))
      .withColumn("pct_change",
        when(col("prev_value") =!= 0,
          (col(valueCol) - col("prev_value")) / abs(col("prev_value")))
          .otherwise(lit(null).cast("double")))
  }

  /** Year-over-year change: lag 12 for monthly series, 4 for quarterly. */
  def yoyChange(df: DataFrame, partCols: Seq[String], orderCol: String,
                valueCol: String, periodsPerYear: Int = 12): DataFrame = {
    val prev = lag(col(valueCol), periodsPerYear)
      .over(seriesWindow(partCols, orderCol))
    df.withColumn("yoy_prev", prev)
      .withColumn("yoy_change", col(valueCol) - col("yoy_prev"))
  }

  /** Rolling mean over the trailing `periods` rows per series. */
  def rollingMean(df: DataFrame, partCols: Seq[String], orderCol: String,
                  valueCol: String, periods: Int): DataFrame =
    df.withColumn(s"rolling_mean_$periods",
      avg(col(valueCol)).over(
        seriesWindow(partCols, orderCol).rowsBetween(-(periods - 1), 0)))
}
