package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Panel export (J2): align many single-series tables into one wide panel on
  * the date key — the reference's flagship analytical read ("merges all
  * datasets with date alignment", /root/reference/documentation/
  * economic_indicators.md:71,122; the export_data.py it names is absent from
  * the snapshot, so the semantics come from that doc line).
  *
  * Spark shape: a fold of full-outer equi-joins on `date`. Every series
  * shuffles once on the same key, so Catalyst/AQE reuses the exchange
  * across the fold instead of re-partitioning per join; small series
  * broadcast automatically. At 1000-series scale the better physical plan is
  * union-then-pivot (one shuffle total) — provided as `panelByPivot`.
  */
object Panel {

  /** Multi-way full-outer join of per-series frames, each (date, <value>).
    * Column names must be distinct across frames apart from the key. */
  def panel(series: Seq[DataFrame], dateCol: String = "date"): DataFrame = {
    require(series.nonEmpty, "panel of zero series")
    series.reduce(_.join(_, Seq(dateCol), "full_outer")).orderBy(col(dateCol))
  }

  /** Scale path: stack all series long (dataset, date, value) and pivot once
    * — one shuffle regardless of series count. `datasets` fixes the output
    * column set (and order) so the plan needs no discovery pass. */
  def panelByPivot(long: DataFrame, datasets: Seq[String],
                   dateCol: String = "date"): DataFrame =
    long.groupBy(col(dateCol))
      .pivot("dataset", datasets)
      .agg(first(col("value"), ignoreNulls = true))
      .orderBy(col(dateCol))
}
