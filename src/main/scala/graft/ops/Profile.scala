package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality audit pass a pipeline runs before
  * trusting a new drop of data: per-column null count, distinct count, and
  * numeric min/max, in ONE scan of the table.
  *
  * Engine extension beyond the reference (whose only profiling is the
  * per-run row counts in its run summary); generalizes its notion of
  * "check what arrived" to arbitrary tables.
  *
  * Scale design: all statistics for all columns are computed in a single
  * aggregate (one scan, one 1-row result) and then reshaped to long format
  * with `stack` — no per-column jobs, no driver loop. Exact
  * `countDistinct` over K columns makes Catalyst plan an Expand (K+1
  * projections of the scan before the partial aggregate), which is the
  * exact-NDV cost on any engine; at 100 TB pass `exact = false` to use
  * `approx_count_distinct` (HLL) instead — single projection, no Expand,
  * ±5% NDV. min/max/null-count are unaffected either way.
  */
object Profile {

  def numericProfile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      val ndv = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        ndv.as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', ${c}__nulls, ${c}__ndv, ${c}__min, ${c}__max")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
  }
}
