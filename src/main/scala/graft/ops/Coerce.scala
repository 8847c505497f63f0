package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric coercion / cleanup column expressions.
  *
  * Reference semantics:
  *  - null-on-error numeric coercion: /root/reference/core_local/azure_common_scrapers.py:133-138
  *  - int rounding for 'int'-typed datasets: /root/reference/core_local/azure_common_scrapers.py:132-135
  *  - FRED "." missing sentinel: /root/reference/core_local/azure_fred_scraper.py:114
  */
object Coerce {

  /** F4: parse to double, null on malformed (pandas to_numeric(errors='coerce')).
    * try_cast semantics regardless of the session's ANSI setting. */
  def toDoubleOrNull(c: Column): Column = c.cast("string").try_cast("double")

  /** F5: round then cast to long, for integer-typed datasets. `bround` =
    * HALF_EVEN (banker's rounding), matching the reference's pandas/numpy
    * `.round()` semantics on exact .5 values (2.5 -> 2, 3.5 -> 4). */
  def roundToLong(c: Column): Column = bround(c).cast("long")

  /** F6: treat the FRED missing sentinel "." (and empty string) as null
    * before numeric coercion. */
  def nullIfMissing(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s === "." || s === "", lit(null).cast("string")).otherwise(s)
  }

  /** Full FRED value pipeline: sentinel -> double-or-null. */
  def fredValue(c: Column): Column = toDoubleOrNull(nullIfMissing(c))
}
