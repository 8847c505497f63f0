package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Percent normalization (NYU Stern ERP sheet).
  *
  * Reference semantics (/root/reference/core_local/azure_nyu_scraper.py:126-152):
  * per cell,
  *   - string containing '%'          -> strip '%', parse, /100
  *   - numeric and  > 0.2             -> /100   (heuristic: rates are 3-5%)
  *   - numeric and <= 0.2             -> keep as-is
  *   - unparseable                    -> left untouched (later dropped by na.drop)
  * The 0.2 threshold is replicated exactly (azure_nyu_scraper.py:145).
  */
object Percent {

  /** F7: normalize a rate cell (string or numeric) to a decimal fraction.
    * Unparseable input -> null (the reference leaves it as-is and then drops
    * the row; null + na.drop is the relational equivalent). */
  def normalize(c: Column): Column = {
    val s = trim(c.cast("string"))
    val stripped = regexp_replace(s, "%", "").try_cast("double")
    val num = s.try_cast("double")
    when(s.contains("%"), stripped / 100)
      .when(num.isNotNull && num > 0.2, num / 100)
      .when(num.isNotNull, num)
      .otherwise(lit(null).cast("double"))
  }
}
