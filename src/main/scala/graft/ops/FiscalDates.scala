package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fiscal/calendar date algebra as pure Column expressions (no UDFs, fully
  * codegen-friendly, pushdown-transparent).
  *
  * Semantics derived from the reference pipeline:
  *  - monthly fiscal->calendar: /root/reference/core_local/azure_common_scrapers.py:142-163
  *  - quarterly fiscal->calendar: /root/reference/core_local/azure_common_scrapers.py:239-265
  *  - FRED quarter-end shift: /root/reference/core_local/azure_fred_scraper.py:158-188
  *
  * Puerto Rico fiscal year runs July..June: calendar months 7-12 belong to
  * fiscal year FY but calendar year FY-1; months 1-6 to calendar year FY.
  */
object FiscalDates {

  /** English month name (full, case-insensitive) -> 1..12; unknown -> null. */
  def monthNumber(monthName: Column): Column = {
    val names = Seq(
      "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4,
      "may" -> 5, "june" -> 6, "july" -> 7, "august" -> 8,
      "september" -> 9, "october" -> 10, "november" -> 11, "december" -> 12)
    val m = lower(trim(monthName))
    names.foldLeft(lit(null).cast("int")) { case (acc, (n, i)) =>
      when(m === n, lit(i)).otherwise(acc)
    }
  }

  /** F1: (month name, fiscal year) -> first-of-month calendar DATE.
    * Months Jul-Dec -> fiscalYear-1; Jan-Jun -> fiscalYear. Unknown month
    * name -> null (caller drops the row, matching the reference). */
  def fiscalMonthlyDate(monthName: Column, fiscalYear: Column): Column = {
    val m = monthNumber(monthName)
    val fy = fiscalYear.cast("int")
    make_date(when(m >= 7, fy - 1).otherwise(fy), m, lit(1))
  }

  /** F2: quarter label + fiscal year -> first day of the month AFTER the
    * quarter ends. Jul-Sep -> (fy-1)-10-01, Oct-Dec -> fy-01-01,
    * Jan-Mar -> fy-04-01, Apr-Jun -> fy-07-01; unknown label -> null. */
  def fiscalQuarterlyDate(quarterLabel: Column, fiscalYear: Column): Column = {
    val q = lower(trim(quarterLabel))
    val fy = fiscalYear.cast("int")
    when(q === "jul-sep", make_date(fy - 1, lit(10), lit(1)))
      .when(q === "oct-dec", make_date(fy, lit(1), lit(1)))
      .when(q === "jan-mar", make_date(fy, lit(4), lit(1)))
      .when(q === "apr-jun", make_date(fy, lit(7), lit(1)))
      .otherwise(lit(null).cast("date"))
  }

  /** F3: shift a quarter-start date to the first day of the month after the
    * quarter ends (Q1->Apr 1, Q2->Jul 1, Q3->Oct 1, Q4->Jan 1 next year).
    * One expression; equivalent to the reference's 4-way case. */
  def quarterEndShift(date: Column): Column =
    add_months(date_trunc("quarter", date).cast("date"), 3)

  /** Resample to month grain (in-engine replacement for FRED's server-side
    * frequency='m' aggregation): group key for monthly averaging. */
  def monthStart(ts: Column): Column = date_trunc("month", ts).cast("date")

  /** Group key for quarterly resampling (FRED frequency='q'). */
  def quarterStart(ts: Column): Column = date_trunc("quarter", ts).cast("date")
}
