package graft.tools

import graft.sources.XlsxWriter

/** Regenerates the checked-in `.xlsx` fixture workbooks from their CSV
  * twins (same cells, real ECMA-376 bytes), so the test suite and the e2e
  * pipeline exercise the genuine workbook-byte read path the reference uses
  * (core_local/azure_common_scrapers.py:66-79, azure_nyu_scraper.py:86).
  *
  * Run: `sbt "runMain graft.tools.FixtureGen [fixturesDir]"`.
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures")
    Seq("edb_auto_sales", "edb_gas_price", "edb_quarterly_loans", "nyu_erp")
      .foreach { base =>
        val out = XlsxWriter.fromCsv(s"$dir/$base.csv", s"$dir/$base.xlsx")
        println(s"wrote $out")
      }
  }
}
