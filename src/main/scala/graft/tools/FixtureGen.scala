package graft.tools

import graft.sources.{XlsWriter, XlsxWriter}

/** Regenerates the checked-in workbook fixtures from their CSV twins
  * (same cells, real bytes), so the test suite and the e2e pipeline
  * exercise the genuine workbook-byte read paths the reference uses:
  * `.xlsx` ECMA-376 packages (azure_nyu_scraper.py:86) AND legacy `.xls`
  * BIFF8 containers — the format of all 15 production EDB files
  * (core_local/config.py:32-116, azure_common_scrapers.py:66-79).
  *
  * Run: `sbt "runMain graft.tools.FixtureGen [fixturesDir]"`.
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures")
    Seq("edb_auto_sales", "edb_gas_price", "edb_quarterly_loans", "nyu_erp")
      .foreach { base =>
        println("wrote " + XlsxWriter.fromCsv(s"$dir/$base.csv", s"$dir/$base.xlsx"))
        if (base.startsWith("edb_")) // EDB production files are legacy .XLS
          println("wrote " + XlsWriter.fromCsv(s"$dir/$base.csv", s"$dir/$base.xls"))
      }
  }
}
