package graft.config

/** Dataset configuration registry: the pure-Scala mirror of the reference's
  * config modules — 15 EDB grids (/root/reference/core_local/config.py:29-238),
  * 10 FRED series (/root/reference/core_local/fred_config.py:20-154), 1 NYU
  * sheet (/root/reference/core_local/nyu_config.py:18-24) — plus the two
  * system tables. Everything the pipeline runner needs is declared here;
  * no SQL DDL (schemas are Spark StructTypes derived from valueType).
  */
object Registry {

  sealed trait SourceKind
  case object Monthly extends SourceKind    // EDB grid, month rows
  case object Quarterly extends SourceKind  // EDB grid, quarter rows
  case object Fred extends SourceKind       // FRED JSON observations
  case object NyuStern extends SourceKind   // NYU ERP sheet

  sealed trait ValueType
  case object IntType extends ValueType    // round HALF_EVEN, store long
  case object FloatType extends ValueType  // store double

  /** One dataset: the canonical unit of data (SURVEY.md §1.1). */
  final case class DatasetConfig(
      name: String,              // registry key, e.g. "auto_sales"
      tableName: String,         // storage table, e.g. "autosales"
      valueColumn: String,       // source-side column name, e.g. "Sales"
      valueType: ValueType,
      kind: SourceKind,
      fileName: String = "",     // EDB workbook (provenance only)
      sheetName: String = "",    // EDB sheet  (provenance only)
      dataLocation: String = "", // A1-style rectangle, e.g. "A6:K18"
      fredSeriesId: String = "", // FRED series
      frequency: String = "",    // FRED resample: "m" | "q"
      decimal: Option[(Int, Int)] = None) // DDL-declared DECIMAL(p,s)

  /** camelCase -> snake_case, exactly the reference's char-level fold
    * (azure_common_scrapers.py:273-276): prefix '_' before each upper,
    * lowercase everything, strip the leading '_'. The `IndividualLoans`
    * special case (:278-279) falls out of the same fold but is pinned
    * explicitly to match the reference's belt-and-braces fix. */
  def snakeCase(name: String): String =
    if (name == "IndividualLoans") "individual_loans"
    else name.flatMap(c => if (c.isUpper) "_" + c.toLower else c.toString)
      .dropWhile(_ == '_')

  private def edb(name: String, file: String, sheet: String, table: String,
                  valueCol: String, vt: ValueType,
                  dec: Option[(Int, Int)] = None): DatasetConfig =
    DatasetConfig(name, table, valueCol, vt, Monthly,
      fileName = file, sheetName = sheet, dataLocation = "A6:K18",
      decimal = dec)

  /** 15 EDB monthly datasets (config.py:29-238; all use A6:K18). Float
    * tables declare DECIMAL(12,2) (config.py:69-234), the three labor
    * rates the percent template's DECIMAL(6,2) (config.py:15-26), ints
    * INTEGER (no decimal). */
  val edbConfigs: Seq[DatasetConfig] = Seq(
    edb("auto_sales", "I_AUTO.XLS", "AS01", "autosales", "Sales", IntType),
    edb("bankruptcies", "I_BANKRUPT.XLS", "BAN01", "bankruptcies", "Filings", IntType),
    edb("cement_production", "I_CEMENT.XLS", "CD01", "cementproduction", "Production", FloatType, Some((12, 2))),
    edb("electricity_consumption", "I_ENERGY.XLS", "EEC01", "electricityconsumption", "Consumption", FloatType, Some((12, 2))),
    edb("gas_price", "I_GAS.XLS", "GAS01", "gasprice", "Price", FloatType, Some((12, 2))),
    edb("gas_consumption", "I_GAS.XLS", "GAS02", "gasconsumption", "Consumption", FloatType, Some((12, 2))),
    edb("labor_participation", "I_LABOR.XLS", "LF03", "laborparticipation", "Rate", FloatType, Some((6, 2))),
    edb("unemployment_rate", "I_LABOR.XLS", "LF08", "unemploymentrate", "Rate", FloatType, Some((6, 2))),
    edb("employment_rate", "I_LABOR.XLS", "LF09", "employmentrate", "Rate", FloatType, Some((6, 2))),
    edb("unemployment_claims", "I_LABOR.XLS", "LF10", "unemploymentclaims", "Claims", IntType),
    edb("trade_employment", "I_PAYROLL.XLS", "PE05", "tradeemployment", "Employment", FloatType, Some((12, 2))),
    edb("consumer_price_index", "I_PRICE.XLS", "CPI01", "consumerpriceindex", "Index", FloatType, Some((12, 2))),
    edb("transportation_price_index", "I_PRICE.XLS", "CPI05", "transportationpriceindex", "Index", FloatType, Some((12, 2))),
    edb("retail_sales", "I_RETAIL.XLS", "RS01", "retailsales", "Sales", FloatType, Some((12, 2))),
    edb("imports", "I_TRADE.XLS", "ET05", "imports", "Value", FloatType, Some((12, 2))))

  private def fred(name: String, table: String, valueCol: String,
                   series: String, freq: String,
                   dec: (Int, Int)): DatasetConfig =
    DatasetConfig(name, table, valueCol, FloatType, Fred,
      fredSeriesId = series, frequency = freq, decimal = Some(dec))

  /** 10 FRED datasets (fred_config.py:20-154), each with its declared
    * per-series DECIMAL(12,s) (fred_config.py:28-148). */
  val fredConfigs: Seq[DatasetConfig] = Seq(
    fred("federal_funds_rate", "federalfundsrate", "Rate", "DFF", "m", (12, 3)),
    fred("auto_manufacturing_orders", "automanufacturingorders", "Orders", "AMVPNO", "m", (12, 2)),
    fred("used_car_retail_sales", "usedcarretailsales", "Sales", "MRTSSM44112USN", "m", (12, 2)),
    fred("domestic_auto_inventories", "domesticautoinventories", "Inventories", "AUINSA", "m", (12, 3)),
    fred("domestic_auto_production", "domesticautoproduction", "Production", "DAUPSA", "m", (12, 1)),
    fred("liquidity_credit_facilities", "liquiditycreditfacilities", "Facilities", "WLCFLL", "m", (12, 1)),
    fred("semiconductor_manufacturing_units", "semiconductormanufacturingunits", "Units", "IPG3344S", "m", (12, 4)),
    fred("aluminum_new_orders", "aluminumneworders", "Orders", "AANMNO", "m", (12, 1)),
    fred("real_gdp", "realgdp", "Value", "GDPC1", "q", (12, 2)),
    fred("gdp_now_forecast", "gdpnowforecast", "Forecast", "GDPNOW", "q", (12, 4)))

  /** FRED default observation window start (fred_config.py:7). */
  val FredStartDate = "2014-01-01"

  /** The one multi-value dataset (nyu_config.py:18-24): value columns are
    * (tbond_rate, erp_t12m, expected_return). */
  val nyuConfig: DatasetConfig =
    DatasetConfig("equity_risk_premium", "equityriskpremium", "", FloatType,
      NyuStern, sheetName = "Historical ERP",
      decimal = Some((6, 4))) // all three rates: DECIMAL(6,4), nyu_config.py:10-12

  val nyuValueFields: Seq[String] = Seq("tbond_rate", "erp_t12m", "expected_return")

  /** Expected NYU headers and their canonical names, with the reference's
    * fuzzy fallback (azure_nyu_scraper.py:86-109). */
  val nyuHeaderMap: Seq[(String, String)] = Seq(
    "Start of month" -> "date",
    "T.Bond Rate" -> "tbond_rate",
    "ERP (T12m)" -> "erp_t12m",
    "Expected Return" -> "expected_return")

  val allConfigs: Seq[DatasetConfig] = edbConfigs ++ fredConfigs :+ nyuConfig

  /** System tables (azure_connector.py:434-444). */
  val RevisionsTable = "datarevisions"
  val MetadataTable = "scrapermetadata"

  /** All 28 table names the store materializes. */
  val allTables: Seq[String] =
    allConfigs.map(_.tableName) :+ RevisionsTable :+ MetadataTable

  /** DECIMAL(p,s) the reference DDL declares per STORED value column of a
    * table (SURVEY.md §1.4): the engine computes in double throughout (the
    * reference's actual at-rest behavior — Azure Tables erases the DDL to
    * doubles), but parquet files carry the DECLARED type so a lakehouse
    * consumer re-deriving the DDL sees DECIMAL(12,2)-style columns, not
    * doubles. Empty for int-typed and non-registry tables. */
  def declaredDecimals(tableName: String): Map[String, (Int, Int)] =
    allConfigs.find(_.tableName == tableName) match {
      case Some(c) if c.kind == NyuStern =>
        c.decimal.map(d => nyuValueFields.map(_ -> d).toMap).getOrElse(Map.empty)
      case Some(c) =>
        c.decimal.map(snakeCase(c.valueColumn) -> _).toMap
      case None => Map.empty
    }
}
