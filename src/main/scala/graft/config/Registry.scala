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
      frequency: String = "")    // FRED resample: "m" | "q"

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
                  valueCol: String, vt: ValueType): DatasetConfig =
    DatasetConfig(name, table, valueCol, vt, Monthly,
      fileName = file, sheetName = sheet, dataLocation = "A6:K18")

  /** 15 EDB monthly datasets (config.py:29-238; all use A6:K18). */
  val edbConfigs: Seq[DatasetConfig] = Seq(
    edb("auto_sales", "I_AUTO.XLS", "AS01", "autosales", "Sales", IntType),
    edb("bankruptcies", "I_BANKRUPT.XLS", "BAN01", "bankruptcies", "Filings", IntType),
    edb("cement_production", "I_CEMENT.XLS", "CD01", "cementproduction", "Production", FloatType),
    edb("electricity_consumption", "I_ENERGY.XLS", "EEC01", "electricityconsumption", "Consumption", FloatType),
    edb("gas_price", "I_GAS.XLS", "GAS01", "gasprice", "Price", FloatType),
    edb("gas_consumption", "I_GAS.XLS", "GAS02", "gasconsumption", "Consumption", FloatType),
    edb("labor_participation", "I_LABOR.XLS", "LF03", "laborparticipation", "Rate", FloatType),
    edb("unemployment_rate", "I_LABOR.XLS", "LF08", "unemploymentrate", "Rate", FloatType),
    edb("employment_rate", "I_LABOR.XLS", "LF09", "employmentrate", "Rate", FloatType),
    edb("unemployment_claims", "I_LABOR.XLS", "LF10", "unemploymentclaims", "Claims", IntType),
    edb("trade_employment", "I_PAYROLL.XLS", "PE05", "tradeemployment", "Employment", FloatType),
    edb("consumer_price_index", "I_PRICE.XLS", "CPI01", "consumerpriceindex", "Index", FloatType),
    edb("transportation_price_index", "I_PRICE.XLS", "CPI05", "transportationpriceindex", "Index", FloatType),
    edb("retail_sales", "I_RETAIL.XLS", "RS01", "retailsales", "Sales", FloatType),
    edb("imports", "I_TRADE.XLS", "ET05", "imports", "Value", FloatType))

  private def fred(name: String, table: String, valueCol: String,
                   series: String, freq: String): DatasetConfig =
    DatasetConfig(name, table, valueCol, FloatType, Fred,
      fredSeriesId = series, frequency = freq)

  /** 10 FRED datasets (fred_config.py:20-154). */
  val fredConfigs: Seq[DatasetConfig] = Seq(
    fred("federal_funds_rate", "federalfundsrate", "Rate", "DFF", "m"),
    fred("auto_manufacturing_orders", "automanufacturingorders", "Orders", "AMVPNO", "m"),
    fred("used_car_retail_sales", "usedcarretailsales", "Sales", "MRTSSM44112USN", "m"),
    fred("domestic_auto_inventories", "domesticautoinventories", "Inventories", "AUINSA", "m"),
    fred("domestic_auto_production", "domesticautoproduction", "Production", "DAUPSA", "m"),
    fred("liquidity_credit_facilities", "liquiditycreditfacilities", "Facilities", "WLCFLL", "m"),
    fred("semiconductor_manufacturing_units", "semiconductormanufacturingunits", "Units", "IPG3344S", "m"),
    fred("aluminum_new_orders", "aluminumneworders", "Orders", "AANMNO", "m"),
    fred("real_gdp", "realgdp", "Value", "GDPC1", "q"),
    fred("gdp_now_forecast", "gdpnowforecast", "Forecast", "GDPNOW", "q"))

  /** FRED default observation window start (fred_config.py:7). */
  val FredStartDate = "2014-01-01"

  /** The one multi-value dataset (nyu_config.py:18-24): value columns are
    * (tbond_rate, erp_t12m, expected_return). */
  val nyuConfig: DatasetConfig =
    DatasetConfig("equity_risk_premium", "equityriskpremium", "", FloatType,
      NyuStern, sheetName = "Historical ERP")

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
}
