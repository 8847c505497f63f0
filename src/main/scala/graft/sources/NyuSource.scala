package graft.sources

import graft.config.Registry
import graft.ops.Percent
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NYU Stern ERP source (fixture-backed): header-ful sheet with fuzzy
  * column resolution and percent normalization.
  *
  * Reference semantics (azure_nyu_scraper.py:71-168):
  *   - headers are whitespace-stripped (:89);
  *   - expected columns matched exactly, else by case-insensitive substring
  *     (:94-103); still missing -> empty result (:105-109, T5);
  *   - the three rate columns pass the percent heuristic (F7, :126-152);
  *   - fully-null value rows dropped (:162), sorted by date (:159).
  */
object NyuSource {

  /** Sheet read: `.xlsx` goes through the real workbook-byte parser
    * (row 1 = header, matching `pd.read_excel(..., sheet_name=...)` at
    * azure_nyu_scraper.py:86); anything else is a header-ful CSV fixture.
    * Both produce an all-string header-named DataFrame. */
  def readSheet(spark: SparkSession, path: String): DataFrame =
    if (path.toLowerCase.endsWith(".xlsx")) {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val grid = XlsxReader.readFirstSheet(path)
      require(grid.nonEmpty, s"$path: empty worksheet")
      val header = grid.head.map(h => Option(h).getOrElse(""))
      val body = grid.tail.map(r => Row.fromSeq(
        header.indices.map(j => if (j < r.length) r(j) else null)))
      val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
      spark.createDataFrame(spark.sparkContext.parallelize(body, 1), schema)
    } else spark.read.option("header", true).csv(path)

  /** Resolve expected headers against actual ones: exact match first, then
    * case-insensitive substring (either direction), mirroring
    * azure_nyu_scraper.py:94-103. Returns None if any column is missing. */
  def resolveColumns(actual: Seq[String],
                     expected: Seq[(String, String)] = Registry.nyuHeaderMap)
      : Option[Map[String, String]] = {
    val trimmed = actual.map(a => a.trim -> a).toMap
    val resolved = expected.map { case (want, canon) =>
      val exact = trimmed.get(want)
      val fuzzy = exact.orElse(trimmed.collectFirst {
        case (t, orig) if t.toLowerCase.contains(want.toLowerCase) ||
          want.toLowerCase.contains(t.toLowerCase) => orig
      })
      fuzzy.map(orig => orig -> canon)
    }
    if (resolved.forall(_.isDefined)) Some(resolved.flatten.toMap) else None
  }

  /** Full NYU pipeline: sheet -> (date, tbond_rate, erp_t12m,
    * expected_return) with normalized decimal-fraction rates; empty frame
    * when headers cannot be resolved (the reference aborts the dataset). */
  def process(sheet: DataFrame): DataFrame = {
    val spark = sheet.sparkSession
    resolveColumns(sheet.columns.toSeq) match {
      case None =>
        import spark.implicits._
        Seq.empty[(String, Double, Double, Double)]
          .toDF("date", "tbond_rate", "erp_t12m", "expected_return")
      case Some(mapping) =>
        // rename by literal match first — raw headers contain dots/spaces
        // that col() would mis-parse as nested-field references
        val renamed = mapping.foldLeft(sheet) { case (d, (orig, canon)) =>
          d.withColumnRenamed(orig, canon)
        }
        val rates = Registry.nyuValueFields.map(f =>
          Percent.normalize(col(f)).as(f))
        // the reference's `df.dropna()` drops rows with ANY NaN cell
        // (azure_nyu_scraper.py:161). One deliberate typed-engine divergence:
        // an unparseable STRING survives dropna in the reference (it isn't
        // NaN) and would be stored as a string; a typed double column cannot
        // hold it, so here junk parses to null and the row drops with it.
        renamed.select(to_date(col("date")).as("date") +: rates: _*)
          .na.drop(Seq("date"))
          .na.drop("any", Registry.nyuValueFields)
          .orderBy("date")
    }
  }

  /** Storage canonicalization: date -> 'YYYY-MM-DD' string key (columns are
    * already canonical snake_case). */
  def canonicalize(processed: DataFrame): DataFrame =
    processed.select(
      date_format(col("date"), "yyyy-MM-dd").as("date") +:
        Registry.nyuValueFields.map(f => col(f).cast("double").as(f)): _*)
}
