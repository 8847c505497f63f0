package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide->long reshaping: the signature transform of the reference engine.
  *
  * Reference semantics:
  *  - header promotion: /root/reference/core_local/azure_common_scrapers.py:120-121,218-223
  *  - melt (unpivot):   /root/reference/core_local/azure_common_scrapers.py:124,226
  *
  * Spark-first: `Dataset.unpivot` (native Catalyst `Unpivot` node, expands to
  * a generator — no shuffle, fully streamed through whole-stage codegen).
  */
object Reshape {

  /** T2: unpivot `valueCols` into (variable, value) long form keeping `ids`.
    * Values are cast to double (the melt in the reference always feeds the
    * numeric coercion step). */
  def melt(df: DataFrame, ids: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valName: String = "value"): DataFrame = {
    val casted = df.select(
      ids.map(col) ++ valueCols.map(c => col(c).cast("double").as(c)): _*)
    casted.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, varName, valName)
  }

  /** Name of the 0-based row-index column every grid source attaches; keeps
    * header promotion positional (DataFrames have no intrinsic row order). */
  val RowIdxCol = "__row_idx"

  /** T1+T2 for the EDB grid: a headerless 13x11 grid (row 0 = fiscal-year
    * header, col 0 = month/quarter label, cols 1..N = per-fiscal-year values)
    * -> long (label, fiscal_year, value).
    *
    * The grid MUST carry a `__row_idx` column (attached at ingestion, e.g. by
    * graft.sources.GridSource) so the header is promoted POSITIONALLY — the
    * reference takes `df.iloc[0]` (azure_common_scrapers.py:120-121); content
    * sniffing would mis-fire on grids whose corner cell is non-empty.
    *
    * The fiscal-year header row is tiny and bounded (one row) — it is
    * collected on the driver to become column metadata, exactly the
    * wide->schema promotion the reference does; the VALUE data never leaves
    * the cluster.
    */
  def promoteHeaderAndMelt(grid: DataFrame, labelName: String): DataFrame = {
    require(grid.columns.contains(RowIdxCol),
      s"promoteHeaderAndMelt: grid must carry a $RowIdxCol column (0-based); " +
        "attach one at ingestion (GridSource does)")
    val cols = grid.columns.filterNot(_ == RowIdxCol)
    val labelCol = cols.head
    val headerRows = grid.filter(col(RowIdxCol) === 0).drop(RowIdxCol).collect()
    require(headerRows.length == 1,
      s"promoteHeaderAndMelt: expected exactly one header row at index 0, got ${headerRows.length}")
    val header = headerRows.head
    val years = cols.tail.zipWithIndex.map { case (c, i) =>
      c -> Option(header.get(i + 1)).map(_.toString.trim.takeWhile(_.isDigit)).getOrElse("")
    }
    val body = grid.filter(col(RowIdxCol) > 0).drop(RowIdxCol)
    val renamed = body.select(
      trim(col(labelCol)).as(labelName) +:
        years.toSeq.collect { case (c, y) if y.nonEmpty =>
          col(c).cast("string").try_cast("double").as(y)
        }: _*)
    val yearCols = renamed.columns.tail
    renamed.unpivot(Array(col(labelName)), yearCols.map(col), "fiscal_year_s", "value")
      .withColumn("fiscal_year", col("fiscal_year_s").cast("int"))
      .drop("fiscal_year_s")
  }
}
