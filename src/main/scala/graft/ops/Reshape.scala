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

  /** T1+T2 for the EDB grid: a headerless 13x11 grid (row 0 = fiscal-year
    * header, col 0 = month/quarter label, cols 1..N = per-fiscal-year values)
    * -> long (label, fiscal_year, value).
    *
    * The fiscal-year header row is tiny and bounded (one row) — it is
    * collected on the driver to become column metadata, exactly the
    * wide->schema promotion the reference does; the VALUE data never leaves
    * the cluster.
    */
  def promoteHeaderAndMelt(grid: DataFrame, labelName: String): DataFrame = {
    val cols = grid.columns
    val labelCol = cols.head
    // header row: the row whose label cell is empty/null (grid layout fixed
    // by config: A6:K18 -> row 0 is the fiscal-year header).
    val header = grid.filter(col(labelCol).isNull || trim(col(labelCol)) === "")
      .head()
    val years = cols.tail.zipWithIndex.map { case (c, i) =>
      c -> Option(header.get(i + 1)).map(_.toString.trim.takeWhile(ch => ch.isDigit)).getOrElse("")
    }
    val body = grid.filter(col(labelCol).isNotNull && trim(col(labelCol)) =!= "")
    val renamed = body.select(
      trim(col(labelCol)).as(labelName) +:
        years.collect { case (c, y) if y.nonEmpty =>
          col(c).cast("string").try_cast("double").as(y)
        }: _*)
    val yearCols = renamed.columns.tail
    renamed.unpivot(Array(col(labelName)), yearCols.map(col), "fiscal_year_s", "value")
      .withColumn("fiscal_year", col("fiscal_year_s").cast("int"))
      .drop("fiscal_year_s")
  }
}
