package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Revision-history read path
  * (/root/reference/core_local/azure_data_tracker.py:167-234): filter
  * conjunction -> sort by revision_date desc -> limit -> canonical
  * projection. Pure filter/orderBy/limit chain; Catalyst pushes the
  * dataset/date/field predicates into the parquet scan (the reference ships
  * an OData string to the storage service — same idea, done by the
  * optimizer).
  */
object RevisionHistory {

  def query(revisions: DataFrame,
            dataset: Option[String] = None,
            date: Option[String] = None,
            field: Option[String] = None,
            limit: Option[Int] = None): DataFrame = {
    var df = revisions
    dataset.foreach(d => df = df.filter(col("dataset") === d))
    date.foreach(d => df = df.filter(col("data_date") === d))
    field.foreach(f => df = df.filter(col("value_field") === f))
    df = df.orderBy(col("revision_date").desc, col("data_date").desc,
      col("value_field"))
    limit.foreach(n => df = df.limit(n))
    df.select("dataset", "data_date", "value_field",
      "old_value", "new_value", "revision_date")
  }
}
