package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diff-merge with change-data-capture ("smart update").
  *
  * Reference contract (/root/reference/core_local/azure_data_tracker.py:27-165,
  * validated by /root/reference/tests/test_azure_connector.py:196-247):
  * given an incoming batch and the existing table, keyed on `date` within a
  * dataset:
  *   - key only in incoming              -> NEW row
  *   - key in both, any tracked value field differing by > 0.001 (strict),
  *     with both sides present and non-NaN  -> UPDATED row, plus one
  *     REVISION record per changed field (dataset, data_date, value_field,
  *     old_value, new_value, revision_date)
  *   - otherwise                          -> UNCHANGED (never rewritten)
  *   - rows only in the store             -> untouched (no deletes, ever)
  *
  * Spark-first design: a single keyed full-outer join classifies every row in
  * one distributed pass (the reference does a full scan into a driver dict —
  * its own comments flag that as the scale limit; here the join shuffles on
  * the key, partial-aggregates nothing, and broadcast-joins automatically
  * when one side is small). Per-field revision fan-out is a `stack` generator
  * (the relational form of the reference's per-field loop), not a UDTF.
  */
object SmartUpdate {

  /** Absolute float tolerance below which a change is NOT a revision
    * (strict '>', azure_data_tracker.py:113). */
  val Tolerance = 0.001

  private def inc(f: String) = col(s"__inc_$f")
  private def ex(f: String) = col(s"__ex_$f")

  /** A field counts as changed iff both sides are present, finite, castable,
    * and differ by more than the tolerance (NaN/null on either side -> skip,
    * azure_data_tracker.py:97-113,128-130). */
  private def changedField(f: String): Column = {
    val n = inc(f).try_cast("double")
    val o = ex(f).try_cast("double")
    n.isNotNull && o.isNotNull && !isnan(n) && !isnan(o) &&
      abs(n - o) > Tolerance
  }

  /** Classify incoming vs existing. Returns one row per key present in
    * either side with column `status` in {new, updated, unchanged,
    * existing_only}, incoming value fields under their own names (existing
    * values for existing_only rows), and per-field `<f>_changed` flags.
    */
  def classify(incoming: DataFrame, existing: DataFrame, keyCol: String,
               valueFields: Seq[String]): DataFrame = {
    val incP = incoming.select(
      col(keyCol) +: lit(true).as("__inc_present") +:
        valueFields.map(f => col(f).as(s"__inc_$f")): _*)
    val exP = existing.select(
      col(keyCol) +: lit(true).as("__ex_present") +:
        valueFields.map(f => col(f).as(s"__ex_$f")): _*)
    val j = incP.join(exP, Seq(keyCol), "full_outer")
    val anyChanged = valueFields.map(changedField)
      .reduceOption(_ || _).getOrElse(lit(false))
    val status =
      when(col("__ex_present").isNull, "new")
        .when(col("__inc_present").isNull, "existing_only")
        .when(anyChanged, "updated")
        .otherwise("unchanged")
    j.select(
      col(keyCol) +:
        status.as("status") +:
        (valueFields.map(f => coalesce(inc(f), ex(f)).as(f)) ++
          valueFields.map(f => coalesce(changedField(f), lit(false)).as(s"${f}_changed"))): _*)
  }

  /** Revision records: one row per (updated key, changed field), with old and
    * new values — the CDC audit trail (azure_data_tracker.py:115-127).
    * `revisionTime` is injected (never utcnow inside the plan) so runs are
    * deterministic and oracle-checkable (SURVEY.md §7.5 risk 3). */
  def revisions(incoming: DataFrame, existing: DataFrame, keyCol: String,
                valueFields: Seq[String], dataset: String,
                revisionTime: java.sql.Timestamp): DataFrame = {
    val incP = incoming.select(
      col(keyCol) +: valueFields.map(f => col(f).as(s"__inc_$f")): _*)
    val exP = existing.select(
      col(keyCol) +: lit(true).as("__ex_present") +:
        valueFields.map(f => col(f).as(s"__ex_$f")): _*)
    val j = incP.join(exP, Seq(keyCol), "inner")
    // stack(n, 'f1', changed_f1, old_f1, new_f1, ...) -> per-field fan-out
    def changedSql(f: String): String = {
      val n = s"try_cast(__inc_$f as double)"
      val o = s"try_cast(__ex_$f as double)"
      s"($n is not null and $o is not null and not isnan($n) and " +
        s"not isnan($o) and abs($n - $o) > ${Tolerance})"
    }
    val stacked = j.select(
      col(keyCol).as("data_date"),
      expr(valueFields.map(f =>
          s"('$f', ${changedSql(f)}, " +
          s"try_cast(__ex_$f as double), try_cast(__inc_$f as double))")
        .mkString(s"stack(${valueFields.size}, ", ", ", ")") +
        " as (value_field, changed, old_value, new_value)"))
    stacked.filter(col("changed"))
      .select(
        lit(dataset).as("dataset"),
        col("data_date"), col("value_field"), col("old_value"), col("new_value"),
        lit(revisionTime).as("revision_date"))
  }

  /** Result counts of a merge, mirroring the reference's return value. */
  case class MergeCounts(newRows: Long, updated: Long, revisions: Long)

  /** Full merge: classify + build the post-merge table + revision log.
    * Returns (mergedTable, revisions, counts). The merged table is
    * (existing rows not superseded) ∪ (new) ∪ (updated) — unchanged rows
    * keep their EXISTING values/rows (never rewritten semantically). */
  def merge(incoming: DataFrame, existing: DataFrame, keyCol: String,
            valueFields: Seq[String], dataset: String,
            revisionTime: java.sql.Timestamp)
      : (DataFrame, DataFrame, MergeCounts) = {
    val cls = classify(incoming, existing, keyCol, valueFields).cache()
    val newOrUpdatedKeys = cls.filter(col("status").isin("new", "updated"))
      .select(col(keyCol))
    // unchanged + existing_only rows stay as the stored originals
    val kept = existing.join(newOrUpdatedKeys, Seq(keyCol), "left_anti")
    val fresh = incoming.join(
      newOrUpdatedKeys, Seq(keyCol), "left_semi")
    val merged = kept.select(col(keyCol) +: valueFields.map(col): _*)
      .unionByName(fresh.select(col(keyCol) +: valueFields.map(col): _*))
    val revs = revisions(incoming, existing, keyCol, valueFields, dataset, revisionTime)
    val byStatus = cls.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = MergeCounts(
      byStatus.getOrElse("new", 0L),
      byStatus.getOrElse("updated", 0L),
      revs.count())
    (merged, revs, counts)
  }
}
