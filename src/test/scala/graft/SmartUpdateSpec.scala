package graft

import graft.merge.SmartUpdate
import org.apache.spark.sql.functions._

/** Golden contract of the reference's smart_update
  * (/root/reference/tests/test_azure_connector.py:196-247) plus the edge
  * semantics SURVEY.md §2.10 documents: tolerance boundary, NaN skip,
  * last-wins duplicate keys, idempotence. */
class SmartUpdateSpec extends SparkSuite {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")
  private def df(rows: (String, Double)*) = rows.toDF("date", "value")
  private val empty = Seq.empty[(String, Double)].toDF("date", "value")

  test("golden sequence: 3 new, then 2 updated + 2 revisions") {
    val b1 = df("2025-01-01" -> 100.0, "2025-02-01" -> 200.0, "2025-03-01" -> 300.0)
    val (m1, r1, c1) = SmartUpdate.merge(b1, empty, "date", Seq("value"), "ds", ts)
    assert(c1 == SmartUpdate.MergeCounts(3, 0, 0))
    assert(r1.count() == 0)
    assert(m1.count() == 3)

    val b2 = df("2025-01-01" -> 110.0, "2025-02-01" -> 200.0, "2025-03-01" -> 310.0)
    val (m2, r2, c2) = SmartUpdate.merge(b2, m1, "date", Seq("value"), "ds", ts)
    assert(c2 == SmartUpdate.MergeCounts(0, 2, 2))
    val revs = r2.orderBy("data_date").collect()
    assert(revs.map(_.getAs[String]("data_date")).toSeq ==
      Seq("2025-01-01", "2025-03-01"))
    assert(revs.map(_.getAs[Double]("old_value")).toSeq == Seq(100.0, 300.0))
    assert(revs.map(_.getAs[Double]("new_value")).toSeq == Seq(110.0, 310.0))
    // merged table holds the updated values, unchanged row untouched
    val m = m2.orderBy("date").collect().map(_.getAs[Double]("value")).toSeq
    assert(m == Seq(110.0, 200.0, 310.0))
  }

  test("idempotence: re-merging the same batch changes nothing") {
    val b = df("2025-01-01" -> 1.5, "2025-02-01" -> 2.5)
    val (m1, _, _) = SmartUpdate.merge(b, empty, "date", Seq("value"), "ds", ts)
    val (m2, r2, c2) = SmartUpdate.merge(b, m1, "date", Seq("value"), "ds", ts)
    assert(c2 == SmartUpdate.MergeCounts(0, 0, 0))
    assert(r2.count() == 0)
    assert(m2.count() == 2)
  }

  test("tolerance: |delta| <= 0.001 is not a revision (strict >)") {
    // 0.001 - 0.0 is bit-identical to the Tolerance double, so this probes
    // the strict '>' exactly (decimal literals like 100.001 pick up
    // representation error and legitimately revise — in the reference too).
    val base = df("2025-01-01" -> 0.0)
    val (m1, _, _) = SmartUpdate.merge(base, empty, "date", Seq("value"), "ds", ts)
    val (_, _, cAt) = SmartUpdate.merge(df("2025-01-01" -> 0.001), m1,
      "date", Seq("value"), "ds", ts)
    assert(cAt == SmartUpdate.MergeCounts(0, 0, 0))
    val (_, _, cOver) = SmartUpdate.merge(df("2025-01-01" -> 0.002), m1,
      "date", Seq("value"), "ds", ts)
    assert(cOver == SmartUpdate.MergeCounts(0, 1, 1))
  }

  test("NaN and null on either side are skipped, never revised") {
    val base = df("2025-01-01" -> 100.0, "2025-02-01" -> Double.NaN)
    val (m1, _, _) = SmartUpdate.merge(base, empty, "date", Seq("value"), "ds", ts)
    val inc = df("2025-01-01" -> Double.NaN, "2025-02-01" -> 55.0)
    val (_, r, c) = SmartUpdate.merge(inc, m1, "date", Seq("value"), "ds", ts)
    assert(c == SmartUpdate.MergeCounts(0, 0, 0))
    assert(r.count() == 0)
  }

  test("duplicate incoming keys are deduped before classification") {
    val dup = df("2025-01-01" -> 1.0, "2025-01-01" -> 2.0, "2025-02-01" -> 3.0)
    val (m, _, c) = SmartUpdate.merge(dup, empty, "date", Seq("value"), "ds", ts)
    assert(c.newRows == 2)
    assert(m.count() == 2) // one row per key in the merged store
  }

  test("dedupeLastWins with explicit order keeps the last occurrence") {
    val b = Seq(("2025-01-01", 1.0, 0), ("2025-01-01", 9.0, 1))
      .toDF("date", "value", "ord")
    val out = SmartUpdate.dedupeLastWins(b, "date", Some("ord")).collect()
    assert(out.length == 1 && out.head.getAs[Double]("value") == 9.0)
  }

  test("per-field revisions: one row per changed field, multi-field entity") {
    val base = Seq(("2025-01-01", 1.0, 10.0)).toDF("date", "a", "b")
    val emptyAB = Seq.empty[(String, Double, Double)].toDF("date", "a", "b")
    val (m1, _, _) = SmartUpdate.merge(base, emptyAB, "date", Seq("a", "b"), "ds", ts)
    val inc = Seq(("2025-01-01", 2.0, 10.0)).toDF("date", "a", "b")
    val (_, r, c) = SmartUpdate.merge(inc, m1, "date", Seq("a", "b"), "ds", ts)
    assert(c == SmartUpdate.MergeCounts(0, 1, 1))
    val row = r.collect().head
    assert(row.getAs[String]("value_field") == "a")
    assert(row.getAs[Double]("old_value") == 1.0)
    assert(row.getAs[Double]("new_value") == 2.0)
    assert(row.getAs[String]("dataset") == "ds")
  }

  test("reference parity: an updated row carries incoming NaN fields verbatim") {
    // the reference upserts the FULL incoming entity for a changed record
    // (azure_data_tracker.py:75-84 + batch_upsert), so a NaN field rides
    // along when another field changed — skipped by the change detector
    // (no count, no revision) but stored. Pinned deliberately.
    val mk = (a: Double, b: Double) => Seq(("2025-01-01", a, b)).toDF("date", "a", "b")
    val (m1, _, _) = SmartUpdate.merge(mk(1.0, 2.0),
      Seq.empty[(String, Double, Double)].toDF("date", "a", "b"),
      "date", Seq("a", "b"), "ds", ts)
    val (m2, r2, c2) = SmartUpdate.merge(mk(Double.NaN, 5.0), m1,
      "date", Seq("a", "b"), "ds", ts)
    assert(c2 == SmartUpdate.MergeCounts(0, 1, 1)) // only b counts/logs
    assert(r2.collect().map(_.getAs[String]("value_field")).toSeq == Seq("b"))
    val row = m2.collect().head
    assert(row.getAs[Double]("a").isNaN && row.getAs[Double]("b") == 5.0)
  }

  test("existing-only rows are untouched (no deletes, ever)") {
    val base = df("2025-01-01" -> 1.0, "2025-06-01" -> 6.0)
    val (m1, _, _) = SmartUpdate.merge(base, empty, "date", Seq("value"), "ds", ts)
    val inc = df("2025-01-01" -> 2.0) // key range excludes 2025-06-01
    val (m2, _, c) = SmartUpdate.merge(inc, m1, "date", Seq("value"), "ds", ts)
    assert(c == SmartUpdate.MergeCounts(0, 1, 1))
    val kept = m2.filter(col("date") === "2025-06-01").collect()
    assert(kept.length == 1 && kept.head.getAs[Double]("value") == 6.0)
  }
}
