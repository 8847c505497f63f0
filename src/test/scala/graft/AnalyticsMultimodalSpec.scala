package graft

import graft.ops.{Analytics, Multimodal}
import org.apache.spark.sql.functions._

/** Per-series window analytics and multimodal plumbing. */
class AnalyticsMultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val series = Seq(
    ("a", "2024-01-01", 10.0), ("a", "2024-02-01", 12.0), ("a", "2024-03-01", 9.0),
    ("b", "2024-01-01", 100.0), ("b", "2024-02-01", 100.0))
    .toDF("dataset", "date", "value")

  test("periodChange: per-series lag, first row null, pct sign") {
    val out = Analytics.periodChange(series, Seq("dataset"), "date", "value")
      .orderBy("dataset", "date").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("prev_value"))) // a, first
    assert(out(1).getAs[Double]("change") == 2.0)            // 10 -> 12
    assert(out(2).getAs[Double]("change") == -3.0)           // 12 -> 9
    assert(out(2).getAs[Double]("pct_change") < 0)
    assert(out(4).getAs[Double]("change") == 0.0)            // b flat
    // series do not leak into each other: b's first row has no prev
    assert(out(3).isNullAt(out(3).fieldIndex("prev_value")))
  }

  test("rollingMean: trailing window bounded by series start") {
    val out = Analytics.rollingMean(series, Seq("dataset"), "date", "value", 2)
      .orderBy("dataset", "date").collect()
      .map(_.getAs[Double]("rolling_mean_2"))
    assert(out(0) == 10.0)       // single row window
    assert(out(1) == 11.0)       // (10+12)/2
    assert(out(2) == 10.5)       // (12+9)/2
  }

  test("resample: monthly average via decimal-exact arithmetic") {
    val ts = Seq(("2024-01-03 10:00:00", 1.0), ("2024-01-20 10:00:00", 3.0),
      ("2024-02-01 00:00:00", 5.0)).toDF("t", "v")
      .select(to_timestamp(col("t")).as("t"), col("v"))
    val out = Analytics.resampleMonthlyAvg(ts, "t", "v")
      .orderBy("month").collect()
      .map(r => (r.getAs[java.sql.Date]("month").toString,
        r.getAs[Double]("avg_value"), r.getAs[Long]("n")))
    assert(out.toSeq == Seq(("2024-01-01", 2.0, 2L), ("2024-02-01", 5.0, 1L)))
  }

  test("multimodal: metadata fields and frame-sample geometry") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "0123456789abcdef0123456789abcdef"))
      .toDF("doc_id", "text")
    val payload = Multimodal.asPayload(col("text"))
    val out = docs.select(col("doc_id"),
        col("text"),
        Multimodal.mediaMetadata(payload, "text/plain").as("meta"),
        Multimodal.frameSample(payload, 8).as("frames"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Int]("byte_len") == 10)
    assert(out(0).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("mime") == "text/plain")
    // frame counts: min(len, 8) for len >= 8, len below
    assert(out(0).getSeq[Int](out(0).fieldIndex("frames")).length == 8)
    assert(out(1).getSeq[Int](out(1).fieldIndex("frames")).length == 2)
    assert(out(2).getSeq[Int](out(2).fieldIndex("frames")).length == 8)
    // frame values are the actual byte values ('a' = 97)
    assert(out(0).getSeq[Int](out(0).fieldIndex("frames")).head == 'a'.toInt)
  }

  test("multimodal: decode stub is deterministic and partition-shaped") {
    val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")
    val a = Multimodal.prepare(docs, "doc_id", "text", dims = 4)
      .orderBy("id").collect().map(r => (r.getLong(0),
        r.getSeq[Float](r.fieldIndex("features")).toList)).toSeq
    val b = Multimodal.prepare(docs.repartition(3), "doc_id", "text", dims = 4)
      .orderBy("id").collect().map(r => (r.getLong(0),
        r.getSeq[Float](r.fieldIndex("features")).toList)).toSeq
    assert(a == b) // partitioning must not change decode output
    assert(a.head._2.length == 4)
  }
}
