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

  test("linearTrend: perfect line recovers slope/intercept exactly, r2 = 1") {
    val line = (1 to 10).map(x => ("s", x, 2.0 * x + 3.0)).toDF("ds", "x", "y")
    val fit = Analytics.linearTrend(line, Seq("ds"), "x", "y").collect()
    assert(fit.length == 1)
    val r = fit.head
    assert(r.getAs[Long]("n") == 10)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
    assert(r.getAs[Double]("x_max") == 10.0)
  }

  test("linearTrend: degenerate series (n=1, constant x) yield null fit") {
    val df = Seq(("one", 5, 1.0), ("const", 3, 1.0), ("const", 3, 9.0))
      .toDF("ds", "x", "y")
    val fits = Analytics.linearTrend(df, Seq("ds"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fits("one").isNullAt(fits("one").fieldIndex("slope")))
    assert(fits("const").isNullAt(fits("const").fieldIndex("slope")))
  }

  test("forecastTrend: extrapolates intercept + slope * (x_max + h)") {
    val line = (1 to 10).map(x => ("s", x, 2.0 * x + 3.0)).toDF("ds", "x", "y")
    val out = Analytics.forecastTrend(line, Seq("ds"), "x", "y", 3)
      .orderBy("h").collect()
    assert(out.map(_.getAs[Int]("h")).toSeq == Seq(1, 2, 3))
    assert(out.map(_.getAs[Double]("x_f")).toSeq == Seq(11.0, 12.0, 13.0))
    for ((r, i) <- out.zipWithIndex)
      assert(math.abs(r.getAs[Double]("forecast") - (3.0 + 2.0 * (11 + i))) < 1e-9)
  }

  test("seasonalTrend/forecastSeasonal: dummy OLS recovers per-season intercepts") {
    // y = 0.5x + (10 if x even else 20), period 2 — the dummy regression
    // has an exact solution the FWL moments must reproduce bit-for-bit
    val df = (0 to 7).map(x =>
      ("s", x, 0.5 * x + (if (x % 2 == 0) 10.0 else 20.0))).toDF("ds", "x", "y")
    val fit = Analytics.seasonalTrend(df, Seq("ds"), "x", "y", period = 2)
      .orderBy("season").collect()
    assert(fit.length == 2)
    assert(math.abs(fit(0).getAs[Double]("slope") - 0.5) < 1e-12)
    assert(math.abs(fit(0).getAs[Double]("gamma") - 10.0) < 1e-12)
    assert(math.abs(fit(1).getAs[Double]("gamma") - 20.0) < 1e-12)
    assert(math.abs(fit(0).getAs[Double]("r2") - 1.0) < 1e-12)
    val fc = Analytics.forecastSeasonal(df, Seq("ds"), "x", "y",
        horizon = 2, period = 2).orderBy("h").collect()
    // x_max = 7 -> x_f 8 (even: 10 + 4) and 9 (odd: 20 + 4.5)
    assert(math.abs(fc(0).getAs[Double]("forecast") - 14.0) < 1e-9)
    assert(math.abs(fc(1).getAs[Double]("forecast") - 24.5) < 1e-9)
  }

  test("forecastSeasonal: global series (no partition columns)") {
    val df = (0 to 7).map(x =>
      (x, 0.5 * x + (if (x % 2 == 0) 10.0 else 20.0))).toDF("x", "y")
    val fc = Analytics.forecastSeasonal(df, Seq.empty, "x", "y",
        horizon = 2, period = 2).orderBy("h").collect()
    assert(math.abs(fc(0).getAs[Double]("forecast") - 14.0) < 1e-9)
    assert(math.abs(fc(1).getAs[Double]("forecast") - 24.5) < 1e-9)
  }

  test("linearTrend: null-gapped rows are excluded as complete pairs") {
    // (0,1),(1,null),(2,3): OLS over the two complete pairs = slope 1,
    // intercept 1 — a fit mixing n with sums over all x would get slope 0
    val gaps = Seq((0, Option(1.0)), (1, Option.empty[Double]), (2, Option(3.0)))
      .toDF("x", "y")
    val r = Analytics.linearTrend(gaps, Seq.empty, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 2)
    assert(math.abs(r.getAs[Double]("slope") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-12)
    assert(r.getAs[Double]("x_max") == 2.0)
  }

  test("forecastSeasonal: a never-observed future season keeps its row (null forecast)") {
    // period 4, history covers only seasons 0..1 — forecasting 4 ahead
    // reaches seasons 2 and 3, which must surface as null, not vanish
    val df = Seq((0, 10.0), (1, 20.0), (4, 10.0), (5, 20.0)).toDF("x", "y")
    val fc = Analytics.forecastSeasonal(df, Seq.empty, "x", "y",
        horizon = 4, period = 4).orderBy("h").collect()
    assert(fc.length == 4, "no silent row loss for unseen seasons")
    // x_max = 5 -> x_f 6,7 are seasons 2,3 (unseen); x_f 8,9 are 0,1
    assert(fc(0).isNullAt(fc(0).fieldIndex("forecast")))
    assert(fc(1).isNullAt(fc(1).fieldIndex("forecast")))
    assert(!fc(2).isNullAt(fc(2).fieldIndex("forecast")))
    assert(!fc(3).isNullAt(fc(3).fieldIndex("forecast")))
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

  test("multimodal: raw-byte decode is deterministic and partition-shaped") {
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

  test("multimodal: WAV encode/decode roundtrip preserves PCM samples") {
    val samples = Array.tabulate(100)(i => ((i * 131) % 4001 - 2000).toShort)
    val wav = Multimodal.encodeWav(samples)
    assert(wav.length == 44 + 200)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(Multimodal.decodeWavPcm(wav).toSeq == samples.toSeq)
    // chunk walker skips unknown chunks before data
    val junk = Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'j', 'u', 'n', 'k', 2, 0, 0, 0, 9, 9) ++ wav.drop(36)
    assert(Multimodal.decodeWavPcm(junk).toSeq == samples.toSeq)
  }

  test("multimodal: BMP encode/decode roundtrip honors padding and row order") {
    val w = 5; val h = 3 // rowSize 16 with padding, not 15
    val gray = (x: Int, y: Int) => (x * 40 + y * 7) % 256
    val bmp = Multimodal.encodeBmp(w, h, gray)
    assert(bmp.length == 54 + 16 * 3)
    val (dw, dh, g) = Multimodal.decodeBmpGray(bmp)
    assert((dw, dh) == (w, h))
    for (y <- 0 until h; x <- 0 until w)
      assert(g(y * w + x) == gray(x, y), s"pixel ($x,$y)")
  }

  test("multimodal: decodeFeatures dispatches on magic bytes") {
    val wavRow = Multimodal.MediaRow(1L,
      Multimodal.encodeWav(Array.tabulate(8)(i => (i * 100).toShort)))
    val bmpRow = Multimodal.MediaRow(2L, Multimodal.encodeBmp(4, 2, (x, _) => x * 10))
    val rawRow = Multimodal.MediaRow(3L, "plain".getBytes("UTF-8"))
    val ds = spark.createDataset(Seq(wavRow, bmpRow, rawRow))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.decodeFeatures(ds, dims = 2).collect()
      .map(f => f.id -> f.features.toList).toMap
    // WAV: windows [0,100,200,300] and [400,500,600,700] -> means 150, 550
    assert(out(1L) == List(150f, 550f))
    // BMP: bands x in {0,1} gray {0,10} mean 5; x in {2,3} gray {20,30} mean 25
    assert(out(2L) == List(5f, 25f))
    assert(out(3L).length == 2) // raw fallback still produces features
  }

  test("multimodal: decodeFeaturesSafe isolates corrupt payloads per row") {
    val good = Multimodal.MediaRow(1L,
      Multimodal.encodeWav(Array.tabulate(8)(i => (i * 100).toShort)))
    // a RIFF/WAVE header whose chunk sizes lie about the payload
    val poisoned = {
      val b = Multimodal.encodeWav(Array.tabulate(8)(i => i.toShort))
      java.util.Arrays.copyOfRange(b, 0, 20) // truncated mid-header
    }
    val rows = Seq(good, Multimodal.MediaRow(2L, poisoned))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.decodeFeaturesSafe(ds, dims = 2).collect()
      .map(f => f.id -> ((f.status, f.features.isDefined))).toMap
    // the task survives the bad row; good rows decode, bad rows carry
    // status=error with null features — nothing throws
    assert(out(1L) == (("ok", true)))
    assert(out(2L) == (("error", false)))
  }

  test("multimodal: lying WAV chunk size throws (never a stalled walk); null payload isolated") {
    // RIFF/WAVE header + one chunk whose size field is -8: an unvalidated
    // walk advances by 8 + (-8) = 0 bytes forever
    val evil = new Array[Byte](32)
    "RIFF".getBytes.copyToArray(evil, 0)
    "WAVE".getBytes.copyToArray(evil, 8)
    "junk".getBytes.copyToArray(evil, 12)
    evil(16) = 0xF8.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0xFF.toByte // le32 = -8
    intercept[IllegalArgumentException](Multimodal.decodeWavPcm(evil))
    // ...and through the error-isolating kernel it is a per-row error,
    // alongside a null payload (legal binary-column row), not a dead task
    val rows = Seq(Multimodal.MediaRow(1L, evil), Multimodal.MediaRow(2L, null),
      Multimodal.MediaRow(3L, Multimodal.encodeWav(Array.tabulate(4)(_.toShort))))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.decodeFeaturesSafe(ds, dims = 2).collect()
      .map(f => f.id -> f.status).toMap
    assert(out == Map(1L -> "error", 2L -> "error", 3L -> "ok"))
  }

  test("resizeGray: nearest-neighbor stride, hand-checked") {
    // 4x2 source, downscale to 2x2: src x of {0,1} -> {0, 2}; src y -> {0, 1}
    val px = Array(0, 10, 20, 30,
                   40, 50, 60, 70)
    val out = Multimodal.resizeGray(4, 2, px, 2, 2)
    assert(out.toSeq == Seq(0, 20, 40, 60))
    // upscale 1x1 -> 2x2 replicates the single pixel
    assert(Multimodal.resizeGray(1, 1, Array(9), 2, 2).toSeq == Seq(9, 9, 9, 9))
  }

  test("audioPrint: volume-invariant, a local pop flips few bits, clique found") {
    import spark.implicits._
    import graft.ops.Dedup
    def wav(id: Long, gain: Int, pop: Option[Int]) =
      Multimodal.MediaRow(id, Multimodal.encodeWav(
        Array.tabulate(128) { i =>
          val b = java.security.MessageDigest.getInstance("MD5")
            .digest(s"sp:$i".getBytes("UTF-8"))(0) & 0xFF
          val base = (b - 128) * gain
          (base + (if (pop.contains(i)) 800 else 0)).toShort
        }))
    val media = Seq(
      wav(1L, 1, None),        // original
      wav(2L, 3, None),        // same signal at 3x volume
      wav(3L, 1, Some(64)),    // one transient pop
      wav(4L, 1, None)         // exact duplicate
    ).toDS()
    val f = Multimodal.audioPrintQuarters(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f(1L) == f(4L), "exact duplicate must print identically")
    assert(f(1L) == f(2L),
      "a uniform volume change must not change the energy-delta print")
    val hamming13 = f(1L).zip(f(3L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(hamming13 >= 1 && hamming13 <= 2,
      s"one pop flips 1-2 bits, got $hamming13")
    val pairs = Dedup.quarterNearDupPairs(
        Multimodal.audioPrintQuarters(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 6, s"all four variants one clique: $pairs")
  }

  test("dHash: brightness-invariant, local edits flip few bits, blocking finds pairs") {
    import spark.implicits._
    import graft.ops.Dedup
    def bmp(id: Long, shift: Int, poke: Option[(Int, Int)]) =
      Multimodal.MediaRow(id, Multimodal.encodeBmp(9, 8, (x, y) => {
        val b = java.security.MessageDigest.getInstance("MD5")
          .digest(s"base:$x:$y".getBytes("UTF-8"))(0) & 0xFF
        val poked = if (poke.contains((x, y))) 128 else 0
        // uniform exposure shift: clamp-free modular shift preserves
        // NOTHING about order... so use a small clamped shift instead,
        // the real re-exposure model (order-preserving where unclipped)
        math.min(255, b / 2 + shift) + poked & 0xFF
      }))
    val media = Seq(
      bmp(1L, 0, None),            // original
      bmp(2L, 40, None),           // re-exposed: same gradient signs
      bmp(3L, 0, Some((4, 4))),    // one poked pixel: <= 2 bits flip
      bmp(4L, 0, None)             // exact duplicate of 1
    ).toDS()
    val f = Multimodal.dHashQuarters(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f(1L) == f(4L), "exact duplicate must hash identically")
    assert(f(1L) == f(2L),
      "a uniform unclipped exposure shift must not change dHash")
    val hamming13 = f(1L).zip(f(3L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(hamming13 >= 1 && hamming13 <= 2,
      s"one poked pixel flips 1-2 bits, got $hamming13")
    val pairs = Dedup.quarterNearDupPairs(
        Multimodal.dHashQuarters(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)),
      s"all four variants are one near-dup clique: $pairs")
    // leakage-safe split composition: the clique is ONE split unit —
    // all four variants land in the same split, never train AND test
    val pairsDf = Dedup.quarterNearDupPairs(
      Multimodal.dHashQuarters(media), maxHamming = 3)
    val comps = Dedup.clusterPairs(
      pairsDf.select("idA", "idB").localCheckpoint(true))
    val grouped = Seq(1L, 2L, 3L, 4L).toDF("id")
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("grp"))
    val splits = graft.ops.Sampling.hashSplitBy(grouped, col("grp"))
      .select("split").distinct().collect()
    assert(splits.length == 1,
      s"phash clique straddled splits: ${splits.mkString(",")}")
  }
}
